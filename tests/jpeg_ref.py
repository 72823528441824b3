"""Minimal baseline-JPEG ENCODER for testing the stdlib decoder.

Produces spec-conformant huffman-sequential JFIF bytes (SOF0) with:

- flat canonical Huffman tables (all 12 DC size symbols at 4 bits, all
  162 AC run/size symbols at 8 bits) — valid per the spec, trivially
  constructed, and they exercise the decoder's generic canonical-table
  builder exactly like Annex K tables would;
- configurable quantization tables (defaults: all-ones luma / all-twos
  chroma, so decode error is DCT rounding only and channel means are
  checkable to tight tolerances);
- 4:4:4 or 4:2:0 chroma subsampling (box-average downsample), grayscale,
  and optional restart intervals.

Encoder-only test helper: the product decoder lives in
``flink_connector_http_spark.operators.multimodal``.
"""

from __future__ import annotations

import struct

import numpy as np

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_A = np.cos(
    (2 * np.arange(8)[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16
) * 0.5
_A[0, :] = np.sqrt(1.0 / 8.0)

# flat canonical tables: DC sizes 0..11 all length 4; AC symbols (EOB,
# ZRL, every run/size with size 1..10) all length 8
DC_BITS = [0, 0, 0, 12] + [0] * 12
DC_VALS = list(range(12))
AC_BITS = [0] * 7 + [162] + [0] * 8
AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _encode_tables(bits, vals):
    """symbol → (code, length) canonical map (mirror of the decoder's)."""
    enc = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return enc


_DC_ENC = _encode_tables(DC_BITS, DC_VALS)
_AC_ENC = _encode_tables(AC_BITS, AC_VALS)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def pad_to_byte(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits per spec


def _size_of(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(bw: _BitWriter, coefs_zz, pred: int) -> int:
    dc = int(coefs_zz[0])
    diff = dc - pred
    t = _size_of(diff)
    bw.write(*_DC_ENC[t])
    if t:
        v = diff if diff > 0 else diff + (1 << t) - 1
        bw.write(v, t)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if coefs_zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        c = int(coefs_zz[k])
        if c == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*_AC_ENC[0xF0])
            run -= 16
        s = _size_of(c)
        bw.write(*_AC_ENC[(run << 4) | s])
        v = c if c > 0 else c + (1 << s) - 1
        bw.write(v, s)
        run = 0
    if last_nz < 63:
        bw.write(*_AC_ENC[0x00])  # EOB
    return dc


def _fdct_quant(plane: np.ndarray, q_zz: np.ndarray):
    """8x8-tiled forward DCT + quantization → per-block zigzag coef rows.
    ``plane`` is float64 (h, w) padded to multiples of 8, level-shifted
    inside."""
    h, w = plane.shape
    blocks = (
        (plane - 128.0)
        .reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )
    coefs = np.einsum("ur,nrc,cv->nuv", _A, blocks, _A.T)
    q_nat = np.empty(64, dtype=np.float64)
    q_nat[_ZIGZAG] = q_zz
    qc = np.round(coefs.reshape(-1, 64) / q_nat[None, :]).astype(np.int64)
    return qc[:, _ZIGZAG]  # coefs_zz[k] = coefs_nat[_ZIGZAG[k]]


def _pad_to(plane: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    h, w = plane.shape
    ph = -(-h // mult_y) * mult_y
    pw = -(-w // mult_x) * mult_x
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def make_jpeg(
    rgb: np.ndarray,
    *,
    subsampling: str = "444",
    grayscale: bool = False,
    restart_interval: int = 0,
    q_luma: int = 1,
    q_chroma: int = 2,
    q_16bit: bool = False,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as baseline JFIF bytes."""
    rgb = rgb.astype(np.float64)
    h, w = rgb.shape[:2]
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] \
        + 0.5 * rgb[:, :, 2]
    cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] \
        - 0.081312 * rgb[:, :, 2]

    qz_l = np.full(64, q_luma, dtype=np.int64)
    qz_c = np.full(64, q_chroma, dtype=np.int64)

    if grayscale:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "plane": y}]
        hmax = vmax = 1
    elif subsampling == "444":
        comps = [
            {"id": 1, "h": 1, "v": 1, "tq": 0, "plane": y},
            {"id": 2, "h": 1, "v": 1, "tq": 1, "plane": cb},
            {"id": 3, "h": 1, "v": 1, "tq": 1, "plane": cr},
        ]
        hmax = vmax = 1
    elif subsampling == "420":
        # box-average 2x2 chroma downsample over edge-padded planes
        cbp = _pad_to(cb, 2, 2)
        crp = _pad_to(cr, 2, 2)
        cb2 = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(
            axis=(1, 3)
        )
        cr2 = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(
            axis=(1, 3)
        )
        comps = [
            {"id": 1, "h": 2, "v": 2, "tq": 0, "plane": y},
            {"id": 2, "h": 1, "v": 1, "tq": 1, "plane": cb2},
            {"id": 3, "h": 1, "v": 1, "tq": 1, "plane": cr2},
        ]
        hmax = vmax = 2
    else:
        raise ValueError(f"unsupported subsampling {subsampling!r}")

    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per component: zigzag coef rows laid out on the component block grid
    for c in comps:
        grid_h = mcus_y * c["v"] * 8
        grid_w = mcus_x * c["h"] * 8
        plane = _pad_to(c["plane"], 1, 1)
        plane = np.pad(
            plane,
            ((0, grid_h - plane.shape[0]), (0, grid_w - plane.shape[1])),
            mode="edge",
        )
        qz = qz_l if c["tq"] == 0 else qz_c
        c["coefs"] = _fdct_quant(plane, qz)
        c["bw"] = grid_w // 8  # blocks per row

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    def _dqt(tq: int, qz: np.ndarray) -> bytes:
        if q_16bit:  # Pq=1: 16-bit big-endian table values
            return bytes([0x10 | tq]) + b"".join(
                struct.pack(">H", int(v)) for v in qz
            )
        return bytes([tq]) + bytes(int(v) for v in qz)

    out += _seg(0xDB, _dqt(0, qz_l))
    if not grayscale:
        out += _seg(0xDB, _dqt(1, qz_c))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += _seg(0xC0, sof)
    # identical flat tables registered under both table ids, as two DHT
    # segments each carrying two tables (exercises multi-table parse)
    dht0 = (bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
            + bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    dht1 = (bytes([0x01]) + bytes(DC_BITS) + bytes(DC_VALS)
            + bytes([0x11]) + bytes(AC_BITS) + bytes(AC_VALS))
    out += _seg(0xC4, dht0)
    if not grayscale:
        out += _seg(0xC4, dht1)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for c in comps:
        tid = 0 if c["tq"] == 0 else 1
        sos += bytes([c["id"], (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    bw = _BitWriter()
    preds = {c["id"]: 0 for c in comps}
    n_rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            mcu_idx = my * mcus_x + mx
            if restart_interval and mcu_idx and \
                    mcu_idx % restart_interval == 0:
                bw.pad_to_byte()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + (n_rst & 7)])
                n_rst += 1
                preds = {c["id"]: 0 for c in comps}
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        bidx = (my * c["v"] + by) * c["bw"] + mx * c["h"] + bx
                        preds[c["id"]] = _encode_block(
                            bw, c["coefs"][bidx], preds[c["id"]]
                        )
    bw.pad_to_byte()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
