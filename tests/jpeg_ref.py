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
# ZRL, every run/size with size 1..10, plus the progressive EOBn run
# symbols r<<4 for r=1..14) all length 8 — 176 codes, max 0xAF, valid
DC_BITS = [0, 0, 0, 12] + [0] * 12
DC_VALS = list(range(12))
AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
] + [r << 4 for r in range(1, 15)]
AC_BITS = [0] * 7 + [len(AC_VALS)] + [0] * 8


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


# ---------------------------------------------------------------------------
# progressive (SOF2) encoder: spectral selection + successive approximation
# ---------------------------------------------------------------------------


class _EobState:
    """EOB-run accumulator shared across blocks of one AC scan; in
    refinement scans it also buffers the correction bits the decoder
    reads right after the EOBn symbol."""

    def __init__(self) -> None:
        self.run = 0
        self.bits = []


def _flush_eob(bw: _BitWriter, state: _EobState) -> None:
    if state.run == 0:
        return
    r = state.run.bit_length() - 1
    bw.write(*_AC_ENC[r << 4])
    if r:
        bw.write(state.run - (1 << r), r)
    for b in state.bits:
        bw.write(b, 1)
    state.run = 0
    state.bits = []


def _pt(v: int, sh: int) -> int:
    """AC point transform: divide by 2^sh truncating toward zero."""
    return v >> sh if v >= 0 else -((-v) >> sh)


def _ac_first_encode(bw, state, vz, ss, se, al) -> None:
    vals = [_pt(int(vz[k]), al) for k in range(ss, se + 1)]
    nz = [i for i, v in enumerate(vals) if v != 0]
    if not nz:
        state.run += 1
        if state.run == 32767:
            _flush_eob(bw, state)
        return
    _flush_eob(bw, state)
    run = 0
    for i in range(nz[-1] + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*_AC_ENC[0xF0])
            run -= 16
        s = abs(v).bit_length()
        bw.write(*_AC_ENC[(run << 4) | s])
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if nz[-1] + 1 < len(vals):
        state.run += 1  # trailing zeros start/extend an EOB run


def _ac_refine_encode(bw, state, vz, ss, se, al) -> None:
    """Mirror image of the decoder's refinement walk: bits are WRITTEN
    exactly where `_JpegProgressiveState._ac_refine` READS them."""
    ah = al + 1
    prev = [_pt(int(vz[k]), ah) for k in range(ss, se + 1)]
    now = [_pt(int(vz[k]), al) for k in range(ss, se + 1)]
    n = len(now)
    newly = [i for i in range(n) if prev[i] == 0 and now[i] != 0]

    def corr(i: int) -> int:
        return abs(now[i]) & 1

    if not newly:
        state.run += 1
        state.bits += [corr(i) for i in range(n) if prev[i] != 0]
        if state.run == 32767:
            _flush_eob(bw, state)
        return
    _flush_eob(bw, state)
    k = 0
    for t in newly:
        r = sum(1 for j in range(k, t) if prev[j] == 0)
        while r > 15:
            bw.write(*_AC_ENC[0xF0])
            cnt = 0
            while True:  # decoder: 16 zero-history consumed per ZRL
                if prev[k] != 0:
                    bw.write(corr(k), 1)
                else:
                    cnt += 1
                    if cnt == 16:
                        k += 1
                        break
                k += 1
            r -= 16
        bw.write(*_AC_ENC[(r << 4) | 1])
        bw.write(1 if now[t] > 0 else 0, 1)
        while k < t:  # corrections read while the decoder walks to t
            if prev[k] != 0:
                bw.write(corr(k), 1)
            k += 1
        k = t + 1
    if k < n:  # coefficients remain → this block ends in an EOB
        state.run += 1
        state.bits += [corr(i) for i in range(k, n) if prev[i] != 0]


def make_progressive_jpeg(
    rgb: np.ndarray,
    *,
    subsampling: str = "444",
    grayscale: bool = False,
    q_luma: int = 1,
    q_chroma: int = 2,
) -> bytes:
    """Encode as progressive (SOF2) JFIF: an interleaved DC-first scan at
    Al=1 plus DC refinement, and per-component AC scans over two spectral
    bands at Al=2 with two refinement levels each — exercising EOB runs,
    ZRL, newly-nonzero insertion, and correction bits."""
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
        cbp = _pad_to(cb, 2, 2)
        crp = _pad_to(cr, 2, 2)
        cb2 = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(
            axis=(1, 3))
        cr2 = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(
            axis=(1, 3))
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
    for c in comps:
        grid_h = mcus_y * c["v"] * 8
        grid_w = mcus_x * c["h"] * 8
        plane = _pad_to(c["plane"], 1, 1)
        plane = np.pad(
            plane,
            ((0, grid_h - plane.shape[0]), (0, grid_w - plane.shape[1])),
            mode="edge",
        )
        c["coefs"] = _fdct_quant(plane, qz_l if c["tq"] == 0 else qz_c)
        c["bw"] = grid_w // 8
        # TRUE (non-MCU-padded) block dims for the non-interleaved scans
        cw = -(-(w * c["h"]) // hmax)
        ch = -(-(h * c["v"]) // vmax)
        c["true_bw"] = -(-cw // 8)
        c["true_bh"] = -(-ch // 8)

    out = bytearray()
    out += b"\xff\xd8"
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(int(v) for v in qz_l))
    if not grayscale:
        out += _seg(0xDB, bytes([1]) + bytes(int(v) for v in qz_c))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += _seg(0xC2, sof)  # SOF2: progressive
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
                + bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    if not grayscale:
        out += _seg(0xC4, bytes([0x01]) + bytes(DC_BITS) + bytes(DC_VALS)
                    + bytes([0x11]) + bytes(AC_BITS) + bytes(AC_VALS))

    def sos_header(scan_comps, ss, se, ah, al) -> bytes:
        seg = bytes([len(scan_comps)])
        for c in scan_comps:
            tid = 0 if c["tq"] == 0 else 1
            seg += bytes([c["id"], (tid << 4) | tid])
        return seg + bytes([ss, se, (ah << 4) | al])

    def dc_scan(ah, al) -> bytes:
        bw = _BitWriter()
        preds = {c["id"]: 0 for c in comps}
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for c in comps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            bidx = ((my * c["v"] + by) * c["bw"]
                                    + mx * c["h"] + bx)
                            dc = int(c["coefs"][bidx][0])
                            if ah == 0:
                                v = dc >> al  # DC: arithmetic shift
                                diff = v - preds[c["id"]]
                                preds[c["id"]] = v
                                t = abs(diff).bit_length()
                                bw.write(*_DC_ENC[t])
                                if t:
                                    bw.write(
                                        diff if diff > 0
                                        else diff + (1 << t) - 1, t)
                            else:
                                bw.write((dc >> al) & 1, 1)
        bw.pad_to_byte()
        return bytes(bw.out)

    def ac_scan(c, ss, se, ah, al) -> bytes:
        bw = _BitWriter()
        state = _EobState()
        for by in range(c["true_bh"]):
            for bx in range(c["true_bw"]):
                vz = c["coefs"][by * c["bw"] + bx]
                if ah == 0:
                    _ac_first_encode(bw, state, vz, ss, se, al)
                else:
                    _ac_refine_encode(bw, state, vz, ss, se, al)
        _flush_eob(bw, state)
        bw.pad_to_byte()
        return bytes(bw.out)

    # scan script: DC first (Al=1) → AC bands first (Al=2) → DC refine →
    # AC refines (2→1, 1→0) per band per component
    out += _seg(0xDA, sos_header(comps, 0, 0, 0, 1)) + dc_scan(0, 1)
    for c in comps:
        out += _seg(0xDA, sos_header([c], 1, 5, 0, 2)) + ac_scan(c, 1, 5, 0, 2)
        out += _seg(0xDA, sos_header([c], 6, 63, 0, 2)) \
            + ac_scan(c, 6, 63, 0, 2)
    out += _seg(0xDA, sos_header(comps, 0, 0, 1, 0)) + dc_scan(1, 0)
    for ah, al in ((2, 1), (1, 0)):
        for c in comps:
            out += _seg(0xDA, sos_header([c], 1, 5, ah, al)) \
                + ac_scan(c, 1, 5, ah, al)
            out += _seg(0xDA, sos_header([c], 6, 63, ah, al)) \
                + ac_scan(c, 6, 63, ah, al)
    out += b"\xff\xd9"
    return bytes(out)
