"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs, processed by Arrow-batched
``mapInPandas`` UDFs.

Decode support is tiered, stdlib-first — every modality has at least one
REAL tested decode path:

- **Real, stdlib-only**: PPM images (P6 binary / P3 ASCII, parsed by
  hand), uncompressed 24-bit BMP (row padding + bottom-up order), 8-bit
  PNG — 8/16-bit, plain or Adam7-interlaced (``zlib`` inflate +
  byte-wise per-scanline unfilter, all five filter types,
  gray/RGB/palette/alpha color types), progressive (SOF2: spectral
  selection + successive approximation) and baseline/extended-
  sequential JPEG (marker parse, canonical huffman, dequant, vectorized
  IDCT, any divisible chroma subsampling, restart intervals — round 5),
  animated GIF (hand-rolled block parse + LZW — doubles as the real
  VIDEO frame source with per-frame means, fingerprints, and
  Graphic-Control timestamps), and RIFF/WAVE audio (``wave`` module +
  numpy PCM math) — no imaging/audio library needed, tested on generated
  bytes end-to-end.
- **Real, gated**: remaining image shapes (arithmetic-coded JPEG,
  16-bit palette PNG, …) route through PIL when it is installed; other video containers
  (mp4/webm) need pyav/opencv; absent the library they raise
  ``NotImplementedError`` (honest stub — this container ships no imaging
  libs).
- **Deterministic fake**: the registered ``mm_*`` pipeline operators go
  through :func:`sniff_decode_image` / :func:`sniff_decode_audio` /
  :func:`sniff_decode_video_frames`, which dispatch real formats to the
  real decoders and everything else to the md5-digest fakes — so the
  DuckDB-oracle-checked queries stay exactly reproducible on the
  synthetic corpus while a user feeding real PPM/BMP/GIF/PNG/JPEG/WAV
  bytes gets real features through the same operators.
- **Provenance, always**: every feature-producing ``mm_*`` operator emits
  a ``decode_mode`` column (``'real'``/``'fake'``) so digest-derived
  pseudo-stats are visible, filterable data — a corpus of unsupported
  bytes shows up as 100% ``fake`` instead of silently plausible garbage.
"""

from __future__ import annotations

import hashlib
import io
import math
import struct
import wave
import zlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.registry import load, register

# ---------------------------------------------------------------------------
# real decoders (stdlib PPM + WAV; PIL-gated for other image formats)
# ---------------------------------------------------------------------------

try:  # pragma: no cover - not installed in this container
    from PIL import Image

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def _ppm_header(data: bytes):
    """Tokenize a PPM header: magic, width, height, maxval. Whitespace-
    separated tokens, ``#`` comments run to end-of-line. Returns
    (magic, width, height, maxval, offset-of-pixel-data)."""
    tokens = []
    i = 0
    while len(tokens) < 4:
        if i >= len(data):
            raise ValueError("truncated PPM header")
        c = data[i : i + 1]
        if c == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(data) and not data[j : j + 1].isspace():
                j += 1
            tokens.append(data[i:j])
            i = j
    # exactly one whitespace byte separates the maxval token from pixel data
    magic = tokens[0].decode("ascii")
    width, height, maxval = (int(t) for t in tokens[1:4])
    return magic, width, height, maxval, i + 1


def is_ppm(data: bytes) -> bool:
    return data[:2] in (b"P6", b"P3")


def is_bmp(data: bytes) -> bool:
    return data[:2] == b"BM"


def is_gif(data: bytes) -> bool:
    return data[:6] in (b"GIF87a", b"GIF89a")


def _gif_lzw(min_code_size: int, data: bytes, n_pixels: int) -> list:
    """GIF-variant LZW decode → palette indices (LSB-first bit packing,
    clear/EOI codes, 12-bit code-width cap)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    init = {i: (i,) for i in range(clear)}
    table = dict(init)
    next_code = eoi + 1
    out: list = []
    prev = None
    bitpos = 0
    total_bits = len(data) * 8
    while len(out) < n_pixels:
        if bitpos + width > total_bits:
            break  # truncated stream: return what decoded
        byte_idx, bit_off = divmod(bitpos, 8)
        window = int.from_bytes(data[byte_idx:byte_idx + 3], "little")
        code = (window >> bit_off) & ((1 << width) - 1)
        bitpos += width
        if code == eoi:
            break
        if code == clear:
            table = dict(init)
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:  # the KwKwK case
            entry = prev + (prev[0],)
        else:
            raise ValueError(f"bad LZW code {code}")
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        out.extend(entry)
        prev = entry
    return out[:n_pixels]


def decode_gif_frames(data: bytes):
    """Real stdlib GIF decode: every image descriptor becomes one frame
    dict with dimensions, channel means, the frame's RGB md5 fingerprint,
    and its cumulative timestamp from Graphic Control delays."""
    import struct

    if not is_gif(data):
        raise ValueError("not a GIF")
    packed = data[10]
    pos = 13
    gct = b""
    if packed >> 7:
        n = 2 ** ((packed & 7) + 1)
        gct = data[pos:pos + 3 * n]
        pos += 3 * n
    frames = []
    ts_centi = 0       # cumulative delay, 1/100 s units (exact integers)
    next_delay = 0
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9 and data[pos] >= 4:  # Graphic Control
                (next_delay,) = struct.unpack_from("<H", data, pos + 2)
            while data[pos] != 0:  # skip sub-blocks
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _l, _t, w, h = struct.unpack_from("<HHHH", data, pos + 1)
            p2 = data[pos + 9]
            pos += 10
            pal = gct
            if p2 >> 7:
                n = 2 ** ((p2 & 7) + 1)
                pal = data[pos:pos + 3 * n]
                pos += 3 * n
            if not pal:
                raise ValueError("GIF frame has no color table")
            mcs = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                n = data[pos]
                lzw += data[pos + 1:pos + 1 + n]
                pos += 1 + n
            pos += 1
            idx = np.array(_gif_lzw(mcs, bytes(lzw), w * h), dtype=np.int64)
            pal_arr = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)
            rgb = pal_arr[idx]
            means = rgb.astype(np.float64).mean(axis=0) / 255.0
            ts_centi += next_delay
            next_delay = 0
            frames.append({
                "frame_idx": len(frames),
                "ts_s": ts_centi / 100.0,
                "frame_md5": hashlib.md5(rgb.tobytes()).hexdigest(),
                "width": w,
                "height": h,
                "mean_r": float(means[0]),
                "mean_g": float(means[1]),
                "mean_b": float(means[2]),
            })
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    return frames


def is_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def is_png(data: bytes) -> bool:
    return data[:8] == PNG_SIG


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo the per-scanline PNG filters (0 none / 1 sub / 2 up /
    3 average / 4 paeth) → (height, stride) uint8 grid. ``raw`` is the
    inflated IDAT stream: each row is one filter-type byte + ``stride``
    filtered bytes; sub/average/paeth carry a left-neighbor dependency at
    lag ``bpp`` (bytes per pixel), so those rows walk byte-by-byte while
    none/up rows vectorize."""
    out = np.zeros((height, stride), dtype=np.uint8)
    expected = height * (stride + 1)
    if len(raw) < expected:
        raise ValueError("truncated PNG scanline data")
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos)
        pos += stride
        if ftype == 0:
            cur = row.astype(np.int32)
        elif ftype == 2:  # up
            cur = (row.astype(np.int32) + prev) & 0xFF
        elif ftype == 1:  # sub
            cur = row.astype(np.int32)
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 3:  # average
            cur = row.astype(np.int32)
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (cur[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # paeth
            cur = row.astype(np.int32)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


#: Adam7 pass geometry: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_deinterlace(raw: bytes, width: int, height: int,
                     bpp: int) -> np.ndarray:
    """Adam7: the inflated stream is SEVEN consecutive sub-images, each
    filtered independently with its own scanline structure; unfilter each
    pass and scatter its pixels onto the final (height, width*bpp) byte
    grid at the pass's (start, step) lattice."""
    out = np.zeros((height, width * bpp), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        stride = pw * bpp
        need = ph * (stride + 1)
        sub = _png_unfilter(raw[pos:pos + need], ph, stride, bpp)
        pos += need
        sub = sub.reshape(ph, pw, bpp)
        ys = y0 + dy * np.arange(ph)
        xs = x0 + dx * np.arange(pw)
        grid = out.reshape(height, width, bpp)
        grid[np.ix_(ys, xs)] = sub
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Real stdlib PNG decode → top-down (height, width, 3) uint8 RGB.

    Handles 8- and 16-bit, plain and Adam7-interlaced images:
    grayscale (0), RGB (2), palette (3, 8-bit), gray+alpha (4), RGBA
    (6) — ``zlib`` inflate of the concatenated IDAT chunks, byte-wise
    per-scanline unfiltering (lag = bytes/pixel, per interlace pass),
    16-bit high-byte downshift, palette expansion, alpha dropped."""
    import struct
    import zlib

    if not is_png(data):
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    bitdepth = colortype = interlace = 0
    plte = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            (width, height, bitdepth, colortype,
             _comp, _filt, interlace) = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"PLTE":
            plte = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    _check_dims(width, height)
    if bitdepth not in (8, 16) or interlace not in (0, 1) or (
        bitdepth == 16 and colortype == 3
    ):
        raise NotImplementedError(
            "only 8/16-bit PNG decodes stdlib-only "
            f"(got bit depth {bitdepth}, color type {colortype}, "
            f"interlace {interlace})"
        )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(colortype)
    if channels is None:
        raise ValueError(f"bad PNG color type {colortype}")
    raw = zlib.decompress(bytes(idat))
    # filters are byte-wise at every depth; the left lag is bytes/pixel
    samp_bytes = bitdepth // 8
    bpp = channels * samp_bytes
    if interlace == 1:
        grid = _png_deinterlace(raw, width, height, bpp)
    else:
        grid = _png_unfilter(raw, height, width * bpp, bpp)
    # per pixel-channel keep the FIRST byte: the sample itself at 8-bit,
    # the big-endian high byte at 16-bit (standard 16→8 downshift,
    # at most 1 LSB off the exact /257 conversion)
    px = grid.reshape(height, width, channels, samp_bytes)[:, :, :, 0]
    if colortype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        return plte[px[:, :, 0]]
    if colortype == 0:
        return np.repeat(px, 3, axis=2)
    if colortype == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    if colortype == 6:
        return np.ascontiguousarray(px[:, :, :3])
    return px  # colortype 2: already RGB


# ---------------------------------------------------------------------------
# baseline JPEG (stdlib+numpy: marker parse, huffman, dequant, IDCT, 4:2:0)
# ---------------------------------------------------------------------------

JPEG_SIG = b"\xff\xd8\xff"


def is_jpeg(data: bytes) -> bool:
    return data[:3] == JPEG_SIG


#: scan-order → natural-order index map (the JPEG zigzag)
_JPEG_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: orthonormal 8-point DCT-II basis: spatial = _DCT_A.T @ coefs @ _DCT_A
_DCT_A = np.cos(
    (2 * np.arange(8)[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16
) * 0.5
_DCT_A[0, :] = np.sqrt(1.0 / 8.0)

#: SOF markers: huffman sequential + progressive decode here; the
#: arithmetic/lossless/differential variants refuse honestly
_SOF_SEQUENTIAL = frozenset({0xC0, 0xC1})
_SOF_OTHER = frozenset(
    {0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
)


def _jpeg_build_huffman(bits, vals):
    """(lengths histogram, symbol list) → {(code_len, code): symbol}
    canonical JPEG Huffman decode table."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _JpegBitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, byte-aligns and
    consumes RSTn markers at restart boundaries, raises ValueError on any
    other marker (truncated/corrupt stream)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            if self.data[self.pos + 1] != 0x00:
                raise ValueError("JPEG marker inside entropy data")
            self.pos += 2
        else:
            self.pos += 1
        self.buf = (self.buf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self, n: int) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.buf = 0
        self.nbits = 0
        if not (
            self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] == 0xD0 + (n & 7)
        ):
            raise ValueError("JPEG missing restart marker")
        self.pos += 2


def _jpeg_decode_huff(br: _JpegBitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad JPEG huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


class _JpegProgressiveState:
    """Coefficient accumulator for progressive (SOF2) JPEG: scans arrive
    as spectral bands ([Ss, Se]) at successive bit precision (Ah→Al) and
    update per-component coefficient grids; reconstruction (dequant +
    IDCT + upsample + color) happens once at EOI.

    DC scans may interleave components in MCU order; AC scans are
    single-component in the component's own block raster over its TRUE
    (non-MCU-padded) block dims. First passes (Ah=0) huffman-decode
    magnitudes shifted left by Al with EOB-run skipping; refinement
    passes (Ah>0) add one bit per coefficient — newly-nonzero ±1<<Al via
    run/size symbols, already-nonzero via inline correction bits (read
    even inside EOB runs)."""

    def __init__(self, frame) -> None:
        self.frame = frame
        self.hmax = max(c["h"] for c in frame["comps"])
        self.vmax = max(c["v"] for c in frame["comps"])
        for c in frame["comps"]:
            if self.hmax % c["h"] or self.vmax % c["v"]:
                raise NotImplementedError(
                    "fractional JPEG chroma subsampling unsupported"
                )
        self.mcus_x = -(-frame["w"] // (8 * self.hmax))
        self.mcus_y = -(-frame["h"] // (8 * self.vmax))
        self.coefs = {}
        self.dims = {}
        for c in frame["comps"]:
            gy = self.mcus_y * c["v"]
            gx = self.mcus_x * c["h"]
            self.coefs[c["id"]] = np.zeros((gy, gx, 64), dtype=np.int64)
            cw = -(-(frame["w"] * c["h"]) // self.hmax)
            ch = -(-(frame["h"] * c["v"]) // self.vmax)
            self.dims[c["id"]] = (-(-ch // 8), -(-cw // 8))  # (bh, bw)
        self.eobrun = 0
        self.any_scan = False

    def decode_scan(
        self, data, pos, scan, dc_tables, ac_tables,
        restart_interval, ss, se, ah, al,
    ) -> int:
        self.any_scan = True
        br = _JpegBitReader(data, pos)
        self.eobrun = 0
        if ss == 0:
            if se != 0:
                raise ValueError("progressive DC scan must have Se = 0")
            self._dc_scan(br, scan, dc_tables, restart_interval, ah, al)
        else:
            if len(scan) != 1:
                raise ValueError(
                    "progressive AC scan must be single-component"
                )
            self._ac_scan(
                br, scan[0], ac_tables, restart_interval, ss, se, ah, al
            )
        # advance past trailing pad bits to the next marker
        p = br.pos
        while p + 1 < len(data) and not (
            data[p] == 0xFF and data[p + 1] != 0x00
        ):
            p += 1
        return p

    def _dc_unit(self, br, block, table, preds, cid, ah, al) -> None:
        if ah == 0:
            t = _jpeg_decode_huff(br, table)
            if t > 16:
                raise ValueError(f"bad JPEG DC size {t}")
            diff = _jpeg_extend(br.read_bits(t), t) if t else 0
            preds[cid] += diff
            block[0] = preds[cid] << al
        elif br.read_bit():
            # two's-complement OR appends the refinement bit for
            # positive and negative DC values alike
            block[0] |= 1 << al

    def _dc_scan(self, br, scan, dc_tables, restart_interval, ah, al):
        preds = {c["id"]: 0 for c in scan}
        n_rst = 0
        if len(scan) > 1:  # interleaved MCU order over the padded grid
            for my in range(self.mcus_y):
                for mx in range(self.mcus_x):
                    unit = my * self.mcus_x + mx
                    if restart_interval and unit and \
                            unit % restart_interval == 0:
                        br.restart(n_rst)
                        n_rst = (n_rst + 1) & 7
                        preds = {c["id"]: 0 for c in scan}
                    for c in scan:
                        table = dc_tables[c["dc"]] if ah == 0 else None
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                block = self.coefs[c["id"]][
                                    my * c["v"] + by, mx * c["h"] + bx
                                ]
                                self._dc_unit(
                                    br, block, table, preds, c["id"], ah, al
                                )
        else:  # single component: raster over TRUE block dims
            c = scan[0]
            table = dc_tables[c["dc"]] if ah == 0 else None
            bh, bw = self.dims[c["id"]]
            unit = 0
            for by in range(bh):
                for bx in range(bw):
                    if restart_interval and unit and \
                            unit % restart_interval == 0:
                        br.restart(n_rst)
                        n_rst = (n_rst + 1) & 7
                        preds = {c["id"]: 0}
                    unit += 1
                    self._dc_unit(
                        br, self.coefs[c["id"]][by, bx], table, preds,
                        c["id"], ah, al,
                    )

    def _ac_scan(self, br, c, ac_tables, restart_interval, ss, se, ah, al):
        table = ac_tables[c["ac"]]
        bh, bw = self.dims[c["id"]]
        grid = self.coefs[c["id"]]
        unit = 0
        n_rst = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and unit and \
                        unit % restart_interval == 0:
                    br.restart(n_rst)
                    n_rst = (n_rst + 1) & 7
                    self.eobrun = 0
                unit += 1
                if ah == 0:
                    self._ac_first(br, table, grid[by, bx], ss, se, al)
                else:
                    self._ac_refine(br, table, grid[by, bx], ss, se, al)

    def _ac_first(self, br, table, block, ss, se, al) -> None:
        if self.eobrun > 0:
            self.eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = _jpeg_decode_huff(br, table)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:
                    self.eobrun = (1 << r) - 1
                    if r:
                        self.eobrun += br.read_bits(r)
                    return
                k += 16  # ZRL
            else:
                k += r
                if k > se:
                    raise ValueError("JPEG AC index overflow")
                block[_JPEG_ZIGZAG[k]] = (
                    _jpeg_extend(br.read_bits(s), s) << al
                )
                k += 1

    def _ac_refine(self, br, table, block, ss, se, al) -> None:
        p1 = 1 << al
        k = ss
        if self.eobrun == 0:
            while k <= se:
                rs = _jpeg_decode_huff(br, table)
                r, s = rs >> 4, rs & 0xF
                val = 0
                if s == 0:
                    if r < 15:
                        self.eobrun = 1 << r
                        if r:
                            self.eobrun += br.read_bits(r)
                        break
                    # r == 15: a run of 16 zero-history coefficients
                else:
                    # newly-nonzero coefficients refine in at ±1<<Al
                    val = p1 if br.read_bit() else -p1
                while k <= se:
                    idx = _JPEG_ZIGZAG[k]
                    if block[idx] != 0:
                        # correction bit for an already-nonzero coef
                        if br.read_bit() and not (abs(block[idx]) & p1):
                            block[idx] += p1 if block[idx] > 0 else -p1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    block[_JPEG_ZIGZAG[k]] = val
                k += 1
        if self.eobrun > 0:
            # correction bits continue through EOB-run blocks
            while k <= se:
                idx = _JPEG_ZIGZAG[k]
                if block[idx] != 0:
                    if br.read_bit() and not (abs(block[idx]) & p1):
                        block[idx] += p1 if block[idx] > 0 else -p1
                k += 1
            self.eobrun -= 1

    def reconstruct(self, qtables) -> np.ndarray:
        frame = self.frame
        height, width = frame["h"], frame["w"]
        planes = {}
        for c in frame["comps"]:
            q_zz = qtables[c["tq"]]
            q_nat = np.empty(64, dtype=np.int64)
            q_nat[_JPEG_ZIGZAG] = q_zz
            grid = self.coefs[c["id"]]
            gy, gx = grid.shape[:2]
            arr = (grid * q_nat[None, None, :]).astype(np.float64)
            arr = arr.reshape(gy, gx, 8, 8)
            pix = np.einsum("ur,yxuv,vc->yxrc", _DCT_A, arr, _DCT_A) + 128.0
            plane = np.clip(np.round(pix), 0, 255).astype(np.uint8)
            plane = plane.transpose(0, 2, 1, 3).reshape(gy * 8, gx * 8)
            plane = np.repeat(
                np.repeat(plane, self.vmax // c["v"], axis=0),
                self.hmax // c["h"], axis=1,
            )
            planes[c["id"]] = plane[:height, :width].astype(np.float64)
        comps = frame["comps"]
        if len(comps) == 1:
            y = np.clip(
                np.round(planes[comps[0]["id"]]), 0, 255
            ).astype(np.uint8)
            return np.repeat(y[:, :, None], 3, axis=2)
        if len(comps) != 3:
            raise NotImplementedError(
                f"{len(comps)}-component JPEG unsupported "
                "(grayscale/YCbCr only)"
            )
        y, cb, cr = (planes[c["id"]] for c in comps)
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=2)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Real stdlib+numpy JPEG decode → top-down (height, width, 3)
    uint8 RGB.

    Handles huffman-coded sequential DCT (SOF0/SOF1; the overwhelmingly
    common web shape) AND progressive DCT (SOF2: spectral selection +
    successive approximation via :class:`_JpegProgressiveState`),
    grayscale or YCbCr, any integer chroma subsampling whose factors
    divide the frame maximums (4:4:4, 4:2:2, 4:2:0, ...), multiple
    DQT/DHT segments, 16-bit quant precision, and restart intervals.
    The arithmetic/lossless/differential SOF variants raise
    ``NotImplementedError`` honestly — the sniffer routes those to the
    provenance-tagged fake path. Huffman decoding is pure Python (fine
    for thumbnails/tests); IDCT is a vectorized numpy tensor product
    over all blocks at once."""
    import struct

    if not is_jpeg(data):
        raise ValueError("not a JPEG")
    pos = 2
    qtables = {}
    dc_tables = {}
    ac_tables = {}
    frame = None
    prog = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT — one or more tables per segment
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                off += 1
                if pq:  # 16-bit precision
                    q = np.frombuffer(seg, dtype=">u2", count=64, offset=off)
                    off += 128
                else:
                    q = np.frombuffer(seg, dtype=np.uint8, count=64, offset=off)
                    off += 64
                qtables[tq] = q.astype(np.int64)
        elif marker in _SOF_SEQUENTIAL or marker == 0xC2:
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(
                    f"only 8-bit JPEG samples decode stdlib-only "
                    f"(got {precision})"
                )
            height, width = struct.unpack_from(">HH", seg, 1)
            _check_dims(width, height)
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                ch, cv = hv >> 4, hv & 0xF
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    raise ValueError(
                        f"bad JPEG sampling factors {ch}x{cv}"
                    )
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            frame = {
                "w": width, "h": height, "comps": comps,
                "progressive": marker == 0xC2,
            }
            if marker == 0xC2:
                prog = _JpegProgressiveState(frame)
        elif marker in _SOF_OTHER:
            raise NotImplementedError(
                f"SOF{marker - 0xC0} JPEG does not decode stdlib-only "
                "(huffman sequential or progressive only)"
            )
        elif marker == 0xC4:  # DHT — one or more tables per segment
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0xF
                bits = list(seg[off + 1:off + 17])
                nval = sum(bits)
                vals = list(seg[off + 17:off + 17 + nval])
                off += 17 + nval
                (ac_tables if tc else dc_tables)[th] = _jpeg_build_huffman(
                    bits, vals
                )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — start entropy-coded data
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i:3 + 2 * i]
                matches = [c for c in frame["comps"] if c["id"] == cs]
                if not matches:
                    raise ValueError(
                        f"JPEG scan references unknown component {cs}"
                    )
                scan.append(
                    {**matches[0], "dc": tt >> 4, "ac": tt & 0xF}
                )
            if prog is None:
                return _jpeg_decode_scan(
                    data, pos + seglen, frame, scan, qtables,
                    dc_tables, ac_tables, restart_interval,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah_al = seg[3 + 2 * ns]
            pos = prog.decode_scan(
                data, pos + seglen, scan, dc_tables, ac_tables,
                restart_interval, ss, se, ah_al >> 4, ah_al & 0xF,
            )
            continue
        pos += seglen
    if prog is not None and prog.any_scan:
        return prog.reconstruct(qtables)
    raise ValueError("JPEG has no SOS scan")


def _jpeg_decode_scan(
    data, pos, frame, scan, qtables, dc_tables, ac_tables, restart_interval
):
    width, height = frame["w"], frame["h"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    for c in scan:
        if hmax % c["h"] or vmax % c["v"]:
            raise NotImplementedError(
                "fractional JPEG chroma subsampling unsupported"
            )
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    br = _JpegBitReader(data, pos)
    preds = {c["id"]: 0 for c in scan}
    # per component: flat list of dequantized coefficient blocks + the
    # (block_row, block_col) grid position of each — IDCT happens once,
    # vectorized, after the huffman loop
    blocks = {c["id"]: [] for c in scan}
    coords = {c["id"]: [] for c in scan}
    n_rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            mcu_idx = my * mcus_x + mx
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                br.restart(n_rst)
                n_rst = (n_rst + 1) & 7
                preds = {c["id"]: 0 for c in scan}
            for c in scan:
                q = qtables[c["tq"]]
                dct = dc_tables[c["dc"]]
                act = ac_tables[c["ac"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        t = _jpeg_decode_huff(br, dct)
                        if t > 16:
                            raise ValueError(f"bad JPEG DC size {t}")
                        diff = _jpeg_extend(br.read_bits(t), t) if t else 0
                        preds[c["id"]] += diff
                        coef[0] = preds[c["id"]] * q[0]
                        k = 1
                        while k < 64:
                            rs = _jpeg_decode_huff(br, act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            coef[_JPEG_ZIGZAG[k]] = (
                                _jpeg_extend(br.read_bits(s), s) * q[k]
                            )
                            k += 1
                        blocks[c["id"]].append(coef)
                        coords[c["id"]].append(
                            (my * c["v"] + by, mx * c["h"] + bx)
                        )
    planes = {}
    for c in scan:
        arr = np.stack(blocks[c["id"]]).reshape(-1, 8, 8).astype(np.float64)
        # spatial = A.T @ F @ A for every block at once
        pix = np.einsum("ur,nuv,vc->nrc", _DCT_A, arr, _DCT_A) + 128.0
        pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
        plane = np.zeros(
            (mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.uint8
        )
        for (brow, bcol), block in zip(coords[c["id"]], pix):
            plane[brow * 8:brow * 8 + 8, bcol * 8:bcol * 8 + 8] = block
        # chroma upsample to full resolution by sample replication
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes[c["id"]] = plane[:height, :width].astype(np.float64)
    if len(scan) == 1:
        y = np.clip(np.round(planes[scan[0]["id"]]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    if len(scan) != 3:
        raise NotImplementedError(
            f"{len(scan)}-component JPEG unsupported (grayscale/YCbCr only)"
        )
    y, cb, cr = (planes[c["id"]] for c in scan)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_image(data: bytes) -> dict:
    """Real image decode → ``{width, height, mean_r, mean_g, mean_b}``
    (channel means normalized to 0..1, matching the fake decoder's range).

    PPM (P6 binary / P3 ASCII), uncompressed 24-bit BMP, GIF, PNG
    (8/16-bit, plain or Adam7), and baseline/extended-sequential JPEG
    parse with
    the stdlib only; any other format needs PIL and raises
    ``NotImplementedError`` without it.
    """
    if is_png(data) or is_jpeg(data):
        rgb = decode_png(data) if is_png(data) else decode_jpeg(data)
        height, width = rgb.shape[:2]
        means = rgb.reshape(-1, 3).astype(np.float64).mean(axis=0) / 255.0
        return {
            "width": width,
            "height": height,
            "mean_r": float(means[0]),
            "mean_g": float(means[1]),
            "mean_b": float(means[2]),
        }
    if is_ppm(data):
        magic, width, height, maxval, off = _ppm_header(data)
        n = width * height * 3
        if magic == "P6":
            if maxval < 256:
                px = np.frombuffer(data, dtype=np.uint8, count=n, offset=off)
            else:  # 2-byte big-endian samples
                px = np.frombuffer(data, dtype=">u2", count=n, offset=off)
        else:  # P3: ASCII sample values
            px = np.array(data[off:].split()[:n], dtype=np.int64)
        if px.size != n:
            raise ValueError("truncated PPM pixel data")
        rgb = px.reshape(-1, 3).astype(np.float64) / float(maxval)
        means = rgb.mean(axis=0)
        return {
            "width": width,
            "height": height,
            "mean_r": float(means[0]),
            "mean_g": float(means[1]),
            "mean_b": float(means[2]),
        }
    if is_bmp(data):
        import struct

        # BITMAPFILEHEADER: pixel-array offset at byte 10 (LE u32);
        # BITMAPINFOHEADER: width/height i32 at 18/22 (height > 0 means
        # bottom-up row order), bits-per-pixel u16 at 28, compression u32
        # at 30 (0 = BI_RGB). Only the uncompressed 24-bit common case is
        # handled stdlib-side; exotic variants fall through to PIL.
        (off,) = struct.unpack_from("<I", data, 10)
        width, height = struct.unpack_from("<ii", data, 18)
        (bpp,) = struct.unpack_from("<H", data, 28)
        (comp,) = struct.unpack_from("<I", data, 30)
        if bpp == 24 and comp == 0 and width > 0 and height != 0:
            n_rows = abs(height)
            stride = (width * 3 + 3) // 4 * 4  # rows pad to 4-byte bounds
            px = np.frombuffer(data, dtype=np.uint8, count=stride * n_rows,
                               offset=off)
            if px.size != stride * n_rows:
                raise ValueError("truncated BMP pixel data")
            rows = px.reshape(n_rows, stride)[:, : width * 3]
            if height > 0:
                rows = rows[::-1]  # bottom-up storage → top-down
            bgr = rows.reshape(-1, 3).astype(np.float64) / 255.0
            means = bgr.mean(axis=0)  # BMP stores BGR
            return {
                "width": width,
                "height": n_rows,
                "mean_r": float(means[2]),
                "mean_g": float(means[1]),
                "mean_b": float(means[0]),
            }
    if is_gif(data):
        first = decode_gif_frames(data)[0]
        return {
            "width": first["width"],
            "height": first["height"],
            "mean_r": first["mean_r"],
            "mean_g": first["mean_g"],
            "mean_b": first["mean_b"],
        }
    if _HAVE_PIL:  # pragma: no cover - PIL absent in this container
        img = Image.open(io.BytesIO(data)).convert("RGB")
        arr = np.asarray(img, dtype=np.float64) / 255.0
        means = arr.reshape(-1, 3).mean(axis=0)
        return {
            "width": img.width,
            "height": img.height,
            "mean_r": float(means[0]),
            "mean_g": float(means[1]),
            "mean_b": float(means[2]),
        }
    raise NotImplementedError(
        "only PPM, uncompressed 24-bit BMP, GIF, 8-bit PNG, and baseline "
        "JPEG decode stdlib-only; "
        "other image formats require PIL/pillow (not installed). Use "
        "fake_decode_image for the deterministic test path."
    )


def fake_decode_image(data: bytes) -> dict:
    """Deterministic fake decoder: derives pseudo pixel stats from the
    bytes themselves, so the distributed plumbing is fully testable."""
    digest = hashlib.md5(data).digest()
    return {
        "width": 16 + digest[0] % 64,
        "height": 16 + digest[1] % 64,
        "mean_r": digest[2] / 255.0,
        "mean_g": digest[3] / 255.0,
        "mean_b": digest[4] / 255.0,
    }


_WAV_DTYPES = {1: np.uint8, 2: "<i2", 4: "<i4"}


def _riff_chunks(data: bytes):
    """(chunk id, payload) pairs of a RIFF container (word-aligned)."""
    import struct

    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield cid, data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)


#: IMA/DVI ADPCM tables (public spec constants)
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int64)
_IMA_INDEX = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8],
    dtype=np.int64,
)


def _ima_adpcm_decode(raw: bytes, block_align: int) -> np.ndarray:
    """Mono IMA-ADPCM WAV payload → float64 samples in [-1, 1]. Each
    block: 4-byte header (first sample as i16, step index, reserved)
    then low-nibble-first 4-bit codes; per-nibble predictor/step update
    follows the IMA reference algorithm."""
    import struct as _struct

    out = []
    for b0 in range(0, len(raw), block_align):
        block = raw[b0:b0 + block_align]
        if len(block) < 4:
            break
        pred = _struct.unpack_from("<h", block, 0)[0]
        idx = min(max(block[2], 0), 88)
        out.append(pred)
        for byte in block[4:]:
            for nib in (byte & 0xF, byte >> 4):
                step = int(_IMA_STEPS[idx])
                diff = step >> 3
                if nib & 4:
                    diff += step
                if nib & 2:
                    diff += step >> 1
                if nib & 1:
                    diff += step >> 2
                pred = pred - diff if nib & 8 else pred + diff
                pred = min(32767, max(-32768, pred))
                idx = min(88, max(0, idx + int(_IMA_INDEX[nib])))
                out.append(pred)
    return np.array(out, dtype=np.float64) / 32768.0


def _decode_law_wav(data: bytes):
    """Compressed WAV fallback for the shapes the ``wave`` module
    refuses: G.711 µ-law/A-law (format codes 7/6, via ``audioop``
    expansion) and mono IMA/DVI ADPCM (0x11, pure-python block decode).
    Returns (sample_rate, channels, float64 samples in [-1, 1]) or
    raises NotImplementedError for other compressed formats."""
    import struct

    fmt_code = channels = sample_rate = None
    fmt_chunk = None
    raw = None
    for cid, chunk in _riff_chunks(data):
        if cid == b"fmt " and len(chunk) >= 8:
            fmt_code, channels, sample_rate = struct.unpack_from(
                "<HHI", chunk, 0
            )
            fmt_chunk = chunk
        elif cid == b"data":
            raw = chunk
    if fmt_code is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    if fmt_code in (6, 7):
        try:
            import audioop  # removed in Python 3.13; present on 3.11
        except ImportError as err:  # pragma: no cover - 3.13+ envs
            raise NotImplementedError(
                "mu-law/A-law WAV needs the stdlib audioop module"
            ) from err
        lin = (audioop.ulaw2lin(raw, 2) if fmt_code == 7
               else audioop.alaw2lin(raw, 2))
    elif fmt_code == 0x11:  # IMA/DVI ADPCM
        if channels != 1:
            raise NotImplementedError(
                "multichannel IMA-ADPCM WAV unsupported (mono only)"
            )
        block_align = struct.unpack_from("<H", fmt_chunk, 12)[0] \
            if fmt_chunk is not None and len(fmt_chunk) >= 14 else 256
        return sample_rate, 1, _ima_adpcm_decode(raw, block_align)
    else:
        raise NotImplementedError(
            f"compressed WAV format {fmt_code} does not decode "
            "stdlib-only (PCM, mu-law, A-law, and mono IMA-ADPCM do)"
        )
    x = np.frombuffer(lin, dtype="<i2").astype(np.float64) / 32768.0
    return sample_rate, max(1, channels), x


def decode_audio(data: bytes) -> dict:
    """Real audio decode → ``{sample_rate, n_samples, duration_s, rms}``.

    RIFF/WAVE PCM (8/16/32-bit, any channel count) decodes with the
    stdlib ``wave`` module; G.711 µ-law/A-law (telephony corpora) via
    manual RIFF parse + ``audioop`` expansion. Samples are normalized to
    [-1, 1] and ``rms`` is the root-mean-square over all channels (0..1
    range, matching the fake decoder). Other containers/codecs raise
    ``NotImplementedError``.
    """
    if not is_wav(data):
        raise NotImplementedError(
            "only RIFF/WAVE PCM decodes stdlib-only; other audio formats "
            "require soundfile/librosa (not installed). Use "
            "fake_decode_audio for the deterministic test path."
        )
    try:
        return _decode_audio_pcm(data)
    except wave.Error:
        sample_rate, channels, x = _decode_law_wav(data)
        n_samples = x.size // channels
        rms = float(np.sqrt(np.mean(np.square(x)))) if x.size else 0.0
        duration_s = (
            math.floor(n_samples * 1_000_000 / sample_rate + 0.5) / 1e6
        )
        return {
            "sample_rate": sample_rate,
            "n_samples": n_samples,
            "duration_s": duration_s,
            "rms": rms,
        }


def _decode_audio_pcm(data: bytes) -> dict:
    with wave.open(io.BytesIO(data), "rb") as wf:
        sample_rate = wf.getframerate()
        n_samples = wf.getnframes()
        sampwidth = wf.getsampwidth()
        raw = wf.readframes(n_samples)
    if sampwidth not in _WAV_DTYPES:
        raise NotImplementedError(f"unsupported WAV sample width {sampwidth}")
    if sampwidth == 3:  # pragma: no cover - defensive; not in _WAV_DTYPES
        raise NotImplementedError("24-bit PCM not supported")
    x = np.frombuffer(raw, dtype=_WAV_DTYPES[sampwidth]).astype(np.float64)
    if sampwidth == 1:  # 8-bit WAV is unsigned, midpoint 128
        x = (x - 128.0) / 128.0
    else:
        x = x / float(2 ** (8 * sampwidth - 1))
    rms = float(np.sqrt(np.mean(np.square(x)))) if x.size else 0.0
    # same tie-proof microsecond rounding as the fake path (see below)
    duration_s = math.floor(n_samples * 1_000_000 / sample_rate + 0.5) / 1e6
    return {
        "sample_rate": sample_rate,
        "n_samples": n_samples,
        "duration_s": duration_s,
        "rms": rms,
    }


def fake_decode_audio(data: bytes) -> dict:
    """Deterministic fake audio decoder: sample rate / length / loudness
    derived from the md5 digest of the bytes (same trick as
    :func:`fake_decode_image`), so the pipeline is oracle-checkable."""
    digest = hashlib.md5(data).digest()
    sample_rate = 8000 * (1 + digest[0] % 6)  # 8k..48k
    n_samples = 1000 + digest[1] * 256 + digest[2]
    # floor(x·1e6 + 0.5) instead of round(): Python rounds half-to-even,
    # SQL engines round half-away — ties like 39074/32000 = 1.2210625 would
    # diverge. The int division is correctly rounded in both engines.
    duration_s = math.floor(n_samples * 1_000_000 / sample_rate + 0.5) / 1e6
    return {
        "sample_rate": sample_rate,
        "n_samples": n_samples,
        "duration_s": duration_s,
        "rms": digest[3] / 255.0,
    }


# ---------------------------------------------------------------------------
# sniffing dispatchers: real format → real decoder, else deterministic fake.
# The registered mm_* operators run through these, so the synthetic corpus
# (never PPM/WAV) stays bit-reproducible under the DuckDB oracle while real
# PPM/WAV bytes decode for real through the identical Spark plumbing.
# ---------------------------------------------------------------------------

# A corrupt blob that *carries* a real signature (truncated scanlines, bad
# zlib stream, short RIFF header, mangled LZW) raises these out of the real
# decoders; a mapInPandas task over a dirty 100 TB corpus must degrade such
# rows to the fake path — one poisoned blob may NOT kill the whole task.
_DECODE_ERRORS = (
    NotImplementedError,  # honest unsupported variant (arith JPEG, RLE BMP)
    ValueError,
    zlib.error,
    struct.error,
    EOFError,
    IndexError,
    KeyError,  # corrupt table/component ids → missing dict entries
    ZeroDivisionError,  # corrupt zero sampling factors
    OverflowError,  # corrupt huffman tables yield absurd magnitude sizes
    wave.Error,
)

#: decoded-image pixel budget: a corrupt/crafted header advertising huge
#: dimensions must fail fast as bad data, not as a task-killing
#: multi-GiB allocation
_MAX_DECODE_PIXELS = 64_000_000


def _check_dims(width: int, height: int) -> None:
    if width <= 0 or height <= 0 or width * height > _MAX_DECODE_PIXELS:
        raise ValueError(f"implausible image dimensions {width}x{height}")


def sniff_decode_image(data: bytes) -> dict:
    """PPM/BMP/GIF/PNG/JPEG → real stdlib decode; anything else →
    deterministic fake. Every result carries ``decode_mode``
    (``'real'``/``'fake'``) so downstream operators surface the
    provenance as data instead of silently mixing real features with
    digest-derived pseudo-stats."""
    if (is_ppm(data) or is_bmp(data) or is_gif(data) or is_png(data)
            or is_jpeg(data)):
        try:
            return {**decode_image(data), "decode_mode": "real"}
        except _DECODE_ERRORS:  # unsupported variant OR corrupt bytes
            pass
    return {**fake_decode_image(data), "decode_mode": "fake"}


def sniff_decode_video_frames(data: bytes, every_nth: int) -> list:
    """GIF → real stdlib frame decode; anything else → deterministic
    fake sampler (each real frame dict is a superset of the fake's
    keys, so callers select the same fields either way). Every frame
    dict carries ``decode_mode``."""
    if is_gif(data):
        try:
            frames = decode_video_frames(data, every_nth)
            # a valid GIF always has >=1 image descriptor; a corrupt one
            # can parse to zero frames without raising — treat as corrupt
            if frames:
                return [{**fr, "decode_mode": "real"} for fr in frames]
        except _DECODE_ERRORS:
            pass
    frames = fake_decode_video_frames(data, every_nth)
    return [{**fr, "decode_mode": "fake"} for fr in frames]


def sniff_decode_audio(data: bytes) -> dict:
    """RIFF/WAVE → real stdlib decode; anything else → deterministic fake.
    The result carries ``decode_mode`` (``'real'``/``'fake'``)."""
    if is_wav(data):
        try:
            return {**decode_audio(data), "decode_mode": "real"}
        except _DECODE_ERRORS:
            pass
    return {**fake_decode_audio(data), "decode_mode": "fake"}


def decode_video_frames(data: bytes, every_nth: int):
    """Real frame sampling. Animated GIF (the one frame container the
    stdlib can take apart: hand-rolled block parse + LZW) decodes for
    real — every ``every_nth``-th frame with dimensions, channel means,
    RGB fingerprint, and cumulative Graphic-Control timestamps. Other
    containers (mp4/webm/...) require pyav/opencv; without them the
    Spark plumbing runs on :func:`fake_decode_video_frames`."""
    if is_gif(data):
        return [
            f for f in decode_gif_frames(data)
            if f["frame_idx"] % every_nth == 0
        ]
    raise NotImplementedError(
        "only GIF decodes stdlib-only; other containers require "
        "pyav/opencv — use fake_decode_video_frames for the "
        "deterministic test path"
    )


def fake_decode_video_frames(data: bytes, every_nth: int) -> list:
    """Deterministic fake frame sampler: frame count and fps come from the
    md5 digest; every ``every_nth`` frame is 'sampled' and fingerprinted by
    hashing the container bytes with the frame index — a 1→N decode shape
    (one input video, many output frames)."""
    digest = hashlib.md5(data).digest()
    n_frames = 10 + digest[0] % 30
    fps = 10 + digest[1] % 20
    out = []
    for idx in range(0, n_frames, every_nth):
        out.append({
            "frame_idx": idx,
            # same tie-proof rounding as fake_decode_audio.duration_s
            "ts_s": math.floor(idx * 1_000_000 / fps + 0.5) / 1e6,
            "frame_md5": hashlib.md5(
                data + b":" + str(idx).encode("ascii")
            ).hexdigest(),
        })
    return out


IMAGE_FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("mean_g", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
    T.StructField("decode_mode", T.StringType()),
])


# ---------------------------------------------------------------------------
# binary metadata extraction (oracle-checked)
# ---------------------------------------------------------------------------

@register(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5,
           left(text, 4) AS magic
    FROM documents
    """,
    doc="Binary-column plumbing: text→binary→mapInPandas metadata extraction "
        "(size, checksum, magic bytes); the oracle computes the same facts "
        "relationally, proving the Arrow batch path is lossless.",
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    binary = docs.select("doc_id", F.encode("text", "UTF-8").alias("blob"))

    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("magic", T.StringType()),
    ])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": blobs.map(len).astype("int64"),
                "content_md5": blobs.map(lambda b: hashlib.md5(b).hexdigest()),
                "magic": blobs.map(lambda b: b[:4].decode("utf-8", "replace")),
            })

    return binary.mapInPandas(extract, schema=out_schema)


# ---------------------------------------------------------------------------
# fake-image feature extraction (rows-only; decode is stubbed)
# ---------------------------------------------------------------------------

@register(
    "mm_image_features",
    # fake_decode_image is pure md5-digest-byte arithmetic, so the oracle
    # re-derives the same stats from md5 hex pairs: digest[i] is hex chars
    # (2i+1, 2i+2) parsed via '0x'-cast, matching hashlib.md5(...).digest().
    oracle="""
    WITH h AS (
      SELECT doc_id,
             octet_length(encode('IMG0' || text)) AS n_bytes,
             md5('IMG0' || text) AS hx
      FROM documents
    )
    SELECT doc_id, n_bytes,
           CAST(16 + ('0x' || substr(hx, 1, 2))::INT % 64 AS INT) AS width,
           CAST(16 + ('0x' || substr(hx, 3, 2))::INT % 64 AS INT) AS height,
           ('0x' || substr(hx, 5, 2))::INT / 255.0 AS mean_r,
           ('0x' || substr(hx, 7, 2))::INT / 255.0 AS mean_g,
           ('0x' || substr(hx, 9, 2))::INT / 255.0 AS mean_b,
           'fake' AS decode_mode
    FROM h
    """,
    doc="Image feature extraction pipeline: binary image column → "
        "mapInPandas decode → typed feature columns. PPM/BMP/GIF/PNG bytes "
        "decode for real (stdlib parsers); the synthetic corpus routes to "
        "the deterministic md5 fake so the oracle can recompute the stats "
        "in SQL, proving the Arrow batch path end-to-end. Every row "
        "carries a decode_mode provenance column ('real'/'fake') so fake "
        "features are visible data, never silent.",
)
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    # synthesize an opaque binary per doc (stand-in for a real image column)
    images = docs.select(
        "doc_id",
        F.encode(F.concat(F.lit("IMG0"), F.col("text")), "UTF-8").alias("image"),
    )
    return image_features_from_binary(images)


def image_features_from_binary(images: DataFrame) -> DataFrame:
    """Arrow-batched image feature extraction over a ``(doc_id, image
    binary)`` DataFrame. PPM bytes decode for real; anything else takes the
    deterministic fake (see :func:`sniff_decode_image`). Narrow 1→1
    mapInPandas — output partitioning follows input splits, no shuffle."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["image"].map(sniff_decode_image)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["image"].map(len).astype("int64"),
                "width": feats.map(lambda f: f["width"]).astype("int32"),
                "height": feats.map(lambda f: f["height"]).astype("int32"),
                "mean_r": feats.map(lambda f: f["mean_r"]),
                "mean_g": feats.map(lambda f: f["mean_g"]),
                "mean_b": feats.map(lambda f: f["mean_b"]),
                "decode_mode": feats.map(lambda f: f["decode_mode"]),
            })

    return images.mapInPandas(extract, schema=IMAGE_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# fake-audio feature extraction (1→1 decode shape, oracle-checked)
# ---------------------------------------------------------------------------

AUDIO_FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.IntegerType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("decode_mode", T.StringType()),
])


@register(
    "mm_audio_features",
    # fake_decode_audio is md5-digest arithmetic: digest[i] = hex chars
    # (2i+1, 2i+2); the oracle replays it in SQL over the same bytes.
    oracle="""
    WITH h AS (
      SELECT doc_id,
             octet_length(encode('AUD0' || text)) AS n_bytes,
             md5('AUD0' || text) AS hx
      FROM documents
    ), d AS (
      SELECT doc_id, n_bytes,
             8000 * (1 + ('0x' || substr(hx, 1, 2))::INT % 6) AS sample_rate,
             1000 + ('0x' || substr(hx, 3, 2))::INT * 256
                  + ('0x' || substr(hx, 5, 2))::INT AS n_samples,
             ('0x' || substr(hx, 7, 2))::INT / 255.0 AS rms
      FROM h
    )
    SELECT doc_id, n_bytes,
           CAST(sample_rate AS INT) AS sample_rate,
           CAST(n_samples AS INT) AS n_samples,
           floor(CAST(n_samples AS DOUBLE) * 1000000 / sample_rate + 0.5) / 1e6
             AS duration_s,
           rms,
           'fake' AS decode_mode
    FROM d
    """,
    doc="Audio feature extraction pipeline: opaque audio binaries → "
        "mapInPandas decode → sample rate, length, duration, loudness. "
        "RIFF/WAVE bytes decode for real (stdlib wave + PCM math); the "
        "synthetic corpus routes to the deterministic fake so the oracle "
        "replays the digest math in SQL. Same Arrow 1→1 shape as "
        "mm_image_features.",
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    audio = docs.select(
        "doc_id",
        F.encode(F.concat(F.lit("AUD0"), F.col("text")), "UTF-8").alias("audio"),
    )
    return audio_features_from_binary(audio)


def audio_features_from_binary(audio: DataFrame) -> DataFrame:
    """Arrow-batched audio feature extraction over a ``(doc_id, audio
    binary)`` DataFrame. RIFF/WAVE bytes decode for real; anything else
    takes the deterministic fake (see :func:`sniff_decode_audio`)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["audio"].map(sniff_decode_audio)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["audio"].map(len).astype("int64"),
                "sample_rate": feats.map(lambda f: f["sample_rate"]).astype("int32"),
                "n_samples": feats.map(lambda f: f["n_samples"]).astype("int32"),
                "duration_s": feats.map(lambda f: f["duration_s"]),
                "rms": feats.map(lambda f: f["rms"]),
                "decode_mode": feats.map(lambda f: f["decode_mode"]),
            })

    return audio.mapInPandas(extract, schema=AUDIO_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# audio frequency-domain features (real rfft; digest fake; oracle-checked)
# ---------------------------------------------------------------------------


def audio_spectrum(data: bytes) -> dict:
    """Real frequency-domain features for RIFF/WAVE PCM: dominant
    frequency (argmax rfft magnitude bin, DC excluded) and spectral
    centroid, both in Hz rounded to 2dp via the module's tie-proof
    floor(x·100 + 0.5) rule. Channels mix down to mono before the FFT."""
    if not is_wav(data):
        raise NotImplementedError(
            "only RIFF/WAVE PCM decodes stdlib-only; other audio formats "
            "require soundfile/librosa (not installed)."
        )
    try:
        with wave.open(io.BytesIO(data), "rb") as wf:
            sample_rate = wf.getframerate()
            n_frames = wf.getnframes()
            sampwidth = wf.getsampwidth()
            n_ch = wf.getnchannels()
            raw = wf.readframes(n_frames)
        if sampwidth not in _WAV_DTYPES:
            raise NotImplementedError(
                f"unsupported WAV sample width {sampwidth}"
            )
        x = np.frombuffer(raw, dtype=_WAV_DTYPES[sampwidth]).astype(
            np.float64
        )
        if sampwidth == 1:
            x = (x - 128.0) / 128.0
        else:
            x = x / float(2 ** (8 * sampwidth - 1))
    except wave.Error:  # G.711 mu-law/A-law telephony WAV
        sample_rate, n_ch, x = _decode_law_wav(data)
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    if x.size < 2:
        raise ValueError("too few samples for a spectrum")
    mag = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(x.size, d=1.0 / sample_rate)
    dom_bin = 1 + int(np.argmax(mag[1:]))  # skip DC
    total = float(mag[1:].sum())
    centroid = float((freqs[1:] * mag[1:]).sum() / total) if total else 0.0
    return {
        "sample_rate": sample_rate,
        "n_samples": int(x.size),
        "dominant_hz": math.floor(freqs[dom_bin] * 100 + 0.5) / 100,
        "centroid_hz": math.floor(centroid * 100 + 0.5) / 100,
    }


def fake_audio_spectrum(data: bytes) -> dict:
    """Deterministic fake spectrum: digest-derived dominant bin and
    centroid fraction over the same digest-derived rate/length as
    :func:`fake_decode_audio`, SQL-replayable bit for bit."""
    d = hashlib.md5(data).digest()
    sample_rate = 8000 * (1 + d[0] % 6)
    n_samples = 1000 + d[1] * 256 + d[2]
    dom_bin = (d[4] * 256 + d[5]) % (n_samples // 2) + 1
    dominant = math.floor(dom_bin * sample_rate * 100 / n_samples + 0.5) / 100
    frac = (d[6] * 256 + d[7]) / 65535.0
    centroid = math.floor(frac * sample_rate * 50 + 0.5) / 100
    return {
        "sample_rate": sample_rate,
        "n_samples": n_samples,
        "dominant_hz": dominant,
        "centroid_hz": centroid,
    }


def sniff_audio_spectrum(data: bytes) -> dict:
    """RIFF/WAVE → real rfft spectrum; anything else → deterministic
    fake. Carries ``decode_mode`` like every mm_* feature row."""
    if is_wav(data):
        try:
            return {**audio_spectrum(data), "decode_mode": "real"}
        except _DECODE_ERRORS:
            pass
    return {**fake_audio_spectrum(data), "decode_mode": "fake"}


AUDIO_SPECTRUM_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.IntegerType()),
    T.StructField("dominant_hz", T.DoubleType()),
    T.StructField("centroid_hz", T.DoubleType()),
    T.StructField("decode_mode", T.StringType()),
])


@register(
    "mm_audio_spectrum",
    # digest replay: d[i] = hex chars (2i+1, 2i+2); float ops are written
    # in the exact same order as the Python fake so the doubles agree
    oracle="""
    WITH h AS (
      SELECT doc_id, md5('AUD0' || text) AS hx FROM documents
    ), d AS (
      SELECT doc_id,
             8000 * (1 + ('0x' || substr(hx, 1, 2))::INT % 6) AS sample_rate,
             1000 + ('0x' || substr(hx, 3, 2))::INT * 256
                  + ('0x' || substr(hx, 5, 2))::INT AS n_samples,
             ('0x' || substr(hx, 9, 2))::INT * 256
                  + ('0x' || substr(hx, 11, 2))::INT AS dom_raw,
             ('0x' || substr(hx, 13, 2))::INT * 256
                  + ('0x' || substr(hx, 15, 2))::INT AS cen_raw
      FROM h
    )
    SELECT doc_id,
           CAST(sample_rate AS INT) AS sample_rate,
           CAST(n_samples AS INT) AS n_samples,
           floor((dom_raw % (n_samples // 2) + 1) * sample_rate * 100.0
                 / n_samples + 0.5) / 100 AS dominant_hz,
           floor(cen_raw / 65535.0 * sample_rate * 50 + 0.5) / 100
             AS centroid_hz,
           'fake' AS decode_mode
    FROM d
    """,
    doc="Audio frequency-domain profiling: opaque audio binaries → "
        "mapInPandas → dominant frequency + spectral centroid (the "
        "speech/music/noise triage signals an audio-corpus curation pass "
        "keys on — hum/tone artifacts pin the dominant bin, speech sits "
        "in a centroid band). RIFF/WAVE runs a real numpy rfft; the "
        "synthetic corpus routes to the digest fake the oracle replays. "
        "Same Arrow 1→1 shape and decode_mode provenance as "
        "mm_audio_features; at 100 TB the FFT cost is per-clip "
        "embarrassingly parallel with no shuffle at all.",
)
def mm_audio_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    audio = docs.select(
        "doc_id",
        F.encode(F.concat(F.lit("AUD0"), F.col("text")), "UTF-8").alias("audio"),
    )
    return audio_spectrum_from_binary(audio)


def audio_spectrum_from_binary(audio: DataFrame) -> DataFrame:
    """Arrow-batched spectrum extraction over ``(doc_id, audio binary)``."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["audio"].map(sniff_audio_spectrum)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "sample_rate": feats.map(
                    lambda f: f["sample_rate"]).astype("int32"),
                "n_samples": feats.map(
                    lambda f: f["n_samples"]).astype("int32"),
                "dominant_hz": feats.map(lambda f: f["dominant_hz"]),
                "centroid_hz": feats.map(lambda f: f["centroid_hz"]),
                "decode_mode": feats.map(lambda f: f["decode_mode"]),
            })

    return audio.mapInPandas(extract, schema=AUDIO_SPECTRUM_SCHEMA)


# ---------------------------------------------------------------------------
# fake-video frame sampling (1→N decode shape, oracle-checked)
# ---------------------------------------------------------------------------

VIDEO_FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("ts_s", T.DoubleType()),
    T.StructField("frame_md5", T.StringType()),
    T.StructField("decode_mode", T.StringType()),
])

FRAME_SAMPLE_EVERY = 5


@register(
    "mm_video_frames",
    # frame_md5 hashes the container bytes + ':' + index — both engines
    # hash the same UTF-8 byte string, so fingerprints agree exactly.
    oracle=f"""
    WITH h AS (
      SELECT doc_id, 'VID0' || text AS vid, md5('VID0' || text) AS hx
      FROM documents
    ), meta AS (
      SELECT doc_id, vid,
             10 + ('0x' || substr(hx, 1, 2))::INT % 30 AS n_frames,
             10 + ('0x' || substr(hx, 3, 2))::INT % 20 AS fps
      FROM h
    )
    SELECT doc_id,
           CAST(idx AS INT) AS frame_idx,
           floor(CAST(idx AS DOUBLE) * 1000000 / fps + 0.5) / 1e6 AS ts_s,
           md5(vid || ':' || CAST(idx AS VARCHAR)) AS frame_md5,
           'fake' AS decode_mode
    FROM meta, unnest(range(0, n_frames, {FRAME_SAMPLE_EVERY})) AS t(idx)
    """,
    doc="Video frame-sampling pipeline: opaque video binaries → mapInPandas "
        f"decode (stubbed; deterministic fake) sampling every "
        f"{FRAME_SAMPLE_EVERY}th frame → one row per sampled frame with "
        "timestamp + content fingerprint. Exercises the 1→N Arrow batch "
        "shape (row explosion inside the UDF); at scale frames shard "
        "naturally because output partitioning follows input splits.",
)
def mm_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    videos = docs.select(
        "doc_id",
        F.encode(F.concat(F.lit("VID0"), F.col("text")), "UTF-8").alias("video"),
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["video"]):
                for fr in sniff_decode_video_frames(blob, FRAME_SAMPLE_EVERY):
                    rows.append((doc_id, fr["frame_idx"], fr["ts_s"],
                                 fr["frame_md5"], fr["decode_mode"]))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "ts_s", "frame_md5",
                         "decode_mode"],
            ).astype({"frame_idx": "int32"})

    return videos.mapInPandas(sample, schema=VIDEO_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# fake-image resize (binary→binary 1→1 shape, oracle-checked)
# ---------------------------------------------------------------------------

RESIZE_TARGET = 64


def _rgb_pixels(data: bytes):
    """(top-down RGB pixel grid (h, w, 3 uint8), maxval) for the
    stdlib-decodable raster formats, or None."""
    if is_png(data):
        try:
            return decode_png(data), 255
        except NotImplementedError:  # 16-bit / interlaced variant
            return None
    if is_jpeg(data):
        try:
            return decode_jpeg(data), 255
        except NotImplementedError:  # progressive / exotic SOF
            return None
    if is_ppm(data) and data[:2] == b"P6":
        magic, width, height, maxval, off = _ppm_header(data)
        if maxval < 256:
            return np.frombuffer(
                data, dtype=np.uint8, count=width * height * 3, offset=off
            ).reshape(height, width, 3), maxval
    if is_bmp(data):
        import struct

        (off,) = struct.unpack_from("<I", data, 10)
        width, height = struct.unpack_from("<ii", data, 18)
        (bpp,) = struct.unpack_from("<H", data, 28)
        (comp,) = struct.unpack_from("<I", data, 30)
        if bpp == 24 and comp == 0 and width > 0 and height != 0:
            n_rows = abs(height)
            stride = (width * 3 + 3) // 4 * 4
            px = np.frombuffer(data, dtype=np.uint8, count=stride * n_rows,
                               offset=off)
            rows = px.reshape(n_rows, stride)[:, : width * 3]
            if height > 0:
                rows = rows[::-1]
            return rows.reshape(n_rows, width, 3)[:, :, ::-1], 255  # BGR→RGB
    return None


def decode_and_resize(data: bytes, target: int) -> dict:
    """Real decode+resize → ``{out_w, out_h, thumb}``. 8-bit P6 PPM and
    uncompressed 24-bit BMP resize stdlib-only via nearest-neighbor
    sampling; the thumb is always emitted as a valid P6 PPM binary (one
    canonical output format regardless of input). Other formats need an
    imaging library."""
    decoded = _rgb_pixels(data)
    if decoded is not None:
        px, maxval = decoded
        height, width = px.shape[:2]
        scale = target / max(width, height)
        out_w = max(1, int(width * scale))
        out_h = max(1, int(height * scale))
        # nearest-neighbor: index the source grid at the scaled centers
        ys = np.minimum((np.arange(out_h) / scale).astype(np.int64), height - 1)
        xs = np.minimum((np.arange(out_w) / scale).astype(np.int64), width - 1)
        thumb_px = np.ascontiguousarray(px[ys][:, xs])
        header = f"P6\n{out_w} {out_h}\n{maxval}\n".encode("ascii")
        return {
            "out_w": out_w,
            "out_h": out_h,
            "thumb": header + thumb_px.tobytes(),
        }
    raise NotImplementedError(
        "only P6 PPM, uncompressed 24-bit BMP, 8-bit PNG, and baseline "
        "JPEG resize stdlib-only; "
        "other image formats require PIL/pillow (not installed). Use "
        "fake_resize_image for the deterministic test path."
    )


def sniff_resize_image(data: bytes, target: int) -> dict:
    """PPM/BMP/PNG/JPEG → real stdlib resize; anything else →
    deterministic fake. The result carries ``decode_mode``
    (``'real'``/``'fake'``)."""
    if ((is_ppm(data) and data[:2] == b"P6") or is_bmp(data)
            or is_png(data) or is_jpeg(data)):
        try:
            return {**decode_and_resize(data, target), "decode_mode": "real"}
        except _DECODE_ERRORS:  # unsupported variant OR corrupt bytes
            pass
    return {**fake_resize_image(data, target), "decode_mode": "fake"}


def fake_resize_image(data: bytes, target: int) -> dict:
    """Deterministic fake resize: output 'image' bytes are a salted md5
    chain over the input (so downstream sees a real binary column of a
    plausible thumbnail size), plus the clamped output dimensions."""
    src = fake_decode_image(data)
    scale = target / max(src["width"], src["height"])
    out_w = max(1, int(src["width"] * scale))
    out_h = max(1, int(src["height"] * scale))
    thumb = hashlib.md5(data + b":resize:" + str(target).encode()).digest()
    return {"out_w": out_w, "out_h": out_h, "thumb": thumb}


@register(
    "mm_image_resize",
    # int(w*scale) truncates toward zero exactly like DuckDB's
    # CAST(TRUNC(...) AS INT) on nonnegative doubles; the thumb bytes are
    # md5(raw || ':resize:64'), hex-comparable in SQL
    oracle=f"""
    WITH h AS (
      SELECT doc_id, 'IMG0' || text AS raw, md5('IMG0' || text) AS hx
      FROM documents
    ), dims AS (
      SELECT doc_id, raw,
             16 + ('0x' || substr(hx, 1, 2))::INT % 64 AS w,
             16 + ('0x' || substr(hx, 3, 2))::INT % 64 AS h
      FROM h
    )
    SELECT doc_id,
           CAST(TRUNC(w * ({RESIZE_TARGET}.0 / greatest(w, h))) AS INT) AS out_w,
           CAST(TRUNC(h * ({RESIZE_TARGET}.0 / greatest(w, h))) AS INT) AS out_h,
           md5(raw || ':resize:{RESIZE_TARGET}') AS thumb_md5,
           'fake' AS decode_mode
    FROM dims
    """,
    doc="Image resize pipeline: binary in → (dims, thumbnail binary) out "
        "via Arrow-batched mapInPandas — the binary→binary UDF shape a "
        "real resize uses. 8-bit P6 PPM resizes for real (stdlib "
        "nearest-neighbor, emits a valid PPM thumb); other bytes take the "
        "deterministic fake verified by md5. Aspect-preserving fit into "
        f"{RESIZE_TARGET}px.",
)
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    images = docs.select(
        "doc_id",
        F.encode(F.concat(F.lit("IMG0"), F.col("text")), "UTF-8").alias("image"),
    )
    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("thumb", T.BinaryType()),
        T.StructField("decode_mode", T.StringType()),
    ])

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = pdf["image"].map(lambda b: sniff_resize_image(b, RESIZE_TARGET))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "out_w": res.map(lambda r: r["out_w"]).astype("int32"),
                "out_h": res.map(lambda r: r["out_h"]).astype("int32"),
                "thumb": res.map(lambda r: r["thumb"]),
                "decode_mode": res.map(lambda r: r["decode_mode"]),
            })

    resized = images.mapInPandas(resize, schema=out_schema)
    # the fake thumb bytes ARE an md5 digest — hex them for the SQL oracle
    return resized.select(
        "doc_id", "out_w", "out_h",
        F.expr("lower(hex(thumb))").alias("thumb_md5"),
        "decode_mode",
    )


# ---------------------------------------------------------------------------
# cross-video frame dedup (composition: frame sampling -> exact dedup)
# ---------------------------------------------------------------------------

@register(
    "mm_frame_dedup",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, 'VID0' || text AS vid, md5('VID0' || text) AS hx
      FROM documents
    ), meta AS (
      SELECT doc_id, vid,
             10 + ('0x' || substr(hx, 1, 2))::INT % 30 AS n_frames
      FROM h
    ), frames AS (
      SELECT doc_id, CAST(idx AS INT) AS frame_idx,
             md5(vid || ':' || CAST(idx AS VARCHAR)) AS frame_md5
      FROM meta, unnest(range(0, n_frames, {FRAME_SAMPLE_EVERY})) AS t(idx)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(COUNT(DISTINCT frame_md5) AS BIGINT) AS n_distinct,
           CAST(COUNT(*) - COUNT(DISTINCT frame_md5) AS BIGINT)
             AS n_redundant,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_videos,
           CAST(COUNT(*) AS BIGINT) AS n_fake_decoded
    FROM frames
    """,
    doc="Cross-video frame redundancy accounting: the frame-sampling "
        "pipeline's content fingerprints deduplicated globally — the "
        "multimodal twin of exact text dedup. One shuffle on frame_md5 "
        "(partial distinct-aggregation map-side) over the 1->N exploded "
        "frame stream; at 100 TB this is the standard sharded-by-hash "
        "dedup shape, and the summary is what a storage-planning pass "
        "reads before deciding to collapse frame blobs.",
)
def mm_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = mm_video_frames(spark, sf_dir)
    return frames.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_frames"),
        F.expr("CAST(COUNT(DISTINCT frame_md5) AS BIGINT)").alias("n_distinct"),
        F.expr(
            "CAST(COUNT(*) - COUNT(DISTINCT frame_md5) AS BIGINT)"
        ).alias("n_redundant"),
        F.expr("CAST(COUNT(DISTINCT doc_id) AS BIGINT)").alias("n_videos"),
        F.expr(
            "CAST(COUNT(*) FILTER (WHERE decode_mode = 'fake') AS BIGINT)"
        ).alias("n_fake_decoded"),
    )


# ---------------------------------------------------------------------------
# voice-activity detection (energy gating) — the speech-data curation gate
# ---------------------------------------------------------------------------

VAD_FRAME = 512            # samples per VAD frame
VAD_RMS_THRESHOLD = 0.1    # real path: frame is voiced when rms >= this


def audio_vad_flags(data: bytes, frame: int = VAD_FRAME) -> list:
    """Per-frame voiced/unvoiced flags. RIFF/WAVE bytes: real energy
    gating — the (channel-interleaved) PCM stream is cut into ``frame``-
    sample windows and a window is voiced when its RMS meets
    ``VAD_RMS_THRESHOLD``. Anything else: the deterministic fake — frame
    count comes from ``fake_decode_audio``'s n_samples and frame ``i`` is
    voiced when ``md5(data + b':vad:' + str(i))[0] >= 128`` (exactly
    replayable in SQL, P(voiced) = 1/2 per frame)."""
    if is_wav(data):
        with wave.open(io.BytesIO(data), "rb") as wf:
            sampwidth = wf.getsampwidth()
            raw = wf.readframes(wf.getnframes())
        if sampwidth not in _WAV_DTYPES:
            raise NotImplementedError(f"unsupported WAV sample width {sampwidth}")
        x = np.frombuffer(raw, dtype=_WAV_DTYPES[sampwidth]).astype(np.float64)
        if sampwidth == 1:
            x = (x - 128.0) / 128.0
        else:
            x = x / float(2 ** (8 * sampwidth - 1))
        n_frames = x.size // frame
        if n_frames == 0:
            return []
        w = x[: n_frames * frame].reshape(n_frames, frame)
        rms = np.sqrt(np.mean(np.square(w), axis=1))
        return [bool(v) for v in rms >= VAD_RMS_THRESHOLD]
    n_frames = fake_decode_audio(data)["n_samples"] // frame
    return [
        hashlib.md5(data + b":vad:" + str(i).encode("ascii")).digest()[0] >= 128
        for i in range(n_frames)
    ]


def _longest_true_run(flags: list) -> int:
    best = cur = 0
    for v in flags:
        cur = cur + 1 if v else 0
        best = max(best, cur)
    return best


VAD_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("n_voiced", T.IntegerType()),
    T.StructField("voiced_ratio", T.DoubleType()),
    T.StructField("longest_voiced_run", T.IntegerType()),
    T.StructField("decode_mode", T.StringType()),
])


@register(
    "mm_audio_vad",
    # the fake flag for frame i replays as one md5 over the same bytes in
    # SQL; voicedness is an INTEGER byte compare (>= 128), the run length
    # is the classic gaps-and-islands window, and the only float — the
    # voiced ratio — uses the module's tie-proof floor(x*1e6+0.5) rounding
    oracle=f"""
    WITH h AS (
      SELECT doc_id, text, md5('AUD0' || text) AS hx FROM documents
    ),
    d AS (
      SELECT doc_id, text,
             (1000 + ('0x' || substr(hx, 3, 2))::INT * 256
                   + ('0x' || substr(hx, 5, 2))::INT) // {VAD_FRAME} AS n_frames
      FROM h
    ),
    frames AS (
      SELECT doc_id, n_frames,
             unnest(range(n_frames)) AS i
      FROM d
    ),
    flagged AS (
      SELECT doc_id, n_frames, i,
             ('0x' || substr(md5('AUD0' || text || ':vad:' || i), 1, 2))::INT
               >= 128 AS voiced
      FROM frames JOIN h USING (doc_id)
    ),
    runs AS (
      SELECT doc_id, i - ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY i) AS grp
      FROM flagged WHERE voiced
    ),
    runlen AS (
      SELECT doc_id, MAX(cnt) AS longest FROM (
        SELECT doc_id, grp, COUNT(*) AS cnt FROM runs GROUP BY doc_id, grp
      ) g GROUP BY doc_id
    ),
    agg AS (
      SELECT doc_id, MAX(n_frames) AS n_frames,
             CAST(COUNT(*) FILTER (voiced) AS INT) AS n_voiced
      FROM flagged GROUP BY doc_id
    )
    SELECT agg.doc_id,
           CAST(agg.n_frames AS INT) AS n_frames,
           agg.n_voiced,
           floor(CAST(agg.n_voiced AS DOUBLE) * 1000000 / agg.n_frames + 0.5)
             / 1e6 AS voiced_ratio,
           CAST(COALESCE(runlen.longest, 0) AS INT) AS longest_voiced_run,
           'fake' AS decode_mode
    FROM agg LEFT JOIN runlen USING (doc_id)
    """,
    doc="Voice-activity detection over opaque audio binaries: each stream "
        "is cut into fixed frames and energy-gated, yielding the voiced "
        "frame count, ratio, and longest contiguous voiced run — the gate "
        "speech-data curation applies before transcription (drop silent/"
        "noise-only clips, keep clips with sustained speech). RIFF/WAVE "
        "bytes gate on real per-frame PCM RMS; the synthetic corpus takes "
        "the md5-per-frame fake so the oracle replays every flag in SQL. "
        "Arrow 1-to-1 mapInPandas, per-doc state is one bool list — no "
        "shuffle at all.",
)
def mm_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    audio = docs.select(
        "doc_id",
        F.encode(F.concat(F.lit("AUD0"), F.col("text")), "UTF-8").alias("audio"),
    )
    return audio_vad_from_binary(audio)


def audio_vad_from_binary(audio: DataFrame) -> DataFrame:
    """Arrow-batched VAD over a ``(doc_id, audio binary)`` DataFrame —
    real energy gating for WAV bytes, deterministic fake otherwise (see
    :func:`audio_vad_flags`)."""

    def gate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            flags = pdf["audio"].map(audio_vad_flags)
            n_frames = flags.map(len)
            n_voiced = flags.map(sum)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_frames": n_frames.astype("int32"),
                "n_voiced": n_voiced.astype("int32"),
                "voiced_ratio": [
                    math.floor(v * 1_000_000 / n + 0.5) / 1e6 if n else 0.0
                    for v, n in zip(n_voiced, n_frames)
                ],
                "longest_voiced_run": flags.map(_longest_true_run).astype("int32"),
                "decode_mode": pdf["audio"].map(
                    lambda b: "real" if is_wav(b) else "fake"
                ),
            })

    return audio.mapInPandas(gate, schema=VAD_SCHEMA)


# ---------------------------------------------------------------------------
# perceptual image hashing (dHash) — resize-robust near-dup signal
# ---------------------------------------------------------------------------

PHASH_COLS = 9   # sample grid: 9 columns x 8 rows -> 8x8 gradient bits
PHASH_ROWS = 8


def image_dhash(data: bytes) -> int:
    """Difference hash over a real-decodable raster (P6 PPM / 24-bit BMP):
    nearest-neighbor sample a 9x8 grayscale grid, emit one bit per
    horizontal gradient (left > right) — 64 bits that survive uniform
    brightness shifts and rescaling, the classic perceptual near-dup
    key. Non-decodable bytes take the deterministic fake (60-bit
    md5-derived value, SQL-replayable)."""
    decoded = _rgb_pixels(data)
    if decoded is None:
        return int(hashlib.md5(data + b":ph").hexdigest()[:15], 16)
    px, _maxval = decoded
    height, width = px.shape[:2]
    ys = np.minimum(
        (np.arange(PHASH_ROWS) * height) // PHASH_ROWS, height - 1
    )
    xs = np.minimum(
        (np.arange(PHASH_COLS) * width) // PHASH_COLS, width - 1
    )
    gray = px[ys][:, xs].astype(np.int64).sum(axis=2) // 3
    bits = 0
    for r in range(PHASH_ROWS):
        for c in range(PHASH_COLS - 1):
            bits = (bits << 1) | int(gray[r, c] > gray[r, c + 1])
    # two's-complement fold into signed int64: a raster whose first
    # gradient bit is set would otherwise overflow .astype('int64')
    # (environment-dependent sign-wrap vs OverflowError)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


PHASH_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("phash", T.LongType()),
    T.StructField("band", T.IntegerType()),
    T.StructField("decode_mode", T.StringType()),
])


@register(
    "mm_image_phash",
    # synthetic corpus bytes are never raster images, so every row takes
    # the md5 fake — 15 hex chars = 60 bits, always positive in BIGINT;
    # the 16-bit band is the LSH shard key for hamming-neighbor joins
    oracle="""
    SELECT doc_id,
           ('0x' || substr(md5(encode('IMG0' || text) || ':ph'), 1, 15))::BIGINT
             AS phash,
           CAST(('0x' || substr(md5(encode('IMG0' || text) || ':ph'), 1, 15))::BIGINT
                % 65536 AS INT) AS band,
           'fake' AS decode_mode
    FROM documents
    """,
    doc="Perceptual image hash (dHash): 9x8 grayscale gradient bits from "
        "real pixel sampling for decodable rasters — invariant to "
        "uniform brightness shifts and stable under rescaling, the "
        "near-dup key image dedup pipelines band into hamming-ball "
        "buckets (the emitted 16-bit band is that shard key: candidate "
        "pairs come from one shuffle on band, never all-pairs). The "
        "synthetic corpus routes to the md5 fake so the gate replays "
        "every hash in SQL; real PPM/BMP bytes hash for real through the "
        "same Arrow mapInPandas plumbing (invariance proven in pytest).",
)
def mm_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    images = docs.select(
        "doc_id",
        F.encode(F.concat(F.lit("IMG0"), F.col("text")), "UTF-8").alias("image"),
    )
    return image_phash_from_binary(images)


def image_phash_from_binary(images: DataFrame) -> DataFrame:
    """Arrow-batched dHash over a ``(doc_id, image binary)`` DataFrame."""

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ph = pdf["image"].map(image_dhash)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "phash": ph.astype("int64"),
                # Python % on the signed value keeps the unsigned low 16
                # bits (floored modulo is non-negative), so real and fake
                # hashes band identically
                "band": (ph % 65536).astype("int32"),
                "decode_mode": pdf["image"].map(
                    lambda b: "fake" if _rgb_pixels(b) is None else "real"
                ),
            })

    return images.mapInPandas(hash_batch, schema=PHASH_SCHEMA)


# ---------------------------------------------------------------------------
# scene-cut detection over sampled video frames
# ---------------------------------------------------------------------------

SCENE_CUT_DELTA = 128  # intensity jump (0..255 scale) that counts as a cut


def frame_intensity(frame: dict) -> int:
    """0..255 luminance proxy for one decoded frame: real GIF frames use
    the mean channel average (decode_gif_frames normalizes means to
    [0, 1], so scale back to the byte range); fake frames derive it from
    the first byte of the frame fingerprint (SQL-replayable)."""
    if "mean_r" in frame:
        # +0.5: round, don't truncate (255 * 60/255 floats to 59.999...)
        return int(
            255 * (frame["mean_r"] + frame["mean_g"] + frame["mean_b"]) / 3
            + 0.5
        )
    return int(frame["frame_md5"][:2], 16)


def video_scene_cuts(data: bytes) -> dict:
    """Scene-cut profile of one video: every frame's intensity is compared
    with its predecessor; a jump of SCENE_CUT_DELTA or more is a cut."""
    frames = sniff_decode_video_frames(data, 1)
    vals = [frame_intensity(fr) for fr in frames]
    cuts = sum(
        1 for a, b in zip(vals, vals[1:]) if abs(a - b) >= SCENE_CUT_DELTA
    )
    mode = frames[0]["decode_mode"] if frames else "fake"
    return {"n_frames": len(vals), "n_cuts": cuts, "decode_mode": mode}


SCENE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("n_cuts", T.IntegerType()),
    T.StructField("cut_ratio", T.DoubleType()),
    T.StructField("decode_mode", T.StringType()),
])


@register(
    "mm_video_scene_cuts",
    # fake frames: intensity = first byte of md5(vid || ':' || idx) — the
    # same fingerprint chain the mm_video_frames oracle replays; the cut
    # rule is an integer compare, the ratio uses the module's tie-proof
    # floor(x*1e6+0.5) rounding
    oracle=f"""
    WITH h AS (
      SELECT doc_id, 'VID0' || text AS vid, md5('VID0' || text) AS hx
      FROM documents
    ), meta AS (
      SELECT doc_id, vid,
             10 + ('0x' || substr(hx, 1, 2))::INT % 30 AS n_frames
      FROM h
    ),
    frames AS (
      SELECT doc_id, n_frames, idx,
             ('0x' || substr(md5(vid || ':' || CAST(idx AS VARCHAR)), 1, 2))::INT
               AS intensity
      FROM meta, unnest(range(0, n_frames)) AS t(idx)
    ),
    delta AS (
      SELECT doc_id, n_frames,
             CASE WHEN abs(intensity - LAG(intensity)
                    OVER (PARTITION BY doc_id ORDER BY idx))
                  >= {SCENE_CUT_DELTA} THEN 1 ELSE 0 END AS is_cut
      FROM frames
    )
    SELECT doc_id,
           CAST(MAX(n_frames) AS INT) AS n_frames,
           CAST(SUM(is_cut) AS INT) AS n_cuts,
           floor(CAST(SUM(is_cut) AS DOUBLE) * 1000000
                 / greatest(MAX(n_frames) - 1, 1) + 0.5) / 1e6 AS cut_ratio,
           'fake' AS decode_mode
    FROM delta GROUP BY doc_id
    """,
    doc="Scene-cut detection: consecutive-frame intensity deltas over "
        "every frame of each video, cuts where the jump reaches "
        f"{SCENE_CUT_DELTA}/255 — the shot-boundary pass video curation "
        "runs to split containers into clips and drop static/slideshow "
        "content (cut_ratio near 0) or strobe junk (near 1). Real GIF "
        "frames gate on true mean luminance; the synthetic corpus takes "
        "the md5-fingerprint fake so every delta replays in SQL. Arrow "
        "1-to-1 mapInPandas, per-doc state is one intensity list.",
)
def mm_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    videos = docs.select(
        "doc_id",
        F.encode(F.concat(F.lit("VID0"), F.col("text")), "UTF-8").alias("video"),
    )

    def profile(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            prof = pdf["video"].map(video_scene_cuts)
            n_frames = prof.map(lambda p: p["n_frames"])
            n_cuts = prof.map(lambda p: p["n_cuts"])
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_frames": n_frames.astype("int32"),
                "n_cuts": n_cuts.astype("int32"),
                "cut_ratio": [
                    math.floor(c * 1_000_000 / max(n - 1, 1) + 0.5) / 1e6
                    for c, n in zip(n_cuts, n_frames)
                ],
                "decode_mode": prof.map(lambda p: p["decode_mode"]),
            })

    return videos.mapInPandas(profile, schema=SCENE_SCHEMA)
