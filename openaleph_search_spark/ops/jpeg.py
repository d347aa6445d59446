"""Baseline JPEG (grayscale + YCbCr color, JFIF) in numpy + stdlib.

Closes the multimodal codec gap flagged in rounds 3/4: ``ops/
multimodal`` handled PPM/BMP/WAV natively but gated JPEG behind a
``decoder=`` hook. This module is that hook's in-repo implementation —
a REAL baseline-JPEG codec (ITU-T T.81 Annex F/K): 8×8 DCT,
quantization, zigzag, canonical Huffman entropy coding with the
spec's standard luminance AND chrominance tables, byte stuffing,
JFIF APP0, MCU-interleaved 3-component scans with 4:4:4 / 4:2:2 /
4:2:0 chroma subsampling and JFIF/BT.601 YCbCr↔RGB. Any external
reader decodes these payloads, and the decoder accepts any
single-scan baseline JPEG (grayscale or color, any integer-ratio
sampling, multiple quant/Huffman tables), not just our encoder's
output.

Progressive (SOF2) is also supported end-to-end (T.81 Annex G,
Huffman coding): spectral selection + successive approximation on
both the encode side (libjpeg-style default scan script, EOB-run
accumulation, buffered correction bits) and the decode side (DC
first/refine, AC first/refine with EOB runs), interleaved DC scans
and non-interleaved AC scans, grayscale and color.

Restart markers (DRI/RSTn, common in camera streams) are supported
in both directions for baseline and progressive: predictors and EOB
runs reset at each byte-aligned RSTn (F.2.1.3.1). Sequential
NON-interleaved baseline (one scan per component, A.2.2) decodes and
encodes too (``encode_jpeg_color(interleaved=False)``).

4-component Adobe CMYK / YCCK (APP14 transform 0/2, inverted
storage — the scanned-document / PDF-extract shape) decodes to RGB
through the ink model, and ``encode_jpeg_cmyk`` produces fixtures.

Scope: no 2-component, no arithmetic coding, no 12-bit — those stay
on the ``decoder=`` hook (PIL at deploy time). The point is a real
end-to-end codec-format path for the Spark multimodal plumbing
(feature-extract / resize over opaque binary columns), not a libjpeg
replacement.

Pure per-payload Python is acceptable here: decode runs INSIDE
Arrow-batched ``mapInPandas`` tasks (one payload at a time is the unit
of work, same as PIL would be) — the Spark-side batching/partitioning
is unchanged.
"""
from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# tables (ITU-T T.81 Annex K) + DCT basis
# ---------------------------------------------------------------------------

# standard luminance DC table: BITS (#codes per length 1..16), HUFFVAL
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))

# standard luminance AC table
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# standard chrominance DC table (Annex K.3.2)
_DCC_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DCC_VALS = list(range(12))

# standard chrominance AC table
_ACC_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_ACC_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# near-lossless quant table (all ones): error comes only from DCT
# coefficient rounding (~±2 levels) — tight decode-parity fixtures
_QUANT_UNITY = np.ones(64, dtype=np.int64)


def _zigzag_order() -> list[tuple[int, int]]:
    out = []
    for s in range(15):
        pts = [(r, s - r) for r in range(max(0, s - 7), min(7, s) + 1)]
        if s % 2 == 0:
            pts = pts[::-1]
        out += pts
    return out


_ZZ = _zigzag_order()
_ZZ_IDX = np.array([r * 8 + c for r, c in _ZZ], dtype=np.int64)
_INV_ZZ = np.argsort(_ZZ_IDX)

# orthonormal 8-point DCT-II basis (JPEG A.3.3 definition)
_C = np.array([[np.sqrt((1.0 if u == 0 else 2.0) / 8.0)
                * np.cos((2 * x + 1) * u * np.pi / 16.0)
                for x in range(8)] for u in range(8)])


def _canonical_codes(bits: list[int], vals: list[int]):
    """BITS/HUFFVAL → {symbol: (code, length)} (T.81 Annex C)."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)
_DCC_CODES = _canonical_codes(_DCC_BITS, _DCC_VALS)
_ACC_CODES = _canonical_codes(_ACC_BITS, _ACC_VALS)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (F.1.2.3)
                self.out.append(0x00)

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _dht_segment(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _fdct_zz(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (multiples of 8) → (nbh, nbw, 64) zigzagged
    int coefficients (unity quantization), all blocks batched."""
    ph, pw = plane.shape
    blocks = (plane.reshape(ph // 8, 8, pw // 8, 8)
              .transpose(0, 2, 1, 3) - 128.0)
    coefs = np.einsum("ux,bixy,vy->biuv", _C, blocks, _C)
    return (np.round(coefs).astype(np.int64).reshape(-1, 64)[:, _ZZ_IDX]
            .reshape(ph // 8, pw // 8, 64))


def _encode_block(bw: _BitWriter, zz: np.ndarray, prev_dc: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    """Entropy-code one zigzagged block; returns the new DC
    predictor."""
    diff = int(zz[0]) - prev_dc
    size = _category(diff)
    code, ln = dc_codes[size]
    bw.write(code, ln)
    if size:
        bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    nz = np.flatnonzero(zz[1:])
    last = int(nz[-1]) + 1 if nz.size else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size = _category(v)
        code, ln = ac_codes[(run << 4) | size]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def _rst_marker(bw: _BitWriter, n: int):
    """Flush to a byte boundary and splice in the RSTn marker."""
    bw.flush()
    bw.out += bytes([0xFF, 0xD0 + n % 8])


def _dri_segment(ri: int) -> bytes:
    return b"\xff\xdd" + struct.pack(">HH", 4, ri)


def encode_jpeg_gray(img: np.ndarray, restart_interval: int = 0
                     ) -> bytes:
    """(H, W) or (H, W, 3) uint8 → baseline grayscale JFIF bytes.
    RGB input is converted via BT.601 luma (rounded).
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers
    every that-many MCUs (error-resilient streams; camera-style)."""
    if img.ndim == 3:
        img = np.round(
            img.astype(np.float64) @ [0.299, 0.587, 0.114]
        ).clip(0, 255).astype(np.uint8)
    h, w = img.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(img, ((0, ph - h), (0, pw - w)),
                    mode="edge").astype(np.float64)
    q = _fdct_zz(padded).reshape(-1, 64)

    bw = _BitWriter()
    prev_dc = 0
    for b, zz in enumerate(q):
        if restart_interval and b and b % restart_interval == 0:
            _rst_marker(bw, b // restart_interval - 1)
            prev_dc = 0
        prev_dc = _encode_block(bw, zz, prev_dc, _DC_CODES, _AC_CODES)
    bw.flush()

    parts = [
        b"\xff\xd8",  # SOI
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00",
        b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
        + bytes(int(x) for x in _QUANT_UNITY),  # DQT, 8-bit, table 0
        b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", h, w) + b"\x01" + b"\x01\x11\x00",  # SOF0
        _dht_segment(0x00, _DC_BITS, _DC_VALS),
        _dht_segment(0x10, _AC_BITS, _AC_VALS),
        b"\xff\xda" + struct.pack(">H", 8) + b"\x01" + b"\x01\x00"
        + b"\x00\x3f\x00",  # SOS
        bytes(bw.out),
        b"\xff\xd9",  # EOI
    ]
    if restart_interval:
        parts.insert(-3, _dri_segment(restart_interval))
    return b"".join(parts)


_SUBSAMPLING = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}


def _ycbcr_zz(img: np.ndarray, subsampling: str):
    """(H, W, 3) uint8 RGB → (h, w, sh, sv, {y/cb/cr: zigzag block
    array}): JFIF/BT.601 YCbCr, MCU padding, chroma box-averaged to
    the subsampled grid, forward DCT. Shared by the baseline and
    progressive color encoders."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected (H, W, 3) RGB")
    sh, sv = _SUBSAMPLING[subsampling]
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    r, g, b = (img[..., c].astype(np.float64) for c in range(3))
    planes_full = {
        "y": 0.299 * r + 0.587 * g + 0.114 * b,
        "cb": 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b,
        "cr": 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b,
    }
    mh, mw = 8 * sv, 8 * sh  # MCU pixel size
    ph, pw = -(-h // mh) * mh, -(-w // mw) * mw
    pad = {k: np.pad(v, ((0, ph - h), (0, pw - w)), mode="edge")
           for k, v in planes_full.items()}
    # chroma box-average to the subsampled grid (multiples of 8 by
    # construction of the MCU padding)
    sub = {"y": pad["y"]}
    for k in ("cb", "cr"):
        c = pad[k]
        sub[k] = c.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
    return h, w, sh, sv, {k: _fdct_zz(v) for k, v in sub.items()}


def encode_jpeg_color(img: np.ndarray,
                      subsampling: str = "4:2:0",
                      restart_interval: int = 0,
                      interleaved: bool = True) -> bytes:
    """(H, W, 3) uint8 RGB → baseline color JFIF bytes: JFIF/BT.601
    YCbCr, chroma box-subsampled per ``subsampling`` (4:4:4 / 4:2:2 /
    4:2:0), standard luminance tables for Y and standard chrominance
    tables for Cb/Cr (Annex K), unity quantization (tables 0/1) for
    tight decode-parity fixtures. ``restart_interval`` > 0 emits DRI
    + RSTn every that-many MCUs (interleaved) / blocks (sequential).
    ``interleaved=False`` writes the sequential NON-interleaved
    layout instead: one full scan per component (A.2.2)."""
    h, w, sh, sv, zz = _ycbcr_zz(img, subsampling)
    mcuy, mcux = zz["y"].shape[0] // sv, zz["y"].shape[1] // sh

    scans: list[bytes] = []  # (SOS header + entropy) per scan
    if interleaved:
        bw = _BitWriter()
        prev = {"y": 0, "cb": 0, "cr": 0}
        for my in range(mcuy):
            for mx in range(mcux):
                m = my * mcux + mx
                if restart_interval and m and m % restart_interval == 0:
                    _rst_marker(bw, m // restart_interval - 1)
                    prev = {"y": 0, "cb": 0, "cr": 0}
                for by in range(sv):
                    for bx in range(sh):
                        prev["y"] = _encode_block(
                            bw, zz["y"][my * sv + by, mx * sh + bx],
                            prev["y"], _DC_CODES, _AC_CODES)
                for k in ("cb", "cr"):
                    prev[k] = _encode_block(bw, zz[k][my, mx], prev[k],
                                            _DCC_CODES, _ACC_CODES)
        bw.flush()
        scans.append(b"\xff\xda" + struct.pack(">H", 12) + b"\x03"
                     + bytes([1, 0x00, 2, 0x11, 3, 0x11])
                     + b"\x00\x3f\x00" + bytes(bw.out))
    else:
        ch, cw = -(-h // sv), -(-w // sh)  # chroma sample dims
        comp_dims = {"y": (-(-h // 8), -(-w // 8)),
                     "cb": (-(-ch // 8), -(-cw // 8)),
                     "cr": (-(-ch // 8), -(-cw // 8))}
        tabs = {"y": (_DC_CODES, _AC_CODES, 1, 0x00),
                "cb": (_DCC_CODES, _ACC_CODES, 2, 0x11),
                "cr": (_DCC_CODES, _ACC_CODES, 3, 0x11)}
        for k in ("y", "cb", "cr"):
            dc_c, ac_c, cid, tt = tabs[k]
            nbh, nbw = comp_dims[k]
            bw = _BitWriter()
            prev_dc = 0
            for b in range(nbh * nbw):
                if restart_interval and b and b % restart_interval == 0:
                    _rst_marker(bw, b // restart_interval - 1)
                    prev_dc = 0
                prev_dc = _encode_block(bw, zz[k][b // nbw, b % nbw],
                                        prev_dc, dc_c, ac_c)
            bw.flush()
            scans.append(b"\xff\xda" + struct.pack(">H", 8) + b"\x01"
                         + bytes([cid, tt]) + b"\x00\x3f\x00"
                         + bytes(bw.out))

    samp_y = (sh << 4) | sv
    parts = [
        b"\xff\xd8",
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00",
        b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
        + bytes(int(x) for x in _QUANT_UNITY),  # DQT table 0 (Y)
        b"\xff\xdb" + struct.pack(">H", 67) + b"\x01"
        + bytes(int(x) for x in _QUANT_UNITY),  # DQT table 1 (chroma)
        b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", h, w) + b"\x03"
        + bytes([1, samp_y, 0]) + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1]),  # SOF0, 3 components
        _dht_segment(0x00, _DC_BITS, _DC_VALS),
        _dht_segment(0x10, _AC_BITS, _AC_VALS),
        _dht_segment(0x01, _DCC_BITS, _DCC_VALS),
        _dht_segment(0x11, _ACC_BITS, _ACC_VALS),
    ]
    if restart_interval:
        parts.append(_dri_segment(restart_interval))
    parts += scans
    parts.append(b"\xff\xd9")
    return b"".join(parts)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.i = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.i >= len(self.data):
                raise ValueError("truncated entropy stream")
            byte = self.data[self.i]
            self.i += 1
            if byte == 0xFF:
                nxt = self.data[self.i] if self.i < len(self.data) else None
                if nxt == 0x00:
                    self.i += 1  # stuffed
                else:
                    raise ValueError("unexpected marker in scan")
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self):
        """Byte-align and consume one RSTn marker (F.2.1.3.1). The
        caller resets its DC predictors / EOB-run state."""
        self.nbits = 0
        if (self.i + 1 < len(self.data) and self.data[self.i] == 0xFF
                and 0xD0 <= self.data[self.i + 1] <= 0xD7):
            self.i += 2
        else:
            raise ValueError("expected restart marker")


class _HuffDecoder:
    def __init__(self, bits: list[int], vals: list[int]):
        # per-length (mincode, maxcode, first value index) — F.2.2.3
        self.min_c, self.max_c, self.val_ptr = {}, {}, {}
        self.vals = vals
        code, k = 0, 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.val_ptr[length] = k
                self.min_c[length] = code
                self.max_c[length] = code + n - 1
                code += n
                k += n
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code, length = 0, 0
        while True:
            code = (code << 1) | br.bit()
            length += 1
            if length > 16:
                raise ValueError("invalid Huffman code")
            mx = self.max_c.get(length)
            if mx is not None and code <= mx:
                return self.vals[self.val_ptr[length]
                                 + code - self.min_c[length]]


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_block(br: _BitReader, dc_t: _HuffDecoder, ac_t: _HuffDecoder,
                  prev_dc: int) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int64)
    size = dc_t.decode(br)
    diff = _extend(br.bits(size), size) if size else 0
    dc = prev_dc + diff
    zz[0] = dc
    k = 1
    while k < 64:
        rs = ac_t.decode(br)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run overflows block")
        zz[k] = _extend(br.bits(size), size)
        k += 1
    return zz, dc


def _idct_plane(zz_blocks: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(nbh, nbw, 64) zigzag ints × quant table → (nbh*8, nbw*8)
    float pixel plane, all blocks batched."""
    nbh, nbw = zz_blocks.shape[:2]
    coefs = ((zz_blocks.reshape(-1, 64) * q)[:, _INV_ZZ]
             .reshape(nbh, nbw, 8, 8).astype(np.float64))
    pixels = np.einsum("xu,biuv,yv->bixy", _C.T, coefs, _C.T) + 128.0
    return pixels.transpose(0, 2, 1, 3).reshape(nbh * 8, nbw * 8)


def _decode_baseline(payload: bytes):
    """Baseline (SOF0) JPEG → (h, w, [(comp, plane)]) where comp =
    {id, hs, vs} and plane is the component's own-grid uint8 raster
    (not yet upsampled). Handles the interleaved single-scan layout
    (T.81 A.2.3), single-component frames / scans as a plain 8×8
    raster (A.2.2), sequential NON-interleaved multi-scan color (one
    scan per component), and restart markers."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    i = 2
    quant: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffDecoder] = {}
    ac_tabs: dict[int, _HuffDecoder] = {}
    h = w = None
    ri = 0  # restart interval in MCUs (0 = none)
    comps: list[dict] = []
    blocks: dict[int, np.ndarray] = {}
    dims: dict[int, tuple[int, int]] = {}
    mcuy = mcux = 0
    decoded: set[int] = set()
    saw_eoi = False
    adobe = None  # APP14 color-transform byte (CMYK=0 / YCCK=2)
    while i < len(payload) - 1:
        if payload[i] != 0xFF:
            raise ValueError("marker expected")
        if payload[i + 1] == 0xFF:  # fill byte
            i += 1
            continue
        marker = payload[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            saw_eoi = True
            break
        seglen = struct.unpack_from(">H", payload, i)[0]
        if seglen < 2:  # malformed length would loop forever
            raise ValueError("invalid JPEG segment length")
        seg = payload[i + 2:i + seglen]
        i += seglen
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq:  # 16-bit table
                    quant[tq] = np.frombuffer(
                        seg, dtype=">u2", count=64, offset=j
                    ).astype(np.int64)
                    j += 128
                else:
                    quant[tq] = np.frombuffer(
                        seg, dtype=np.uint8, count=64, offset=j
                    ).astype(np.int64)
                    j += 64
        elif marker == 0xC0:  # SOF0 baseline
            h, w = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            if ncomp not in (1, 3, 4):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG unsupported; "
                    "pass decoder= (e.g. PIL)")
            comps = [{"id": seg[6 + 3 * c],
                      "hs": seg[7 + 3 * c] >> 4,
                      "vs": seg[7 + 3 * c] & 0x0F,
                      "tq": seg[8 + 3 * c]} for c in range(ncomp)]
            for c in comps:
                if c["hs"] < 1 or c["vs"] < 1:
                    raise ValueError("invalid sampling factor")
            hmax = max(c["hs"] for c in comps)
            vmax = max(c["vs"] for c in comps)
            mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
            for c in comps:
                # interleaved-padded storage; non-interleaved scans
                # cover the top-left dims[c] sub-grid (A.2.2)
                blocks[c["id"]] = np.zeros(
                    (mcuy * c["vs"], mcux * c["hs"], 64),
                    dtype=np.int64)
                cw = -(-w * c["hs"] // hmax)
                ch = -(-h * c["vs"] // vmax)
                dims[c["id"]] = (-(-ch // 8), -(-cw // 8))
        elif marker == 0xC2:
            raise _Progressive()  # handled by _decode_any
        elif marker in (0xC1, 0xC3):
            raise NotImplementedError(
                "only baseline (SOF0) / progressive (SOF2) JPEG; pass "
                "decoder= (e.g. PIL) for extended/lossless")
        elif marker == 0xC4:  # DHT (possibly several tables)
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1:j + 17])
                n = sum(bits)
                vals = list(seg[j + 17:j + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _HuffDecoder(
                    bits, vals)
                j += 17 + n
        elif marker == 0xDD:
            ri = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if h is None:
                raise ValueError("no SOF before SOS")
            ns = seg[0]
            by_id = {c["id"]: c for c in comps}
            scan = []
            for s in range(ns):
                cid, tt = seg[1 + 2 * s], seg[2 + 2 * s]
                if cid not in by_id:
                    raise ValueError("scan references unknown component")
                scan.append({**by_id[cid], "td": tt >> 4,
                             "ta": tt & 0x0F})
            for c in scan:
                if c["id"] in decoded:
                    raise ValueError("component coded twice")
                decoded.add(c["id"])
            j = _find_scan_end(payload, i)
            br = _BitReader(payload[i:j])
            i = j
            if len(scan) > 1:  # MCU-interleaved (A.2.3)
                if len(scan) != len(comps):
                    raise NotImplementedError(
                        "partially-interleaved scans unsupported")
                prev = {c["id"]: 0 for c in scan}
                for my in range(mcuy):
                    for mx in range(mcux):
                        m = my * mcux + mx
                        if ri and m and m % ri == 0:
                            br.restart()
                            prev = {c["id"]: 0 for c in scan}
                        for c in scan:
                            dc_t = dc_tabs[c["td"]]
                            ac_t = ac_tabs[c["ta"]]
                            for by in range(c["vs"]):
                                for bx in range(c["hs"]):
                                    zz, prev[c["id"]] = _decode_block(
                                        br, dc_t, ac_t, prev[c["id"]])
                                    blocks[c["id"]][my * c["vs"] + by,
                                                    mx * c["hs"] + bx] \
                                        = zz
            else:  # non-interleaved: plain 8×8 raster (A.2.2)
                c = scan[0]
                nbh, nbw = dims[c["id"]]
                arr = blocks[c["id"]]
                prev_dc = 0
                dc_t, ac_t = dc_tabs[c["td"]], ac_tabs[c["ta"]]
                for b in range(nbh * nbw):
                    if ri and b and b % ri == 0:
                        br.restart()
                        prev_dc = 0
                    zz, prev_dc = _decode_block(br, dc_t, ac_t, prev_dc)
                    arr[b // nbw, b % nbw] = zz
        elif marker == 0xEE and seg[:5] == b"Adobe":
            adobe = seg[11]  # APP14 transform: 0 CMYK, 1 YCbCr, 2 YCCK
        # other APPn/COM: skipped
    if not decoded:
        raise ValueError("no scan data" if saw_eoi or h is not None
                         else "no SOS marker")
    if decoded != {c["id"] for c in comps}:
        raise ValueError("missing component scans")
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    planes = []
    for c in comps:
        nbh, nbw = dims[c["id"]]
        plane = _idct_plane(blocks[c["id"]][:nbh, :nbw], quant[c["tq"]])
        cw = -(-w * c["hs"] // hmax)
        ch = -(-h * c["vs"] // vmax)
        planes.append((c, np.round(plane[:ch, :cw])
                       .clip(0, 255).astype(np.uint8)))
    return h, w, planes, adobe


class _Progressive(Exception):
    """Internal: baseline parser hit SOF2 — reroute to the
    progressive decoder."""


def _decode_any(payload: bytes):
    """Dispatch on the frame type: SOF0 → baseline path, SOF2 →
    progressive path. Both return the same (h, w, planes) shape."""
    try:
        return _decode_baseline(payload)
    except _Progressive:
        return _decode_progressive(payload)


# ---------------------------------------------------------------------------
# progressive (SOF2, T.81 Annex G, Huffman)
# ---------------------------------------------------------------------------

# fixed encoder-side Huffman table covering every progressive symbol
# (EOBn codes 0x10..0xE0 are NOT in the Annex K baseline tables): one
# 8-bit code + 255 9-bit codes — Kraft 2^-8 + 255·2^-9 ≈ 0.50, and the
# largest 9-bit code is 0b100000000, so no all-ones codeword. Poor
# compression, exact parity — these are codec-plumbing fixtures, not a
# rate-optimized encoder.
_FLAT_BITS = [0, 0, 0, 0, 0, 0, 0, 1, 255, 0, 0, 0, 0, 0, 0, 0]
_FLAT_VALS = list(range(256))
_FLAT_CODES = _canonical_codes(_FLAT_BITS, _FLAT_VALS)

# libjpeg's default scan scripts: spectral selection + two-level
# successive approximation, every coefficient refined down to Al=0
# (so the entropy stage stays lossless and decode parity is exact).
_PROG_SCRIPT_GRAY = (
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
)
_PROG_SCRIPT_COLOR = (
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
)


class _ScanState:
    """Per-scan progressive entropy-encoder state: the EOB-run
    accumulator plus the correction bits of completed-run blocks,
    which must be emitted right after the EOBn symbol (G.1.2.3)."""

    def __init__(self, bw: _BitWriter):
        self.bw = bw
        self.eobrun = 0
        self.be: list[int] = []

    def sym(self, s: int):
        code, ln = _FLAT_CODES[s]
        self.bw.write(code, ln)

    def flush_bits(self, bits: list[int]):
        for b in bits:
            self.bw.write(b, 1)

    def emit_eobrun(self):
        if self.eobrun:
            n = self.eobrun.bit_length() - 1
            self.sym(n << 4)
            if n:
                self.bw.write(self.eobrun & ((1 << n) - 1), n)
            self.eobrun = 0
            self.flush_bits(self.be)
            self.be = []


def _enc_dc_prog(st: _ScanState, dc: int, cid: int, pred: dict,
                 ah: int, al: int):
    if ah == 0:  # first scan: diff-code the point-transformed DC
        shifted = dc >> al  # arithmetic shift, matches decode << al
        diff = shifted - pred[cid]
        pred[cid] = shifted
        size = _category(diff)
        st.sym(size)
        if size:
            st.bw.write(diff if diff > 0 else diff + (1 << size) - 1,
                        size)
    else:  # refinement: one low-order bit per block
        st.bw.write((dc >> al) & 1, 1)


def _enc_ac_first_block(st: _ScanState, zz: np.ndarray, ss: int,
                        se: int, al: int):
    """AC first scan for one block (G.1.2.2): run/size coding of the
    point-transformed band with cross-block EOB runs."""
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        m = abs(v) >> al
        if m == 0:
            r += 1
            continue
        st.emit_eobrun()
        while r > 15:
            st.sym(0xF0)
            r -= 16
        size = m.bit_length()
        st.sym((r << 4) | size)
        st.bw.write(m if v > 0 else (1 << size) - 1 - m, size)
        r = 0
    if r > 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.emit_eobrun()


def _enc_ac_refine_block(st: _ScanState, zz: np.ndarray, ss: int,
                         se: int, al: int):
    """AC refinement scan for one block (G.1.2.3): newly-nonzero
    coefficients carry run/1 + sign; already-nonzero ones contribute
    buffered correction bits emitted after the next symbol."""
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob_k = ss - 1  # position of the last newly-nonzero coefficient
    for i, a in enumerate(absv):
        if a == 1:
            eob_k = ss + i
    r = 0
    br: list[int] = []  # correction bits since the last symbol
    for k in range(ss, se + 1):
        a = absv[k - ss]
        if a == 0:
            r += 1
            continue
        while r > 15 and k <= eob_k:
            st.emit_eobrun()
            st.sym(0xF0)
            r -= 16
            st.flush_bits(br)
            br = []
        if a > 1:  # history coefficient: buffer its low-order bit
            br.append(a & 1)
            continue
        st.emit_eobrun()
        st.sym((r << 4) | 1)
        st.bw.write(1 if int(zz[k]) > 0 else 0, 1)
        st.flush_bits(br)
        br = []
        r = 0
    if r > 0 or br:
        st.eobrun += 1
        st.be.extend(br)
        if st.eobrun == 0x7FFF:
            st.emit_eobrun()


def encode_jpeg_progressive(img: np.ndarray,
                            subsampling: str = "4:2:0",
                            scans=None,
                            restart_interval: int = 0) -> bytes:
    """(H, W) grayscale or (H, W, 3) RGB uint8 → progressive (SOF2)
    JFIF bytes. Same color model, padding, and unity quantization as
    the baseline encoders — only the entropy stage differs, so the
    decoded coefficients are bit-identical to the baseline encoding
    of the same image. ``scans`` overrides the libjpeg-style default
    scan script: a sequence of (comp_indices, Ss, Se, Ah, Al).
    ``restart_interval`` > 0 emits DRI + RSTn every that-many MCUs
    (interleaved DC scans) / blocks (non-interleaved scans), flushing
    the EOB run at each boundary (G.1.2.3)."""
    img = np.asarray(img)
    if img.ndim == 2:
        h, w = img.shape
        if h == 0 or w == 0:
            raise ValueError("empty image")
        ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
        padded = np.pad(img, ((0, ph - h), (0, pw - w)),
                        mode="edge").astype(np.float64)
        zzs = [_fdct_zz(padded)]
        samp = [(1, 1)]
        script = scans or _PROG_SCRIPT_GRAY
    else:
        h, w, sh, sv, zzd = _ycbcr_zz(img, subsampling)
        zzs = [zzd["y"], zzd["cb"], zzd["cr"]]
        samp = [(sh, sv), (1, 1), (1, 1)]
        script = scans or _PROG_SCRIPT_COLOR
    ncomp = len(zzs)
    hmax = max(s for s, _ in samp)
    vmax = max(v for _, v in samp)
    nb = []  # per-component non-interleaved block dims (A.2.2)
    for cs_h, cs_v in samp:
        cw, ch = -(-w * cs_h // hmax), -(-h * cs_v // vmax)
        nb.append((-(-ch // 8), -(-cw // 8)))

    parts = [
        b"\xff\xd8",
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00",
    ]
    for t in range(1 if ncomp == 1 else 2):
        parts.append(b"\xff\xdb" + struct.pack(">H", 67) + bytes([t])
                     + bytes(int(x) for x in _QUANT_UNITY))
    sof = b"\x08" + struct.pack(">HH", h, w) + bytes([ncomp])
    for c in range(ncomp):
        cs_h, cs_v = samp[c]
        sof += bytes([c + 1, (cs_h << 4) | cs_v, min(c, 1)])
    parts.append(b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof)
    parts.append(_dht_segment(0x00, _FLAT_BITS, _FLAT_VALS))
    parts.append(_dht_segment(0x10, _FLAT_BITS, _FLAT_VALS))
    if restart_interval:
        parts.append(_dri_segment(restart_interval))

    for cs, ss, se, ah, al in script:
        bw = _BitWriter()
        st = _ScanState(bw)

        def maybe_restart(m, pred):
            if restart_interval and m and m % restart_interval == 0:
                st.emit_eobrun()
                _rst_marker(bw, m // restart_interval - 1)
                for c in pred:
                    pred[c] = 0

        if ss == 0:  # DC scan (interleaved when multi-component)
            if se != 0:
                raise ValueError("DC scan must have Se == 0")
            pred = {c: 0 for c in cs}
            if len(cs) > 1:
                mcuy = zzs[0].shape[0] // samp[0][1]
                mcux = zzs[0].shape[1] // samp[0][0]
                for my in range(mcuy):
                    for mx in range(mcux):
                        maybe_restart(my * mcux + mx, pred)
                        for c in cs:
                            cs_h, cs_v = samp[c]
                            for by in range(cs_v):
                                for bx in range(cs_h):
                                    _enc_dc_prog(
                                        st,
                                        int(zzs[c][my * cs_v + by,
                                                   mx * cs_h + bx, 0]),
                                        c, pred, ah, al)
            else:
                c = cs[0]
                nbh, nbw = nb[c]
                for b in range(nbh * nbw):
                    maybe_restart(b, pred)
                    _enc_dc_prog(st, int(zzs[c][b // nbw, b % nbw, 0]),
                                 c, pred, ah, al)
        else:  # AC scan: single component, non-interleaved
            if len(cs) != 1:
                raise ValueError("AC scan must be single-component")
            c = cs[0]
            nbh, nbw = nb[c]
            pred = {}
            for b in range(nbh * nbw):
                maybe_restart(b, pred)
                blk = zzs[c][b // nbw, b % nbw]
                if ah == 0:
                    _enc_ac_first_block(st, blk, ss, se, al)
                else:
                    _enc_ac_refine_block(st, blk, ss, se, al)
            st.emit_eobrun()
        bw.flush()
        sos = bytes([len(cs)])
        for c in cs:
            sos += bytes([c + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        parts.append(b"\xff\xda" + struct.pack(">H", len(sos) + 2)
                     + sos)
        parts.append(bytes(bw.out))
    parts.append(b"\xff\xd9")
    return b"".join(parts)


def _dec_dc_prog(br: _BitReader, blk: np.ndarray, c: dict, pred: dict,
                 ah: int, al: int, dc_tabs: dict):
    if ah == 0:
        size = dc_tabs[c["td"]].decode(br)
        diff = _extend(br.bits(size), size) if size else 0
        pred[c["id"]] += diff
        blk[0] = pred[c["id"]] << al
    else:
        if br.bit():
            blk[0] |= 1 << al  # two's-complement OR, sign preserved


def _dec_ac_first_block(br: _BitReader, ac_t: _HuffDecoder,
                        blk: np.ndarray, ss: int, se: int, al: int,
                        eobrun: int) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = ac_t.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:  # EOBn: run of (1<<r)+bits(r) all-zero bands
                eobrun = 1 << r
                if r:
                    eobrun += br.bits(r)
                return eobrun - 1
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run overflows band")
        blk[k] = _extend(br.bits(s), s) << al
        k += 1
    return 0


def _dec_ac_refine_block(br: _BitReader, ac_t: _HuffDecoder,
                         blk: np.ndarray, ss: int, se: int, al: int,
                         eobrun: int) -> int:
    """One block of an AC successive-approximation refinement scan
    (T.81 G.2 / the standard decode_mcu_AC_refine control flow)."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = ac_t.decode(br)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s:
                if s != 1:
                    raise ValueError("AC refine size must be 1")
                val = p1 if br.bit() else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += br.bits(r)
                break
            # advance over r zero-history coefficients, reading a
            # correction bit at every nonzero-history one passed
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if br.bit() and (v & p1) == 0:
                        blk[k] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                if k > se:
                    raise ValueError("AC refine overflows band")
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # rest of the band: corrections only
            v = int(blk[k])
            if v != 0:
                if br.bit() and (v & p1) == 0:
                    blk[k] = v + (p1 if v >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _find_scan_end(payload: bytes, i: int) -> int:
    """First offset ≥ i holding a real marker (not stuffed 0x00, not
    a 0xFF fill byte, not an in-scan RSTn restart marker)."""
    n = len(payload)
    j = i
    while j < n - 1:
        if payload[j] == 0xFF:
            nxt = payload[j + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                j += 2
                continue
            if nxt == 0xFF:
                j += 1
                continue
            return j
        j += 1
    return n


def _decode_progressive(payload: bytes):
    """Progressive (SOF2, Huffman) JPEG → (h, w, [(comp, plane)]) in
    the same shape `_decode_baseline` returns: coefficients are
    accumulated across every scan (DC/AC, first/refine, interleaved
    DC and non-interleaved AC), then dequantized + IDCT'd once."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    i = 2
    quant: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffDecoder] = {}
    ac_tabs: dict[int, _HuffDecoder] = {}
    h = w = None
    ri = 0  # restart interval (MCUs / blocks per scan unit)
    comps: list[dict] = []
    coef: dict[int, np.ndarray] = {}
    dims: dict[int, tuple[int, int]] = {}
    mcuy = mcux = 0
    saw_scan = False
    adobe = None
    while i < len(payload) - 1:
        if payload[i] != 0xFF:
            raise ValueError("marker expected")
        if payload[i + 1] == 0xFF:  # fill byte
            i += 1
            continue
        marker = payload[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        seglen = struct.unpack_from(">H", payload, i)[0]
        if seglen < 2:
            raise ValueError("invalid JPEG segment length")
        seg = payload[i + 2:i + seglen]
        i += seglen
        if marker == 0xDB:
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq:
                    quant[tq] = np.frombuffer(
                        seg, dtype=">u2", count=64, offset=j
                    ).astype(np.int64)
                    j += 128
                else:
                    quant[tq] = np.frombuffer(
                        seg, dtype=np.uint8, count=64, offset=j
                    ).astype(np.int64)
                    j += 64
        elif marker == 0xC4:
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1:j + 17])
                n = sum(bits)
                vals = list(seg[j + 17:j + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _HuffDecoder(
                    bits, vals)
                j += 17 + n
        elif marker == 0xDD:
            ri = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xC2:
            h, w = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            if ncomp not in (1, 3, 4):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG unsupported; pass decoder=")
            comps = [{"id": seg[6 + 3 * c],
                      "hs": seg[7 + 3 * c] >> 4,
                      "vs": seg[7 + 3 * c] & 0x0F,
                      "tq": seg[8 + 3 * c]} for c in range(ncomp)]
            hmax = max(c["hs"] for c in comps)
            vmax = max(c["vs"] for c in comps)
            if any(c["hs"] < 1 or c["vs"] < 1 for c in comps):
                raise ValueError("invalid sampling factor")
            mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
            for c in comps:
                # interleaved-padded storage; non-interleaved scans
                # cover the top-left dims[c] sub-grid (A.2.2)
                coef[c["id"]] = np.zeros(
                    (mcuy * c["vs"], mcux * c["hs"], 64), dtype=np.int64)
                cw = -(-w * c["hs"] // hmax)
                ch = -(-h * c["vs"] // vmax)
                dims[c["id"]] = (-(-ch // 8), -(-cw // 8))
        elif marker in (0xC0, 0xC1, 0xC3):
            raise ValueError("mixed frame types")
        elif marker == 0xDA:
            if h is None:
                raise ValueError("no SOF before SOS")
            ns = seg[0]
            by_id = {c["id"]: c for c in comps}
            scan = []
            for s in range(ns):
                cid, tt = seg[1 + 2 * s], seg[2 + 2 * s]
                if cid not in by_id:
                    raise ValueError("scan references unknown component")
                scan.append({**by_id[cid], "td": tt >> 4,
                             "ta": tt & 0x0F})
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            j = _find_scan_end(payload, i)
            br = _BitReader(payload[i:j])
            i = j
            saw_scan = True
            if ss == 0:  # DC scan
                if se != 0:
                    raise ValueError("DC scan with Se != 0")
                pred = {c["id"]: 0 for c in scan}
                if len(scan) > 1:
                    for my in range(mcuy):
                        for mx in range(mcux):
                            m = my * mcux + mx
                            if ri and m and m % ri == 0:
                                br.restart()
                                pred = {c["id"]: 0 for c in scan}
                            for c in scan:
                                arr = coef[c["id"]]
                                for by in range(c["vs"]):
                                    for bx in range(c["hs"]):
                                        _dec_dc_prog(
                                            br,
                                            arr[my * c["vs"] + by,
                                                mx * c["hs"] + bx],
                                            c, pred, ah, al, dc_tabs)
                else:
                    c = scan[0]
                    nbh, nbw = dims[c["id"]]
                    arr = coef[c["id"]]
                    for b in range(nbh * nbw):
                        if ri and b and b % ri == 0:
                            br.restart()
                            pred = {c["id"]: 0 for c in scan}
                        _dec_dc_prog(br, arr[b // nbw, b % nbw], c,
                                     pred, ah, al, dc_tabs)
            else:  # AC scan: always non-interleaved
                if len(scan) != 1:
                    raise ValueError("AC scan must be single-component")
                c = scan[0]
                nbh, nbw = dims[c["id"]]
                arr = coef[c["id"]]
                ac_t = ac_tabs[c["ta"]]
                eobrun = 0
                for b in range(nbh * nbw):
                    if ri and b and b % ri == 0:
                        br.restart()
                        eobrun = 0
                    blk = arr[b // nbw, b % nbw]
                    if ah == 0:
                        eobrun = _dec_ac_first_block(
                            br, ac_t, blk, ss, se, al, eobrun)
                    else:
                        eobrun = _dec_ac_refine_block(
                            br, ac_t, blk, ss, se, al, eobrun)
        elif marker == 0xEE and seg[:5] == b"Adobe":
            adobe = seg[11]
    if not saw_scan:
        raise ValueError("no scan data")
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    planes = []
    for c in comps:
        nbh, nbw = dims[c["id"]]
        plane = _idct_plane(coef[c["id"]][:nbh, :nbw], quant[c["tq"]])
        cw = -(-w * c["hs"] // hmax)
        ch = -(-h * c["vs"] // vmax)
        planes.append((c, np.round(plane[:ch, :cw])
                       .clip(0, 255).astype(np.uint8)))
    return h, w, planes, adobe


def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """Single-component JPEG (baseline or progressive) → (H, W)
    uint8. Accepts any single-scan grayscale baseline JPEG (not just
    ours); color JPEG decodes via :func:`decode_jpeg` and converts to
    BT.601 luma."""
    h, w, planes, _ = _decode_any(payload)
    if len(planes) == 1:
        return planes[0][1]
    rgb = decode_jpeg(payload).astype(np.float64)
    return np.round(rgb @ [0.299, 0.587, 0.114]).clip(0, 255) \
             .astype(np.uint8)


def _ycbcr_to_rgb(y, cb, cr):
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return r, g, b


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG (baseline SOF0 or progressive SOF2) → (H, W, 3) uint8
    RGB: grayscale replicates the luma plane; 3-component (4:4:4 /
    4:2:2 / 4:2:0 and any other integer-ratio sampling) upsamples
    chroma to the luma grid (sample replication) and converts
    JFIF/BT.601 YCbCr → RGB; 4-component Adobe CMYK / YCCK (APP14
    transform 0 / 2, inverted storage) converts through the ink
    model (R = c'·k'/255)."""
    h, w, planes, adobe = _decode_any(payload)
    if len(planes) == 1:
        g = planes[0][1]
        return np.repeat(g[:, :, None], 3, axis=2)
    hmax = max(c["hs"] for c, _ in planes)
    vmax = max(c["vs"] for c, _ in planes)
    up = []
    for c, p in planes:
        if hmax % c["hs"] or vmax % c["vs"]:
            raise NotImplementedError(
                "non-integer chroma sampling ratio unsupported")
        rep = np.repeat(np.repeat(p, vmax // c["vs"], axis=0),
                        hmax // c["hs"], axis=1)[:h, :w]
        up.append(rep.astype(np.float64))
    if len(up) == 4:  # Adobe CMYK (stored inverted, the common case)
        if adobe == 2:  # YCCK: first 3 channels are YCbCr of c,m,y
            c_, m_, y_ = _ycbcr_to_rgb(*up[:3])
        else:  # transform 0 / absent: plain inverted CMY
            c_, m_, y_ = up[0], up[1], up[2]
        k_ = up[3]
        rgb = np.stack([ch * k_ / 255.0 for ch in (c_, m_, y_)],
                       axis=-1)
        return np.round(rgb).clip(0, 255).astype(np.uint8)
    y, cb, cr = up  # SOF component order is Y, Cb, Cr (JFIF)
    r, g, b = _ycbcr_to_rgb(y, cb, cr)
    return (np.round(np.stack([r, g, b], axis=-1))
            .clip(0, 255).astype(np.uint8))


def encode_jpeg_cmyk(img: np.ndarray, transform: int = 0,
                     restart_interval: int = 0) -> bytes:
    """(H, W, 3) uint8 RGB → 4-component Adobe CMYK (transform=0) or
    YCCK (transform=2) baseline JPEG, inverted storage per Adobe
    convention: k' = max(R,G,B), c' = 255·R/k' (so R = c'·k'/255).
    All components full-resolution, luminance tables, unity quant —
    the fixture path for the scanned-document corpora (PDF-extracted
    images) that arrive as CMYK JPEG."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected (H, W, 3) RGB")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    rgb = img.astype(np.float64)
    k_ = rgb.max(axis=2)
    safe_k = np.where(k_ == 0, 1.0, k_)
    cmy = np.where(k_[..., None] == 0, 0.0,
                   rgb * 255.0 / safe_k[..., None])
    if transform == 2:
        c_, m_, y_ = (cmy[..., i] for i in range(3))
        ch0 = 0.299 * c_ + 0.587 * m_ + 0.114 * y_
        ch1 = 128.0 - 0.168735892 * c_ - 0.331264108 * m_ + 0.5 * y_
        ch2 = 128.0 + 0.5 * c_ - 0.418687589 * m_ - 0.081312411 * y_
        chans = [ch0, ch1, ch2, k_]
    elif transform == 0:
        chans = [cmy[..., 0], cmy[..., 1], cmy[..., 2], k_]
    else:
        raise ValueError("transform must be 0 (CMYK) or 2 (YCCK)")
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    zzs = [_fdct_zz(np.pad(np.clip(ch, 0, 255), ((0, ph - h),
                                                 (0, pw - w)),
                           mode="edge")) for ch in chans]

    bw = _BitWriter()
    prev = [0, 0, 0, 0]
    nbh, nbw_ = ph // 8, pw // 8
    for b in range(nbh * nbw_):
        if restart_interval and b and b % restart_interval == 0:
            _rst_marker(bw, b // restart_interval - 1)
            prev = [0, 0, 0, 0]
        for ci in range(4):
            prev[ci] = _encode_block(bw, zzs[ci][b // nbw_, b % nbw_],
                                     prev[ci], _DC_CODES, _AC_CODES)
    bw.flush()

    sof = b"\x08" + struct.pack(">HH", h, w) + b"\x04"
    for ci in range(4):
        sof += bytes([ci + 1, 0x11, 0])
    sos = b"\x04"
    for ci in range(4):
        sos += bytes([ci + 1, 0x00])
    sos += b"\x00\x3f\x00"
    parts = [
        b"\xff\xd8",
        # Adobe APP14: version 100, flags 0/0, transform byte
        b"\xff\xee" + struct.pack(">H", 14) + b"Adobe"
        + struct.pack(">HHHB", 100, 0, 0, transform),
        b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
        + bytes(int(x) for x in _QUANT_UNITY),
        b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof,
        _dht_segment(0x00, _DC_BITS, _DC_VALS),
        _dht_segment(0x10, _AC_BITS, _AC_VALS),
    ]
    if restart_interval:
        parts.append(_dri_segment(restart_interval))
    parts += [b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos,
              bytes(bw.out), b"\xff\xd9"]
    return b"".join(parts)
