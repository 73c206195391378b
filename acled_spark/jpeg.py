"""Baseline JPEG codec — stdlib + numpy, no media library.

Closes the last compressed-format gap in the multimodal surface
(VERDICT r10 "What's missing" #2; the BMP/PPM/PNG codecs landed in
rounds 8/11).  Everything here is public-spec arithmetic: ITU-T T.81
(the JPEG standard — marker structure, Huffman entropy coding, Annex K
example tables) and JFIF 1.02 (the APP0 header and YCbCr matrix).
Reference counterpart: the reference pipeline produces and consumes
real rendered binaries (assets/report.py:149-523); it never ships its
own codec, so this module's shape is driven by the Spark-side need —
decode must run inside Arrow batches with no native dependency.

Scope (narrowed exactly like the PNG reader):

- :func:`encode_jpeg` writes baseline sequential JPEGs: 8-bit, YCbCr
  4:4:4 / 4:2:2 / 4:2:0 (or single-component grayscale), Annex-K
  quantization tables scaled by the libjpeg quality formula, Annex-K
  Huffman tables, optional restart intervals.
- :func:`decode_jpeg` reads baseline sequential JPEGs with 8-bit
  precision, 1 or 3 components, sampling factors 1..2 (4:4:4, 4:2:2,
  4:2:0 — nearest-neighbor chroma upsampling), multi-table DQT/DHT
  segments, DRI/RSTn restart markers, and 0xFF00 byte stuffing.
  Progressive (SOF2), arithmetic coding, 12-bit precision, 16-bit
  quant tables, and sampling factors above 2 raise the module's
  narrowed ``NotImplementedError`` — plug Pillow there.
- Malformed payloads of an accepted shape raise ``ValueError``
  (truncated segments, CRC-class garbage, out-of-table Huffman codes,
  coefficient overruns, degenerate dimensions), never a library error
  or a silent wrong image.

The DCT is lossy, so round-trip certification is a BOUND, not a byte
hash: the mm_decode_jpeg driver oracle re-derives the full 177-byte
header (SOI through SOF0, including both scaled quant tables computed
from the Annex-K bases in SQL integer arithmetic) and pins
``err_le_tol`` true; tests/test_jpeg.py pins the actual max round-trip
error well under that tolerance.
"""

from __future__ import annotations

import numpy as np

# --- public spec constants (ITU-T T.81 Annex K) ------------------------------

#: zigzag scan order: natural (row-major) index of the s-th scanned coef
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

#: Annex K.1 luminance quantization base, natural (row-major) order
BASE_QUANT_LUMA = (
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
)

#: Annex K.2 chrominance quantization base, natural order
BASE_QUANT_CHROMA = (
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
)

# Annex K.3-K.6 Huffman specs: (counts per code length 1..16, symbols)
DC_LUMA = (
    (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
DC_CHROMA = (
    (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
AC_LUMA = (
    (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D),
    (
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
    ),
)
AC_CHROMA = (
    (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77),
    (
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
    ),
)

#: decode-side pixel-count ceiling — same role as PNG_MAX_RAW_BYTES: a
#: 19-byte SOF0 can declare 65535x65535 (~12 GiB of planes) over a
#: tiny scan.  The cap prices the WORST case a passing payload can
#: still cost, not just the output bytes: a minimal entropy stream
#: (~1 bit/block) that declares the cap runs the pure-Python Huffman
#: loop over every block (~0.2 ms/block/core measured) and allocates
#: int32+float64 block arrays (~25 bytes/pixel transient).  At 4 Mpx
#: that is ~15 s CPU and ~100 MiB per hostile payload per worker —
#: bounded noise; at 16 Mpx it would be minutes, so the default stays
#: low.  Trusted pipelines decoding genuinely larger images should
#: raise this consciously (or plug Pillow, whose native loop is ~100x
#: faster).
JPEG_MAX_PIXELS = 1 << 22  # 4 Mpx == 12 MiB of RGB out

_JFIF_APP0 = (
    b"\xFF\xE0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
)


def scaled_quant_table(base: tuple[int, ...], quality: int) -> list[int]:
    """Annex-K base table -> quality-scaled table (libjpeg formula,
    natural order): scale = 5000/q below 50 else 200-2q; each entry
    (base*scale + 50) // 100, clamped to 1..255."""
    if not 1 <= quality <= 100:
        raise ValueError(f"JPEG quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [min(255, max(1, (b * scale + 50) // 100)) for b in base]


def _huff_codes(spec: tuple[tuple[int, ...], tuple[int, ...]]) -> dict:
    """Canonical Huffman assignment (T.81 C.2): symbol -> (code, length)."""
    counts, symbols = spec
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decoder(counts: list[int], symbols: list[int]) -> dict:
    """(length, code) -> symbol for the decode side.

    Rejects overfull tables (more codes at a length than the canonical
    space holds): building them silently assigns colliding codes and
    decodes garbage pixels instead of failing."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            if code >= (1 << length):
                raise ValueError(
                    f"JPEG Huffman table overfull at code length {length}"
                )
            out[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return out


_DCT_A = None


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix; forward = A @ B @ A.T."""
    global _DCT_A
    if _DCT_A is None:
        k = np.arange(8).reshape(-1, 1)
        n = np.arange(8).reshape(1, -1)
        a = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2 / 8)
        a[0, :] /= np.sqrt(2)
        _DCT_A = a
    return _DCT_A


def _magnitude(v: int) -> tuple[int, int]:
    """(category, value-bits) per T.81 F.1.2: category = bit length of
    |v|; negative values encode as v + 2^s - 1 (one's-complement)."""
    s = int(v).bit_length() if v > 0 else int(-v).bit_length()
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing (T.81 B.1.1.5)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 F.1.2.3)."""
        pad = (8 - self.nbits) % 8
        if pad:
            self.write((1 << pad) - 1, pad)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) plane (H, W multiples of 8) -> (n_blocks, 8, 8) raster order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _encode_blocks(
    writer: _BitWriter,
    zz: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    prev_dc: int,
) -> int:
    """Entropy-code one component block (zigzag int vector, 64 wide)."""
    dc = int(zz[0])
    s, bits = _magnitude(dc - prev_dc)
    code, ln = dc_codes[s]
    writer.write(code, ln)
    writer.write(bits, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL: 16 zeros
            writer.write(code, ln)
            run -= 16
        s, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | s]
        writer.write(code, ln)
        writer.write(bits, s)
        run = 0
    if run:
        code, ln = ac_codes[0x00]  # EOB
        writer.write(code, ln)
    return dc


#: supported chroma layouts: (h, v) sampling factors per component
SUBSAMPLING = {
    "4:4:4": ((1, 1), (1, 1), (1, 1)),
    "4:2:2": ((2, 1), (1, 1), (1, 1)),
    "4:2:0": ((2, 2), (1, 1), (1, 1)),
}


def _mcu_block_order(
    mcux: int, mcuy: int, hi: int, vi: int
) -> np.ndarray:
    """Raster-order block indices listed in MCU interleave order (T.81
    A.2.3): per MCU (row-major), the component's v x h blocks
    row-major within the MCU."""
    cols = mcux * hi
    idx = [
        (my * vi + by) * cols + mx * hi + bx
        for my in range(mcuy)
        for mx in range(mcux)
        for by in range(vi)
        for bx in range(hi)
    ]
    return np.array(idx)


def encode_jpeg(
    pixels: bytes,
    width: int,
    height: int,
    quality: int = 90,
    restart_interval: int = 0,
    grayscale: bool = False,
    subsampling: str = "4:4:4",
) -> bytes:
    """Write a baseline sequential JPEG (JFIF) from top-down RGB bytes.

    ``subsampling`` picks the chroma layout: "4:4:4" (one 8x8 block per
    component per MCU), "4:2:2" (2x1 luma blocks, half-width chroma),
    or "4:2:0" (2x2 luma blocks, half-width half-height chroma — the
    common camera/web shape).  Chroma planes are box-averaged down.
    Annex-K tables scaled by ``quality``; optional DRI/RSTn restart
    markers every ``restart_interval`` MCUs.  ``grayscale`` writes a
    single-component stream from the RGB input's luma (subsampling is
    then irrelevant and ignored).
    """
    if width <= 0 or height <= 0:
        raise ValueError(f"degenerate JPEG dimensions {width}x{height}")
    if len(pixels) != width * height * 3:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes; {width}x{height} RGB "
            f"needs exactly {width * height * 3}"
        )
    if restart_interval < 0 or restart_interval > 0xFFFF:
        raise ValueError(f"restart interval must be 0..65535, got {restart_interval}")
    if subsampling not in SUBSAMPLING:
        raise ValueError(
            f"subsampling must be one of {sorted(SUBSAMPLING)}, got "
            f"{subsampling!r}"
        )

    rgb = (
        np.frombuffer(pixels, dtype=np.uint8)
        .reshape(height, width, 3)
        .astype(np.float64)
    )
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    planes = [y]
    if not grayscale:
        planes.append(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0)
        planes.append(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0)
    samp = ((1, 1),) if grayscale else SUBSAMPLING[subsampling]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    n_mcu = mcux * mcuy

    q_luma = scaled_quant_table(BASE_QUANT_LUMA, quality)
    q_chroma = scaled_quant_table(BASE_QUANT_CHROMA, quality)
    zig = np.array(ZIGZAG)
    a = _dct_matrix()
    pad_h = mcuy * 8 * vmax - height
    pad_w = mcux * 8 * hmax - width

    comp_zz = []  # per component: (n_mcu * hi*vi, 64) in MCU order
    for ci, plane in enumerate(planes):
        hi, vi = samp[ci]
        qtab = np.array(q_luma if ci == 0 else q_chroma, dtype=np.float64)
        padded = np.pad(plane, ((0, pad_h), (0, pad_w)), mode="edge")
        if (hi, vi) != (hmax, vmax):
            fv, fh = vmax // vi, hmax // hi
            ph, pw = padded.shape
            padded = padded.reshape(ph // fv, fv, pw // fh, fh).mean(axis=(1, 3))
        blocks = _to_blocks(padded) - 128.0
        coef = np.einsum("ij,njk,lk->nil", a, blocks, a)
        # qtab and the flattened coefficients are both natural order;
        # zigzag reordering happens once, on the quantized ints
        quant = np.round(coef.reshape(-1, 64) / qtab).astype(np.int32)
        comp_zz.append(quant[_mcu_block_order(mcux, mcuy, hi, vi)][:, zig])
    ncomp = len(planes)

    out = bytearray(b"\xFF\xD8" + _JFIF_APP0)
    for tq, tab in ((0, q_luma), (1, q_chroma))[: (1 if grayscale else 2)]:
        out += b"\xFF\xDB" + (67).to_bytes(2, "big") + bytes([tq])
        out += bytes(tab[i] for i in ZIGZAG)  # stored in zigzag order
    sof = bytearray(
        b"\xFF\xC0"
        + (8 + 3 * ncomp).to_bytes(2, "big")
        + bytes([8])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([ncomp])
    )
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += sof
    huff_specs = [(0x00, DC_LUMA), (0x10, AC_LUMA)]
    if not grayscale:
        huff_specs += [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    for tc_th, (counts, symbols) in huff_specs:
        out += (
            b"\xFF\xC4"
            + (19 + len(symbols)).to_bytes(2, "big")
            + bytes([tc_th])
            + bytes(counts)
            + bytes(symbols)
        )
    if restart_interval:
        out += b"\xFF\xDD" + (4).to_bytes(2, "big") + restart_interval.to_bytes(2, "big")
    sos = bytearray(
        b"\xFF\xDA" + (6 + 2 * ncomp).to_bytes(2, "big") + bytes([ncomp])
    )
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += sos

    dc_codes = [_huff_codes(DC_LUMA)] + [_huff_codes(DC_CHROMA)] * (ncomp - 1)
    ac_codes = [_huff_codes(AC_LUMA)] + [_huff_codes(AC_CHROMA)] * (ncomp - 1)
    writer = _BitWriter()
    prev = [0] * ncomp
    rst = 0
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            writer.align()
            writer.buf += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            prev = [0] * ncomp
        for ci in range(ncomp):
            hi, vi = samp[ci]
            for bk in range(m * hi * vi, (m + 1) * hi * vi):
                prev[ci] = _encode_blocks(
                    writer, comp_zz[ci][bk], dc_codes[ci], ac_codes[ci], prev[ci]
                )
    writer.align()
    out += writer.buf + b"\xFF\xD9"
    return bytes(out)


# --- decode side --------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy-coded data: un-stuffs 0xFF00,
    stops at any real marker (RSTn consumed explicitly by the MCU loop)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d, p = self.data, self.pos
        if p >= len(d):
            return False
        byte = d[p]
        if byte == 0xFF:
            if p + 1 >= len(d):
                return False
            nxt = d[p + 1]
            if nxt == 0x00:
                self.pos = p + 2  # stuffed literal 0xFF
            else:
                return False  # a real marker: caller decides
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise ValueError("JPEG entropy data truncated mid-symbol")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def consume_restart(self) -> int:
        """Byte-align, then consume the RSTn marker at the cursor;
        returns n.  Raises if the stream isn't at a restart marker."""
        self.acc = 0
        self.nbits = 0
        d, p = self.data, self.pos
        if p + 1 >= len(d) or d[p] != 0xFF or not 0xD0 <= d[p + 1] <= 0xD7:
            raise ValueError(
                f"expected JPEG restart marker at byte {p}, found "
                f"{d[p:p + 2].hex() if p + 1 < len(d) else 'EOF'}"
            )
        self.pos = p + 2
        return d[p + 1] - 0xD0


def _decode_huffman(reader: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG Huffman code not in table (corrupt entropy data)")


def _extend(bits: int, s: int) -> int:
    """T.81 F.2.1.3.1: magnitude bits -> signed value."""
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def _decode_block(
    reader: _BitReader, dc_tab: dict, ac_tab: dict, prev_dc: int
) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int32)
    s = _decode_huffman(reader, dc_tab)
    if s > 11:
        raise ValueError(f"JPEG DC category {s} out of range")
    dc = prev_dc + _extend(reader.read_bits(s), s)
    zz[0] = dc
    k = 1
    while k < 64:
        rs = _decode_huffman(reader, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 0:  # EOB
                break
            if r == 15:  # ZRL
                k += 16
                if k > 64:
                    # a ZRL at k >= 49 overruns the block; accepting it
                    # desynchronizes the bit stream and decodes garbage
                    raise ValueError(
                        "JPEG AC coefficient index past 63 (corrupt scan)"
                    )
                continue
            raise ValueError(f"JPEG AC symbol {rs:#x} invalid (run without size)")
        k += r
        if k > 63:
            raise ValueError("JPEG AC coefficient index past 63 (corrupt scan)")
        zz[k] = _extend(reader.read_bits(s), s)
        k += 1
    return zz, dc


def _read_u16(data: bytes, pos: int) -> int:
    if pos + 2 > len(data):
        raise ValueError("JPEG segment truncated")
    return int.from_bytes(data[pos : pos + 2], "big")


def decode_jpeg(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline sequential JPEG to (width, height, top-down
    RGB bytes).  See the module docstring for the accepted shape and
    the narrowed ``NotImplementedError`` boundary."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}  # id -> natural-order table
    htabs: dict[tuple[int, int], dict] = {}  # (class, id) -> decoder map
    sof = None
    restart_interval = 0
    scan = None
    zig = np.array(ZIGZAG)

    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at byte {pos}")
        marker = payload[pos + 1]
        if marker == 0xFF:
            pos += 1  # fill byte (T.81 B.1.1.2: FF padding before markers)
            continue
        if marker == 0xD8:
            raise ValueError("unexpected second SOI")
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / stray RSTn: standalone markers carry no length —
            # parsing one as a segment would misread the next two bytes
            pos += 2
            continue
        ln = _read_u16(payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + ln]
        if len(seg) != ln - 2:
            raise ValueError(f"JPEG segment {marker:#x} truncated")
        if marker == 0xDB:  # DQT: one or more tables per segment
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0x0F
                if pq != 0:
                    raise NotImplementedError(
                        "16-bit JPEG quantization tables not supported "
                        "(8-bit baseline only); plug Pillow"
                    )
                if off + 65 > len(seg):
                    raise ValueError("JPEG DQT table truncated")
                tab = np.zeros(64, dtype=np.int32)
                tab[zig] = np.frombuffer(seg[off + 1 : off + 65], dtype=np.uint8)
                qtabs[tq] = tab
                off += 65
        elif marker == 0xC4:  # DHT: one or more tables per segment
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0x0F
                if off + 17 > len(seg):
                    raise ValueError("JPEG DHT counts truncated")
                counts = list(seg[off + 1 : off + 17])
                nsym = sum(counts)
                if off + 17 + nsym > len(seg):
                    raise ValueError("JPEG DHT symbols truncated")
                symbols = list(seg[off + 17 : off + 17 + nsym])
                htabs[(tc, th)] = _huff_decoder(counts, symbols)
                off += 17 + nsym
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            sof = seg
        elif marker == 0xC2:
            raise NotImplementedError(
                "progressive JPEG (SOF2) not supported; plug Pillow"
            )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG coding process SOF{marker - 0xC0} (lossless/"
                "arithmetic/hierarchical) not supported; plug Pillow"
            )
        elif marker == 0xDD:  # DRI
            if ln != 4:
                raise ValueError("JPEG DRI segment malformed")
            restart_interval = int.from_bytes(seg, "big")
        elif marker == 0xDA:  # SOS: entropy data follows
            scan = (seg, pos + 2 + ln)
            break
        # APPn / COM / others: skipped
        pos += 2 + ln

    if sof is None or scan is None:
        raise ValueError("JPEG missing SOF0 or SOS segment")
    if len(sof) < 6:
        raise ValueError("JPEG SOF segment truncated")
    precision = sof[0]
    height = int.from_bytes(sof[1:3], "big")
    width = int.from_bytes(sof[3:5], "big")
    ncomp = sof[5]
    if precision != 8:
        raise NotImplementedError(
            f"{precision}-bit JPEG precision not supported (8-bit only)"
        )
    if ncomp not in (1, 3):
        raise NotImplementedError(
            f"{ncomp}-component JPEG (CMYK?) not supported; plug Pillow"
        )
    if width == 0 or height == 0:
        raise ValueError(f"degenerate JPEG dimensions {width}x{height}")
    if width * height > JPEG_MAX_PIXELS:
        # bound BEFORE allocating component planes: SOF0 alone can
        # declare 65535x65535 (~12 GiB decoded) over a tiny scan
        raise ValueError(
            f"JPEG declares {width}x{height} = {width * height} pixels, "
            f"over the {JPEG_MAX_PIXELS}-pixel decode limit (JPEG_MAX_PIXELS)"
        )
    if len(sof) != 6 + 3 * ncomp:
        raise ValueError("JPEG SOF component list malformed")
    comps = []  # (cid, tq, h, v)
    for ci in range(ncomp):
        cid, sampling, tq = sof[6 + 3 * ci : 9 + 3 * ci]
        hi, vi = sampling >> 4, sampling & 0x0F
        if ncomp == 1:
            # sampling factors are meaningless in a single-component
            # scan (T.81 A.2.2: non-interleaved, MCU = one block)
            hi, vi = 1, 1
        if not (1 <= hi <= 2 and 1 <= vi <= 2):
            raise NotImplementedError(
                f"JPEG sampling factor {hi}x{vi} not supported "
                "(1..2 only — 4:4:4/4:2:2/4:2:0); plug Pillow"
            )
        if tq not in qtabs:
            raise ValueError(f"JPEG component {cid} references missing DQT {tq}")
        comps.append((cid, tq, hi, vi))
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    if any(hmax % c[2] or vmax % c[3] for c in comps):
        raise NotImplementedError(
            "non-integer JPEG sampling ratios not supported; plug Pillow"
        )

    sos, data_pos = scan
    if not sos:
        # SOS with segment length 2 carries no component count at all —
        # indexing it would surface as an opaque IndexError
        raise ValueError("JPEG SOS segment malformed")
    if sos[0] != ncomp:
        raise NotImplementedError(
            "multi-scan JPEG (SOS components != SOF components) not supported"
        )
    if len(sos) != 4 + 2 * ncomp:
        raise ValueError("JPEG SOS component list malformed")
    comp_tabs = []
    for ci in range(ncomp):
        cid, tsel = sos[1 + 2 * ci], sos[2 + 2 * ci]
        if cid != comps[ci][0]:
            # positional decode below assumes SOS lists components in
            # SOF order (the only order baseline-interleaved streams
            # use); a reordered scan would silently swap planes
            raise NotImplementedError(
                f"SOS component order differs from SOF (component "
                f"{cid} at position {ci}); plug Pillow"
            )
        td, ta = tsel >> 4, tsel & 0x0F
        if (0, td) not in htabs or (1, ta) not in htabs:
            raise ValueError(f"JPEG component {cid} references missing DHT")
        comp_tabs.append((htabs[(0, td)], htabs[(1, ta)]))

    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    n_mcu = mcux * mcuy
    reader = _BitReader(payload, data_pos)
    comp_blocks = [
        np.zeros((n_mcu * c[2] * c[3], 64), dtype=np.int32) for c in comps
    ]
    prev = [0] * ncomp
    expected_rst = 0
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            got = reader.consume_restart()
            if got != expected_rst:
                raise ValueError(
                    f"JPEG restart marker out of order: RST{got}, "
                    f"expected RST{expected_rst}"
                )
            expected_rst = (expected_rst + 1) % 8
            prev = [0] * ncomp
        for ci in range(ncomp):
            nb = comps[ci][2] * comps[ci][3]
            for bk in range(m * nb, (m + 1) * nb):
                zz, prev[ci] = _decode_block(
                    reader, comp_tabs[ci][0], comp_tabs[ci][1], prev[ci]
                )
                comp_blocks[ci][bk] = zz

    a = _dct_matrix()
    planes = []
    for ci, (_, tq, hi, vi) in enumerate(comps):
        dz = comp_blocks[ci] * qtabs[tq][zig]  # dequantize in zigzag order
        nat = np.zeros_like(dz)
        nat[:, zig] = dz
        # blocks arrive in MCU interleave order; scatter back to the
        # component plane's raster block grid
        raster = np.empty_like(nat)
        raster[_mcu_block_order(mcux, mcuy, hi, vi)] = nat
        blocks = raster.reshape(-1, 8, 8).astype(np.float64)
        spatial = np.einsum("ji,njk,kl->nil", a, blocks, a) + 128.0
        rows, cols = mcuy * vi, mcux * hi
        plane = (
            spatial.reshape(rows, cols, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(rows * 8, cols * 8)
        )
        if (hi, vi) != (hmax, vmax):
            # nearest-neighbor chroma upsampling back to full resolution
            plane = np.repeat(
                np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1
            )
        planes.append(plane[:height, :width])

    if ncomp == 1:
        y = np.clip(planes[0], 0, 255)
        rgb = np.repeat(y[..., None], 3, axis=2)
    else:
        y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
        rgb = np.stack(
            [
                y + 1.402 * cr,
                y - 0.344136 * cb - 0.714136 * cr,
                y + 1.772 * cb,
            ],
            axis=-1,
        )
        rgb = np.clip(rgb, 0, 255)
    return width, height, np.round(rgb).astype(np.uint8).tobytes()
