"""Baseline JPEG codec: round-trip bounds, determinism, restart
markers, grayscale, and the hostile-payload contract (ValueError for
malformed streams, narrowed NotImplementedError for out-of-scope
variants) — the same certification shape as the PNG suite.  The driver
oracle (mm_decode_jpeg) independently re-derives all 177 header bytes
in SQL; this file pins what SQL cannot: the actual pixel error
distribution and the failure modes."""

from __future__ import annotations

import numpy as np
import pytest

from acled_spark.jpeg import (
    AC_CHROMA,
    AC_LUMA,
    DC_CHROMA,
    DC_LUMA,
    JPEG_MAX_PIXELS,
    decode_jpeg,
    encode_jpeg,
    scaled_quant_table,
    BASE_QUANT_LUMA,
)
from acled_spark.multimodal import decode_image, decode_image_pixels


def _gradient(w: int, h: int, seed: int = 7) -> bytes:
    rng = np.random.RandomState(seed)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    base = np.stack(
        [
            xx * 255 / max(w - 1, 1),
            yy * 255 / max(h - 1, 1),
            (xx + yy) * 127 / max(w + h - 2, 1),
        ],
        axis=-1,
    )
    return np.clip(base + rng.randint(-8, 8, base.shape), 0, 255).astype(
        np.uint8
    ).tobytes()


def _noise(w: int, h: int, seed: int = 11) -> bytes:
    return np.random.RandomState(seed).randint(
        0, 256, (h, w, 3)
    ).astype(np.uint8).tobytes()


def _max_err(a: bytes, b: bytes) -> int:
    return int(
        np.abs(
            np.frombuffer(a, np.uint8).astype(int)
            - np.frombuffer(b, np.uint8).astype(int)
        ).max()
    )


@pytest.mark.parametrize("w,h", [(8, 8), (12, 8), (16, 12), (5, 3), (33, 17)])
def test_roundtrip_bound_gradient(w, h):
    """Photo-like content at q90: decoded pixels within a tight bound
    of the input (quantization noise, never structural corruption)."""
    pix = _gradient(w, h)
    dw, dh, dec = decode_jpeg(encode_jpeg(pix, w, h, quality=90))
    assert (dw, dh) == (w, h)
    assert len(dec) == w * h * 3
    assert _max_err(dec, pix) <= 24


def test_roundtrip_bound_noise_q95():
    """Worst-case content (uniform noise — what the text tiling in the
    driver query produces) at the query's quality: the driver
    tolerance (48) carries 2x headroom over this measured bound."""
    pix = _noise(16, 12)
    _, _, dec = decode_jpeg(encode_jpeg(pix, 16, 12, quality=95))
    assert _max_err(dec, pix) <= 32


def test_encoder_is_deterministic():
    pix = _noise(24, 16)
    assert encode_jpeg(pix, 24, 16) == encode_jpeg(pix, 24, 16)


def test_restart_interval_roundtrip_identical_pixels():
    """DRI/RSTn must not change decoded pixels, only the stream
    framing; the interval exercises predictor resets + marker order."""
    pix = _gradient(32, 24)
    plain = decode_jpeg(encode_jpeg(pix, 32, 24, quality=90))
    rst = decode_jpeg(encode_jpeg(pix, 32, 24, quality=90, restart_interval=3))
    assert plain == rst


def test_restart_marker_out_of_order_raises():
    payload = bytearray(
        encode_jpeg(_gradient(32, 24), 32, 24, restart_interval=1)
    )
    # first restart marker is FFD0; bump it to FFD1 (skipped index)
    i = payload.index(b"\xff\xd0", 2)
    payload[i + 1] = 0xD1
    with pytest.raises(ValueError, match="restart marker"):
        decode_jpeg(bytes(payload))


@pytest.mark.parametrize("ss,tol", [("4:2:2", 24), ("4:2:0", 32)])
@pytest.mark.parametrize("w,h", [(16, 16), (17, 9), (32, 24)])
def test_subsampled_roundtrip_bound(ss, tol, w, h):
    """4:2:2 / 4:2:0: chroma box-down + nearest-up adds bounded error
    on smooth content; odd dims exercise the fractional chroma crop."""
    pix = _gradient(w, h)
    dw, dh, dec = decode_jpeg(encode_jpeg(pix, w, h, quality=90, subsampling=ss))
    assert (dw, dh) == (w, h)
    assert _max_err(dec, pix) <= tol


def test_subsampled_with_restart_interval():
    pix = _gradient(48, 32)
    payload = encode_jpeg(
        pix, 48, 32, quality=90, subsampling="4:2:0", restart_interval=2
    )
    w, h, dec = decode_jpeg(payload)
    assert (w, h) == (48, 32)
    assert _max_err(dec, pix) <= 32
    # 4:2:0 shrinks the stream vs 4:4:4 on real (chroma-smooth) content
    assert len(payload) < len(encode_jpeg(pix, 48, 32, quality=90))


def test_unknown_subsampling_rejected():
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(_gradient(8, 8), 8, 8, subsampling="4:1:1")


def test_grayscale_single_component():
    pix = _gradient(16, 16)
    payload = encode_jpeg(pix, 16, 16, grayscale=True)
    w, h, dec = decode_jpeg(payload)
    arr = np.frombuffer(dec, np.uint8).reshape(16, 16, 3)
    assert (arr[..., 0] == arr[..., 1]).all() and (arr[..., 1] == arr[..., 2]).all()
    # decoded gray tracks the luma of the RGB input
    rgb = np.frombuffer(pix, np.uint8).reshape(16, 16, 3).astype(float)
    luma = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    assert np.abs(arr[..., 0].astype(float) - luma).max() <= 12


def test_public_dispatch_routes_jpeg():
    pix = _gradient(8, 8)
    payload = encode_jpeg(pix, 8, 8)
    assert decode_image(payload) == (8, 8)
    w, h, dec = decode_image_pixels(payload)
    assert (w, h, len(dec)) == (8, 8, 192)


def test_quality_scaling_formula_edges():
    # q=50: scale=100 -> identity; q=100: scale=0 -> all 1s (clamped);
    # q=1: scale=5000 -> all 255s (clamped) except tiny bases
    assert scaled_quant_table(BASE_QUANT_LUMA, 50) == list(BASE_QUANT_LUMA)
    assert set(scaled_quant_table(BASE_QUANT_LUMA, 100)) == {1}
    assert max(scaled_quant_table(BASE_QUANT_LUMA, 1)) == 255
    with pytest.raises(ValueError, match="quality"):
        scaled_quant_table(BASE_QUANT_LUMA, 0)


def test_annex_k_huffman_specs_are_complete():
    for counts, symbols in (DC_LUMA, DC_CHROMA):
        assert sum(counts) == len(symbols) == 12
    for counts, symbols in (AC_LUMA, AC_CHROMA):
        assert sum(counts) == len(symbols) == 162
        assert 0xF0 in symbols and 0x00 in symbols  # ZRL + EOB


# --- hostile payloads ---------------------------------------------------------


def _valid() -> bytes:
    return encode_jpeg(_gradient(16, 8), 16, 8, quality=90)


def test_progressive_sof2_narrowed():
    payload = bytearray(_valid())
    payload[payload.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(bytes(payload))


def test_16bit_quant_table_narrowed():
    payload = bytearray(_valid())
    payload[payload.index(b"\xff\xdb") + 4] |= 0x10  # Pq=1
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_jpeg(bytes(payload))


def test_sampling_factor_above_two_narrowed():
    payload = bytearray(_valid())
    # SOF0 seg: FFC0 len(2) prec(1) h(2) w(2) ncomp(1) then id,samp,tq
    payload[payload.index(b"\xff\xc0") + 11] = 0x33
    with pytest.raises(NotImplementedError, match="sampling factor"):
        decode_jpeg(bytes(payload))


def test_decompression_bomb_dims_rejected_before_alloc():
    payload = bytearray(_valid())
    i = payload.index(b"\xff\xc0")
    payload[i + 5 : i + 9] = b"\xff\xff\xff\xff"  # 65535 x 65535
    with pytest.raises(ValueError, match="JPEG_MAX_PIXELS"):
        decode_jpeg(bytes(payload))
    assert 65535 * 65535 > JPEG_MAX_PIXELS


def test_truncated_stream_raises():
    payload = _valid()
    with pytest.raises(ValueError):
        decode_jpeg(payload[:40])  # mid-segment
    with pytest.raises(ValueError, match="truncated mid-symbol"):
        # keep the full header but only a few entropy bytes of the scan
        decode_jpeg(payload[: payload.index(b"\xff\xda") + 20])


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"GIF89a not a jpeg")


def test_missing_sos_raises():
    payload = _valid()
    with pytest.raises(ValueError, match="SOF0 or SOS"):
        decode_jpeg(payload[: payload.index(b"\xff\xda")] + b"\xff\xd9")


def test_fill_bytes_and_standalone_markers_in_header_walk():
    """FF fill padding and length-less markers (TEM, stray RSTn)
    between segments must be skipped, not parsed as segments — a
    misparse reads the next two bytes as a length and derails the
    walk (T.81 B.1.1.2)."""
    payload = _valid()
    padded = payload[:2] + b"\xff\xff\xff\x01\xff\xd3" + payload[2:]
    assert decode_jpeg(padded) == decode_jpeg(payload)


def test_overfull_huffman_table_rejected():
    """A DHT claiming more codes at a length than the canonical space
    holds must fail loudly — building it assigns colliding codes and
    decodes garbage pixels silently.  (A payload-level oversized count
    trips the segment-length ValueError first; the canonical-space
    check is the table builder's own contract.)"""
    from acled_spark.jpeg import _huff_decoder

    # both length-1 codes used, so the length-2 space is exhausted at
    # 4 — a fifth code there must be rejected
    with pytest.raises(ValueError, match="overfull"):
        _huff_decoder([2, 5] + [0] * 14, list(range(7)))
    payload = bytearray(_valid())
    i = payload.index(b"\xff\xc4")
    payload[i + 5] = 0xFF  # 255 codes of length 1: dies at segment length
    with pytest.raises(ValueError, match="DHT symbols truncated"):
        decode_jpeg(bytes(payload))


def test_sos_component_reorder_narrowed():
    payload = bytearray(_valid())
    i = payload.index(b"\xff\xda")
    payload[i + 5], payload[i + 7] = payload[i + 7], payload[i + 5]  # swap cids
    with pytest.raises(NotImplementedError, match="SOS component order"):
        decode_jpeg(bytes(payload))


def test_empty_sos_segment_raises_value_error():
    """An SOS with segment length 2 (no component count byte) must be
    the documented ValueError, not an IndexError off sos[0]."""
    payload = _valid()
    i = payload.index(b"\xff\xda")
    sos_len = int.from_bytes(payload[i + 2 : i + 4], "big")
    crafted = payload[:i] + b"\xff\xda\x00\x02" + payload[i + 2 + sos_len :]
    with pytest.raises(ValueError, match="SOS segment malformed"):
        decode_jpeg(crafted)


def test_zrl_past_block_end_rejected():
    """A corrupt scan whose ZRL symbols push the AC index past 63 must
    raise, not silently desynchronize the bit stream (the run+size
    path already checks; the bare-ZRL path did not)."""
    from acled_spark.jpeg import (
        _BitReader,
        _BitWriter,
        _decode_block,
        _huff_codes,
        _huff_decoder,
    )

    w = _BitWriter()
    code, ln = _huff_codes(DC_LUMA)[0]
    w.write(code, ln)  # DC diff category 0 (no magnitude bits)
    code, ln = _huff_codes(AC_LUMA)[0xF0]
    for _ in range(4):  # 4 ZRLs from k=1 -> k=65
        w.write(code, ln)
    w.align()
    reader = _BitReader(bytes(w.buf), 0)
    dc_tab = _huff_decoder(list(DC_LUMA[0]), list(DC_LUMA[1]))
    ac_tab = _huff_decoder(list(AC_LUMA[0]), list(AC_LUMA[1]))
    with pytest.raises(ValueError, match="past 63"):
        _decode_block(reader, dc_tab, ac_tab, 0)


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="degenerate"):
        encode_jpeg(b"", 0, 8)
    with pytest.raises(ValueError, match="pixel buffer"):
        encode_jpeg(b"\x00" * 10, 4, 4)
    with pytest.raises(ValueError, match="restart interval"):
        encode_jpeg(b"\x00" * 48, 4, 4, restart_interval=-1)
