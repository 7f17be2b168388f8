"""Baseline JPEG codec (functions/jpeg.py): spec-level structure, PSNR
parity gates on realistic content, determinism, and decoder independence
from the encoder's table choice (table-driven off DQT/DHT)."""

from __future__ import annotations

import numpy as np
import pytest

from routers_spark.functions.jpeg import (
    AC_CHROMA_SPEC,
    AC_LUMA_SPEC,
    DC_CHROMA_SPEC,
    DC_LUMA_SPEC,
    ZIGZAG,
    _canonical_codes,
    jpeg_decode,
    jpeg_encode,
)
from routers_spark.functions.raster import psnr

RNG = np.random.default_rng(11)


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        xx * 255 / max(w - 1, 1),
        yy * 255 / max(h - 1, 1),
        (xx + yy) * 255 / max(h + w - 2, 1),
    ], axis=-1).astype(np.uint8)


def test_huffman_specs_well_formed():
    for bits, vals in (DC_LUMA_SPEC, DC_CHROMA_SPEC,
                       AC_LUMA_SPEC, AC_CHROMA_SPEC):
        assert sum(bits) == len(vals)
        enc, dec = _canonical_codes(bits, vals)
        assert len(enc) == len(vals) and len(dec) == len(vals)
        # canonical codes never overflow their length
        for sym, (code, ln) in enc.items():
            assert code < (1 << ln)
    assert sum(AC_LUMA_SPEC[0]) == 162 and sum(AC_CHROMA_SPEC[0]) == 162


def test_zigzag_is_the_standard_permutation():
    # spot-check the classic prefix + involution property
    assert list(ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert sorted(ZIGZAG) == list(range(64))


def test_structure_markers():
    data = jpeg_encode(_gradient(24, 24), quality=90)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in data[:32]
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in data


@pytest.mark.parametrize("h,w", [(8, 8), (24, 24), (45, 61), (7, 13)])
def test_roundtrip_psnr_gate_realistic(h, w):
    """The parity gate of the north rule: decoded pixels allclose at
    PSNR ≥ 40 dB for the lossy format, on realistic (smooth) content —
    incl. non-multiple-of-8 shapes (edge-replicated blocks)."""
    img = _gradient(h, w)
    dec = jpeg_decode(jpeg_encode(img, quality=90))
    assert dec.shape == img.shape
    assert psnr(img, dec) >= 40.0


def test_noise_is_lossy_but_bounded():
    img = RNG.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    dec = jpeg_decode(jpeg_encode(img, quality=95))
    assert not np.array_equal(dec, img)     # genuinely lossy
    assert psnr(img, dec) >= 28.0           # worst-case content, q95
    # quality is monotone: q50 strictly worse than q95 on noise
    dec50 = jpeg_decode(jpeg_encode(img, quality=50))
    assert psnr(img, dec50) < psnr(img, dec)


def test_deterministic_and_grayscale():
    img = RNG.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    assert jpeg_encode(img, 85) == jpeg_encode(img, 85)
    g = jpeg_decode(jpeg_encode(img[:, :, 0], quality=90))
    assert g.shape == (16, 16, 3)  # gray promoted to RGB, channels equal
    assert np.array_equal(g[:, :, 0], g[:, :, 1])


def test_decoder_honours_file_tables():
    """The decoder reads quantization + Huffman tables from the FILE, not
    from the encoder's constants: re-encoding at a different quality
    changes the DQT payload and the stream still decodes consistently."""
    img = _gradient(16, 16)
    d90 = jpeg_decode(jpeg_encode(img, quality=90))
    d30 = jpeg_decode(jpeg_encode(img, quality=30))
    assert psnr(img, d90) > psnr(img, d30)


def test_dispatch_integration_multimodal():
    """image_features / resize / pyramid consume real jpeg bytes through
    decode_image — shape and value sanity over the fixture generator."""
    from routers_spark.fixtures.images import generate_images
    from routers_spark.functions.raster import decode_image

    df = generate_images(20, seed=7)
    jp = df[df["fmt"] == "jpeg"]
    assert len(jp) > 0
    for r in jp.itertuples():
        arr = decode_image(bytes(r.bytes), "jpeg")
        assert arr.shape == (r.h, r.w, 3)
        assert bytes(r.bytes)[:2] == b"\xff\xd8"  # real JPEG on the wire
