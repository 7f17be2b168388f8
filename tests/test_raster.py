"""Raster codec + pyramid tests: PNG round-trip byte-exactness, all filter
types decoded, FJPG stand-in lossy at PSNR >= 40 dB (the parity gate of
BASELINE.md), deterministic box-filter pyramid."""

import struct
import zlib

import numpy as np
import pytest

from routers_spark.functions.raster import (
    box_downsample,
    decode_image,
    encode_image,
    fake_jpeg_decode,
    fake_jpeg_encode,
    png_decode,
    png_encode,
    psnr,
    pyramid,
)

RNG = np.random.default_rng(42)


@pytest.mark.parametrize("shape", [(16, 16, 3), (32, 16, 3), (8, 8, 1),
                                   (16, 32, 4)])
def test_png_roundtrip_exact(shape):
    img = RNG.integers(0, 256, shape, dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(img)), img)


def test_png_encode_deterministic():
    img = RNG.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert png_encode(img) == png_encode(img)


def test_png_decode_all_filters():
    # craft a PNG using each filter type per row and check against the
    # reference unfiltering math
    w, h, c = 4, 5, 3
    img = RNG.integers(0, 256, (h, w, c), dtype=np.uint8)
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.uint8)
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        line = img[y].reshape(-1).astype(np.int32)
        enc = np.zeros(w * c, dtype=np.uint8)
        for i in range(w * c):
            a = int(line[i - c]) if i >= c else 0
            b = int(prev[i])
            cc = int(prev[i - c]) if i >= c else 0
            if ftype == 0:
                enc[i] = line[i] & 0xFF
            elif ftype == 1:
                enc[i] = (line[i] - a) & 0xFF
            elif ftype == 2:
                enc[i] = (line[i] - b) & 0xFF
            elif ftype == 3:
                enc[i] = (line[i] - (a + b) // 2) & 0xFF
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                enc[i] = (line[i] - pred) & 0xFF
        raw.append(ftype)
        raw.extend(enc.tobytes())
        prev = line.astype(np.uint8)

    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    buf = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(bytes(raw))) \
        + chunk(b"IEND", b"")
    assert np.array_equal(png_decode(buf), img)


def test_fjpg_lossy_psnr_above_40():
    img = RNG.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    dec = fake_jpeg_decode(fake_jpeg_encode(img))
    assert dec.shape == img.shape
    p = psnr(img, dec)
    assert p >= 40.0, f"PSNR {p:.1f} below the 40 dB parity gate"
    assert not np.array_equal(dec, img)  # genuinely lossy


def test_decode_image_dispatch():
    img = RNG.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_image(img, "png"), "png"), img)
    # jpeg is the REAL baseline codec now: pure noise is the worst case for
    # any lossy transform codec — assert lossy-but-faithful; the ≥40 dB
    # parity gate binds on realistic content (tests/test_jpeg.py)
    dec = decode_image(encode_image(img, "jpeg"), "jpeg")
    assert dec.shape == img.shape
    assert psnr(img, dec) >= 28
    # legacy FJPG payloads still decode through the same dispatch
    legacy = fake_jpeg_encode(img)
    assert psnr(img, decode_image(legacy, "jpeg")) >= 40


def test_box_downsample_exact():
    a = np.array([[[0], [4]], [[8], [12]]], dtype=np.uint8)
    # (0+4+8+12+2)//4 = 6
    assert box_downsample(a)[0, 0, 0] == 6
    b = np.array([[[255], [255]], [[255], [254]]], dtype=np.uint8)
    assert box_downsample(b)[0, 0, 0] == (255 * 3 + 254 + 2) // 4


def test_pyramid_levels_and_determinism():
    img = RNG.integers(0, 256, (64, 32, 3), dtype=np.uint8)
    pyr = pyramid(img, 4)
    assert [p.shape[:2] for p in pyr] == [(64, 32), (32, 16), (16, 8), (8, 4),
                                          (4, 2)]
    pyr2 = pyramid(img, 4)
    for a, b in zip(pyr, pyr2):
        assert np.array_equal(a, b)
