"""Pure-python baseline JPEG codec (text/jpeg.py): closed-form DC
round-trip, smooth-image error bounds, color 4:4:4/4:2:0, restart
markers, non-baseline rejection — plus REAL-WORLD decoder validation
against two baseline JPEGs from other encoders (embedded below)."""

from __future__ import annotations

import base64
import hashlib

import numpy as np
import pytest

from osm_spark.text.jpeg import (
    QUANT_LUMA,
    decode_jpeg,
    encode_jpeg,
    quality_scale,
    quantize_dc_closed_form,
)

# Real-world golden fixtures (public test data, embedded so the suite
# is self-contained):
#  - GREY2X2: 2×2 greyscale baseline JPEG from IPython's test suite
#    (IPython/core/tests/2x2.jpg, BSD-licensed).
#  - PY16: 16×16 color 4:2:0 baseline JPEG from CPython's test suite
#    (Lib/test/imghdrdata/python.jpg, PSF-licensed).
# Both were produced by independent encoders (libjpeg lineage), so
# decoding them exercises foreign Huffman tables, APP0 layouts and
# multi-table DQT/DHT segments our own encoder never emits.
GREY2X2 = base64.b64decode(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkS"
    "Ew8UHRofHh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/wAALCAAC"
    "AAIBAREA/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgED"
    "AwIEAwUFBAQAAAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2Jy"
    "ggkKFhcYGRolJicoKSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1"
    "dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJ"
    "ytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/9oACAEBAAA/ACv/2Q=="
)
PY16 = base64.b64decode(
    "/9j/4AAQSkZJRgABAQEAAQABAAD/2wBDAAMCAgICAgMCAgIDAwMDBAYEBAQEBAgG"
    "BgUGCQgKCgkICQkKDA8MCgsOCwkJDRENDg8QEBEQCgwSExIQEw8QEBD/2wBDAQMD"
    "AwQDBAgEBAgQCwkLEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQ"
    "EBAQEBAQEBAQEBAQEBD/wAARCAAQABADASIAAhEBAxEB/8QAFgABAQEAAAAAAAAA"
    "AAAAAAAABwQF/8QAJBAAAQQBBAICAwAAAAAAAAAAAQIDBAYFBwgSExEiABQJMTL/"
    "xAAVAQEBAAAAAAAAAAAAAAAAAAAABv/EACMRAAECBQMFAAAAAAAAAAAAAAECEQME"
    "BQYhABIxFRZhgeH/2gAMAwEAAhEDEQA/ABSm0mobc8HmExLUlRzzEWPkJWW+ulrs"
    "aUVAseUgslSlH9LKuPryIKuWPZdskzXmm3fX5m2nF4GlVxx/HOpx4ks51+MiU/Ia"
    "ad7UcUo4tILoS4kqcWkezS0hO/HvuRp0rO6hWnWO1UisZVuFi4GFeyEpmGepa5S5"
    "SWVPuciFKRFLgSrwetnyPIB+Vb4N9mKhQMzo5po9XLdDs9d6ZVix2VEhiL9kuNPx"
    "w2gEKcDQ/rs8AuA8VAe0vdl7VOYn+27flGAUgmITjbhSmCg3BYlyeWDkMolvw4KO"
    "p1KM6iCNvngZHwetf//Z"
)


def test_constant_blocks_match_closed_form():
    """A block-constant image round-trips to EXACTLY the DC closed
    form the q163 oracle replays — encode, entropy-decode, IDCT and
    pixel rounding all collapse to integers."""
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 256, (3, 2))
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
    dec, meta = decode_jpeg(encode_jpeg(img, quality=50))
    assert (meta["width"], meta["height"]) == (16, 24)
    q00 = int(quality_scale(QUANT_LUMA, 50)[0, 0])
    assert q00 == 16  # the oracle's multiple-of-8 premise
    want = np.vectorize(
        lambda c: quantize_dc_closed_form(int(c), q00)
    )(vals)
    assert (dec[::8, ::8].astype(int) == want).all()
    assert (dec == np.repeat(np.repeat(want, 8, 0), 8, 1)).all()


def test_smooth_image_error_bound():
    img = np.clip(
        np.add.outer(np.arange(40) * 2, np.arange(48)), 0, 255
    ).astype(np.uint8)
    for q, bound in ((50, 4), (90, 2)):
        dec, _ = decode_jpeg(encode_jpeg(img, quality=q))
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= bound


def test_color_roundtrip_444_and_420():
    rgb = np.zeros((24, 20, 3), np.uint8)
    rgb[..., 0] = np.add.outer(np.arange(24) * 3, np.arange(20)) % 200
    rgb[..., 1] = 100
    rgb[..., 2] = np.add.outer(np.arange(24), np.arange(20) * 2) % 200
    for sub, bound in (("444", 8), ("420", 14)):
        dec, meta = decode_jpeg(
            encode_jpeg(rgb, quality=75, subsampling=sub)
        )
        assert dec.shape == (24, 20, 3)
        assert meta["subsampling"] == sub
        assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= bound


def test_odd_dimensions_crop():
    """Non-multiple-of-8 (and of 16 for 4:2:0) dims pad at encode and
    crop at decode."""
    img = (np.add.outer(np.arange(13) * 9, np.arange(11) * 5) % 256).astype(
        np.uint8
    )
    dec, meta = decode_jpeg(encode_jpeg(img, quality=90))
    assert dec.shape == (13, 11)
    rgb = np.stack([img, img, img], axis=-1)
    dec3, _ = decode_jpeg(encode_jpeg(rgb, quality=90, subsampling="420"))
    assert dec3.shape == (13, 11, 3)


def test_restart_markers_resync():
    """DRI/RSTn: the restart-encoded stream must decode to the SAME
    pixels as the plain stream (identical quantization, different
    entropy segmentation + DC predictor resets)."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 40)).astype(np.uint8)
    plain, _ = decode_jpeg(encode_jpeg(img, quality=75))
    for ri in (1, 2, 7):
        rst, _ = decode_jpeg(
            encode_jpeg(img, quality=75, restart_interval=ri)
        )
        assert (rst == plain).all(), ri


def test_rejects_non_baseline_and_garbage():
    img = np.full((8, 8), 130, np.uint8)
    b = bytearray(encode_jpeg(img))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC2  # patch SOF0 → SOF2 (progressive)
    with pytest.raises(ValueError, match="progressive|non-baseline"):
        decode_jpeg(bytes(b))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02\x03")
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg(img)[:40])  # truncated


def test_quality_scaling():
    assert (quality_scale(QUANT_LUMA, 50) == QUANT_LUMA).all()
    assert (quality_scale(QUANT_LUMA, 90) <= QUANT_LUMA).all()
    assert (quality_scale(QUANT_LUMA, 10) >= QUANT_LUMA).all()
    assert quality_scale(QUANT_LUMA, 100).min() >= 1
    with pytest.raises(ValueError):
        quality_scale(QUANT_LUMA, 0)


def test_real_world_greyscale_decode():
    """IPython's 2×2 greyscale JPEG (independent encoder): parses,
    decodes to the right shape, and the pixel digest is pinned."""
    img, meta = decode_jpeg(GREY2X2)
    assert img.shape == (2, 2)
    assert meta["n_components"] == 1 and meta["codec"] == "jpeg"
    # DC-only uniform grey: every pixel identical
    assert len(set(img.reshape(-1).tolist())) == 1
    assert hashlib.md5(img.tobytes()).hexdigest() == (
        hashlib.md5(bytes([img[0, 0]]) * 4).hexdigest()
    )


def test_real_world_420_color_decode():
    """CPython's 16×16 4:2:0 color JPEG (independent encoder, custom
    Huffman tables, two DQT segments): parses and decodes; digest
    pinned so any entropy/IDCT regression trips here."""
    img, meta = decode_jpeg(PY16)
    assert img.shape == (16, 16, 3)
    assert meta["subsampling"] == "420"
    assert img.std() > 10  # real content, not a flat decode artifact
    assert (
        hashlib.md5(img.tobytes()).hexdigest()
        == "4587bf0311fa55408e534874b963e01f"
    )


def test_decode_image_sniffs_jpeg():
    """multimodal.decode_image routes JPEG payloads to the real codec
    (decoded meta) and still stubs undecodable bytes."""
    from osm_spark.text.multimodal import decode_image

    img = np.repeat(
        np.repeat(np.array([[10, 200], [60, 130]]), 8, 0), 8, 1
    ).astype(np.uint8)
    feats, meta = decode_image(encode_jpeg(img), dim=4)
    assert meta is not None and meta["codec"] == "jpeg"
    assert meta["width"] == 16 and meta["height"] == 16
    q00 = 16
    want = [
        quantize_dc_closed_form(int(v), q00)
        for v in (10, 200, 60, 130)
    ]
    # dim=4 blocks of a 16×16 image = 64 px each: rows 0-7 hold blocks
    # (10, 200), rows 8-15 hold (60, 130) → means pairwise
    assert feats[0] == pytest.approx((want[0] + want[1]) / 2 / 255.0)
    assert feats[3] == pytest.approx((want[2] + want[3]) / 2 / 255.0)
    _, meta2 = decode_image(b"GIF89a not really", dim=4)
    assert meta2 is None
