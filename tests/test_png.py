"""Pure-python PNG codec (osm_spark/text/png.py): golden wire bytes,
roundtrips, all five scanline filters, closed-form length, and the
decode-or-stub fallback in multimodal.extract_features."""

import struct
import zlib

import numpy as np
import pytest

from osm_spark.text.png import (
    PNG_SIGNATURE, _chunk, decode_png, encode_png, encoded_png_len,
)

# encode_png of the 2x2 ramp [[0,1],[2,3]] — pinned wire bytes: any
# encoder change that alters the emitted stream must be deliberate.
GOLDEN_2X2 = bytes.fromhex(
    "89504e470d0a1a0a0000000d494844520000000200000002080000000057dd52f8"
    "00000011494441547801010600f9ff000001000203001100079a1c9e7f"
    "0000000049454e44ae426082"
)


def test_golden_bytes_and_roundtrip():
    img = np.arange(4, dtype=np.uint8).reshape(2, 2)
    blob = encode_png(img)
    assert blob == GOLDEN_2X2
    out, meta = decode_png(blob)
    np.testing.assert_array_equal(out, img)
    assert meta == {"width": 2, "height": 2, "channels": 1, "bit_depth": 8}


def test_roundtrip_gray_and_rgb():
    rng = np.arange(31 * 17, dtype=np.int64)
    gray = ((rng * 97 + 13) % 256).astype(np.uint8).reshape(17, 31)
    out, meta = decode_png(encode_png(gray))
    np.testing.assert_array_equal(out, gray)
    rgb = np.stack([gray, 255 - gray, gray // 3], axis=2)
    out3, meta3 = decode_png(encode_png(rgb))
    np.testing.assert_array_equal(out3, rgb)
    assert (meta3["width"], meta3["height"], meta3["channels"]) == (31, 17, 3)


def test_encoded_len_closed_form():
    for w, h, ch in [(1, 1, 1), (12, 20, 1), (12, 20, 3), (300, 250, 3)]:
        img = np.zeros((h, w) if ch == 1 else (h, w, ch), dtype=np.uint8)
        assert len(encode_png(img)) == encoded_png_len(w, h, ch)
    # >64 KiB raw stream spans multiple zlib stored blocks
    big = np.zeros((300, 250, 3), dtype=np.uint8)
    assert 300 * (1 + 250 * 3) > 65535
    np.testing.assert_array_equal(decode_png(encode_png(big))[0], big)


def _filter_line(ftype, line, prev, bpp):
    """Reference PNG filter (encoder direction) for one scanline."""
    n = len(line)
    out = np.zeros(n, dtype=np.int32)
    for x in range(n):
        a = int(line[x - bpp]) if x >= bpp else 0
        b = int(prev[x])
        c = int(prev[x - bpp]) if x >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[x] = (int(line[x]) - pred) & 0xFF
    return out.astype(np.uint8)


@pytest.mark.parametrize("channels", [1, 3])
def test_decode_all_filter_types(channels):
    """Hand-built PNG with a DIFFERENT filter per scanline (0..4):
    decode must invert every filter, per channel count."""
    h, w = 5, 9
    rng = np.arange(h * w * channels, dtype=np.int64)
    img = ((rng * 151 + 7) % 256).astype(np.uint8).reshape(h, w * channels)
    raw = bytearray()
    prev = np.zeros(w * channels, dtype=np.uint8)
    for y in range(h):
        ftype = y % 5
        raw.append(ftype)
        raw.extend(_filter_line(ftype, img[y], prev, channels).tobytes())
        prev = img[y]
    color_type = 0 if channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    blob = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )
    out, meta = decode_png(blob)
    expect = img.reshape(h, w, channels)
    if channels == 1:
        expect = expect[:, :, 0]
    np.testing.assert_array_equal(out, expect)


def test_multi_idat_and_rejects():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    blob = encode_png(img)
    # split the IDAT payload across two chunks
    sig_ihdr = blob[: 8 + 25]
    idat_payload = blob[8 + 25 + 8 : -(12 + 4)]
    rebuilt = (
        sig_ihdr
        + _chunk(b"IDAT", idat_payload[:5])
        + _chunk(b"IDAT", idat_payload[5:])
        + _chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(rebuilt)[0], img)
    with pytest.raises(ValueError):
        decode_png(b"\x89PNGnope")
    with pytest.raises(ValueError):  # 16-bit depth rejected
        bad_ihdr = struct.pack(">IIBBBBB", 4, 3, 16, 0, 0, 0, 0)
        decode_png(PNG_SIGNATURE + _chunk(b"IHDR", bad_ihdr) + _chunk(b"IEND", b""))


def test_decode_image_real_vs_stub_fallback():
    """multimodal.decode_image: PNG bytes → pixel-derived features +
    meta; arbitrary bytes → md5 stub + no meta."""
    from osm_spark.text.multimodal import decode_image, decode_image_stub

    img = ((np.arange(240) * 3 + 5) % 256).astype(np.uint8).reshape(20, 12)
    feats, meta = decode_image(encode_png(img), dim=8)
    assert meta["width"] == 12 and meta["height"] == 20
    flat = img.astype(np.float64).reshape(-1)
    for j in range(8):
        exp = flat[j * 30 : (j + 1) * 30].sum() / 30.0 / 255.0
        assert feats[j] == np.float32(exp)
    raw = b"not a png at all"
    sfeats, smeta = decode_image(raw, dim=8)
    assert smeta is None
    np.testing.assert_array_equal(sfeats, decode_image_stub(raw, 8))


def test_pages_png_df_end_to_end(spark):
    """pages_png_df payloads decode to the documented pixel formula."""
    from osm_spark.data.pages import PNG_H, PNG_W, PagesSpec, pages_png_df
    from osm_spark.text.multimodal import attach_media, extract_features

    media = attach_media(
        pages_png_df(spark, PagesSpec(n_pages=40)), "payload", "image",
        keep=["url"],
    )
    rows = extract_features(media, dim=8, keep=["url"]).collect()
    assert len(rows) == 40
    ramp = np.arange(PNG_W * PNG_H, dtype=np.int64)
    for r in rows:
        assert r.decoded and r.width == PNG_W and r.height == PNG_H
        i = int(r.url.rsplit("/", 1)[1])
        seed = (i * 2654435761) % 256
        px = ((seed + ramp) % 256).astype(np.float64)
        for j in range(8):
            exp = px[j * 30 : (j + 1) * 30].sum() / 30.0 / 255.0
            assert r.features[j] == np.float32(exp)
