"""Pure-python GIF codec (text/gif.py): lossless round-trips, LZW
overflow/clear handling, animation compositing, interlace, and
real-world third-party decoder validation (embedded fixture)."""

from __future__ import annotations

import base64
import struct

import numpy as np
import pytest

from osm_spark.text.gif import (
    _LZWEncoder,
    _sub_blocks,
    decode_gif,
    encode_gif,
)

# 16×16 color GIF89a from CPython's test suite
# (Lib/test/imghdrdata/python.gif, PSF-licensed) — produced by
# ImageMagick, so decoding it exercises a foreign encoder's LZW
# stream, a 64-entry palette and extension blocks our encoder never
# emits.
PY16 = base64.b64decode(
    "R0lGODlhEAAQAPU/AOu7GOu+IfPBGvrHGf3LG//MHOvCKv/PI//PJP/QJf/TLevF"
    "NOjHPf/TMP/UMP3VNvrTOf/XOfnVPv/YOuzORf/aQf/bRP/eS//fTv/iVf/jWP/n"
    "YvLhbvXjb/3pav/rbDJghzZmkDZnkTZpkzdoljdqljlsljpvmzpwnDtwnDxxnj1z"
    "oj50oj92pUB4pkJ7qkN8q0N9rUV/r0aAsUeBskiDtEiFtkqGukyJvEyKvEyKv0+N"
    "wVCPw1KRxv///wAAACH/C0ltYWdlTWFnaWNrB2dhbW1hPTAAIfkEBQAAPwAsAAAA"
    "ABAAEAAABpvAn/C3u81iLRVpyBTmfLMXC1VqMm1RVqo0sv50thjLFDKVqszeDleT"
    "uVSn0fmXuUh+PB1N9oKP/iA/FxUPXzY0UipnIoEUhAo/hzAuXU0VEQoHP0cuIj8c"
    "HhsZGBUTCggEPzFSPx0fGxoYFhENCAUCQispP6+xpacFBVawGAwLBgEAAF6xsw0J"
    "wl4/shEOCT6p0j8QzwUD2uBDQQA7"
)


def test_roundtrip_lossless():
    rng = np.random.default_rng(7)
    for shape in ((1, 1), (7, 5), (20, 12)):
        img = rng.integers(0, 256, shape).astype(np.uint8)
        frames, meta = decode_gif(encode_gif(img))
        assert len(frames) == 1 and (frames[0] == img).all()
        assert (meta["width"], meta["height"]) == shape[::-1]
        assert meta["codec"] == "gif" and meta["version"] == "89a"


def test_lzw_overflow_clear_roundtrip():
    """>4096 dictionary entries force the encoder's CLEAR-on-overflow
    and the decoder's table reset — random noise maximizes dictionary
    churn."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (120, 100)).astype(np.uint8)
    frames, _ = decode_gif(encode_gif(img))
    assert (frames[0] == img).all()


def test_animation_frames_composite():
    base = np.arange(0, 240, dtype=np.uint8).reshape(16, 15) % 250
    fs = [((base.astype(int) * (i + 1)) % 256).astype(np.uint8) for i in range(5)]
    frames, meta = decode_gif(encode_gif(fs, delay_cs=4))
    assert meta["n_frames"] == 5
    for a, b in zip(frames, fs):
        assert (a == b).all()


def test_interlaced_decode():
    """Our encoder never interlaces, so build the interlaced stream by
    hand: permute rows into pass order, set the interlace flag — the
    decoder must undo the 4-pass weave exactly."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (13, 9)).astype(np.uint8)
    h, w = img.shape
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    woven = img[order].reshape(-1)
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    for i in range(256):
        out += bytes([i, i, i])
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlaced
    out.append(8)
    out += _sub_blocks(_LZWEncoder(8).encode(woven))
    out += b"\x3b"
    frames, _ = decode_gif(bytes(out))
    assert (frames[0] == img).all()


def test_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)
    good = encode_gif(np.full((8, 8), 77, np.uint8))
    with pytest.raises(ValueError):
        decode_gif(good[:20])


def test_real_world_third_party_decode():
    """CPython's 16×16 ImageMagick GIF: foreign LZW stream, 64-color
    palette, gamma + graphic-control extensions — must parse and
    decode; pixel digest pinned against regression."""
    import hashlib

    frames, meta = decode_gif(PY16)
    assert meta["width"] == 16 and meta["height"] == 16
    assert frames[0].shape == (16, 16, 3)
    assert frames[0].std() > 10
    assert hashlib.md5(frames[0].tobytes()).hexdigest() == (
        "4853155c8d541412966389d2c696576d"
    )


def test_decode_image_sniffs_gif():
    from osm_spark.text.multimodal import decode_image

    img = (np.arange(0, 252, dtype=np.uint8) % 256).reshape(18, 14)
    feats, meta = decode_image(encode_gif(img), dim=4)
    assert meta is not None and meta["codec"] == "gif"
    assert meta["width"] == 14 and meta["height"] == 18
    # lossless: first block mean equals the exact pixel mean
    blk = img.reshape(-1)[:63]
    assert feats[0] == pytest.approx(blk.sum() / 63 / 255.0)
    _, meta2 = decode_image(b"RIFFnotgif", dim=4)
    assert meta2 is None
