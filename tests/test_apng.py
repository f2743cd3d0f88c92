"""text/apng.py — pure-python animated-PNG codec (the real video
frame path behind multimodal.sample_frames)."""

import struct

import numpy as np
import pytest

from osm_spark.text.apng import (
    apng_info,
    decode_apng,
    decode_apng_frame,
    encode_apng,
)
from osm_spark.text.png import PNG_SIGNATURE, encode_png


def ramp_frames(n=4, h=16, w=16):
    return [
        ((np.arange(h * w).reshape(h, w) + 7 * i) % 256).astype(np.uint8)
        for i in range(n)
    ]


def test_roundtrip_grey():
    frames = ramp_frames()
    data = encode_apng(frames, delay_ms=40)
    out, info = decode_apng(data)
    assert info == {
        "width": 16, "height": 16, "channels": 1,
        "n_frames": 4, "delay_ms": 40,
    }
    assert all((a == b).all() for a, b in zip(frames, out))


def test_roundtrip_rgb():
    frames = [
        np.random.RandomState(i).randint(0, 256, (8, 6, 3)).astype(np.uint8)
        for i in range(3)
    ]
    out, info = decode_apng(encode_apng(frames, 100))
    assert info["channels"] == 3
    assert all((a == b).all() for a, b in zip(frames, out))


def test_independent_frame_seek():
    frames = ramp_frames(6)
    data = encode_apng(frames, 40)
    # any frame decodes alone, in any order
    for i in (5, 0, 3):
        assert (decode_apng_frame(data, i) == frames[i]).all()
    with pytest.raises(ValueError):
        decode_apng_frame(data, 6)


def test_wire_structure():
    data = encode_apng(ramp_frames(2), 40)
    assert data.startswith(PNG_SIGNATURE)
    # chunk order: IHDR, acTL, fcTL, IDAT, fcTL, fdAT, IEND
    tags, pos = [], len(PNG_SIGNATURE)
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tags.append(data[pos + 4 : pos + 8])
        pos += 12 + length
    assert tags == [b"IHDR", b"acTL", b"fcTL", b"IDAT", b"fcTL", b"fdAT",
                    b"IEND"]
    # acTL declares 2 frames; fdAT sequence numbers strictly increase
    _, info = decode_apng(data)
    assert info["n_frames"] == 2


def test_rejections():
    # plain PNG: no acTL
    with pytest.raises(ValueError):
        apng_info(encode_png(ramp_frames(1)[0]))
    # garbage
    with pytest.raises(ValueError):
        apng_info(b"\x00" * 32)
    # mismatched frame shapes
    with pytest.raises(ValueError):
        encode_apng([np.zeros((4, 4), np.uint8), np.zeros((5, 4), np.uint8)])
