"""Pure-python WAV codec (osm_spark/text/wav.py): golden wire bytes,
round-trips, RIFF chunk skipping, rejection of non-PCM-16, and the
decode_audio feature arithmetic."""

import struct

import numpy as np
import pytest

from osm_spark.text.wav import decode_wav, encode_wav, encoded_wav_len


def test_golden_header_bytes():
    blob = encode_wav(np.array([0, 1, -1], dtype=np.int16), rate=8000)
    # RIFF size = 36 + 6 data bytes
    assert blob[:12] == b"RIFF" + struct.pack("<I", 42) + b"WAVE"
    # fmt: PCM(1), mono, 8000 Hz, 16000 B/s, block 2, 16-bit
    assert blob[12:36] == b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16
    )
    assert blob[36:44] == b"data" + struct.pack("<I", 6)
    assert blob[44:] == struct.pack("<hhh", 0, 1, -1)
    assert len(blob) == encoded_wav_len(3, 1)


def test_round_trip_mono_and_stereo():
    mono = np.array([-32768, 32767, 0, 1234], dtype=np.int16)
    out, meta = decode_wav(encode_wav(mono, rate=44100))
    assert meta == {"rate": 44100, "channels": 1, "bits": 16, "n_samples": 4}
    assert np.array_equal(out[:, 0], mono)

    stereo = np.array([[1, -1], [2, -2], [3, -3]], dtype=np.int16)
    out2, meta2 = decode_wav(encode_wav(stereo, rate=22050))
    assert meta2["channels"] == 2 and meta2["n_samples"] == 3
    assert np.array_equal(out2, stereo)
    assert len(encode_wav(stereo)) == encoded_wav_len(3, 2)


def test_unknown_chunks_skipped_with_word_alignment():
    base = encode_wav(np.array([7, -7], dtype=np.int16))
    # splice an odd-size LIST chunk (with its pad byte) between fmt
    # and data — decoders must skip it per the RIFF contract
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = base[:36] + junk + base[36:]
    out, meta = decode_wav(spliced)
    assert meta["n_samples"] == 2
    assert out[:, 0].tolist() == [7, -7]


def test_rejects_non_pcm16():
    with pytest.raises(ValueError):
        decode_wav(b"OggS" + b"\x00" * 40)
    # 8-bit fmt tag
    blob = bytearray(encode_wav(np.array([1], dtype=np.int16)))
    blob[34:36] = struct.pack("<H", 8)
    with pytest.raises(ValueError):
        decode_wav(bytes(blob))
    # non-PCM format tag (3 = IEEE float)
    blob2 = bytearray(encode_wav(np.array([1], dtype=np.int16)))
    blob2[20:22] = struct.pack("<H", 3)
    with pytest.raises(ValueError):
        decode_wav(bytes(blob2))
    with pytest.raises(ValueError):
        decode_wav(encode_wav(np.array([1], dtype=np.int16))[:20])


def test_decode_audio_features_and_stub_fallback():
    from osm_spark.text.multimodal import decode_audio

    samples = np.arange(-100, 156, dtype=np.int16)  # 256 samples
    feats, meta = decode_audio(encode_wav(samples), dim=4)
    assert meta["n_samples"] == 256
    blk = samples.astype(np.int64).reshape(4, 64)
    want = (blk.sum(axis=1) / 64.0 / 32768.0).astype(np.float32)
    assert np.array_equal(feats, want)

    stub, meta2 = decode_audio(b"not audio at all", dim=4)
    assert meta2 is None and stub.shape == (4,)


def test_decode_audio_last_block_absorbs_remainder():
    from osm_spark.text.multimodal import decode_audio

    samples = np.ones(10, dtype=np.int16)  # dim=4 -> blocks 2,2,2,4
    feats, meta = decode_audio(encode_wav(samples), dim=4)
    assert meta["n_samples"] == 10
    assert np.allclose(feats, 1.0 / 32768.0)


def test_rejects_chunk_size_overrun():
    blob = bytearray(encode_wav(np.array([1, 2], dtype=np.int16)))
    blob[40:44] = struct.pack("<I", 100000)  # data chunk claims 100 kB
    with pytest.raises(ValueError):
        decode_wav(bytes(blob))
