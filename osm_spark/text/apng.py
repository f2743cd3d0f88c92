"""Pure-python APNG (animated PNG) codec — the real byte path behind
video frame sampling.

APNG (RFC-pending W3C/Mozilla extension, universally supported by
browsers) is PNG plus three chunk types: ``acTL`` (animation control:
frame count, plays), per-frame ``fcTL`` (frame control: sequence
number, dims, offsets, delay, dispose/blend ops) and ``fdAT`` (frame
data: sequence number + the frame's compressed pixel stream; frame 0
rides the ordinary ``IDAT``). Like the PNG codec this builds on
(text/png.py), everything is stdlib struct + zlib — the wire format,
not a binding.

Scope: the encoder always emits, and the decoder only accepts,
full-canvas frames (x=y=0, frame dims == canvas, blend op SOURCE) —
each frame independently replaces the canvas, so decoding frame k
never needs frame k-1. That is exactly the property a DISTRIBUTED
frame sampler wants: any subset of frames decodes without sequential
state (the same reason production video pipelines seek to
keyframes/I-frames rather than decode linearly). Region-composited
APNGs raise ValueError and fall back to the stub decoder upstream.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from osm_spark.text.png import PNG_SIGNATURE, _chunk, _defilter

_COLOR_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def encode_apng(
    frames: list[np.ndarray], delay_ms: int = 100
) -> bytes:
    """uint8 frames ((H, W) grey or (H, W, 3) RGB, all same shape) →
    APNG bytes. Filter-0 scanlines + zlib level 0, like encode_png,
    so the byte length is a closed form of (shape, n_frames)."""
    if not frames:
        raise ValueError("need at least one frame")
    first = np.ascontiguousarray(frames[0], dtype=np.uint8)
    if first.ndim == 2:
        color_type, channels = 0, 1
    elif first.ndim == 3 and first.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError(f"unsupported frame shape {first.shape}")
    h, w = first.shape[0], first.shape[1]

    def raw_stream(img: np.ndarray) -> bytes:
        img = np.ascontiguousarray(img, dtype=np.uint8)
        if img.shape[:2] != (h, w):
            raise ValueError("all frames must share the first frame's shape")
        raw = np.empty((h, 1 + w * channels), dtype=np.uint8)
        raw[:, 0] = 0
        raw[:, 1:] = img.reshape(h, w * channels)
        return zlib.compress(raw.tobytes(), 0)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    actl = struct.pack(">II", len(frames), 0)  # 0 = loop forever
    out = [PNG_SIGNATURE, _chunk(b"IHDR", ihdr), _chunk(b"acTL", actl)]
    seq = 0
    for i, frame in enumerate(frames):
        fctl = struct.pack(
            ">IIIIIHHBB",
            seq, w, h, 0, 0,  # sequence, width, height, x_off, y_off
            delay_ms, 1000,   # delay fraction
            0, 0,             # dispose NONE, blend SOURCE
        )
        out.append(_chunk(b"fcTL", fctl))
        seq += 1
        data = raw_stream(frame)
        if i == 0:
            out.append(_chunk(b"IDAT", data))
        else:
            out.append(_chunk(b"fdAT", struct.pack(">I", seq) + data))
            seq += 1
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def apng_info(data: bytes) -> dict:
    """Cheap header probe: {width, height, channels, n_frames,
    delay_ms} from IHDR + acTL + first fcTL, no pixel decompression.
    Raises ValueError if not an APNG (plain PNGs have no acTL)."""
    if not data.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_SIGNATURE)
    n = len(data)
    width = height = channels = None
    n_frames = None
    delay_ms = None
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, _c, _f, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or interlace or color_type not in _COLOR_CHANNELS:
                raise ValueError("unsupported PNG variant")
            width, height, channels = w, h, _COLOR_CHANNELS[color_type]
        elif tag == b"acTL":
            n_frames = struct.unpack(">II", payload)[0]
        elif tag == b"fcTL" and delay_ms is None:
            f = struct.unpack(">IIIIIHHBB", payload)
            delay_ms = int(round(f[5] * 1000 / (f[6] or 100)))
        elif tag == b"IEND":
            break
    if n_frames is None:
        raise ValueError("PNG without acTL — not animated")
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "n_frames": n_frames,
        "delay_ms": delay_ms,
    }


def decode_apng_frame(data: bytes, frame_idx: int) -> np.ndarray:
    """Decode ONLY frame ``frame_idx`` (independent-frames subset —
    the keyframe-seek property: no other frame is decompressed)."""
    info = apng_info(data)
    if not 0 <= frame_idx < info["n_frames"]:
        raise ValueError(f"frame {frame_idx} out of range")
    w, h, channels = info["width"], info["height"], info["channels"]
    stride = w * channels
    pos = len(PNG_SIGNATURE)
    n = len(data)
    k = -1
    cur: bytearray | None = None
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"fcTL":
            if cur is not None:
                break  # passed the wanted frame's data
            f = struct.unpack(">IIIIIHHBB", payload)
            if (f[1], f[2], f[3], f[4]) != (w, h, 0, 0) or f[8] != 0:
                raise ValueError("composited APNG unsupported")
            k += 1
            if k == frame_idx:
                cur = bytearray()
        elif tag == b"IDAT" and cur is not None and k == frame_idx:
            cur.extend(payload)
        elif tag == b"fdAT" and cur is not None and k == frame_idx:
            cur.extend(payload[4:])
        elif tag == b"IEND":
            break
    if cur is None:
        raise ValueError("frame data not found")
    raw = np.frombuffer(zlib.decompress(bytes(cur)), dtype=np.uint8)
    if raw.size != h * (1 + stride):
        raise ValueError("APNG frame pixel stream size mismatch")
    px = _defilter(raw.reshape(h, 1 + stride), h, stride, channels)
    img = px.reshape(h, w, channels)
    return img[:, :, 0] if channels == 1 else img


def decode_apng(data: bytes) -> tuple[list[np.ndarray], dict]:
    """APNG bytes → (list of uint8 frame arrays, info dict). Only the
    independent-frames subset (full-canvas, blend SOURCE) is accepted;
    composited APNGs raise ValueError (upstream falls back to stubs)."""
    info = apng_info(data)
    w, h, channels = info["width"], info["height"], info["channels"]
    stride = w * channels
    pos = len(PNG_SIGNATURE)
    n = len(data)
    streams: list[bytearray] = []
    cur: bytearray | None = None
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"fcTL":
            f = struct.unpack(">IIIIIHHBB", payload)
            if (f[1], f[2], f[3], f[4]) != (w, h, 0, 0) or f[8] != 0:
                raise ValueError(
                    "composited APNG (region frame or blend-over) unsupported"
                )
            cur = bytearray()
            streams.append(cur)
        elif tag == b"IDAT":
            if cur is None:  # IDAT before any fcTL: not an animation frame
                raise ValueError("APNG IDAT outside a frame")
            cur.extend(payload)
        elif tag == b"fdAT":
            if cur is None:
                raise ValueError("fdAT before fcTL")
            cur.extend(payload[4:])  # strip the sequence number
        elif tag == b"IEND":
            break
    if len(streams) != info["n_frames"]:
        raise ValueError(
            f"acTL declares {info['n_frames']} frames, found {len(streams)}"
        )
    frames = []
    for s in streams:
        raw = np.frombuffer(zlib.decompress(bytes(s)), dtype=np.uint8)
        if raw.size != h * (1 + stride):
            raise ValueError("APNG frame pixel stream size mismatch")
        px = _defilter(raw.reshape(h, 1 + stride), h, stride, channels)
        img = px.reshape(h, w, channels)
        if channels == 1:
            img = img[:, :, 0]
        frames.append(img)
    return frames, info
