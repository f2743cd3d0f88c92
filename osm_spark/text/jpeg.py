"""Pure-python baseline JPEG (JFIF) codec — closes the last md5-stub
modality (VERDICT r4 missing #2 / next #4).

The container has no image libraries, but baseline sequential JPEG
needs none: the container format is 0xFF-tagged marker segments
(struct), entropy coding is canonical Huffman over (runlength, size)
symbols, and the transform is an 8×8 DCT-II — numpy matrix products.
Same spirit as the PNG codec (text/png.py): implement the wire
format, not a binding.

Encoder: 8-bit greyscale (1 component) or RGB (YCbCr, 4:4:4 or 4:2:0
subsampling), Annex-K quantization tables scaled by the libjpeg
quality formula, Annex-K standard Huffman tables, byte-stuffed
entropy stream, JFIF APP0. One deliberate determinism refinement over
a float-only encoder: DCT coefficients are integerized
(half-away-from-zero) BEFORE integer quantization, so the quantized
code for a coefficient sitting exactly on a rounding boundary is a
pure-integer decision a SQL oracle can replay — float jitter ~1e-12
around `q/2` can never flip it (q163's closed-form contract).

Decoder: baseline sequential DCT (SOF0) only — greyscale, 4:4:4,
4:2:2 and 4:2:0 YCbCr; multi-segment DQT/DHT, restart intervals
(DRI/RSTn), byte unstuffing, spec Huffman DECODE/RECEIVE/EXTEND,
dequantize → dezigzag → float64 IDCT → level shift with
floor(x + 0.5) rounding and [0,255] clamp, chroma upsample by sample
replication, JFIF YCbCr→RGB. Progressive (SOF2), arithmetic coding,
12-bit precision and hierarchical modes are REJECTED with a clear
error — the multimodal decode stage falls back to the md5 stub for
anything this decoder cannot handle, so unknown formats degrade, not
crash (multimodal.extract_features).

Validated against real-world encoder output: CPython's and IPython's
test-suite JPEGs (baseline greyscale and 4:2:0 color from libjpeg
lineage) parse and decode (tests/test_jpeg.py golden fixtures).

No reference counterpart (pmezard/osm has no media path); this is the
training-data extension surface (SURVEY §2.9, X27 completion).
"""

from __future__ import annotations

import struct

import numpy as np

SOI = b"\xff\xd8"

# ITU-T T.81 Annex K.1 — example quantization tables.
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

# Zigzag scan order: position k of the scan reads row-major index
# ZIGZAG[k] of the 8×8 block.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# ITU-T T.81 Annex K.3 — typical Huffman tables (BITS, HUFFVAL).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
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
]


def _dct_matrix() -> np.ndarray:
    """T[u, x] = C(u)/2 · cos((2x+1)uπ/16) — F = T f Tᵀ, f = Tᵀ F T."""
    T = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        cu = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            T[u, x] = 0.25 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0) * 2.0
    return T


_T = _dct_matrix()


def _iround(x: np.ndarray) -> np.ndarray:
    """Half-away-from-zero integerization (the house convention —
    pq.quantize_np), applied elementwise."""
    return np.where(
        x >= 0.0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


def quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 1..100 → scaled Annex-K table, each
    entry clamped to [1, 255]. quality=50 returns the table verbatim."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality {quality} outside [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (table * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int64)


def quantize_dc_closed_form(c: int, q00: int) -> int:
    """The q163 oracle's closed form: decoded value of a CONSTANT 8×8
    greyscale block of value ``c`` through encode→decode at DC quant
    step ``q00`` (a multiple of 8 keeps the reconstruction integral):
    k = round_half_away(8(c−128), q00); decoded = clamp(k·q00/8 + 128).
    Shared by tests and documentation of the oracle SQL."""
    dc = 8 * c - 1024
    k = (abs(dc) + q00 // 2) // q00
    k = k if dc >= 0 else -k
    v = int(np.floor(k * q00 / 8.0 + 128.5))
    return max(0, min(255, v))


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec

    def restart(self, idx: int) -> None:
        """Byte-align and emit RSTn — between restart intervals."""
        self.flush()
        self.out += bytes([0xFF, 0xD0 + (idx & 7)])


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 C.2): symbol → (code, len)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _magnitude(v: int) -> tuple[int, int]:
    """(ssss, value-bits) per T.81 F.1.2 — negatives coded as
    v + 2^ssss − 1."""
    a = abs(v)
    ssss = int(a).bit_length()
    bits = v if v >= 0 else v + (1 << ssss) - 1
    return ssss, bits


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    """JFIF full-range RGB→YCbCr, floor(x+0.5) rounding, clamped."""
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    f = ycc.astype(np.float64)
    y, cb, cr = f[..., 0], f[..., 1] - 128.0, f[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate to multiples of (mh, mw) — the spec's
    recommended extension, keeps block boundaries smooth."""
    h, w = plane.shape
    H = -(-h // mh) * mh
    W = -(-w // mw) * mw
    return np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")


def _encode_blocks(
    plane: np.ndarray,
    qtab: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    bw: _BitWriter,
    prev_dc: int,
    bx0: int,
    by0: int,
    nbx: int,
    nby: int,
) -> int:
    """Huffman-encode the (by0..by0+nby)×(bx0..bx0+nbx) blocks of an
    already-padded plane; returns the updated DC predictor."""
    for byy in range(by0, by0 + nby):
        for bxx in range(bx0, bx0 + nbx):
            blk = plane[
                byy * 8 : byy * 8 + 8, bxx * 8 : bxx * 8 + 8
            ].astype(np.float64) - 128.0
            F = _T @ blk @ _T.T
            Fi = _iround(F)  # exact-integer boundary decisions
            q = np.where(
                Fi >= 0,
                (Fi + qtab // 2) // qtab,
                -((-Fi + qtab // 2) // qtab),
            )
            zz = q.reshape(-1)[ZIGZAG]
            dc = int(zz[0])
            diff = dc - prev_dc
            prev_dc = dc
            ssss, vbits = _magnitude(diff)
            code, length = dc_codes[ssss]
            bw.write(code, length)
            bw.write(vbits, ssss)
            run = 0
            last_nz = 0
            for k in range(1, 64):
                if zz[k] != 0:
                    last_nz = k
            for k in range(1, last_nz + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                ssss, vbits = _magnitude(v)
                code, length = ac_codes[(run << 4) | ssss]
                bw.write(code, length)
                bw.write(vbits, ssss)
                run = 0
            if last_nz != 63:
                code, length = ac_codes[0x00]  # EOB
                bw.write(code, length)
    return prev_dc


def encode_jpeg(
    img: np.ndarray,
    quality: int = 50,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (H, W) greyscale or (H, W, 3) RGB → baseline JFIF bytes.

    ``subsampling``: "444" (no chroma subsampling) or "420" (2×2 box
    mean, the web default); ignored for greyscale.
    ``restart_interval``: emit DRI + RSTn every N MCUs (greyscale
    encode only — enough to exercise the decoder's restart resync)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        ncomp = 1
    elif img.ndim == 3 and img.shape[2] == 3:
        ncomp = 3
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w = img.shape[0], img.shape[1]
    ql = quality_scale(QUANT_LUMA, quality)
    qc = quality_scale(QUANT_CHROMA, quality)
    ql_z = ql.reshape(-1)[ZIGZAG]
    qc_z = qc.reshape(-1)[ZIGZAG]

    out = bytearray()
    out += SOI
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(v) for v in ql_z
    )
    if ncomp == 3:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(
            int(v) for v in qc_z
        )
    sub420 = ncomp == 3 and subsampling == "420"
    samp_y = 0x22 if sub420 else 0x11
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    sof += bytes([1, samp_y, 0])
    if ncomp == 3:
        sof += bytes([2, 0x11, 1, 3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for cls, tid, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
    ) + (
        ((0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
         (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS))
        if ncomp == 3
        else ()
    ):
        payload = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    if restart_interval:
        if ncomp != 1:
            raise ValueError("restart_interval: greyscale encode only")
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp, 1, 0x00])
    if ncomp == 3:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    bw = _BitWriter()
    if ncomp == 1:
        y = _pad_edge(img, 8, 8)
        nbx, nby = y.shape[1] // 8, y.shape[0] // 8
        if restart_interval:
            pdc0 = 0
            mcu = 0
            for byy in range(nby):
                for bxx in range(nbx):
                    if mcu and mcu % restart_interval == 0:
                        bw.restart(mcu // restart_interval - 1)
                        pdc0 = 0
                    pdc0 = _encode_blocks(
                        y, ql, dc_l, ac_l, bw, pdc0, bxx, byy, 1, 1
                    )
                    mcu += 1
        else:
            _encode_blocks(
                y, ql, dc_l, ac_l, bw, 0, 0, 0, nbx, nby
            )
    else:
        ycc = _rgb_to_ycbcr(img)
        dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
        ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
        if sub420:
            y = _pad_edge(ycc[..., 0], 16, 16)
            # 2×2 box mean, half-away rounding, then pad to blocks
            cbp = _pad_edge(ycc[..., 1], 2, 2).astype(np.float64)
            crp = _pad_edge(ycc[..., 2], 2, 2).astype(np.float64)
            cb = _iround(
                (cbp[0::2, 0::2] + cbp[0::2, 1::2]
                 + cbp[1::2, 0::2] + cbp[1::2, 1::2]) / 4.0
            ).astype(np.uint8)
            cr = _iround(
                (crp[0::2, 0::2] + crp[0::2, 1::2]
                 + crp[1::2, 0::2] + crp[1::2, 1::2]) / 4.0
            ).astype(np.uint8)
            cb = _pad_edge(cb, 8, 8)
            cr = _pad_edge(cr, 8, 8)
            mcux = y.shape[1] // 16
            mcuy = y.shape[0] // 16
            pdc = [0, 0, 0]
            for my in range(mcuy):
                for mx in range(mcux):
                    pdc[0] = _encode_blocks(
                        y, ql, dc_l, ac_l, bw, pdc[0],
                        mx * 2, my * 2, 2, 1,
                    )
                    pdc[0] = _encode_blocks(
                        y, ql, dc_l, ac_l, bw, pdc[0],
                        mx * 2, my * 2 + 1, 2, 1,
                    )
                    pdc[1] = _encode_blocks(
                        cb, qc, dc_c, ac_c, bw, pdc[1], mx, my, 1, 1
                    )
                    pdc[2] = _encode_blocks(
                        cr, qc, dc_c, ac_c, bw, pdc[2], mx, my, 1, 1
                    )
        else:
            planes = [
                _pad_edge(ycc[..., i], 8, 8) for i in range(3)
            ]
            mcux = planes[0].shape[1] // 8
            mcuy = planes[0].shape[0] // 8
            pdc = [0, 0, 0]
            tabs = [(ql, dc_l, ac_l), (qc, dc_c, ac_c), (qc, dc_c, ac_c)]
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci in range(3):
                        qt, dct_, act_ = tabs[ci]
                        pdc[ci] = _encode_blocks(
                            planes[ci], qt, dct_, act_, bw, pdc[ci],
                            mx, my, 1, 1,
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    """Entropy-stream bit reader with byte unstuffing; stops at any
    non-RST marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("jpeg: truncated entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                # a real marker terminates the current entropy segment
                self.marker = nxt
                raise _MarkerReached()
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self, expected: int) -> None:
        """Consume the RSTn marker at a restart boundary and resync."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        # skip any fill bytes then the marker
        while self.pos + 1 < len(d) and not (
            d[self.pos] == 0xFF and d[self.pos + 1] != 0x00
        ):
            self.pos += 1
        if self.pos + 1 >= len(d):
            raise ValueError("jpeg: missing restart marker")
        m = d[self.pos + 1]
        if not 0xD0 <= m <= 0xD7:
            raise ValueError(f"jpeg: expected RST marker, got FF{m:02X}")
        if m != 0xD0 + (expected & 7):
            raise ValueError("jpeg: restart marker out of sequence")
        self.pos += 2
        self.marker = None


class _MarkerReached(Exception):
    pass


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """(length, code) → symbol map for spec DECODE."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, ssss: int) -> int:
    if ssss == 0:
        return 0
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


def decode_jpeg(data: bytes) -> tuple[np.ndarray, dict]:
    """Baseline JFIF bytes → (uint8 image, meta).

    Image is (H, W) for greyscale, (H, W, 3) RGB otherwise. Meta:
    {width, height, codec: "jpeg", n_components, subsampling}.
    Raises ValueError for anything that is not baseline sequential
    8-bit Huffman JPEG (the caller's stub-fallback contract)."""
    if len(data) < 4 or data[:2] != SOI:
        raise ValueError("jpeg: missing SOI")
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    restart_interval = 0
    frame = None
    pos = 2
    n = len(data)
    while pos + 1 < n:
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > n:
            raise ValueError("jpeg: truncated segment")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = np.frombuffer(
                    seg[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                qtabs[tq] = tab.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                cnt = sum(bits)
                vals = list(seg[i + 17 : i + 17 + cnt])
                htabs[(cls, tid)] = _build_decode_table(bits, vals)
                i += 17 + cnt
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xC0 or marker == 0xC1:  # baseline / ext sequential
            prec, fh, fw, nc = (
                seg[0],
                struct.unpack(">H", seg[1:3])[0],
                struct.unpack(">H", seg[3:5])[0],
                seg[5],
            )
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = {"w": fw, "h": fh, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"jpeg: non-baseline frame FF{marker:02X} unsupported "
                "(progressive/arithmetic/hierarchical)"
            )
        elif marker == 0xDA:  # SOS — decode the scan, then finish
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(
                    x for x in frame["comps"] if x["id"] == cs
                )
                scomps.append(
                    {**comp, "dc": tt >> 4, "ac": tt & 15}
                )
            if ns != len(frame["comps"]):
                raise ValueError("jpeg: multi-scan files unsupported")
            img = _decode_scan(
                data, pos + seglen, frame, scomps, qtabs, htabs,
                restart_interval,
            )
            sub = "grey"
            if len(frame["comps"]) == 3:
                hy = frame["comps"][0]["h"], frame["comps"][0]["v"]
                sub = {
                    (1, 1): "444", (2, 2): "420", (2, 1): "422",
                    (1, 2): "440",
                }.get(hy, f"{hy[0]}x{hy[1]}")
            meta = {
                "width": frame["w"],
                "height": frame["h"],
                "codec": "jpeg",
                "n_components": len(frame["comps"]),
                "subsampling": sub,
            }
            return img, meta
        pos += seglen
    raise ValueError("jpeg: no scan found")


def _decode_scan(
    data: bytes,
    pos: int,
    frame: dict,
    scomps: list[dict],
    qtabs: dict,
    htabs: dict,
    restart_interval: int,
) -> np.ndarray:
    fw, fh = frame["w"], frame["h"]
    hmax = max(c["h"] for c in scomps)
    vmax = max(c["v"] for c in scomps)
    if hmax > 2 or vmax > 2:
        raise ValueError("jpeg: sampling factors above 2 unsupported")
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    planes = []
    for c in scomps:
        pw = mcux * 8 * c["h"]
        ph = mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.uint8))
        if c["tq"] not in qtabs:
            raise ValueError(f"jpeg: missing quant table {c['tq']}")
        if (0, c["dc"]) not in htabs or (1, c["ac"]) not in htabs:
            raise ValueError("jpeg: missing Huffman table")
    br = _BitReader(data, pos)
    pred = [0] * len(scomps)
    Tt = _T.T
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                br.align_restart(mcu_count // restart_interval - 1)
                pred = [0] * len(scomps)
            try:
                for ci, c in enumerate(scomps):
                    qt = qtabs[c["tq"]]
                    dct_t = htabs[(0, c["dc"])]
                    act_t = htabs[(1, c["ac"])]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            zz = np.zeros(64, dtype=np.int64)
                            ssss = _huff_decode(br, dct_t)
                            diff = _extend(br.bits(ssss), ssss)
                            pred[ci] += diff
                            zz[0] = pred[ci]
                            k = 1
                            while k < 64:
                                rs = _huff_decode(br, act_t)
                                r, s = rs >> 4, rs & 15
                                if s == 0:
                                    if r == 15:
                                        k += 16  # ZRL
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    raise ValueError(
                                        "jpeg: AC run past block end"
                                    )
                                zz[k] = _extend(br.bits(s), s)
                                k += 1
                            blk = np.zeros(64, dtype=np.int64)
                            blk[ZIGZAG] = zz
                            Fdeq = (blk.reshape(8, 8) * qt).astype(
                                np.float64
                            )
                            f = Tt @ Fdeq @ _T
                            px = np.clip(
                                np.floor(f + 128.5), 0, 255
                            ).astype(np.uint8)
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            except _MarkerReached:
                raise ValueError(
                    f"jpeg: marker FF{br.marker:02X} inside scan"
                ) from None
            mcu_count += 1
    if len(scomps) == 1:
        return planes[0][:fh, :fw]
    up = []
    for ci, c in enumerate(scomps):
        p = planes[ci]
        if c["h"] < hmax or c["v"] < vmax:
            p = np.repeat(
                np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        up.append(p[: mcuy * 8 * vmax, : mcux * 8 * hmax])
    ycc = np.stack(up, axis=-1)[:fh, :fw]
    return _ycbcr_to_rgb(ycc)
