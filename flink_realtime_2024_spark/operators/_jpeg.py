"""JFIF (JPEG) codec — stdlib + numpy, no external libraries.

Implements the interoperable subset cameras/browsers produce and read:
baseline sequential DCT (SOF0) AND progressive DCT (SOF2, round-7),
8-bit YCbCr in 4:4:4 or 4:2:0, with the ITU-T T.81 Annex-K default
quantization and Huffman tables (quality-scaled per the IJG
convention). Grayscale payloads are encoded as 1-component JFIF; 4:2:0
chroma subsampling (2×2-mean downsample, 16×16 MCUs) is supported on
both sides. The progressive decoder covers the full Annex-G scan
algebra — spectral selection, successive approximation (DC/AC first
and refinement scans), EOB runs — and the progressive encoder emits a
six-scan successive-approximation progression (libjpeg's default scan
script, simplified to one AC band). Restart intervals (DRI + RSTn,
§F.2.1.3.1) are handled on decode in both modes and available on
encode (``restart_interval=``). Arithmetic coding, hierarchical mode,
and other sampling layouts remain out of scope and rejected loudly.

Spec references (all public): ITU-T Recommendation T.81 (1992) —
sections A.3.3 (FDCT/IDCT), F.1.2 (Huffman entropy coding), Annex G
(progressive: §G.1.2.1 DC point transform, §G.1.2.2 EOBn, §G.1.2.3
AC successive approximation — control flow mirrors the reference
libjpeg jdphuff.c), Annex K (example tables); JFIF 1.02 (ECMA TR/98)
for the APP0 wrapper; the quality→scale-factor mapping follows the
Independent JPEG Group's libjpeg ``jpeg_quality_scaling``.
"""

from __future__ import annotations

import functools
import struct

import numpy as np

# --- Annex K example tables (T.81 §K.1-K.2) ---------------------------------

_Q_LUMA = np.array(
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
    dtype=np.int32,
)

_Q_CHROMA = np.array(
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
    dtype=np.int32,
)

# (BITS, HUFFVAL) pairs, T.81 §K.3.3 — the default Huffman tables
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# zigzag scan order (T.81 Figure A.6): _ZIGZAG[k] = flat index of the
# k-th coefficient in scan order
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)
_UNZIGZAG = np.argsort(_ZIGZAG)

# orthonormal 8-point DCT-II matrix: block_dct = D @ block @ D.T
_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling: 50 → Annex-K tables verbatim."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_Q_LUMA, _Q_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


class _HuffEncoder:
    """(size, code) per symbol from a (BITS, HUFFVAL) table — canonical
    code assignment per T.81 §C.2."""

    def __init__(self, bits, huffval):
        self.size = {}
        self.code = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                sym = huffval[k]
                self.size[sym] = length
                self.code[sym] = code
                code += 1
                k += 1
            code <<= 1


class _HuffDecoder:
    """Table-driven canonical-code decoder: one 2^16 lookup maps a
    16-bit peek window straight to (symbol, code length) — the classic
    fast-Huffman technique (JPEG codes are ≤16 bits by spec), replacing
    a bit-at-a-time tree walk with a single indexed load per symbol."""

    def __init__(self, bits, huffval):
        self.lut = np.full(1 << 16, -1, dtype=np.int32)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                base = code << (16 - length)
                self.lut[base : base + (1 << (16 - length))] = (
                    huffval[k] << 8
                ) | length
                code += 1
                k += 1
            code <<= 1


@functools.lru_cache(maxsize=64)
def _cached_huff_decoder(bits: tuple, huffval: tuple) -> _HuffDecoder:
    """The four 2^16-entry LUTs (~1 MB) depend only on the (bits,
    huffval) table bytes, and the default JFIF tables never change —
    memoizing per process removes a pure per-image rebuild from the
    mapInPandas decode hot loop."""
    return _HuffDecoder(list(bits), list(huffval))


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, size: int) -> None:
        self.acc = (self.acc << size) | (code & ((1 << size) - 1))
        self.nbits += size
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 §F.1.2.3)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:  # pad the final partial byte with 1s (T.81 §F.1.2.3)
            pad = 8 - self.nbits
            byte = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        """Pull one entropy byte into the accumulator; False at the end
        of the entropy segment (data exhausted or a marker reached)."""
        if self.pos >= len(self.data):
            return False
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 < len(self.data) and self.data[self.pos + 1] == 0x00:
                self.pos += 2  # unstuff
            else:
                return False  # marker terminates the entropy stream
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def bits(self, n: int) -> int:
        while self.nbits < n and self._fill():
            pass
        if self.nbits < n:
            raise EOFError("entropy stream exhausted")
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def peek16(self) -> int:
        while self.nbits < 16 and self._fill():
            pass
        if self.nbits >= 16:
            return (self.acc >> (self.nbits - 16)) & 0xFFFF
        # stream tail: left-align what remains, zero-pad (the padded
        # bits are never consumed when block counts line up)
        return (self.acc << (16 - self.nbits)) & 0xFFFF

    def consume(self, n: int) -> None:
        if n > self.nbits:
            raise EOFError("entropy stream exhausted")
        self.nbits -= n

    def restart(self) -> None:
        """Consume an RSTn marker (T.81 §F.2.1.3.1): discard the bits
        of the current (1-padded) partial byte, then expect FF D0-D7 at
        the byte boundary. Entropy state (DC predictors, EOB runs) is
        the caller's to reset."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or not (0xD0 <= self.data[self.pos + 1] <= 0xD7)
        ):
            raise ValueError("expected restart marker")
        self.pos += 2


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) per T.81 §F.1.2.1: negative values encode
    as value-1 in ``size`` bits."""
    if v == 0:
        return 0, 0
    size = int(v if v > 0 else -v).bit_length()
    if v < 0:
        v = v - 1
    return size, v & ((1 << size) - 1)


def _extend(bits_val: int, size: int) -> int:
    if size == 0:
        return 0
    if bits_val < (1 << (size - 1)):
        return bits_val - (1 << size) + 1
    return bits_val


def _fdct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """All 8×8 blocks of a (h8, w8) level-shifted plane → quantized
    coefficient blocks, vectorized: (n_blocks, 8, 8) int32."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    coeff = np.einsum("ij,bjk,lk->bil", _D, blocks.astype(np.float64), _D)
    return np.round(coeff / qtab).astype(np.int32)


def _dequant_idct(blocks: np.ndarray, qtab: np.ndarray, h: int, w: int) -> np.ndarray:
    coeff = blocks.astype(np.float64) * qtab
    pix = np.einsum("ji,bjk,kl->bil", _D, coeff, _D)
    nbh, nbw = h // 8, w // 8
    return pix.reshape(nbh, nbw, 8, 8).transpose(0, 2, 1, 3).reshape(h, w)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    px = px.astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255)


def _pad_to_8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _encode_blocks(writer, blocks, dc_enc, ac_enc, dc_pred):
    for b in blocks:
        z = b.reshape(64)[_ZIGZAG]
        diff = int(z[0]) - dc_pred
        dc_pred = int(z[0])
        size, amp = _magnitude(diff)
        writer.put(dc_enc.code[size], dc_enc.size[size])
        if size:
            writer.put(amp, size)
        run = 0
        last_nz = np.nonzero(z[1:])[0]
        last = last_nz[-1] + 1 if len(last_nz) else 0
        for k in range(1, last + 1):
            v = int(z[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                writer.put(ac_enc.code[0xF0], ac_enc.size[0xF0])  # ZRL
                run -= 16
            size, amp = _magnitude(v)
            sym = (run << 4) | size
            writer.put(ac_enc.code[sym], ac_enc.size[sym])
            writer.put(amp, size)
            run = 0
        if last < 63:
            writer.put(ac_enc.code[0x00], ac_enc.size[0x00])  # EOB
    return dc_pred


def _pad_to(plane: np.ndarray, m: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, -h % m), (0, -w % m)), mode="edge")


def _quantized_components(pixels: np.ndarray, quality: int, subsample: bool):
    """Shared front half of both encoders: color transform, padding,
    optional 4:2:0 downsample, FDCT+quant. Returns (gray, coeffs,
    samplings, luma padded dims, q_luma, q_chroma); ``coeffs[i]`` is
    (n_blocks, 8, 8) int32 in plane-raster block order."""
    gray = pixels.ndim == 2
    q_luma, q_chroma = _quality_tables(quality)
    if gray:
        plane = _pad_to_8(pixels.astype(np.float64))
        coeffs = [_fdct_quant(plane - 128.0, q_luma)]
        samplings = [0x11]
        pdims = plane.shape
    elif subsample:
        ycc = _rgb_to_ycbcr(pixels)
        y16 = _pad_to(ycc[..., 0], 16)
        cb = _pad_to(ycc[..., 1], 16)
        cr = _pad_to(ycc[..., 2], 16)
        # 2×2 mean downsample → chroma planes at half resolution
        def down(p):
            return p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))

        coeffs = [
            _fdct_quant(y16 - 128.0, q_luma),
            _fdct_quant(down(cb) - 128.0, q_chroma),
            _fdct_quant(down(cr) - 128.0, q_chroma),
        ]
        samplings = [0x22, 0x11, 0x11]
        pdims = y16.shape
    else:
        ycc = _rgb_to_ycbcr(pixels)
        y8 = _pad_to_8(ycc[..., 0])
        coeffs = [
            _fdct_quant(y8 - 128.0, q_luma),
            _fdct_quant(_pad_to_8(ycc[..., 1]) - 128.0, q_chroma),
            _fdct_quant(_pad_to_8(ycc[..., 2]) - 128.0, q_chroma),
        ]
        samplings = [0x11, 0x11, 0x11]
        pdims = y8.shape
    return gray, coeffs, samplings, pdims, q_luma, q_chroma


def _write_headers(
    out: bytearray, gray: bool, h: int, w: int, samplings, q_luma, q_chroma,
    sof_marker: int,
) -> None:
    """SOI / APP0 / DQT / SOF / DHT — identical for baseline (SOF0) and
    progressive (SOF2) apart from the frame marker."""
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    for tid, tab in ([(0, q_luma)] if gray else [(0, q_luma), (1, q_chroma)]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(
            int(tab.reshape(64)[_ZIGZAG][k]) for k in range(64)
        )
    ncomp = 1 if gray else 3
    out += bytes([0xFF, sof_marker]) + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        qid = 0 if cid == 1 else 1
        out += struct.pack("BBB", cid, samplings[cid - 1], qid)
    tables = [(_HUFF_DC_LUMA, 0x00), (_HUFF_AC_LUMA, 0x10)]
    if not gray:
        tables += [(_HUFF_DC_CHROMA, 0x01), (_HUFF_AC_CHROMA, 0x11)]
    for (bits, vals), tc_th in tables:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)


def encode_jpeg(
    pixels: np.ndarray, quality: int = 85, subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) RGB uint8 or (h, w) grayscale → baseline JFIF bytes.
    ``subsample=True`` emits 4:2:0 (2×2-mean chroma downsample, 2x2/1x1
    sampling factors, 16×16 MCUs) — the layout cameras and browsers
    produce by default; False emits 4:4:4. ``restart_interval`` > 0
    emits DRI + an RSTn marker every that-many MCUs (resynchronization
    points — what real camera files carry for error resilience)."""
    h, w = pixels.shape[:2]
    gray, coeffs, samplings, pdims, q_luma, q_chroma = _quantized_components(
        pixels, quality, subsample
    )
    out = bytearray()
    _write_headers(out, gray, h, w, samplings, q_luma, q_chroma, 0xC0)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    ncomp = len(coeffs)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid in range(1, ncomp + 1):
        td_ta = 0x00 if cid == 1 else 0x11
        out += struct.pack("BB", cid, td_ta)
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    writer = _BitWriter()
    dc_l = _HuffEncoder(*_HUFF_DC_LUMA)
    ac_l = _HuffEncoder(*_HUFF_AC_LUMA)
    dc_c = _HuffEncoder(*_HUFF_DC_CHROMA)
    ac_c = _HuffEncoder(*_HUFF_AC_CHROMA)
    preds = [0] * len(coeffs)
    encs = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (len(coeffs) - 1)
    rst_n = 0
    mcu_i = 0

    def maybe_restart() -> None:
        nonlocal rst_n, mcu_i
        if restart_interval and mcu_i and mcu_i % restart_interval == 0:
            writer.flush()
            writer.out += bytes([0xFF, 0xD0 + rst_n])
            rst_n = (rst_n + 1) % 8
            for ci in range(len(preds)):
                preds[ci] = 0
        mcu_i += 1

    if not subsample or gray:
        # 1×1 sampling: the interleaved MCU is one block per component
        nb = coeffs[0].shape[0]
        for bi in range(nb):
            maybe_restart()
            for ci, c in enumerate(coeffs):
                preds[ci] = _encode_blocks(
                    writer, c[bi : bi + 1], encs[ci][0], encs[ci][1], preds[ci]
                )
    else:
        # 4:2:0 MCU = 4 luma blocks (2×2 raster) + 1 Cb + 1 Cr
        ph, pw = pdims
        nbw = pw // 8
        mcw = pw // 16
        mch = ph // 16
        for mr in range(mch):
            for mc in range(mcw):
                maybe_restart()
                for dy in (0, 1):
                    for dx in (0, 1):
                        bi = (2 * mr + dy) * nbw + 2 * mc + dx
                        preds[0] = _encode_blocks(
                            writer, coeffs[0][bi : bi + 1], dc_l, ac_l, preds[0]
                        )
                ci_b = mr * mcw + mc
                for ci in (1, 2):
                    preds[ci] = _encode_blocks(
                        writer, coeffs[ci][ci_b : ci_b + 1], dc_c, ac_c, preds[ci]
                    )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _entropy_end(payload: bytes, start: int) -> int:
    """Index just past the entropy-coded segment beginning at ``start``:
    the first 0xFF followed by a real marker (not 0x00 byte-stuffing,
    not an RST)."""
    i = start
    n = len(payload)
    while True:
        i = payload.find(b"\xff", i, n - 1)
        if i < 0:
            return n
        nxt = payload[i + 1]
        if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
            return i
        i += 2


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JFIF bytes → (h, w, 3) RGB uint8 (grayscale replicated if
    1-component). Supports baseline sequential (SOF0) AND progressive
    DCT (SOF2, T.81 Annex G: spectral selection + successive
    approximation, all four scan kinds — DC first/refine, AC
    first/refine with EOB runs), in 4:4:4 / 4:2:0 / grayscale, with
    restart intervals (DRI + RSTn) in both modes. Arithmetic coding,
    hierarchical mode, and other sampling layouts are rejected
    loudly."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff_dec: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    progressive = False
    blocks_per_comp: list[np.ndarray] | None = None
    comp_dims = None
    mch = mcw = max_h = max_v = 0
    h = w = 0
    comps: list = []
    restart_interval = 0
    baseline_decoded = False
    scans_decoded = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                flat = np.frombuffer(seg, np.uint8, 64, off + 1).astype(np.int32)
                tab = np.zeros(64, np.int32)
                tab[_ZIGZAG] = flat
                qtabs[tq] = tab.reshape(8, 8)
                off += 65
        elif marker == 0xC4:
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0xF
                bits = list(seg[off + 1 : off + 17])
                n = sum(bits)
                vals = list(seg[off + 17 : off + 17 + n])
                huff_dec[(tc, th)] = _cached_huff_decoder(
                    tuple(bits), tuple(vals)
                )
                off += 17 + n
        elif marker in (0xC0, 0xC2):
            progressive = marker == 0xC2
            prec, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = struct.unpack_from("BBB", seg, 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            hvs = [(c[1], c[2]) for c in comps]
            if not (
                all(f == (1, 1) for f in hvs)
                or (len(hvs) == 3 and hvs[0] == (2, 2) and hvs[1] == hvs[2] == (1, 1))
            ):
                raise ValueError(
                    "unsupported sampling (4:4:4, 4:2:0, or grayscale only)"
                )
            frame = (h, w, comps)
            max_h = max(c[1] for c in comps)
            max_v = max(c[2] for c in comps)
            # frame grid padded to whole MCUs (8·max per axis); per-
            # component plane dims scale by its sampling factors
            ph, pw = h + (-h % (8 * max_v)), w + (-w % (8 * max_h))
            mch, mcw = ph // (8 * max_v), pw // (8 * max_h)
            comp_dims = [(ph * c[2] // max_v, pw * c[1] // max_h) for c in comps]
            blocks_per_comp = [
                np.zeros(((ch // 8) * (cw // 8), 64), np.int32)
                for ch, cw in comp_dims
            ]
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("non-baseline/non-progressive JPEG unsupported")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tdta = struct.unpack_from("BB", seg, 1 + 2 * i)
                scan_comps.append((cs, tdta >> 4, tdta & 0xF))
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            data_start = pos + seglen
            end = _entropy_end(payload, data_start)
            reader = _BitReader(payload[data_start:end])
            if progressive:
                _decode_progressive_scan(
                    reader, scan_comps, ss, se, ah, al, comps, comp_dims,
                    blocks_per_comp, huff_dec, mch, mcw, max_h, max_v, h, w,
                    restart_interval,
                )
            else:
                if baseline_decoded:
                    raise ValueError("multiple scans in a baseline JPEG")
                _decode_baseline_scan(
                    reader, scan_comps, comps, comp_dims,
                    blocks_per_comp, huff_dec, mch, mcw, restart_interval,
                )
                baseline_decoded = True
            scans_decoded += 1
            pos = end
            continue
        pos += seglen
    # a frame with ZERO decoded scans (e.g. a truncated progressive
    # payload with headers but no entropy data) must raise, never
    # fabricate a flat all-128 image from the zero coefficients
    if frame is None or scans_decoded == 0:
        raise ValueError("missing SOF/SOS")

    planes = []
    for ci, (cid, ch_f, cv_f, tq) in enumerate(comps):
        cph, cpw = comp_dims[ci]
        nb_c = (cph // 8) * (cpw // 8)
        tmp = np.zeros((nb_c, 64), np.int32)
        tmp[:, _ZIGZAG] = blocks_per_comp[ci]
        plane = _dequant_idct(tmp.reshape(nb_c, 8, 8), qtabs[tq], cph, cpw) + 128.0
        if (ch_f, cv_f) != (max_h, max_v):  # upsample subsampled chroma
            plane = np.repeat(
                np.repeat(plane, max_v // cv_f, axis=0), max_h // ch_f, axis=1
            )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255)
        rgb = np.repeat(y[:, :, None], 3, axis=2)
    else:
        rgb = _ycbcr_to_rgb(np.stack(planes, axis=-1))
    return np.round(rgb).astype(np.uint8)


def _decode_baseline_scan(
    reader, scan_comps, comps, comp_dims, blocks_per_comp, huff_dec, mch, mcw,
    restart_interval=0,
):
    """One interleaved baseline scan: full 64-coefficient blocks in MCU
    order (T.81 §A.2.3 — per MCU, each component contributes v×h blocks
    in raster order within the MCU). ``restart_interval`` > 0 expects
    an RSTn marker every that-many MCUs (byte-align + reset DC
    predictors, §F.2.1.3.1)."""

    def read_block(dc: _HuffDecoder, ac: _HuffDecoder, pred: int):
        z = np.zeros(64, np.int32)
        sym = _read_symbol(reader, dc)
        diff = _extend(reader.bits(sym), sym) if sym else 0
        pred += diff
        z[0] = pred
        k = 1
        while k < 64:
            sym = _read_symbol(reader, ac)
            if sym == 0x00:  # EOB
                break
            run, size = sym >> 4, sym & 0xF
            if size == 0:
                if run != 15:
                    raise ValueError("invalid AC symbol")
                k += 16  # ZRL
                continue
            k += run
            if k > 63:
                raise ValueError("AC run overflow")
            z[k] = _extend(reader.bits(size), size)
            k += 1
        return z, pred

    preds = [0] * len(comps)
    decs = []
    for _, (cs, td, ta) in zip(comps, scan_comps):
        decs.append((huff_dec[(0, td)], huff_dec[(1, ta)]))
    mcu_i = 0
    for mr in range(mch):
        for mc in range(mcw):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                reader.restart()
                preds = [0] * len(comps)
            mcu_i += 1
            for ci, (_, ch_f, cv_f, _) in enumerate(comps):
                nbw_c = comp_dims[ci][1] // 8
                for dy in range(cv_f):
                    for dx in range(ch_f):
                        z, preds[ci] = read_block(decs[ci][0], decs[ci][1], preds[ci])
                        bi = (mr * cv_f + dy) * nbw_c + mc * ch_f + dx
                        blocks_per_comp[ci][bi] = z


def _noninterleaved_grid(ci, comps, comp_dims, h, w, max_h, max_v):
    """Block grid of a NON-interleaved scan (T.81 §A.2.2): ceil over the
    component's own sample dims — possibly smaller than the MCU-padded
    storage grid, so (rows, cols, padded-row-stride) are returned."""
    cw = -(-(w * comps[ci][1]) // max_h)
    ch = -(-(h * comps[ci][2]) // max_v)
    return -(-ch // 8), -(-cw // 8), comp_dims[ci][1] // 8


def _decode_progressive_scan(
    reader, scan_comps, ss, se, ah, al, comps, comp_dims,
    blocks_per_comp, huff_dec, mch, mcw, max_h, max_v, h, w,
    restart_interval=0,
):
    """One progressive scan (T.81 Annex G). Four kinds, keyed on
    (Ss, Ah): DC first / DC refine (interleaved or single-component),
    AC first / AC refine (always single-component, with EOB runs).
    ``restart_interval`` > 0 expects an RSTn every that-many MCUs (one
    block per MCU in non-interleaved scans), resetting DC predictors
    and the EOB run."""
    cidx = {c[0]: i for i, c in enumerate(comps)}
    mcu_i = 0

    def maybe_restart(reset) -> None:
        nonlocal mcu_i
        if restart_interval and mcu_i and mcu_i % restart_interval == 0:
            reader.restart()
            reset()
        mcu_i += 1
    if ss == 0:  # ---- DC scan --------------------------------------
        if se != 0:
            raise ValueError("DC scan must have Se=0")
        decs = {cidx[cs]: huff_dec.get((0, td)) for cs, td, _ in scan_comps}
        preds = {cidx[cs]: 0 for cs, _, _ in scan_comps}

        def dc_block(ci, bi):
            blk = blocks_per_comp[ci][bi]
            if ah == 0:  # first scan: DPCM of the point-transformed DC
                sym = _read_symbol(reader, decs[ci])
                diff = _extend(reader.bits(sym), sym) if sym else 0
                preds[ci] += diff
                blk[0] = preds[ci] << al
            elif reader.bits(1):  # refinement: one raw bit, ORed in
                blk[0] |= 1 << al

        def reset_preds():
            for k in preds:
                preds[k] = 0

        if len(scan_comps) > 1:  # interleaved MCU order
            for mr in range(mch):
                for mc in range(mcw):
                    maybe_restart(reset_preds)
                    for cs, _, _ in scan_comps:
                        ci = cidx[cs]
                        _, hf, vf, _ = comps[ci]
                        nbw_c = comp_dims[ci][1] // 8
                        for dy in range(vf):
                            for dx in range(hf):
                                dc_block(ci, (mr * vf + dy) * nbw_c + mc * hf + dx)
        else:
            ci = cidx[scan_comps[0][0]]
            bh, bw, stride = _noninterleaved_grid(
                ci, comps, comp_dims, h, w, max_h, max_v
            )
            for by in range(bh):
                for bx in range(bw):
                    maybe_restart(reset_preds)
                    dc_block(ci, by * stride + bx)
        return
    # ---- AC scan: always one component ------------------------------
    if len(scan_comps) != 1:
        raise ValueError("AC scans must be non-interleaved")
    cs, _, ta = scan_comps[0]
    ci = cidx[cs]
    ac = huff_dec[(1, ta)]
    bh, bw, stride = _noninterleaved_grid(ci, comps, comp_dims, h, w, max_h, max_v)
    eobrun = 0

    def reset_eobrun():
        nonlocal eobrun
        eobrun = 0

    for by in range(bh):
        for bx in range(bw):
            maybe_restart(reset_eobrun)
            blk = blocks_per_comp[ci][by * stride + bx]
            if ah == 0:
                eobrun = _ac_first_block(reader, ac, blk, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(reader, ac, blk, ss, se, al, eobrun)


def _ac_first_block(reader, ac, blk, ss, se, al, eobrun) -> int:
    """AC coefficients of one block in a first (Ah=0) progressive scan
    (T.81 §G.1.2.2): run/size symbols as baseline, values shifted left
    by Al, plus EOBn symbols encoding a run of all-done blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _read_symbol(reader, ac)
        r, s = sym >> 4, sym & 0xF
        if s == 0:
            if r < 15:  # EOBn: run length 2^r + appended bits
                return (1 << r) + (reader.bits(r) if r else 0) - 1
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run overflow")
        blk[k] = _extend(reader.bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(reader, ac, blk, ss, se, al, eobrun) -> int:
    """Successive-approximation AC refinement of one block (T.81
    §G.1.2.3, the libjpeg decode_mcu_AC_refine control flow): each
    symbol is followed by correction bits for every already-nonzero
    coefficient passed over; newly-significant coefficients carry a
    sign bit and land on the (run+1)-th zero-HISTORY position; EOB runs
    still consume correction bits for the remainder of each band."""
    p1, m1 = 1 << al, -(1 << al)

    def refine(k_pos: int) -> None:
        if reader.bits(1) and (blk[k_pos] & p1) == 0:
            blk[k_pos] += p1 if blk[k_pos] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _read_symbol(reader, ac)
            r, s = sym >> 4, sym & 0xF
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) + (reader.bits(r) if r else 0)
                    break  # remainder handled by the EOB path below
                newval = 0  # ZRL: skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("invalid AC refinement symbol")
                newval = p1 if reader.bits(1) else m1
            while k <= se:
                if blk[k] != 0:
                    refine(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                refine(k)
            k += 1
        eobrun -= 1
    return eobrun


def _read_symbol(reader: _BitReader, dec: _HuffDecoder) -> int:
    entry = int(dec.lut[reader.peek16()])
    if entry < 0:
        raise ValueError("invalid Huffman code")
    reader.consume(entry & 0xFF)
    return entry >> 8


# --- progressive encoder (T.81 Annex G) --------------------------------------
#
# Six-scan progression with successive approximation — the shape a real
# progressive encoder (libjpeg's default scan script, simplified to one
# AC band) emits, and exactly the scans the decoder above supports:
#   1. DC first   all comps, interleaved   Ss=0 Se=0  Ah=0 Al=1
#   2. AC first   per component            Ss=1 Se=63 Ah=0 Al=1
#   3. DC refine  all comps, interleaved   Ss=0 Se=0  Ah=1 Al=0
#   4. AC refine  per component            Ss=1 Se=63 Ah=1 Al=0
# DC point transform is an ARITHMETIC shift (G.1.2.1 — two's-complement
# OR in the decoder reassembles negatives exactly); AC point transform
# divides toward ZERO (G.1.2.2 — sign-magnitude, refined by adding
# sign·2^Al correction terms).


def _zigzag_blocks(coeffs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) coefficient blocks → (n, 64) zigzag-ordered."""
    return coeffs.reshape(-1, 64)[:, _ZIGZAG]


def _mcu_groups(gray: bool, subsample: bool, coeffs, pdims):
    """Yield one MCU at a time as a list of (ci, bi) — the traversal
    every interleaved (DC) scan uses; restart markers go between
    MCUs."""
    if not subsample or gray:
        ncomp = len(coeffs)
        for bi in range(coeffs[0].shape[0]):
            yield [(ci, bi) for ci in range(ncomp)]
    else:
        ph, pw = pdims
        nbw, mcw, mch = pw // 8, pw // 16, ph // 16
        for mr in range(mch):
            for mc in range(mcw):
                mcu = [
                    (0, (2 * mr + dy) * nbw + 2 * mc + dx)
                    for dy in (0, 1)
                    for dx in (0, 1)
                ]
                ci_b = mr * mcw + mc
                yield mcu + [(1, ci_b), (2, ci_b)]


class _RestartEmitter:
    """Per-scan RSTn insertion: call before each MCU/block; emits
    flush + FF D(n mod 8) every ``interval`` units and invokes
    ``reset`` (DC predictors / nothing for AC scans)."""

    def __init__(self, writer, interval: int, reset=None):
        self.writer = writer
        self.interval = interval
        self.reset = reset
        self.n = 0
        self.i = 0

    def tick(self) -> None:
        if self.interval and self.i and self.i % self.interval == 0:
            self.writer.flush()
            self.writer.out += bytes([0xFF, 0xD0 + self.n])
            self.n = (self.n + 1) % 8
            if self.reset:
                self.reset()
        self.i += 1


def _scan_block_indices(ci: int, gray: bool, subsample: bool, h: int, w: int, pdims):
    """Padded-grid indices of the blocks a NON-interleaved scan covers,
    in scan order — the component's own ceil grid (T.81 §A.2.2), which
    for 4:2:0 luma can be narrower than the 16-padded storage grid."""
    if gray or not subsample:
        # 1×1 sampling: ceil grid == padded storage grid, raster order
        return list(range(-(-h // 8) * -(-w // 8)))
    ph, pw = pdims
    if ci == 0:
        bh, bw, stride = -(-h // 8), -(-w // 8), pw // 8
    else:
        ch, cw = -(-h // 2), -(-w // 2)
        bh, bw, stride = -(-ch // 8), -(-cw // 8), (pw // 2) // 8
    return [by * stride + bx for by in range(bh) for bx in range(bw)]


def _sos(out: bytearray, comps_sel, ss: int, se: int, ah: int, al: int) -> None:
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps_sel), len(comps_sel))
    for cid, td_ta in comps_sel:
        out += struct.pack("BB", cid, td_ta)
    out += struct.pack("BBB", ss, se, (ah << 4) | al)


def _encode_ac_first_scan(writer, zz: np.ndarray, ac_enc, al: int, rst=None) -> None:
    """AC first scan (G.1.2.2) for one component: per-block run/size
    coding of sign·(|v|>>Al) over band 1..63, per-block EOB (an EOB run
    of length 1 — always valid, never spans blocks)."""
    for z in zz:
        if rst is not None:
            rst.tick()
        mags = np.abs(z[1:]) >> al
        vals = np.where(z[1:] < 0, -mags, mags)
        nz = np.nonzero(vals)[0]
        last = nz[-1] + 1 if len(nz) else 0
        run = 0
        for k in range(1, last + 1):
            v = int(vals[k - 1])
            if v == 0:
                run += 1
                continue
            while run > 15:
                writer.put(ac_enc.code[0xF0], ac_enc.size[0xF0])  # ZRL
                run -= 16
            size, amp = _magnitude(v)
            sym = (run << 4) | size
            writer.put(ac_enc.code[sym], ac_enc.size[sym])
            writer.put(amp, size)
            run = 0
        if last < 63:
            writer.put(ac_enc.code[0x00], ac_enc.size[0x00])  # EOB (run 1)


def _encode_ac_refine_scan(writer, zz: np.ndarray, ac_enc, al: int, rst=None) -> None:
    """AC refinement scan (G.1.2.3) for one component, per-block EOB
    runs of length 1. The emitted stream mirrors the decoder's
    positional walk exactly: newly-significant coefficients
    (|v|>>Al == 1) emit (run-of-zero-HISTORY, size 1) plus a sign bit;
    each already-nonzero coefficient passed over contributes one
    correction bit, interleaved at the position the decoder reads it —
    in particular, a ZRL consumes exactly 16 zero-history positions,
    so only the correction bits of history coefficients BEFORE its
    16th zero follow it (the rest ride with the next symbol)."""
    for z in zz:
        if rst is not None:
            rst.tick()
        ab = np.abs(z[1:]) >> al
        # classify band positions 0..62 (zigzag indices 1..63)
        zeros = [k for k in range(63) if ab[k] == 0]
        hist = [(k, int(ab[k]) & 1) for k in range(63) if ab[k] > 1]
        news = [k for k in range(63) if ab[k] == 1]
        walk = 0  # next band position the decoder's walk will visit
        zi = hi = 0  # consumed prefixes of zeros / hist

        def emit_hist_below(bound: int) -> None:
            nonlocal hi
            while hi < len(hist) and hist[hi][0] < bound:
                writer.put(hist[hi][1], 1)
                hi += 1

        for kn in news:
            nzeros = 0
            while zi + nzeros < len(zeros) and zeros[zi + nzeros] < kn:
                nzeros += 1
            while nzeros > 15:
                writer.put(ac_enc.code[0xF0], ac_enc.size[0xF0])  # ZRL
                boundary = zeros[zi + 15]  # the 16th zero this walk eats
                emit_hist_below(boundary)
                zi += 16
                nzeros -= 16
                walk = boundary + 1
            sym = (nzeros << 4) | 1
            writer.put(ac_enc.code[sym], ac_enc.size[sym])
            writer.put(0 if z[1 + kn] < 0 else 1, 1)  # sign of ±2^Al
            emit_hist_below(kn)
            zi += nzeros
            walk = kn + 1
        if walk <= 62 and (zi < len(zeros) or hi < len(hist)):
            writer.put(ac_enc.code[0x00], ac_enc.size[0x00])  # EOB (run 1)
            emit_hist_below(63)  # decoder refines the rest of the band


def encode_jpeg_progressive(
    pixels: np.ndarray, quality: int = 85, subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) RGB uint8 or (h, w) grayscale → PROGRESSIVE JFIF bytes
    (SOF2). Same color/quant pipeline as the baseline encoder, so the
    decoded image is bit-identical to decoding the baseline encoding of
    the same pixels (asserted in tests). ``restart_interval`` > 0 emits
    DRI + RSTn every that-many MCUs in every scan (one block per MCU in
    the non-interleaved AC scans)."""
    h, w = pixels.shape[:2]
    gray, coeffs, samplings, pdims, q_luma, q_chroma = _quantized_components(
        pixels, quality, subsample
    )
    zz = [_zigzag_blocks(c) for c in coeffs]
    out = bytearray()
    _write_headers(out, gray, h, w, samplings, q_luma, q_chroma, 0xC2)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    ncomp = len(coeffs)
    dc_encs = [_HuffEncoder(*_HUFF_DC_LUMA)] + [
        _HuffEncoder(*_HUFF_DC_CHROMA)
    ] * (ncomp - 1)
    ac_encs = [_HuffEncoder(*_HUFF_AC_LUMA)] + [
        _HuffEncoder(*_HUFF_AC_CHROMA)
    ] * (ncomp - 1)

    # scan 1: DC first, interleaved, Al=1 (DPCM over dc >> 1)
    _sos(out, [(cid, 0x00 if cid == 1 else 0x10) for cid in range(1, ncomp + 1)],
         0, 0, 0, 1)
    writer = _BitWriter()
    preds = [0] * ncomp

    def reset_preds():
        for i in range(ncomp):
            preds[i] = 0

    rst = _RestartEmitter(writer, restart_interval, reset_preds)
    for mcu in _mcu_groups(gray, subsample, coeffs, pdims):
        rst.tick()
        for ci, bi in mcu:
            dc = int(zz[ci][bi][0]) >> 1  # arithmetic shift (G.1.2.1)
            size, amp = _magnitude(dc - preds[ci])
            preds[ci] = dc
            writer.put(dc_encs[ci].code[size], dc_encs[ci].size[size])
            if size:
                writer.put(amp, size)
    writer.flush()
    out += writer.out

    # scans 2..1+ncomp: AC first per component, band 1-63, Al=1
    scan_idx = [
        _scan_block_indices(ci, gray, subsample, h, w, pdims)
        for ci in range(ncomp)
    ]
    for ci in range(ncomp):
        _sos(out, [(ci + 1, 0x00 if ci == 0 else 0x01)], 1, 63, 0, 1)
        writer = _BitWriter()
        _encode_ac_first_scan(
            writer, zz[ci][scan_idx[ci]], ac_encs[ci], 1,
            rst=_RestartEmitter(writer, restart_interval),
        )
        writer.flush()
        out += writer.out

    # DC refinement: one raw bit (bit 0 of DC) per block, interleaved
    _sos(out, [(cid, 0x00) for cid in range(1, ncomp + 1)], 0, 0, 1, 0)
    writer = _BitWriter()
    rst = _RestartEmitter(writer, restart_interval)
    for mcu in _mcu_groups(gray, subsample, coeffs, pdims):
        rst.tick()
        for ci, bi in mcu:
            writer.put(int(zz[ci][bi][0]) & 1, 1)
    writer.flush()
    out += writer.out

    # AC refinement per component, Al=0
    for ci in range(ncomp):
        _sos(out, [(ci + 1, 0x00 if ci == 0 else 0x01)], 1, 63, 1, 0)
        writer = _BitWriter()
        _encode_ac_refine_scan(
            writer, zz[ci][scan_idx[ci]], ac_encs[ci], 0,
            rst=_RestartEmitter(writer, restart_interval),
        )
        writer.flush()
        out += writer.out

    out += b"\xff\xd9"  # EOI
    return bytes(out)
