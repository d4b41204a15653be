"""From-scratch GIF89a codec (palette + LZW), no external libraries.

Implements the container per the GIF89a specification (CompuServe,
1990; also W3C's reference copy): header, logical screen descriptor,
global color table, image descriptor, and the variable-code-width LZW
entropy coding of the index stream (spec Appendix F), with the
byte-level details that make GIF LZW its own dialect:

- codes are packed LEAST-significant-bit first into the byte stream;
- the stream starts at ``min_code_size + 1`` bits and widens by one
  bit the moment the next assignable dictionary code would not fit,
  capped at 12 bits (code 4095);
- two reserved codes: CLEAR (``1 << min_code_size``) resets the
  dictionary and the code width, END-OF-INFORMATION (CLEAR+1)
  terminates; the encoder must emit CLEAR first and re-emit it when
  the table fills;
- compressed bytes travel in ≤255-byte sub-blocks, each prefixed by
  its length, terminated by a zero-length block.

The decoder handles the classic KwKwK case (a code referencing the
entry being defined). Lossless round-trip (encode → decode → identical
indices) is pytest-asserted; the synthesizer feeds GIF assets through
the same mm_decode_dims full oracle as every other container.

Scope: single-image, non-interlaced, 256-entry global color table —
the baseline every GIF reader must support. Interlacing and animation
(multiple image blocks + graphic-control extensions) raise cleanly.

Reference parity note: the engine's multimodal L6 path treats payloads
as opaque binary columns (SURVEY §2.10); this codec exists so the
"decode" step of that path is real for one more compressed container
class, shrinking the external-library seam (MP3/H.264 structure
parsing landed later in _mpeg.py; their entropy decode remains).
"""

from __future__ import annotations

import struct

import numpy as np


class _BitPacker:
    """LSB-first bit packer (GIF appendix F byte order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    packer = _BitPacker()

    def reset() -> tuple[dict, int, int]:
        return (
            {bytes([i]): i for i in range(clear)},
            eoi + 1,  # next assignable code
            min_code_size + 1,  # current code width
        )

    table, next_code, width = reset()
    packer.put(clear, width)
    prefix = b""
    for sym in indices.ravel().tolist():
        probe = prefix + bytes([sym])
        if probe in table:
            prefix = probe
            continue
        packer.put(table[prefix], width)
        if next_code < 4096:
            table[probe] = next_code
            # widen once the JUST-ASSIGNED code no longer fits: the
            # decoder mirrors this on its next_code, keeping both
            # sides' widths in lockstep
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            packer.put(clear, width)
            table, next_code, width = reset()
        prefix = bytes([sym])
    if prefix:
        packer.put(table[prefix], width)
    packer.put(eoi, width)
    return packer.flush()


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_expected, dtype=np.uint8)
    n_out = 0

    def reset() -> tuple[list, int]:
        return [bytes([i]) for i in range(clear)] + [b"", b""], min_code_size + 1

    table, width = reset()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated before EOI")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
            if code >= clear and not entry:
                raise ValueError(f"reference to undefined code {code}")
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"invalid LZW code {code}")
        out[n_out : n_out + len(entry)] = np.frombuffer(entry, dtype=np.uint8)
        n_out += len(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out != n_expected:
        raise ValueError(f"decoded {n_out} pixels, expected {n_expected}")
    return out


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 index array + (256, 3) uint8 RGB palette
    as a single-image non-interlaced GIF89a."""
    h, w = indices.shape
    if palette.shape != (256, 3):
        raise ValueError("palette must be (256, 3)")
    out = bytearray(b"GIF89a")
    # logical screen descriptor: GCT present, 8 bits/color, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += palette.astype(np.uint8).tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor
    min_code_size = 8
    out.append(min_code_size)
    lzw = _lzw_encode(indices, min_code_size)
    for off in range(0, len(lzw), 255):
        block = lzw[off : off + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode a single-image non-interlaced GIF to (h, w, 3) uint8 RGB."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _x, _y, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            if iflags & 0x40:
                raise ValueError("interlaced GIF not supported")
            pal = gct
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if pal is None:
                raise ValueError("no color table")
            min_code_size = payload[pos]
            pos += 1
            chunks = []
            while payload[pos] != 0:
                ln = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(b"".join(chunks), min_code_size, w * h)
            return pal[idx.reshape(h, w)]
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contained no image block")
