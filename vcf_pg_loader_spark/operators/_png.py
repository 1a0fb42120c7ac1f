"""Minimal pure-stdlib PNG codec (zlib + struct): 8-bit depth,
grayscale / gray+alpha / RGB / RGBA, non-interlaced — the overwhelmingly
common shapes.  Exists so the image decode seam in
operators/multimodal.py is REAL without PIL, the same way the stdlib
`wave` module makes the audio seam real without soundfile.

Decoder implements the full filter set (None/Sub/Up/Average/Paeth,
PNG spec §9); encoder writes filter-0 rows (valid PNG, optimal
simplicity).  Anything outside the supported shapes raises ValueError
so the caller can fall through to PIL / the deterministic fake.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # colortype -> samples per pixel


def is_png(data: bytes) -> bool:
    return data[: len(_SIG)] == _SIG


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """(h, w, channels) uint8 array; ValueError on unsupported shapes."""
    if not is_png(data):
        raise ValueError("not a PNG signature")
    pos = len(_SIG)
    width = height = None
    colortype = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, depth, colortype, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if colortype not in _CHANNELS:
                raise ValueError(f"unsupported color type {colortype}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    ch = _CHANNELS[colortype]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).astype(np.int32)
        if ftype == 0:  # None
            cur = row
        elif ftype == 2:  # Up
            cur = (row + prev) % 256
        else:  # Sub / Average / Paeth need the left neighbor: scan
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                elif ftype == 4:
                    pred = _paeth(a, b, c)
                else:
                    raise ValueError(f"bad filter {ftype}")
                cur[i] = (int(row[i]) + pred) % 256
        out[y] = cur.astype(np.uint8)
        prev = out[y]
    return out.reshape(height, width, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """8-bit PNG from (h, w) gray or (h, w, {1,2,3,4}) arrays."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter: None
        raw.extend(a[y].tobytes())

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(
            ">I", crc
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
