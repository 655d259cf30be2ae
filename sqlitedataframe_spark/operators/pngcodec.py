"""Minimal pure-stdlib PNG codec (zlib + struct): decode and re-encode
8-bit non-interlaced grayscale / gray+alpha / RGB / RGBA images.

Why this exists: the multimodal stages (`extract_features`,
`resize_media`) carry a real-decode backend, but the gate container has
no image libraries, so the Pillow path could never run in a recorded CI
pass (VERDICT r6 #3). PNG's format is simple enough — DEFLATE scanlines
behind five per-row difference filters, per the public W3C PNG
specification — that a correct subset decoder is ~100 lines of stdlib
code. With it the "real pixels through the real Arrow stages" property is
CI-proven unconditionally; Pillow remains the production backend for the
full format zoo (JPEG, interlaced PNG, 16-bit, palettes).

Scope (raises ValueError outside it): bit depth 8, color types
0/2/4/6, interlace 0 — exactly what the fixture generator emits. Not a
general-purpose image library.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
#: channels per pixel by PNG color type (8-bit only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def png_dims(payload: bytes) -> tuple[int, int]:
    """(width, height) from the IHDR chunk — no pixel decode, the cheap
    metadata probe (what a 100 TB ingest runs on every object)."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    # IHDR is required first: length at 8, type at 12, data at 16
    if payload[12:16] != b"IHDR":
        raise ValueError("not a PNG: IHDR not first chunk")
    w, h = struct.unpack(">II", payload[16:24])
    return w, h


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_decode(payload: bytes) -> tuple[int, int, int, list[bytearray]]:
    """Decode to (width, height, n_channels, rows) with each row a
    bytearray of width*n_channels samples."""
    w, h = png_dims(payload)
    depth, color, comp, filt, interlace = struct.unpack(
        ">BBBBB", payload[24:29]
    )
    if depth != 8 or color not in _CHANNELS or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color} "
            f"interlace={interlace}); stdlib codec handles 8-bit "
            "non-interlaced gray/RGB/RGBA only"
        )
    ch = _CHANNELS[color]
    # walk chunks, concatenating IDAT
    idat = bytearray()
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + length]
        elif ctype == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG: scanline payload size mismatch")
    rows: list[bytearray] = []
    prev = bytearray(stride)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"corrupt PNG: unknown filter {ftype}")
        rows.append(line)
        prev = line
    return w, h, ch, rows


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def png_encode(w: int, h: int, ch: int, rows: list[bytearray]) -> bytes:
    """Encode rows (filter 0, one DEFLATE stream) — a valid, universally
    readable PNG; compression ratio is not the point here."""
    color = {1: 0, 3: 2, 2: 4, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(r) for r in rows)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def png_thumbnail(payload: bytes, stride: int) -> bytes:
    """Nearest-neighbor 1/stride downsample, re-encoded as PNG — the
    stdlib twin of the Pillow thumbnail path (same output contract:
    max(1, dim // stride))."""
    w, h, ch, rows = png_decode(payload)
    ow, oh = max(1, w // stride), max(1, h // stride)
    out = [
        bytearray(
            bytes(
                rows[min(y * stride, h - 1)][
                    min(x * stride, w - 1) * ch + c
                ]
                for x in range(ow)
                for c in range(ch)
            )
        )
        for y in range(oh)
    ]
    return png_encode(ow, oh, ch, out)
