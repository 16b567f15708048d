"""PNG writer with triangular-dither quantization (png.cpp:329-371 parity).

Pure stdlib (zlib + struct): the reference vendors TinyPngOut; we emit a
single zlib-compressed IDAT. Quantization adds triangular-distributed dither
(rand + rand - 0.5) before rounding, matching png.cpp:335-341, which
de-bands 8-bit output of smooth gradients.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def quantize_dithered(img: np.ndarray, rng: np.random.Generator | None = None):
    """Float [0,1] image -> uint8 with triangular dither."""
    rng = rng or np.random.default_rng(0)
    tri = rng.random(img.shape) + rng.random(img.shape) - 0.5
    q = np.clip(img * 255.0 + tri, 0.0, 255.0)
    return q.astype(np.uint8)


def encode_png(img: np.ndarray, dither: bool = True) -> bytes:
    """img: (H, W, 3) or (H, W, 4) float in [0,1] or uint8 -> PNG bytes."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = quantize_dithered(img.astype(np.float64)) if dither else np.clip(
            img * 255.0, 0, 255
        ).astype(np.uint8)
    if img.ndim == 2:
        img = img[..., None].repeat(3, axis=-1)
    h, w, c = img.shape
    assert c in (3, 4), c
    color_type = 2 if c == 3 else 6

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    out = b"\x89PNG\r\n\x1a\n"
    out += _chunk(b"IHDR", ihdr)
    out += _chunk(b"IDAT", zlib.compress(raw, 6))
    out += _chunk(b"IEND", b"")
    return out


def write_png(path: str, img: np.ndarray, dither: bool = True):
    """img: (H, W, 3) or (H, W, 4) float in [0,1] or uint8."""
    with open(path, "wb") as f:
        f.write(encode_png(img, dither))


def read_png(path: str) -> np.ndarray:
    """Minimal PNG reader (8-bit, color types 0/2/6, no interlace) -> uint8
    array (H, W, C). For tests and tooling round-trips."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos = 8
    idat = b""
    w = h = bitdepth = ctype = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bitdepth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            assert bitdepth == 8 and interlace == 0 and ctype in (0, 2, 6)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = zlib.decompress(idat)
    nch = {0: 1, 2: 3, 6: 4}[ctype]
    stride = w * nch
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        line = np.frombuffer(raw[pos + 1 : pos + 1 + stride], np.uint8).astype(
            np.int32
        )
        pos += 1 + stride
        if ft == 0:
            cur = line
        elif ft == 1:  # Sub
            cur = line.copy()
            for i in range(nch, stride):
                cur[i] = (cur[i] + cur[i - nch]) & 0xFF
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ft == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - nch] if i >= nch else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                a = cur[i - nch] if i >= nch else 0
                b = prev[i]
                cc = prev[i - nch] if i >= nch else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                cur[i] = (cur[i] + pr) & 0xFF
        else:
            raise ValueError(f"bad filter {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, nch)
