"""Minimal image codec on the stdlib only (zlib): 8-bit grayscale PNG and
raw C-order bytes.

Stands in for the reference's rasterio/GDAL raster I/O
(/root/reference/src/equi7grid/warp.py:290-330) -- the sandbox has no
imaging libraries, so the engine's multimodal columns are ``bytes:
binary`` payloads in one of these two formats (``fmt`` column).  Decode
unfilters with numpy; encode writes filter-0 rows.  The per-row
invariant (decoded-pixel allclose, BASELINE.json input_hint) is checked
against these codecs in tests.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png_gray8(img: np.ndarray, level: int = 6) -> bytes:
    """Encode a (h, w) uint8 array as an 8-bit grayscale PNG."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # gray, 8-bit
    raw = np.empty((h, w + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = img
    idat = zlib.compress(raw.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png_gray8(buf, copy: bool = True) -> np.ndarray:
    """Decode an 8-bit grayscale PNG produced by any filter-0/1/2 encoder.

    Accepts any bytes-like object (bytes, memoryview over an Arrow value
    buffer) without copying the payload.  By default the returned array
    is an independent writable copy; hot read-only paths pass
    ``copy=False`` to get a view into the decompressed buffer (saves one
    full-image copy per decode, but the result is read-only and pins the
    (h, w+1) buffer alive)."""
    buf = memoryview(buf)
    if bytes(buf[:8]) != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat_parts: list = []
    while pos < len(buf):
        (ln,) = struct.unpack_from(">I", buf, pos)
        tag = bytes(buf[pos + 4 : pos + 8])
        payload = buf[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bit, ctype = struct.unpack_from(">IIBB", payload, 0)
            if bit != 8 or ctype != 0:
                raise NotImplementedError("only 8-bit grayscale PNG supported")
        elif tag == b"IDAT":
            idat_parts.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    idat = idat_parts[0] if len(idat_parts) == 1 else b"".join(idat_parts)
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w + 1)
    filters = raw[:, 0]
    if (filters == 0).all():
        return raw[:, 1:].copy() if copy else raw[:, 1:]
    img = raw[:, 1:].copy()
    for r in range(h):  # per-scanline unfilter (sub/up only)
        f = filters[r]
        if f == 0:
            continue
        if f == 1:  # sub
            img[r] = np.cumsum(img[r], dtype=np.uint64).astype(np.uint8)
        elif f == 2:  # up
            img[r] = (img[r].astype(np.uint16) + img[r - 1]).astype(np.uint8)
        else:
            raise NotImplementedError(f"PNG filter {f} unsupported")
    return img


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return np.ascontiguousarray(img, dtype=np.uint8).tobytes()
    if fmt == "png":
        return encode_png_gray8(img)
    raise NotImplementedError(f"format {fmt!r} (real image libs not in sandbox)")


def decode_image(buf: bytes, fmt: str, w: int, h: int, dtype="uint8",
                 bands: int = 1, copy: bool = True) -> np.ndarray:
    """Decode a payload to (h, w) -- or (bands, h, w) when bands > 1.
    ``raw`` supports any numpy dtype and band count (little-endian
    C-order band-sequential, the reference's GDAL band/dtype generality,
    warp.py:290-330); ``png`` is single-band 8-bit grayscale."""
    if fmt == "raw":
        a = np.frombuffer(buf, dtype=np.dtype(dtype))
        if bands > 1:
            return a.reshape(bands, h, w)
        return a.reshape(h, w)
    if fmt == "png":
        if np.dtype(dtype) != np.uint8 or bands != 1:
            raise NotImplementedError("png payloads are single-band 8-bit grayscale")
        return decode_png_gray8(buf, copy=copy)
    raise NotImplementedError(f"format {fmt!r} (real image libs not in sandbox)")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
