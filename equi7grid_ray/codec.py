"""Minimal image codec on the stdlib only (zlib): 8-bit grayscale or
RGB (color type 2) PNG and raw C-order bytes.

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


def _encode_png(img: np.ndarray, ctype: int, level: int) -> bytes:
    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = np.empty((h, w * ch + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = img.reshape(h, w * ch)
    idat = zlib.compress(raw.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def encode_png_gray8(img: np.ndarray, level: int = 6) -> bytes:
    """Encode a (h, w) uint8 array as an 8-bit grayscale PNG."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("gray8 PNG needs a (h, w) array")
    return _encode_png(img, 0, level)


def encode_png_rgb8(img: np.ndarray, level: int = 6) -> bytes:
    """Encode a (h, w, 3) uint8 array as an 8-bit RGB (color type 2)
    PNG -- pure zlib, interleaved filter-0 scanlines."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("rgb8 PNG needs a (h, w, 3) array")
    return _encode_png(img, 2, level)


def encode_png_pal8(indices: np.ndarray, palette: np.ndarray,
                    level: int = 6) -> bytes:
    """Encode a (h, w) uint8 index array + (K, 3) uint8 palette as an
    8-bit paletted (color type 3) PNG: a PLTE chunk followed by
    filter-0 index scanlines."""
    indices = np.ascontiguousarray(indices, dtype=np.uint8)
    palette = np.ascontiguousarray(palette, dtype=np.uint8)
    if indices.ndim != 2:
        raise ValueError("pal8 PNG needs a (h, w) index array")
    if palette.ndim != 2 or palette.shape[1] != 3 or not 1 <= len(palette) <= 256:
        raise ValueError("palette must be (K<=256, 3) uint8")
    if indices.max(initial=0) >= len(palette):
        raise ValueError("index out of palette range")
    h, w = indices.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    raw = np.empty((h, w + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = indices
    idat = zlib.compress(raw.tobytes(), level)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", palette.tobytes())
            + _chunk(b"IDAT", idat) + _chunk(b"IEND", b""))


def decode_png(buf, copy: bool = True) -> np.ndarray:
    """Decode an 8-bit grayscale (color type 0), RGB (color type 2) or
    paletted (color type 3, expanded through its PLTE) PNG produced by
    any filter-0/1/2 encoder; returns (h, w) or (h, w, 3).

    Accepts any bytes-like object (bytes, memoryview over an Arrow value
    buffer) without copying the payload.  By default the returned array
    is an independent writable copy; hot read-only paths pass
    ``copy=False`` to get a view into the decompressed buffer (saves one
    full-image copy per decode, but the result is read-only and pins the
    (h, w*ch + 1) buffer alive)."""
    buf = memoryview(buf)
    if bytes(buf[:8]) != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = ch = None
    ctype = 0
    plte = None
    idat_parts: list = []
    while pos < len(buf):
        (ln,) = struct.unpack_from(">I", buf, pos)
        tag = bytes(buf[pos + 4 : pos + 8])
        payload = buf[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bit, ctype = struct.unpack_from(">IIBB", payload, 0)
            if bit != 8 or ctype not in (0, 2, 3):
                raise NotImplementedError(
                    "only 8-bit grayscale/RGB/paletted PNG supported")
            ch = 3 if ctype == 2 else 1  # paletted scanlines carry indices
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat_parts.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ctype == 3 and plte is None:
        raise ValueError("paletted PNG without a PLTE chunk")
    idat = idat_parts[0] if len(idat_parts) == 1 else b"".join(idat_parts)
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8) \
        .reshape(h, w * ch + 1)
    if ctype == 3:
        # palette gather: (h, w) indices -> (h, w, 3) RGB (always a new
        # array, so `copy` is moot); filters on index rows are the same
        # byte-domain filters
        idx = raw[:, 1:]
        filters = raw[:, 0]
        if not (filters == 0).all():
            idx = idx.copy()
            for r in range(h):
                f = filters[r]
                if f == 0:
                    continue
                if f == 1:
                    idx[r] = np.cumsum(idx[r], dtype=np.uint64).astype(np.uint8)
                elif f == 2:
                    idx[r] = (idx[r].astype(np.uint16) + idx[r - 1]).astype(np.uint8)
                else:
                    raise NotImplementedError(f"PNG filter {f} unsupported")
        return plte[idx]
    filters = raw[:, 0]
    if (filters == 0).all():
        img = raw[:, 1:].copy() if copy else raw[:, 1:]
        return img if ch == 1 else img.reshape(h, w, ch)
    img = raw[:, 1:].copy()
    for r in range(h):  # per-scanline unfilter (sub/up only)
        f = filters[r]
        if f == 0:
            continue
        if f == 1:  # sub: recon[x] = raw[x] + recon[x - bpp], per channel
            img[r] = np.cumsum(img[r].reshape(w, ch), axis=0,
                               dtype=np.uint64).astype(np.uint8).reshape(-1)
        elif f == 2:  # up
            img[r] = (img[r].astype(np.uint16) + img[r - 1]).astype(np.uint8)
        else:
            raise NotImplementedError(f"PNG filter {f} unsupported")
    return img if ch == 1 else img.reshape(h, w, ch)


def decode_png_gray8(buf, copy: bool = True) -> np.ndarray:
    """Back-compat alias: decode a PNG known to be 8-bit grayscale."""
    img = decode_png(buf, copy=copy)
    if img.ndim != 2:
        raise ValueError("expected a grayscale PNG")
    return img


_V256 = np.arange(256, dtype=np.int64)
_V256SQ = _V256 * _V256


def png_stream_stats(buf, keep_rows=None, chunk: int = 1 << 16):
    """One STREAMING inflate pass over a filter-0 8-bit gray/RGB PNG:
    pixel sum + sum-of-squares (exact integers) and, optionally, full
    copies of the requested scanlines -- without ever materializing the
    decoded frame.  Decompression runs through a bounded ``chunk``-byte
    window (zlib.decompressobj max_length), so the working set stays
    cache-resident no matter how large the frame is; per window the
    stats are one bincount + two 256-long dot products.

    Returns ``(psum, psumsq, h, w, ch, rows)`` where ``rows`` is a
    ``(len(keep_rows), w*ch)`` uint8 array (or None), or ``None`` when
    any scanline uses a non-zero filter -- callers fall back to
    :func:`decode_png` (filtered PNGs need full reconstruction anyway).
    """
    buf = memoryview(buf)
    if bytes(buf[:8]) != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = ch = None
    idat_parts: list = []
    while pos < len(buf):
        (ln,) = struct.unpack_from(">I", buf, pos)
        tag = bytes(buf[pos + 4 : pos + 8])
        if tag == b"IHDR":
            w, h, bit, ctype = struct.unpack_from(">IIBB", buf, pos + 8)
            if bit == 8 and ctype == 3:
                return None  # paletted: stats need the PLTE gather ->
                # callers fall back to the full decode_png path
            if bit != 8 or ctype not in (0, 2):
                raise NotImplementedError(
                    "only 8-bit grayscale/RGB PNG supported")
            ch = 1 if ctype == 0 else 3
        elif tag == b"IDAT":
            idat_parts.append(buf[pos + 8 : pos + 8 + ln])
        elif tag == b"IEND":
            break
        pos += 12 + ln

    stride = w * ch + 1
    rows = None
    spans: list[tuple[int, int, int]] = []  # (stream_start, stream_end, out_row)
    if keep_rows is not None:
        rows = np.empty((len(keep_rows), w * ch), dtype=np.uint8)
        spans = [(int(r) * stride + 1, int(r) * stride + stride, k)
                 for k, r in enumerate(keep_rows)]

    psum = 0
    psumsq = 0
    spos = 0  # absolute position in the decompressed filter+pixel stream

    def process(arr: np.ndarray) -> bool:
        nonlocal psum, psumsq, spos
        ln = len(arr)
        # filter bytes live at multiples of stride; verify 0
        k0 = -(-spos // stride)
        if arr[k0 * stride - spos :: stride].any():
            return False  # filtered PNG: caller decodes fully
        # filter bytes are 0, so they contribute nothing: stats over
        # the raw window ARE the pixel stats
        cnt = np.bincount(arr, minlength=256)
        psum += int(cnt @ _V256)
        psumsq += int(cnt @ _V256SQ)
        for s0, s1, k in spans:
            a = max(s0, spos)
            b = min(s1, spos + ln)
            if a < b:
                rows[k, a - s0 : b - s0] = arr[a - spos : b - spos]
        spos += ln
        return True

    if h * stride <= chunk:
        # frame fits the window: one-shot inflate, same bounded memory
        idat = idat_parts[0] if len(idat_parts) == 1 else \
            b"".join(bytes(p) for p in idat_parts)
        if not process(np.frombuffer(zlib.decompress(idat), dtype=np.uint8)):
            return None
    else:
        d = zlib.decompressobj()
        for part in idat_parts:
            data = d.decompress(part, chunk)
            while True:
                if data and not process(np.frombuffer(data, dtype=np.uint8)):
                    return None
                if not d.unconsumed_tail:
                    break
                data = d.decompress(d.unconsumed_tail, chunk)
        tail = d.flush()
        if tail and not process(np.frombuffer(tail, dtype=np.uint8)):
            return None
    if spos != h * stride:
        raise ValueError("truncated PNG stream")
    return psum, psumsq, h, w, ch, rows


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return np.ascontiguousarray(img, dtype=np.uint8).tobytes()
    if fmt == "png":
        return encode_png_rgb8(img) if img.ndim == 3 else encode_png_gray8(img)
    if fmt in ("jpeg", "jpg"):
        from equi7grid_ray.jpeg import encode_jpeg_baseline

        return encode_jpeg_baseline(np.ascontiguousarray(img, np.uint8))
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
        if np.dtype(dtype) != np.uint8:
            raise NotImplementedError("png payloads are 8-bit")
        # channel count comes from the IHDR, not the bands argument:
        # returns (h, w) for grayscale, (h, w, 3) interleaved for RGB
        return decode_png(buf, copy=copy)
    if fmt in ("jpeg", "jpg"):
        # baseline sequential T.81 (jpeg.py); returns (h, w) gray or
        # (h, w, 3) RGB like the png path
        from equi7grid_ray.jpeg import decode_jpeg

        return decode_jpeg(buf)
    raise NotImplementedError(f"format {fmt!r} (real image libs not in sandbox)")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
