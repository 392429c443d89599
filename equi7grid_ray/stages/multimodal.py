"""Multimodal payload stages: images/audio/video as opaque ``binary``
columns with typed metadata.

The sandbox has no imaging/audio libraries, so the *decode kernels* for
formats beyond raw/PNG-gray8 are stubs behind NotImplementedError with a
deterministic fake decoder for tests -- the Ray-side plumbing (schema,
batch shapes, actor signature, output layout) is real and tested, per
the build brief.  Image decode for 'raw'/'png' is fully real
(equi7grid_ray.codec).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from equi7grid_ray.codec import decode_image

__all__ = ["DecodeImages", "AudioFeatures", "FrameSampler", "fake_decode"]


def fake_decode(payload: bytes, n: int) -> np.ndarray:
    """Deterministic stand-in decoder: n samples derived from a sha256
    keystream of the payload (stable across processes)."""
    out = np.empty(n, dtype=np.uint8)
    pos = 0
    counter = 0
    h = hashlib.sha256(payload).digest()
    while pos < n:
        block = hashlib.sha256(h + counter.to_bytes(4, "little")).digest()
        k = min(len(block), n - pos)
        out[pos : pos + k] = np.frombuffer(block[:k], dtype=np.uint8)
        pos += k
        counter += 1
    return out


class DecodeImages:
    """Actor-pool stage: bytes/fmt/w/h -> decoded stats + optional
    resized thumbnail (nearest) re-encoded as raw bytes."""

    def __init__(self, thumb: int | None = 16):
        self.thumb = thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        # zero-copy payload access (buffer+offset slicing, no per-row
        # Python bytes copies -- same pattern as the assign hot path)
        col = batch.column("bytes")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        cbufs = col.buffers()
        odt = np.int64 if pa.types.is_large_binary(col.type) else np.int32
        offs = np.frombuffer(cbufs[1], dtype=odt)[
            col.offset : col.offset + len(col) + 1
        ]
        data = memoryview(cbufs[2]) if cbufs[2] is not None else memoryview(b"")
        fmts = batch.column("fmt").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        means = np.empty(len(fmts))
        stds = np.empty(len(fmts))
        thumbs: list[bytes] = []
        for j, f in enumerate(fmts):
            if f not in ("raw", "png"):
                raise NotImplementedError(
                    f"image format {f!r}: real codecs unavailable in sandbox"
                )
            b = data[offs[j] : offs[j + 1]]
            img = decode_image(b, f, int(ws[j]), int(hs[j]), copy=False)
            means[j] = img.mean()
            stds[j] = img.std()
            if self.thumb:
                t = self.thumb
                ri = (np.arange(t) * img.shape[0] // t)
                ci = (np.arange(t) * img.shape[1] // t)
                thumbs.append(img[np.ix_(ri, ci)].tobytes())
            else:
                thumbs.append(b"")
        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "px_mean": pa.array(means),
                "px_std": pa.array(stds),
                "thumb": pa.array(thumbs, pa.binary()),
            }
        )


class AudioFeatures:
    """Audio feature stage over binary payloads.

    Real audio decode (mp3/flac/wav codecs) is NOT available in this
    sandbox: with ``use_fake=False`` the stage raises
    NotImplementedError.  With the deterministic fake decoder the full
    batch plumbing runs: payload -> samples -> windowed RMS features."""

    def __init__(self, sample_rate: int = 16_000, use_fake: bool = True,
                 window: int = 1024):
        self.sr = sample_rate
        self.use_fake = use_fake
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        from equi7grid_ray.arrowutil import binary_view

        data, offs = binary_view(batch.column("bytes"))
        n_windows = []
        rms = []
        for j in range(batch.num_rows):
            if not self.use_fake:
                raise NotImplementedError(
                    "audio decode needs codec libraries absent from this sandbox"
                )
            b = data[offs[j] : offs[j + 1]]
            samples = fake_decode(b, 8 * self.window).astype(np.float64) - 127.5
            wins = samples.reshape(-1, self.window)
            r = np.sqrt((wins**2).mean(axis=1))
            n_windows.append(len(r))
            rms.append(float(r.mean()))
        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "n_windows": pa.array(n_windows, pa.int32()),
                "rms": pa.array(rms, pa.float64()),
            }
        )


class FrameSampler:
    """Video frame-sampling stage (every k-th frame).  Real container
    demux is unavailable -> deterministic fake frames; the schema
    (list of per-frame payloads) and batch layout are the real design."""

    def __init__(self, every: int = 5, n_frames: int = 20, frame_px: int = 8,
                 use_fake: bool = True):
        self.every = every
        self.n_frames = n_frames
        self.frame_px = frame_px
        self.use_fake = use_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        from equi7grid_ray.arrowutil import binary_view

        data, offs = binary_view(batch.column("bytes"))
        ids = []
        frame_i = []
        frames = []
        for row in range(batch.num_rows):
            if not self.use_fake:
                raise NotImplementedError(
                    "video demux needs av/ffmpeg absent from this sandbox"
                )
            b = bytes(data[offs[row] : offs[row + 1]])
            for fi in range(0, self.n_frames, self.every):
                payload = fake_decode(b + fi.to_bytes(2, "little"),
                                      self.frame_px * self.frame_px)
                ids.append(row)
                frame_i.append(fi)
                frames.append(payload.tobytes())
        take = pa.array(np.asarray(ids, dtype=np.int64))
        return pa.table(
            {
                "image_id": batch.column("image_id").take(take),
                "frame_index": pa.array(frame_i, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )
