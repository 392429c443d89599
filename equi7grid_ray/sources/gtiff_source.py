"""GeoTIFF tile ingest: the EQUI7_{continent}/{tilename}/ layout back
into a ``ray.data.Dataset`` of raster rows.

Closes the loop with the GeoTIFF sink (pipelines/warp.py
``out_format="gtiff"``): whatever ``resample_to_equi7_tiles`` wrote --
or any classic-TIFF files another producer left in the same layout
(strips or tiles, none/deflate/LZW, predictor 1/2, either endianness,
multi-IFD overview files) -- streams back as one row per file with the
decoded full-resolution pixels plus the georeferencing the reference
round-trips through rasterio (warp.py:290-330).

Ray-Data-first shape: ``read_binary_files`` streams the payloads (one
block per file group, splittable across workers), decode runs inside
``map_batches`` (the per-file zlib/LZW + numpy work dominates, so task
granularity matches the reference's per-tile fan-out), and the emitted
schema is the engine's raw image-row layout (``bytes``/``w``/``h``/
``dtype``/``bands``/``fmt="raw"``) so every downstream stage
(RegridStage, DecodeImages, mosaic partials) consumes it unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["read_equi7_gtiff", "DecodeGTiffFiles"]


class DecodeGTiffFiles:
    """map_batches stage: (path, bytes) file rows -> decoded raster rows.

    Output columns: continent, tile (full name), fname, w, h, bands,
    dtype, nodata, crs_epsg, n_overviews, bytes (raw C-order
    band-sequential pixels -- the engine's ``fmt='raw'`` payload), fmt,
    plus gt_* geotransform fields."""

    def __init__(self, ifd: int = 0, keep_pixels: bool = True):
        self.ifd = ifd
        self.keep_pixels = keep_pixels

    def __call__(self, batch: pa.Table) -> pa.Table:
        from equi7grid_ray.gtiff import decode_gtiff, gtiff_ifd_offsets

        paths = batch.column("path").to_pylist()
        payloads = batch.column("bytes")
        cols: dict[str, list] = {k: [] for k in (
            "continent", "tile", "fname", "w", "h", "bands", "dtype",
            "nodata", "crs_epsg", "n_overviews", "gt_x0", "gt_sx",
            "gt_y0", "gt_sy", "bytes")}
        for j, p in enumerate(paths):
            buf = payloads[j].as_py()
            g = decode_gtiff(buf, ifd=self.ifd)
            parts = p.replace("\\", "/").split("/")
            # .../EQUI7_{CC}/{partial}/{fname}.tif
            cont = next((q.removeprefix("EQUI7_") for q in parts
                         if q.startswith("EQUI7_")), "")
            partial = parts[-2] if len(parts) >= 2 else ""
            a = g.array
            bands = 1 if a.ndim == 2 else a.shape[0]
            cols["continent"].append(cont)
            cols["tile"].append(f"{cont}_{partial}" if cont else partial)
            cols["fname"].append(parts[-1])
            cols["w"].append(g.width)
            cols["h"].append(g.height)
            cols["bands"].append(bands)
            cols["dtype"].append(a.dtype.name)
            cols["nodata"].append(
                float(g.nodata) if g.nodata is not None else float("nan"))
            cols["crs_epsg"].append(
                int(g.crs_epsg) if g.crs_epsg else 0)
            cols["n_overviews"].append(len(gtiff_ifd_offsets(buf)) - 1)
            gt = g.geotrans or (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
            cols["gt_x0"].append(float(gt[0]))
            cols["gt_sx"].append(float(gt[1]))
            cols["gt_y0"].append(float(gt[3]))
            cols["gt_sy"].append(float(gt[5]))
            cols["bytes"].append(
                np.ascontiguousarray(a).tobytes() if self.keep_pixels
                else b"")
        n = len(paths)
        return pa.table({
            "continent": pa.array(cols["continent"], pa.string()),
            "tile": pa.array(cols["tile"], pa.string()),
            "fname": pa.array(cols["fname"], pa.string()),
            "w": pa.array(cols["w"], pa.int32()),
            "h": pa.array(cols["h"], pa.int32()),
            "bands": pa.array(cols["bands"], pa.int32()),
            "dtype": pa.array(cols["dtype"], pa.string()),
            "fmt": pa.array(["raw"] * n, pa.string()),
            "nodata": pa.array(cols["nodata"], pa.float64()),
            "crs_epsg": pa.array(cols["crs_epsg"], pa.int64()),
            "n_overviews": pa.array(cols["n_overviews"], pa.int32()),
            "gt_x0": pa.array(cols["gt_x0"], pa.float64()),
            "gt_sx": pa.array(cols["gt_sx"], pa.float64()),
            "gt_y0": pa.array(cols["gt_y0"], pa.float64()),
            "gt_sy": pa.array(cols["gt_sy"], pa.float64()),
            "bytes": pa.array(cols["bytes"], pa.large_binary()),
        })


def read_equi7_gtiff(
    root: str,
    *,
    ifd: int = 0,
    keep_pixels: bool = True,
    concurrency=(1, 8),
):
    """Stream every ``*.tif`` under ``root`` (the sink's
    ``part-*/EQUI7_{continent}/{tile}/`` layout or any directory of
    classic TIFFs) as decoded raster rows.  ``ifd`` selects an overview
    level for multi-IFD files; ``keep_pixels=False`` emits metadata
    only (the header-triage path)."""
    import ray.data as rd

    ds = rd.read_binary_files(root, include_paths=True,
                              file_extensions=["tif", "tiff"])
    return ds.map_batches(
        DecodeGTiffFiles,
        fn_constructor_kwargs=dict(ifd=ifd, keep_pixels=keep_pixels),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
