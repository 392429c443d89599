"""Small-file compaction: coalesce a many-file parquet drop into
size-targeted files.

Streaming ingestion (and the reference's per-tile fan-out — one raster
per (scene, tile), reference warp.py's resample_to_equi7_tiles layout)
leaves archives as millions of KB-sized files; every downstream read
then pays per-file open/footer costs.  Compaction is the standard
maintenance op (Delta OPTIMIZE / Iceberg rewrite_data_files):

* **Plan** on the driver from file metadata ONLY (path + byte size —
  O(files), no data reads): first-fit-decreasing bin packing into
  groups whose summed input bytes stay <= ``target_bytes`` (an
  already-over-target file keeps its own group and is copied as-is).
* **Execute** one Ray task per output group: read the group's members
  (column-pruned if asked), concatenate, write EXACTLY ONE output
  file via a tmp-name + atomic rename.  Raw ``@ray.remote`` is the
  right tool here — the Dataset API cannot express "merge exactly
  these files into exactly one file" without a shuffle the operation
  doesn't need; each task's memory is bounded by ``target_bytes``.
* **Resume**: a group whose output file already exists is skipped, so
  a failed run re-does only missing groups (same contract as the
  warp pipeline's checksummed manifests, state/checkpoint.py).

At 100 TB the plan is a driver-side list of file names (a few hundred
MB for ~10^8 files — shard the planning by prefix if beyond that) and
the copy work fans out embarrassingly parallel, throttled by Ray's
scheduler; no stage ever holds more than one output group.
"""

from __future__ import annotations

import os
from pathlib import Path

import pyarrow as pa

__all__ = ["plan_compaction", "compact_parquet", "export_parquet_shards",
           "manifest_from_footers"]


def export_parquet_shards(sf_dir: str, table: str, columns: list[str],
                          n_files: int = 32) -> Path:
    """Write (once, cached under /tmp keyed by sf dir + columns) the
    selected columns of an sf table as an ``n_files``-file parquet
    drop — the deterministic "streaming ingestion left small files"
    stand-in the compaction query starts from."""
    import hashlib

    import pyarrow.parquet as pq

    key = Path(sf_dir).name
    colkey = hashlib.md5(
        (",".join(columns) + f"|{n_files}").encode()).hexdigest()[:8]
    out = Path(f"/tmp/e7r_shards_{key}_{table}_{colkey}")
    done = out / "_DONE"
    if done.exists():
        return out
    out.mkdir(parents=True, exist_ok=True)
    t = pq.read_table(f"{sf_dir}/{table}.parquet", columns=columns)
    step = -(-t.num_rows // n_files)
    for k in range(n_files):
        pq.write_table(t.slice(k * step, step),
                       out / f"part-{k:04d}.parquet")
    done.touch()
    return out


def plan_compaction(files: list[tuple[str, int]],
                    target_bytes: int) -> list[list[str]]:
    """First-fit-decreasing bin packing of ``(path, nbytes)`` entries:
    groups are filled largest-first so the tail of tiny files tops up
    earlier bins.  Every group's input-byte sum stays <= target_bytes
    except singletons that are already over target.  Deterministic:
    ties sort by path."""
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    order = sorted(files, key=lambda e: (-e[1], e[0]))
    bins: list[list[str]] = []
    room: list[int] = []
    for path, sz in order:
        for i, r in enumerate(room):
            if sz <= r:
                bins[i].append(path)
                room[i] -= sz
                break
        else:
            bins.append([path])
            room.append(max(0, target_bytes - sz))
    return bins


def manifest_from_footers(paths: list[str], *, column: str,
                          group_fn=None) -> pa.Table:
    """Iceberg-style manifest build: per-file statistics harvested from
    parquet FOOTERS ONLY (row count + column min/max per row group) —
    no data pages are read.  One Ray task per file; returns a table

        path, group, n_rows, min_v, max_v

    where ``group`` = group_fn(path) (e.g. the hive partition value).
    This is the statistics table that makes pruned scans and
    resumability audits possible at 100 TB: the cost is O(files)
    footer reads, never O(bytes)."""
    import ray

    @ray.remote(num_cpus=1)
    def stats(path: str):
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        ci = md.schema.to_arrow_schema().get_field_index(column)
        mn = None
        mx = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                raise ValueError(f"no stats for {column} in {path}")
            mn = st.min if mn is None else min(mn, st.min)
            mx = st.max if mx is None else max(mx, st.max)
        return path, md.num_rows, mn, mx

    rows = ray.get([stats.remote(p) for p in sorted(paths)])
    return pa.table({
        "path": pa.array([r[0] for r in rows], pa.string()),
        "group": pa.array([group_fn(r[0]) if group_fn else ""
                           for r in rows], pa.string()),
        "n_rows": pa.array([r[1] for r in rows], pa.int64()),
        "min_v": pa.array([r[2] for r in rows], pa.int64()),
        "max_v": pa.array([r[3] for r in rows], pa.int64()),
    })


def compact_parquet(src_dir: str | Path, dst_dir: str | Path, *,
                    target_bytes: int = 128 << 20,
                    columns: list[str] | None = None) -> list[str]:
    """Compact every ``*.parquet`` under ``src_dir`` (non-recursive)
    into size-targeted files under ``dst_dir``; returns the output
    paths (existing outputs are kept — resume semantics)."""
    import ray

    src = Path(src_dir)
    dst = Path(dst_dir)
    dst.mkdir(parents=True, exist_ok=True)
    members = sorted((str(p), p.stat().st_size)
                     for p in src.glob("*.parquet"))
    if not members:
        return []
    groups = plan_compaction(members, target_bytes)

    @ray.remote(num_cpus=1)
    def merge(paths: list[str], out_path: str) -> str:
        import pyarrow.parquet as pq

        tables = [pq.read_table(p, columns=columns) for p in sorted(paths)]
        merged = pa.concat_tables(tables)
        tmp = out_path + ".inprogress"
        pq.write_table(merged, tmp)
        os.replace(tmp, out_path)
        return out_path

    outs: list[str] = []
    pending = []
    for gi, grp in enumerate(groups):
        out_path = str(dst / f"compact-{gi:05d}.parquet")
        outs.append(out_path)
        if not os.path.exists(out_path):
            pending.append(merge.remote(grp, out_path))
    if pending:
        ray.get(pending)
    return outs
