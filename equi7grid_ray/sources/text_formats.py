"""CSV / JSONL source plumbing: the two text interchange formats a
real archive ingests besides Parquet (the reference side only reads
rasters + GeoParquet; an ingestion engine must also take the flat-file
drops upstream systems produce).

Exports are derived deterministically from the sf parquet tables and
cached under /tmp keyed by (sf dir, table) -- the one-time "upstream
system wrote a drop" stand-in; only INTEGER and STRING columns are
exported so the round-trip is exact by construction (float text
round-tripping is a format property, not an engine one).

Readers are thin wrappers over ``ray.data.read_csv`` /
``ray.data.read_json`` with explicit Arrow schemas -- schema-on-read
stays declarative, no inference drift between runs.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa

__all__ = ["export_csv", "export_jsonl", "read_csv_table",
           "read_jsonl_table", "export_ipc", "read_ipc_table"]

_N_FILES = 8  # multi-file drops: per-file retry/parallelism granularity


def _export(sf_dir: str, table: str, columns: list[str], fmt: str) -> Path:
    """Write (once, cached) the selected columns of a parquet table as
    an ``_N_FILES``-file CSV/JSONL drop under /tmp."""
    import pyarrow.parquet as pq

    src = f"{sf_dir}/{table}.parquet"
    schema = pq.read_schema(src)
    for name in columns:
        typ = schema.field(name).type
        if not (pa.types.is_integer(typ) or pa.types.is_string(typ)):
            raise ValueError(f"{fmt} export: non-exact column {name}")
    key = Path(sf_dir).name
    import hashlib

    colkey = hashlib.md5(",".join(columns).encode()).hexdigest()[:8]
    out = Path(f"/tmp/e7r_{fmt}_{key}_{table}_{colkey}")
    done = out / "_DONE"
    if done.exists():
        return out
    out.mkdir(parents=True, exist_ok=True)
    t = pq.read_table(src, columns=columns)
    step = -(-t.num_rows // _N_FILES)
    for k in range(_N_FILES):
        part = t.slice(k * step, step)
        path = out / f"part-{k:04d}.{fmt}"
        if fmt == "csv":
            import pyarrow.csv as pcsv

            pcsv.write_csv(part, path)
        else:
            with path.open("w") as fh:
                cols = part.to_pydict()
                names = part.column_names
                import json

                for row in zip(*(cols[c] for c in names)):
                    fh.write(json.dumps(dict(zip(names, row))) + "\n")
    done.touch()
    return out


def export_csv(sf_dir: str, table: str, columns: list[str]) -> Path:
    return _export(sf_dir, table, columns, "csv")


def export_jsonl(sf_dir: str, table: str, columns: list[str]) -> Path:
    return _export(sf_dir, table, columns, "jsonl")


def read_csv_table(path: Path | str, schema: pa.Schema):
    """Schema-declared CSV read (no type inference)."""
    import pyarrow.csv as pcsv
    import ray.data as rd

    return rd.read_csv(
        str(path),
        convert_options=pcsv.ConvertOptions(column_types=schema),
        file_extensions=["csv"],
    )


def read_jsonl_table(path: Path | str):
    import ray.data as rd

    return rd.read_json(str(path), file_extensions=["jsonl"])


def export_ipc(sf_dir: str, table: str, columns: list[str]) -> Path:
    """Write (once, cached) the selected columns as an _N_FILES-file
    Arrow IPC (Feather v2) drop under /tmp -- the zero-copy
    interchange format sitting between upstream Arrow producers and
    this engine.  IPC preserves Arrow types exactly, so unlike the
    CSV/JSONL exports ANY column type is allowed."""
    import pyarrow.parquet as pq

    src = f"{sf_dir}/{table}.parquet"
    key = Path(sf_dir).name
    import hashlib

    colkey = hashlib.md5(",".join(columns).encode()).hexdigest()[:8]
    out = Path(f"/tmp/e7r_ipc_{key}_{table}_{colkey}")
    done = out / "_DONE"
    if done.exists():
        return out
    out.mkdir(parents=True, exist_ok=True)
    t = pq.read_table(src, columns=columns)
    step = -(-t.num_rows // _N_FILES)
    for k in range(_N_FILES):
        part = t.slice(k * step, step)
        with pa.ipc.new_file(str(out / f"part-{k:04d}.arrow"),
                             part.schema) as w:
            w.write_table(part)
    done.touch()
    return out


def read_ipc_table(path: Path | str):
    """Arrow IPC ingestion via the custom-format Ray Data pattern:
    ``read_binary_files`` streams whole files (one retry/skip unit per
    file, exactly like the parquet fragments), a map_batches stage
    decodes each payload with ``pa.ipc.open_file`` -- zero-copy from
    the mmap-able buffer to Arrow batches."""
    import ray.data as rd

    def decode(batch: pa.Table) -> "list[pa.Table]":
        out = []
        for buf in batch.column("bytes"):
            reader = pa.ipc.open_file(pa.BufferReader(buf.as_py()))
            out.append(reader.read_all())
        return out

    files = rd.read_binary_files(str(path), file_extensions=["arrow"])

    def decode_concat(batch: pa.Table) -> pa.Table:
        tables = decode(batch)
        return pa.concat_tables(tables) if tables else pa.table({})

    return files.map_batches(decode_concat, batch_format="pyarrow")
