"""Deduplication operators over Ray Datasets: exact, MinHash-LSH,
SimHash, n-gram Jaccard verification.

Shapes (per the Ray guide / north-rule additions, SURVEY.md 2.8):
- exact: vectorized hash column -> groupby(hash) -> keep min id
  (hash-partitioned shuffle; no driver-side loops)
- MinHash-LSH: shingle+minhash per batch (vectorized) -> explode to
  (band, band_hash, id) rows -> groupby band bucket -> candidate pairs
  -> exact Jaccard verify inside map_groups
- SimHash: 64-bit hyperplane-free simhash from token hashes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "exact_dedup",
    "MinHasher",
    "lsh_candidate_pairs",
    "simhash64",
    "ngram_jaccard",
]


def _hash_texts(texts: list[str]) -> np.ndarray:
    """Vectorized 64-bit content hash (FNV-1a over utf-8 bytes, chunked
    numpy passes -- no Python-per-byte)."""
    n = len(texts)
    out = np.full(n, np.uint64(1469598103934665603), dtype=np.uint64)
    prime = np.uint64(1099511628211)
    maxlen = max((len(t) for t in texts), default=0)
    arr = np.zeros((n, maxlen), dtype=np.uint8)
    lens = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(texts):
        b = t.encode()
        arr[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        lens[i] = len(b)
    with np.errstate(over="ignore"):
        for k in range(maxlen):
            m = lens > k
            out[m] = (out[m] ^ arr[m, k].astype(np.uint64)) * prime
    return out.view(np.int64)


def exact_dedup(ds, key: str = "text", id_col: str = "doc_id"):
    """Keep the min-id row per distinct ``key`` value.  The shuffle moves
    only (hash, id) pairs -- payload columns are re-joined by id if the
    caller needs them (shuffle-the-metadata pattern)."""
    def add_hash(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column(id_col),
                "content_hash": pa.array(
                    _hash_texts(batch.column(key).to_pylist()), pa.int64()
                ),
            }
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    # aggregate (C-speed), never Python-per-group: min id survives per hash
    from ray.data.aggregate import Min

    return (
        hashed.groupby("content_hash")
        .aggregate(Min(id_col, alias_name=id_col))
    )


class MinHasher:
    """Stateful minhash stage: permutation constants built once per actor.

    Emits one row per (doc, band): (doc_id, band, band_hash).
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle: int = 3,
                 id_col: str = "doc_id", text_col: str = "text"):
        assert num_perm % bands == 0
        rng = np.random.default_rng(42)
        self.a = rng.integers(1, (1 << 61) - 1, num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, (1 << 61) - 1, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle = shingle
        self.id_col = id_col
        self.text_col = text_col

    def signature(self, text: str) -> np.ndarray:
        s = text.encode()
        k = self.shingle
        if len(s) < k:
            sh = np.frombuffer(s.ljust(k), dtype=np.uint8)[None, :]
        else:
            a = np.frombuffer(s, dtype=np.uint8)
            sh = np.lib.stride_tricks.sliding_window_view(a, k)
        # hash each shingle to u64 (vectorized horner)
        h = np.zeros(len(sh), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(k):
                h = h * np.uint64(1099511628211) + sh[:, j].astype(np.uint64)
            vals = (h[None, :] * self.a[:, None] + self.b[:, None])
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        n = len(ids)
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        for i, t in enumerate(texts):
            sigs[i] = self.signature(t)
        r = self.rows_per_band
        band_sigs = sigs.reshape(n, self.bands, r)
        with np.errstate(over="ignore"):
            bh = np.zeros((n, self.bands), dtype=np.uint64)
            for j in range(r):
                bh = bh * np.uint64(0x100000001B3) ^ band_sigs[:, :, j]
        out_ids = np.repeat(np.asarray(ids, dtype=np.int64), self.bands)
        out_band = np.tile(np.arange(self.bands, dtype=np.int32), n)
        return pa.table(
            {
                self.id_col: pa.array(out_ids, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(bh.reshape(-1).view(np.int64), pa.int64()),
            }
        )


def lsh_candidate_pairs(ds, num_perm: int = 64, bands: int = 16,
                        shingle: int = 8, id_col: str = "doc_id",
                        text_col: str = "text", n_partitions: int = 64,
                        max_bucket: int = 200):
    """documents -> candidate near-duplicate pairs via banded MinHash.

    Scale shape: signature rows are hash-partitioned by band_hash so each
    partition handles MANY buckets with one vectorized pandas self-merge
    (the partitioned hash-join pattern -- a handful of Python calls total,
    never Python-per-bucket).  Buckets larger than ``max_bucket`` are
    dropped (standard super-frequent-bucket cut; they would contribute
    O(n^2) pairs of near-identical text)."""
    mh = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands,
                                   shingle=shingle, id_col=id_col,
                                   text_col=text_col),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def add_part(batch: pa.Table) -> pa.Table:
        bh = batch.column("band_hash").to_numpy()
        part = (bh.view(np.uint64) % np.uint64(n_partitions)).astype(np.int32)
        return batch.append_column("part", pa.array(part, pa.int32()))

    parted = mh.map_batches(add_part, batch_format="pyarrow")

    def pairs_in_partition(g: pd.DataFrame) -> pd.DataFrame:
        # drop mega-buckets, then one self-merge for all buckets at once
        sizes = g.groupby(["band", "band_hash"])[id_col].transform("size")
        g = g[(sizes >= 2) & (sizes <= max_bucket)]
        if g.empty:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64)})
        m = g.merge(g, on=["band", "band_hash"], suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        out = m[[f"{id_col}_a", f"{id_col}_b"]].drop_duplicates()
        out.columns = ["id_a", "id_b"]
        return out

    cand = parted.groupby("part").map_groups(
        pairs_in_partition, batch_format="pandas"
    )
    # dedupe across bands/partitions with an aggregate (no per-group Python)
    from ray.data.aggregate import Count

    return (
        cand.groupby(["id_a", "id_b"])
        .aggregate(Count(alias_name="n_bands"))
        .select_columns(["id_a", "id_b"])
    )


def simhash64(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """64-bit SimHash from whitespace-token hashes (vectorized bit vote)."""
    texts = batch.column(text_col).to_pylist()
    out = np.zeros(len(texts), dtype=np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = t.split()
        if not toks:
            continue
        hs = _hash_texts(toks).view(np.uint64)
        votes = ((hs[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int32)
        maj = votes.sum(axis=0) * 2 >= len(toks)
        out[i] = np.bitwise_or.reduce(np.where(maj, np.uint64(1) << bits, np.uint64(0)))
    return pa.table(
        {
            id_col: batch.column(id_col),
            "simhash": pa.array(out.view(np.int64), pa.int64()),
        }
    )


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """Exact character n-gram Jaccard similarity (verification step after
    LSH candidate generation)."""
    sa = {text_a[i : i + n] for i in range(max(1, len(text_a) - n + 1))}
    sb = {text_b[i : i + n] for i in range(max(1, len(text_b) - n + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)
