"""Similarity search over an embedding column (``list<float>``).

- brute-force cosine top-k: numpy matmul per batch against a broadcast
  query matrix (query shipped once via ``ray.put`` / constructor args),
  merged with a small sort+limit -- the baseline ANN path.
- LSH-bucketed variant (random hyperplanes): the scale path -- buckets
  become the shuffle key, only same-bucket candidates are scored.
- per-partition KD-tree (KDTreeIndex) for kNN nearest-tile queries over
  tile centroids (north-rule component; numpy implementation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["CosineTopK", "topk_cosine", "HyperplaneLSH", "KDTree", "knn_tiles"]


def _stack_embeddings(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return np.asarray(arr.values).reshape(len(arr), -1).astype(np.float64)


class CosineTopK:
    """Stateful stage: holds the (normalized) query matrix; per batch
    emits the local top-k per query -- merge with sort+limit."""

    def __init__(self, queries: np.ndarray, k: int = 10, col: str = "embedding",
                 id_col: str = "vec_id"):
        q = np.asarray(queries, dtype=np.float64)
        if q.ndim == 1:
            q = q[None, :]
        self.q = q / np.linalg.norm(q, axis=1, keepdims=True)
        self.k = k
        self.col = col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _stack_embeddings(batch, self.col)
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        sims = (emb / norms[:, None]) @ self.q.T  # (n, nq)
        ids = batch.column(self.id_col).to_numpy()
        out_q, out_id, out_s = [], [], []
        for qi in range(self.q.shape[0]):
            s = sims[:, qi]
            k = min(self.k, len(s))
            top = np.argpartition(-s, k - 1)[:k] if k else np.empty(0, np.int64)
            out_q.append(np.full(k, qi, dtype=np.int32))
            out_id.append(ids[top])
            out_s.append(s[top])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int32()),
                self.id_col: pa.array(np.concatenate(out_id)),
                "cosine": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )


def topk_cosine(ds, queries: np.ndarray, k: int = 10, col: str = "embedding",
                id_col: str = "vec_id"):
    """Global top-k: per-batch local top-k (vectorized matmul) -> tiny
    global sort + limit per query."""
    local = ds.map_batches(
        CosineTopK,
        fn_constructor_kwargs=dict(queries=queries, k=k, col=col, id_col=id_col),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def head_k(g: pd.DataFrame) -> pd.DataFrame:
        return g.nlargest(k, "cosine")

    return local.groupby("query_id").map_groups(head_k, batch_format="pandas")


class HyperplaneLSH:
    """Random-hyperplane signature stage: emits (id, bucket) rows; equal
    buckets = candidate neighbors (cosine-LSH scale path)."""

    def __init__(self, dim: int, n_planes: int = 16, col: str = "embedding",
                 id_col: str = "vec_id", seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))
        self.col = col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _stack_embeddings(batch, self.col)
        bits = (emb @ self.planes) > 0
        bucket = np.zeros(len(emb), dtype=np.int64)
        for j in range(bits.shape[1]):
            bucket = (bucket << 1) | bits[:, j]
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )


class KDTree:
    """Minimal numpy KD-tree (2D) with vectorized batched kNN queries;
    state for the per-partition nearest-tile stage."""

    def __init__(self, points: np.ndarray, leaf_size: int = 32):
        self.pts = np.asarray(points, dtype=np.float64)
        n = len(self.pts)
        self.idx = np.arange(n)
        # build implicit tree: recursively sorted index ranges
        self.nodes: list[tuple[int, int, int, float]] = []  # (lo, hi, axis, split)
        self._build(0, n, 0)
        self.leaf_size = leaf_size

    def _build(self, lo: int, hi: int, depth: int) -> None:
        if hi - lo <= 32:
            return
        axis = depth % 2
        seg = self.idx[lo:hi]
        order = np.argsort(self.pts[seg, axis], kind="stable")
        self.idx[lo:hi] = seg[order]
        mid = (lo + hi) // 2
        self._build(lo, mid, depth + 1)
        self._build(mid, hi, depth + 1)

    def query(self, q: np.ndarray, k: int = 1) -> tuple[np.ndarray, np.ndarray]:
        """Batched kNN by blocked brute force over the (small) point set --
        tile-centroid sets are <=65k points, so a vectorized distance
        matrix in chunks beats pointer chasing in Python."""
        q = np.atleast_2d(np.asarray(q, dtype=np.float64))
        nq = len(q)
        k = min(k, len(self.pts))
        best_d = np.full((nq, k), np.inf)
        best_i = np.zeros((nq, k), dtype=np.int64)
        chunk = max(1, 2_000_000 // max(len(self.pts), 1))
        for s in range(0, nq, chunk):
            qq = q[s : s + chunk]
            d2 = (
                ((qq[:, None, :] - self.pts[None, :, :]) ** 2).sum(axis=2)
            )
            part = np.argpartition(d2, k - 1, axis=1)[:, :k]
            dd = np.take_along_axis(d2, part, axis=1)
            order = np.argsort(dd, axis=1, kind="stable")
            best_d[s : s + chunk] = np.take_along_axis(dd, order, axis=1)
            best_i[s : s + chunk] = np.take_along_axis(part, order, axis=1)
        return np.sqrt(best_d), best_i


class knn_tiles:
    """Stateful stage: k nearest tiles (by centroid distance in the
    continental plane) for each projected point row.  KD-tree over tile
    centroids built once per actor per continent."""

    def __init__(self, k: int = 3, tiling_id: str = "T6"):
        from equi7grid_ray.grid import GridSpec, full_names
        from equi7grid_ray.tiling_state import get_grid_state

        self.k = k
        spec = GridSpec.standard()
        state = get_grid_state(spec)
        self.trees = {}
        self.names = {}
        for c in spec.continents():
            ct = state.tiles(c, tiling_id)
            cent = np.column_stack([ct.ll_x + ct.tile_size / 2, ct.ll_y + ct.tile_size / 2])
            self.trees[c] = KDTree(cent)
            self.names[c] = full_names(c, ct.ll_x, ct.ll_y, tiling_id)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cont = np.asarray(batch.column("continent").to_pylist())
        x = batch.column("x").to_numpy()
        y = batch.column("y").to_numpy()
        n = len(x)
        out_id, out_rank, out_tile, out_dist = [], [], [], []
        ids = batch.column("image_id")
        for c in np.unique(cont):
            rows = np.flatnonzero(cont == c)
            d, i = self.trees[c].query(np.column_stack([x[rows], y[rows]]), self.k)
            kk = d.shape[1]
            out_id.append(np.repeat(rows, kk))
            out_rank.append(np.tile(np.arange(kk, dtype=np.int32), len(rows)))
            out_tile.append(self.names[c][i.ravel()])
            out_dist.append(d.ravel())
        rows = np.concatenate(out_id) if out_id else np.empty(0, np.int64)
        return pa.table(
            {
                "image_id": ids.take(pa.array(rows)),
                "rank": pa.array(np.concatenate(out_rank) if out_id else [], pa.int32()),
                "tile": pa.array(np.concatenate(out_tile).tolist() if out_id else [], pa.string()),
                "dist": pa.array(np.concatenate(out_dist) if out_id else [], pa.float64()),
            }
        )
