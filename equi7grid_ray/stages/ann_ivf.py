"""IVF (inverted-file) approximate nearest-neighbour search over an
embedding column -- the clustered scale path complementing brute-force
cosine top-k and hyperplane LSH (north-rule similarity-search family).

Shape:
1. TRAIN (small sample, driver side): k-means on a row sample ->
   centroid matrix (the "coarse quantizer"), broadcast via constructor
   args / ray.put.
2. ASSIGN (map_batches): every vector gets its nearest-centroid id
   (one matmul per batch) -> the ``ivf_list`` column is the partition /
   shuffle key for building the inverted file.
3. QUERY (stateful map_batches): probe the ``n_probe`` closest lists
   per query; score only vectors whose list is probed (mask + matmul);
   merge with a small sort+limit.

All numpy; the k-means trainer is a fixed-iteration Lloyd loop with a
deterministic seed (no scipy/sklearn in the sandbox).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from equi7grid_ray.stages.similarity import _stack_embeddings

__all__ = ["train_centroids", "kmeans_fit", "IVFAssign", "IVFQuery",
           "ivf_topk"]


def _kmeanspp_init(v: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    """k-means++ (D^2) seeding on unit vectors with cosine distance
    d = 1 - cos.  Deterministic given rng; avoids the two-seeds-in-one-
    cluster local optimum plain random init falls into."""
    k = min(k, len(v))
    cent = np.empty((k, v.shape[1]), dtype=v.dtype)
    cent[0] = v[rng.integers(len(v))]
    best = 1.0 - v @ cent[0]
    for i in range(1, k):
        w = np.clip(best, 0.0, None)
        tot = w.sum()
        if tot <= 0:
            cent[i:] = cent[0]
            return cent
        cent[i] = v[rng.choice(len(v), p=w / tot)]
        best = np.minimum(best, 1.0 - v @ cent[i])
    return cent


def train_centroids(
    vectors: np.ndarray, n_lists: int = 16, n_iter: int = 15, seed: int = 42
) -> np.ndarray:
    """Lloyd k-means on (normalized) vectors; returns (n_lists, dim)."""
    v = np.asarray(vectors, dtype=np.float64)
    if len(v) == 0:
        return v.reshape(0, v.shape[1] if v.ndim == 2 else 0)
    n = np.linalg.norm(v, axis=1, keepdims=True)
    n[n == 0] = 1.0
    v = v / n
    rng = np.random.default_rng(seed)
    cent = _kmeanspp_init(v, n_lists, rng)
    for _ in range(n_iter):
        sims = v @ cent.T
        assign = np.argmax(sims, axis=1)
        for k in range(len(cent)):
            m = assign == k
            if m.any():
                c = v[m].mean(axis=0)
                nc = np.linalg.norm(c)
                if nc > 0:
                    cent[k] = c / nc
    return cent


def kmeans_fit(ds, *, n_lists: int = 16, n_iter: int = 10,
               col: str = "embedding", seed: int = 42,
               init_sample: int = 4096):
    """DISTRIBUTED Lloyd k-means over an embedding Dataset -- the
    trainer that scales past a driver-side sample (train_centroids is
    the small-sample path).

    Each iteration is one streaming pass: map_batches computes, per
    batch, the partial per-centroid vector sums and counts against the
    broadcast current centroids (one matmul + np.add.at per batch --
    O(k*dim) partial output regardless of batch size); the tiny
    (n_blocks x k x dim) partials are summed driver-side and the
    centroids re-normalized.  Shuffle-free: the only data movement per
    iteration is the k*dim partials.  Empty clusters keep their
    previous centroid.  Returns ((n_lists, dim) centroids, inertia
    history -- mean max-cosine per iteration, monotone up).

    Init assumption: the seed sample is ``ds.limit(init_sample)`` (the
    stream's first blocks).  Fine for hash-ordered corpora; for inputs
    SORTED by the clustered property, pre-sample with
    ``stages.sample.hash_sample`` or Lloyd may start inside one
    cluster."""
    import ray

    from equi7grid_ray.arrowutil import collect_tables

    init_tbl = collect_tables(ds.limit(init_sample))
    if init_tbl.num_rows == 0:
        raise ValueError("kmeans_fit: empty input dataset")
    v0 = _stack_embeddings(init_tbl, col)
    cent = train_centroids(v0, n_lists=n_lists, n_iter=1, seed=seed)
    history: list[float] = []
    for _ in range(n_iter):
        ref = ray.put(cent) if ray.is_initialized() else cent

        def partials(batch: pa.Table) -> pa.Table:
            c = ray.get(ref) if ray.is_initialized() else ref
            v = _stack_embeddings(batch, col)
            n = np.linalg.norm(v, axis=1, keepdims=True)
            n[n == 0] = 1.0
            v = v / n
            sims = v @ c.T
            assign = np.argmax(sims, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, v)
            counts = np.bincount(assign, minlength=len(c)).astype(np.float64)
            best = sims[np.arange(len(v)), assign]
            return pa.table({
                "k": pa.array(np.arange(len(c)), pa.int32()),
                "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                "cnt": pa.array(counts, pa.float64()),
                "sim_sum": pa.array(
                    np.full(len(c), best.sum() / max(len(c), 1)), pa.float64()),
            })

        part_tbl = collect_tables(
            ds.map_batches(partials, batch_format="pyarrow"))
        ks = part_tbl.column("k").to_numpy(zero_copy_only=False)
        cnts = part_tbl.column("cnt").to_numpy(zero_copy_only=False)
        vs = np.stack(part_tbl.column("vsum").to_pylist())
        sums = np.zeros_like(cent)
        np.add.at(sums, ks, vs)
        counts = np.bincount(ks, weights=cnts, minlength=len(cent))
        total = counts.sum()
        history.append(float(
            part_tbl.column("sim_sum").to_numpy(zero_copy_only=False).sum()
            / max(total, 1.0)))
        nz = counts > 0
        new = cent.copy()
        new[nz] = sums[nz] / counts[nz, None]
        norms = np.linalg.norm(new, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cent = new / norms
    return cent, history


def random_centroids(n_lists: int, dim: int, seed: int = 7) -> np.ndarray:
    """Data-independent coarse quantizer: seeded random unit directions.
    Slightly worse recall than k-means-trained centroids but fully
    deterministic given (n_lists, dim, seed) -- the variant the driver
    oracle mirrors with inlined literals (same RNG draw)."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_lists, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


class IVFAssign:
    """map_batches: append the nearest-centroid list id (the IVF
    partition key)."""

    def __init__(self, centroids: np.ndarray, col: str = "embedding"):
        self.cent = np.asarray(centroids, dtype=np.float64)
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _stack_embeddings(batch, self.col)
        n = np.linalg.norm(emb, axis=1, keepdims=True)
        n[n == 0] = 1.0
        lists = np.argmax((emb / n) @ self.cent.T, axis=1).astype(np.int32)
        return batch.append_column("ivf_list", pa.array(lists, pa.int32()))


class IVFQuery:
    """Stateful map_batches: score batch vectors against the query ONLY
    where the vector's list is among the query's ``n_probe`` closest
    lists; emits local candidates for the final sort+limit."""

    def __init__(self, centroids: np.ndarray, query: np.ndarray, k: int = 10,
                 n_probe: int = 4, col: str = "embedding", id_col: str = "vec_id"):
        cent = np.asarray(centroids, dtype=np.float64)
        q = np.asarray(query, dtype=np.float64)
        q = q / np.linalg.norm(q)
        self.q = q
        order = np.argsort(-(cent @ q))
        self.probed = set(int(i) for i in order[:n_probe])
        self.k = k
        self.col = col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lists = batch.column("ivf_list").to_numpy()
        mask = np.isin(lists, list(self.probed))
        if not mask.any():
            return pa.table({self.id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        emb = _stack_embeddings(batch, self.col)[mask]
        n = np.linalg.norm(emb, axis=1, keepdims=True)
        n[n == 0] = 1.0
        sims = (emb / n) @ self.q
        ids = batch.column(self.id_col).to_numpy()[mask]
        kk = min(self.k, len(sims))
        top = np.argpartition(-sims, kk - 1)[:kk]
        return pa.table({self.id_col: pa.array(ids[top].astype(np.int64), pa.int64()),
                         "cosine": pa.array(sims[top], pa.float64())})


def ivf_topk(ds, query: np.ndarray, *, n_lists: int = 16, n_probe: int = 4,
             k: int = 10, train_sample: int = 2048, col: str = "embedding",
             id_col: str = "vec_id", centroids: np.ndarray | None = None):
    """End-to-end IVF search over a Dataset: sample-train (or caller-
    provided ``centroids``) -> assign -> probed scoring -> tiny global
    merge."""
    import pyarrow as pa_

    if centroids is not None:
        cent = np.asarray(centroids, dtype=np.float64)
    else:
        sample = ds.limit(train_sample).to_pandas()
        vecs = np.vstack(sample[col].to_numpy())
        cent = train_centroids(vecs, n_lists=n_lists)

    assigned = ds.map_batches(
        IVFAssign, fn_constructor_kwargs=dict(centroids=cent, col=col),
        batch_format="pyarrow", concurrency=(1, 4), num_cpus=1,
    )
    local = assigned.map_batches(
        IVFQuery,
        fn_constructor_kwargs=dict(centroids=cent, query=query, k=k,
                                   n_probe=n_probe, col=col, id_col=id_col),
        batch_format="pyarrow", concurrency=(1, 4), num_cpus=1,
    )

    def head_k(g: pd.DataFrame) -> pd.DataFrame:
        return g.nlargest(k, "cosine")

    # single tiny group -> global top-k
    withg = local.map_batches(
        lambda t: t.append_column("g", pa_.array(np.zeros(t.num_rows, np.int8))),
        batch_format="pyarrow",
    )
    return withg.groupby("g").map_groups(head_k, batch_format="pandas").select_columns(
        [id_col, "cosine"]
    )
