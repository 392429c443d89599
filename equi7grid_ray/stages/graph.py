"""Distributed connected components over an edge list.

The missing last step of every near-duplicate pipeline: LSH / dhash /
embedding stages emit *pairs*; actual deduplication needs the
transitive closure -- group pairs into components and keep one
canonical document per component.  (The reference's spatial analogue
is merging overlapping tile footprints into contiguous regions.)

Algorithm: hash-to-min label propagation (Rastogi et al., "Finding
Connected Components in MapReduce and Beyond", the min-label variant).
Every node starts labelled with its own id; each round every node
broadcasts its current minimum label to its neighbours and adopts the
minimum it hears.  Labels are monotonically non-increasing and the
fixpoint assigns each node the minimum node id of its component; the
round count is bounded by the component diameter (near-dup clusters
are tiny-diameter, so 2-4 rounds in practice).

Scale shape:

- State is a ``(node, lbl)`` Dataset with one row per node *appearing
  in a pair* -- orders of magnitude smaller than the corpus for
  near-dup graphs, but still distributed (never a driver-side dict).
- One round = ONE hash-partitioned cogroup shuffle (tagged union of
  labels + symmetric edges, one vectorized pandas merge per
  *partition*, never per node -- the partition-cogroup pattern from
  stages/join.py / dedup.py) followed by ONE ``groupby(node).min``.
- Convergence is detected with a cheap ``Sum(lbl)`` aggregate: labels
  only ever decrease, so an unchanged sum means a fixpoint.
- Each round's label table is ``materialize()``d: it is the iterative
  algorithm's state (size = #pair-nodes), not the corpus -- the same
  justified exception as flagship.py's per-tile partials.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["connected_components", "canonical_assignments"]

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _part_of(node: np.ndarray, n_partitions: int) -> np.ndarray:
    """Deterministic hash partition of int64 node ids (golden-ratio
    multiply so consecutive ids spread across partitions)."""
    h = node.astype(np.int64).view(np.uint64) * _GOLD
    return ((h >> np.uint64(33)) % np.uint64(n_partitions)).astype(np.int32)


def connected_components(pairs, *, id_a: str = "id_a", id_b: str = "id_b",
                         n_partitions: int = 32, max_rounds: int = 30):
    """Edge list ``(id_a, id_b)`` -> ``(node, component)`` Dataset where
    ``component`` is the minimum node id reachable from ``node``.

    Only nodes that appear in at least one pair are returned (isolated
    documents are trivially their own component; join back with
    :func:`canonical_assignments` for the full corpus view).
    """
    from ray.data.aggregate import Min, Sum

    # Symmetric edge table (node, nbr) + per-round label/query rows,
    # tagged into one schema so a single hash shuffle cogroups a node's
    # rows.  kind: 0 = edge (val = neighbour id), 1 = label (val = the
    # node's current label), 2 = pointer-doubling query (row keyed by
    # the label target l, val = the asking node u; the target answers
    # with ITS label, so u learns lbl(lbl(u)) in one round).
    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch.column(id_a).to_numpy().astype(np.int64)
        b = batch.column(id_b).to_numpy().astype(np.int64)
        node = np.concatenate([a, b])
        val = np.concatenate([b, a])
        return pa.table({
            "node": pa.array(node, pa.int64()),
            "val": pa.array(val, pa.int64()),
            "kind": pa.array(np.zeros(len(node), dtype=np.int8), pa.int8()),
        })

    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        def empty(batch: pa.Table) -> pa.Table:
            return pa.table({"node": batch.column("node"),
                             "component": batch.column("val")})
        return edges.map_batches(empty, batch_format="pyarrow")

    labels = (
        edges.select_columns(["node"])
        .groupby("node")
        .aggregate(Min("node", alias_name="lbl"))
        .select_columns(["node", "lbl"])
        .materialize()
    )

    def tag_labels(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy().astype(np.int64)
        lbl = batch.column("lbl").to_numpy().astype(np.int64)
        # pointer-doubling queries for nodes not already at their label
        q = lbl != node
        out_node = np.concatenate([node, lbl[q]])
        out_val = np.concatenate([lbl, node[q]])
        kind = np.concatenate([
            np.ones(len(node), dtype=np.int8),
            np.full(int(q.sum()), 2, dtype=np.int8),
        ])
        return pa.table({
            "node": pa.array(out_node, pa.int64()),
            "val": pa.array(out_val, pa.int64()),
            "kind": pa.array(kind, pa.int8()),
        })

    def add_part(batch: pa.Table) -> pa.Table:
        part = _part_of(batch.column("node").to_numpy(), n_partitions)
        return batch.append_column("part", pa.array(part, pa.int32()))

    def propagate(g: pd.DataFrame) -> pd.DataFrame:
        """One vectorized pass over a hash partition: every node's rows
        (one label row, its edge rows, and any pointer-doubling queries
        addressed to it) are colocated here."""
        kind = g["kind"].to_numpy()
        lbl = g[kind == 1][["node", "val"]].rename(columns={"val": "lbl"})
        edge = g[kind == 0][["node", "val"]]
        qry = g[kind == 2][["node", "val"]]
        # message to each neighbour: my current label
        msgs = edge.merge(lbl, on="node", how="left")
        # pointer doubling: answer each query (keyed by me) with MY
        # label, delivered to the asking node in `val`
        ans = qry.merge(lbl, on="node", how="left")
        out_node = np.concatenate([
            msgs["val"].to_numpy(np.int64),           # neighbour hears lbl
            ans["val"].to_numpy(np.int64),            # asker hears lbl(lbl)
            lbl["node"].to_numpy(np.int64),           # keep own label
        ])
        out_lbl = np.concatenate([
            msgs["lbl"].to_numpy(np.int64),
            ans["lbl"].to_numpy(np.int64),
            lbl["lbl"].to_numpy(np.int64),
        ])
        return pd.DataFrame({
            "node": pd.Series(out_node, dtype=np.int64),
            "lbl": pd.Series(out_lbl, dtype=np.int64),
        })

    prev_sum = None
    for _ in range(max_rounds):
        tagged = labels.map_batches(tag_labels, batch_format="pyarrow") \
                       .union(edges)
        msgs = tagged.map_batches(add_part, batch_format="pyarrow") \
                     .groupby("part") \
                     .map_groups(propagate, batch_format="pandas")
        labels = (
            msgs.groupby("node")
            .aggregate(Min("lbl", alias_name="lbl"))
            .select_columns(["node", "lbl"])
            .materialize()
        )
        cur = labels.aggregate(Sum("lbl", alias_name="s"))["s"]
        if prev_sum is not None and cur == prev_sum:
            break
        prev_sum = cur
    else:  # pragma: no cover - diameter > max_rounds
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds")

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("node"),
                         "component": batch.column("lbl")})

    return labels.map_batches(rename, batch_format="pyarrow")


def canonical_assignments(docs, components, *, id_col: str = "doc_id"):
    """Full-corpus canonical ids: every document mapped to its
    component minimum (itself when it appears in no near-dup pair).

    The component table is the *small* side (pair-nodes only), so it is
    collected once, ``ray.put`` into the object store, and probed with
    a vectorized searchsorted inside ``map_batches`` -- the broadcast
    pattern; the corpus side streams.
    """
    import ray

    from equi7grid_ray.arrowutil import collect_tables

    comp = collect_tables(components)
    nodes = comp.column("node").to_numpy().astype(np.int64)
    lbls = comp.column("component").to_numpy().astype(np.int64)
    order = np.argsort(nodes, kind="stable")
    ref = ray.put((nodes[order], lbls[order]))

    def assign(batch: pa.Table) -> pa.Table:
        snodes, slbls = ray.get(ref)
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        pos = np.searchsorted(snodes, ids)
        pos_c = np.minimum(pos, max(len(snodes) - 1, 0))
        hit = (len(snodes) > 0) & (snodes[pos_c] == ids) if len(snodes) \
            else np.zeros(len(ids), dtype=bool)
        canon = np.where(hit, slbls[pos_c] if len(snodes) else ids, ids)
        return pa.table({
            id_col: batch.column(id_col),
            "canonical": pa.array(canon, pa.int64()),
        })

    return docs.map_batches(assign, batch_format="pyarrow")
