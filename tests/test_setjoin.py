"""Exact set-similarity self-join (prefix-filter AllPairs/PPJoin).

The operator claims recall AND precision 1 versus brute-force distinct
char-n-gram Jaccard (no LSH approximation), with integer threshold
compares (no float boundary flips).  Asserted here against an O(n^2)
numpy reference on the real sf0.001 corpus and on planted boundary
cases.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from equi7grid_ray.stages.dedup import _ngram_set_per_row


def _brute_pairs(col, n: int, thr_num: int, thr_den: int,
                 ids) -> set[tuple[int, int]]:
    h, row, counts = _ngram_set_per_row(col, n, len(ids))
    starts = np.concatenate([[0], np.cumsum(counts)])
    sets = [set(h[starts[i]:starts[i + 1]].tolist()) for i in range(len(ids))]
    out = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            ni = len(sets[i] & sets[j])
            if ni * (thr_den + thr_num) >= thr_num * (counts[i] + counts[j]):
                a, b = int(ids[i]), int(ids[j])
                out.add((min(a, b), max(a, b)))
    return out


def test_jaccard_join_matches_brute_force_corpus(ray_session):
    import ray.data as rd

    from equi7grid_ray.stages.setjoin import jaccard_similarity_join

    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text"])
    ids = tbl.column("doc_id").to_numpy()
    want = _brute_pairs(tbl.column("text").combine_chunks(), 3, 4, 5, ids)
    assert want, "corpus must contain >= 0.8 Jaccard pairs"

    got_df = jaccard_similarity_join(
        rd.from_arrow(tbl), threshold=0.8, n=3).to_pandas()
    got = set(zip(got_df.id_a, got_df.id_b))
    assert got == want  # recall AND precision 1


def test_jaccard_join_exact_boundary(ray_session):
    """A pair landing EXACTLY on the threshold must be included (the
    integer compare is >=, no float rounding)."""
    import ray.data as rd

    from equi7grid_ray.stages.setjoin import jaccard_similarity_join

    # distinct-1-gram sets: 'abcd' = {a,b,c,d}, 'abcde' = {a,b,c,d,e}
    # J = 4/5 = exactly 0.8
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["abcd", "abcde", "zzzz"]),
    })
    got = jaccard_similarity_join(
        rd.from_arrow(tbl), threshold=0.8, n=1).to_pandas()
    assert set(zip(got.id_a, got.id_b)) == {(1, 2)}


def test_jaccard_join_empty_and_identical(ray_session):
    import ray.data as rd

    from equi7grid_ray.stages.setjoin import jaccard_similarity_join

    # identical texts -> J = 1 pair; disjoint third -> no other pair
    tbl = pa.table({
        "doc_id": pa.array([10, 20, 30], pa.int64()),
        "text": pa.array(["the same text here", "the same text here",
                          "completely different words"]),
    })
    got = jaccard_similarity_join(
        rd.from_arrow(tbl), threshold=0.8, n=3).to_pandas()
    assert set(zip(got.id_a, got.id_b)) == {(10, 20)}

    none = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["aaaa bbbb", "cccc dddd"]),
    })
    got2 = jaccard_similarity_join(
        rd.from_arrow(none), threshold=0.8, n=3).to_pandas()
    assert len(got2) == 0


def test_lsh_cross_pairs_planted(ray_session):
    """Planted cross twin pairs; same-side twins must NOT pair."""
    import ray.data as rd

    from equi7grid_ray.stages.dedup import lsh_cross_pairs

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight again")
    other = ("completely different content about database engines and "
             "distributed shuffles with partitioned hash joins inside")

    def tbl(ids, texts):
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts)})

    train = rd.from_arrow(tbl([1, 2, 3], [base, base, other]))
    ev = rd.from_arrow(tbl([100, 101], [base, "unrelated short words"]))
    got = lsh_cross_pairs(train, ev).to_pandas()
    pairs = set(zip(got.train_id, got.eval_id))
    assert (1, 100) in pairs and (2, 100) in pairs
    assert all(e == 100 for _t, e in pairs)  # 101 matches nothing
    assert (1, 2) not in pairs  # same-side twins are not emitted


def _brute_containment(col, n: int, tn: int, td: int,
                       ids) -> set[tuple[int, int]]:
    h, row, counts = _ngram_set_per_row(col, n, len(ids))
    starts = np.concatenate([[0], np.cumsum(counts)])
    sets = [set(h[starts[i]:starts[i + 1]].tolist()) for i in range(len(ids))]
    out = set()
    for i in range(len(sets)):
        for j in range(len(sets)):
            if i == j:
                continue
            ni = len(sets[i] & sets[j])
            if ni * td >= tn * counts[i]:
                out.add((int(ids[i]), int(ids[j])))
    return out


def test_containment_join_matches_brute_force(ray_session):
    """Recall AND precision 1 on a 150-doc slice of the real corpus
    (the full 1000-doc brute force is O(n^2) python sets)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from equi7grid_ray.stages.setjoin import containment_join

    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text"])
    tbl = tbl.filter(pc.less(tbl.column("doc_id"), 150))
    ids = tbl.column("doc_id").to_numpy()
    want = _brute_containment(tbl.column("text").combine_chunks(), 4, 4, 5,
                              ids)
    assert want, "slice must contain containment pairs"
    got_df = containment_join(rd.from_arrow(tbl), threshold=0.8,
                              n=4).to_pandas()
    got = set(zip(got_df.id_a, got_df.id_b))
    assert got == want


def test_containment_join_is_asymmetric(ray_session):
    """A short doc fully inside a long one: (short, long) qualifies,
    (long, short) does not; Jaccard at the same threshold finds
    neither."""
    import ray.data as rd

    from equi7grid_ray.stages.setjoin import (containment_join,
                                              jaccard_similarity_join)

    short = "alpha beta gamma delta"
    long_ = short + " " + " ".join(f"filler{k:03d}" for k in range(40))
    tbl = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([short, long_]),
    })
    got = containment_join(rd.from_arrow(tbl), threshold=0.9,
                           n=3).to_pandas()
    assert set(zip(got.id_a, got.id_b)) == {(1, 2)}
    jac = jaccard_similarity_join(rd.from_arrow(tbl), threshold=0.9,
                                  n=3).to_pandas()
    assert len(jac) == 0


def test_edit_distance_matches_reference():
    """Row-vectorized DP vs a classic O(nm) scalar reference."""
    from equi7grid_ray.stages.editdist import edit_distance

    def scalar(a: bytes, b: bytes) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a):
            cur = [i + 1]
            for j, cb in enumerate(b):
                cur.append(min(prev[j + 1] + 1, cur[j] + 1,
                               prev[j] + (ca != cb)))
            prev = cur
        return prev[-1]

    rng = np.random.default_rng(2)
    cases = [(b"kitten", b"sitting"), (b"", b"abc"), (b"abc", b""),
             (b"same", b"same"), (b"ab", b"ba")]
    for _ in range(15):
        la, lb = rng.integers(1, 60, 2)
        cases.append((bytes(rng.integers(97, 102, la).astype(np.uint8)),
                      bytes(rng.integers(97, 102, lb).astype(np.uint8))))
    from equi7grid_ray.stages.editdist import edit_distance as ed
    for a, b in cases:
        got = ed(np.frombuffer(a, np.uint8), np.frombuffer(b, np.uint8))
        assert got == scalar(a, b), (a, b)


def test_edit_verified_pairs_planted(ray_session):
    """A planted 2-edit near-dup passes; an unrelated doc never pairs."""
    import ray.data as rd

    from equi7grid_ray.stages.editdist import edit_verified_pairs

    base = "the quick brown fox jumps over the lazy dog " * 6
    near = base.replace("quick", "quack", 1)          # 1 substitution
    other = "completely different content here " * 8
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([base, near, other]),
    })
    out = edit_verified_pairs(rd.from_arrow(docs), max_dist=8).to_pandas()
    assert set(zip(out.id_a, out.id_b)) == {(1, 2)}
    assert out.edit_dist.tolist() == [1]
