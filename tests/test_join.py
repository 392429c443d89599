"""Join operators: broadcast (dimension-table) and cogroup shuffle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from equi7grid_ray.stages.join import broadcast_join, shuffle_hash_join


@pytest.fixture()
def sides():
    rng = np.random.default_rng(2)
    left = pa.table({
        "k": pa.array(rng.integers(0, 50, 500), pa.int64()),
        "v": pa.array(rng.integers(0, 1000, 500), pa.int64()),
    })
    right = pa.table({
        "k": pa.array(np.arange(0, 40, dtype=np.int64)),
        "w": pa.array(np.arange(0, 40, dtype=np.int64) * 10),
    })
    return left, right


def _oracle(left, right, how):
    return (
        left.to_pandas()
        .merge(right.to_pandas(), on="k", how=how)
        .sort_values(["k", "v", "w"])
        .reset_index(drop=True)
    )


def test_broadcast_join_inner_left(ray_session, sides):
    left, right = sides
    for how in ("inner", "left"):
        got = (
            broadcast_join(rd.from_arrow(left), rd.from_arrow(right),
                           on="k", how=how)
            .to_pandas()
            .sort_values(["k", "v", "w"])
            .reset_index(drop=True)
        )
        exp = _oracle(left, right, how)
        pd.testing.assert_frame_equal(
            got[["k", "v", "w"]], exp[["k", "v", "w"]], check_dtype=False
        )


def test_broadcast_join_duplicate_small_keys_first_wins(ray_session):
    left = rd.from_arrow(pa.table({"k": [1, 2], "v": [10, 20]}))
    right = rd.from_arrow(pa.table({"k": [1, 1], "w": [111, 999]}))
    got = broadcast_join(left, right, on="k", how="inner").to_pandas()
    assert got["w"].tolist() == [111]


def test_shuffle_hash_join_matches_pandas(ray_session, sides):
    left, right = sides
    got = (
        shuffle_hash_join(rd.from_arrow(left), rd.from_arrow(right),
                          on="k", how="inner")
        .to_pandas()
        .sort_values(["k", "v", "w"])
        .reset_index(drop=True)
    )
    exp = _oracle(left, right, "inner")
    pd.testing.assert_frame_equal(
        got[["k", "v", "w"]].astype("int64"), exp[["k", "v", "w"]].astype("int64")
    )


def test_shuffle_join_high_cardinality(ray_session):
    """Partition-level cogroup: 5k distinct keys join correctly (one
    vectorized merge per hash partition, not per key) and no internal
    __part/__side columns leak into the output."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from equi7grid_ray.stages.join import shuffle_hash_join

    n = 5000
    left = pa.table({"k": pa.array(np.arange(n), pa.int64()),
                     "lv": pa.array(np.arange(n) * 2, pa.int64())})
    right = pa.table({"k": pa.array(np.arange(0, n, 2), pa.int64()),
                      "rv": pa.array(np.arange(0, n, 2) * 3, pa.int64())})
    out = shuffle_hash_join(
        rd.from_arrow(left), rd.from_arrow(right), on="k", how="inner"
    ).to_pandas()
    exp = left.to_pandas().merge(right.to_pandas(), on="k", how="inner")
    assert sorted(out.columns) == ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(
        out.sort_values("k").reset_index(drop=True),
        exp.sort_values("k").reset_index(drop=True),
        check_like=True,
    )
