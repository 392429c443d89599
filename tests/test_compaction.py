"""Small-file compaction: packing plan properties, content
preservation, resume semantics."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from equi7grid_ray.stages.compaction import compact_parquet, plan_compaction


def test_plan_respects_target_and_partitions_everything():
    files = [(f"f{i:02d}", sz) for i, sz in enumerate(
        [900, 120, 80, 300, 300, 300, 50, 50, 50, 50])]
    groups = plan_compaction(files, target_bytes=1000)
    sizes = dict(files)
    # every file appears exactly once
    flat = [p for g in groups for p in g]
    assert sorted(flat) == sorted(sizes)
    # groups respect the byte target (or are over-target singletons)
    for g in groups:
        total = sum(sizes[p] for p in g)
        assert total <= 1000 or len(g) == 1
    # FFD actually coalesces: far fewer groups than files
    assert len(groups) <= 3


def test_plan_oversized_file_gets_own_group():
    groups = plan_compaction([("big", 5000), ("a", 10), ("b", 10)],
                             target_bytes=100)
    assert ["big"] in groups


def test_plan_deterministic_order():
    files = [("a", 100), ("b", 100), ("c", 100)]
    assert plan_compaction(files, 250) == plan_compaction(list(reversed(files)), 250)


def test_plan_rejects_bad_target():
    with pytest.raises(ValueError):
        plan_compaction([("a", 1)], 0)


@pytest.fixture()
def shard_dir(tmp_path):
    src = tmp_path / "shards"
    src.mkdir()
    rng = np.random.default_rng(3)
    for k in range(16):
        n = int(rng.integers(50, 200))
        t = pa.table({
            "id": pa.array(rng.integers(0, 10**9, n), pa.int64()),
            "v": pa.array(rng.integers(0, 100, n), pa.int64()),
        })
        pq.write_table(t, src / f"part-{k:04d}.parquet")
    return src


def test_compact_preserves_content_and_reduces_files(ray_session, shard_dir,
                                                     tmp_path):
    dst = tmp_path / "out"
    total = sum(p.stat().st_size for p in shard_dir.glob("*.parquet"))
    outs = compact_parquet(shard_dir, dst, target_bytes=total // 3)
    produced = sorted(dst.glob("*.parquet"))
    assert [str(p) for p in produced] == sorted(outs)
    assert 0 < len(produced) < 16
    src_t = pa.concat_tables(
        [pq.read_table(p) for p in sorted(shard_dir.glob("*.parquet"))])
    dst_t = pa.concat_tables([pq.read_table(p) for p in produced])
    import pandas as pd

    canon = lambda t: (t.to_pandas().sort_values(["id", "v"])
                       .reset_index(drop=True))
    pd.testing.assert_frame_equal(canon(src_t), canon(dst_t))
    # no stray in-progress temp files left behind
    assert not list(dst.glob("*.inprogress"))


def test_compact_resume_skips_existing(ray_session, shard_dir, tmp_path):
    dst = tmp_path / "out"
    total = sum(p.stat().st_size for p in shard_dir.glob("*.parquet"))
    outs = compact_parquet(shard_dir, dst, target_bytes=total // 3)
    mtimes = {p: p.stat().st_mtime_ns for p in dst.glob("*.parquet")}
    outs2 = compact_parquet(shard_dir, dst, target_bytes=total // 3)
    assert outs2 == outs
    assert {p: p.stat().st_mtime_ns for p in dst.glob("*.parquet")} == mtimes


def test_compact_empty_dir(ray_session, tmp_path):
    empty = tmp_path / "empty"
    empty.mkdir()
    assert compact_parquet(empty, tmp_path / "o") == []


def test_manifest_from_footers_exact(ray_session, tmp_path):
    from equi7grid_ray.stages.compaction import manifest_from_footers

    rng = np.random.default_rng(5)
    paths = []
    exp = {}
    for k in range(4):
        v = rng.integers(-50, 500, 70).astype(np.int64)
        p = tmp_path / f"g{k % 2}-f{k}.parquet"
        pq.write_table(pa.table({"v": pa.array(v)}), p, row_group_size=16)
        paths.append(str(p))
        exp[str(p)] = (len(v), int(v.min()), int(v.max()))
    from pathlib import Path as _P

    man = manifest_from_footers(
        paths, column="v", group_fn=lambda s: _P(s).name.split("-")[0])
    got = {man["path"][i].as_py(): (man["n_rows"][i].as_py(),
                                    man["min_v"][i].as_py(),
                                    man["max_v"][i].as_py())
           for i in range(man.num_rows)}
    assert got == exp
    assert set(man["group"].to_pylist()) == {"g0", "g1"}


def test_manifest_missing_stats_raises(ray_session, tmp_path):
    import pytest as _pytest
    import ray

    from equi7grid_ray.stages.compaction import manifest_from_footers

    p = tmp_path / "nostats.parquet"
    pq.write_table(pa.table({"v": pa.array([1, 2, 3], pa.int64())}), p,
                   write_statistics=False)
    with _pytest.raises(ray.exceptions.RayTaskError):
        manifest_from_footers([str(p)], column="v")
