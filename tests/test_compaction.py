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
