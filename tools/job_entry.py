"""Cluster job entrypoint for the flagship tiling pipeline.

This is the ``ray job submit`` deployment path the north rule calls
for: on a real cluster,

    ray job submit --address http://<head>:8265 \
        --working-dir . -- python tools/job_entry.py \
        --input /data/images --output /data/equi7_out --decode

The script never owns cluster lifecycle: it connects to whatever
cluster the Job Submission runtime (or RAY_ADDRESS) provides, runs the
checkpointed flagship -- per-fragment atomic partitions with lineage
manifests, so a resubmitted job skips finished fragments -- and prints
one JSON line of counters for the job log.  Locally (this sandbox has
no dashboard/job server) the same file runs standalone:

    python tools/job_entry.py --synthesize 20000 --output /tmp/out
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="image table dir (parquet fragments, "
                    "or a Lance dataset where the package is available)")
    ap.add_argument("--output", required=True, help="EQUI7 output root")
    ap.add_argument("--synthesize", type=int, metavar="N",
                    help="no input: write an N-row synthetic image table "
                    "under <output>/_input first (local smoke runs)")
    ap.add_argument("--tiling", default="T6", choices=["T6", "T3", "T1"])
    ap.add_argument("--decode", action="store_true",
                    help="decode payloads and carry px_mean")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS points at the cluster; a
        # bare local run starts a throwaway local instance
        ray.init(logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    inp = args.input
    if inp is None:
        if args.synthesize is None:
            ap.error("--input or --synthesize required")
        from equi7grid_ray.sources.images import write_images_parquet

        inp = str(write_images_parquet(Path(args.output) / "_input",
                                       args.synthesize))

    from equi7grid_ray.pipelines.flagship import run_flagship_checkpointed

    t0 = time.monotonic()
    counters = run_flagship_checkpointed(
        inp, args.output, tiling_id=args.tiling, decode=args.decode
    )
    counters["wall_s"] = round(time.monotonic() - t0, 3)
    print(json.dumps(counters, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
