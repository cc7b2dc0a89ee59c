"""Paired A/B for the frontier_bfs3 driver-bench regression (r02→r03).

BENCH_r03 showed frontier_bfs3 at 14.57s vs 7.60s in r02 (+92%) while the
suite median inflated only ~20% (window noise). Two round-3 changes sit on
its path: the winner-join broadcast crossover (irrelevant here — bfs3's
winner sets are hundreds of rows, far under the 100k gate, so broadcast is
chosen either way) and ``add_global_seq``'s persist default switching from
``localCheckpoint(eager=True)`` to lazy ``eager=False``.

This script times frontier_bfs3 at sf0.1 on local[32] under the three
persist modes, INTERLEAVED (a full A,B,C sweep per repetition) so slow
hourly drift hits every config equally, with the numpy bandwidth-ceiling
probe before and after. Run FOREGROUND with nothing else on the box.

Usage: python scripts/ab_bfs3.py [reps=3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODES = ["checkpoint", "checkpoint_eager", "cache"]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from warcbase_spark.calibration import bandwidth_ceiling
    from warcbase_spark.queries import QUERIES
    from warcbase_spark.session import get_spark

    pre = bandwidth_ceiling(4)
    spark = get_spark(app_name="ab_bfs3", master="local[32]")

    # one untimed warmup so JVM/codegen/Arrow init doesn't land on config A
    QUERIES["frontier_bfs3"](spark, sf_dir).write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()

    times: dict[str, list[float]] = {m: [] for m in MODES}
    for rep in range(reps):
        for mode in MODES:
            os.environ["WARC_SEQ_PERSIST"] = mode
            t0 = time.monotonic()
            QUERIES["frontier_bfs3"](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            dt = time.monotonic() - t0
            times[mode].append(round(dt, 3))
            spark.catalog.clearCache()
            print(f"rep{rep} {mode}: {dt:.2f}s", file=sys.stderr)
    os.environ.pop("WARC_SEQ_PERSIST", None)

    post = bandwidth_ceiling(4)
    print(
        json.dumps(
            {
                "query": "frontier_bfs3",
                "sf_dir": sf_dir,
                "reps": reps,
                "times": times,
                "best": {m: min(v) for m, v in times.items()},
                "ceiling_pre": pre,
                "ceiling_post": post,
            }
        )
    )


if __name__ == "__main__":
    main()
