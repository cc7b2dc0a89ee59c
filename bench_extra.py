"""Extra benchmarks for optimization work (guide §1.4): per-query noop-sink
isolation timing plus `.explain("formatted")` capture, at any scale factor.
The driver's frozen bench.py is untouched; numbers here are cited in
OPTIMIZATION_r06.md and the plan files under plans/r06/.

Usage:
  python bench_extra.py [--sf /root/testdata/sf1.0] [--repeat 2] \
      [--plans-dir plans/r06 --suffix before] query [query ...]

Each query is run `repeat` times with a noop sink, reporting best-of-N
(same min-of-N methodology as bench.py), with spark.catalog.clearCache()
between runs for cold-cache isolation.  `frontier_pipeline` runs the same
bench_frontier as bench.py.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark_bench_scratch")

    from warcbase_spark.queries import QUERIES
    from warcbase_spark.session import get_spark

    import bench as bench_mod

    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]")

    timings: dict[str, float] = {}
    for name in args.queries:
        if name == "frontier_pipeline":
            n = int(os.environ.get("SPARK_GRAFT_FRONTIER_N", "1000000"))
            r = bench_mod.bench_frontier(spark, n, args.repeat)
            timings[name] = r["sec"]
            print(json.dumps({"query": name, "detail": r}), flush=True)
            continue
        fn = bench_mod.BENCH_ONLY.get(name) or QUERIES[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        samples = []
        for rep in range(max(1, args.repeat)):
            t0 = time.monotonic()
            df = fn(spark, args.sf)
            df.write.mode("overwrite").format("noop").save()
            samples.append(round(time.monotonic() - t0, 3))
            # dump the executed plan BEFORE clearing caches, or cached
            # relations render as recomputed subtrees in the explain
            if args.plans_dir and rep == max(1, args.repeat) - 1:
                os.makedirs(args.plans_dir, exist_ok=True)
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                with open(os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                    f.write(buf.getvalue())
            spark.catalog.clearCache()
        timings[name] = min(samples)
        print(json.dumps({"query": name, "best": min(samples), "samples": samples}), flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": args.sf, "cpus": cpus, "timings": timings}))


if __name__ == "__main__":
    main()
