"""Hardware-ceiling calibration shared by bench.py and bench_scaling.py.

This sandbox is one guest VM on a multi-tenant host whose co-tenant load
varies by the hour and is invisible to guest-side metrics (load, steal).
Measured effect: plain numpy sorts in N separate processes each run up to
1.5× slower than alone at bad hours — an ACHIEVABLE parallel-efficiency
ceiling of ~0.67 for any bandwidth-bound (sort/shuffle) workload, while
good windows measure ~0.94-1.0. Every benchmark number must therefore be
read against the ceiling measured in the SAME window, not against 1.0;
embedding the probe result in each BENCH JSON makes round-over-round
comparisons interpretable on their own.
"""

from __future__ import annotations

import subprocess
import sys

_CALIB = """
import time, numpy as np
a = np.random.RandomState(0).rand(4_000_000)
t0 = time.monotonic(); s = 0.0
for _ in range(30):
    s += float(np.sort(a.copy())[0])
print(time.monotonic() - t0)
"""


def bandwidth_ceiling(quad: int = 4) -> dict:
    """The box's achievable scaling ceiling for sort/shuffle-bound work
    right now: plain numpy sorts in ``quad`` separate processes — no Spark,
    no GIL, no shared state — vs one alone. Returns
    ``{"t_single", "t_concurrent_mean", "ceiling"}`` where ceiling = 1.0
    means an unloaded host."""

    def run_n(n: int) -> list[float]:
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", _CALIB], stdout=subprocess.PIPE, text=True
            )
            for _ in range(n)
        ]
        return [float(p.communicate()[0].strip()) for p in procs]

    t1 = min(run_n(1)[0] for _ in range(2))
    tq = run_n(quad)
    return {
        "t_single": round(t1, 2),
        "t_concurrent_mean": round(sum(tq) / len(tq), 2),
        "ceiling": round(t1 * len(tq) / sum(tq), 3),
    }
