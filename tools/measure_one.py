"""Isolated single-query measurement: wall-clock + Spark job count.

Usage: python tools/measure_one.py <query> [<query> ...] [--runs N]

Fresh session, same warm-up as bench.py (batch + streaming machinery +
shared staging), then each named query is timed with the bench's
count() policy inside its own job group so the job count (= driver
actions the query issued, including foreachBatch internals) is exact.
This is the A/B half of the r8 protocol: run per-side in a fresh
process, min over runs, never compare two full-suite totals on this
noisy box.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from userbehavioranalysis_spark import get_spark  # noqa: E402
from userbehavioranalysis_spark.registry import QUERIES  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 2
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("uba-measure")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    QUERIES["page_view"](spark, sf_dir).count()
    QUERIES["streaming_dedup_replay"](spark, sf_dir).count()
    from userbehavioranalysis_spark.registry import warm_streaming

    warm_streaming(spark, sf_dir)

    tracker = sc.statusTracker()
    for name in args:
        best, best_jobs = float("inf"), None
        for i in range(runs):
            spark.catalog.clearCache()
            gid = f"measure-{name}-{i}"
            sc.setJobGroup(gid, name)
            # streaming jobs run from other threads and don't inherit the
            # group; count ALL new job ids instead (isolated session, so
            # nothing else is submitting)
            before = set(tracker.getJobIdsForGroup(None) or [])
            all_before = max([-1] + [j for j in tracker.getActiveJobsIds()] or [-1])
            n0 = sc._jsc.sc().dagScheduler().nextJobId()
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.count()
            dt = time.perf_counter() - t0
            n1 = sc._jsc.sc().dagScheduler().nextJobId()
            sc.setJobGroup(None, None)
            jobs = n1 - n0
            if dt < best:
                best, best_jobs = dt, jobs
            print(f"  {name} run{i}: {dt:.3f}s  jobs={jobs}", flush=True)
        print(f"RESULT {name}: min={best:.3f}s jobs={best_jobs}", flush=True)


if __name__ == "__main__":
    main()
