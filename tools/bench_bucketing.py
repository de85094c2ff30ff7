"""Measure the bucketed-join claim: writing repeatedly-joined facts
bucketed on their join key removes the per-query shuffle.

Times the Q3-style orders⋈lineitem revenue aggregate at sf0.1 two ways
— plain parquet (shuffle both sides every run) vs tables bucketed on
orderkey (exchange-free sort-merge) — and prints per-run timings plus
the plan Exchange counts, so the 100 TB posture in SCALE.md rests on a
measurement, not only a plan assertion.

    python tools/bench_bucketing.py [sf_dir] [n_buckets] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from userbehavioranalysis_spark import get_spark
from userbehavioranalysis_spark.plans.bucketing import write_bucketed


def _q3_join(o, li):
    ext = F.col("l_extendedprice").cast("decimal(18,6)")
    disc = F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum((ext * disc).cast("decimal(30,12)")).cast("double"), 4)
            .alias("revenue_r4"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    spark = get_spark("uba-bench-bucketing")
    spark.sparkContext.setLogLevel("ERROR")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_orderpriority"
    )
    lineitem = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )

    # write-once cost (reported, not hidden): both facts bucketed+sorted
    t0 = time.perf_counter()
    write_bucketed(orders, "bb_orders", ["o_orderkey"], n_buckets, ["o_orderkey"])
    write_bucketed(lineitem, "bb_lineitem", ["l_orderkey"], n_buckets, ["l_orderkey"])
    write_cost = round(time.perf_counter() - t0, 2)

    variants = {
        "plain": lambda: _q3_join(orders, lineitem),
        "bucketed": lambda: _q3_join(
            spark.table("bb_orders"), spark.table("bb_lineitem")
        ),
    }
    out = {"write_once_sec": write_cost, "n_buckets": n_buckets, "sf_dir": sf_dir}
    for name, make in variants.items():
        df = make()
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_exch = plan.split("== Initial Plan ==")[0].count("Exchange hashpartitioning")
        df.count()  # warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df.count()
            times.append(time.perf_counter() - t0)
        out[name] = {
            "median_sec": round(statistics.median(times), 3),
            "exchanges": n_exch,
            "runs": [round(t, 3) for t in times],
        }
        print(f"{name:9s} median {out[name]['median_sec']:6.3f}s "
              f"exchanges={n_exch} runs={out[name]['runs']}", flush=True)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS bb_orders")
    spark.sql("DROP TABLE IF EXISTS bb_lineitem")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
