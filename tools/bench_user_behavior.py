"""Throughput check at the reference's declared scale.

The reference's README claims its dataset is "1,000,000 users' one-day
Taobao behaviors" replayed through Kafka into jobs pinned to
parallelism 1 on 3×(4 GB, 8-core) nodes (`README.md:3,24`); it
publishes no timings.  This script synthesizes a schema-exact
UserBehavior CSV at that scale (FIXTURES.md §1: Zipf-skewed items,
~90% pv, ascending epoch-second timestamps spanning one day), runs the
HotItemsAnalysis + NetworkFlowAnalysis-family jobs on it, and prints
one JSON line of wall-clock seconds — the empirical single-node
baseline BASELINE.md records.

Usage: python tools/bench_user_behavior.py [n_rows] (default 1e6)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from userbehavioranalysis_spark import get_spark, jobs  # noqa: E402


def synthesize(spark, n_rows: int, path: str) -> None:
    base = 1511654400  # 2017-11-26 00:00 UTC, one day
    df = (
        spark.range(n_rows)
        .withColumn("user_id", F.floor(F.rand(1) * 1_000_000).cast("long"))
        .withColumn(
            # Zipf-ish skew: cubing uniform noise concentrates mass on
            # low item ids so windows have contended Top-N heads
            "item_id",
            F.floor(F.pow(F.rand(2), 3) * 4_000_000).cast("long"),
        )
        .withColumn("category_id", (F.col("item_id") % 10_000).cast("int"))
        .withColumn(
            "behavior",
            F.when(F.rand(3) < 0.9, "pv").otherwise(
                F.element_at(
                    F.array(F.lit("buy"), F.lit("cart"), F.lit("fav")),
                    (F.rand(4) * 3 + 1).cast("int"),
                )
            ),
        )
        .withColumn(
            "ts", (F.lit(base) + (F.col("id") / n_rows * 86_400).cast("long"))
        )
        .select("user_id", "item_id", "category_id", "behavior", "ts")
    )
    df.write.mode("overwrite").option("header", False).csv(path)


def main() -> None:
    n_rows = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("uba-1m-bench")
    spark.sparkContext.setLogLevel("ERROR")
    path = os.path.join(tempfile.gettempdir(), f"user_behavior_{n_rows}")
    t0 = time.perf_counter()
    synthesize(spark, n_rows, path)
    gen_s = round(time.perf_counter() - t0, 2)

    ub = jobs.read_user_behavior(spark, path)
    timings: dict[str, float] = {}
    for name, fn in {
        "hot_items": jobs.hot_items_job,
        "page_view": jobs.page_view_job,
        "unique_visitor": jobs.unique_visitor_job,
        "uv_bloom": jobs.uv_bloom_job,
    }.items():
        t0 = time.perf_counter()
        fn(ub).count()
        timings[name] = round(time.perf_counter() - t0, 2)

    print(
        json.dumps(
            {
                "metric": "user_behavior_1m_wall_clock",
                "n_rows": n_rows,
                "generate_sec": gen_s,
                "queries": timings,
                "total_sec": round(sum(timings.values()), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
