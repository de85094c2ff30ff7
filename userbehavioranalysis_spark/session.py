"""SparkSession factory.

One place to set the session defaults the whole engine relies on:

- **UTC session timezone** — every analytic windows on event time; the
  reference stores raw epoch longs (SURVEY §1.3), so all timestamp math
  must be timezone-free to be reproducible (and to hash-match the DuckDB
  oracle, which is timezone-naive).
- **AQE on** — runtime coalescing of shuffle partitions and skew-join
  splitting; at 100 TB the static shuffle-partition number is always
  wrong for some stage, so let the engine re-plan.
- **Arrow on** — every pandas-UDF path (stateful streaming ops,
  multimodal decode) rides Arrow batches instead of pickled rows.

Local test geometry (local[*], 32 shuffle partitions) is only a default;
on a real cluster the caller overrides master/shuffle partitions, and AQE
coalesces from there.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 128 MB input splits: big enough that sf0.1 stays in few tasks,
    # standard enough that a 100 TB scan parallelizes to ~800k tasks.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Auto-broadcast threshold: dims (region/nation/customer/supplier)
    # stay broadcast even at large SF; fact-fact joins shuffle.
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    "spark.sql.shuffle.partitions": "32",
    # FileScan metadata (PartitionFilters/PushedFilters/Location) is
    # length-truncated at 100 chars by default, which makes plan TEXT
    # depend on exprId digit-width (session history) — the plan
    # fingerprints (plans/fingerprint.py) need the untruncated text to
    # be stable, and humans reading .explain() get the full pushed
    # predicate list instead of a 100-char stub.
    "spark.sql.maxMetadataStringLength": "8192",
    # NOTE on adaptive.coalescePartitions.initialPartitionNum: measured
    # and deliberately NOT set.  512-initial exchanges close corpus-
    # scale aggregation walls (the sf100 ngram pair agg at a fixed 32
    # partitions OOM'd the 8 GB heap), but on this single-JVM rig the
    # per-exchange fixed cost doubles every iteration-heavy query
    # (item_triangles 5.0 s -> 10.6 s, dedup_clusters 6.2 s -> 8.4 s at
    # sf0.1 — even 128-initial costs the same).  Operators whose
    # aggregation state scales with the corpus size their own exchanges
    # from a corpus count instead (ngram_jaccard_pairs); on a real
    # cluster, set initialPartitionNum high and let AQE coalesce.
    # Belt-and-braces for ns-typed parquet on sessions that DON'T read
    # through load_testdata (the loader itself is session-independent:
    # explicit LongType schema + unit-agnostic normalization,
    # sources/readers.epoch_any_to_ts).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.ui.enabled": "false",
    # local[!] runs driver + all 32 executor threads in ONE JVM, so this
    # is the whole rig's heap — 8g suits the sf0.1 tests; scale runs
    # (tools/bench_scale.py at 10x data) override via SPARK_GRAFT_DRIVER_MEM.
    # On a real cluster executors size their own heaps instead.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "userbehavioranalysis-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the shared SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, fallback
    ``local[*]``) so tests and bench share one knob.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
