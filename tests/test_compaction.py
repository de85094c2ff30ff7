"""Event-log compaction and quality gating (operators/compaction.py,
text_analysis.quality_gate)."""

import pyspark.sql.functions as F
from pyspark.sql import Window

from userbehavioranalysis_spark.operators.compaction import latest_state
from userbehavioranalysis_spark.operators.text_analysis import quality_gate
from userbehavioranalysis_spark.sources.readers import load_testdata

SF = "/root/testdata/sf0.001"


def test_latest_state_matches_window_form(spark):
    ev = load_testdata(spark, SF)["events"].select(
        "user_id", "event_type", "ts", "value", "event_id"
    )
    got = {
        (r["user_id"], r["event_type"]): (r["ts"], r["event_id"], r["value"])
        for r in latest_state(
            ev, keys=["user_id", "event_type"], ts_col="ts", tie_col="event_id"
        ).collect()
    }
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    want = {
        (r["user_id"], r["event_type"]): (r["ts"], r["event_id"], r["value"])
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    assert got == want


def test_latest_state_ties_break_on_tie_col(spark):
    df = spark.createDataFrame(
        [(1, "a", 100, 7, 1.0), (1, "a", 100, 9, 2.0), (1, "a", 50, 99, 3.0)],
        "user_id long, event_type string, ts long, event_id long, value double",
    )
    [r] = latest_state(
        df, keys=["user_id", "event_type"], ts_col="ts", tie_col="event_id"
    ).collect()
    assert (r["event_id"], r["value"]) == (9, 2.0)


def test_latest_state_plan_is_partial_agg_not_window_sort(spark):
    ev = load_testdata(spark, SF)["events"].select(
        "user_id", "event_type", "ts", "event_id"
    )
    plan = (
        latest_state(ev, keys=["user_id", "event_type"], ts_col="ts", tie_col="event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the whole point vs row_number(): map-side combine reduces the
    # shuffle to one row per (task, key); no Window operator anywhere
    # (SortAggregate's group-key sorts are fine — they run on the
    # already-reduced sides)
    assert "partial_max_by" in plan, plan
    assert "Window" not in plan


def test_quality_gate_per_language_cutoffs(spark):
    docs = load_testdata(spark, SF)["documents"]
    kept = quality_gate(docs, q=0.1)
    rows = kept.collect()
    # every language keeps roughly the top 90% of ITS OWN docs
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    kept_by_lang = {}
    for r in rows:
        kept_by_lang[r["lang"]] = kept_by_lang.get(r["lang"], 0) + 1
        assert r["n_chars"] >= r["cut_r4"]
    for lang, n in totals.items():
        frac = kept_by_lang.get(lang, 0) / n
        assert 0.85 <= frac <= 1.0, (lang, frac)


def test_compact_small_files_reduces_count_losslessly(spark, tmp_path):
    """64 micro-files -> ~4 near-target files via shuffle-free coalesce;
    content identical; every output file is a real parquet part."""
    import os

    import pyspark.sql.functions as F

    from userbehavioranalysis_spark.operators.compaction import compact_small_files

    df = spark.range(0, 20_000).select(
        F.col("id"), (F.col("id") % 7).alias("v"), F.sha1(F.col("id").cast("string")).alias("pad")
    )
    src = str(tmp_path / "small")
    df.repartition(64).write.parquet(src)
    n_small = sum(f.endswith(".parquet") for f in os.listdir(src))
    assert n_small == 64
    total = sum(
        os.path.getsize(os.path.join(src, f))
        for f in os.listdir(src) if f.endswith(".parquet")
    )
    dest = str(tmp_path / "big")
    back = compact_small_files(spark, src, dest, target_bytes=total // 4 + 1)
    n_big = sum(f.endswith(".parquet") for f in os.listdir(dest))
    assert n_big <= 5, n_big
    assert n_big < n_small
    # losslessness: same multiset of rows
    key = lambda frame: sorted(tuple(r) for r in frame.collect())
    assert key(back) == key(df)
