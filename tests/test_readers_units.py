"""Pin the epoch-unit-agnostic events reader (sources/readers.py).

The driver's testdata `events.ts` column is INT64 on disk, but its epoch
UNIT has changed between testdata generations (nanoseconds in one build,
microseconds in the next) — a silent 1000x shift that compresses the
whole timeline into 1970 and breaks every event-time analytic while
row-count-only checks stay green.  These tests pin two properties:

1. `epoch_any_to_ts` classifies s/ms/us/ns magnitudes correctly and
   round-trips the exact microsecond value (integer arithmetic — float
   paths lose the last microsecond on nano-epochs).
2. `load_testdata` on the REAL testdata yields timestamps in a plausible
   modern range (2015-2100), on a VANILLA session — i.e. independent of
   both the parquet logical type annotation and our session confs.
"""

import os

import pytest
from pyspark.sql import functions as F

from userbehavioranalysis_spark.sources.readers import epoch_any_to_ts, load_testdata

SF_DIR = "/root/testdata/sf0.001"

# one instant, expressed in every unit the driver might write next
_T_US = 1704067200_123456  # 2024-01-01 00:00:00.123456 UTC, microseconds


def test_epoch_any_to_ts_all_units(spark):
    rows = [
        ("s", _T_US // 1_000_000, 1704067200_000000),
        ("ms", _T_US // 1_000, 1704067200_123000),
        ("us", _T_US, _T_US),
        ("ns", _T_US * 1_000, _T_US),
    ]
    df = spark.createDataFrame(
        [(u, v) for u, v, _ in rows], "unit string, ts long"
    ).withColumn("norm_us", F.unix_micros(epoch_any_to_ts("ts")))
    got = {r["unit"]: r["norm_us"] for r in df.collect()}
    for unit, _, want_us in rows:
        assert got[unit] == want_us, (unit, got[unit], want_us)


def test_epoch_any_to_ts_integer_exact_on_nanos(spark):
    # a nano value whose last microsecond a double cannot represent
    ns = 1704067200_123456_789
    df = spark.createDataFrame([(ns,)], "ts long").select(
        F.unix_micros(epoch_any_to_ts("ts")).alias("us")
    )
    assert df.collect()[0]["us"] == ns // 1000


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_load_testdata_ts_is_modern(spark):
    # session-conf independence is exercised separately by
    # tools/oracle_check.py, which builds a deliberately vanilla session
    ev = load_testdata(spark, SF_DIR)["events"]
    lo, hi = ev.select(F.min("ts"), F.max("ts")).first()
    assert lo.year >= 2015, f"ts decoded too small (unit shift?): min={lo}"
    assert hi.year <= 2100, f"ts decoded too large (unit shift?): max={hi}"
