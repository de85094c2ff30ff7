"""Local stand-in for the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over
the same sf dir, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted,
values canonicalized).  Usage:

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from userbehavioranalysis_spark.registry import ORACLES, QUERIES  # noqa: E402
from userbehavioranalysis_spark.schemas import TESTDATA_TABLES  # noqa: E402


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # match a plausible driver canonicalization: repr of rounded double
        return f"{v:.6g}"
    return str(v)


def _hash_rows(cols: list[str], rows: list[tuple]) -> tuple[str, list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return h, lines


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(QUERIES)

    # VANILLA session, like the driver's harness — deliberately not
    # get_spark(), so any dependence on our session defaults (legacy
    # parquet confs, timezone, broadcast thresholds) fails HERE first.
    # Only the UI/progress knobs and master are set.
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("oracle-check")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = 0
    for name in names:
        fn = QUERIES[name]
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in ORACLES:
            print(f"{name:28s} rows-only: {len(srows)} rows "
                  f"({'OK' if len(srows) >= 0 else '??'}) [no oracle]")
            continue
        ores = con.execute(ORACLES[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        sh, slines = _hash_rows(scols, srows)
        oh, olines = _hash_rows(ocols, orows)
        ok_cols = sorted(scols) == sorted(ocols)
        ok_n = len(srows) == len(orows)
        ok_h = sh == oh
        status = "OK" if (ok_cols and ok_n and ok_h) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{name:28s} {status}  spark={len(srows)} duck={len(orows)} "
              f"cols={'=' if ok_cols else f'{sorted(scols)}!={sorted(ocols)}'} "
              f"hash={'=' if ok_h else f'{sh}!={oh}'}")
        if not ok_h and ok_cols:
            sset, oset = set(slines), set(olines)
            for line in list(sset - oset)[:3]:
                print(f"    spark-only: {line.replace(chr(1), '|')}")
            for line in list(oset - sset)[:3]:
                print(f"    duck-only : {line.replace(chr(1), '|')}")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
