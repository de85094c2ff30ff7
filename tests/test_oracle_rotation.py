"""Rotation guard for the driver's 50-row correctness window.

The driver only hash-checks the first 50 registry entries per round, so
queries rotated OUT of the window (see registry._DRIVER_WINDOW) would
otherwise have no recurring correctness signal.  This test re-runs the
oracle comparison on a 10-query random sample each session — seeded by
the calendar day so consecutive runs cover different slices while any
single run stays reproducible (override with UBA_ORACLE_SAMPLE_SEED).

Runs at sf0.001 for speed; the compare logic is imported from
tools/oracle_check.py so driver-emulation and test stay in lockstep.
"""

from __future__ import annotations

import datetime
import importlib.util
import os
import random

import duckdb
import pytest

from userbehavioranalysis_spark.registry import ORACLES, QUERIES
from userbehavioranalysis_spark.schemas import TESTDATA_TABLES

SF_DIR = os.environ.get("UBA_ROTATION_SF_DIR", "/root/testdata/sf0.001")

_spec = importlib.util.spec_from_file_location(
    "oracle_check",
    os.path.join(os.path.dirname(__file__), "..", "tools", "oracle_check.py"),
)


def _load_hash_rows():
    mod = importlib.util.module_from_spec(_spec)
    # executing the module would import pyspark session helpers only at
    # main(); top-level is import-safe
    _spec.loader.exec_module(mod)
    return mod._hash_rows


def _sample(n: int = 10) -> list[str]:
    seed = os.environ.get(
        "UBA_ORACLE_SAMPLE_SEED", datetime.date.today().isoformat()
    )
    names = sorted(ORACLES)
    return random.Random(seed).sample(names, min(n, len(names)))


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_sampled_oracle_rotation(spark):
    hash_rows = _load_hash_rows()
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    failures = []
    for name in _sample():
        sdf = QUERIES[name](spark, SF_DIR)
        scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
        ores = con.execute(ORACLES[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        sh, _ = hash_rows(scols, srows)
        oh, _ = hash_rows(ocols, orows)
        if sorted(scols) != sorted(ocols) or len(srows) != len(orows) or sh != oh:
            failures.append(
                f"{name}: spark={len(srows)} duck={len(orows)} "
                f"cols {sorted(scols)} vs {sorted(ocols)} hash {sh} vs {oh}"
            )
    assert not failures, "\n".join(failures)
