"""Plan-fingerprint rotation guard (round 8, verdict item #3).

PLAN_FINGERPRINTS.json is the committed sf0.001 baseline of every
batch query's normalized physical-plan hash (tools/plan_fingerprints.py
--update regenerates it; full-sweep verify: tools/plan_fingerprints.py).
This test re-derives a 12-query random sample per session — seeded by
the calendar day, the test_oracle_rotation pattern — so a plan
regression that slips in through a shared helper (a lost broadcast, an
extra exchange, a dropped pushdown) fails CI within days even if no
one re-ran the full sweep.  A mismatch on a query whose source YOU
changed means: eyeball `tools/plan_fingerprints.py --show <q>`, then
--update and commit the baseline with the change.
"""

from __future__ import annotations

import datetime
import json
import os
import random

import pytest

from userbehavioranalysis_spark.plans.fingerprint import plan_fingerprint
from userbehavioranalysis_spark.registry import QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(REPO, "PLAN_FINGERPRINTS.json")
SF_DIR = "/root/testdata/sf0.001"


def _sample(names: list[str], n: int = 12) -> list[str]:
    seed = os.environ.get(
        "UBA_ORACLE_SAMPLE_SEED", datetime.date.today().isoformat()
    )
    return random.Random(f"plans-{seed}").sample(sorted(names), min(n, len(names)))


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_baseline_covers_exactly_the_batch_registry():
    with open(BASELINE) as f:
        base = json.load(f)
    batch = {n for n in QUERIES if not n.startswith("streaming_")}
    want = set(base["fingerprints"])
    assert want == batch, (
        f"baseline out of sync with registry — missing {sorted(batch - want)}, "
        f"stale {sorted(want - batch)}; run tools/plan_fingerprints.py --update"
    )


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_sampled_plan_fingerprints_match_baseline(spark):
    with open(BASELINE) as f:
        base = json.load(f)["fingerprints"]
    batch = [n for n in QUERIES if not n.startswith("streaming_")]
    changed = []
    for name in _sample(batch):
        # order-independence vs whatever ran earlier in the test
        # session (see tools/plan_fingerprints.py compute())
        spark.catalog.clearCache()
        got = plan_fingerprint(QUERIES[name](spark, SF_DIR))
        if base.get(name) != got:
            changed.append(f"{name}: {base.get(name)} -> {got}")
    assert not changed, (
        "physical plan changed (regression, or an intended change whose "
        "baseline wasn't updated — see tools/plan_fingerprints.py):\n"
        + "\n".join(changed)
    )
