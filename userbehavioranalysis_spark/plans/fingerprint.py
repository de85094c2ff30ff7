"""Physical-plan fingerprints — making "no regression" mechanical.

Two rounds in a row, 1.5-2× timing drift on sub-second queries had to
be dismissed as JVM/session noise by hand-diffing the operator source
(r6→r7 verdicts).  The right artifact is a content hash of the
PHYSICAL PLAN: if a query's fingerprint is unchanged between rounds,
its timing delta cannot be a plan regression (no join strategy flip,
no lost pushdown, no extra exchange) and is dismissible as noise by
construction; if it changed, the diff points at exactly what to look
at.

``plan_fingerprint(df)`` hashes the pre-execution physical plan
(``QueryExecution.simpleString`` — AdaptiveSparkPlan with
isFinalPlan=false, i.e. the Catalyst-chosen plan BEFORE AQE runtime
re-planning, which is the deterministic artifact) after normalizing
everything that varies run-to-run without being a plan change:

- expression ids (``#123``) and ``plan_id=N`` — fresh per session;
- ``file:`` URIs and absolute paths — testdata roots and per-call
  staging tempdirs;
- long hex runs — uuid staging stamps;
- ALL remaining digit runs — partition counts, row-group counts,
  truncation markers.  Deliberately aggressive: a constant change
  (``rank <= 3`` → ``<= 5``) is a VALUES change the oracle gate
  catches; what the fingerprint must catch is SHAPE — operator
  insertion/removal, BroadcastHashJoin↔SortMergeJoin, pushdown loss —
  all of which survive digit-stripping.

Fingerprints are SCALE-PINNED: join-strategy selection reads size
stats, so a fingerprint taken at sf0.001 is only comparable to
another sf0.001 fingerprint.  bench.py records them per-round at its
own sf into BENCH_DETAIL.json (cross-round comparison at sf0.1);
``tools/plan_fingerprints.py`` maintains the committed sf0.001
baseline ``PLAN_FINGERPRINTS.json`` that the test suite samples
against.
"""

from __future__ import annotations

import hashlib
import re

_SUBS = [
    (re.compile(r"#\d+"), "#"),
    (re.compile(r"plan_id=\d+"), "plan_id="),
    (re.compile(r"file:[^\s,\])}]+"), "file:PATH"),
    (re.compile(r"/(?:tmp|root)/[^\s,\])}]+"), "PATH"),
    (re.compile(r"[0-9a-f]{12,}"), "HEX"),
    (re.compile(r"\d+"), "N"),
]


def normalized_plan(df) -> str:
    """The normalized physical-plan text (the fingerprint's preimage) —
    exposed so a mismatch can be DIFFED, not just detected."""
    s = df._jdf.queryExecution().simpleString()
    for rx, rep in _SUBS:
        s = rx.sub(rep, s)
    return s


def plan_fingerprint(df) -> str:
    """16-hex-char sha256 of :func:`normalized_plan`."""
    return hashlib.sha256(normalized_plan(df).encode()).hexdigest()[:16]
