"""Property tests for the round-3 operators: random inputs through the
Spark operator vs a direct Python reference implementation.

Hypothesis drives small random CDC logs, key sets and change batches
(including the nasty cases: same-timestamp updates, every-row-same-
state feeds, delete-only batches, empty overlap) and diffs against
dict/loop semantics that are obviously correct.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from userbehavioranalysis_spark.operators.compaction import (
    merge_upsert,
    scd2_history,
)
from userbehavioranalysis_spark.operators.joinopt import (
    bloom_build,
    bloom_prefilter,
)

_KEY = st.integers(min_value=0, max_value=5)
_STATE = st.sampled_from(["a", "b", "c"])
_TS = st.integers(min_value=0, max_value=20)


@given(
    rows=st.lists(st.tuples(_KEY, _STATE, _TS), min_size=1, max_size=40)
)
@settings(max_examples=10, deadline=None)
def test_scd2_matches_reference_run_semantics(spark, rows):
    # seq number = unique tie-breaker (CDC log sequence id)
    log = [(k, s, ts, i) for i, (k, s, ts) in enumerate(rows)]
    df = spark.createDataFrame(log, "k long, s string, ts long, seq long")
    got = {
        (r.k, r.s, r.valid_from, r.valid_to, r.version, r.is_current)
        for r in scd2_history(df, ["k"], "s", "ts", "seq").collect()
    }

    # reference: sort per key by (ts, seq); compact runs; build intervals
    want = set()
    by_key: dict[int, list] = {}
    for k, s, ts, seq in log:
        by_key.setdefault(k, []).append((ts, seq, s))
    for k, entries in by_key.items():
        entries.sort()
        runs = []
        for ts, seq, s in entries:
            if not runs or runs[-1][1] != s:
                runs.append((ts, s))
        for v, ((ts, s), nxt) in enumerate(zip(runs, runs[1:] + [None]), 1):
            want.add((k, s, ts, nxt[0] if nxt else None, v, nxt is None))
    assert got == want


_PAYLOAD = st.integers(min_value=0, max_value=99)


@given(
    snap=st.dictionaries(_KEY, _PAYLOAD, max_size=6),
    changes=st.dictionaries(_KEY, st.tuples(_PAYLOAD, st.booleans()), max_size=6),
)
@settings(max_examples=10, deadline=None)
def test_merge_upsert_matches_dict_semantics(spark, snap, changes):
    if not snap and not changes:
        return
    snap_df = spark.createDataFrame(
        [(k, v) for k, v in snap.items()] or [(None, None)], "k long, v long"
    ).where(F.col("k").isNotNull())
    ch_df = spark.createDataFrame(
        [(k, v, d) for k, (v, d) in changes.items()] or [(None, None, None)],
        "k long, v long, dead boolean",
    ).where(F.col("k").isNotNull())
    got = {(r.k, r.v) for r in merge_upsert(snap_df, ch_df, ["k"], "dead").collect()}

    ref = dict(snap)
    for k, (v, dead) in changes.items():
        if dead:
            ref.pop(k, None)
        else:
            ref[k] = v
    assert got == {(k, v) for k, v in ref.items()}


@given(
    members=st.sets(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=50),
    probes=st.sets(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=50),
)
@settings(max_examples=6, deadline=None)
def test_bloom_never_false_negative(spark, members, probes):
    m_df = spark.createDataFrame([(k,) for k in members], "k long")
    p_df = spark.createDataFrame([(k,) for k in probes], "k long")
    bits = bloom_build(m_df, "k", m_bits=1 << 12, depth=3)
    kept = {
        r.k for r in bloom_prefilter(p_df, "k", bits, m_bits=1 << 12, depth=3).collect()
    }
    assert probes & members <= kept  # no false negatives, ever


def test_zorder_interleave_is_bijective():
    from userbehavioranalysis_spark.sources.writers import zorder_value

    # pure-python replay of the SQL expression over the full 4x4 domain
    def z(a, b, a_bits, b_bits):
        total = a_bits + b_bits
        p = total
        out = 0
        for i in range(max(a_bits, b_bits)):
            if i < a_bits:
                p -= 1
                out += ((a >> (a_bits - 1 - i)) & 1) << p
            if i < b_bits:
                p -= 1
                out += ((b >> (b_bits - 1 - i)) & 1) << p
        return out

    vals = {z(a, b, 2, 2) for a in range(4) for b in range(4)}
    assert vals == set(range(16))  # bijection onto the z-domain
    # wider dim: still injective
    vals = {(z(a, b, 2, 4)) for a in range(4) for b in range(16)}
    assert len(vals) == 64


def test_zorder_sql_matches_python_replay(spark):
    from userbehavioranalysis_spark.sources.writers import zorder_value

    df = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(16)], "a long, b long"
    )
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", F.expr(zorder_value("a", "b", 2, 4)).alias("z")).collect()
    }

    def z(a, b, a_bits, b_bits):
        total, p, out = a_bits + b_bits, a_bits + b_bits, 0
        for i in range(max(a_bits, b_bits)):
            if i < a_bits:
                p -= 1
                out += ((a >> (a_bits - 1 - i)) & 1) << p
            if i < b_bits:
                p -= 1
                out += ((b >> (b_bits - 1 - i)) & 1) << p
        return out

    assert got == {(a, b): z(a, b, 2, 4) for a in range(4) for b in range(16)}
