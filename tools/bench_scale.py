"""Scaling measurement for the heavy operator family.

Times each heavy query at two scale factors (default sf0.1 and the
synthesized sf1 from tools/make_scale_data.py) and prints the per-query
ratio.  Linear-ish scaling (ratio ≈ the 10× data growth, and certainly
< 10× wall-clock for queries with fixed overheads) is the empirical
backing for the 100 TB design claims in SCALE.md.

    python tools/bench_scale.py [sf_small] [sf_big] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from userbehavioranalysis_spark import get_spark
from userbehavioranalysis_spark.registry import QUERIES

HEAVY = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_capped",
    # narrow-semantics dedup_simhash / dedup_clusters are EXCLUDED: since
    # r5 the registry pins them to their 8/63-bit oracles at every sf
    # (allow_narrow_at_scale=True), which past ~500 k docs is the
    # documented segment-aliasing wall — the _wide siblings below are
    # the scale path this tool exists to measure.
    "dedup_simhash_wide",
    "dedup_ngram_jaccard",
    "dedup_clusters_wide",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "ann_topk_brute",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "ann_topk_quantized",
    "embedding_quantize",
    "language_id",
    "quality_gate",
    "pipeline_clean_corpus",
    # round-4 additions
    "bm25_search",
    "ann_topk_pq",
    "ann_topk_ivfpq",
    # round-6 additions (dedup_incremental_indexed's registered form
    # caches its index per sf_dir, so its first timing includes the
    # one-time write — the split write/probe numbers are measured
    # separately and recorded in BASELINE.md "Round-6 additions")
    "dedup_incremental_indexed",
    "pipeline_incremental_refresh",
    # round-7 addition (same caveat: the registered form caches its
    # index per sf_dir, so the first timing includes the one-time
    # write — split write/probe decades live in BASELINE.md "Round-7
    # additions")
    "dedup_embedding_incremental_indexed",
]


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf1"
    names = sys.argv[3:] or HEAVY

    spark = get_spark("uba-bench-scale")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up primes JVM/codegen against both dirs
    QUERIES["dedup_exact"](spark, small).count()
    QUERIES["dedup_exact"](spark, big).count()

    out = {}
    for name in names:
        row = {}
        for key, sf_dir in (("small", small), ("big", big)):
            t0 = time.perf_counter()
            n = QUERIES[name](spark, sf_dir).count()
            row[key] = round(time.perf_counter() - t0, 2)
            row[f"{key}_rows"] = n
        row["ratio"] = round(row["big"] / row["small"], 1) if row["small"] else None
        out[name] = row
        print(
            f"{name:26s} {row['small']:7.2f}s -> {row['big']:7.2f}s "
            f"ratio {row['ratio']:5.1f}  rows {row['small_rows']} -> {row['big_rows']}",
            flush=True,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
