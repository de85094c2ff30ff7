"""One-off steady-state reference for the streaming replays.

Between r3 and r4 the bench policy for ``streaming_*`` changed from
min-of-2 to single-run (the round-3 judge asked for the repeat to be
trimmed: replay wall is dominated by fixed micro-batch/checkpoint
setup).  That makes r3 and r4+ streaming numbers non-comparable, so
this tool records ONE steady-state min-of-2 column for the replays —
the honest baseline for round-over-round comparisons (BASELINE.md
"Streaming timing policy").

    python tools/bench_streaming_ref.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from userbehavioranalysis_spark import get_spark  # noqa: E402
from userbehavioranalysis_spark.registry import QUERIES  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("uba-bench-streaming-ref")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up primes JVM/codegen/parquet footers
    QUERIES["page_view"](spark, sf_dir).count()

    out: dict[str, dict[str, float]] = {}
    for name, fn in QUERIES.items():
        if not name.startswith("streaming_"):
            continue
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        out[name] = {
            "first": round(runs[0], 3),
            "min_of_2": round(min(runs), 3),
        }
        print(f"{name:45s} first={runs[0]:6.2f}s min2={min(runs):6.2f}s")
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
