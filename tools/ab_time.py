"""Interleaved median timing of a few registry queries — for same-host
A/B between two checkouts. Usage: python tools/ab_time.py name1 name2 ...
Prints one JSON line {name: median_sec}. Protocol mirrors bench.py
(one untimed warm round, then 5 timed interleaved rounds, median).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# honor the same env var as bench.py / dump_plans.py (ADVICE r14)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = 5


def main() -> None:
    names = sys.argv[1:]
    from ella_spark.queries import all_queries
    from ella_spark.session import get_session

    spark = get_session("ab_time")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        # fail BEFORE the warm loop: a typo must not abort a long
        # interleaved run halfway through (ADVICE r14)
        sys.exit(f"unknown query names: {unknown} (see ella_spark.queries)")
    qs["q_distinct"](spark, SF_DIR).collect()  # JVM/footer warm
    for n in names:
        qs[n](spark, SF_DIR).count()  # untimed warm round
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(ROUNDS):
        for n in names:
            t0 = time.perf_counter()
            qs[n](spark, SF_DIR).count()
            samples[n].append(time.perf_counter() - t0)
    print(json.dumps({n: round(statistics.median(samples[n]), 4) for n in names}))
    spark.stop()


if __name__ == "__main__":
    main()
