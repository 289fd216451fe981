"""Dump .explain('formatted') for a set of registry queries.

Usage: python tools/dump_plans.py OUTDIR SUFFIX name1 name2 ...
Writes OUTDIR/<name>_<SUFFIX>.txt for each query, built against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1). Run from the repo
whose plans you want (the r13 baseline worktree for *_before, HEAD
for *_after).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    from ella_spark.queries import all_queries
    from ella_spark.session import get_session

    spark = get_session("plan_dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not in registry")
            continue
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # keep going; report at the end
            plan = f"ERROR building {name}: {e}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
