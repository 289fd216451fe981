#!/usr/bin/env python
"""Replayable 10x scale probe (the SCALING.md evidence driver).

Builds replicated copies of the test corpora (events x10 with shifted
event/user ids, documents x10 with shifted doc ids — same shapes the
round-7/8 probes used) under a scratch dir, then times named registry
queries at the base SF and at 10x (min of WARM_RUNS warm runs each)
and prints one table row per query.

Usage:
    python tools/scale_probe.py q_psi_drift q_zipf_slope ...
    python tools/scale_probe.py --sf /root/testdata/sf0.1 --runs 2 <names>

A flat ratio (~1x) means the query is fixed-overhead-dominated at this
scale — the per-query cost is stage setup, not data. A ratio near the
replication factor means the linear data term is visible; anything
super-linear is a red flag (see the q_hard_negatives fixed-centroid
demonstration in SCALING.md).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])
if REPO not in sys.path:
    sys.path.insert(0, REPO)

REPLICAS = 10


def build_corpora(spark, sf_dir: str, out_dir: str) -> None:
    import pyspark.sql.functions as F

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    reps = None
    for r in range(REPLICAS):
        part = ev.select(
            (F.col("event_id") + F.lit(r * 10_000_000)).alias("event_id"),
            "ts",
            # shift far past any real user_id range (r9 ADVICE: r*1000
            # collided with the base 0-1499 ids at sf0.1, folding
            # replicas into existing users with identical timestamps —
            # fewer distinct users, doubled per-user density — which
            # distorted the probe for per-user-window queries)
            (F.col("user_id") + F.lit(r * 10_000_000)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        reps = part if reps is None else reps.unionByName(part)
    reps.write.mode("overwrite").parquet(str(out / "events.parquet"))

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reps = None
    for r in range(REPLICAS):
        part = docs.select(
            (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
        reps = part if reps is None else reps.unionByName(part)
    reps.write.mode("overwrite").parquet(str(out / "documents.parquet"))

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    reps = None
    for r in range(REPLICAS):
        # replica 0 is verbatim; later replicas get a DETERMINISTIC
        # directional jitter (cosine is scale-invariant, so plain
        # copies would be exact cosine-duplicates — a degenerate ANN
        # corpus where every cell pair is a hit; jittered replicas
        # keep realistic neighborhood structure at 10x density)
        vec = (
            F.col("embedding")
            if r == 0
            else F.transform(
                "embedding",
                lambda x, i: (
                    x
                    + F.lit(0.015 * r)
                    * F.cos(
                        i.cast("double") * F.lit(float(r + 1))
                        + F.col("vec_id").cast("double")
                    )
                ).cast("float"),
            )
        )
        part = emb.select(
            (F.col("vec_id") + F.lit(r * 10_000_000)).alias("vec_id"),
            vec.alias("embedding"),
            "label",
        )
        reps = part if reps is None else reps.unionByName(part)
    reps.write.mode("overwrite").parquet(str(out / "embeddings.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/ella_scale_probe_10x")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--rebuild", action="store_true")
    args = ap.parse_args()

    from ella_spark.queries import all_queries
    from ella_spark.session import get_session

    spark = get_session("ella_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    unknown = [n for n in args.names if n not in qs]
    if unknown:
        ap.error(f"unknown queries: {unknown}")

    out = Path(args.out)
    # guard on the NEWEST corpus artifact (embeddings, added r12) so a
    # probe dir built by an earlier round is rebuilt, not half-used
    if args.rebuild or not (out / "embeddings.parquet").exists():
        print(f"building {REPLICAS}x corpora under {out} ...", flush=True)
        build_corpora(spark, args.sf, str(out))

    print(f"{'query':32s} {'base':>8s} {'10x':>8s} {'ratio':>6s}")
    for name in args.names:
        times = {}
        for label, d in (("base", args.sf), ("10x", str(out))):
            qs[name](spark, d).count()  # warm: codegen + caches
            best = min(
                _timed(qs[name], spark, d) for _ in range(args.runs)
            )
            times[label] = best
        ratio = times["10x"] / times["base"] if times["base"] else float("inf")
        print(
            f"{name:32s} {times['base']:7.3f}s {times['10x']:7.3f}s "
            f"{ratio:5.1f}x",
            flush=True,
        )
    spark.stop()


def _timed(fn, spark, d) -> float:
    t0 = time.perf_counter()
    fn(spark, d).count()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
