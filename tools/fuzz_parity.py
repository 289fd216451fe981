"""Perturbed-corpus parity fuzz (r14 wave 5).

The generated test corpora carry ZERO nulls, zero empty texts and
almost no value ties (checked at sf0.1), so the driver's oracle gate
never exercises the null-ordering / empty-input / tie-break paths —
exactly where Spark and DuckDB defaults diverge (Spark sorts nulls
FIRST ascending, DuckDB LAST; NaN vs NULL division results; regex
splits of empty strings). This tool builds a seed-pinned perturbed
copy of sf0.001 and replays every ORACLE-PAIRED registry query on
both engines over it:

- events: ~5%% of `value` nulled, ~2%% of `props` nulled, `value`
  rounded to 1 decimal on ~30%% of rows (tie pressure); ids/ts/types
  untouched (id uniqueness and time layout are contracts).
- documents: a few empty / whitespace-only / unicode (CJK+emoji) /
  single-token texts spliced in by doc_id, `n_chars` kept consistent
  (= length(text), the generator's invariant).
- embeddings: one all-zero vector and one duplicated vector pair
  (cosine ties, zero-norm division), `label` untouched.

A divergence here is NOT automatically a bug: the graded corpora
satisfy the generator's invariants, and some queries legitimately
inherit engine default null placement. The output is a WORKLIST to
adjudicate: align the semantics (mirror an IS NOT NULL / nulls-last
in BOTH the Spark query and its oracle — a no-op on the graded
corpora) or record the divergence as out-of-contract in
KNOWN_DIVERGENT below.

First run (r14) found and fixed: the zero-norm crash class (9 ANN
queries, Spark ANSI divide-by-zero where DuckDB NULLs — safe_div /
nullif alignment), the one-token-doc crash (descending sequence in
q_quality_repetition's bigram starts), surrogate-pair char counting
(q_char_entropy), md5-of-empty digests (q_paragraph_dedup), and
NULLs ranking into order statistics (q_m4_downsample, q_winsorize).

Usage: python tools/fuzz_parity.py [--out /tmp/ella_fuzz_corpus]
"""

from __future__ import annotations

import argparse
import math
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

#: With `--classes nan`, the centi-quantization oracles (the shared
#: `CAST(floor(value*100+0.5) AS BIGINT)` idiom, ~19 queries) error
#: on the DUCKDB side: DuckDB refuses CAST(nan AS BIGINT) while the
#: SPARK side of every one of those queries ran the NaN corpus
#: without error (verified r14). The engine is NaN-robust; the
#: cross-engine harness simply cannot replay NaN through those
#: oracles — an oracle limitation, not an engine bug. The two
#: queries where NaN changed VALUES (rank-into-order-statistics:
#: q_mad_outliers, q_quantile_rollup) carry mirrored NaN exclusions
#: instead and verify clean.
KNOWN_ORACLE_NAN_LIMITED = True  # documented adjudication marker

#: adjudicated engine-definition divergences — reported separately,
#: not counted as failures.
KNOWN_DIVERGENT = {
    # DuckDB's levenshtein counts BYTES on multi-byte UTF-8 (emoji =
    # 4) while Spark counts codepoints (= 1): an engine-definition
    # gap with no portable alignment short of distorting the text.
    # The oracle contract holds on the ASCII-dominant generated
    # corpora; expect off-by-bytes distances on non-ASCII docs.
    "q_dedup_edit_distance": "DuckDB levenshtein is byte-based on non-ASCII",
}

WEIRD_TEXTS = {
    1001: "",
    1002: "   ",
    1003: "\t\n  \n",
    1004: "word",
    1005: "日本語の文書 \U0001f600 café "
    "naïve русский",
    1006: "dup dup dup dup dup dup dup dup dup dup dup dup dup dup",
}


def build(spark, out: Path, classes: frozenset = frozenset()) -> None:
    import pyspark.sql.functions as F

    out.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        if t == "events":
            # deterministic row hash drives every perturbation
            h = F.pmod(F.col("event_id") * 2654435761, F.lit(1000))
            df = df.withColumn(
                "value",
                F.when(h < 50, F.lit(None).cast("double")).otherwise(
                    F.when(
                        h < 350, F.round(F.col("value"), 1)
                    ).otherwise(F.col("value"))
                ),
            ).withColumn(
                "props",
                F.when(
                    (h >= 50) & (h < 70), F.lit(None).cast("string")
                ).otherwise(F.col("props")),
            )
            if "nan" in classes:
                df = df.withColumn(
                    "value",
                    F.when(
                        (h >= 70) & (h < 90), F.lit(float("nan"))
                    ).otherwise(F.col("value")),
                )
            if "nullkeys" in classes:
                df = df.withColumn(
                    "event_type",
                    F.when(
                        (h >= 90) & (h < 110), F.lit(None).cast("string")
                    ).otherwise(F.col("event_type")),
                )
        elif t == "documents":
            if "nullkeys" in classes:
                df = df.withColumn(
                    "lang",
                    F.when(
                        F.col("doc_id") % 97 == 0, F.lit(None).cast("string")
                    ).otherwise(F.col("lang")),
                )
            expr = F.col("text")
            for did, txt in WEIRD_TEXTS.items():
                expr = F.when(
                    F.col("doc_id") == did % 500, F.lit(txt)
                ).otherwise(expr)
            df = df.withColumn("text", expr).withColumn(
                "n_chars", F.length("text").cast("long")
            )
        elif t == "embeddings":
            dim = len(df.select("embedding").first()[0])
            zero = F.array(*[F.lit(0.0).cast("float") for _ in range(dim)])
            df = df.withColumn(
                "embedding",
                F.when(F.col("vec_id") == 7, zero).otherwise(
                    F.col("embedding")
                ),
            )
            # vec_id 11 duplicates vec_id 12's vector -> cosine tie
            dup = df.where(F.col("vec_id") == 12).select(
                "embedding"
            ).first()[0]
            df = df.withColumn(
                "embedding",
                F.when(
                    F.col("vec_id") == 11,
                    F.array(*[F.lit(float(x)).cast("float") for x in dup]),
                ).otherwise(F.col("embedding")),
            )
        df.coalesce(1).write.mode("overwrite").parquet(str(out / f"{t}.parquet"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ella_fuzz_corpus")
    ap.add_argument("--names", nargs="*", default=None)
    ap.add_argument(
        "--classes",
        nargs="*",
        default=[],
        help="extra perturbation classes: nan (NaN doubles in "
        "events.value), nullkeys (NULL event_type / lang group keys)",
    )
    args = ap.parse_args()

    import os

    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = Path(args.out)
    build(spark, out, frozenset(args.classes))
    # pinned-artifact oracles (centroids/LM/PCA/codebooks/classifier
    # weights) must train on the SAME corpus both sides run against,
    # or the comparison reports artifact drift instead of parity —
    # set the env BEFORE the registry loads
    os.environ["SPARK_GRAFT_ORACLE_SF"] = str(out)

    duck = duckdb.connect()
    for t in TABLES:
        # Spark writes <table>.parquet as a DIRECTORY of part files;
        # DuckDB needs the glob (the r12 directory-corpus lesson)
        duck.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{out}/{t}.parquet/*.parquet')"
        )

    sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))
    from tests.test_oracle_parity import _normalize

    from ella_spark.queries import REGISTRY, _load

    _load()
    names = args.names or sorted(n for n in REGISTRY if REGISTRY[n].oracle)
    diverged, errored = [], []
    oracle_limited = []
    for name in names:
        q = REGISTRY[name]
        try:
            s = _normalize(q.spark(spark, str(out)).toPandas())
        except Exception as ex:
            # an ENGINE failure on perturbed data — always a real bug
            errored.append((name, f"SPARK {type(ex).__name__}: {str(ex)[:90]}"))
            continue
        try:
            o = _normalize(duck.sql(q.oracle).df())
            same_shape = len(s) == len(o) and list(s.columns) == list(o.columns)
            ok = same_shape and s.equals(o)
            if not ok and same_shape:
                # tolerate float noise the sweep's normalize rounds away
                ok = all(
                    s[c].equals(o[c])
                    or (
                        s[c].dtype.kind == "f"
                        and ((s[c] - o[c]).abs().fillna(0) < 1e-9).all()
                    )
                    for c in s.columns
                )
        except Exception as ex:
            # DuckDB-side failure: with the nan class this is the
            # documented CAST(nan AS BIGINT) oracle limitation (the
            # Spark side above already ran clean)
            if "nan" in args.classes and "nan" in str(ex):
                oracle_limited.append(name)
            else:
                errored.append(
                    (name, f"DUCK {type(ex).__name__}: {str(ex)[:90]}")
                )
            continue
        if not ok and name in KNOWN_DIVERGENT:
            print(f"know {name} ({KNOWN_DIVERGENT[name]})", flush=True)
            continue
        if not ok:
            diverged.append((name, len(s), len(o)))
        print(f"{'ok  ' if ok else 'DIFF'} {name}", flush=True)
    if oracle_limited:
        print(
            f"\n== {len(oracle_limited)} oracle-limited on NaN "
            "(engine side clean; see KNOWN_ORACLE_NAN_LIMITED) =="
        )
    print(f"\n== {len(diverged)} divergences ==")
    for d in diverged:
        print("  ", *d)
    print(f"== {len(errored)} errors ==")
    for e in errored:
        print("  ", *e)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
