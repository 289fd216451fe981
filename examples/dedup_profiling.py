#!/usr/bin/env python
"""Dedup profiling from plain SQL — beyond the reference's surface:
ingest a small corpus with planted exact and near duplicates, then
drive the whole dedup triage from SQL table-valued functions:

  1. exact_dup_groups  — how much EXACT duplication is there?
  2. near_dup_pairs    — which documents are near-copies (MinHash+LSH
                          candidates, exact-Jaccard verified)?
  3. distinct_overlap  — how much do two ingest SOURCES overlap in
                          content, estimated from KMV sketches before
                          paying for any full dedup pass?

and persist a VIEW whose durable text re-profiles CURRENT data on
every read (the saved-dashboard contract shared with the drift and
statqa TVFs).

    python examples/dedup_profiling.py [root-dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ella_spark import Column, Ella

DOCS = [
    # (doc_id, source, text) — 1/7 exact dups; 2 a near-dup of 1;
    # sources "web" and "books" share the classic sentence
    (1, "web", "the quick brown fox jumps over the lazy dog in the morning sun"),
    (2, "web", "the quick brown fox jumps over the lazy dog in the morning sun!"),
    (3, "web", "completely different text about database query engines and optimizers"),
    (4, "books", "der schnelle braune fuchs springt ueber den faulen hund am morgen"),
    (5, "books", "streaming time series storage with arrow parquet and datafusion layers"),
    (6, "books", "the quick brown fox jumps over the lazy dog in the morning sun"),
    (7, "web", "the quick brown fox jumps over the lazy dog in the morning sun"),
]


def main(root: str | None = None) -> int:
    root = root or tempfile.mkdtemp(prefix="ella_dedup_")
    db = Ella.create(f"{root}/db")
    t = db.create_topic(
        "corpus",
        [
            Column("doc_id", "int64", required=True),
            Column("source", "string"),
            Column("text", "string"),
        ],
    )
    ns = 1_000_000_000
    with t.publish() as pub:
        for i, (did, src, txt) in enumerate(DOCS):
            pub.write((i + 1) * ns, did, src, txt)

    def show(title, sql):
        print(f"\n-- {title}\n   {sql}")
        rows = db.query(sql).df.collect()
        for row in rows:
            print("  ", row.asDict())
        return rows

    dups = show(
        "exact duplicate groups",
        "SELECT * FROM exact_dup_groups('corpus', 'text', 'doc_id') "
        "WHERE n_copies > 1 ORDER BY keep_id",
    )
    assert len(dups) == 1 and dups[0].n_copies == 3  # docs 1, 6, 7

    pairs = show(
        "near-dup pairs (jaccard >= 0.5)",
        "SELECT * FROM near_dup_pairs('corpus', 'text', 'doc_id') "
        "ORDER BY id_a, id_b",
    )
    got = {(r.id_a, r.id_b) for r in pairs}
    assert {(1, 6), (1, 7), (6, 7)} <= got  # the exact triple
    assert (1, 2) in got  # the near-dup (trailing '!')

    overlap = show(
        "source-overlap profile (KMV, exact below k)",
        "SELECT * FROM distinct_overlap('corpus', 'source', 'text')",
    )
    assert len(overlap) == 1
    r = overlap[0]
    # web and books each carry 3 DISTINCT texts (doc 7 repeats doc 1
    # within web); they share exactly one — the classic sentence
    assert (r.est_a, r.est_b) == (3.0, 3.0) and round(r.inter_est) == 1

    # the saved-dashboard contract: the VIEW's durable text keeps the
    # TVF call, so a later read re-profiles CURRENT data
    db.query(
        "CREATE VIEW dup_profile AS "
        "SELECT * FROM exact_dup_groups('corpus', 'text', 'doc_id') "
        "WHERE n_copies > 1"
    )
    with t.publish() as pub:  # doc 9 duplicates doc 3
        pub.write(100 * ns, 9, "web", DOCS[2][2])
    fresh = db.query("SELECT * FROM dup_profile ORDER BY keep_id").df.collect()
    assert [r.keep_id for r in fresh] == [1, 3]
    print("\nre-read after new ingest: duplicate groups =",
          [(r.keep_id, r.n_copies) for r in fresh])

    print("\nOK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
