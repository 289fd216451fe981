"""Unit tests for the non-oracle dedup operators: planted duplicates
must be found; unrelated documents must not collapse."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def planted(spark):
    base = [
        (1, "the quick brown fox jumps over the lazy dog in the morning sun", "en"),
        (2, "the quick brown fox jumps over the lazy dog in the morning sun!", "en"),  # near-dup of 1
        (3, "completely different text about database query engines and optimizers", "en"),
        (4, "der schnelle braune fuchs springt ueber den faulen hund am morgen", "de"),
        (5, "der schnelle braune fuchs springt ueber den faulen hund am morgen.", "de"),  # near-dup of 4
        (6, "streaming time series storage with arrow parquet and datafusion layers", "en"),
        (7, "the quick brown fox jumps over the lazy dog in the morning sun", "en"),  # exact dup of 1
    ]
    return spark.createDataFrame(base, "doc_id long, text string, lang string")


def test_exact_dedup(planted):
    from ella_spark.operators.dedup import exact_dedup

    out = exact_dedup(planted).toPandas()
    # 7 docs, one exact pair (1,7) -> 6 distinct hashes
    assert len(out) == 6
    dup = out[out.n_copies == 2]
    assert len(dup) == 1 and dup.keep_id.iloc[0] == 1


def test_minhash_lsh_finds_planted_pairs(planted):
    from ella_spark.operators.dedup import minhash_lsh_pairs

    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            planted, jaccard_threshold=0.5, shingle_k=5
        ).collect()
    }
    assert (1, 2) in pairs
    assert (4, 5) in pairs
    assert (1, 7) in pairs  # exact dup certainly collides
    assert (3, 6) not in pairs


def test_simhash_finds_planted_pairs(planted):
    from ella_spark.operators.dedup import simhash_dedup

    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_dedup(planted, hamming_threshold=8).collect()}
    assert pairs.get((1, 7)) == 0  # identical docs -> identical fingerprint
    assert (1, 2) in pairs
    assert (4, 5) in pairs
    assert (3, 6) not in pairs


def test_minhash_portable_finds_planted_pairs(planted):
    """The engine-portable variant (md5 + Carter–Wegman integer
    permutations) must behave like the xxhash64 fast path on planted
    duplicates — correctness parity with the oracle is covered by
    test_oracle_parity; this pins the dedup SEMANTICS."""
    from ella_spark.operators.dedup import minhash_portable_pairs

    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_portable_pairs(
            planted, jaccard_threshold=0.5, shingle_words=3
        ).collect()
    }
    assert pairs.get((1, 7)) == 1.0  # exact dup: identical shingle sets
    assert (1, 2) in pairs
    assert (4, 5) in pairs
    assert (3, 6) not in pairs


def test_simhash_portable_finds_planted_pairs(planted):
    """With ~12 bigram features per tiny test doc, one changed token
    flips several majority votes ((1,2) lands at Hamming 8 — bigram
    simhash needs realistic document lengths for a tight radius), so
    this pins the exact-dup, strong near-dup, and no-false-positive
    contracts; corpus-level behavior is oracle-checked at sf0.01."""
    from ella_spark.operators.dedup import simhash_portable_pairs

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_portable_pairs(planted, hamming_threshold=3).collect()
    }
    assert pairs.get((1, 7)) == 0  # identical docs -> identical fingerprint
    assert (4, 5) in pairs  # trailing-punctuation near-dup
    assert (3, 6) not in pairs and (1, 3) not in pairs


def test_ngram_jaccard_scores(planted):
    from ella_spark.operators.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(planted, shingle_k=3, window=6, partition_col="lang")
    scores = {(r.id_a, r.id_b): r.jaccard for r in out.collect()}
    assert scores[(1, 7)] == 1.0
    assert scores[(1, 2)] > 0.9
    assert scores[(1, 3)] < 0.3


def test_ngram_window_is_id_adjacent_not_similarity(spark):
    """Pin ngram_jaccard_pairs' candidate contract: the window is over
    ADJACENT DOC IDS, not similarity buckets. On an id-shuffled corpus
    a planted near-dup pair whose ids are > window apart is NOT
    compared — that pair is minhash_lsh_pairs territory (which must
    find it regardless of id distance)."""
    from ella_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    dup_a = "the quick brown fox jumps over the lazy dog in the morning sun"
    dup_b = dup_a + "!"
    fillers = [
        f"unrelated filler document number {i} about {topic}"
        for i, topic in enumerate(
            ["storage engines", "query planners", "arrow buffers", "shuffle io",
             "join strategies", "window frames", "codegen stages", "page cache"]
        )
    ]
    # ids shuffled: the dup pair sits at ids 0 and 9, window=3 apart > 3
    rows = [(0, dup_a, "en")] + [
        (i + 1, t, "en") for i, t in enumerate(fillers)
    ] + [(9, dup_b, "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    window_pairs = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(df, shingle_k=3, window=3).collect()
    }
    assert (0, 9) not in window_pairs  # id-distant: not a candidate
    assert all(b - a <= 3 for a, b in window_pairs)  # every pair id-adjacent

    lsh_pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(df, jaccard_threshold=0.5, shingle_k=5).collect()
    }
    assert (0, 9) in lsh_pairs  # similarity buckets don't care about ids


def test_embedding_neardup(spark):
    from ella_spark.operators.dedup import embedding_neardup_pairs

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [0.999, 0.01, 0.0, 0.0], 0),  # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0], 0),     # orthogonal
        (4, [0.0, 0.0, 1.0, 0.0], 1),     # other bucket
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = embedding_neardup_pairs(df, cosine_threshold=0.95, bucket_col="label")
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert pairs == {(1, 2)}


def test_repeated_span_removal_planted_boundaries(spark, tmp_path):
    """Two docs sharing a 12-word middle passage (unique pre/suffixes):
    the maximal-span islands must cover EXACTLY the shared passage —
    span boundaries are the window-start min / max+N-1 closure of the
    contiguous duplicate 8-gram hits (starts 6..10 -> span [6, 17])."""
    shared = " ".join(f"shared{i}" for i in range(12))
    docs = [
        (1, "a1 a2 a3 a4 a5 " + shared + " z1 z2 z3 z4 z5", "en", "web"),
        (2, "b1 b2 b3 b4 b5 " + shared + " y1 y2 y3 y4 y5", "en", "web"),
        (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12", "en", "web"),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    from ella_spark.queries import all_queries

    rows = {
        r.doc_id: (r.span_start, r.span_end, r.span_words)
        for r in all_queries()["q_repeated_span_removal"](
            spark, str(tmp_path)
        ).collect()
    }
    assert rows == {1: (6, 17, 12), 2: (6, 17, 12)}, rows


def test_span_cleaned_text_planted(spark, tmp_path):
    """The APPLY step of ExactSubstr dedup: cleaned text must be the
    document with exactly the shared passage cut out, untouched docs
    pass through verbatim."""
    shared = " ".join(f"shared{i}" for i in range(12))
    docs = [
        (1, "a1 a2 a3 a4 a5 " + shared + " z1 z2 z3 z4 z5", "en", "web"),
        (2, "b1 b2 b3 b4 b5 " + shared + " y1 y2 y3 y4 y5", "en", "web"),
        (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12", "en", "web"),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    from ella_spark.queries import all_queries

    rows = {
        r.doc_id: r
        for r in all_queries()["q_span_cleaned_text"](
            spark, str(tmp_path)
        ).collect()
    }
    assert rows[1].clean_text == "a1 a2 a3 a4 a5 z1 z2 z3 z4 z5"
    assert rows[2].clean_text == "b1 b2 b3 b4 b5 y1 y2 y3 y4 y5"
    assert rows[3].clean_text == "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"
    assert (rows[1].n_removed, rows[2].n_removed, rows[3].n_removed) == (12, 12, 0)


def test_dup_span_islands_randomized_reference(spark):
    """_dup_span_islands vs a straightforward python reference over
    random hit sets: islands must (a) cover exactly the union of the
    hit windows' closures, (b) be disjoint with inter-island gaps > N,
    (c) each start and end on a hit-window boundary."""
    import random

    from pyspark.sql import functions as F

    from ella_spark.queries.dedup import _dup_span_islands

    rng = random.Random(20260814)
    N = 8
    rows = []  # (doc_id, s, g) with g pre-marked dup via shared digest
    expected = {}
    for doc in range(40):
        starts = sorted(rng.sample(range(1, 120), rng.randint(1, 18)))
        rows += [(doc, s) for s in starts]
        spans = []
        for s in starts:
            if spans and s - spans[-1][1] <= N:  # s <= last_start + N
                spans[-1][1] = s
            else:
                spans.append([s, s])
        expected[doc] = {
            (a, b + N - 1, b + N - a) for a, b in spans
        }
    occ = spark.createDataFrame(
        [(d, s, "dup") for d, s in rows], "doc_id long, s int, g string"
    )
    dup = spark.createDataFrame([("dup",)], "g string")
    got = {}
    for r in _dup_span_islands(occ, dup, N).collect():
        got.setdefault(r.doc_id, set()).add(
            (r.span_start, r.span_end, r.span_words)
        )
    assert got == expected


def test_dedup_sql_tvfs(spark, tmp_path):
    """SQL surface for the dedup family (round 11 — the curation
    analog of the drift/statqa TVF matrices): near_dup_pairs /
    exact_dup_groups rewrite to the dedup operators over a catalog
    object; a stored VIEW keeps the durable TVF text and re-scores
    CURRENT data per read; bad args fail fast."""
    from ella_spark import Column, Ella

    db = Ella.create(str(tmp_path / "db"), spark)
    t = db.create_topic(
        "docs_t",
        [
            Column("doc_id", "int64", required=True),
            Column("text", "string"),
            Column("lang", "string"),
        ],
    )
    ns = 1_000_000_000
    rows = [
        (1, "the quick brown fox jumps over the lazy dog in the morning sun"),
        (2, "the quick brown fox jumps over the lazy dog in the morning sun!"),
        (3, "completely different text about database query engines and optimizers"),
        (7, "the quick brown fox jumps over the lazy dog in the morning sun"),
    ]
    with t.publish() as pub:
        for i, (did, txt) in enumerate(rows):
            pub.write((i + 1) * ns, did, txt, "en")

    # near-dup pairs: the planted near-dup (1,2), (1,7), (2,7) family
    out = db.query(
        "SELECT * FROM near_dup_pairs('docs_t', 'text', 'doc_id') "
        "ORDER BY id_a, id_b"
    ).df.toPandas()
    got = set(zip(out.id_a, out.id_b))
    assert (1, 7) in got and (1, 2) in got
    assert not any(3 in p for p in got)
    # exact duplicates score jaccard 1.0
    assert out[(out.id_a == 1) & (out.id_b == 7)].jaccard.iloc[0] == 1.0

    # threshold arg: at 1.0 only the exact-dup pairs survive verification
    strict = db.query(
        "SELECT * FROM near_dup_pairs('docs_t', 'text', 'doc_id', 1.0)"
    ).df.toPandas()
    assert set(zip(strict.id_a, strict.id_b)) == {(1, 7)}

    # exact dup groups: one group of 2 (docs 1 and 7), keep the min id
    g = db.query(
        "SELECT * FROM exact_dup_groups('docs_t', 'text', 'doc_id') "
        "WHERE n_copies > 1"
    ).df.toPandas()
    assert len(g) == 1 and g.keep_id.iloc[0] == 1 and g.n_copies.iloc[0] == 2

    # durable view: the stored text keeps the TVF call and re-scores
    # CURRENT data — a new exact dup appears in the next read
    db.query(
        "CREATE VIEW dupv AS SELECT * FROM "
        "exact_dup_groups('docs_t', 'text', 'doc_id') WHERE n_copies > 1"
    )
    assert "exact_dup_groups" in db.store.resolve("dupv").sql
    with t.publish() as pub:
        pub.write(100 * ns, 9, rows[2][1], "en")  # dup of doc 3
    g2 = db.query("SELECT * FROM dupv ORDER BY keep_id").df.toPandas()
    assert len(g2) == 2 and list(g2.keep_id) == [1, 3]

    with pytest.raises(ValueError, match="unknown table"):
        db.query("SELECT * FROM near_dup_pairs('nope', 'text', 'doc_id')")
    with pytest.raises(ValueError, match="min_jaccard"):
        db.query("SELECT * FROM near_dup_pairs('docs_t', 'text', 'doc_id', 1.5)")


def test_distinct_overlap_sql_tvf(spark, tmp_path):
    """distinct_overlap('<table>', '<group>', '<value>'[, k]) rewrites
    to kmv_overlap: exact-when-fits (every union below k), so the
    planted half-overlap scores Jaccard 2/6 exactly."""
    from ella_spark import Column, Ella

    db = Ella.create(str(tmp_path / "db2"), spark)
    t = db.create_topic(
        "ev",
        [Column("src", "string", required=True), Column("uid", "int64")],
    )
    ns = 1_000_000_000
    with t.publish() as pub:
        for i, u in enumerate([1, 2, 3, 4]):
            pub.write((i + 1) * ns, "a", u)
        for i, u in enumerate([3, 4, 5, 6]):
            pub.write((100 + i) * ns, "b", u)

    out = db.query(
        "SELECT * FROM distinct_overlap('ev', 'src', 'uid')"
    ).df.toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.grp_a, r.grp_b) == ("a", "b")
    assert r.est_a == 4.0 and r.est_b == 4.0 and r.union_est == 6.0
    assert abs(r.jaccard - 2 / 6) < 1e-12 and abs(r.inter_est - 2.0) < 1e-9

    with pytest.raises(ValueError, match="k must be"):
        db.query("SELECT * FROM distinct_overlap('ev', 'src', 'uid', 1)")


def test_embedding_neardup_sql_tvf(spark, tmp_path):
    """embedding_neardup('<table>','<vec>','<id>'[,'<bucket>'][,cos])
    rewrites to embedding_neardup_pairs: the planted near-parallel
    pair passes the threshold, the orthogonal one does not; the
    bucket column bounds the pair space (cross-bucket pairs never
    compared); a quoted threshold binds as threshold, not bucket."""
    from ella_spark import Column, Ella

    db = Ella.create(str(tmp_path / "db"), spark)
    t = db.create_topic(
        "vecs",
        [
            Column("vec_id", "int64", required=True),
            Column("grp", "string"),
            Column("emb", "float64", row_shape=(3,)),
        ],
    )
    ns = 1_000_000_000
    rows = [
        (1, "a", [1.0, 0.0, 0.0]),
        (2, "a", [0.999, 0.01, 0.0]),   # near-parallel to 1
        (3, "a", [0.0, 1.0, 0.0]),      # orthogonal
        (4, "b", [1.0, 0.0, 0.0]),      # same dir as 1, other bucket
    ]
    with t.publish() as pub:
        for i, (vid, g, e) in enumerate(rows):
            pub.write((i + 1) * ns, vid, g, e)

    out = db.query(
        "SELECT * FROM embedding_neardup('vecs', 'emb', 'vec_id', 'grp') "
        "ORDER BY id_a, id_b"
    ).df.toPandas()
    assert set(zip(out.id_a, out.id_b)) == {(1, 2)}  # bucket bound: no (1,4)
    assert out.cosine.iloc[0] > 0.99

    # exhaustive (no bucket): the cross-bucket exact-parallel pair
    # appears with cosine 1.0
    full = db.query(
        "SELECT * FROM embedding_neardup('vecs', 'emb', 'vec_id', 0.999)"
    ).df.toPandas()
    assert (1, 4) in set(zip(full.id_a, full.id_b))

    # quoted threshold binds as threshold (trend_robust arg rule)
    quoted = db.query(
        "SELECT * FROM embedding_neardup('vecs', 'emb', 'vec_id', '0.999')"
    ).df.toPandas()
    assert set(zip(quoted.id_a, quoted.id_b)) == set(zip(full.id_a, full.id_b))

    # r12 advice: ONLY the unquoted slot's numeric shape rebinds — a
    # float()-parseable form like '1e-1' stays a bucket COLUMN (and
    # fails resolution loudly) instead of silently becoming a 0.1
    # threshold that explodes the pair space
    with pytest.raises(Exception, match="1e-1"):
        db.query(
            "SELECT * FROM embedding_neardup('vecs', 'emb', 'vec_id', '1e-1')"
        ).df.collect()

    with pytest.raises(ValueError, match="cosine threshold"):
        db.query("SELECT * FROM embedding_neardup('vecs', 'emb', 'vec_id', 1.5)")
    with pytest.raises(ValueError, match="unknown table"):
        db.query("SELECT * FROM embedding_neardup('nope', 'emb', 'vec_id')")


def test_verify_parallelism_probe_fallbacks():
    """r12 advice: the Spark Connect fallback in edit_distance_pairs'
    CPU-redistribution probe is narrow — only a MISSING SparkContext
    handle falls back to shuffle.partitions (plain integers only;
    None/'auto' → Spark's 200 default); a dead session's error
    propagates instead of masquerading as a partition-count choice."""
    from ella_spark.operators.dedup import _verify_parallelism

    class _Conf:
        def __init__(self, value):
            self._value = value

        def get(self, key, default=None):
            assert key == "spark.sql.shuffle.partitions"
            return self._value if self._value is not None else default

    class _ConnectSession:  # no sparkContext attribute at all
        def __init__(self, conf_value):
            self.conf = _Conf(conf_value)

    class _ClassicSession:
        class sparkContext:
            defaultParallelism = 32

    class _DeadSession:
        @property
        def sparkContext(self):
            raise RuntimeError("SparkContext was shut down")

    assert _verify_parallelism(_ClassicSession()) == 32
    assert _verify_parallelism(_ConnectSession("64")) == 64
    assert _verify_parallelism(_ConnectSession("auto")) == 200  # AQE
    assert _verify_parallelism(_ConnectSession(None)) == 200  # unset
    with pytest.raises(RuntimeError, match="shut down"):
        _verify_parallelism(_DeadSession())


def test_minhash_xxhash_oracle_sql_replays_mix64_exactly():
    """Standing guard for the r13 production-path oracle
    (queries/dedup._minhash_xxhash_oracle): the staged DuckDB HUGEINT
    splitmix64 (split hi/lo multiplies, xor-shifts) must equal
    operators/dedup._mix64 bit-for-bit on adversarial uint64 inputs,
    and the full gram-hash chain (unicode(substr()) code points →
    Horner rolling hash → splitmix64 → distinct) must equal
    _kgram_hashes on NON-ASCII text across Unicode planes — the
    oracle's exactness claim is 'any text', not 'the ASCII testdata'.
    A DuckDB upgrade changing substr/unicode/HUGEINT semantics, or a
    refactor drifting _mix64, trips this without needing the driver."""
    import duckdb
    import numpy as np

    from ella_spark.operators.dedup import _kgram_hashes, _mix64

    t64, t32 = 1 << 64, 1 << 32
    gamma = 0x9E3779B97F4A7C15
    c1, c2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB

    def mul64(z: str, c: int) -> str:
        return (
            f"(((({z}) // {t32}) * {c}::HUGEINT) % {t32} * {t32}"
            f" + (({z}) % {t32}) * {c}::HUGEINT) % {t64}::HUGEINT"
        )

    con = duckdb.connect()
    # adversarial values: 0, 1, all-ones, sign/half boundaries, and a
    # deterministic pseudo-random spread
    rng = np.random.default_rng(20260816)
    vals = np.unique(
        np.concatenate(
            [
                np.array(
                    [0, 1, 2**63 - 1, 2**63, 2**64 - 1, 2**32 - 1, 2**32],
                    dtype=np.uint64,
                ),
                rng.integers(0, 2**64, size=200, dtype=np.uint64),
            ]
        )
    )
    rows = ", ".join(f"({int(v)}::HUGEINT)" for v in vals)
    got = con.sql(f"""
        WITH v(x) AS (VALUES {rows}),
        g1 AS (SELECT x, (x + {gamma}::HUGEINT) % {t64}::HUGEINT AS z FROM v),
        g2 AS (SELECT x, xor(z, z >> 30) AS z FROM g1),
        g3 AS (SELECT x, {mul64('z', c1)} AS z FROM g2),
        g4 AS (SELECT x, xor(z, z >> 27) AS z FROM g3),
        g5 AS (SELECT x, {mul64('z', c2)} AS z FROM g4)
        SELECT xor(z, z >> 31) FROM g5 ORDER BY x
    """).fetchall()
    assert [int(r[0]) for r in got] == [
        int(w) for w in _mix64(np.sort(vals))
    ]

    # full gram chain on multi-plane text (BMP accents, CJK,
    # supplementary-plane emoji)
    k = 8
    pow_mod = [pow(1099511628211, j, t64) for j in range(k)]
    roll = " + ".join(
        f"cp[i + {j}] * {pow_mod[k - 1 - j]}::HUGEINT" for j in range(k)
    )
    for text in [
        "héllo wörld ünïcode tèxt",
        "日本語のテキストをハッシュする",
        "emoji 😀😃😄😁 mix 🚀 text here",
    ]:
        q = f"""
        WITH n AS (SELECT lower(trim(?)) AS t),
        cps AS (SELECT list_transform(range(1, length(t) + 1),
                  i -> unicode(substr(t, CAST(i AS INTEGER), 1))::HUGEINT)
                  AS cp FROM n),
        g0 AS (SELECT unnest(list_transform(range(1, len(cp) - {k} + 2),
                  i -> ({roll}) % {t64}::HUGEINT)) AS z FROM cps),
        g1 AS (SELECT ((z + {gamma}::HUGEINT) % {t64}::HUGEINT) AS z FROM g0),
        g2 AS (SELECT xor(z, z >> 30) AS z FROM g1),
        g3 AS (SELECT {mul64('z', c1)} AS z FROM g2),
        g4 AS (SELECT xor(z, z >> 27) AS z FROM g3),
        g5 AS (SELECT {mul64('z', c2)} AS z FROM g4)
        SELECT DISTINCT xor(z, z >> 31) AS z FROM g5 ORDER BY z
        """
        duck = [int(r[0]) for r in con.execute(q, [text]).fetchall()]
        ref = sorted(int(x) for x in _kgram_hashes(text.strip().lower(), k))
        assert duck == ref, text


def test_minhash_drift_buckets_numpy_replay(spark):
    """Batch bucket-over-history MinHash drift (r14, the batch twin
    of the streaming similarity monitor): every score is replayed
    numpy-side from the production _kgram_hashes/_mix64 chain — the
    bucket signature is the slotwise-unsigned-min over docs, history
    is the running unsigned min over earlier buckets, est_jaccard is
    slot agreement, est_containment is the agreement-ratio estimate
    with the 1/num_hashes floor. Includes a one-shingle doc whose
    signature has >= 2^63 slots (negative as int64) so the JVM
    sign-bit-flip min order is pinned against the r13 signed-fold bug
    class, and the r13-advice scenario: a tiny replayed bucket scores
    est_jaccard LOW but est_containment exactly 1.0."""
    import numpy as np

    from ella_spark.operators.dedup import (
        _kgram_hashes,
        _mix64,
        minhash_drift_buckets,
    )

    with pytest.raises(ValueError, match="num_hashes"):
        minhash_drift_buckets(None, "g", "t", num_hashes=1)

    K, NH = 8, 64
    day = 86_400_000_000_000
    b1 = [
        "the quick brown fox jumps over the lazy dog near the river",
        "a second document about spark structured streaming state",
        "short third text with enough characters to shingle",
    ]
    b2_rw = [
        "the quick brown fox jumps over the lazy dog near the creek",
        "a second document about spark structured streaming windows",
    ]
    b3_rot = [
        "zzz completely rotated corpus qqq unrelated ngrams xxyyzz",
        "vvv nothing shared with history wwww kkkjjj hhhhgg ffff",
    ]
    b4_short = ["cbebhhhgd"]  # one shingle: ~half its slots >= 2^63
    b5_replay = [b1[0]]
    days = [b1, b2_rw, b3_rot, b4_short, b5_replay]
    rows = [
        ("s1", d * day + i, t)
        for d, docs in enumerate(days)
        for i, t in enumerate(docs)
    ]
    rows += [("s2", 0, b1[1]), ("s2", 0, "tiny")]  # <K chars: filtered
    df = spark.createDataFrame(rows, "src string, ts long, txt string")
    out = {
        (r.group, r.bucket_start // day): r
        for r in minhash_drift_buckets(
            df, "src", "txt", time_col="ts", shingle_k=K, num_hashes=NH
        ).collect()
    }
    assert len(out) == 6

    seeds = _mix64(np.arange(1, NH + 1, dtype=np.uint64))

    def bucket_sig(docs):
        sigs = []
        for t in docs:
            h = _kgram_hashes(t.strip().lower(), K)
            if h.shape[0]:
                sigs.append(_mix64(h[None, :] ^ seeds[:, None]).min(axis=1))
        return np.minimum.reduce(sigs)

    def score(cur, hist):
        a = float(np.mean(cur == hist))
        b = float(np.mean(cur == np.minimum(cur, hist)))
        return a, min(a / max(b, 1.0 / NH), 1.0)

    hist = None
    for d, docs in enumerate(days):
        r = out[("s1", d)]
        cur = bucket_sig(docs)
        if hist is None:
            exp_j, exp_c = 0.0, 0.0
        else:
            exp_j, exp_c = score(cur, hist)
        assert (r.est_jaccard, r.est_containment) == (exp_j, exp_c), d
        assert r.novelty == 1.0 - exp_c
        assert r.n_docs == len(docs)
        hist = cur if hist is None else np.minimum(hist, cur)

    # the signed-order trap is real in this data...
    assert int((bucket_sig(b4_short) >= 2**63).sum()) > 0
    # ...and the r13-advice scenario holds end-to-end: the replayed
    # one-doc bucket is a strict subset of history, so containment is
    # exactly 1.0 / novelty 0.0 while union-Jaccard has shrunk
    r5 = out[("s1", 4)]
    assert r5.est_jaccard < 0.6
    assert r5.est_containment == 1.0 and r5.novelty == 0.0
    # single-bucket group: first bucket vs empty history
    assert out[("s2", 0)].novelty == 1.0 and out[("s2", 0)].n_docs == 1


def test_minhash_drift_sql_tvf(spark, tmp_path):
    """minhash_drift('<table>','<group>','<text>'[,'<time>'][,days])
    in plain SQL — the batch twin of the streaming similarity monitor
    joins the trend_robust/set_churn day-bucket TVF family: same arg
    conventions (quoted-digit day width rebinds), same durable-view
    re-score contract, fails fast on unknown tables."""
    from ella_spark import Column, Ella

    db = Ella.create(str(tmp_path / "db_mhd"), spark)
    t = db.create_topic(
        "pages_b",
        [Column("src", "string", required=True), Column("body", "string")],
    )
    day = 86_400_000_000_000
    v1 = [
        "breaking news about the harbor bridge reopening this weekend",
        "local bakery wins the regional sourdough championship again",
    ]
    v2_rw = [
        "breaking news about the harbor bridge reopening this sunday",
        "local bakery wins the regional sourdough championship trophy",
    ]
    rot = [
        "zzz completely rotated corpus qqq unrelated ngrams xxyyzz",
        "vvv nothing shared with history wwww kkkjjj hhhhgg ffff",
    ]
    with t.publish() as pub:
        for d, docs in enumerate([v1, v2_rw, rot]):
            for i, b in enumerate(docs):
                pub.write(d * day + i, "feed", b)

    out = db.query(
        "SELECT * FROM minhash_drift('pages_b', 'src', 'body') "
        "ORDER BY bucket_start"
    ).df.toPandas()
    assert len(out) == 3 and list(out.n_docs) == [2, 2, 2]
    # day 0: empty history; day 1: reworded re-publish stays known;
    # day 2: true rotation alarms — the contrast the TVF exists for
    assert out.novelty.iloc[0] == 1.0
    assert out.est_containment.iloc[1] > 0.5 and out.novelty.iloc[1] < 0.5
    assert out.est_jaccard.iloc[2] < 0.2 and out.novelty.iloc[2] > 0.8

    # quoted day width rebinds (all days land in ONE 7-day bucket)
    wide = db.query(
        "SELECT * FROM minhash_drift('pages_b', 'src', 'body', '7')"
    ).df.toPandas()
    assert len(wide) == 1 and wide.n_docs.iloc[0] == 6

    with pytest.raises(ValueError, match="unknown table"):
        db.query("SELECT * FROM minhash_drift('nope', 'src', 'body')")

    # durable view re-scores CURRENT data (the saved-dashboard
    # contract shared with trend_robust/set_churn)
    db.query(
        "CREATE VIEW drift_board AS "
        "SELECT * FROM minhash_drift('pages_b', 'src', 'body')"
    )
    assert db.query(
        "SELECT count(*) AS n FROM drift_board"
    ).df.collect()[0].n == 3
    with t.publish() as pub:  # a fourth day arrives...
        pub.write(3 * day, "feed", v1[0])
    board = db.query(
        "SELECT * FROM drift_board ORDER BY bucket_start"
    ).df.toPandas()
    assert len(board) == 4  # ...and the stored view scored it
    # the new day replays a v1 doc: known content, novelty ~0
    assert board.novelty.iloc[3] < 0.5


def test_minhash_drift_buckets_randomized_wide_replay(spark):
    """Review-wave hardening for the JVM flipped-domain arithmetic: a
    seeded RANDOM corpus (4 groups x up to 6 buckets, bucket gaps,
    single-doc buckets, sub-shingle rejects) replayed score-for-score
    in numpy. Random text makes ~half of ALL signature slots >= 2^63
    (negative as int64), so every min/least/comparison in the
    sign-bit-flipped domain is exercised across the full slot
    distribution, not just the planted one-shingle doc."""
    import random

    import numpy as np

    from ella_spark.operators.dedup import (
        _kgram_hashes,
        _mix64,
        minhash_drift_buckets,
    )

    K, NH = 8, 32
    day = 86_400_000_000_000
    rng = random.Random(20260816)
    alphabet = "abcdefghij xyz"
    corpus: dict[tuple[str, int], list[str]] = {}
    rows = []
    for g in ("g1", "g2", "g3", "g4"):
        buckets = sorted(rng.sample(range(8), rng.randint(1, 6)))
        for b in buckets:
            # length mix biased toward 1-2-shingle docs: a slot of an
            # n-shingle doc is >= 2^63 with probability 2^-n, so only
            # near-single-shingle buckets keep negative-as-int64 slots
            # alive through the bucket min — the regime the signed
            # order bug class lives in
            docs = [
                "".join(
                    rng.choice(alphabet)
                    for _ in range(
                        rng.choice([rng.randint(8, 9), rng.randint(8, 9),
                                    rng.randint(3, 7), rng.randint(20, 60)])
                    )
                )
                for _ in range(rng.randint(1, 3))
            ]
            corpus[(g, b)] = docs
            rows += [
                (g, b * day + i, t) for i, t in enumerate(docs)
            ]
    df = spark.createDataFrame(rows, "src string, ts long, txt string")
    got = {
        (r.group, r.bucket_start // day): r
        for r in minhash_drift_buckets(
            df, "src", "txt", time_col="ts", shingle_k=K, num_hashes=NH
        ).collect()
    }

    seeds = _mix64(np.arange(1, NH + 1, dtype=np.uint64))

    def sig_of(docs):
        sigs = []
        for t in docs:
            h = _kgram_hashes(t.strip().lower(), K)
            if h.shape[0]:
                sigs.append(_mix64(h[None, :] ^ seeds[:, None]).min(axis=1))
        return np.minimum.reduce(sigs) if sigs else None

    n_neg = n_scored = 0
    for g in ("g1", "g2", "g3", "g4"):
        hist = None
        for b in sorted(b for (gg, b) in corpus if gg == g):
            docs = corpus[(g, b)]
            cur = sig_of(docs)
            n_shingleable = sum(
                1 for t in docs if len(t.strip()) >= K
            )
            if cur is None:
                assert (g, b) not in got  # all docs sub-shingle
                continue
            n_neg += int((cur >= 2**63).sum())
            r = got[(g, b)]
            assert r.n_docs == n_shingleable
            if hist is None:
                exp = (0.0, 0.0, 1.0)
            else:
                a = float(np.mean(cur == hist))
                bb = float(np.mean(cur == np.minimum(cur, hist)))
                c = min(a / max(bb, 1.0 / NH), 1.0)
                exp = (a, c, 1.0 - c)
            assert (r.est_jaccard, r.est_containment, r.novelty) == exp, (g, b)
            n_scored += 1
            hist = cur if hist is None else np.minimum(hist, cur)
    # the test exercised what it claims: many buckets scored, and the
    # signed-order trap was live across many slots (one-shingle docs
    # keep ~half their slots >= 2^63 through the bucket min)
    assert n_scored >= 8
    assert n_neg >= NH
