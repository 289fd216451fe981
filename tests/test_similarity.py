"""Similarity-search operator tests: brute force exactness + LSH recall."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    from ella_spark.sources import load_table

    return load_table(spark, SF_SMOKE, "embeddings").cache()


def test_brute_force_topk_shape(emb):
    from ella_spark.operators.similarity import brute_force_topk

    q = emb.where(F.col("vec_id") < 3)
    out = brute_force_topk(emb, q, k=4).toPandas()
    assert sorted(out.query_id.unique()) == [0, 1, 2]
    assert all(out.groupby("query_id")["rank"].max() == 4)
    assert (out.cosine <= 1.000001).all()
    # self never returned
    assert not ((out.query_id == out.neighbor_id).any())


def test_lsh_recall_vs_brute_force(emb):
    from ella_spark.operators.similarity import brute_force_topk, lsh_topk

    q = emb.where(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, q, k=3).toPandas()
    approx = lsh_topk(emb, q, dim=64, k=3, num_planes=3, num_tables=10).toPandas()
    exact_set = set(zip(exact.query_id, exact.neighbor_id))
    approx_set = set(zip(approx.query_id, approx.neighbor_id))
    recall = len(exact_set & approx_set) / len(exact_set)
    # 8 tables x 6 planes on 64-dim synthetic data: generous threshold,
    # but catches a broken bucketing outright.
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_lsh_deterministic(emb):
    from ella_spark.operators.similarity import lsh_topk

    q = emb.where(F.col("vec_id") < 3)
    a = lsh_topk(emb, q, dim=64, k=3).toPandas().sort_values(["query_id", "rank"])
    b = lsh_topk(emb, q, dim=64, k=3).toPandas().sort_values(["query_id", "rank"])
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_ivf_recall_vs_brute_force(emb):
    from ella_spark.operators.similarity import brute_force_topk, ivf_topk

    q = emb.where(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, q, k=3).toPandas()
    approx = ivf_topk(emb, q, dim=64, k=3, n_centroids=8, n_probe=4).toPandas()
    exact_set = set(zip(exact.query_id, exact.neighbor_id))
    approx_set = set(zip(approx.query_id, approx.neighbor_id))
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.6, f"IVF recall too low: {recall}"


def test_ivf_deterministic_with_precomputed_centroids(emb):
    from ella_spark.operators.similarity import ivf_topk, train_ivf_centroids

    cent = train_ivf_centroids(emb, dim=64, n_centroids=8)
    q = emb.where(F.col("vec_id") < 3)
    a = ivf_topk(emb, q, dim=64, k=3, centroids=cent).toPandas().sort_values(["query_id", "rank"])
    b = ivf_topk(emb, q, dim=64, k=3, centroids=cent).toPandas().sort_values(["query_id", "rank"])
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_vector_index_lifecycle(spark, tmp_path):
    """create_vector_index persists centroids; vector_search reuses
    them (cache + disk) with brute-force-level recall on the corpus."""
    import numpy as np

    from ella_spark.engine import Ella
    from ella_spark.operators.similarity import brute_force_topk
    from ella_spark.sources import load_table
    from ella_spark.types import Column

    db = Ella.create(str(tmp_path / "vdb"), spark)
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    t = db.create_topic(
        "vecs",
        [
            Column("vec_id", "int64", required=True),
            Column("embedding", "float32", row_shape=(64,)),
        ],
    )
    import pyspark.sql.functions as F

    t.insert(
        emb.select(
            (F.col("vec_id") * 1000).alias("time"), "vec_id", "embedding"
        )
    )
    meta = db.create_vector_index("vecs", n_centroids=8)
    assert meta["dim"] == 64 and meta["n_centroids"] == 8
    # artifact is on disk and survives a fresh handle
    db2 = Ella.open(str(tmp_path / "vdb"), spark)
    queries = emb.where(F.col("vec_id") < 3)
    got = db2.vector_search("vecs", queries, k=5, n_probe=4)
    rows = got.collect()
    assert {r.query_id for r in rows} == {0, 1, 2}
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {(r.query_id, r.neighbor_id) for r in rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6  # n_probe=4 of 8 cells on a tiny corpus

    # the index is reachable from the SQL surface as a TVF: joins and
    # ORDER BY around the rewritten view are ordinary Spark SQL
    queries.createOrReplaceTempView("qv")
    sql_rows = db2.query(
        "SELECT query_id, neighbor_id, rank FROM "
        "ann_search('vecs', 'embedding', 'qv', 5, 4) "
        "WHERE rank <= 3 ORDER BY query_id, rank"
    ).execute()
    assert set(sql_rows["query_id"]) == {0, 1, 2}
    assert list(sql_rows["rank"]) == [1, 2, 3] * 3
    sql_pairs = set(zip(sql_rows["query_id"], sql_rows["neighbor_id"]))
    assert sql_pairs <= approx  # same index, same candidates
    with pytest.raises(ValueError, match="no vector index"):
        db2.query(
            "SELECT * FROM ann_search('vecs', 'missing_col', 'qv')"
        ).execute()

    import pytest as _pytest

    with _pytest.raises(ValueError, match="no vector index"):
        db2.vector_search("vecs", queries, column="other")


def test_ivfpq_recall_vs_brute_force(emb):
    from ella_spark.operators.similarity import brute_force_topk, ivfpq_topk

    q = emb.where(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, q, k=3).toPandas()
    approx = ivfpq_topk(
        emb, q, dim=64, k=3, n_centroids=8, n_probe=4,
        m_subvectors=16, n_codes=16, refine=48,
    ).toPandas()
    exact_set = set(zip(exact.query_id, exact.neighbor_id))
    approx_set = set(zip(approx.query_id, approx.neighbor_id))
    recall = len(exact_set & approx_set) / len(exact_set)
    # exact refinement on top of ADC candidates: recall should track
    # plain IVF at the same probe budget
    assert recall >= 0.6, f"IVF-PQ recall too low: {recall}"


def test_pq_adc_approximation_quality(emb, spark):
    """ADC approximate cosine must track exact cosine closely: encode
    the corpus, score every (query, same-cell candidate) both ways."""
    import numpy as np

    from ella_spark.operators.similarity import (
        _collect_queries,
        pq_encode,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    cent = train_ivf_centroids(emb, dim=64, n_centroids=8)
    books = train_pq_codebooks(emb, dim=64, centroids=cent, m_subvectors=16, n_codes=16)
    enc = pq_encode(emb, cent, books).toPandas().set_index("neighbor_id")
    ids, X = _collect_queries(emb, "embedding", "vec_id")
    Xn = {i: v for i, v in zip(ids, X)}
    m, n_codes, sub = books.shape
    errs = []
    for nid, row in enc.head(200).iterrows():
        v = Xn[nid]
        # reconstruct from centroid + codewords, compare true dot with
        # a fixed probe vector (the first corpus vector)
        recon = cent[row.cell].copy()
        for j, c in enumerate(row.codes):
            recon[j * sub : (j + 1) * sub] += books[j][c]
        q = X[0]
        errs.append(abs(float(q @ v) - float(q @ recon)))
    scale = float(np.linalg.norm(X[0])) * float(np.mean([np.linalg.norm(v) for v in X[:50]]))
    # mean absolute dot error under ~12% of the norm product: loose
    # enough for 16-code books, tight enough to catch a broken encode
    assert float(np.mean(errs)) < 0.12 * scale, (np.mean(errs), scale)


def test_pq_compression_accounting(emb):
    """The encoded table must be a fixed small width per vector —
    the 100 TB rationale (SCALING.md 'IVF-PQ memory math')."""
    from ella_spark.operators.similarity import (
        pq_encode,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    cent = train_ivf_centroids(emb, dim=64, n_centroids=8)
    books = train_pq_codebooks(emb, dim=64, centroids=cent, m_subvectors=16, n_codes=16)
    enc = pq_encode(emb, cent, books)
    schema = {f.name: f.dataType.simpleString() for f in enc.schema.fields}
    assert schema == {
        "neighbor_id": "bigint",
        "cell": "int",
        "codes": "array<smallint>",
        "norm": "double",
    }
    first = enc.first()
    assert len(first.codes) == 16  # m bytes of code per vector


def test_ivfpq_vector_index_lifecycle(spark, tmp_path):
    """kind='ivfpq' persists codebooks + the encoded corpus parquet;
    vector_search scans the compact encoded table and re-ranks exact."""
    import pyspark.sql.functions as F

    from ella_spark.engine import Ella
    from ella_spark.operators.similarity import brute_force_topk
    from ella_spark.sources import load_table
    from ella_spark.types import Column

    db = Ella.create(str(tmp_path / "pqdb"), spark)
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    t = db.create_topic(
        "vecs",
        [
            Column("vec_id", "int64", required=True),
            Column("embedding", "float32", row_shape=(64,)),
        ],
    )
    t.insert(
        emb.select((F.col("vec_id") * 1000).alias("time"), "vec_id", "embedding")
    )
    meta = db.create_vector_index("vecs", n_centroids=8, kind="ivfpq")
    assert meta["kind"] == "ivfpq" and meta["m_subvectors"] == 16
    # the encoded corpus parquet exists next to the JSON artifact
    entry = db.store.resolve("vecs")
    enc_dir = db.store.table_path(entry) / "_vector_index" / "embedding.pq"
    assert enc_dir.exists()

    db2 = Ella.open(str(tmp_path / "pqdb"), spark)
    queries = emb.where(F.col("vec_id") < 3)
    rows = db2.vector_search("vecs", queries, k=5, n_probe=4).collect()
    assert {r.query_id for r in rows} == {0, 1, 2}
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {(r.query_id, r.neighbor_id) for r in rows}
    assert len(exact & approx) / len(exact) >= 0.6


def test_ivfpq_extend_index(spark, tmp_path):
    """extend_vector_index appends only not-yet-encoded vectors using
    the existing quantizers; searches then see the new vectors."""
    import pyspark.sql.functions as F

    from ella_spark.engine import Ella
    from ella_spark.sources import load_table
    from ella_spark.types import Column

    db = Ella.create(str(tmp_path / "xdb"), spark)
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    t = db.create_topic(
        "vecs",
        [
            Column("vec_id", "int64", required=True),
            Column("embedding", "float32", row_shape=(64,)),
        ],
    )
    first = emb.where(F.col("vec_id") < 100)
    t.insert(first.select((F.col("vec_id") * 1000).alias("time"), "vec_id", "embedding"))
    db.create_vector_index("vecs", n_centroids=8, kind="ivfpq")
    assert db.extend_vector_index("vecs") == 0  # nothing new yet

    rest = emb.where(F.col("vec_id") >= 100)
    t.insert(rest.select((F.col("vec_id") * 1000).alias("time"), "vec_id", "embedding"))
    n_rest = rest.count()
    assert db.extend_vector_index("vecs") == n_rest
    assert db.extend_vector_index("vecs") == 0  # idempotent

    # a vector only present in the extension is findable
    q = emb.where(F.col("vec_id") == 150)
    rows = db.vector_search("vecs", q, k=5, n_probe=8).collect()
    assert len(rows) == 5 and all(r.query_id == 150 for r in rows)


# ── kNN self-join ────────────────────────────────────────────────────


def test_knn_join_within_cell_exact(spark):
    """knn_join == brute-force kNN restricted to each vector's cell."""
    import numpy as np

    from ella_spark.operators.similarity import knn_join, lloyd_spherical

    rng = np.random.default_rng(7)
    dim, n = 8, 60
    X = rng.normal(size=(n, dim)).astype(np.float64)
    cent = lloyd_spherical(X, 4)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["vec_id"], r["rank"]): r["neighbor_id"]
        for r in knn_join(df, dim=dim, k=3, centroids=cent).collect()
    }
    # Oracle: stable argmax cell assignment, exact cosine within cell.
    Xf = np.stack(
        [np.asarray([np.float32(x) for x in X[i]], dtype=np.float64) for i in range(n)]
    )
    cells = np.argsort(-(Xf @ np.asarray(cent).T), axis=1, kind="stable")[:, 0]
    norms = np.linalg.norm(Xf, axis=1)
    for i in range(n):
        mates = [j for j in range(n) if j != i and cells[j] == cells[i]]
        cos = [(-(Xf[i] @ Xf[j]) / (norms[i] * norms[j]), j) for j in mates]
        for rank, (_, j) in enumerate(sorted(cos)[:3], start=1):
            assert got[(i, rank)] == j, (i, rank)


def test_knn_join_excludes_self_and_caps_k(spark):
    import numpy as np

    from ella_spark.operators.similarity import knn_join, lloyd_spherical

    rng = np.random.default_rng(3)
    X = rng.normal(size=(10, 4))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    rows = knn_join(df, dim=4, k=2, centroids=lloyd_spherical(X, 2)).collect()
    assert all(r["vec_id"] != r["neighbor_id"] for r in rows)
    from collections import Counter

    per = Counter(r["vec_id"] for r in rows)
    assert max(per.values()) <= 2
