"""Incremental cross-corpus dedup (operators/incremental_dedup.py).

Planted-duplicate corpus: the index is built over a corpus slice, a
new batch containing exact copies, near copies (small edits), and
fresh documents is deduped against it WITHOUT touching corpus text.
"""

from __future__ import annotations

import random

import pytest

from ella_spark.operators.incremental_dedup import DedupIndex

_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua enim minim veniam"
).split()


def _doc(rng: random.Random, n: int = 80) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _edit(rng: random.Random, text: str, n_edits: int = 3) -> str:
    words = text.split()
    for _ in range(n_edits):
        words[rng.randrange(len(words))] = rng.choice(_WORDS)
    return " ".join(words)


@pytest.fixture(scope="module")
def corpus_batch(spark):
    rng = random.Random(42)
    corpus = [(i, _doc(rng)) for i in range(40)]
    batch = (
        # exact copies of corpus docs 0-4
        [(100 + i, corpus[i][1]) for i in range(5)]
        # near copies (3 word edits in 80 words → jaccard >~ 0.85)
        + [(200 + i, _edit(rng, corpus[5 + i][1])) for i in range(5)]
        # fresh documents
        + [(300 + i, _doc(rng)) for i in range(10)]
    )
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    return mk(corpus), mk(batch)


@pytest.fixture(scope="module")
def index(corpus_batch, tmp_path_factory):
    corpus, _ = corpus_batch
    return DedupIndex.build(
        corpus, tmp_path_factory.mktemp("dedup_idx"), num_hashes=32
    )


def test_exact_matches(index, corpus_batch):
    _, batch = corpus_batch
    got = {r.doc_id: r.exact_dup_of for r in index.exact_matches(batch).collect()}
    assert got == {100 + i: i for i in range(5)}


def test_near_matches_recall_and_precision(index, corpus_batch):
    _, batch = corpus_batch
    got = {
        r.doc_id: (r.near_dup_of, r.est_jaccard)
        for r in index.near_matches(batch, threshold=0.5).collect()
    }
    # every exact copy and every near copy finds its source
    for i in range(5):
        assert got[100 + i][0] == i
        assert got[100 + i][1] == 1.0
    for i in range(5):
        assert got[200 + i][0] == 5 + i, f"near copy 20{i} missed"
        assert got[200 + i][1] >= 0.5
    # fresh docs stay clean (word soup from one vocab CAN collide on a
    # band; require none at this size)
    assert all(d < 300 for d in got)


def test_dedup_against_and_extend(index, corpus_batch, spark):
    _, batch = corpus_batch
    out = index.dedup_against(batch, threshold=0.5)
    uniq = out.where("is_unique").select("doc_id", "text")
    assert sorted(r.doc_id for r in uniq.collect()) == [300 + i for i in range(10)]

    # admit the unique docs; a re-run of the SAME batch now flags them
    index.extend(uniq)
    out2 = index.dedup_against(batch, threshold=0.5)
    assert out2.where("is_unique").count() == 0
    flagged = {
        r.doc_id: r.exact_dup_of
        for r in out2.where("exact_dup_of IS NOT NULL").collect()
    }
    # fresh docs now match their own admitted copies
    for i in range(10):
        assert flagged[300 + i] == 300 + i


def test_index_reopen(index, corpus_batch):
    _, batch = corpus_batch
    reopened = DedupIndex(index.path)
    assert reopened.num_hashes == 32
    # the index was extended by the previous test; the original planted
    # exact copies must still resolve through the reopened handle
    got = {r.doc_id: r.exact_dup_of for r in reopened.exact_matches(batch).collect()}
    for i in range(5):
        assert got[100 + i] == i


def test_version_guard(tmp_path):
    import json

    (tmp_path / "meta.json").write_text(json.dumps({"version": 99}))
    with pytest.raises(ValueError, match="version"):
        DedupIndex(tmp_path)


def test_short_docs_never_fake_near_dups(spark, tmp_path):
    """Docs shorter than shingle_k must not band-collide via the
    degenerate empty-shingle signature; exact digests still catch
    their true copies."""
    corpus = spark.createDataFrame(
        [(0, "ab"), (1, "cd"), (2, "a proper length document here")],
        "doc_id long, text string",
    )
    idx = DedupIndex.build(corpus, tmp_path / "short_idx", shingle_k=8)
    batch = spark.createDataFrame(
        [(10, "xy"), (11, "ab")], "doc_id long, text string"
    )
    near = idx.near_matches(batch, threshold=0.1).collect()
    assert near == []  # no signature-based matches for short docs
    out = idx.dedup_against(batch)
    got = {r.doc_id: (r.exact_dup_of, r.is_unique) for r in out.collect()}
    assert got[11] == (0, False)  # exact copy still flagged via digest
    assert got[10] == (None, True)


def test_dedup_stream_matches_batch(spark, tmp_path):
    """dedup_stream on a live doc topic: stream-static annotation
    against the persisted index agrees with the batch dedup_against
    exact path, plus candidate-level near flags."""
    import random

    from ella_spark.engine import Ella
    from ella_spark.operators.incremental_dedup import dedup_stream
    from ella_spark.types import Column

    rng = random.Random(7)
    corpus_rows = [(i, _doc(rng)) for i in range(20)]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    idx = DedupIndex.build(corpus, tmp_path / "sidx", num_hashes=32)

    db = Ella.create(str(tmp_path / "sdb"), spark)
    topic = db.create_topic(
        "sdocs",
        [Column("doc_id", "int64", required=True), Column("text", "string")],
    )
    batch_rows = (
        [(100, corpus_rows[0][1])]            # exact copy
        + [(101, _edit(rng, corpus_rows[1][1]))]  # near copy
        + [(102, _doc(rng)), (103, "xy")]     # fresh + sub-shingle
    )
    with topic.publish() as pub:
        for i, (did, text) in enumerate(batch_rows):
            pub.write(i * 1_000_000_000, did, text)

    out = dedup_stream(idx, db.subscribe("sdocs"))
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            str(db.store.meta_dir / "checkpoints" / "dedup_stream_out"),
        )
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (r.exact_dup_of, r.near_candidate, r.is_clean)
        for r in spark.sql("SELECT * FROM dedup_stream_out").collect()
    }
    assert got[100] == (0, True, False)       # exact dup (and band hit)
    assert got[101][0] is None and got[101][1]  # near candidate only
    assert got[102] == (None, False, True)    # clean
    assert got[103] == (None, False, True)    # sub-shingle: digest-only path
