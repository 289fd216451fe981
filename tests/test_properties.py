"""Property-based tests (hypothesis): invariants the engine must hold
for arbitrary inputs — a deliberate step beyond the reference's test
surface (SURVEY.md §5: 6 unit tests, no property/golden corpus).

Spark sessions are expensive, so strategies draw whole row-batches and
each property runs a bounded number of examples against the
module-scoped session.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ella_spark import Column, Ella

# bounded, deterministic example counts: each example spins Spark jobs
_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_floats = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
)
_times = st.integers(min_value=0, max_value=2**62)


@pytest.fixture()
def db(spark, tmp_path):
    return Ella.create(str(tmp_path / "propdb"), spark)


@given(
    rows=st.lists(st.tuples(_times, _floats, st.text(max_size=20)), max_size=40)
)
@_SETTINGS
def test_publish_roundtrip_sorted(spark, tmp_path, rows):
    """Publisher round-trip: every published row reads back exactly
    once, globally ordered by time (topic primary-index invariant,
    info.rs:409-412)."""
    import uuid

    db = Ella.create(str(tmp_path / f"p{uuid.uuid4().hex[:8]}"), spark)
    topic = db.create_topic(
        "t", [Column("v", "float64"), Column("s", "string")]
    )
    with topic.publish(capacity=7) as pub:  # force multi-shard flushes
        for t, v, s in rows:
            pub.write(t, v, s)
    got = topic.read(spark).orderBy("time", "v").collect()
    want = sorted(rows, key=lambda r: (r[0], r[1]))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g.time == w[0]
        assert math.isclose(g.v, w[1], rel_tol=1e-12, abs_tol=1e-12)
        assert g.s == w[2]
    times = [g.time for g in topic.read(spark).orderBy("time").collect()]
    assert times == sorted(times)


@given(
    data=st.lists(
        st.lists(_floats, min_size=6, max_size=6), min_size=1, max_size=20
    )
)
@_SETTINGS
def test_tensor_column_roundtrip_property(spark, tmp_path, data):
    """Tensor columns: (2,3)-shaped rows round-trip bit-exact through
    flatten -> parquet -> read -> Lazy.col restack (column.rs:137-178
    behavioral parity)."""
    import uuid

    import numpy as np

    db = Ella.create(str(tmp_path / f"t{uuid.uuid4().hex[:8]}"), spark)
    topic = db.create_topic("tz", [Column("m", "float64", row_shape=(2, 3))])
    with topic.publish() as pub:
        for i, flat in enumerate(data):
            pub.write(i * 1000, np.array(flat).reshape(2, 3))
    out = db.query("SELECT m FROM tz ORDER BY time").col("m")
    assert out.shape == (len(data), 6)
    np.testing.assert_array_equal(out, np.array(data))


@given(
    vals=st.lists(
        st.integers(min_value=-(2**31), max_value=2**31 - 1),
        min_size=1,
        max_size=50,
    )
)
@_SETTINGS
def test_insert_then_query_agg_matches_python(spark, tmp_path, vals):
    """SQL over a topic computes the same aggregate Python does."""
    import uuid

    db = Ella.create(str(tmp_path / f"a{uuid.uuid4().hex[:8]}"), spark)
    db.create_topic("nums", [Column("v", "int64")])
    values = ", ".join(f"({t * 1000}, CAST({v} AS BIGINT))" for t, v in enumerate(vals))
    db.query(f"INSERT INTO nums VALUES {values}").execute()
    out = db.query(
        "SELECT count(*) AS n, sum(v) AS s, min(v) AS lo, max(v) AS hi FROM nums"
    ).execute()
    assert out["n"].iloc[0] == len(vals)
    assert out["s"].iloc[0] == sum(vals)
    assert out["lo"].iloc[0] == min(vals)
    assert out["hi"].iloc[0] == max(vals)


@given(
    times=st.lists(
        st.integers(min_value=-(3 * 86_400 * 10**9), max_value=3 * 86_400 * 10**9),
        min_size=1,
        max_size=40,
    )
)
@_SETTINGS
def test_bucket_split_preserves_rows(spark, tmp_path, times):
    """Publisher bucket-splitting invariants for arbitrary (incl.
    negative) times: every row survives, every shard sits in the dir
    matching its rows' day bucket, shards stay time-sorted."""
    import uuid

    import pyarrow.parquet as pq

    from ella_spark.topic import DAY_NS

    db = Ella.create(str(tmp_path / f"b{uuid.uuid4().hex[:8]}"), spark)
    topic = db.create_topic("bsplit", [Column("v", "int64")])
    with topic.publish(capacity=10_000) as pub:
        for i, t in enumerate(times):
            pub.write(t, i)
    got = db.query("SELECT time, v FROM bsplit ORDER BY time, v").execute()
    assert sorted(got["time"]) == sorted(times)
    for shard in topic.shards():
        bucket = int(shard.parent.name.split("=")[1])
        t_col = pq.read_table(shard, columns=["time"])["time"].to_pylist()
        assert t_col == sorted(t_col)
        assert all(t // DAY_NS == bucket for t in t_col)


def test_concurrent_publishers(spark, tmp_path):
    """Two publishers appending concurrently never lose rows (shards
    are uuid-named, writes are atomic per file)."""
    import threading
    import uuid

    db = Ella.create(str(tmp_path / f"c{uuid.uuid4().hex[:8]}"), spark)
    topic = db.create_topic("conc", [Column("v", "int64")])

    def writer(offset: int):
        with topic.publish(capacity=7) as pub:
            for i in range(100):
                pub.write((offset + i) * 1_000, offset + i)

    ts = [threading.Thread(target=writer, args=(o,)) for o in (0, 1_000_000)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    out = db.query("SELECT count(*) AS n, count(DISTINCT v) AS d FROM conc").execute()
    assert out["n"].iloc[0] == 200 and out["d"].iloc[0] == 200


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 60)),
        min_size=0,
        max_size=80,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """Star-contraction CC equals a union-find oracle on arbitrary
    graphs (self-loops, duplicates, isolated nodes included)."""
    from ella_spark.operators.graph import connected_components

    nodes = list(range(61))
    parent = {u: u for u in nodes}

    def find(u):
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {u: find(u) for u in nodes}

    ndf = spark.createDataFrame([(u,) for u in nodes], "id long")
    edf = spark.createDataFrame(
        [(a, b) for a, b in edges] or [], "src long, dst long"
    )
    got = {
        r["id"]: r["component"] for r in connected_components(ndf, edf).collect()
    }
    assert got == expected


# ── Bloom filters (pure python, no Spark) ────────────────────────────


@settings(max_examples=200, deadline=None, derandomize=True)
@given(
    vals=st.lists(
        st.one_of(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.text(max_size=12),
            st.floats(allow_nan=False, allow_infinity=False),
        ),
        max_size=80,
    ),
    probe=st.one_of(st.integers(), st.text(max_size=12)),
)
def test_bloom_never_false_negative(vals, probe):
    """The soundness contract skipping relies on: every inserted value
    (any supported type, any fpp sizing) ALWAYS probes positive."""
    from ella_spark.bloom import bloom_build, bloom_might_contain

    b = bloom_build(vals)
    for v in vals:
        if v is not None:
            assert bloom_might_contain(b, v)
    # arbitrary probes must never crash (True or False both fine)
    assert bloom_might_contain(b, probe) in (True, False)


@settings(max_examples=100, deadline=None, derandomize=True)
@given(
    ints=st.lists(st.integers(min_value=-(10**9), max_value=10**9), max_size=40)
)
def test_bloom_coercion_is_equality_compatible(ints):
    """coerce_for funnels int probes into a float column's value set:
    v and float(v) must land on the same bloom key."""
    from ella_spark.bloom import bloom_build, bloom_might_contain, coerce_for

    b = bloom_build([coerce_for("float64", v) for v in ints])
    for v in ints:
        assert bloom_might_contain(b, coerce_for("float64", v))


# ── PageRank fixed-point (random graphs vs python reference) ─────────


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=3, max_value=40),
    extra=st.lists(
        st.tuples(st.integers(0, 39), st.integers(0, 39)), max_size=30
    ),
    iters=st.integers(min_value=1, max_value=5),
)
def test_pagerank_fixed_point_matches_reference(spark, n, extra, iters):
    """Random symmetrized graphs: the distributed integer fixed-point
    PageRank equals the sequential python reference bit-for-bit (the
    determinism contract the chained-CTE oracle relies on)."""
    import math

    from ella_spark.operators.graph import pagerank

    raw = {(i, (i + 1) % n) for i in range(n)}
    raw |= {(a % n, b % n) for a, b in extra if a % n != b % n}
    edges = sorted(raw | {(b, a) for a, b in raw})

    out: dict[int, list[int]] = {}
    for a, b in edges:
        out.setdefault(a, []).append(b)
    nn = len(out)
    pr = {u: math.floor(10**12 / nn) for u in out}
    base = math.floor((1.0 - 0.85) * float(10**12) / float(nn))
    for _ in range(iters):
        s: dict[int, int] = {}
        for u, nbrs in out.items():
            c = math.floor(pr[u] / len(nbrs))
            for v in nbrs:
                s[v] = s.get(v, 0) + c
        pr = {v: base + math.floor(0.85 * float(sv)) for v, sv in s.items()}

    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["pr"] for r in pagerank(edf, iters=iters).collect()}
    assert got == pr


class _FakeGroupState:
    """Minimal GroupState stand-in for driving stateful updaters
    outside a streaming query (exists/get/update are the only members
    the updaters touch)."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


@settings(max_examples=200, deadline=None, derandomize=True)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),
            st.floats(
                allow_nan=False, allow_infinity=False,
                min_value=-1e6, max_value=1e6,
            ),
        ),
        min_size=1,
        max_size=60,
    ),
    cuts=st.lists(
        st.integers(min_value=0, max_value=60), max_size=5
    ),
    gap=st.integers(min_value=1, max_value=50),
)
def test_sessionize_fold_matches_sequential_reference(events, cuts, gap):
    """Random event streams split at random points into 'micro-batches'
    (fed in time order, the operator's documented contract): the
    stateful sessionize fold's closed sessions + final open state must
    equal a sequential one-pass sessionization of the full stream —
    across every batch boundary placement, duplicate timestamps, and
    gap size. Pure pandas: no Spark job per example."""
    import pandas as pd

    from ella_spark.streaming.stateful import make_session_updater

    events = sorted(events, key=lambda e: e[0])

    # sequential reference over the whole stream
    want = []
    for t, v in events:
        if not want or t - want[-1][2] > gap:
            want.append([len(want) + 1, t, t, 1, float(v)])
        else:
            s = want[-1]
            s[2] = max(s[2], t)
            s[3] += 1
            s[4] += float(v)

    # stream fold over arbitrary time-ordered batch splits
    bounds = sorted({c for c in cuts if c < len(events)})
    idx = [0] + bounds + [len(events)]
    update = make_session_updater(gap)
    state = _FakeGroupState()
    closed = []
    for a, b in zip(idx, idx[1:]):
        chunk = events[a:b]
        pdf = pd.DataFrame(
            {"_t": [t for t, _ in chunk], "_v": [v for _, v in chunk]}
        )
        for out in update(("k",), iter([pdf]), state):
            closed.extend(
                [
                    (int(r.session_seq), int(r.start_ns), int(r.end_ns),
                     int(r.n_events), float(r.value_sum))
                    for r in out.itertuples()
                ]
            )
    seq, start, last, n, vsum = state.get
    got = closed + (
        [(int(seq), int(start), int(last), int(n), float(vsum))]
        if start is not None
        else []
    )
    assert got == [tuple(s) for s in want]


# ── KMV monitor fold arithmetic (pure numpy, no Spark) ──────────────

_hash_lists = st.lists(
    st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=60
)


@settings(max_examples=200, deadline=None, derandomize=True)
@given(
    batches=st.lists(_hash_lists, min_size=1, max_size=6),
    k=st.integers(min_value=2, max_value=24),
)
def test_kmv_fold_equals_one_shot_bottom_k(batches, k):
    """The incremental per-batch fold the streaming monitors run
    (merged = union re-cut at k, state := merged) must land on EXACTLY
    the one-shot bottom-k sketch of the concatenated history, for any
    batch split and any k — the invariant behind every snapshot,
    seed restore, and batch-vs-stream pinning in the KMV family."""
    import numpy as np

    ref = np.array([], dtype=np.int64)
    seen = []
    for batch in batches:
        h = np.asarray(batch, dtype=np.int64)
        hu = np.unique(h)
        ref = np.union1d(ref, hu)[:k]
        seen.extend(batch)
    one_shot = np.unique(np.asarray(seen, dtype=np.int64))[:k]
    assert ref.tolist() == one_shot.tolist()


@settings(max_examples=200, deadline=None, derandomize=True)
@given(
    hist=_hash_lists,
    batch=_hash_lists,
)
def test_kmv_scores_exact_regime_equal_true_set_arithmetic(hist, batch):
    """With k >= every distinct count the sketches hold ALL hashes, so
    the monitors' estimates must equal TRUE set arithmetic exactly:
    cardinality's est_distinct/est_new are the real distinct counts,
    churn's jaccard/containment are the real set ratios — the
    exact-when-fits contract, property-checked over arbitrary
    multisets via the very functions the stream fold calls."""
    import numpy as np

    from ella_spark.streaming.stateful import (
        _cardinality_score,
        _churn_score,
        _kmv_scalar_estimate,
    )

    hs, bs = set(hist), set(batch)
    k = len(hs | bs) + 1  # everything fits: exact regime everywhere
    est = lambda hashes, cnt: _kmv_scalar_estimate(hashes, cnt, k)

    ref = np.unique(np.asarray(hist, dtype=np.int64))[:k]
    hu = np.unique(np.asarray(batch, dtype=np.int64))
    merged = np.union1d(ref, hu)[:k]

    card = _cardinality_score(ref, hu, merged, len(batch), est)
    assert card["est_distinct"] == float(len(hs | bs))
    assert card["est_new"] == float(len(bs - hs))
    assert card["dup_rate"] == min(
        max(1.0 - len(bs - hs) / len(batch), 0.0), 1.0
    )

    churn = _churn_score(k)(ref, hu, merged, len(batch), est)
    assert churn["est_batch"] == float(len(bs))
    assert churn["est_union"] == float(len(hs | bs))
    assert churn["jaccard"] == len(hs & bs) / len(hs | bs)
    # containment = inter_est / est_batch with exact operands
    assert abs(
        churn["containment"]
        - min((len(hs & bs) / len(hs | bs)) * len(hs | bs) / len(bs), 1.0)
    ) < 1e-12
    assert churn["novelty"] == max(1.0 - churn["containment"], 0.0)


@settings(max_examples=200, deadline=None, derandomize=True)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x10FFFF,
                                   blacklist_categories=("Cs",)),
            min_size=8,
            max_size=40,
        ),
        min_size=1,
        max_size=6,
    ),
    split=st.integers(min_value=0, max_value=6),
    num_hashes=st.integers(min_value=2, max_value=64),
)
def test_minhash_union_law_holds_for_any_split(texts, split, num_hashes):
    """The invariant behind minhash_drift_per_group's state fold: the
    MinHash signature of a document-set UNION equals the slotwise min
    of the parts' signatures, for ANY split of the corpus and ANY
    num_hashes — so folding per-batch signatures into history is
    value-identical to signing the whole history at once. Driven
    through the REAL production kernels (_kgram_hashes + _mix64 over
    arbitrary Unicode incl. supplementary-plane code points), not a
    model of them; also pins the degenerate edges (no shingleable
    text on one side)."""
    import numpy as np

    from ella_spark.operators.dedup import _kgram_hashes, _mix64

    k = 8
    seeds = _mix64(np.arange(1, num_hashes + 1, dtype=np.uint64))

    def sig_of(shingle_sets):
        hs = [h for h in shingle_sets if h.shape[0]]
        if not hs:
            return None
        u = np.unique(np.concatenate(hs))
        return _mix64(u[None, :] ^ seeds[:, None]).min(axis=1)

    shingles = [_kgram_hashes(t.strip().lower(), k) for t in texts]
    i = min(split, len(shingles))
    a, b = shingles[:i], shingles[i:]
    whole = sig_of(shingles)
    sa, sb = sig_of(a), sig_of(b)
    if whole is None:
        assert sa is None and sb is None
        return
    if sa is None:
        merged = sb
    elif sb is None:
        merged = sa
    else:
        merged = np.minimum(sa, sb)
    assert merged is not None and np.array_equal(whole, merged)
    # the agreement estimator is exactly 1.0 iff the two sides have
    # identical signatures — the replay-detection contract the monitor
    # asserts in the stream tests
    if sa is not None and sb is not None and np.array_equal(sa, sb):
        assert float(np.mean(sa == sb)) == 1.0

    # the containment estimator's invariants (r14, the r13-advice
    # batch-normalized score): for ANY batch B scored against ANY
    # history H via C = agree(B,H)/max(agree(B,min(B,H)), 1/NH),
    #  (1) C <= 1 and C >= J (agree(B,H) counts a subset of the
    #      slots agree(B,merged) counts);
    #  (2) when B ⊆ H (the replay/pure-subset case the advice is
    #      about) merged == sig(H), so numerator == denominator and
    #      C == 1.0 exactly whenever ANY slot agrees — regardless of
    #      how much larger H is than B.
    def containment(sb_, sh_):
        a = float(np.mean(sb_ == sh_))
        b_ = float(np.mean(sb_ == np.minimum(sb_, sh_)))
        return a, min(a / max(b_, 1.0 / num_hashes), 1.0)

    if sa is not None and sb is not None:
        j, c = containment(sa, sb)
        assert 0.0 <= c <= 1.0 and c >= j
    if sa is not None:  # first `i` texts are a strict subset of all
        j, c = containment(sa, whole)
        assert c == (1.0 if j > 0.0 else 0.0)
