"""FIXTURES.md parity sweeps: F2 (tensor topic incl. string tensors +
duration), F4 (full type-system sweep), F5 (events replay ingest)."""

from __future__ import annotations

import numpy as np
import pytest

from ella_spark import Column, Ella


@pytest.fixture()
def db(spark, tmp_path):
    return Ella.create(str(tmp_path / "fdb"), spark)


def test_f2_pubsub_tensor_topic(db):
    """pubsub.rs:43-48 schema: i int32, dt duration, x float32[512],
    y string[2,2]."""
    topic = db.create_topic(
        "point",
        [
            Column("i", "int32"),
            Column("dt", "duration"),
            Column("x", "float32", row_shape=(512,)),
            Column("y", "string", row_shape=(2, 2)),
        ],
    )
    with topic.publish() as pub:
        for i in range(20):
            pub.write(
                i * 1_000,
                i,
                i * 10,
                np.linspace(i, i + 1, 512, dtype=np.float32),
                np.array([["a", "b"], [f"c{i}", "d"]]),
            )
    out = db.query("SELECT i, dt, x, y FROM point ORDER BY time").execute()
    assert len(out) == 20
    assert out["dt"].tolist() == [i * 10 for i in range(20)]
    np.testing.assert_allclose(
        np.asarray(out["x"].iloc[3], dtype=np.float32),
        np.linspace(3, 4, 512, dtype=np.float32),
    )
    assert list(out["y"].iloc[5]) == ["a", "b", "c5", "d"]
    # Lazy.col returns stacked tensor restoring nothing but flat shape
    x = db.query("SELECT x FROM point ORDER BY time").col("x")
    assert x.shape == (20, 512)


def test_f4_type_sweep(db):
    """One column per TensorType; nulls except time; u64 > i64::MAX."""
    cols = [
        Column("c_bool", "bool"),
        Column("c_i8", "int8"),
        Column("c_i16", "int16"),
        Column("c_i32", "int32"),
        Column("c_i64", "int64"),
        Column("c_u8", "uint8"),
        Column("c_u16", "uint16"),
        Column("c_u32", "uint32"),
        Column("c_u64", "uint64"),
        Column("c_f32", "float32"),
        Column("c_f64", "float64"),
        Column("c_dur", "duration"),
        Column("c_str", "string"),
    ]
    topic = db.create_topic("types_full", cols)
    big = (1 << 63) + 7  # > i64::MAX proves widening
    with topic.publish() as pub:
        pub.write(1_000, True, -8, -16, -32, -64, 255, 65535, 4294967295, big,
                  0.5, 0.25, 123456789, "s1")
        pub.write(2_000, *([None] * 13))
    out = db.query(
        "SELECT * FROM types_full ORDER BY time"
    ).execute()
    r = out.iloc[0]
    assert bool(r.c_bool) is True
    assert (r.c_i8, r.c_i16, r.c_i32, r.c_i64) == (-8, -16, -32, -64)
    assert (r.c_u8, r.c_u16, r.c_u32) == (255, 65535, 4294967295)
    assert int(r.c_u64) == big
    assert (r.c_f32, r.c_f64) == (0.5, 0.25)
    assert r.c_dur == 123456789 and r.c_str == "s1"
    assert out.iloc[1].c_str is None
    # aggregates work across widened types
    agg = db.query(
        "SELECT max(c_u64) AS mx, sum(c_u32) AS s32, min(c_bool) AS mb FROM types_full"
    ).execute()
    assert int(agg["mx"].iloc[0]) == big


def test_f5_events_replay(db, spark):
    """Replay driver events.parquet through the publisher; batch query
    over the topic must equal the original file exactly."""
    from ella_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").toPandas()
    topic = db.create_topic(
        "events_replayed",
        [
            Column("event_id", "int64"),
            Column("user_id", "int64"),
            Column("event_type", "string"),
            Column("value", "float64"),
            Column("props", "string"),
        ],
    )
    src = ev.rename(columns={"ts": "time"})[
        ["time", "event_id", "user_id", "event_type", "value", "props"]
    ]
    pub = topic.publish(capacity=256)
    pub.write_batch(src)
    pub.close()
    # each 256-row flush yields one shard per day bucket it spans
    # (time-bucket layout): at least one shard per flush, all bucketed
    assert len(topic.shards()) >= int(np.ceil(len(src) / 256))
    assert topic.bucket_dirs() and not list(topic.path.glob("part-*.parquet"))
    out = db.query(
        "SELECT time, event_id, user_id, event_type, value, props "
        "FROM events_replayed ORDER BY event_id"
    ).execute()
    assert len(out) == len(src)
    src_sorted = src.sort_values("event_id", ignore_index=True)
    assert out["time"].tolist() == src_sorted["time"].tolist()
    assert out["value"].tolist() == src_sorted["value"].tolist()
    assert out["event_type"].tolist() == src_sorted["event_type"].tolist()
    # time-ordered within each shard (writer sorting parity)
    import pyarrow.parquet as pq

    for shard in topic.shards():
        t = pq.read_table(shard, columns=["time"])["time"].to_pylist()
        assert t == sorted(t)


def test_quality_classifier_direction(spark):
    """The pinned-weight classifier must separate the target class
    directionally (the synthetic corpus's shared 31-word vocabulary
    bounds accuracy; the op pins the mechanism, not a benchmark)."""
    from tests.conftest import SF_ORACLE

    from ella_spark.queries import all_queries
    from ella_spark.sources import load_table

    pdf = all_queries()["q_quality_classifier"](spark, SF_ORACLE).toPandas()
    langs = (
        load_table(spark, SF_ORACLE, "documents")
        .select("doc_id", "lang")
        .toPandas()
    )
    m = pdf.merge(langs, on="doc_id")
    assert m[m.lang == "en"].p_quality.mean() > m[m.lang != "en"].p_quality.mean()
    assert (m.p_quality.between(0, 1)).all()


def test_bench_lists_resolve_in_registry():
    """Every HEADLINE/EXTRAS name in bench.py must be a registered
    query — a typo here would crash the driver's per-round bench."""
    import bench

    from ella_spark.queries import REGISTRY, _load

    _load()
    missing = [
        n for n in bench.HEADLINE + bench.EXTRAS if n not in REGISTRY
    ]
    assert not missing, missing
    # and the lists stay duplicate-free
    allq = bench.HEADLINE + bench.EXTRAS
    assert len(allq) == len(set(allq))


def test_rotation_tier_names_resolve_in_registry():
    """Rotation tier sets must reference real queries — a stale name
    silently mis-ranks the checked-50 prefix."""
    from ella_spark import queries as Q

    Q._load()
    tiers = Q._TIERS
    for tier in tiers:
        missing = [n for n in tier if n not in Q.REGISTRY]
        assert not missing, missing
    # tiers are disjoint (a name in two tiers would rank ambiguously)
    for i, a in enumerate(tiers):
        for b in tiers[i + 1 :]:
            assert not (a & b), a & b
    # the checked-50 prefix starts with every never-green name
    # (tiers[0], the derived rank-0 set) plus the whole oldest-green
    # tier (tiers[1]), and contains no no-oracle name (they can never
    # hash-verify). NOTE: tiers[1] ⊆ prefix encodes the CAPACITY
    # assumption |tiers[0]| + |tiers[1]| <= 50 — a red here can mean
    # the never-green set grew past the budget, not only staleness
    # (the budget trip-wire below localizes which).
    names = list(Q.all_queries())[:50]
    oracles = Q.all_oracles()
    assert tiers[0] <= set(names)  # never-green: first driver row
    assert tiers[1] <= set(names)  # oldest-green (due) tier
    assert all(n in oracles for n in names)


def test_readme_counts_match_registry():
    """README's '<N> registry queries, <M> of them hash-checked'
    claim must track len(all_queries())/len(all_oracles()) — the
    round-7 verdict flagged a 180/175-vs-179/174 docs drift."""
    import re
    from pathlib import Path

    from ella_spark.queries import all_oracles, all_queries

    text = Path(__file__).resolve().parents[1].joinpath("README.md").read_text()
    m = re.search(r"\((\d+) registry\s+queries, (\d+) of them hash-checked", text)
    assert m, "README registry-count sentence not found"
    assert (int(m.group(1)), int(m.group(2))) == (
        len(all_queries()),
        len(all_oracles()),
    ), "README counts drifted from the registry — update README.md"


def test_checked_prefix_staleness_bound():
    """Executable rotation invariant (VERDICT r8 #6): with 183
    oracle-paired queries and a 50-query driver budget, hand-recomputed
    tier sets can silently let a name's newest driver green age out.
    Recompute staleness from the CORRECTNESS_r*.json files on disk:
    every oracle-paired name OUTSIDE the current checked-50 prefix must
    have a hash-green no older than 3 rounds (names inside the prefix
    are about to be re-greened; never-green names must be in the
    prefix so they get their first driver row). Fails = recompute the
    tier sets in queries/__init__.py for this round."""
    import json
    import re
    from pathlib import Path

    from ella_spark.queries import REGISTRY, all_queries

    repo = Path(__file__).resolve().parents[1]
    newest: dict[str, int] = {}
    rounds = []
    for p in sorted(repo.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r0*(\d+)", p.stem)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        for name, rec in json.loads(p.read_text()).items():
            if isinstance(rec, dict) and rec.get("hash_match"):
                newest[name] = max(newest.get(name, 0), rnd)
    assert rounds, "no CORRECTNESS_r*.json found"
    current_round = max(rounds) + 1  # the round being built now

    names = list(all_queries())
    prefix = set(names[:50])
    MAX_STALE = 3
    offenders = {}
    for name in names[50:]:
        if REGISTRY[name].oracle is None:
            continue  # no hash verdict possible; pytest-pinned
        green = newest.get(name)
        if green is None:
            offenders[name] = "never driver-green and not in prefix"
        elif current_round - green > MAX_STALE:
            offenders[name] = f"newest green r{green}, {current_round - green} rounds stale"
    assert not offenders, (
        f"stale-beyond-{MAX_STALE} oracle-paired names outside the "
        f"checked-50 prefix (recompute tier sets): {offenders}"
    )


def test_next_round_rotation_budget_feasible():
    """Executable registry-growth budget (VERDICT r9 #2): with 191+
    oracle-paired names, a 50-slot driver prefix, and MAX_STALE=3,
    the rotation only stays satisfiable if each round's due tier
    (names that would become 4 rounds stale outside the prefix) fits
    in 50 slots. Simulate the NEXT round: assume the driver greens
    exactly this round's checked-50 prefix, advance one round, and
    recompute the due tier. Fails = this round added more new
    oracle-paired queries than the rotation can ever re-check — remove
    additions or raise the driver budget."""
    import json
    import re
    from pathlib import Path

    from ella_spark.queries import REGISTRY, all_queries

    repo = Path(__file__).resolve().parents[1]
    newest: dict[str, int] = {}
    rounds = []
    for p in sorted(repo.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r0*(\d+)", p.stem)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        for name, rec in json.loads(p.read_text()).items():
            if isinstance(rec, dict) and rec.get("hash_match"):
                newest[name] = max(newest.get(name, 0), rnd)
    assert rounds, "no CORRECTNESS_r*.json found"
    current_round = max(rounds) + 1
    MAX_STALE, BUDGET = 3, 50

    names = list(all_queries())
    oracle_paired = [n for n in names if REGISTRY[n].oracle is not None]
    # this round's prefix gets greened at round `current_round`
    simulated = dict(newest)
    for n in names[:BUDGET]:
        simulated[n] = current_round
    # next round: the due tier = oracle-paired names that would exceed
    # MAX_STALE outside the prefix (green <= next_round - MAX_STALE - 1)
    # plus any never-green name (must get its first driver row).
    next_round = current_round + 1
    due = [
        n
        for n in oracle_paired
        if simulated.get(n) is None
        or next_round - simulated[n] > MAX_STALE
    ]
    assert len(due) <= BUDGET, (
        f"next round's due tier has {len(due)} names but only {BUDGET} "
        f"prefix slots — the rotation is unsatisfiable; this round must "
        f"not add more oracle-paired queries (due: {sorted(due)[:10]}...)"
    )
    # and the total registry must fit the steady-state capacity:
    # (MAX_STALE + 1) rounds x BUDGET slots re-checks every name in time
    assert len(oracle_paired) <= (MAX_STALE + 1) * BUDGET, (
        f"{len(oracle_paired)} oracle-paired queries exceed the "
        f"{(MAX_STALE + 1) * BUDGET}-name rotation capacity"
    )


def test_rotation_derivation_matches_r11_audit():
    """Ground-truth pin for the dynamic rotation PARSER (round 11):
    parsing EXACTLY the CORRECTNESS_r01..r10 files must reproduce the
    hand-audited newest-green map behind the last manually recomputed
    rotation (verified green by the r10 verdict + the r11 trip-wires).
    Deliberately decoupled from the LIVE registry (no REGISTRY reads):
    a future query rename/removal is a legitimate registry change and
    must not break the parser pin. The pinned file list means a later
    round's file landing on disk cannot drift the comparison either;
    the staleness/budget trip-wires guard the live result."""
    import hashlib
    from collections import Counter
    from pathlib import Path

    from ella_spark import queries as Q

    repo = Path(__file__).resolve().parents[1]
    files = [repo / f"CORRECTNESS_r{i:02d}.json" for i in range(1, 11)]
    assert all(f.exists() for f in files)
    newest = Q._newest_greens(files)

    # the full hand-audited map: 198 names ever hash-green through
    # r10, newest-green histogram r7:48 r8:50 r9:50 r10:50
    assert len(newest) == 198
    assert dict(sorted(Counter(newest.values()).items())) == {
        7: 48, 8: 50, 9: 50, 10: 50,
    }
    blob = ",".join(f"{n}={r}" for n, r in sorted(newest.items()))
    assert (
        hashlib.md5(blob.encode()).hexdigest()
        == "52d59113b55c3105016e8915f55b1007"
    )
    # spot pins readable without the hash
    assert "q_dedup_winnow_fast" not in newest  # never checked <= r10
    assert newest["q_ann_lsh"] == 7 and newest["q1_pricing_summary"] == 10


def test_rotation_derivation_tolerates_malformed_correctness_files(tmp_path):
    """The import-time rotation parser must never break the driver on
    an unreadable, malformed, or shape-shifted CORRECTNESS file — a
    truncated write or a list-shaped payload is skipped, valid files
    still count."""
    import json

    from ella_spark import queries as Q

    good = tmp_path / "CORRECTNESS_r03.json"
    good.write_text(json.dumps({"q_x": {"hash_match": True}}))
    truncated = tmp_path / "CORRECTNESS_r04.json"
    truncated.write_text('{"q_y": {"hash_ma')  # mid-write crash shape
    listy = tmp_path / "CORRECTNESS_r05.json"
    listy.write_text(json.dumps(["q_z"]))  # valid JSON, wrong shape
    noname = tmp_path / "CORRECTNESS_weird.json"  # no round number
    noname.write_text(json.dumps({"q_w": {"hash_match": True}}))
    # r12 advice: anchored filename match — a stray backup copy whose
    # stem merely CONTAINS r<digits> must not be counted as a round
    backup = tmp_path / "CORRECTNESS_r06.backup.json"
    backup.write_text(json.dumps({"q_b": {"hash_match": True}}))

    newest = Q._newest_greens([good, truncated, listy, noname, backup])
    assert newest == {"q_x": 3}


def test_rotation_derivation_warns_when_no_correctness_files(tmp_path):
    """Zero parseable CORRECTNESS files means the rotation silently
    degrades to registration order — r12 advice: make that VISIBLE.
    A list with only non-matching names must warn (and parse empty);
    a list with one valid file must stay silent. Explicit-files calls
    warn EVERY time (callers assert on the degradation) and must not
    consume the once-per-process budget reserved for the glob path
    (r13 advice: a package used outside the dev checkout hits the
    glob-path state on every _reorder — warn once, not recurringly)."""
    import json
    import warnings

    from ella_spark import queries as Q

    stray = tmp_path / "CORRECTNESS_r07.backup.json"
    stray.write_text(json.dumps({"q_s": {"hash_match": True}}))
    with pytest.warns(RuntimeWarning, match="registration order"):
        assert Q._newest_greens([stray]) == {}
    with pytest.warns(RuntimeWarning, match="registration order"):
        assert Q._newest_greens([]) == {}
    # r12 review: a matching FILENAME whose payload is truncated or
    # shape-shifted contributed nothing — that degrades too, so warn
    broken = tmp_path / "CORRECTNESS_r08.json"
    broken.write_text('{"q_t": {"hash_ma')  # mid-write crash shape
    listy = tmp_path / "CORRECTNESS_r09.json"
    listy.write_text(json.dumps(["q_u"]))  # valid JSON, wrong shape
    with pytest.warns(RuntimeWarning, match="registration order"):
        assert Q._newest_greens([broken, listy, stray]) == {}
    # second r12 review: files that PARSE fine but contribute zero
    # hash-green records are the same degraded state — warn on those
    # too (the guard is "any ranking entries", not "any dict parsed")
    empty = tmp_path / "CORRECTNESS_r10.json"
    empty.write_text("{}")
    allred = tmp_path / "CORRECTNESS_r11.json"
    allred.write_text(json.dumps({"q_r": {"hash_match": False}}))
    with pytest.warns(RuntimeWarning, match="registration order"):
        assert Q._newest_greens([empty, allred]) == {}

    good = tmp_path / "CORRECTNESS_r03.json"
    good.write_text(json.dumps({"q_x": {"hash_match": True}}))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert Q._newest_greens([good, stray]) == {"q_x": 3}
    # every explicit-files call above warned, repeatedly — so none of
    # them may have consumed the glob path's once-per-process budget
    assert Q._WARNED_NO_RANKING is False
