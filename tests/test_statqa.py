"""Closed-form property tests for the round-10 statistical-QA family:
each statistic is checked on a synthetic corpus whose ground truth is
known analytically — independent of the DuckDB oracle (which proves
cross-engine agreement, not statistical correctness). Mirrors
tests/test_drift.py's method for the r8/r9 drift families.
"""

from __future__ import annotations

import math

from tests.conftest import REPO  # noqa: F401  (sys.path side effect)


def _write_events(spark, tmp_path, rows):
    """rows: list of (event_id, ts_us, user_id, event_type, value)."""
    df = spark.createDataFrame(
        [(i, t, u, e, v, None) for (i, t, u, e, v) in rows],
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _write_documents(spark, tmp_path, rows):
    """rows: list of (doc_id, text, lang, source, n_chars)."""
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_cramers_v_extremes(spark, tmp_path):
    """V == 0 under exact margin-product independence; V == 1 when
    source fully determines language (a permutation table)."""
    from ella_spark.queries import all_queries

    # independence: counts = rowtot * coltot / N exactly (weights 1:2 x 1:3)
    rows, did = [], 0
    for lang, lw in (("en", 1), ("fr", 2)):
        for src, sw in (("s1", 1), ("s2", 3)):
            for _ in range(lw * sw * 2):
                rows.append((did, "t", lang, src, 10))
                did += 1
    sf = _write_documents(spark, tmp_path / "ind", rows)
    out = all_queries()["q_cramers_v"](spark, sf).toPandas().iloc[0]
    assert out.cramers_v == 0.0 and out.chi2 == 0.0
    assert out.dof == 1 and out.n == 24

    # perfect association: each source maps to exactly one language
    rows2 = []
    for did in range(30):
        lang = ["en", "fr", "de"][did % 3]
        rows2.append((did, "t", lang, f"src_{lang}", 10))
    sf2 = _write_documents(spark, tmp_path / "perm", rows2)
    out2 = all_queries()["q_cramers_v"](spark, sf2).toPandas().iloc[0]
    assert abs(out2.cramers_v - 1.0) < 1e-9
    assert out2.n_langs == 3 and out2.n_sources == 3

    # single-source corpus: V's denominator is 0 — NULL-gated
    # symmetrically (the r10 self-review cross-engine edge)
    import pandas as pd

    rows3 = [(d, "t", ["en", "fr"][d % 2], "only_src", 10) for d in range(8)]
    sf3 = _write_documents(spark, tmp_path / "one", rows3)
    out3 = all_queries()["q_cramers_v"](spark, sf3).toPandas().iloc[0]
    assert pd.isna(out3.cramers_v) and out3.dof == 0


def test_levene_w_closed_form(spark, tmp_path):
    """Two groups with hand-computable absolute deviations: W equals
    the classic one-way-ANOVA-on-|x - mean| statistic evaluated in
    the test, and near-zero when spreads match."""
    from datetime import datetime

    from ella_spark.queries import all_queries

    groups = {
        "tight": [10.0, 10.0, 12.0, 12.0],   # |dev| = 1 each
        "wide": [0.0, 0.0, 20.0, 20.0],      # |dev| = 10 each
    }
    rows, i = [], 0
    for et, vals in groups.items():
        for v in vals:
            rows.append((i, datetime(2024, 1, 1, 0, 0, i % 60), i, et, v))
            i += 1
    sf = _write_events(spark, tmp_path, rows)
    out = all_queries()["q_levene_variance"](spark, sf).toPandas().iloc[0]
    # constant-|dev| groups make SSW = 0: W is undefined and the query
    # NULL-gates it symmetrically on both engines
    import pandas as pd

    assert pd.isna(out.w_stat)

    groups = {
        "a": [0.0, 2.0, 4.0, 6.0],
        "b": [0.0, 20.0, 40.0, 60.0],
    }
    rows, i = [], 0
    for et, vals in groups.items():
        for v in vals:
            rows.append((i, datetime(2024, 1, 1, 0, 0, i % 60), i, et, v))
            i += 1
    sf = _write_events(spark, tmp_path / "b", rows)
    out = all_queries()["q_levene_variance"](spark, sf).toPandas().iloc[0]

    def z_of(vals):
        m = sum(vals) / len(vals)
        return [abs(v - m) for v in vals]

    zs = {k: z_of(v) for k, v in groups.items()}
    zbars = {k: sum(z) / len(z) for k, z in zs.items()}
    big_n = sum(len(v) for v in groups.values())
    k = len(groups)
    zbar = sum(sum(z) for z in zs.values()) / big_n
    ssb = sum(len(zs[g]) * (zbars[g] - zbar) ** 2 for g in groups)
    ssw = sum(sum((zi - zbars[g]) ** 2 for zi in zs[g]) for g in groups)
    want = (big_n - k) / (k - 1) * ssb / ssw
    assert out.n == big_n and out.k == k
    assert abs(out.w_stat - want) < 1e-6

    # equal spreads -> W == 0 (identical |dev| multisets)
    groups_eq = {"a": [0.0, 2.0, 4.0, 6.0], "b": [100.0, 102.0, 104.0, 106.0]}
    rows, i = [], 0
    for et, vals in groups_eq.items():
        for v in vals:
            rows.append((i, datetime(2024, 1, 1, 0, 0, i % 60), i, et, v))
            i += 1
    sf = _write_events(spark, tmp_path / "eq", rows)
    out_eq = all_queries()["q_levene_variance"](spark, sf).toPandas().iloc[0]
    assert abs(out_eq.w_stat) < 1e-9


def test_grubbs_planted_outlier(spark, tmp_path):
    """A slice of identical values plus one planted outlier: G equals
    the closed form max|x-mean|/s, and a no-outlier slice scores the
    symmetric two-value G (= sqrt(n)/2 for a balanced pair, here the
    hand value)."""
    from datetime import datetime

    from ella_spark.queries import all_queries

    vals = [10.0] * 9 + [100.0]  # mean 19, planted outlier
    rows = [
        (i, datetime(2024, 1, 1, 0, 0, i % 60), i, "a", v)
        for i, v in enumerate(vals)
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = all_queries()["q_grubbs_outlier"](spark, sf).toPandas().iloc[0]
    m = sum(vals) / len(vals)
    sd = math.sqrt(sum((v - m) ** 2 for v in vals) / (len(vals) - 1))
    assert out.n == 10
    assert abs(out.outlier_dev - (100.0 - m)) < 1e-6
    assert abs(out.g_stat - (100.0 - m) / sd) < 1e-6
    # G near its theoretical max (n-1)/sqrt(n) for a single extreme point
    assert out.g_stat > 2.5


def test_user_type_entropy_bounds(spark, tmp_path):
    """A single-type user scores H = 0 / norm 0; a user with a
    perfectly uniform mix over k types scores H = ln k / norm 1."""
    from datetime import datetime

    from ella_spark.queries import all_queries

    rows, i = [], 0
    for _ in range(6):  # user 1: all one type
        rows.append((i, datetime(2024, 1, 1, 0, 0, i % 60), 1, "x", 1.0))
        i += 1
    for et in ("a", "b", "c"):  # user 2: uniform over 3 types
        for _ in range(4):
            rows.append((i, datetime(2024, 1, 1, 0, 0, i % 60), 2, et, 1.0))
            i += 1
    sf = _write_events(spark, tmp_path, rows)
    out = (
        all_queries()["q_user_type_entropy"](spark, sf)
        .toPandas()
        .set_index("user_id")
    )
    assert out.loc[1].entropy == 0.0 and out.loc[1].norm_entropy == 0.0
    assert out.loc[1].n_types == 1
    assert abs(out.loc[2].entropy - round(math.log(3), 6)) < 1e-9
    assert abs(out.loc[2].norm_entropy - 1.0) < 1e-6


def test_mann_whitney_auc_extremes(spark, tmp_path):
    """AUC == 1 when every slice value exceeds every other value;
    AUC == 0.5 when the slice equals the rest exactly (all ties ->
    average ranks)."""
    from datetime import datetime

    from ella_spark.queries import all_queries

    rows, i = [], 0
    for v in (1.0, 2.0, 3.0, 4.0):
        rows.append((i, datetime(2024, 1, 1, 0, 0, i % 60), i, "low", v))
        i += 1
    for v in (10.0, 20.0, 30.0, 40.0):
        rows.append((i, datetime(2024, 1, 1, 0, 0, i % 60), i, "high", v))
        i += 1
    sf = _write_events(spark, tmp_path, rows)
    out = (
        all_queries()["q_mann_whitney"](spark, sf)
        .toPandas()
        .set_index("event_type")
    )
    assert out.loc["high"].auc == 1.0 and out.loc["high"].u2 == 2 * 16
    assert out.loc["low"].auc == 0.0 and out.loc["low"].u2 == 0
    assert (out.n == 4).all() and (out.m == 4).all()

    # identical distributions (all ties at the same values)
    rows2, i = [], 0
    for et in ("a", "b"):
        for v in (5.0, 5.0, 7.0, 7.0):
            rows2.append((i, datetime(2024, 1, 1, 0, 0, i % 60), i, et, v))
            i += 1
    sf2 = _write_events(spark, tmp_path / "tie", rows2)
    out2 = (
        all_queries()["q_mann_whitney"](spark, sf2)
        .toPandas()
        .set_index("event_type")
    )
    assert (out2.auc == 0.5).all()


def test_runs_test_extremes(spark, tmp_path):
    """A strictly alternating above/below sequence maximizes runs
    (R = n, z > 0); a fully clumped one minimizes them (R = 2,
    z < 0); both hand-checkable through the closed-form moments."""
    from datetime import datetime

    from ella_spark.queries import all_queries

    rows, i = [], 0
    for j in range(16):  # alternating 0, 10, 0, 10, ... (mean 5)
        rows.append(
            (i, datetime(2024, 1, 1, 0, 0, j, i), i, "alt", 10.0 * (j % 2))
        )
        i += 1
    for j in range(16):  # clumped: 8 lows then 8 highs
        rows.append(
            (i, datetime(2024, 1, 1, 0, 1, j, i), i, "clump",
             0.0 if j < 8 else 10.0)
        )
        i += 1
    sf = _write_events(spark, tmp_path, rows)
    out = (
        all_queries()["q_runs_test"](spark, sf)
        .toPandas()
        .set_index("event_type")
    )

    def z_closed(n1, n0, r):
        n = n1 + n0
        mu = 1 + 2 * n1 * n0 / n
        var = 2 * n1 * n0 * (2 * n1 * n0 - n) / (n * n * (n - 1))
        return (r - mu) / math.sqrt(var)

    assert out.loc["alt"].n_runs == 16  # every step flips
    assert abs(out.loc["alt"].z_runs - round(z_closed(8, 8, 16), 6)) < 1e-9
    assert out.loc["alt"].z_runs > 3
    assert out.loc["clump"].n_runs == 2
    assert abs(out.loc["clump"].z_runs - round(z_closed(8, 8, 2), 6)) < 1e-9
    assert out.loc["clump"].z_runs < -3


def test_gap_percentiles_known_gaps(spark, tmp_path):
    """100 events 1 s apart except one 100 s hole: p50 stays 1 s while
    p99 picks up the hole — the tail statistic the mean hides."""
    from datetime import datetime, timedelta

    from ella_spark.queries import all_queries

    t0 = datetime(2024, 1, 1)
    rows, t = [], t0
    for i in range(100):
        rows.append((i, t, i, "a", 1.0))
        t += timedelta(seconds=100 if i == 49 else 1)
    sf = _write_events(spark, tmp_path, rows)
    out = all_queries()["q_gap_percentiles"](spark, sf).toPandas().iloc[0]
    assert out.n_gaps == 99
    assert out.p50_gap_s == 1.0
    assert out.p90_gap_s == 1.0
    assert out.p99_gap_s > 2.0  # interpolates toward the 100 s hole


def test_ecdf_family_parity_when_grid_cap_fires(spark, tmp_path):
    """Round-10 self-review: the grid cap must coarsen IDENTICALLY on
    both engines — a Spark-only cap would hash-mismatch exactly on
    the high-cardinality inputs it guards against. 300k distinct
    centi-values (> _ECDF_MAX_GRID = 200k) force the conditional
    quantization on q_ks_drift / q_earth_movers / q_mann_whitney;
    Spark and the DuckDB oracle must still agree value-for-value."""
    import duckdb
    import pandas as pd

    from ella_spark.queries import all_oracles, all_queries

    n = 300_000
    df = spark.range(n).selectExpr(
        "id AS event_id",
        "timestamp_ntz '2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts",
        "id AS user_id",
        "CASE WHEN id % 3 = 0 THEN 'a' WHEN id % 3 = 1 THEN 'b' ELSE 'c' END"
        " AS event_type",
        "CAST(id AS DOUBLE) / 100.0 AS value",  # vc = id: 300k distinct
        "CAST(NULL AS STRING) AS props",
    )
    df.coalesce(4).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    sf = str(tmp_path)

    con = duckdb.connect()
    # Spark writes a part-file DIRECTORY (unlike the driver's single
    # files), so DuckDB needs the glob form
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf}/events.parquet/*.parquet')"
    )
    qs, oracles = all_queries(), all_oracles()
    for name in ("q_ks_drift", "q_earth_movers", "q_mann_whitney"):
        got = (
            qs[name](spark, sf)
            .toPandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        want = (
            con.execute(oracles[name])
            .fetchdf()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        pd.testing.assert_frame_equal(got, want, check_dtype=False), name


def test_statqa_sql_tvfs(spark, tmp_path):
    """SQL surface for the statqa family (the drift-TVF contracts):
    mann_whitney/grubbs/levene/runs_test over any catalog object,
    durable-text stored views, hand-checkable values on a planted
    corpus, unknown-table errors."""
    import pytest

    from ella_spark import Column, Ella

    db = Ella.create(str(tmp_path / "db"), spark)
    t = db.create_topic(
        "m", [Column("kind", "string", required=True), Column("v", "float64")]
    )
    ns = 1_000_000_000
    with t.publish() as pub:
        # kind 'low' = 1..8; kind 'high' = 101..108 (disjoint, shifted)
        for i in range(8):
            pub.write((i + 1) * ns, "low", float(i + 1))
            pub.write((i + 1) * ns, "high", float(i + 101))

    mw = db.query(
        "SELECT * FROM mann_whitney('m', 'v', 'kind') ORDER BY kind"
    ).df.toPandas().set_index("kind")
    assert mw.loc["high"].auc == 1.0 and mw.loc["low"].auc == 0.0
    assert (mw.n == 8).all() and (mw.m == 8).all()

    g = db.query(
        "SELECT * FROM grubbs('m', 'v', 'kind') ORDER BY kind"
    ).df.toPandas()
    assert len(g) == 2 and (g.g_stat > 0).all()

    lv = db.query("SELECT * FROM levene('m', 'v', 'kind')").df.toPandas()
    # identical spreads (same |dev| multiset, shifted) -> W == 0
    assert len(lv) == 1 and abs(lv.w_stat.iloc[0]) < 1e-9

    # runs_test: strictly alternating above/below within one kind
    t2 = db.create_topic(
        "r", [Column("kind", "string", required=True), Column("v", "float64")]
    )
    with t2.publish() as pub:
        for j in range(16):
            pub.write((j + 1) * ns, "alt", 10.0 * (j % 2))
    rt = db.query(
        "SELECT * FROM runs_test('r', 'v', 'kind')"
    ).df.toPandas().iloc[0]
    assert rt.n_runs == 16 and rt.z_runs > 3

    # stored view keeps the durable TVF text; re-scores current data
    db.query("CREATE VIEW qa_v AS SELECT * FROM grubbs('m', 'v', 'kind')")
    assert "grubbs" in db.store.resolve("qa_v").sql
    n0 = db.query("SELECT * FROM qa_v").df.count()
    with t.publish() as pub:
        pub.write(900 * ns, "new_kind", 1.0)
        pub.write(901 * ns, "new_kind", 2.0)
        pub.write(902 * ns, "new_kind", 3.0)
    assert db.query("SELECT * FROM qa_v").df.count() == n0 + 1

    for fn in ("mann_whitney", "grubbs", "levene"):
        with pytest.raises(ValueError, match="unknown table"):
            db.query(f"SELECT * FROM {fn}('nope', 'v', 'kind')")
    with pytest.raises(ValueError, match="unknown table"):
        db.query("SELECT * FROM runs_test('nope', 'v', 'kind')")


def test_mann_whitney_rank_invariance_property(spark):
    """The defining property of a RANK statistic: AUC is invariant
    under any strictly increasing transform of the values. Hypothesis
    draws small integer multisets per slice; exp() (strictly
    increasing, wildly nonlinear) must leave n/m/u2/auc bit-identical.
    A handful of examples — each round-trips Spark — is enough to
    catch a ranks-vs-values regression."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from ella_spark.operators.statqa import mann_whitney_by_slice

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        a=st.lists(st.integers(-5, 5), min_size=3, max_size=8),
        b=st.lists(st.integers(-5, 5), min_size=3, max_size=8),
    )
    def run(a, b):
        rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
        df = spark.createDataFrame(rows, "kind string, v double")
        import pyspark.sql.functions as F

        raw = (
            mann_whitney_by_slice(df, "v", "kind")
            .toPandas()
            .set_index("kind")
        )
        fx = (
            mann_whitney_by_slice(
                df.select("kind", F.exp("v").alias("v")), "v", "kind"
            )
            .toPandas()
            .set_index("kind")
        )
        assert raw[["n", "m", "u2", "auc"]].equals(fx[["n", "m", "u2", "auc"]])
        # and the two slices' U statistics are complementary:
        # U_a + U_b == n_a * n_b (each pair contributes to exactly one,
        # ties split .5/.5 — exact in the doubled u2 integers)
        assert int(raw.loc["a"].u2) + int(raw.loc["b"].u2) == int(
            2 * raw.loc["a"].n * raw.loc["b"].n
        )

    run()


def test_grubbs_affine_invariance_property(spark):
    """Grubbs G = max|x−mean|/s is invariant under any affine map
    a·x + b with a != 0 (the studentization cancels shift and scale) —
    the property that makes G unit-free. Hypothesis draws the sample
    and the map; G must agree to float tolerance."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from ella_spark.operators.statqa import grubbs_by_slice

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        xs=st.lists(
            st.integers(-50, 50), min_size=4, max_size=9, unique=True
        ),
        a=st.sampled_from([-3.0, -0.5, 0.25, 2.0, 10.0]),
        b=st.integers(-100, 100),
    )
    def run(xs, a, b):
        rows = [("g", float(v)) for v in xs]
        df = spark.createDataFrame(rows, "kind string, v double")
        import pyspark.sql.functions as F

        g1 = grubbs_by_slice(df, "v", "kind").toPandas()
        g2 = grubbs_by_slice(
            df.select("kind", (F.col("v") * a + b).alias("v")), "v", "kind"
        ).toPandas()
        assert len(g1) == len(g2) == 1
        assert abs(g1.g_stat.iloc[0] - g2.g_stat.iloc[0]) <= 1e-4
        assert abs(g2.outlier_dev.iloc[0] - abs(a) * g1.outlier_dev.iloc[0]) <= 1e-3

    run()


def test_ecdf_family_empty_and_all_null_events(spark, tmp_path):
    """Round-11 review: the driver-side width probe must not crash on
    an empty or all-NULL-value events table — SUM over zero rows is
    NULL, and int(None) was a TypeError where the old declarative
    form returned an empty frame. Both degenerate tables must yield
    zero result rows (no slices -> no drift rows), not an error."""
    from ella_spark.queries import all_queries

    qs = all_queries()
    empty = spark.createDataFrame(
        [],
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    nulls = spark.createDataFrame(
        [(1, None, 1, "a", None, None), (2, None, 2, "b", None, None)],
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    for label, df in (("empty", empty), ("all-null", nulls)):
        sf = str(tmp_path / label)
        df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
        for name in ("q_ks_drift", "q_earth_movers", "q_mann_whitney"):
            assert qs[name](spark, sf).count() == 0, f"{name} on {label}"
