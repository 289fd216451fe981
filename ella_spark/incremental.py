"""Incremental materialized-view refresh: SQL shape analysis.

The reference declares materialized views but cannot execute them
(ella-engine/src/table/view.rs:36-39 `todo!()`); this repo's MVs work,
and this module makes `REFRESH MATERIALIZED VIEW` O(new data) instead
of O(history) for the common single-topic shapes:

- **SPF** (select/project/filter, no aggregation): the view over
  (history ∪ delta) equals snapshot ∪ view(delta), so a refresh only
  scans the shards published since the last snapshot and appends their
  projected rows.
- **Mergeable aggregate** (`SELECT keys…, agg(expr) AS a… FROM topic
  [WHERE …] [GROUP BY keys…]` with agg ∈ {sum, count, min, max,
  count_if, bool_and, bool_or, every, bit_and, bit_or, bit_xor — the
  self-mergeable set: re-aggregating partials with the same fn (SUM
  for the counts) is exact; bit_xor because every input row lands in
  exactly one partial}):
  partial aggregates over the delta shards merge with the stored
  snapshot by re-aggregating snapshot ∪ delta-partials — sum/count via
  SUM, min via MIN, max via MAX. A GROUP BY with no aggregates (a
  DISTINCT-keys view) merges by dropping duplicate keys.
- **avg** rides the same merge as a REWRITE: `avg(e) AS a` is
  maintained as two HIDDEN snapshot columns `__mv_sum__a` /
  `__mv_cnt__a` (merged via SUM like any mergeable aggregate) and the
  visible column is recomputed as `sum/cnt` on every commit — exactly
  the sum÷count evaluation Spark's own `Average` performs, so the
  visible values match a full recompute. Hidden columns live in the
  snapshot files but are projected away on every read.
- **variance family** (`stddev[_samp]`, `stddev_pop`, `variance`,
  `var_samp`, `var_pop`) extends the avg rewrite with WELFORD hidden
  state `(count, mean, M2)` — the exact state Spark's own
  `CentralMomentAgg` carries between partitions. Each delta partial
  computes `avg(x)` and `var_pop(x) * count(x)` (Welford inside
  Spark, no cancellation); partials merge with the snapshot via the
  grand-mean identity `M2 = Σ M2ᵢ + Σ nᵢ·(meanᵢ − mean)²`, which
  subtracts NEARBY means instead of astronomically large raw
  sums-of-squares. With values ~1e9 and variance ~1 the old
  `sumsq − sum²/n` form lost all significant digits; the Welford
  state keeps ~9 of them (pinned by
  test_stats_mv_large_magnitude_stability). Visible value is
  `M2/n` (`/(n−1)` for sample stats), sqrt for stddev, NULL below
  the sample-count floor.
- **correlation/regression family** (`corr`, `covar_samp`,
  `covar_pop`, and all nine `regr_*` functions): same Welford recipe
  with six state columns `(n, mean_x, mean_y, M2x, M2y, C)` counted
  over BOTH-non-null pairs — the state of Spark's own `Covariance`
  aggregate (co-moment `C` merged via
  `C = Σ Cᵢ + Σ nᵢ·(mxᵢ − mx)(myᵢ − my)`). One deliberate deviation:
  `corr` over a zero-variance side returns NULL (the PostgreSQL
  convention) where Spark's native ANSI-mode corr raises
  DIVIDE_BY_ZERO — both refresh paths use the rewrite, so the MV is
  self-consistent.
- **moments family** (`skewness`, `kurtosis`): the Welford recipe
  extended to third and fourth central moments — hidden state
  `(n, mean, M2, M3, M4)` recovered from Spark's own outputs per
  partial (`M3 = skewness·n·var_pop^1.5`,
  `M4 = (kurtosis+3)·n·var_pop²` — exact inversions of
  `CentralMomentAgg`'s definitions, probed), merged by the
  grand-mean binomial identities
  `M3 += M3ᵢ + 3dᵢM2ᵢ + nᵢdᵢ³` and
  `M4 += M4ᵢ + 4dᵢM3ᵢ + 6dᵢ²M2ᵢ + nᵢdᵢ⁴` (dᵢ = meanᵢ − mean).
  NULL when M2 = 0 (constant / single-value groups), matching
  Spark's probed convention on both refresh paths.
- **max_by / min_by** (`max_by(arg, ord) AS a`): the hidden column
  `__mv_ord__a` carries the full `(o=ord, a=arg)` PAIR as a struct,
  aggregated lexicographically (`max(struct)` compares field by
  field), and the visible column is derived as `state.a`. Storing
  the pair — not just the winning ordering value — makes the state
  DETERMINISTIC on ordering-value ties: both refresh paths resolve a
  tie to the same argument (the lexicographically extreme one), so
  delta merge ≡ full recompute always, where plain Spark's max_by
  leaves the tied choice implementation-defined. Rows with NULL
  ordering value contribute nothing (max_by semantics: the CASE
  guard yields a NULL struct, which max/min skip); a NULL argument
  with a non-NULL ordering value participates and loses ties under
  max (struct comparison orders NULL first) / wins them under min —
  deterministic either way. Deliberate deviation (documented): on
  ties the MV may return a different argument than plain Spark's
  max_by would — both are valid answers under max_by's contract.
- **count(DISTINCT x)** (single argument): EXACT via a hidden
  distinct-value set column `__mv_set__a` (delta partials
  `collect_set`, snapshot ∪ delta merge by distinct-flatten; visible
  value is the set size). State is O(distinct values per group) —
  the price any exact engine pays for this aggregate (one Spark
  count-distinct job holds the same set in its hash aggregate);
  when the cardinality is too large to store, use
  approx_count_distinct instead (bounded ~4 KB HLL state, below).
  Multi-argument `count(DISTINCT a, b)` disqualifies (full
  recompute).
- **sum(DISTINCT x) / avg(DISTINCT x)**: EXACT via the SAME hidden
  distinct-set state; the visible value folds the set — SORTED first,
  so a float fold is order-deterministic and delta merge ≡ full
  recompute bit-for-bit (sum folds in the result dtype: exact for
  int/decimal; avg folds in double — a documented hair of deviation
  from Spark's decimal-avg rounding, self-consistent across both
  refresh paths). Other DISTINCT aggregates disqualify.
- **mode()** (single argument): EXACT via a hidden value -> count MAP
  column `__mv_cmap__a`. The count-per-value partial needs a second
  grouping level, inexpressible in the one-pass hidden SQL, so a
  pure-SQL side-query over the same FROM/WHERE binding builds it
  (the KLL-state pattern, engine._attach_mode_state); snapshot ∪
  delta maps fold with `map_zip_with` count sums — exact, order-free,
  state bounded at O(distinct values per group) forever (Spark's own
  Mode aggregate holds the same map per group). The visible value is
  the highest-count entry, count ties to the SMALLEST value —
  deterministic in both refresh paths, a documented deviation from
  plain mode()'s implementation-chosen tied pick (the max_by rule).
  `mode(x, deterministic)` 2-arg form disqualifies.
- **approx_count_distinct** rides the rewrite as a hidden DataSketches
  HLL sketch column `__mv_hll__a` (binary): delta partials compute
  `hll_sketch_agg`, snapshots merge via `hll_union_agg`, and the
  visible value is `hll_sketch_estimate` at every commit. The delta
  merge is the SAME union algebra Spark itself applies across
  partitions inside one `hll_sketch_agg` job, so the delta path adds
  no error class — but union-built and direct-built sketches are not
  bit-identical (estimates may differ by a fraction of the ~1.6%
  lgK=12 standard error; a full recompute can nudge the value within
  that band). Deliberate deviation: the estimator is DataSketches
  HLL, not the HyperLogLog++ behind Spark's plain
  `approx_count_distinct` — both refresh paths use the rewrite, so
  the MV is self-consistent (same pattern as the corr → NULL
  deviation). An explicit rsd argument disqualifies (the rewrite
  cannot honor it).
- **approx_top_k** (`approx_top_k(x[, k[, maxItemsTracked]])`,
  literal args): hidden DataSketches frequent-items sketch column
  `__mv_topk__a` — delta partials `approx_top_k_accumulate`,
  snapshots merge via `approx_top_k_combine`, visible value
  `approx_top_k_estimate` at every commit (the HLL pattern verbatim).
  EXACT while distinct items fit maxItemsTracked (default 10000);
  beyond it the documented sketch error band applies to both refresh
  paths identically. Non-literal k/maxItemsTracked disqualify.
- **approx_percentile / percentile_approx** (`approx_percentile(e,
  p) AS a`, scalar literal p): hidden state `__mv_kll__a` is a
  mergeable KLL sketch (operators.sketch — derandomized compaction,
  so state is a pure function of the group's sorted multiset),
  serialized as `array<array<double>>`. Sketches are not
  SQL-expressible, so the state is computed by an applyInPandas
  side-query over the same FROM/WHERE binding (engine._attach_
  kll_state) and joined onto the hidden partials by the group keys;
  snapshot ∪ delta states merge with `kll_merge`. Deliberate
  deviation: the estimator is this KLL, not Spark's GK — both
  refresh paths use it, so the MV is self-consistent, and whenever a
  group fits uncompacted (n ≤ 2048) the estimate IS the exact
  discrete quantile (rank ceil(p·n)). Multi-prob arrays, an explicit
  accuracy argument, percentile-over-join, and a global percentile
  with no sibling aggregate all disqualify (full recompute).
- **SPF / aggregate inner-join CHAIN of n ≥ 2 distinct topics**
  (`SELECT … FROM t1 JOIN t2 ON … [JOIN t3 ON …] [WHERE …] [GROUP BY
  …]`): for append-only inputs the leapfrog insert-delta identity
  Δ(T1 ⋈ … ⋈ Tn) = ⋃ᵢ T1ᵒˡᵈ ⋈ … ⋈ Tᵢ₋₁ᵒˡᵈ ⋈ ΔTᵢ ⋈ Tᵢ₊₁ⁿᵉʷ ⋈ … ⋈ Tnⁿᵉʷ
  partitions the new result rows exactly (every new row contains a
  delta row from some FIRST position i; terms are disjoint because
  positions before i are bound to old data only), so a refresh never
  joins history against history on every side at once. Inner joins
  only: outer variants can RETRACT earlier null-padded rows on
  insert, which append-only snapshots cannot express.

Anything else (outer joins, subqueries, windows, DISTINCT aggs,
set ops) falls back to a full recompute —
correctness first; the analyzer is deliberately conservative, and
every token it does not understand disqualifies the plan.

At 100 TB this is the difference between a rollup refresh that reads a
day of new shards and one that rescans the whole fact history. The
same partial-aggregate + merge shape is what Spark itself does
map-side within one job; here it is carried ACROSS refreshes via the
snapshot, with the topic's immutable shard basenames as the cursor
(compaction renames shards, which invalidates the cursor and safely
forces a full recompute).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

#: tokens whose presence disqualifies delta refresh (conservative:
#: matching plain words, not a parser — false positives only cause a
#: full recompute, never a wrong delta)
_BANNED = re.compile(
    r"\b(join|union|intersect|except|distinct|over|limit|offset|having|"
    r"window|with|qualify|values|pivot|unpivot|lateral|tablesample|"
    r"order\s+by|cluster\s+by|sort\s+by|distribute\s+by)\b|\(\s*select",
    re.I,
)

#: the one DISTINCT form the agg rewrite supports (masked out before
#: the banned-token scan; see analyze_mv_sql)
_COUNT_DISTINCT = re.compile(
    r"\b(?:count|sum|avg)\s*\(\s*distinct\b", re.I
)

_SHAPE = re.compile(
    r"^\s*select\s+(?P<select>.+?)\s+from\s+(?P<table>[A-Za-z0-9_]+)"
    r"(?:\s+(?:as\s+)?(?P<alias>[A-Za-z0-9_]+))?"
    r"(?:\s+where\s+(?P<where>.+?))?"
    r"(?:\s+group\s+by\s+(?P<group>.+?))?\s*;?\s*$",
    re.I | re.S,
)

#: a mergeable aggregate select item: agg(expr) AS alias
#: (avg and the variance family are mergeable VIA REWRITE to hidden
#: sum/count[/sum-of-squares] columns; longest alternatives first so
#: stddev_samp is not half-matched as stddev)
_AGG_ITEM = re.compile(
    r"^(?P<fn>sum|count_if|count|min|max|avg|"
    r"bool_and|bool_or|every|bit_and|bit_or|bit_xor|"
    r"stddev_samp|stddev_pop|stddev|"
    r"var_samp|var_pop|variance|corr|covar_samp|covar_pop|"
    r"skewness|kurtosis|"
    r"approx_top_k|approx_count_distinct|approx_percentile|percentile_approx|"
    r"max_by|min_by|mode|"
    r"regr_(?:count|avgx|avgy|slope|intercept|r2|sxx|syy|sxy))"
    r"\s*\((?P<arg>.+)\)\s+as\s+"
    r"(?P<alias>[A-Za-z0-9_]+)$",
    re.I | re.S,
)

#: variance-family fns rewritten to Welford (count, mean, M2) state
_STATS_FNS = {
    "stddev", "stddev_samp", "stddev_pop", "var_samp", "var_pop", "variance",
}

#: higher central moments rewritten to (n, mean, M2, M3, M4) state —
#: skewness = (M3/n)/(M2/n)^1.5, excess kurtosis = (M4/n)/(M2/n)^2 - 3
#: (Spark's own population forms; NULL when M2 = 0, probed)
_MOMENT_FNS = {"skewness", "kurtosis"}

#: two-argument correlation/regression family rewritten to Welford
#: co-moment state (n, mean_a, mean_b, M2_a, M2_b, C over
#: BOTH-non-null pairs, a = FIRST argument — note regr_*(y, x)
#: passes y first)
_CORR_FNS = {
    "corr", "covar_samp", "covar_pop",
    "regr_count", "regr_avgx", "regr_avgy", "regr_slope",
    "regr_intercept", "regr_r2", "regr_sxx", "regr_syy", "regr_sxy",
}

#: ANY aggregate-function call (used to reject un-mergeable aggs and
#: to tell SPF apart from a global aggregate)
_ANY_AGG = re.compile(
    r"\b(sum|count|min|max|avg|mean|stddev\w*|std|variance|var_\w+|"
    r"corr|covar_\w+|regr_\w+|approx_\w+|percentile\w*|median|mode|"
    r"collect_\w+|array_agg|string_agg|listagg|first|last|first_value|"
    r"last_value|any_value|any|some|every|bool_and|bool_or|bit_\w+|"
    r"count_if|grouping|grouping_id|histogram\w*|kurtosis|skewness|"
    r"hll_\w+|max_by|min_by|try_\w+|sum_distinct|"
    r"count_min_sketch|bitmap_\w+|bloom_filter_agg|mode_agg)\s*\(",
    re.I,
)
# NOTE: this blacklist is the FIRST line of defense only. The delta
# path additionally inspects the analyzed Spark plan of the bound
# delta query and refuses SPF treatment if any Aggregate node appears
# (engine._refresh_delta) — so an aggregate this regex does not know
# can never silently append partial results; worst case is a full
# recompute.

_ALIASED = re.compile(r"^(?P<expr>.+?)\s+as\s+(?P<alias>[A-Za-z0-9_]+)$", re.I | re.S)

#: inner-join CHAIN of distinct topics (optionally GROUP BY): the
#: chain body is parsed by _parse_chain (n >= 2 tables)
_JOIN_SHAPE = re.compile(
    r"^\s*select\s+(?P<select>.+?)\s+from\s+(?P<chain>.+?)"
    r"(?:\s+where\s+(?P<where>.+?))?"
    r"(?:\s+group\s+by\s+(?P<group>.+?))?\s*;?\s*$",
    re.I | re.S,
)
_CHAIN_HEAD = re.compile(
    r"^\s*(?P<t>[A-Za-z0-9_]+)(?:\s+(?:as\s+)?(?P<a>[A-Za-z0-9_]+))?\s*$",
    re.I,
)
_CHAIN_LINK = re.compile(
    r"^\s*(?P<t>[A-Za-z0-9_]+)(?:\s+(?:as\s+)?(?P<a>[A-Za-z0-9_]+))?"
    r"\s+on\s+(?P<on>.+?)\s*$",
    re.I | re.S,
)
_JOIN_SPLIT = re.compile(r"\s+(?:inner\s+)?join\s+", re.I)
#: disqualifiers for the join shape: everything in _BANNED except the
#: INNER JOIN keywords themselves, plus every non-inner join flavor
_BANNED_JOIN = re.compile(
    r"\b(union|intersect|except|distinct|over|limit|offset|having|"
    r"window|with|qualify|values|pivot|unpivot|lateral|tablesample|"
    r"left|right|full|outer|cross|semi|anti|natural|using|"
    r"order\s+by|cluster\s+by|sort\s+by|distribute\s+by)\b"
    r"|\(\s*select",
    re.I,
)
_DOTTED_IDENT = re.compile(r"^[A-Za-z0-9_]+(\.[A-Za-z0-9_]+)?$")


def hidden_cols(alias: str) -> tuple[str, str]:
    """Snapshot column names carrying an avg's mergeable state."""
    return f"__mv_sum__{alias}", f"__mv_cnt__{alias}"


def stats_hidden_cols(alias: str) -> tuple[str, str, str]:
    """Snapshot column names carrying a variance-family aggregate's
    Welford state (count long, mean double, M2 double)."""
    return (
        f"__mv_cnt__{alias}",
        f"__mv_mean__{alias}",
        f"__mv_m2__{alias}",
    )


def ord_hidden_col(alias: str) -> str:
    """Snapshot column carrying a max_by/min_by's mergeable state: the
    extreme ORDERING value its stored argument is associated with."""
    return f"__mv_ord__{alias}"


def kll_hidden_col(alias: str) -> str:
    """Snapshot column carrying an approx_percentile's mergeable
    state: KLL sketch levels (array<array<double>>, level i holding
    items of weight 2^i — operators.sketch)."""
    return f"__mv_kll__{alias}"


def set_hidden_col(alias: str) -> str:
    """Snapshot column carrying a count(DISTINCT x)'s mergeable state:
    the group's distinct-value set (array; O(distinct values))."""
    return f"__mv_set__{alias}"


def topk_hidden_col(alias: str) -> str:
    """Snapshot column carrying an approx_top_k's mergeable state: a
    DataSketches frequent-items sketch (approx_top_k_accumulate),
    merged with approx_top_k_combine — the same bounded-state pattern
    as the HLL approx_count_distinct family."""
    return f"__mv_topk__{alias}"


def mode_hidden_col(alias: str) -> str:
    """Snapshot column carrying a mode()'s mergeable state: the
    group's value -> count map (O(distinct values), the count-map any
    exact mode computation holds; Spark's own Mode aggregate keeps the
    same map in an OpenHashMap per group)."""
    return f"__mv_cmap__{alias}"


def approx_hidden_col(alias: str) -> str:
    """Snapshot column carrying an approx_count_distinct's mergeable
    state: a DataSketches HLL sketch (binary)."""
    return f"__mv_hll__{alias}"


def moment_hidden_cols(alias: str) -> tuple[str, str, str, str, str]:
    """Snapshot column names carrying a skewness/kurtosis aggregate's
    central-moment state (n, mean, M2, M3, M4)."""
    return tuple(
        f"__mv_{part}__{alias}" for part in ("n", "m1", "q2", "q3", "q4")
    )


def corr_hidden_cols(alias: str) -> tuple[str, str, str, str, str, str]:
    """Snapshot column names carrying a correlation-family aggregate's
    Welford co-moment state over BOTH-non-null pairs:
    (n, mean of 1st arg, mean of 2nd arg, M2 of 1st, M2 of 2nd,
    co-moment C)."""
    return tuple(
        f"__mv_{part}__{alias}" for part in ("n", "m1", "m2a", "q1", "q2", "c")
    )


@dataclass
class MvAnalysis:
    """Delta-refresh plan for a 1..n-topic materialized view."""

    table: str  # the FROM identifier (the topic's registered view name)
    mode: str  # "spf" | "agg" | "spf_join" | "agg_join"
    keys: list[str] = field(default_factory=list)  # agg: group-key out cols
    aggs: dict[str, str] = field(default_factory=dict)  # agg: out col -> fn
    out_cols: list[str] = field(default_factory=list)  # agg: select order
    table2: str | None = None  # join: the second topic (compat accessor)
    #: every FROM-chain table in join order (len 1 for single-topic)
    tables: list[str] = field(default_factory=list)
    #: visible avg alias -> (hidden sum col, hidden cnt col)
    avgs: dict[str, tuple[str, str]] = field(default_factory=dict)
    #: visible variance-family alias -> (fn, cnt col, mean col, M2 col)
    stats: dict[str, tuple[str, str, str, str]] = field(default_factory=dict)
    #: visible correlation-family alias -> (fn, n, m1, m2a, q1, q2, c)
    corrs: dict[str, tuple] = field(default_factory=dict)
    #: visible skewness/kurtosis alias -> (fn, n, mean, M2, M3, M4)
    moments: dict[str, tuple] = field(default_factory=dict)
    #: visible approx_count_distinct alias -> hidden HLL sketch col
    approxs: dict[str, str] = field(default_factory=dict)
    #: visible max_by/min_by alias -> (fn, hidden ordering-value col)
    argmaxs: dict[str, tuple[str, str]] = field(default_factory=dict)
    #: visible approx_percentile alias -> (arg SQL, prob, hidden col)
    klls: dict[str, tuple[str, float, str]] = field(default_factory=dict)
    #: visible count(DISTINCT x) alias -> hidden distinct-set col
    dists: dict[str, str] = field(default_factory=dict)
    #: visible sum/avg(DISTINCT x) alias -> (fn, hidden set col)
    dsums: dict[str, tuple[str, str]] = field(default_factory=dict)
    #: visible mode() alias -> (arg SQL, hidden count-map col)
    modes: dict[str, tuple[str, str]] = field(default_factory=dict)
    #: visible approx_top_k alias -> (k, maxItemsTracked, hidden col)
    topks: dict[str, tuple[int, int, str]] = field(default_factory=dict)
    #: raw SELECT items for the group keys (the kll state side-query
    #: re-selects them next to the percentile argument)
    key_items: list[str] = field(default_factory=list)
    #: FROM body + optional WHERE of the analyzed SQL (single-topic
    #: modes; the kll state side-query replays them)
    from_text: str | None = None
    where: str | None = None
    #: SQL computing the MERGEABLE partials (avg / variance items
    #: replaced by hidden-state items); None when neither is present
    hidden_sql: str | None = None

    def __post_init__(self):
        if not self.tables:
            self.tables = [self.table] + ([self.table2] if self.table2 else [])


def _split_top_level(text: str) -> list[str]:
    """Split a select/group list on commas outside parentheses."""
    items, depth, start = [], 0, 0
    for i, ch in enumerate(text):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            items.append(text[start:i].strip())
            start = i + 1
    items.append(text[start:].strip())
    return [i for i in items if i]


def _norm(expr: str) -> str:
    return re.sub(r"\s+", " ", expr.strip()).lower()


def analyze_mv_sql(sql: str) -> MvAnalysis | None:
    """Classify a stored MV SQL as delta-refreshable, or None."""
    m = _SHAPE.match(sql)
    # count(DISTINCT x) is the ONE distinct form the rewrite handles
    # (hidden set state) — mask it so the conservative banned-token
    # scan does not reject it; every other DISTINCT (SELECT DISTINCT,
    # sum(DISTINCT), multi-arg) still disqualifies here or in
    # _classify_agg_select.
    scan_sql = _COUNT_DISTINCT.sub("count(", sql)
    if m is None or _BANNED.search(scan_sql):
        return _analyze_join(sql)
    table = m.group("table")
    select_items = _split_top_level(m.group("select"))
    group = m.group("group")

    if group is None:
        if not _ANY_AGG.search(m.group("select")):
            # plain select/project/filter: append-only delta
            return MvAnalysis(table=table, mode="spf")
        # global aggregate: every item must be a mergeable agg
        group_exprs: list[str] = []
    else:
        group_exprs = [_norm(g) for g in _split_top_level(group)]

    parsed = _classify_agg_select(select_items, group_exprs)
    if parsed is None:
        return None
    (keys, aggs, out_cols, avgs, stats, corrs, moments, approxs, argmaxs,
     klls, dists, dsums, modes, topks, key_items, hidden_items) = parsed
    if group is None and not aggs:
        return None
    if (klls or modes) and not hidden_items:
        # a GLOBAL percentile/mode with no sibling aggregate/key
        # leaves the hidden partial SQL with an empty select list —
        # full recompute (add e.g. count(*) to the view to make it
        # delta)
        return None
    alias = m.group("alias")
    from_text = table + (f" {alias}" if alias else "")
    return MvAnalysis(
        table=table, mode="agg", keys=keys, aggs=aggs, out_cols=out_cols,
        avgs=avgs, stats=stats, corrs=corrs, moments=moments,
        approxs=approxs,
        argmaxs=argmaxs, klls=klls, dists=dists, dsums=dsums, modes=modes,
        topks=topks,
        key_items=key_items,
        from_text=from_text, where=m.group("where"),
        hidden_sql=_rebuild(hidden_items, from_text, m.group("where"), group)
        if (avgs or stats or corrs or moments or approxs or argmaxs or klls or dists
            or dsums or modes or topks)
        else None,
    )


def _rebuild(select_items, from_text, where, group) -> str:
    """Reassemble a SELECT from parsed pieces (hidden-partials SQL)."""
    sql = f"SELECT {', '.join(select_items)} FROM {from_text}"
    if where:
        sql += f" WHERE {where}"
    if group:
        sql += f" GROUP BY {group}"
    return sql


def _classify_agg_select(select_items, group_exprs):
    """Split select items into (keys, aggs, out_cols, avgs, stats,
    corrs, approxs, hidden_items) for the mergeable-aggregate modes;
    None when any item disqualifies. ``hidden_items`` is the select
    list with every avg / variance / corr / approx-distinct item
    replaced by its mergeable hidden-column items."""
    keys: list[str] = []
    aggs: dict[str, str] = {}
    out_cols: list[str] = []
    avgs: dict[str, tuple[str, str]] = {}
    stats: dict[str, tuple[str, str, str, str]] = {}
    corrs: dict[str, tuple] = {}
    moments: dict[str, tuple] = {}
    approxs: dict[str, str] = {}
    argmaxs: dict[str, tuple[str, str]] = {}
    klls: dict[str, tuple[str, float, str]] = {}
    dists: dict[str, str] = {}
    dsums: dict[str, tuple[str, str]] = {}
    modes: dict[str, tuple[str, str]] = {}
    topks: dict[str, tuple[int, int, str]] = {}
    key_items: list[str] = []
    hidden_items: list[str] = []
    for item in select_items:
        am = _AGG_ITEM.match(item.strip())
        if am is not None:
            arg = am.group("arg")
            if _ANY_AGG.search(arg):
                return None  # nested agg: not mergeable
            dm = re.match(r"^\s*distinct\b(?P<inner>.+)$", arg, re.I | re.S)
            if dm is not None:
                # count(DISTINCT x): EXACT via a hidden per-group
                # distinct-value set (collect_set partials, distinct-
                # flatten merge). State is O(distinct values per
                # group) — the price ANY exact engine pays for this
                # aggregate (Spark itself keeps the same set inside
                # one count-distinct job); approx_count_distinct is
                # the bounded-state (4 KB HLL) alternative when the
                # cardinality is too high to store. Other DISTINCT
                # aggregates stay disqualified (full recompute).
                alias, fn = am.group("alias"), am.group("fn").lower()
                inner = dm.group("inner").strip()
                if fn not in ("count", "sum", "avg") or len(
                    _split_top_level(inner)
                ) != 1:
                    return None  # other DISTINCT/multi-arg: full recompute
                h = set_hidden_col(alias)
                if fn == "count":
                    dists[alias] = h
                else:
                    # sum/avg(DISTINCT x): SAME distinct-set state; the
                    # visible value folds the set (sorted, so float
                    # folds are order-deterministic: delta merge ≡ full
                    # recompute bit-for-bit) — engine._derive_visible
                    dsums[alias] = (fn, h)
                aggs[alias] = fn
                out_cols.append(alias)
                hidden_items.append(f"collect_set({inner}) AS {h}")
                continue
            alias = am.group("alias")
            fn = am.group("fn").lower()
            aggs[alias] = fn
            out_cols.append(alias)
            if fn == "avg":
                hsum, hcnt = hidden_cols(alias)
                avgs[alias] = (hsum, hcnt)
                hidden_items.append(f"sum({arg}) AS {hsum}")
                hidden_items.append(f"count({arg}) AS {hcnt}")
            elif fn in _STATS_FNS:
                hcnt, hmean, hm2 = stats_hidden_cols(alias)
                stats[alias] = (fn, hcnt, hmean, hm2)
                # Welford state: avg and var_pop are Welford-computed
                # inside Spark (CentralMomentAgg), so the partial
                # itself never forms catastrophic sum-of-squares
                d = f"CAST(({arg}) AS DOUBLE)"
                hidden_items.append(f"count({arg}) AS {hcnt}")
                hidden_items.append(f"avg({d}) AS {hmean}")
                hidden_items.append(f"var_pop({d}) * count({arg}) AS {hm2}")
            elif fn in ("approx_percentile", "percentile_approx"):
                parts = _split_top_level(arg)
                if len(parts) != 2:
                    return None  # prob arrays / accuracy arg: bail
                try:
                    prob = float(parts[1])
                except ValueError:
                    return None
                if not 0.0 <= prob <= 1.0:
                    return None
                h = kll_hidden_col(alias)
                klls[alias] = (parts[0], prob, h)
                # state is a KLL sketch built OUTSIDE the hidden SQL
                # (engine._attach_kll_state): sketches are not
                # SQL-expressible, so the select item is simply
                # omitted here and the state column joined on the
                # group keys afterwards. Deliberate deviation
                # (documented): the estimator is the repo's
                # derandomized KLL, not Spark's GK — both refresh
                # paths use it, so the MV is self-consistent, and
                # whenever a group fits uncompacted (n <= k=2048) the
                # estimate is the exact discrete quantile.
            elif fn in ("max_by", "min_by"):
                parts = _split_top_level(arg)
                if len(parts) != 2:
                    return None
                h = ord_hidden_col(alias)
                argmaxs[alias] = (fn, h)
                # deterministic mergeable state: the (ord, arg) PAIR
                # as a struct, aggregated lexicographically — a tied
                # ordering value always resolves to the same argument
                # in BOTH refresh paths (delta merge ≡ full
                # recompute). NULL ord rows contribute nothing (the
                # CASE guard nulls the whole struct, exactly max_by's
                # skip rule); the visible column is derived as
                # state.a by _derive_visible.
                agg = "max" if fn == "max_by" else "min"
                hidden_items.append(
                    f"{agg}(CASE WHEN ({parts[1]}) IS NOT NULL THEN "
                    f"named_struct('o', ({parts[1]}), 'a', ({parts[0]})) "
                    f"END) AS {h}"
                )
            elif fn == "mode":
                if len(_split_top_level(arg)) != 1:
                    return None  # mode(x, deterministic): full recompute
                h = mode_hidden_col(alias)
                modes[alias] = (arg.strip(), h)
                # mergeable state: the group's value -> count map,
                # built by a SQL side-query over the same FROM/WHERE
                # binding (a count-per-value needs a second grouping
                # level, inexpressible in the one-pass hidden SQL —
                # the KLL-state pattern, engine._attach_mode_state).
                # Deliberate deviation (documented): count ties
                # resolve to the SMALLEST value in both refresh
                # paths, where plain Spark's mode leaves the tied
                # pick implementation-defined.
            elif fn == "approx_top_k":
                parts = _split_top_level(arg)
                if len(parts) > 3:
                    return None
                try:
                    kk = int(parts[1]) if len(parts) > 1 else 5
                    mm = int(parts[2]) if len(parts) > 2 else 10000
                except ValueError:
                    return None  # non-literal k / maxItemsTracked
                h = topk_hidden_col(alias)
                topks[alias] = (kk, mm, h)
                # DataSketches frequent-items state: partials
                # accumulate, snapshots merge with
                # approx_top_k_combine — the HLL pattern. Exact while
                # distinct items fit maxItemsTracked (default 10000);
                # beyond that, the documented sketch error band.
                hidden_items.append(
                    f"approx_top_k_accumulate(({parts[0]}), {mm}) AS {h}"
                )
            elif fn == "approx_count_distinct":
                parts = _split_top_level(arg)
                if len(parts) != 1:
                    return None  # explicit rsd: estimator differs, bail
                h = approx_hidden_col(alias)
                approxs[alias] = h
                # DataSketches HLL state: the delta merge is the same
                # union algebra Spark applies across partitions, so
                # no new error class (see module docstring for the
                # union-vs-direct estimate nuance and the estimator
                # deviation from HyperLogLog++).
                hidden_items.append(f"hll_sketch_agg({arg}) AS {h}")
            elif fn in _MOMENT_FNS:
                cols = moment_hidden_cols(alias)
                moments[alias] = (fn, *cols)
                hn, hm1, hq2, hq3, hq4 = cols
                # central-moment state recovered from Spark's own
                # CentralMomentAgg outputs (probed: var_pop = M2/n,
                # skewness = (M3/n)/(M2/n)^1.5, kurtosis =
                # (M4/n)/(M2/n)^2 - 3; both NULL when M2 = 0, so the
                # coalesce(…)*var_pop^k product is exactly 0 there)
                d = f"CAST(({arg}) AS DOUBLE)"
                hidden_items.append(f"count({arg}) AS {hn}")
                hidden_items.append(f"avg({d}) AS {hm1}")
                hidden_items.append(f"var_pop({d}) * count({arg}) AS {hq2}")
                hidden_items.append(
                    f"coalesce(skewness({d}), 0) * count({arg})"
                    f" * pow(var_pop({d}), 1.5) AS {hq3}"
                )
                hidden_items.append(
                    f"(coalesce(kurtosis({d}), 0) + 3) * count({arg})"
                    f" * pow(var_pop({d}), 2) AS {hq4}"
                )
            elif fn in _CORR_FNS:
                parts = _split_top_level(arg)
                if len(parts) != 2:
                    return None
                cols = corr_hidden_cols(alias)
                corrs[alias] = (fn, *cols)
                hn, hm1, hm2a, hq1, hq2, hc = cols
                # Welford co-moment state over BOTH-non-null rows
                # (x NULL or y NULL contributes nothing — Spark's pair
                # semantics): the cross-guards make each per-row value
                # NULL when the OTHER argument is NULL, and Spark's
                # covar_pop skips incomplete pairs natively
                dx = f"CAST(({parts[0]}) AS DOUBLE)"
                dy = f"CAST(({parts[1]}) AS DOUBLE)"
                gx = f"CASE WHEN ({parts[1]}) IS NOT NULL THEN {dx} END"
                gy = f"CASE WHEN ({parts[0]}) IS NOT NULL THEN {dy} END"
                hidden_items.append(f"count({dx} + {dy}) AS {hn}")
                hidden_items.append(f"avg({gx}) AS {hm1}")
                hidden_items.append(f"avg({gy}) AS {hm2a}")
                hidden_items.append(
                    f"var_pop({gx}) * count({gx}) AS {hq1}"
                )
                hidden_items.append(
                    f"var_pop({gy}) * count({gy}) AS {hq2}"
                )
                hidden_items.append(
                    f"covar_pop({dx}, {dy}) * count({dx} + {dy}) AS {hc}"
                )
            else:
                hidden_items.append(item.strip())
            continue
        if _ANY_AGG.search(item):
            return None  # an aggregate shape we can't merge (expr-of-aggs, …)
        # must be a group key with a derivable output column name
        alm = _ALIASED.match(item.strip())
        if alm is not None:
            expr, alias = alm.group("expr"), alm.group("alias")
        else:
            expr, alias = item, None
        # the key may appear in GROUP BY as the expression or its alias
        if _norm(expr) not in group_exprs and (
            alias is None or _norm(alias) not in group_exprs
        ):
            return None
        if alias is None:
            if not _DOTTED_IDENT.match(expr.strip()):
                return None  # unaliased computed key: output name unknowable
            alias = expr.strip().split(".")[-1]
        keys.append(alias)
        out_cols.append(alias)
        key_items.append(item.strip())
        hidden_items.append(item.strip())
    return (keys, aggs, out_cols, avgs, stats, corrs, moments, approxs,
            argmaxs, klls, dists, dsums, modes, topks, key_items,
            hidden_items)


def _parse_chain(chain: str) -> list[str] | None:
    """Parse a FROM body of chained inner joins into the table list,
    or None when it is not a plain ``t1 [a1] JOIN t2 [a2] ON … [JOIN
    t3 [a3] ON …]…`` chain of n >= 2 DISTINCT tables. Subqueries are
    impossible here (the banned-token scan rejected ``( select`` and
    every non-inner join flavor before this runs), so splitting on the
    JOIN keyword is unambiguous."""
    parts = _JOIN_SPLIT.split(chain)
    if len(parts) < 2:
        return None
    head = _CHAIN_HEAD.match(parts[0])
    if head is None:
        return None
    tables = [head.group("t")]
    for seg in parts[1:]:
        link = _CHAIN_LINK.match(seg)
        if link is None:
            return None
        tables.append(link.group("t"))
    if len({t.lower() for t in tables}) != len(tables):
        return None  # self-join: one view name cannot bind two subsets
    return tables


def _analyze_join(sql: str) -> MvAnalysis | None:
    """Inner-join chain of n >= 2 DISTINCT topics (see module
    docstring): SPF (``spf_join``) or mergeable GROUP BY aggregate
    (``agg_join`` — the fact-join-dims rollup; the join-delta terms
    arrive already partially aggregated and merge with the snapshot
    exactly like the single-topic agg mode).

    Self-joins are rejected: the delta identity needs the same table
    bound to different file subsets simultaneously, which one view
    name cannot express. Outer flavors / subqueries reject.
    """
    m = _JOIN_SHAPE.match(sql)
    if m is None or _BANNED_JOIN.search(sql):
        return None
    tables = _parse_chain(m.group("chain"))
    if tables is None:
        return None
    group = m.group("group")
    if group is None:
        if _ANY_AGG.search(m.group("select")):
            return None  # global agg over a join: not yet supported
        return MvAnalysis(
            table=tables[0], mode="spf_join", table2=tables[1], tables=tables
        )
    parsed = _classify_agg_select(
        _split_top_level(m.group("select")),
        [_norm(g) for g in _split_top_level(group)],
    )
    if parsed is None:
        return None
    (keys, aggs, out_cols, avgs, stats, corrs, moments, approxs, argmaxs,
     klls, dists, dsums, modes, topks, key_items, hidden_items) = parsed
    if not aggs:
        return None  # distinct-keys over a join: keep it simple, full
    if klls or modes:
        return None  # percentile/mode over a join: full recompute (no
        # state side-query over a join chain yet)
    return MvAnalysis(
        table=tables[0], mode="agg_join", table2=tables[1], tables=tables,
        keys=keys, aggs=aggs, out_cols=out_cols, avgs=avgs, stats=stats,
        corrs=corrs, moments=moments, approxs=approxs, argmaxs=argmaxs,
        dists=dists,
        dsums=dsums, topks=topks,
        hidden_sql=_rebuild(
            hidden_items, m.group("chain"), m.group("where"), group
        )
        if (avgs or stats or corrs or moments or approxs or argmaxs or dists or dsums
            or topks)
        else None,
    )

