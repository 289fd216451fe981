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
  [WHERE …] [GROUP BY keys…]` with agg ∈ {sum, count, min, max}):
  partial aggregates over the delta shards merge with the stored
  snapshot by re-aggregating snapshot ∪ delta-partials — sum/count via
  SUM, min via MIN, max via MAX. A GROUP BY with no aggregates (a
  DISTINCT-keys view) merges by dropping duplicate keys.
- **SPF inner join of two topics** (`SELECT … FROM a JOIN b ON …
  [WHERE …]`): for append-only inputs the classic insert-delta
  identity  Δ(A ⋈ B) = ΔA ⋈ B_new  ∪  A_old ⋈ ΔB  partitions the new
  result rows exactly (ΔA⋈ΔB lands in the first term, nothing lands
  in both), so a refresh joins only the delta shards against the
  other side — never history against history. Inner joins only:
  outer variants can RETRACT earlier null-padded rows on insert,
  which append-only snapshots cannot express.

Anything else (joins, subqueries, windows, DISTINCT aggs, avg/stats
aggs, set ops) falls back to a full recompute — correctness first; the
analyzer is deliberately conservative, and every token it does not
understand disqualifies the plan.

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

_SHAPE = re.compile(
    r"^\s*select\s+(?P<select>.+?)\s+from\s+(?P<table>[A-Za-z0-9_]+)"
    r"(?:\s+(?:as\s+)?(?P<alias>[A-Za-z0-9_]+))?"
    r"(?:\s+where\s+(?P<where>.+?))?"
    r"(?:\s+group\s+by\s+(?P<group>.+?))?\s*;?\s*$",
    re.I | re.S,
)

#: a mergeable aggregate select item: agg(expr) AS alias
_AGG_ITEM = re.compile(
    r"^(?P<fn>sum|count|min|max)\s*\((?P<arg>.+)\)\s+as\s+"
    r"(?P<alias>[A-Za-z0-9_]+)$",
    re.I | re.S,
)

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

#: inner join of two distinct topics (optionally GROUP BY)
_JOIN_SHAPE = re.compile(
    r"^\s*select\s+(?P<select>.+?)\s+from\s+(?P<t1>[A-Za-z0-9_]+)"
    r"(?:\s+(?:as\s+)?(?P<a1>[A-Za-z0-9_]+))?"
    r"\s+(?:inner\s+)?join\s+(?P<t2>[A-Za-z0-9_]+)"
    r"(?:\s+(?:as\s+)?(?P<a2>[A-Za-z0-9_]+))?"
    r"\s+on\s+(?P<on>.+?)"
    r"(?:\s+where\s+(?P<where>.+?))?"
    r"(?:\s+group\s+by\s+(?P<group>.+?))?\s*;?\s*$",
    re.I | re.S,
)
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


@dataclass
class MvAnalysis:
    """Delta-refresh plan for a single- or two-topic materialized view."""

    table: str  # the FROM identifier (the topic's registered view name)
    mode: str  # "spf" | "agg" | "spf_join"
    keys: list[str] = field(default_factory=list)  # agg: group-key out cols
    aggs: dict[str, str] = field(default_factory=dict)  # agg: out col -> fn
    out_cols: list[str] = field(default_factory=list)  # agg: select order
    table2: str | None = None  # spf_join: the second topic


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
    if m is None or _BANNED.search(sql):
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
    keys, aggs, out_cols = parsed
    if group is None and not aggs:
        return None
    return MvAnalysis(table=table, mode="agg", keys=keys, aggs=aggs, out_cols=out_cols)


def _classify_agg_select(select_items, group_exprs):
    """Split select items into (keys, aggs, out_cols) for the
    mergeable-aggregate modes; None when any item disqualifies."""
    keys: list[str] = []
    aggs: dict[str, str] = {}
    out_cols: list[str] = []
    for item in select_items:
        am = _AGG_ITEM.match(item.strip())
        if am is not None:
            arg = am.group("arg")
            if re.match(r"^\s*distinct\b", arg, re.I) or _ANY_AGG.search(arg):
                return None  # DISTINCT agg / nested agg: not mergeable
            alias = am.group("alias")
            aggs[alias] = am.group("fn").lower()
            out_cols.append(alias)
            continue
        if _ANY_AGG.search(item):
            return None  # an aggregate shape we can't merge (avg, expr-of-aggs, …)
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
    return keys, aggs, out_cols


def _analyze_join(sql: str) -> MvAnalysis | None:
    """Inner join of two DISTINCT topics (see module docstring):
    SPF (``spf_join``) or mergeable GROUP BY aggregate (``agg_join`` —
    the fact-join-dim rollup; the join-delta terms arrive already
    partially aggregated and merge with the snapshot exactly like the
    single-topic agg mode).

    Self-joins are rejected: the delta identity needs the two sides
    bound to different file subsets simultaneously, which one view
    name cannot express. Outer flavors / subqueries reject.
    """
    m = _JOIN_SHAPE.match(sql)
    if m is None or _BANNED_JOIN.search(sql):
        return None
    t1, t2 = m.group("t1"), m.group("t2")
    if t1.lower() == t2.lower():
        return None
    group = m.group("group")
    if group is None:
        if _ANY_AGG.search(m.group("select")):
            return None  # global agg over a join: not yet supported
        return MvAnalysis(table=t1, mode="spf_join", table2=t2)
    parsed = _classify_agg_select(
        _split_top_level(m.group("select")),
        [_norm(g) for g in _split_top_level(group)],
    )
    if parsed is None:
        return None
    keys, aggs, out_cols = parsed
    if not aggs:
        return None  # distinct-keys over a join: keep it simple, full
    return MvAnalysis(
        table=t1, mode="agg_join", table2=t2,
        keys=keys, aggs=aggs, out_cols=out_cols,
    )

