"""Skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join splitting (enabled in session.PERF_CONFS) handles
most runtime skew; these explicit operators cover the cases AQE
can't — a single pathological hot key in a shuffle join, and hot-key
aggregations where the map-side combine alone is not enough. Both are
pure DataFrame rewrites: deterministic, no RDDs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join resilient to hot keys on the (large) ``left`` side.

    Left rows get a deterministic salt in [0, salt); each right row is
    replicated once per salt value. The shuffle key becomes
    (keys..., _salt), spreading a hot key over ``salt`` reducers at the
    cost of replicating the right side salt×: use when right is the
    smaller side but too big to broadcast.

    Only ``inner`` and left-outer/semi/anti joins are correct here:
    with a right/full join, every unmatched right row was replicated
    ``salt`` times and would surface as ``salt`` duplicate null-padded
    output rows.
    """
    normalized = how.lower().replace("_", "")
    if normalized in {"right", "rightouter", "full", "fullouter", "outer",
                      "rightsemi", "rightanti"}:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched right rows "
            "are replicated salt times (use inner/left/left_semi/left_anti)"
        )
    l_salted = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()), F.lit(salt))
    )
    r_salted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<bigint>"))
    )
    out = l_salted.join(r_salted, keys + ["_salt"], how)
    return out.drop("_salt")


def salted_agg_sum(
    df: DataFrame, keys: list[str], value_cols: list[str], salt: int = 16
) -> DataFrame:
    """Two-phase sum aggregation for hot grouping keys.

    Phase 1 shuffles on (keys, salt) — a hot key spreads over ``salt``
    partial groups; phase 2 combines the (tiny) partials. Output
    columns: keys + ``sum_<col>``.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt))
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[F.sum(c).alias(f"_p_{c}") for c in value_cols]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"_p_{c}").alias(f"sum_{c}") for c in value_cols]
    )
