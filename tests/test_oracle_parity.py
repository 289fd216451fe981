"""Local mimic of the driver's correctness gate: run every registered
query on Spark AND its DuckDB oracle, compare row count, schema, and
order-insensitive values.

This is intentionally stricter than row counts — it normalizes both
sides to pandas, sorts columns by name and rows by all columns, and
compares cell values exactly (floats to 9 significant digits, which is
far looser than the queries' own explicit round() calls but catches
real mismatches).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from tests.conftest import SF_ORACLE


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64").map(
                lambda v: None
                if pd.isna(v)
                else (0.0 if v == 0 else round(v, 9 - 1 - int(math.floor(math.log10(abs(v))))))
            )
        elif pd.api.types.is_bool_dtype(s):
            s = s.astype("boolean")
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("Int64")
        out[c] = s
    norm = pd.DataFrame(out)
    norm = norm.sort_values(by=list(norm.columns), ignore_index=True, na_position="first")
    return norm


def _query_names():
    from ella_spark.queries import _load, REGISTRY

    _load()
    return sorted(REGISTRY)


@pytest.mark.parametrize("name", _query_names())
def test_parity(name, spark, duck):
    from ella_spark.queries import REGISTRY

    spec = REGISTRY[name]
    sdf = spec.spark(spark, SF_ORACLE)
    spark_pd = sdf.toPandas()
    assert len(spark_pd) >= 0  # smoke: runs

    if spec.oracle is None:
        pytest.skip(f"{name}: no oracle (rows-only check); covered by unit tests")

    duck_pd = duck.execute(spec.oracle).fetch_df()
    assert len(spark_pd) == len(duck_pd), (
        f"{name}: row count spark={len(spark_pd)} duck={len(duck_pd)}"
    )
    a, b = _normalize(spark_pd), _normalize(duck_pd)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} vs {list(b.columns)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True, obj=name)
