"""events.ts physical-type drift: both parquet layouts must surface
the same epoch-ns LongType through load_table / scan_events_range.

Round 1-2 testdata stored ts as TIMESTAMP(NANOS) (read as long via
nanosAsLong); round 3 switched to TIMESTAMP(MICROS) (TIMESTAMP_NTZ).
The loader must keep both readable forever — the driver may flip
again.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

NS = [1_704_067_200_000_000_000 + i * 1_000_000_000 for i in range(10)]


def _write_events(tmpdir, unit: str) -> str:
    ts = pa.array([t // (1000 if unit == "us" else 1) for t in NS],
                  type=pa.timestamp(unit))
    table = pa.table(
        {
            "event_id": pa.array(range(10), type=pa.int64()),
            "ts": ts,
            "user_id": pa.array([i % 3 for i in range(10)], type=pa.int64()),
            "event_type": pa.array(["click"] * 10),
            "value": pa.array([float(i) for i in range(10)]),
            "props": pa.array(["{}"] * 10),
        }
    )
    path = str(tmpdir / f"sf_{unit}")
    import os

    os.makedirs(path, exist_ok=True)
    pq.write_table(table, f"{path}/events.parquet")
    return path


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_load_table_normalizes_to_epoch_ns(unit, spark, tmp_path):
    from ella_spark.sources import load_table

    sf = _write_events(tmp_path, unit)
    df = load_table(spark, sf, "events")
    assert dict(df.dtypes)["ts"] == "bigint"
    got = sorted(r.ts for r in df.select("ts").collect())
    assert got == NS


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_scan_events_range_prunes_and_normalizes(unit, spark, tmp_path):
    from ella_spark.sources import scan_events_range

    sf = _write_events(tmp_path, unit)
    lo, hi = NS[2], NS[5]
    df = scan_events_range(spark, sf, lo, hi)
    got = sorted(r.ts for r in df.select("ts").collect())
    assert got == [NS[2], NS[3], NS[4]]
    # the range predicate must reach the parquet scan on the NATIVE column
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts," in plan
