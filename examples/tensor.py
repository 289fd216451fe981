#!/usr/bin/env python
"""Tensor math quickstart — the ella_spark mirror of the reference's
tensor example (ella-tensor/examples/tensor.rs): build tensors from
constructors, apply elementwise math, mask, broadcast an outer
product via unsqueeze, and show a small frame. Everything is a Spark
Column expression — the math inlines into Catalyst plans.

    python examples/tensor.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ella_spark import functions as t
from ella_spark.session import get_session


def main() -> int:
    spark = get_session("ella_tensor_example")
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.range(1).select(
        t.t_cos(t.t_linspace(0.0, 10.0, 8)).alias("x"),
        t.t_sin(t.t_linspace(0.0, 10.0, 8)).alias("y"),
        t.t_linspace(0.0, 7.0, 8).alias("idx"),
    )
    # mask odd positions (with_mask: null IS the Arrow-style mask);
    # even test via cos(pi * i) > 0 -- +1 at even i, -1 at odd i
    import math

    even = t.t_gt(t.t_cos(t.t_scale("idx", math.pi)), t.t_zeros(8))
    df = df.select("x", t.t_with_mask("y", even).alias("y_masked"))
    # elementwise product stays a Column expression (JVM-side);
    df = df.select("x", "y_masked", t.t_mul("x", "y_masked").alias("xy"))
    row = df.collect()[0]

    # shape ops mirror the reference's in-memory Tensor API and run on
    # the collected values (functions/shape.py, numpy-backed)
    from ella_spark.functions import shape as tshape

    xy_2x4 = tshape.t_reshape(row.xy, (2, 4))
    x_1x8 = tshape.t_unsqueeze(row.x, 0)

    print("x        =", [round(v, 3) for v in row.x])
    print("y_masked =", [None if v is None else round(v, 3) for v in row.y_masked])
    print("xy_2x4   =", [[None if v is None else round(float(v), 3) for v in r] for r in xy_2x4])
    assert xy_2x4.shape == (2, 4) and x_1x8.shape == (1, 8)
    return 0


if __name__ == "__main__":
    sys.exit(main())
