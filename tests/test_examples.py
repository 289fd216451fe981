"""The examples/ scripts are part of the public surface (a reference
user's first contact) — run each one in-process so they can never rot.
They reuse the shared test SparkSession via the engine's
getOrCreate-based default session."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

from tests.conftest import REPO  # noqa: F401  (sys.path side effect)

EXAMPLES = Path(__file__).resolve().parents[1] / "examples"


def _load(name: str):
    spec = importlib.util.spec_from_file_location(name, EXAMPLES / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_pubsub_example(spark, tmp_path):
    assert _load("pubsub").main(str(tmp_path)) == 0


def test_tensor_example(spark):
    assert _load("tensor").main() == 0


def test_drift_dashboard_example(spark, tmp_path):
    assert _load("drift_dashboard").main(str(tmp_path)) == 0


def test_curation_pipeline_example(spark):
    assert _load("curation_pipeline").main("/root/testdata/sf0.001") == 0


def test_dedup_profiling_example(spark, tmp_path):
    assert _load("dedup_profiling").main(str(tmp_path)) == 0


def test_ingest_monitor_example(spark, tmp_path):
    assert _load("ingest_monitor").main(str(tmp_path)) == 0
