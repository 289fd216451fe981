"""End-to-end corpus-curation pipeline composition.

The individual operators (quality gates, exact dedup, benchmark
decontamination, deterministic mixture resampling) each exist as
registry queries; real training-data preparation chains them. This
module composes the chain as ONE Catalyst plan — no intermediate
materialization, filters stay pushable, and the whole pipeline is:

    map-only gates
    -> one shuffle on the 16-byte content digest (dedup window)
    -> broadcast anti-join on digests (decontamination)
    -> map-only hash gate (resampling)

Scale: the only shuffle carries (digest, doc_id, small metadata) —
document bodies never move; the benchmark digest set is broadcast
(small by definition); every gate is a stateless expression,
reproducible on any cluster size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

#: Knuth multiplicative-hash constants (same gate as q_mix_resample).
#: The gate reduces doc_id mod 2^31 BEFORE multiplying: 2^31 * KNUTH
#: ~= 5.7e18 stays inside int64, whereas a raw doc_id * KNUTH wraps
#: silently for doc_id >= ~3.5e9 (realistic at 100 TB document
#: counts) and would diverge from the DuckDB oracle's checked
#: arithmetic. Same formula text on both sides.
KNUTH = 2654435761
M31 = 2**31
M32 = 2**32


def content_digest(text_col: str = "text") -> F.Column:
    """Normalized-content md5 digest — the dedup/decontamination key."""
    return F.md5(F.lower(F.trim(F.col(text_col))).cast("binary"))


def curate(
    docs: DataFrame,
    min_chars: int = 80,
    max_chars: int = 20_000,
    benchmark: DataFrame | None = None,
    keep_permille: int = 500,
) -> DataFrame:
    """Quality-gate, dedup, decontaminate, and resample ``docs``.

    ``benchmark``: held-out documents whose content must not leak into
    training data (anti-joined by digest). ``keep_permille``: fraction
    kept by the deterministic doc_id hash gate (1000 = keep all).

    Returns surviving (doc_id, lang, n_chars) rows.
    """
    h = content_digest()
    gated = docs.where(
        F.col("n_chars").between(min_chars, max_chars)
    ).select("doc_id", "lang", "n_chars", h.alias("_h"))

    # exact dedup: first (lowest doc_id) survivor per digest
    w = Window.partitionBy("_h").orderBy("doc_id")
    deduped = (
        gated.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

    out = deduped
    if benchmark is not None:
        bench = benchmark.select(content_digest().alias("_h")).distinct()
        out = out.join(F.broadcast(bench), "_h", "left_anti")

    if keep_permille < 1000:
        gate = (F.col("doc_id") % F.lit(M31)) * F.lit(KNUTH) % F.lit(M32) % 1000
        out = out.where(gate < keep_permille)
    return out.select("doc_id", "lang", "n_chars")


def curate_stream(
    docs,
    min_chars: int = 80,
    max_chars: int = 20_000,
    benchmark: DataFrame | None = None,
    keep_permille: int = 500,
    watermark_delay: str = "10 minutes",
    time_col: str = "time",
):
    """Streaming form of :func:`curate` — the same pipeline stages on
    a live document stream (``db.subscribe(topic)``):

    * quality gate + resample gate: stateless maps, identical code;
    * exact dedup: ``dropDuplicatesWithinWatermark`` on the content
      digest — state holds one digest per distinct doc inside the
      watermark horizon (bounded), duplicates dedup across
      micro-batches as long as they arrive within ``watermark_delay``
      of each other;
    * decontamination: stream-static broadcast anti-join (the
      benchmark digest set is a static frame — Spark re-joins it per
      micro-batch with no state).

    The first-wins survivor differs from the batch form's min-doc_id
    survivor only when duplicates race inside one horizon — inherent
    to unbounded processing, documented here rather than hidden.
    """
    h = content_digest("text")
    gated = docs.where(
        F.col("n_chars").between(min_chars, max_chars)
    ).select(time_col, "doc_id", "lang", "n_chars", h.alias("_h"))

    from ella_spark.streaming import with_event_time

    deduped = (
        with_event_time(gated, time_col)
        .withWatermark("_event_time", watermark_delay)
        .dropDuplicatesWithinWatermark(["_h"])
        .drop("_event_time")
    )

    out = deduped
    if benchmark is not None:
        bench = benchmark.select(content_digest().alias("_h")).distinct()
        out = out.join(F.broadcast(bench), "_h", "left_anti")

    if keep_permille < 1000:
        gate = (F.col("doc_id") % F.lit(M31)) * F.lit(KNUTH) % F.lit(M32) % 1000
        out = out.where(gate < keep_permille)
    return out.select("doc_id", "lang", "n_chars")
