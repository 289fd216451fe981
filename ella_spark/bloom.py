"""Per-shard Bloom filters for driver-side point-lookup skipping.

The manifest's min/max ranges (maintenance.build_manifest) prune
shards for RANGE predicates, but only discriminate when shards are
clustered on the column. Point lookups on a high-cardinality,
UNCLUSTERED column (the "fetch document <id>" / "fetch session <key>"
shape) see every shard's range straddle the probe value, so ranges
skip nothing. A Bloom filter per (shard, column) answers "might this
shard contain value v?" with no false negatives, which is exactly the
soundness contract manifest skipping needs: a ``might contain`` shard
is read, a ``definitely not`` shard is skipped, rows are never lost.
This is the Iceberg puffin / Delta bloom-index design, held in the
same manifest file the range stats already live in.

Cost model (why this stays driver-side): a filter sized for fpp=0.01
costs ~9.6 bits per DISTINCT value. At the default 1024-row shard
that is ~1.2 KB/column; compacted day shards amortize far better
(one filter covers the whole merged file). The manifest grows
O(total distinct values) for each opted-in column — which is why
blooms are opt-in per topic/column (Maintainer ``bloom_cols``), not
automatic like the free footer ranges.

Hashing: the classic Kirsch-Mitzenmacher double-hashing scheme over
one md5 digest — build and probe both happen driver-side in Python,
so the only requirement is self-consistency plus a canonical byte
encoding per type (int/str/bytes/float/bool are tagged so int 1,
float 1.0 and True hash differently, matching strict equality).
"""

from __future__ import annotations

import hashlib
import math

#: target false-positive probability for manifest blooms
DEFAULT_FPP = 0.01


def _canon(value) -> bytes:
    """Canonical tagged byte encoding (self-consistent build/probe)."""
    if isinstance(value, bool):
        return b"?:1" if value else b"?:0"
    if isinstance(value, int):
        return b"i:" + str(value).encode()
    if isinstance(value, float):
        # repr round-trips doubles exactly; integral floats stay float
        return b"f:" + repr(value).encode()
    if isinstance(value, str):
        return b"s:" + value.encode("utf-8")
    if isinstance(value, (bytes, bytearray)):
        return b"b:" + bytes(value)
    raise TypeError(f"bloom: unsupported value type {type(value).__name__}")


def _h1_h2(value, m: int) -> tuple[int, int]:
    d = hashlib.md5(_canon(value)).digest()
    h1 = int.from_bytes(d[:8], "little") % m
    # force h2 odd so (h1 + i*h2) % m cycles well for any m
    h2 = (int.from_bytes(d[8:16], "little") | 1) % m or 1
    return h1, h2


def bloom_build(values, fpp: float = DEFAULT_FPP) -> dict:
    """Build a serializable Bloom filter over an iterable of values.

    Sized from the DISTINCT count (m = -n ln fpp / ln^2 2,
    k = m/n ln 2 — the textbook optimum), returned as a manifest-JSON
    friendly dict ``{"m": bits, "k": hashes, "h": hex}``. None values
    are ignored (SQL equality never matches NULL).
    """
    distinct = set()
    for v in values:
        if v is not None:
            distinct.add(v)
    n = max(1, len(distinct))
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    # Round m up to a power of two: h2 is forced odd, and odd is
    # coprime with 2^j, so the Kirsch-Mitzenmacher probe sequence
    # (h1 + i*h2) % m is full-cycle for every filter size. With odd m
    # the residue could share a factor with m, shortening the cycle
    # and inflating the effective false-positive rate past the target.
    m = 1 << (m - 1).bit_length()
    k = max(1, round(m / n * math.log(2)))
    bits = bytearray((m + 7) // 8)
    for v in distinct:
        h1, h2 = _h1_h2(v, m)
        for i in range(k):
            pos = (h1 + i * h2) % m
            bits[pos >> 3] |= 1 << (pos & 7)
    return {"m": m, "k": k, "h": bytes(bits).hex()}


def bloom_might_contain(b: dict, value) -> bool:
    """Probe a serialized filter; True on any malformed input (a
    broken bloom must degrade to 'read the shard', never skip)."""
    try:
        m, k = int(b["m"]), int(b["k"])
        bits = bytes.fromhex(b["h"])
        if m <= 0 or k <= 0 or len(bits) < (m + 7) // 8:
            return True
        h1, h2 = _h1_h2(value, m)
        for i in range(k):
            pos = (h1 + i * h2) % m
            if not (bits[pos >> 3] >> (pos & 7)) & 1:
                return False
        return True
    except (KeyError, TypeError, ValueError):
        return True


def coerce_for(dtype: str, v):
    """Coerce a probe/build value to the column's logical type so SQL
    equality semantics survive hashing (int 5 must hit a float column
    holding 5.0; everything funnels through one canonical Python type
    per column)."""
    if v is None:
        return None
    if dtype.startswith(("int", "uint")):
        return int(v)
    if dtype.startswith("float"):
        return float(v)
    if dtype == "string":
        return str(v)
    if dtype == "bool":
        return bool(v)
    return v
