"""Operators beyond the reference's surface: dedup, similarity search,
multimodal columns (SURVEY.md §7 Phase 4). Explicit package init —
zipimport (addPyFile shipping) does not support namespace packages."""

from ella_spark.operators import dedup, multimodal, similarity  # noqa: F401
