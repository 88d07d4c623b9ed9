"""embulk_input_marketo_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch re-expression of treasure-data/embulk-input-marketo's
semantics (watermark-sliced incremental pulls, paged fetch, per-object
dedup, metadata-driven schema evolution, exactly-once-style resume) as
an idiomatic Ray Data pipeline over a Parquet change-event table of
source-code repositories keyed ``(repo, path)`` with commit order as
the monotonic version.

Reference semantics are cited per-module as ``file:line`` relative to
``/root/reference/`` (embulk-input-marketo v0.6.29). No reference code
is copied; the execution engine is Ray Data (Dataset -> map_batches
over zero-copy Arrow -> hash-bucketed groupby merge -> exactly-once
Parquet sink).
"""

__version__ = "0.1.0"
