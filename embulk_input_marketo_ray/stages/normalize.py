"""Typed projection + schema evolution + content fingerprint.

One vectorized ``map_batches`` stage (actor pool, so the resolved
evolution schedule is built once per worker) that re-expresses:

- the all-string -> typed lazy projection
  (AllStringJacksonServiceRecord.java:44-78, visitor shape
  MarketoUtils.java:230-267) via pyarrow.compute casts/strptime;
- null-literal normalization ("" / "null" -> null,
  CsvTokenizer.java:490-514);
- the ``mk_`` column-name prefix (MarketoUtils.java:95-98);
- in-flight schema evolution (FIXTURES.md F2): dynamic attribute
  columns added / widened per the evolution log. Every batch is
  projected to the FINAL resolved schema (missing-at-that-seq values
  are null; widened columns parse to the widened type), because Arrow
  block concat and the downstream groupby require schema-aligned
  blocks (SURVEY.md §7.3 "Schema evolution mid-stream");
- the per-row ``content_sha256`` invariant (BASELINE.json:input_hint).
"""

from __future__ import annotations

import pyarrow as pa

from embulk_input_marketo_ray.functions.scalar import parse_typed, sha256_column
from embulk_input_marketo_ray.types import arrow_type_for, prefixed, widen

BASE_COLUMNS = ["repo", "path", "commit", "lang", "content"]
COMPANION_COLUMNS = ["commit_seq", "event_ts", "op"]
ATTR_PREFIX = "attr_"


def resolve_final_fields(evolution_log: list[dict]) -> dict[str, str]:
    """Fold the evolution log (add_column / widen_type events in
    effective_seq order) into {column_name: final_marketo_type}.

    The widening follows the int -> float -> string lattice of the
    Marketo type table (model/MarketoField.java:73-116)."""
    fields: dict[str, str] = {}
    for ev in sorted(evolution_log, key=lambda e: e["effective_seq"]):
        if ev["kind"] == "add_column":
            fields[ev["column"]] = ev["to_type"]
        elif ev["kind"] == "widen_type":
            cur = fields.get(ev["column"], ev["from_type"])
            fields[ev["column"]] = widen(cur, ev["to_type"])
        else:
            raise ValueError(f"unknown evolution kind {ev['kind']!r}")
    return fields


def filter_invalid_events(batch: pa.Table, metrics=None) -> pa.Table:
    """Dead-letter filter for the flagship change-event stream — the
    engine analog of the reference's invalid-record policy (M7,
    CsvTokenizer.java stray-record handling; the activity target's
    filter lives in stages/static_schema.py). An event is invalid when
    its upsert key (repo, path), version (commit_seq) or op is null,
    or the op is unknown. Drops are counted in the metrics actor as
    ``events_invalid`` (A1-style accounting) instead of poisoning the
    lake with null-keyed rows."""
    import pyarrow.compute as pc

    mask = pc.is_valid(batch.column("repo"))
    for c in ("path", "commit_seq", "op"):
        mask = pc.and_kleene(mask, pc.is_valid(batch.column(c)))
    mask = pc.and_kleene(
        mask, pc.is_in(batch.column("op"), value_set=pa.array(["upsert", "delete"]))
    )
    mask = pc.fill_null(mask, False)
    n_valid = pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
    dropped = batch.num_rows - n_valid
    if dropped == 0:
        return batch
    if metrics is not None:
        import ray as _ray

        _ray.get(metrics.inc.remote("events_invalid", dropped))
    return batch.filter(mask)


class ChangeEventNormalizer:
    """Actor-pool batch transform: raw change events -> typed lake rows.

    ``included_fields`` is the case-insensitive keep-list over the
    dynamic (described) fields — the ``included_fields`` config of the
    reference (delegate/LeadServiceResponseMapperBuilder.java:47-76);
    base/companion columns are always kept. ``prefix`` is the
    ``column_prefix`` config (default ``mk``)."""

    def __init__(
        self,
        evolution_log: list[dict],
        prefix: str = "mk",
        included_fields: list[str] | None = None,
    ) -> None:
        fields = resolve_final_fields(evolution_log)
        if included_fields is not None:
            keep = {f.lower() for f in included_fields}
            fields = {n: t for n, t in fields.items() if n.lower() in keep}
        self.fields = fields
        self.prefix = prefix

    def final_schema(self) -> pa.Schema:
        cols = [(c, pa.string()) for c in BASE_COLUMNS]
        cols += [("commit_seq", pa.int64()), ("event_ts", pa.timestamp("us")), ("op", pa.string())]
        cols.append(("content_sha256", pa.string()))
        cols += [
            (prefixed(name, self.prefix), arrow_type_for(mtype))
            for name, mtype in sorted(self.fields.items())
        ]
        return pa.schema(cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, pa.ChunkedArray | pa.Array] = {}
        for c in BASE_COLUMNS + COMPANION_COLUMNS:
            out[c] = batch.column(c)
        out["content_sha256"] = sha256_column(batch.column("content"))
        n = batch.num_rows
        for name, mtype in sorted(self.fields.items()):
            src = ATTR_PREFIX + name
            if src in batch.column_names:
                col = parse_typed(batch.column(src), mtype)
            else:  # column not yet present in this block's source schema
                col = pa.nulls(n, type=arrow_type_for(mtype))
            out[prefixed(name, self.prefix)] = col
        return pa.table(out)
