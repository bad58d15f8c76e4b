"""Span extraction + deterministic normalization stage.

Input: the mandated docs table (``doc_id``, ``spans``); output: a flat
entity table with normalized feature columns, with the original ``spans``
column passed through untouched (zero-copy — the column is never rebuilt)
so the per-row span-sequence invariant holds by construction.

This stage is the engine's replacement for the reference's two-pass
COL/VAL parsing + per-dataset LLM normalization
(/root/reference/Converters/computers/dcm.py:39-87,
/root/reference/DeepMather/*/prompt.py): a single vectorized
``map_batches`` over Arrow batches, stateless (plain function, not an
actor — nothing to warm up).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import normalizers as N
from ..schema import ENTITY_FIELDS

# Columns the extract stage adds beyond pass-through + raw fields.
DERIVED_COLUMNS = [
    "norm_name",
    "norm_brand",
    "price_num",
    "phone_norm",
    "date_iso",
    "snm_key",
    "skeleton_key",
]


def extract_entities(batch: pa.Table) -> pa.Table:
    """docs batch -> flat entity batch (raw ``spans`` passed through).

    Text spans carry ``field=value``; field payloads map onto the fixed
    ENTITY_FIELDS schema (absent -> null, mirroring the reference's
    union-schema inference with ""-fill: dcm.py:82-87, but with Arrow
    nulls instead of empty-string sentinels).
    """
    spans = batch.column("spans").combine_chunks()
    flat = spans.flatten()  # struct array of all spans (zero-copy view)
    parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    kinds = flat.field("kind").to_pylist()
    texts = flat.field("text").to_pylist()

    n = batch.num_rows
    field_vals: dict[str, list] = {f: [None] * n for f in ENTITY_FIELDS}
    for row, kind, text in zip(parents, kinds, texts):
        if kind == "text" and text:
            k, _, v = text.partition("=")
            if k in field_vals:
                field_vals[k][row] = v

    cols: dict[str, pa.Array] = {}
    for f in ENTITY_FIELDS:
        cols[f] = pa.array(field_vals[f], pa.string())

    names = field_vals["name"]
    norm_names = [N.normalize_name(v) for v in names]
    cols["norm_name"] = pa.array(norm_names, pa.string())
    cols["norm_brand"] = pa.array(
        [N.normalize_name(v) if v is not None else None for v in field_vals["brand"]],
        pa.string(),
    )
    cols["price_num"] = pa.array(
        [N.parse_price(v) for v in field_vals["price"]], pa.float64()
    )
    cols["phone_norm"] = pa.array(
        [N.normalize_phone_us(v) for v in field_vals["phone"]], pa.string()
    )
    cols["date_iso"] = pa.array(
        [N.normalize_date_iso(v) for v in field_vals["released"]], pa.string()
    )
    # sorted-neighborhood key: token-reordered normalized name (first tokens
    # sorted so that word-order noise lands in the same neighborhood).
    snm = []
    skeleton = []
    for nn in norm_names:
        toks = sorted(nn.split(" ")) if nn else []
        snm.append(" ".join(toks[:6]))
        # skeleton: per-token first char + last char + length, order-free —
        # invariant under interior adjacent-char typos and word reorder;
        # an exact-key blocking pass catches typo'd duplicates LSH misses.
        skeleton.append(
            " ".join(sorted(f"{t[0]}{t[-1]}{len(t)}" for t in toks)) if toks else None
        )
    cols["snm_key"] = pa.array(snm, pa.string())
    cols["skeleton_key"] = pa.array(skeleton, pa.string())

    out = batch  # pass-through: doc_id, dataset, spans stay zero-copy
    for name, arr in cols.items():
        out = out.append_column(name, arr)
    return out


def extract_stage(ds, batch_size: int = 2048):
    """docs Dataset -> entity Dataset."""
    return ds.map_batches(extract_entities, batch_format="pyarrow", batch_size=batch_size)


def token_rows(batch: pa.Table) -> pa.Table:
    """Explode norm_name into (token) rows for the IDF fit (partial
    pre-aggregation: one row per distinct token per batch with its count,
    so the global groupby shuffles far fewer rows — SURVEY.md §2.5)."""
    counts: dict[str, int] = {}
    for nn in batch.column("norm_name").to_pylist():
        if not nn:
            continue
        for t in set(nn.split(" ")):
            counts[t] = counts.get(t, 0) + 1
    return pa.table(
        {
            "token": pa.array(list(counts.keys()), pa.string()),
            "df": pa.array(list(counts.values()), pa.int64()),
        }
    )
