"""Arrow schemas for the engine's tables.

The mandated pipeline input (BASELINE.json ``input_hint``) is a Lance-style
table of interleaved text + media documents:

    doc_id: string
    spans:  list<struct<kind: string, text: string,
                        media_ref: string, offset: int32>>

Text spans carry ``field=value`` payloads (one span per entity field, in
schema order); media spans carry a ``media_ref`` URI and empty text. The
per-row invariant the pipeline must preserve end-to-end is the exact
``(kind, text, media_ref, offset)`` sequence of each row's spans.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

DOCS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("dataset", pa.string()),  # corpus family tag (partitioning key)
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

PAIRS_SCHEMA = pa.schema(
    [
        ("left_doc_id", pa.string()),
        ("right_doc_id", pa.string()),
        ("label", pa.int8()),
    ]
)

# Flat entity record extracted from text spans (stages/extract.py). The raw
# ``spans`` column is passed through untouched for the invariant check.
ENTITY_FIELDS = [
    "name",
    "brand",
    "category",
    "modelno",
    "price",
    "authors",
    "venue",
    "year",
    "addr",
    "city",
    "phone",
    "abv",
    "style",
    "artist",
    "album",
    "released",
    "time",
]


def spans_from_fields(
    fields: list[tuple[str, str]], media_refs: list[str] | None = None
) -> list[dict]:
    """Pack (field, value) pairs into a text-span list, interleaving the
    given media refs at deterministic positions (after every 3rd text span).
    Offsets are monotonically increasing within the row."""
    spans: list[dict] = []
    offset = 0
    media = list(media_refs or [])
    for i, (k, v) in enumerate(fields):
        spans.append({"kind": "text", "text": f"{k}={v}", "media_ref": "", "offset": offset})
        offset += 1
        if media and i % 3 == 2:
            spans.append(
                {"kind": "image", "text": "", "media_ref": media.pop(0), "offset": offset}
            )
            offset += 1
    for ref in media:
        spans.append({"kind": "image", "text": "", "media_ref": ref, "offset": offset})
        offset += 1
    return spans


def fields_from_spans(spans: list[dict]) -> dict[str, str]:
    """Inverse of ``spans_from_fields`` for text spans: ``field=value`` ->
    dict. Media spans are ignored here (handled by multimodal stages)."""
    out: dict[str, str] = {}
    for sp in spans:
        if sp["kind"] == "text" and sp["text"]:
            k, _, v = sp["text"].partition("=")
            out[k] = v
    return out
