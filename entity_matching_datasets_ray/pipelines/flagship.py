"""Flagship wiring: driver testdata -> spans table -> linkage clusters.

``docs_from_documents_table`` adapts the driver's flat ``documents``
parquet table into the mandated interleaved spans shape (BASELINE.json
input_hint) so the flagship linkage pipeline can run over driver data;
``synthetic_linkage`` runs it over the seeded duplicate corpus with ground
truth (the F1-gated path).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from ..schema import DOCS_SCHEMA
from ..synth import synth_docs_table, truth_pairs
from .linkage import LinkageConfig, run_linkage


def docs_from_documents_table(sf_dir: str):
    """documents.parquet (doc_id, text, lang, source) -> spans-table docs.

    Each row becomes one document whose text spans carry ``name=<text>``
    and ``category=<lang>`` payloads (plus a media span derived from the
    source, exercising media pass-through)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"])

    def to_spans(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        langs = t.column("lang").to_pylist()
        sources = t.column("source").to_pylist()
        rows = []
        for i, txt, lang, src in zip(ids, texts, langs, sources):
            spans = [
                {"kind": "text", "text": f"name={txt}", "media_ref": "", "offset": 0},
                {"kind": "text", "text": f"category={lang}", "media_ref": "", "offset": 1},
                {
                    "kind": "image",
                    "text": "",
                    "media_ref": f"synthetic://img/{src}/{i}",
                    "offset": 2,
                },
            ]
            rows.append({"doc_id": f"doc:{i:010d}", "dataset": "documents", "spans": spans})
        return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)

    return ds.map_batches(to_spans, batch_format="pyarrow")


def flagship_clusters(sf_dir: str, num_partitions: int = 8):
    """Near-dup entity clusters over the driver's documents table."""
    docs = docs_from_documents_table(sf_dir)
    cfg = LinkageConfig(num_partitions=num_partitions, scorer_concurrency=(1, 4))
    return run_linkage(docs, cfg)


def synthetic_linkage(n_entities: int = 200, num_partitions: int = 8):
    """Seeded duplicate corpus -> clusters (+ gold pairs for F1)."""
    docs = rd.from_arrow(synth_docs_table(n_entities))
    gold = rd.from_arrow(truth_pairs(n_entities))
    clusters = run_linkage(docs, LinkageConfig(num_partitions=num_partitions))
    return clusters, gold


def docs_with_planted_media(sf_dir: str, group: int = 250):
    """documents.parquet -> spans-table docs where the media span of doc i
    reuses the ref of group ``i % group`` — a planted media-duplicate
    corpus whose dedup answer is SQL-derivable from the id column alone
    (the planted-fixture pattern): every doc in a group carries the SAME
    media object, so exact media dedup must pair each group's min doc
    with every other member."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_spans(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        rows = []
        for i, txt in zip(ids, texts):
            spans = [
                {"kind": "text", "text": f"name={txt}", "media_ref": "", "offset": 0},
                {
                    "kind": "image",
                    "text": "",
                    "media_ref": f"synthetic://img/{int(i) % group}",
                    "offset": 1,
                },
            ]
            rows.append({"doc_id": f"doc:{int(i):010d}", "dataset": "planted_media", "spans": spans})
        return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)

    return ds.map_batches(to_spans, batch_format="pyarrow")
