"""Multimodal span handling: media columns as opaque refs/bytes with typed
metadata; decode / feature-extract as actor-pool stages.

The image/audio codec libraries are not available in this environment, so
the *decode* kernels are stubs behind ``decoder="fake"`` (deterministic
feature from the ref hash) / ``decoder="real"`` (raises NotImplementedError
with the dependency named). Everything Ray-side — schema, batching, actor
signature, output layout — is real and tested: swapping in a real decoder
is a one-function change inside the actor.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_FEATURE_DIM = 8


def extract_media_refs(docs):
    """docs (doc_id, spans) -> one row per media span:
    (doc_id, span_index, kind, media_ref). Zero-copy list flatten."""
    import pyarrow.compute as pc

    def explode(t: pa.Table) -> pa.Table:
        spans = t.column("spans").combine_chunks()
        flat = spans.flatten()
        parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        kinds = flat.field("kind")
        mask = pc.not_equal(kinds, pa.scalar("text")).to_numpy(zero_copy_only=False)
        doc_ids = np.asarray(t.column("doc_id").to_pylist())
        offsets = flat.field("offset").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[parents[mask]], pa.string()),
                "span_offset": pa.array(offsets[mask], pa.int32()),
                "kind": kinds.filter(pa.array(mask)),
                "media_ref": flat.field("media_ref").filter(pa.array(mask)),
            }
        )

    return docs.map_batches(explode, batch_format="pyarrow")


def _fake_decode(ref: str) -> np.ndarray:
    """Deterministic stand-in feature vector: 8 floats from the ref hash."""
    h = hashlib.blake2b(ref.encode(), digest_size=MEDIA_FEATURE_DIM * 4).digest()
    return (
        np.frombuffer(h, dtype=np.uint32).astype(np.float32) / np.float32(2**32)
    )


class MediaFeaturizer:
    """Actor-pool stage: media refs -> fixed-dim feature vectors.

    ``__init__`` is where a real model/codec would load once per actor
    (SURVEY.md §2.3 A1); with ``decoder='fake'`` it compiles nothing and
    features are a pure hash of the ref (stable across runs/workers)."""

    def __init__(self, decoder: str = "fake"):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        if decoder == "real":
            raise NotImplementedError(
                "real image/audio decoding requires PIL/torchvision/librosa, "
                "which are not installed in this environment; use decoder='fake'"
            )
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        feats = np.stack([_fake_decode(r or "") for r in refs]) if refs else np.zeros(
            (0, MEDIA_FEATURE_DIM), dtype=np.float32
        )
        return batch.append_column(
            "media_feature",
            pa.array([row.tolist() for row in feats], pa.list_(pa.float32(), MEDIA_FEATURE_DIM)),
        )


def featurize_media(docs, concurrency=(1, 4), batch_size: int = 1024):
    """docs -> (doc_id, span_offset, kind, media_ref, media_feature).

    Small batch size on purpose: with real decoded payloads (images/audio)
    a batch x concurrency must fit in a worker's heap.
    """
    refs = extract_media_refs(docs)
    return refs.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs=dict(decoder="fake"),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
