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
    features are a pure hash of the ref (stable across runs/workers).

    Per-item SEMANTIC retry + fallback (SURVEY.md §2.3 A3): unlike the
    deterministic text kernels (where Ray task retries are the only
    failure mode that matters), media decode hits transient IO/codec
    errors at scale. Each ref is attempted ``retries + 1`` times; an item
    that still fails gets the zero-vector fallback and is COUNTED in the
    ``decode_failures`` metric column — the metered-not-silent rule."""

    def __init__(self, decoder: str = "fake", retries: int = 2, decode_fn=None):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        if decoder == "real" and decode_fn is None:
            raise NotImplementedError(
                "real image/audio decoding requires PIL/torchvision/librosa, "
                "which are not installed in this environment; use decoder='fake' "
                "or inject decode_fn"
            )
        self.decoder = decoder
        self.retries = retries
        self.decode_fn = decode_fn or _fake_decode

    def _decode_with_retry(self, ref: str) -> tuple[np.ndarray, int]:
        for _attempt in range(self.retries + 1):
            try:
                return self.decode_fn(ref), 0
            except Exception:
                continue
        return np.zeros(MEDIA_FEATURE_DIM, dtype=np.float32), 1

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        failures = 0
        rows = []
        for r in refs:
            vec, failed = self._decode_with_retry(r or "")
            failures += failed
            rows.append(vec.tolist())
        out = batch.append_column(
            "media_feature", pa.array(rows, pa.list_(pa.float32(), MEDIA_FEATURE_DIM))
        )
        return out.append_column(
            "decode_failures", pa.array([failures] * batch.num_rows, pa.int64())
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


def media_dedup_pairs(docs, num_partitions: int | None = 16, concurrency=(1, 4)):
    """Exact media-level dedup pairs over the decoded feature space:
    (canonical_doc, duplicate_doc) for every media span whose feature
    vector is identical to another's — the multimodal composition pipeline
    (span flatten -> actor-pool featurize -> fingerprint groupby -> star
    pairs), decode stubbed as everywhere else (``decoder="fake"``).

    Scale shape: ONE groupby shuffle keyed on a bounded BUCKET (hash % 64)
    of the 64-bit siphash of the feature vector (rows carry doc_id + the
    8-float feature, nothing else) — two-level grouping, so Ray dispatches
    at most 64 groups while the per-fp work happens in a pandas groupby
    inside; inside an fp group the canonical member is the lexicographic
    min doc and emission is the star pattern (O(k) per group, the CC-safe
    form). Hash collisions cannot produce false pairs: each group
    re-checks exact feature equality against the canonical member before
    emitting (the fingerprint only routes, the FEATURE decides).
    """
    import pandas as pd

    n_buckets = max(64, 16 * (num_partitions or 16))
    feats = featurize_media(docs, concurrency=concurrency)

    def add_fp(t: pa.Table) -> pa.Table:
        arr = np.asarray(t.column("media_feature").combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        )).reshape(t.num_rows, MEDIA_FEATURE_DIM)
        fp = pd.util.hash_pandas_object(
            pd.DataFrame(arr), index=False
        ).to_numpy(dtype=np.uint64)
        out = t.select(["doc_id", "media_feature"]).append_column(
            "fp", pa.array(fp, pa.uint64())
        )
        # two-level grouping: fp is ~distinct per media object, so a
        # groupby("fp") would dispatch one Ray-level map_groups per
        # object (10^9 tiny calls at 10^9 media rows). Shuffle on a
        # bounded bucket of the fp instead; the pandas groupby inside
        # per_group does the per-fp work (the fusion/blocking idiom).
        # Bucket count scales with the asked partitioning so one group
        # is ~1/(16*partitions) of the corpus, not a fixed 1/64.
        return out.append_column(
            "fp_bucket",
            pa.array((fp % np.uint64(n_buckets)).astype(np.int32), pa.int32()),
        )

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        lefts, rights = [], []
        for _, g in df.groupby("fp", sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values("doc_id")
            feats_arr = np.stack(g["media_feature"].to_numpy())
            same = (feats_arr == feats_arr[0]).all(axis=1)
            members = g["doc_id"].to_numpy()[same]
            if len(members) < 2:
                continue
            lefts.extend([members[0]] * (len(members) - 1))
            rights.extend(members[1:])
        if not lefts:
            empty = df["doc_id"].iloc[0:0]
            return pd.DataFrame({"left_id": empty, "right_id": empty})
        return pd.DataFrame({"left_id": lefts, "right_id": rights})

    return (
        feats.map_batches(add_fp, batch_format="pyarrow")
        .groupby("fp_bucket", num_partitions=num_partitions)
        .map_groups(per_group, batch_format="pandas")
    )


def _fake_probe(ref: str) -> dict:
    """Deterministic stand-in media metadata, derived from the NUMERIC
    tail of the ref when present (so tests/oracles can re-derive it in
    SQL) else from the ref hash: original dims + frame count."""
    tail = ref.rsplit("/", 1)[-1]
    g = int(tail) if tail.isdigit() else int.from_bytes(
        hashlib.blake2b(ref.encode(), digest_size=4).digest(), "little"
    )
    return {
        "orig_h": 240 + 16 * (g % 5),
        "orig_w": 320 + 16 * (g % 7),
        "n_frames": 1 + (g % 4),
    }


class FrameSampler:
    """Actor-pool stage: one media row -> one row per sampled frame
    (doc_id, media_ref, frame_idx, frame_feature). The real decoder
    (PyAV/ffmpeg) is gated exactly like MediaFeaturizer; the fake probe
    derives a deterministic frame count so the expansion is testable and
    SQL-oracle-checkable. Batch expansion happens inside the actor — one
    input batch in, one (larger) Arrow batch out; no per-frame tasks."""

    def __init__(self, decoder: str = "fake", max_frames: int = 8, probe_fn=None):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        if decoder == "real" and probe_fn is None:
            raise NotImplementedError(
                "real frame sampling requires an ffmpeg/PyAV decode, not "
                "installed here; use decoder='fake' or inject probe_fn"
            )
        self.max_frames = max_frames
        self.probe_fn = probe_fn or _fake_probe

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, refs = batch.column("doc_id").to_pylist(), batch.column("media_ref").to_pylist()
        o_ids, o_refs, o_idx, o_feat = [], [], [], []
        for d, r in zip(doc_ids, refs):
            n = min(self.max_frames, int(self.probe_fn(r or "")["n_frames"]))
            for f in range(n):
                o_ids.append(d)
                o_refs.append(r)
                o_idx.append(f)
                o_feat.append(_fake_decode(f"{r}#frame{f}").tolist())
        return pa.table(
            {
                "doc_id": pa.array(o_ids, pa.string()),
                "media_ref": pa.array(o_refs, pa.string()),
                "frame_idx": pa.array(o_idx, pa.int32()),
                "frame_feature": pa.array(o_feat, pa.list_(pa.float32(), MEDIA_FEATURE_DIM)),
            }
        )


def sample_frames(docs, max_frames: int = 8, concurrency=(1, 4), batch_size: int = 512):
    """docs -> media spans -> per-frame rows (actor pool; small batches —
    the output is a fan-out of the input)."""
    media = extract_media_refs(docs)
    return media.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"max_frames": max_frames},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ResizePlanner:
    """Actor-pool stage: media rows -> integer resize plan
    (orig_h, orig_w, out_h, out_w) targeting a fixed height with
    aspect-preserving integer width ((w * target) // h — exact integer
    math, SQL-reproducible). The pixel resample itself is the gated
    decode step; the PLAN (dims, layout, batching) is the Ray-side
    contract a real kernel drops into."""

    def __init__(self, target_h: int = 64, decoder: str = "fake", probe_fn=None):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        if decoder == "real" and probe_fn is None:
            raise NotImplementedError(
                "real resize requires PIL/opencv, not installed here; "
                "use decoder='fake' or inject probe_fn"
            )
        self.target_h = target_h
        self.probe_fn = probe_fn or _fake_probe

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        metas = [self.probe_fn(r or "") for r in refs]
        oh = pa.array([m["orig_h"] for m in metas], pa.int32())
        ow = pa.array([m["orig_w"] for m in metas], pa.int32())
        out_w = pa.array(
            [(m["orig_w"] * self.target_h) // m["orig_h"] for m in metas], pa.int32()
        )
        out = batch.append_column("orig_h", oh).append_column("orig_w", ow)
        out = out.append_column(
            "out_h", pa.array([self.target_h] * batch.num_rows, pa.int32())
        )
        return out.append_column("out_w", out_w)


def plan_resize(docs, target_h: int = 64, concurrency=(1, 4), batch_size: int = 1024):
    media = extract_media_refs(docs)
    return media.map_batches(
        ResizePlanner,
        fn_constructor_kwargs={"target_h": target_h},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
