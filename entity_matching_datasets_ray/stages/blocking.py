"""Multi-pass blocking: sorted-neighborhood, MinHash-LSH, exact keys.

Produces candidate pairs ``(left_id, right_id, src)`` with
``left_id < right_id``. Three independent pass families whose union drives
recall (the reference consumes pre-joined benchmark pairs —
/root/reference/DeepMather/*/train.csv — our engine *produces* the pairing,
SURVEY.md §2.4 J1/J2):

- **SNM**: bucket by the first token of the token-sorted normalized name,
  sort within bucket by the full key, emit pairs within a sliding window.
  Partitioning assumption: a neighborhood never spans buckets whose first
  sorted tokens differ (word-order noise is absorbed by token sorting;
  first-token edits are caught by the LSH and skeleton passes instead).
- **LSH**: MinHash over char-3-gram shingles of the normalized name,
  banded; docs sharing any band bucket become candidates. Shingles (not
  word tokens) keep band collision probability high under typos.
- **exact keys**: equality blocks on strong identifiers
  (brand+modelno, phone, typo-invariant name skeleton).

Physical plan note (scale): the groupbys here use **two-level grouping** —
block keys are hashed into ``num_buckets`` coarse buckets, Ray shuffles by
bucket, and a pandas-level groupby inside each bucket walks the real
blocks. This keeps the number of Ray-level groups (and their per-group
dispatch overhead) bounded regardless of how many distinct block keys
exist; ``num_buckets`` scales with cluster size, not key cardinality.

Skew handling: hot blocks (non-discriminative keys — near-stopword bands,
boilerplate names at 100 TB) never emit O(k^2): above ``max_pairs_per_
block`` a block switches to a bounded star + sliding-window pattern
(``_emit_capped``) that keeps every member connected for the downstream
components while emitting O(k) pairs. Pairs not emitted are counted in the
``overflow`` column of the pair stream so dropped coverage is metered,
never silent. SNM windows are intrinsically O(k*window).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import (
    band_key_matrix,
    batch_shingle_hashes,
    make_perm_params,
    minhash_signature_flat,
)

PAIR_COLUMNS = ["left_id", "right_id", "src"]

# Fan-out of the two-level grouping. On an N-node cluster raise this to
# ~4-8x the total core count so buckets stay small and balanced.
DEFAULT_NUM_BUCKETS = 64

_HASH_SEED = np.uint64(0x9E3779B97F4A7C15)


# --------------------------------------------------------------------------
# hot-key salting (north rule: "explicit salting of hot blocking keys")
# --------------------------------------------------------------------------

# A hot key's rows all land in ONE reduce group of the bucketed shuffle —
# capped emission bounds the PAIR count, but the group itself must fit in
# one task's memory, which a boilerplate key at 10^12 docs does not.
# Salting splits a hot key into ``salt_factor`` sub-blocks BEFORE the
# shuffle. Each member is placed in sub-blocks s and (s+1) mod S — the
# overlap means consecutive sub-blocks share ~k/S members, so the
# per-sub-block star emission keeps the whole key one connected component
# without any cross-bucket coordination pass. Hot keys are found with a
# deterministic 1/SALT_SAMPLE_MOD row-sample census (a hot key at any
# meaningful threshold is dense in the sample).
SALT_SAMPLE_MOD = 64
DEFAULT_SALT_THRESHOLD = 20_000
DEFAULT_SALT_FACTOR = 16

_SALT_MIX = np.uint64(0xC2B2AE3D27D4EB4F)


def _find_hot_keys(keyed, salt_threshold: int, num_partitions: int | None) -> np.ndarray:
    """Sampled census over the key table -> sorted uint64 array of hot
    key64 values."""
    from ray.data.aggregate import Sum

    def sample_counts(t: pa.Table) -> pa.Table:
        ids = pd.Series(t.column("doc_id").to_pylist(), dtype=object)
        h = pd.util.hash_pandas_object(ids, index=False).to_numpy(dtype=np.uint64)
        mask = (h % np.uint64(SALT_SAMPLE_MOD)) == 0
        if not mask.any():
            return pa.table({"key64": pa.array([], pa.uint64()), "n": pa.array([], pa.int64())})
        keys = t.column("key64").to_numpy(zero_copy_only=False)[mask]
        uniq, cnt = np.unique(keys, return_counts=True)
        # int64 VIEW of the uint64 key: Ray's hash aggregate can't carry
        # uint64 group keys (falls back to pickled objects)
        return pa.table(
            {"key64": pa.array(uniq.view(np.int64), pa.int64()), "n": pa.array(cnt, pa.int64())}
        )

    counts = (
        keyed.map_batches(sample_counts, batch_format="pyarrow")
        .groupby("key64", num_partitions=num_partitions)
        .aggregate(Sum("n", alias_name="n"))
    )
    min_sampled = max(1, salt_threshold // SALT_SAMPLE_MOD)
    parts = []
    for b in counts.iter_batches(batch_size=65536, batch_format="pyarrow"):
        ks = b["key64"].to_numpy(zero_copy_only=False).astype(np.int64)
        ns = b["n"].to_numpy(zero_copy_only=False)
        parts.append(ks[ns >= min_sampled])
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.sort(np.concatenate(parts).view(np.uint64))


def _salt_keys(keyed, hot: np.ndarray, salt_factor: int):
    """Rewrite hot-key rows into overlapping salted sub-keys (2 rows per
    hot row: salt s and s+1 mod S); cold rows pass through untouched."""
    import ray

    hot_ref = ray.put(hot)

    class Salter:
        def __init__(self):
            self.hot = ray.get(hot_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t.column("key64").to_numpy(zero_copy_only=False)
            is_hot = np.isin(keys, self.hot)
            if not is_hot.any():
                return t
            cold = t.filter(pa.array(~is_hot))
            hot_t = t.filter(pa.array(is_hot))
            ids = pd.Series(hot_t.column("doc_id").to_pylist(), dtype=object)
            h = pd.util.hash_pandas_object(ids, index=False).to_numpy(dtype=np.uint64)
            salt = (h % np.uint64(salt_factor)).astype(np.uint64)
            hk = hot_t.column("key64").to_numpy(zero_copy_only=False)

            def sub(tbl, s_arr):
                with np.errstate(over="ignore"):
                    nk = (hk * _SALT_MIX) ^ (s_arr + np.uint64(1))
                return tbl.set_column(
                    tbl.schema.get_field_index("key64"), "key64", pa.array(nk, pa.uint64())
                )

            a = sub(hot_t, salt)
            b = sub(hot_t, (salt + np.uint64(1)) % np.uint64(salt_factor))
            return pa.concat_tables([cold, a, b]).combine_chunks()

    return keyed.map_batches(Salter, batch_format="pyarrow", concurrency=(1, 4))




def _str_bucket(values: list, num_buckets: int) -> pa.Array:
    """Vectorized deterministic bucket assignment over string keys (pandas
    siphash with its fixed default key — stable across workers)."""
    h = pd.util.hash_pandas_object(pd.Series(values, dtype=object), index=False).to_numpy(
        dtype=np.uint64
    )
    return pa.array((h % np.uint64(num_buckets)).astype(np.int32), pa.int32())


def _u64_bucket(arr: pa.Array, num_buckets: int) -> pa.Array:
    with np.errstate(over="ignore"):
        h = arr.to_numpy(zero_copy_only=False) * _HASH_SEED
    return pa.array((h % np.uint64(num_buckets)).astype(np.int32), pa.int32())


def _pairs_frame(left: list, right: list, src: str, overflow: int = 0) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "left_id": pd.Series(left, dtype=str),
            "right_id": pd.Series(right, dtype=str),
            "src": pd.Series([src] * len(left), dtype=str),
            "overflow": pd.Series([overflow] * len(left), dtype=np.int64),
        }
    )


def _emit_all(ids, left: list, right: list):
    """All unordered pairs of a sorted-ascending id block, vectorized
    (np.triu_indices): ids[i] <= ids[j] for i < j, so orientation is free."""
    n = len(ids)
    if n < 2:
        return
    ii, jj = np.triu_indices(n, 1)
    arr = np.asarray(ids)
    left.extend(arr[ii].tolist())
    right.extend(arr[jj].tolist())


def _cmp_arr(ids) -> np.ndarray:
    """ids as a numpy OBJECT array: comparisons loop in C over python
    compares, and np.where / tolist pick existing str REFERENCES instead
    of materializing new strings. Measured against both alternatives
    (r4): fixed-width-unicode astype loses 1.5-3x at every block size
    (tolist re-creates every string); a per-row python loop wins below
    ~100 rows but loses 1.7x at 1000 — object arrays are at parity small
    and fastest large. Emission is NOT the blocking bottleneck either
    way (~0.2 s/1.7M pairs single-thread vs the ~11 s stage wall — the
    shuffle and key emission dominate)."""
    return np.asarray(ids)


def _pairs_extend(a: np.ndarray, b: np.ndarray, left: list, right: list):
    """Append two aligned id arrays as (min, max)-oriented pairs."""
    if len(a) == 0:
        return
    swap = a > b
    left.extend(np.where(swap, b, a).tolist())
    right.extend(np.where(swap, a, b).tolist())


def _emit_window(ids, window: int, left: list, right: list):
    """Sliding-window pairs, vectorized: shifted-array zips
    ``(ids[:-j], ids[j:])`` for j = 1..window with vectorized min/max
    orientation — the same pair set as a per-row nested loop."""
    n = len(ids)
    if n < 2:
        return
    arr = _cmp_arr(ids)
    for j in range(1, min(window, n - 1) + 1):
        _pairs_extend(arr[:-j], arr[j:], left, right)


def _emit_window_delta(
    ids, is_new, window: int, left: list, right: list, cross_only: bool = False
):
    """Sliding-window pairs touching at least one NEW row (delta blocking:
    old x old pairs were already emitted by the run that built the
    existing clusters). ``cross_only=True`` (two-table A x B linkage)
    keeps only pairs with EXACTLY one new side — new x new pairs are
    never emitted, not merely filtered downstream."""
    n = len(ids)
    if n < 2:
        return
    arr = _cmp_arr(ids)
    flags = np.asarray(is_new, dtype=bool)
    for j in range(1, min(window, n - 1) + 1):
        fa, fb = flags[:-j], flags[j:]
        mask = (fa != fb) if cross_only else (fa | fb)
        _pairs_extend(arr[:-j][mask], arr[j:][mask], left, right)


def _emit_capped_delta(
    ids, is_new, max_pairs: int, left: list, right: list, cross_only: bool = False
) -> int:
    """Delta variant of ``_emit_capped``: all new-touching pairs when small
    (new x new + new x old), bounded star + window above the cap. The star
    hub is the block's min id (old or new) so new members stay reachable
    from the existing component.

    ``cross_only=True``: only old x new pairs exist (two-table linkage —
    there is no connected-components stage downstream, so the capped
    branch anchors its star at the min OLD id, every spoke a valid cross
    pair). Callers pass ids sorted ascending."""
    n = len(ids)
    flags = np.asarray(is_new, dtype=bool)
    n_new = int(flags.sum())
    if n_new == 0:
        return 0
    arr = _cmp_arr(ids)
    n_old = n - n_new
    if cross_only:
        total = n_new * n_old
        if total == 0:
            return 0
        new_ids = arr[flags]
        old_ids = arr[~flags]
        if total <= max_pairs:
            _pairs_extend(
                np.repeat(old_ids, n_new), np.tile(new_ids, n_old), left, right
            )
            return 0
        window = max(1, max_pairs // (2 * n))
        before = len(left)
        _pairs_extend(
            np.full(n_new, old_ids[0], dtype=arr.dtype), new_ids, left, right
        )
        _emit_window_delta(arr, flags, window, left, right, cross_only=True)
        return max(0, total - (len(left) - before))
    total = n_new * (n_new - 1) // 2 + n_new * n_old
    if total <= max_pairs:
        # per-NEW-row emission, O(total) memory — a full triu over the
        # block would be O(n^2) even when one new row touches a 20k-old
        # block (total = n-1 but triu = 2e8 indices). Each new row p
        # pairs with every row after it plus every OLD row before it
        # (new x new pairs counted once, by the later row). ids sorted
        # ascending: orientation is positional.
        for p in np.flatnonzero(flags):
            if p + 1 < n:
                left.extend([arr[p]] * (n - p - 1))
                right.extend(arr[p + 1:].tolist())
            pre = np.flatnonzero(~flags[:p])
            if len(pre):
                left.extend(arr[pre].tolist())
                right.extend([arr[p]] * len(pre))
        return 0
    window = max(1, max_pairs // (2 * n))
    before = len(left)
    hub = arr[0]
    new_tail = arr[1:][flags[1:]]
    _pairs_extend(np.full(len(new_tail), hub, dtype=arr.dtype), new_tail, left, right)
    _emit_window_delta(arr, flags, window, left, right)
    return max(0, total - (len(left) - before))


def _emit_capped(ids, max_pairs: int, left: list, right: list) -> int:
    """All pairs when the block is small; for hot blocks, a bounded
    star + sliding-window pattern over the sorted ids.

    A block whose membership is huge is weakly discriminative (the key is
    near-stopword), so full O(k^2) emission buys little recall at enormous
    cost. The star (everyone ↔ min id) plus a window keeps every member
    reachable for connected components while bounding emission to O(k +
    window*k). Returns the number of pairs *not* emitted (overflow metric).
    """
    n = len(ids)
    total = n * (n - 1) // 2
    if total <= max_pairs:
        _emit_all(ids, left, right)
        return 0
    window = max(1, max_pairs // (2 * n))
    hub = ids[0]  # ids are sorted ascending
    for i in range(1, n):
        left.append(hub)
        right.append(ids[i])
    _emit_window(ids, window, left, right)
    emitted = (n - 1) + min(total, window * n)
    return max(0, total - emitted)


# --------------------------------------------------------------------------
# pass 1: sorted-neighborhood
# --------------------------------------------------------------------------


def snm_pairs(
    entities,
    window: int = 10,
    max_block_size: int = 5000,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    num_partitions: int | None = None,
):
    """Sorted-neighborhood blocking (see module docstring).

    Neighborhood unit = all rows sharing a first sorted token; rows are
    ordered by the full snm_key within it and compared within ``window``.
    """

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t.column("snm_key").to_pylist()
        first = [k.split(" ", 1)[0] if k else None for k in keys]
        out = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "snm_key": t.column("snm_key"),
                "snm_first": pa.array(first, pa.string()),
            }
        )
        out = out.filter(pc.is_valid(out["snm_first"]))
        return out.append_column(
            "bucket", _str_bucket(out.column("snm_first").to_pylist(), num_buckets)
        )

    keyed = entities.select_columns(["doc_id", "snm_key"]).map_batches(
        add_bucket, batch_format="pyarrow"
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        left: list = []
        right: list = []
        overflow = 0
        df = df.sort_values(["snm_first", "snm_key", "doc_id"])
        for _, g in df.groupby("snm_first", sort=False):
            ids = g["doc_id"].to_numpy()
            if len(ids) > max_block_size:
                overflow += len(ids) - max_block_size
                ids = ids[:max_block_size]
            _emit_window(ids, window, left, right)
        return _pairs_frame(left, right, "snm", overflow)

    return keyed.groupby("bucket", num_partitions=num_partitions).map_groups(
        per_bucket, batch_format="pandas"
    )


def snm_pairs_global(
    entities,
    window: int = 10,
    num_partitions: int | None = None,
):
    """TRUE sorted-neighborhood blocking: one global range-partitioned
    ``ds.sort`` over the full SNM key, windowed pair emission inside each
    sorted block, and an exact boundary exchange for windows spanning
    block edges.

    Unlike ``snm_pairs`` (first-token bucketing), a neighborhood here may
    span any key prefix — the letter of SURVEY.md §2.4 J2 / the north
    star's "sorted-neighborhood on normalized name keys".

    Mechanics:
    - sort key = ``snm_key + \\x1f + doc_id`` — globally unique, so the
      total order (and the emitted pair set) is deterministic under any
      partitioning.
    - in-block windowed pairs: one ``map_batches`` over whole blocks of
      the sorted Dataset (zero extra shuffle — the sort already moved the
      rows).
    - boundary exchange, fully DISTRIBUTED: the driver only ever sees the
      tiny per-block (first-key, size) rank table — one row per block —
      from which it derives exact global offsets, broadcast via
      ``ray.put``. The boundary rows themselves (first/last ``window``
      rows of each block) never leave the cluster: each is tagged with
      its exact global position, chunked by ``gpos // window``, emitted
      into its own chunk and the previous one, and a ``groupby("grp")``
      shuffle co-locates every <=window-gap cross-block pair in exactly
      one ~O(window)-row group where a task emits it (anchored at the
      left row's native chunk, so no duplicates). Windows spanning 3+
      blocks are handled exactly because any fully-interior block shorter
      than 2 x window contributes all of its rows.
    """
    import pyarrow.compute as pc

    def add_key(t: pa.Table) -> pa.Table:
        out = pa.table({"doc_id": t.column("doc_id"), "snm_key": t.column("snm_key")})
        out = out.filter(
            pc.and_(pc.is_valid(out["snm_key"]), pc.not_equal(out["snm_key"], pa.scalar("")))
        )
        sk = pc.binary_join_element_wise(out["snm_key"], out["doc_id"], "\x1f")
        return out.append_column("sort_key", sk)

    keyed = entities.select_columns(["doc_id", "snm_key"]).map_batches(
        add_key, batch_format="pyarrow"
    )
    if num_partitions:
        keyed = keyed.repartition(num_partitions)
    # narrow (doc_id, key) table, materialized once for the two consumers
    s = keyed.sort("sort_key").materialize()

    def in_block(df: pd.DataFrame) -> pd.DataFrame:
        ids = df.sort_values("sort_key")["doc_id"].to_numpy()
        left: list = []
        right: list = []
        _emit_window(ids, window, left, right)
        return _pairs_frame(left, right, "snm", 0)

    pairs_within = s.map_batches(in_block, batch_format="pandas", batch_size=None)

    import ray

    # driver-side state: ONE row per block (first sort key, size) — from
    # which exact global offsets and block ranks follow. O(num_blocks),
    # never O(window x num_blocks) rows.
    def block_meta(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "blk_first": pd.Series([], dtype=str),
                    "blk_n": pd.Series([], dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {
                "blk_first": [df["sort_key"].min()],
                "blk_n": [np.int64(len(df))],
            }
        )

    blocks = (
        s.map_batches(block_meta, batch_format="pandas", batch_size=None)
        .to_pandas()
        .sort_values("blk_first")
        .reset_index(drop=True)
    )
    if len(blocks) == 0:
        return pairs_within
    offsets = np.concatenate([[0], blocks["blk_n"].to_numpy().cumsum()[:-1]])
    maps_ref = ray.put(
        (
            dict(zip(blocks["blk_first"], offsets.astype(np.int64))),
            {k: i for i, k in enumerate(blocks["blk_first"])},
        )
    )

    def boundary_rows(df: pd.DataFrame) -> pd.DataFrame:
        """First/last ``window`` rows of the block, tagged with exact
        global position + block rank, duplicated into chunk ``gpos //
        window`` and the previous chunk so every <=window-gap pair
        co-locates in at least the left row's native chunk group."""
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=str),
                "gpos": pd.Series([], dtype=np.int64),
                "blk": pd.Series([], dtype=np.int64),
                "grp": pd.Series([], dtype=np.int64),
            }
        )
        df = df.sort_values("sort_key").reset_index(drop=True)
        n = len(df)
        if n == 0:
            return empty
        off_map, blk_idx = ray.get(maps_ref)
        first = df["sort_key"].iloc[0]
        off, rank = off_map[first], blk_idx[first]
        idx = np.asarray(
            sorted(set(range(min(window, n))) | set(range(max(0, n - window), n))),
            dtype=np.int64,
        )
        gpos = off + idx
        ids = df["doc_id"].to_numpy()[idx]
        chunk = gpos // window
        parts = [pd.DataFrame({"doc_id": ids, "gpos": gpos, "blk": rank, "grp": chunk})]
        keep = chunk >= 1
        if keep.any():
            parts.append(
                pd.DataFrame(
                    {
                        "doc_id": ids[keep],
                        "gpos": gpos[keep],
                        "blk": rank,
                        "grp": chunk[keep] - 1,
                    }
                )
            )
        return pd.concat(parts, ignore_index=True)

    bd = s.map_batches(boundary_rows, batch_format="pandas", batch_size=None)

    def emit_cross(df: pd.DataFrame) -> pd.DataFrame:
        """Each group holds ~O(window) boundary rows spanning two
        consecutive gpos chunks; emit the cross-block pairs anchored here
        (left row's native chunk == this group), gap <= window."""
        grp = int(df["grp"].iloc[0])
        df = df.drop_duplicates("gpos").sort_values("gpos")
        g = df["gpos"].to_numpy()
        ids = df["doc_id"].to_numpy()
        blk = df["blk"].to_numpy()
        left: list = []
        right: list = []
        m = len(df)
        for i in range(m):
            if g[i] // window != grp:
                continue  # anchored in the next group — emitted there
            for j in range(i + 1, m):
                if g[j] - g[i] > window:
                    break
                if blk[i] == blk[j]:
                    continue  # in-block pairs already emitted
                a, b = ids[i], ids[j]
                if a <= b:
                    left.append(a)
                    right.append(b)
                else:
                    left.append(b)
                    right.append(a)
        return _pairs_frame(left, right, "snm", 0)

    cross = bd.groupby("grp").map_groups(emit_cross, batch_format="pandas")
    return pairs_within.union(cross)


# --------------------------------------------------------------------------
# pass 2: MinHash-LSH
# --------------------------------------------------------------------------


class BandEmitter:
    """Stateful map_batches callable: MinHash signatures -> band rows.

    Permutation parameters are derived once per actor in ``__init__`` from
    the config seed (pure function — every actor computes identical
    parameters, no coordination needed). SURVEY.md §2.3 A4."""

    def __init__(self, num_perm: int = 32, num_bands: int = 8, seed: int = 42):
        self.a, self.b = make_perm_params(num_perm, seed)
        self.num_bands = num_bands
        self.rows_per_band = num_perm // num_bands
        # char 3-gram shingles, not word tokens: a one-token typo perturbs
        # only ~3 shingles, keeping MinHash Jaccard (and band collision
        # probability) high for true duplicates. Hashing is batch-
        # vectorized (hashing.batch_shingle_hashes); this memo maps packed
        # gram -> uint64 so each DISTINCT gram hits blake2b once per actor
        # (the corpus-wide 3-gram vocabulary is tiny vs its occurrences).
        self._shingle_memo: dict[int, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        names = batch.column("norm_name").to_pylist()
        flat, lens = batch_shingle_hashes(names, self._shingle_memo)
        sigs = minhash_signature_flat(flat, lens, self.a, self.b)
        # empty names never block
        nz = lens > 0
        keys = band_key_matrix(sigs[nz], self.num_bands, self.rows_per_band)
        doc_idx = np.repeat(np.flatnonzero(nz), self.num_bands)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").take(pa.array(doc_idx)),
                "band": pa.array(keys.ravel(), pa.uint64()),
            }
        )


def lsh_pairs(
    entities,
    num_perm: int = 32,
    num_bands: int = 8,
    seed: int = 42,
    max_pairs_per_block: int = 20000,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    num_partitions: int | None = None,
    concurrency: int | tuple | None = None,
):
    """MinHash-LSH blocking: doc -> band rows -> bucketed groupby -> pairs."""

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", _u64_bucket(t.column("band").combine_chunks(), num_buckets)
        )

    bands = (
        entities.select_columns(["doc_id", "norm_name"])
        .map_batches(
            BandEmitter,
            fn_constructor_kwargs=dict(num_perm=num_perm, num_bands=num_bands, seed=seed),
            batch_format="pyarrow",
            batch_size=4096,
            concurrency=concurrency or (1, max(4, (num_partitions or 8) // 2)),
        )
        .map_batches(add_bucket, batch_format="pyarrow")
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        left: list = []
        right: list = []
        overflow = 0
        for _, g in df.groupby("band", sort=False):
            ids = np.sort(g["doc_id"].to_numpy())
            overflow += _emit_capped(ids, max_pairs_per_block, left, right)
        return _pairs_frame(left, right, "lsh", overflow)

    return bands.groupby("bucket", num_partitions=num_partitions).map_groups(
        per_bucket, batch_format="pandas"
    )


# --------------------------------------------------------------------------
# pass 3: exact-key blocks
# --------------------------------------------------------------------------


def exact_key_pairs(
    entities,
    key_columns: list[str],
    src: str,
    max_pairs_per_block: int = 20000,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
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
        out = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "block_key": pa.array(keys, pa.string()),
            }
        )
        out = out.filter(pc.is_valid(out["block_key"]))
        return out.append_column(
            "bucket", _str_bucket(out.column("block_key").to_pylist(), num_buckets)
        )

    keyed = entities.select_columns(["doc_id"] + key_columns).map_batches(
        add_key, batch_format="pyarrow"
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        left: list = []
        right: list = []
        overflow = 0
        for _, g in df.groupby("block_key", sort=False):
            ids = np.sort(g["doc_id"].to_numpy())
            overflow += _emit_capped(ids, max_pairs_per_block, left, right)
        return _pairs_frame(left, right, src, overflow)

    return keyed.groupby("bucket", num_partitions=num_partitions).map_groups(
        per_bucket, batch_format="pandas"
    )


# --------------------------------------------------------------------------
# union + exact pair dedup
# --------------------------------------------------------------------------


def dedup_pairs(
    pairs,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    num_partitions: int | None = None,
    min_lsh_collisions: int = 1,
):
    """Exact candidate-pair dedup across blocking passes.

    Bucket by pair-content hash, shuffle by bucket, pandas
    ``drop_duplicates`` within bucket — the engine-level analogue of the
    reference's md5 pair cache (wdc/computers/prompt.py:169): identical
    work is detected *before* the expensive scoring stage.

    ``min_lsh_collisions > 1`` additionally PRE-RANKS the candidates by
    evidence: a pair backed only by LSH band collisions must have collided
    in at least that many bands to reach the scorer (single-band collisions
    are dominated by low-Jaccard noise), while pairs with any non-LSH
    evidence (SNM neighborhood, exact key) always survive. Since all of a
    pair's occurrences hash to the same bucket, the collision count is
    exact. Dropped pairs are metered in the ``pruned`` column (per-bucket
    count carried on every surviving row, like ``overflow``), never
    silent.
    """

    def add_bucket(t: pa.Table) -> pa.Table:
        df = t.select(["left_id", "right_id"]).to_pandas()
        h = pd.util.hash_pandas_object(df, index=False).to_numpy(dtype=np.uint64)
        b = (h % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("bucket", pa.array(b, pa.int32()))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if min_lsh_collisions <= 1:
            out = df.drop_duplicates(["left_id", "right_id"])[
                ["left_id", "right_id", "src"]
            ].copy()
            out["pruned"] = np.int64(0)
            return out
        is_lsh = (df["src"] == "lsh").to_numpy()
        g = pd.DataFrame(
            {
                "left_id": df["left_id"].to_numpy(),
                "right_id": df["right_id"].to_numpy(),
                "src": df["src"].to_numpy(),
                "n_lsh": is_lsh.astype(np.int64),
                "n_any": np.ones(len(df), dtype=np.int64),
            }
        ).groupby(["left_id", "right_id"], sort=False, as_index=False).agg(
            src=("src", "first"), n_lsh=("n_lsh", "sum"), n_any=("n_any", "sum")
        )
        keep = (g["n_any"] > g["n_lsh"]) | (g["n_lsh"] >= min_lsh_collisions)
        out = g.loc[keep, ["left_id", "right_id", "src"]].copy()
        out["pruned"] = np.int64((~keep).sum())
        return out

    return (
        pairs.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket", num_partitions=num_partitions)
        .map_groups(per_bucket, batch_format="pandas")
    )


def candidate_pairs_multi_pass(
    entities,
    window: int = 10,
    num_perm: int = 32,
    num_bands: int = 8,
    seed: int = 42,
    num_partitions: int | None = None,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    exact_keys: tuple[tuple[str, ...], ...] = (
        ("norm_brand", "modelno"),
        ("phone_norm",),
        ("skeleton_key",),
    ),
    snm_strategy: str = "bucket",
    min_lsh_collisions: int = 1,
):
    """Union of the separate blocking passes, exact-deduped (reference
    formulation: one shuffle per pass + a dedup shuffle).

    ``snm_strategy``: "bucket" (first-sorted-token neighborhoods, one
    groupby) or "global" (true sorted-neighborhood: global sort + exact
    boundary exchange, ``snm_pairs_global``). At low parallelism this
    multi-pass plan beats the fused single-shuffle plan (measured: 50 s vs
    81 s blocking at 4 CPUs); ``candidate_pairs_auto`` picks per run."""
    if snm_strategy == "global":
        snm = snm_pairs_global(entities, window=window, num_partitions=num_partitions)
    else:
        snm = snm_pairs(entities, window=window, num_buckets=num_buckets, num_partitions=num_partitions)
    passes = [
        snm,
        lsh_pairs(
            entities,
            num_perm=num_perm,
            num_bands=num_bands,
            seed=seed,
            num_buckets=num_buckets,
            num_partitions=num_partitions,
        ),
    ]
    for i, cols in enumerate(exact_keys):
        passes.append(
            exact_key_pairs(
                entities,
                list(cols),
                f"exact{i}",
                num_buckets=num_buckets,
                num_partitions=num_partitions,
            )
        )
    unioned = passes[0]
    for p in passes[1:]:
        unioned = unioned.union(p)
    return dedup_pairs(
        unioned,
        num_buckets=num_buckets,
        num_partitions=num_partitions,
        min_lsh_collisions=min_lsh_collisions,
    )


# --------------------------------------------------------------------------
# fused blocking: every pass's keys in ONE emission + ONE shuffle
# --------------------------------------------------------------------------


class FusedKeyEmitter:
    """Actor: one pass over the entity table emits the block-key rows of
    ALL blocking passes at once — (key64, kind, doc_id, sort_key) — so the
    whole candidate-generation phase costs ONE key shuffle instead of one
    per pass plus a union. Key64 = stable hash of (kind, key payload);
    cross-kind collisions are harmless (pairs are verified by the scorer).
    """

    KIND_SNM = 0
    KIND_LSH = 1
    KIND_EXACT = 2

    def __init__(self, window, num_perm, num_bands, seed, exact_keys):
        self.window = window
        self.bands = BandEmitter(num_perm=num_perm, num_bands=num_bands, seed=seed)
        self.exact_keys = exact_keys
        self._key_memo: dict[tuple, int] = {}

    def _k64_distinct(self, kind: int, payloads: np.ndarray) -> np.ndarray:
        """uint64 key per payload, hashing each DISTINCT (kind, payload)
        once (blake2b, memoized across batches). Bit-identical to the
        scalar per-row loop this replaces: the payload vocabulary (first
        SNM tokens, exact-key values) is tiny relative to row count, so
        the factorize turns O(rows) blake2b calls into O(distinct)."""
        codes, uniques = pd.factorize(payloads)
        memo = self._key_memo
        keys = np.empty(len(uniques), dtype=np.uint64)
        for j, payload in enumerate(uniques):
            k = (kind, payload)
            h = memo.get(k)
            if h is None:
                h = int.from_bytes(
                    hashlib.blake2b(
                        f"{kind}\x1f{payload}".encode(), digest_size=8
                    ).digest(),
                    "big",
                )
                if len(memo) >= 2_000_000:
                    memo.clear()
                memo[k] = h
            keys[j] = h
        return keys[codes]

    def __call__(self, batch: pa.Table) -> pa.Table:
        # delta blocking: an is_new tag rides along with every key row
        has_new = "is_new" in batch.schema.names
        doc_id_col = batch.column("doc_id").combine_chunks()
        new_col = batch.column("is_new").combine_chunks() if has_new else None
        snm_col = batch.column("snm_key").combine_chunks()

        # one (row_index, key64, kind) triple list per section; doc_id /
        # is_new / sort_key are gathered once at the end via Arrow take
        idx_parts: list[np.ndarray] = []
        key_parts: list[np.ndarray] = []
        kind_parts: list[np.ndarray] = []

        # SNM: first sorted token keys (windowed later, needs sort_key)
        snm = snm_col.to_pandas()
        snm_mask = snm.notna().to_numpy() & (snm != "").to_numpy()
        snm_idx = np.flatnonzero(snm_mask)
        if snm_idx.size:
            firsts = (
                snm.iloc[snm_idx].str.split(" ", n=1).str[0].to_numpy(dtype=object)
            )
            idx_parts.append(snm_idx)
            key_parts.append(self._k64_distinct(self.KIND_SNM, firsts))
            kind_parts.append(np.full(snm_idx.size, self.KIND_SNM, dtype=np.int8))

        # LSH bands: batch-vectorized shingle hashing (UCS-4 packed 3-gram
        # windows, blake2b once per DISTINCT gram — hashing.
        # batch_shingle_hashes), flat segmented minhash, and band keys as
        # one (docs x bands) splitmix matrix (hashing.band_key_matrix)
        names = batch.column("norm_name").to_pylist()
        flat, lens = batch_shingle_hashes(names, self.bands._shingle_memo)
        sigs = minhash_signature_flat(flat, lens, self.bands.a, self.bands.b)
        nz = lens > 0
        nz_idx = np.flatnonzero(nz)
        if nz_idx.size:
            bands = band_key_matrix(
                sigs[nz], self.bands.num_bands, self.bands.rows_per_band
            )
            idx_parts.append(np.repeat(nz_idx, self.bands.num_bands))
            key_parts.append(bands.ravel())
            kind_parts.append(
                np.full(nz_idx.size * self.bands.num_bands, self.KIND_LSH, dtype=np.int8)
            )

        # exact keys (null-keyed rows excluded). Values render via ARROW
        # string casts, not pandas: to_pandas() on an int column flips
        # int64 -> float64 whenever the BATCH happens to contain a null,
        # so the same logical key would stringify as "123" in one batch
        # and "123.0" in another — two different key64s, silently dropped
        # pairs (r5 code-review finding; matches exact_key_pairs'
        # to_pylist()/str(v) rendering for ints).
        for ki, cols in enumerate(self.exact_keys):
            scols = [pc.cast(batch.column(c), pa.string()) for c in cols]
            valid = np.ones(batch.num_rows, dtype=bool)
            for s in scols:
                valid &= pc.fill_null(
                    pc.not_equal(s, pa.scalar("")), False
                ).to_numpy(zero_copy_only=False)
            vidx = np.flatnonzero(valid)
            if not vidx.size:
                continue
            take = pa.array(vidx)
            payload = np.full(vidx.size, f"{ki}", dtype=object)
            for s in scols:
                payload = (
                    payload
                    + "\x1f"
                    + np.asarray(s.take(take).to_pylist(), dtype=object)
                )
            idx_parts.append(vidx)
            key_parts.append(self._k64_distinct(self.KIND_EXACT, payload))
            kind_parts.append(np.full(vidx.size, self.KIND_EXACT, dtype=np.int8))

        if idx_parts:
            idx = np.concatenate(idx_parts)
            keys = np.concatenate(key_parts)
            kinds = np.concatenate(kind_parts)
        else:
            idx = np.empty(0, dtype=np.int64)
            keys = np.empty(0, dtype=np.uint64)
            kinds = np.empty(0, dtype=np.int8)
        take_idx = pa.array(idx)
        # sort_key only matters for SNM rows (window order); others ""
        n_snm = snm_idx.size if snm_idx is not None else 0
        sort_keys = pa.concat_arrays(
            [
                snm_col.take(pa.array(snm_idx)).cast(pa.string())
                if n_snm
                else pa.array([], pa.string()),
                pa.array(np.full(len(idx) - n_snm, "", dtype=object), pa.string()),
            ]
        )
        cols_out = {
            "key64": pa.array(keys, pa.uint64()),
            "kind": pa.array(kinds, pa.int8()),
            "doc_id": doc_id_col.take(take_idx).cast(pa.string()),
            "sort_key": sort_keys,
        }
        if new_col is not None:
            cols_out["is_new"] = new_col.take(take_idx).cast(pa.int8())
        return pa.table(cols_out)


def candidate_pairs(
    entities,
    window: int = 10,
    num_perm: int = 32,
    num_bands: int = 8,
    seed: int = 42,
    num_partitions: int | None = None,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    exact_keys: tuple[tuple[str, ...], ...] = (
        ("norm_brand", "modelno"),
        ("phone_norm",),
        ("skeleton_key",),
    ),
    max_pairs_per_block: int = 20000,
    snm_max_block_size: int = 5000,
    concurrency: int | tuple | None = None,
    delta: bool = False,
    cross_only: bool = False,
    salt_hot_keys: bool = True,
    salt_threshold: int = DEFAULT_SALT_THRESHOLD,
    salt_factor: int = DEFAULT_SALT_FACTOR,
    min_lsh_collisions: int = 1,
):
    """All blocking passes fused: one key-emission actor pool, one bucketed
    shuffle, per-bucket pair emission with in-bucket dedup, one final
    cross-bucket pair dedup. Produces the same candidate set as
    ``candidate_pairs_multi_pass`` (tested equal) with 2 shuffles instead
    of 6.

    ``delta=True`` (incremental linkage): ``entities`` must carry an
    ``is_new`` int8 column; only pairs touching at least one NEW row are
    emitted — the old x old pairs were already scored by the run that
    built the existing clusters, so a delta of d docs against a corpus of
    n costs O(d x block_members), never O(n^2).

    ``cross_only=True`` (requires ``delta=True``; two-table A x B
    linkage): only pairs with EXACTLY one ``is_new`` side are emitted —
    new x new (B x B) pairs never enter the pair shuffle at all."""
    if cross_only and not delta:
        raise ValueError("cross_only requires delta=True (an is_new column)")
    need_cols = ["doc_id", "norm_name", "snm_key"] + sorted(
        {c for cols in exact_keys for c in cols}
    )
    if delta:
        need_cols.append("is_new")
    # The (materialized) entity table usually sits in a handful of
    # target-block-size-coalesced blocks, and actor-pool map_batches
    # dispatches per BLOCK — the key-emission pool was observed running
    # 5 tasks / 7.7 s serial UDF at 32 CPUs (ds.stats, r4). Split to at
    # least pool width BEFORE the pool so emission actually fans out.
    pool_hi = max(2, (num_partitions or 8) * 3 // 4)
    keyed = entities.select_columns(need_cols).repartition(
        max(num_partitions or 0, pool_hi, 16)
    ).map_batches(
        FusedKeyEmitter,
        fn_constructor_args=(window, num_perm, num_bands, seed, exact_keys),
        batch_format="pyarrow",
        batch_size=4096,
        # ~3/4 of the partition-implied cores: leaves room for the shuffle
        # aggregators running concurrently (measured faster than a full-width
        # pool at both 4 and 16 CPUs)
        concurrency=concurrency or (1, pool_hi),
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", _u64_bucket(t.column("key64").combine_chunks(), num_buckets)
        )

    # Ray coalesces small blocks toward its target block size, which can
    # leave the whole key table in a handful of blocks — and the sort-based
    # groupby shuffle inherits that, serializing per-bucket pair emission
    # onto ~5 tasks (observed in ds.stats()). Split first: cheap, and at
    # real scale the key table has plenty of blocks anyway.
    keyed = keyed.repartition(max(num_partitions or 0, 2 * DEFAULT_NUM_BUCKETS // 4, 32))

    if salt_hot_keys:
        # hot-key salting (north rule): a key with more members than one
        # reduce task should hold is split into overlapping sub-blocks
        # BEFORE the shuffle (see _salt_keys). The census consumes the key
        # table, so pin it once; the salted SNM neighborhoods become
        # per-sub-block windows (same spirit as the existing block cap,
        # but memory-bounded at the shuffle, not just pair-bounded).
        keyed = keyed.materialize()
        hot = _find_hot_keys(keyed, salt_threshold, num_partitions)
        if len(hot):
            keyed = _salt_keys(keyed, hot, salt_factor)

    # per-pair src class rides to dedup_pairs so evidence-based pre-ranking
    # (min_lsh_collisions) can distinguish LSH-only pairs there
    _kind_src = {
        FusedKeyEmitter.KIND_SNM: "snm",
        FusedKeyEmitter.KIND_LSH: "lsh",
        FusedKeyEmitter.KIND_EXACT: "exact",
    }

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        left: list = []
        right: list = []
        srcs: list = []
        overflow = 0
        for (key64, kind), g in df.groupby(["key64", "kind"], sort=False):
            before = len(left)
            if kind == FusedKeyEmitter.KIND_SNM:
                g = g.sort_values(["sort_key", "doc_id"])
                ids = g["doc_id"].to_numpy()
                flags = g["is_new"].to_numpy() if delta else None
                if len(ids) > snm_max_block_size:
                    overflow += len(ids) - snm_max_block_size
                    ids = ids[:snm_max_block_size]
                    if flags is not None:
                        flags = flags[:snm_max_block_size]
                if delta:
                    _emit_window_delta(
                        ids, flags, window, left, right, cross_only=cross_only
                    )
                else:
                    _emit_window(ids, window, left, right)
            else:
                if delta:
                    g2 = g.drop_duplicates("doc_id").sort_values("doc_id")
                    ids = g2["doc_id"].to_numpy()
                    flags = g2["is_new"].to_numpy()
                    overflow += _emit_capped_delta(
                        ids, flags, max_pairs_per_block, left, right,
                        cross_only=cross_only,
                    )
                else:
                    ids = np.sort(g["doc_id"].unique())
                    overflow += _emit_capped(ids, max_pairs_per_block, left, right)
            srcs.extend([_kind_src[kind]] * (len(left) - before))
        out = pd.DataFrame(
            {
                "left_id": pd.Series(left, dtype=str),
                "right_id": pd.Series(right, dtype=str),
                "src": pd.Series(srcs, dtype=str),
                "overflow": pd.Series([overflow] * len(left), dtype=np.int64),
            }
        )
        # collapse duplicate non-LSH evidence in-bucket; keep LSH band
        # multiplicity — it IS the pre-ranking signal, and it is only
        # assembled exactly at dedup_pairs, whose shuffle buckets by pair
        # content (this stage buckets by band key, so a pair's bands are
        # spread across buckets here)
        lsh_mask = out["src"].to_numpy() == "lsh"
        return pd.concat(
            [
                out[~lsh_mask].drop_duplicates(["left_id", "right_id"]),
                out[lsh_mask],
            ],
            ignore_index=True,
        )

    pairs = (
        keyed.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket", num_partitions=num_partitions)
        .map_groups(per_bucket, batch_format="pandas")
    )
    return dedup_pairs(
        pairs,
        num_buckets=num_buckets,
        num_partitions=num_partitions,
        min_lsh_collisions=min_lsh_collisions,
    )


# Below this many effective CPUs the fused single-shuffle plan loses to the
# multi-pass plan (pool spin-up + wide shuffle overheads dominate; measured
# 81 s vs 50 s at 4 CPUs, equal-or-better at 16+).
FUSED_MIN_CPUS = 12


def candidate_pairs_auto(
    entities,
    path: str = "auto",
    snm_strategy: str = "bucket",
    **kw,
):
    """Adaptive blocking plan: fused single-shuffle at high parallelism,
    multi-pass at low parallelism (or when the true-sorted-neighborhood
    pass is requested — a global sort can't be fused into the key shuffle).

    ``path``: "auto" | "fused" | "multi".
    """
    if path == "auto":
        try:
            import ray as _ray

            cpus = int(_ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        path = "fused" if (cpus >= FUSED_MIN_CPUS and snm_strategy == "bucket") else "multi"
    if path == "fused":
        if snm_strategy != "bucket":
            raise ValueError("fused blocking supports snm_strategy='bucket' only")
        return candidate_pairs(entities, **kw)
    kw.pop("max_pairs_per_block", None)
    kw.pop("snm_max_block_size", None)
    kw.pop("concurrency", None)
    return candidate_pairs_multi_pass(entities, snm_strategy=snm_strategy, **kw)
