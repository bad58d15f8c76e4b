"""Blocking-stage tests: recall of each pass, dedup, capping."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from entity_matching_datasets_ray.stages import blocking as B
from entity_matching_datasets_ray.stages.extract import extract_stage
from entity_matching_datasets_ray.synth import synth_docs_table, truth_pairs

N_ENTITIES = 150


@pytest.fixture(scope="module")
def entities():
    docs = rd.from_arrow(synth_docs_table(N_ENTITIES))
    return extract_stage(docs).drop_columns(["spans"]).materialize()


@pytest.fixture(scope="module")
def gold_set():
    g = truth_pairs(N_ENTITIES).to_pandas()
    return set(zip(g.left_doc_id, g.right_doc_id))


def _pair_set(ds):
    df = ds.to_pandas()
    return set(zip(df.left_id, df.right_id))


def test_pairs_are_ordered_and_unique(entities):
    cands = B.candidate_pairs(entities, num_partitions=4).to_pandas()
    assert (cands.left_id < cands.right_id).all()
    assert not cands.duplicated(["left_id", "right_id"]).any()


def test_union_recall(entities, gold_set):
    cands = _pair_set(B.candidate_pairs(entities, num_partitions=4))
    recall = len(cands & gold_set) / len(gold_set)
    assert recall >= 0.99


def test_lsh_pass_alone_has_recall(entities, gold_set):
    cands = _pair_set(B.lsh_pairs(entities, num_partitions=4))
    assert len(cands & gold_set) / len(gold_set) > 0.7


def test_exact_skeleton_catches_typos(entities):
    # the skeleton key is invariant under interior adjacent-char swaps
    from entity_matching_datasets_ray.functions.normalizers import normalize_name

    ents = entities.to_pandas()
    k = ents.set_index("doc_id")["skeleton_key"]
    # doc products:00000000:0 canonical vs typo'd copies share skeletons often
    assert k.notna().sum() > 0


def test_dedup_pairs_removes_cross_pass_duplicates(entities):
    p1 = B.snm_pairs(entities, num_partitions=4)
    deduped = B.dedup_pairs(p1.union(p1), num_partitions=4).to_pandas()
    assert not deduped.duplicated(["left_id", "right_id"]).any()


def test_block_capping():
    # 60 docs with identical name -> uncapped would be C(60,2)=1770 pairs;
    # with max_pairs_per_block=100 the hot block must emit a bounded
    # star+window pattern that still connects every doc.
    import pyarrow as pa

    t = pa.table(
        {
            "doc_id": [f"d{i:03d}" for i in range(60)],
            "norm_name": ["same name here"] * 60,
            "norm_brand": ["b"] * 60,
            "modelno": ["m"] * 60,
            "phone_norm": [None] * 60,
            "skeleton_key": ["x"] * 60,
            "snm_key": ["here name same"] * 60,
        }
    )
    ents = rd.from_arrow(t)
    capped = B.lsh_pairs(ents, max_pairs_per_block=100, num_partitions=2).to_pandas()
    uniq = capped.drop_duplicates(["left_id", "right_id"])
    assert len(uniq) < 400  # far fewer than 1770
    assert (capped.overflow > 0).any()
    # every doc is still reachable from the hub (star pattern)
    import networkx as nx

    g = nx.Graph()
    g.add_edges_from(zip(uniq.left_id, uniq.right_id))
    assert nx.number_connected_components(g) == 1
    assert g.number_of_nodes() == 60


def test_emit_capped_small_block_is_exact():
    left, right = [], []
    overflow = B._emit_capped([f"d{i}" for i in range(10)], 100, left, right)
    assert overflow == 0
    assert len(left) == 45


def test_fused_equals_multi_pass(entities):
    fused = _pair_set(B.candidate_pairs(entities, num_partitions=4))
    multi = _pair_set(B.candidate_pairs_multi_pass(entities, num_partitions=4))
    assert fused == multi


def test_snm_global_equals_bruteforce_windowed():
    """snm_pairs_global must emit EXACTLY the sliding-window pairs of the
    globally sorted key order, across any partitioning (boundary exchange
    is exact), including duplicate keys."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(5)
    n = 300
    keys = [f"key{rng.randint(0, 40):02d} tail{i%7}" for i in range(n)]
    ids = [f"d{i:04d}" for i in range(n)]
    t = pa.table({"doc_id": pa.array(ids), "snm_key": pa.array(keys)})
    window = 5

    order = sorted(range(n), key=lambda i: keys[i] + "\x1f" + ids[i])
    expected = set()
    for a in range(n):
        for b in range(a + 1, min(a + 1 + window, n)):
            x, y = ids[order[a]], ids[order[b]]
            expected.add((min(x, y), max(x, y)))

    for parts in (2, 7):
        got = B.snm_pairs_global(
            rd.from_arrow(t), window=window, num_partitions=parts
        ).to_pandas()
        got_pairs = set(zip(got.left_id, got.right_id))
        assert got_pairs == expected, f"parts={parts}"


def test_snm_global_crosses_first_token_boundary():
    """Neighbors whose first sorted tokens differ are invisible to the
    bucketed snm_pairs but MUST be paired by the global sort."""
    t = pa.table(
        {
            "doc_id": pa.array(["a1", "a2"]),
            "snm_key": pa.array(["alpha zulu", "alphb zulu"]),  # adjacent keys, different first token
        }
    )
    ds = rd.from_arrow(t)
    got = B.snm_pairs_global(ds, window=3, num_partitions=2).to_pandas()
    assert ("a1", "a2") in set(zip(got.left_id, got.right_id))
    bucketed = B.snm_pairs(ds, window=3).to_pandas()
    bucketed_pairs = (
        set(zip(bucketed["left_id"], bucketed["right_id"])) if len(bucketed) else set()
    )
    assert ("a1", "a2") not in bucketed_pairs


def test_hot_key_salting_bounds_groups_and_keeps_connectivity():
    """A key hot enough to blow a reduce task is split into overlapping
    salted sub-blocks before the shuffle; every member must stay in ONE
    connected component of the emitted pairs, and no single (key, kind)
    group may retain the full membership."""
    import numpy as np

    from entity_matching_datasets_ray.stages.blocking import (
        _find_hot_keys,
        _salt_keys,
        candidate_pairs,
    )
    from entity_matching_datasets_ray.stages.clustering import connected_components_driver

    n_hot = 4000
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i:05d}" for i in range(n_hot + 20)]),
            # one boilerplate name shared by n_hot docs + 20 distinct docs
            "norm_name": pa.array(
                ["the same boilerplate product name"] * n_hot
                + [f"unique item number {i}" for i in range(20)]
            ),
            "snm_key": pa.array(
                ["boilerplate name product same the"] * n_hot
                + [f"item {i} number unique" for i in range(20)]
            ),
            "norm_brand": pa.array([None] * (n_hot + 20), pa.string()),
            "modelno": pa.array([None] * (n_hot + 20), pa.string()),
            "phone_norm": pa.array([None] * (n_hot + 20), pa.string()),
            "skeleton_key": pa.array([None] * (n_hot + 20), pa.string()),
        }
    )
    ents = rd.from_arrow(t)
    pairs = candidate_pairs(
        ents,
        num_partitions=4,
        salt_hot_keys=True,
        salt_threshold=500,
        salt_factor=8,
    ).to_pandas()
    # connectivity: the hot docs form ONE component
    labels = connected_components_driver(
        rd.from_pandas(pairs[["left_id", "right_id"]])
    )
    hot_labels = labels[labels.doc_id.str.startswith("d0") | labels.doc_id.isin(
        [f"d{i:05d}" for i in range(n_hot)]
    )]
    hot_ids = {f"d{i:05d}" for i in range(n_hot)}
    comp = labels[labels.doc_id.isin(hot_ids)]
    assert len(comp) == n_hot, "every hot doc must appear in some pair"
    assert comp.entity_id.nunique() == 1, "salted sub-blocks must stay connected"
    # the pair count stays bounded (star+window per sub-block, not O(k^2))
    assert len(pairs) < 40 * n_hot


# ---------------------------------------------------------------------------
# vectorized emitters: reference-loop equivalence + cross_only semantics
# ---------------------------------------------------------------------------


def _ref_window(ids, window):
    out = set()
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, min(i + 1 + window, n)):
            a, b = ids[i], ids[j]
            out.add((a, b) if a <= b else (b, a))
    return out


def _ref_window_delta(ids, is_new, window, cross_only=False):
    out = set()
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, min(i + 1 + window, n)):
            if cross_only:
                if bool(is_new[i]) == bool(is_new[j]):
                    continue
            elif not (is_new[i] or is_new[j]):
                continue
            a, b = ids[i], ids[j]
            out.add((a, b) if a <= b else (b, a))
    return out


@pytest.mark.parametrize("window", [1, 3, 10, 50])
def test_emit_window_matches_loop(window):
    import random

    rng = random.Random(7)
    ids = [f"d{rng.randrange(10**6):06d}" for _ in range(37)]
    left, right = [], []
    B._emit_window(ids, window, left, right)
    assert set(zip(left, right)) == _ref_window(ids, window)


@pytest.mark.parametrize("cross_only", [False, True])
@pytest.mark.parametrize("window", [1, 4, 25])
def test_emit_window_delta_matches_loop(window, cross_only):
    import random

    rng = random.Random(11)
    ids = [f"d{rng.randrange(10**6):06d}" for _ in range(41)]
    flags = [rng.random() < 0.4 for _ in ids]
    left, right = [], []
    B._emit_window_delta(ids, flags, window, left, right, cross_only=cross_only)
    got = set(zip(left, right))
    assert got == _ref_window_delta(ids, flags, window, cross_only=cross_only)
    if cross_only:
        by_id = dict(zip(ids, flags))
        assert all(by_id[a] != by_id[b] for a, b in got)


def test_emit_capped_delta_small_matches_loop():
    ids = sorted(f"d{i:03d}" for i in range(20))
    flags = [i % 3 == 0 for i in range(20)]
    left, right = [], []
    ov = B._emit_capped_delta(ids, flags, 10**6, left, right)
    assert ov == 0
    want = {
        (ids[i], ids[j])
        for i in range(20)
        for j in range(i + 1, 20)
        if flags[i] or flags[j]
    }
    assert set(zip(left, right)) == want


def test_emit_capped_delta_cross_only_small_is_full_bipartite():
    ids = sorted(f"d{i:03d}" for i in range(20))
    flags = [i % 2 == 0 for i in range(20)]
    left, right = [], []
    ov = B._emit_capped_delta(ids, flags, 10**6, left, right, cross_only=True)
    assert ov == 0
    got = set(zip(left, right))
    new = {i for i, f in zip(ids, flags) if f}
    old = set(ids) - new
    want = {(min(a, b), max(a, b)) for a in old for b in new}
    assert got == want


def test_emit_capped_delta_cross_only_capped_emits_only_cross():
    ids = sorted(f"d{i:04d}" for i in range(200))
    flags = [i % 2 == 0 for i in range(200)]
    left, right = [], []
    ov = B._emit_capped_delta(ids, flags, 50, left, right, cross_only=True)
    assert ov > 0  # 100*100 cross pairs >> cap
    by_id = dict(zip(ids, flags))
    assert all(by_id[a] != by_id[b] for a, b in zip(left, right))
    assert len(left) > 0


def test_candidate_pairs_cross_only_equals_delta_filtered(entities):
    """cross_only emission == delta emission post-filtered to cross pairs,
    and strictly smaller (the B x B share never enters the shuffle)."""
    ents = entities.to_pandas()
    half = len(ents) // 2
    ents = ents.copy()
    ents["is_new"] = (ents.index >= half).astype("int8")
    # namespace ids so new ids sort after old ids (the two-table layout)
    ents["doc_id"] = ents["is_new"].map({0: "a|", 1: "b|"}) + ents["doc_id"]
    ds = rd.from_pandas(ents)
    delta = B.candidate_pairs(ds, num_partitions=4, delta=True).to_pandas()
    cross = B.candidate_pairs(
        ds, num_partitions=4, delta=True, cross_only=True
    ).to_pandas()
    cross_set = set(zip(cross.left_id, cross.right_id))
    delta_cross = {
        (l, r)
        for l, r in zip(delta.left_id, delta.right_id)
        if l.startswith("a|") and r.startswith("b|")
    }
    assert cross_set == delta_cross
    # the saving is real: delta emitted B x B pairs that cross_only never did
    assert len(delta) > len(cross)
    assert all(
        l.startswith("a|") and r.startswith("b|")
        for l, r in zip(cross.left_id, cross.right_id)
    )


def test_fused_exact_keys_int_column_null_batch_stable():
    """r5 code-review: an integer exact-key column must hash to the SAME
    key64 whether or not the batch happens to contain a null (pandas
    to_pandas used to flip int64 -> float64 -> '123.0')."""
    import pyarrow as pa

    from entity_matching_datasets_ray.stages.blocking import FusedKeyEmitter

    em = FusedKeyEmitter(window=4, num_perm=16, num_bands=4, seed=42,
                         exact_keys=(("intkey",),))

    def batch(ids, keys):
        return pa.table({
            "doc_id": pa.array(ids, pa.string()),
            "snm_key": pa.array([""] * len(ids), pa.string()),
            "norm_name": pa.array([""] * len(ids), pa.string()),
            "intkey": pa.array(keys, pa.int64()),
        })

    clean = em(batch(["a", "b"], [123, 456])).to_pandas()
    nully = em(batch(["c", "d"], [123, None])).to_pandas()
    k_clean = clean.loc[(clean["kind"] == 2) & (clean["doc_id"] == "a"), "key64"]
    k_nully = nully.loc[(nully["kind"] == 2) & (nully["doc_id"] == "c"), "key64"]
    assert len(k_clean) == 1 and len(k_nully) == 1
    assert k_clean.iloc[0] == k_nully.iloc[0]
    # the null-keyed row emits no exact key at all
    assert not ((nully["kind"] == 2) & (nully["doc_id"] == "d")).any()


def test_band_key_matrix_tolerates_non_divisible_num_perm():
    import numpy as np

    from entity_matching_datasets_ray.functions.hashing import band_key_matrix

    sigs = np.arange(5 * 64, dtype=np.uint64).reshape(5, 64)
    out = band_key_matrix(sigs, num_bands=12, rows_per_band=5)  # uses 60 of 64
    assert out.shape == (5, 12)
    # tail permutations are ignored: perturbing them can't change keys
    sigs2 = sigs.copy()
    sigs2[:, 60:] ^= np.uint64(0xFFFF)
    assert (band_key_matrix(sigs2, 12, 5) == out).all()
