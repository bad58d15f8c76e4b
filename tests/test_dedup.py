"""Dedup family tests: exact, fingerprint, MinHash, SimHash, embedding."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from entity_matching_datasets_ray.stages import dedup as D


@pytest.fixture(scope="module")
def text_ds():
    texts = []
    ids = []
    rng = np.random.RandomState(11)
    vocab = [f"word{k}" for k in range(500)]
    for i in range(40):
        # 30 distinct-ish words per doc: different docs share few words, so
        # cross-doc Jaccard is low while near-dups stay high
        words = [vocab[w] for w in rng.choice(500, 30, replace=False)]
        base = " ".join(["doc", f"num{i}"] + words)
        ids.append(i)
        texts.append(base)
        # near-dup of even docs: one word changed
        if i % 2 == 0:
            ids.append(1000 + i)
            texts.append(base.replace(words[0], words[0] + "x"))
        # exact dup of docs divisible by 5
        if i % 5 == 0:
            ids.append(2000 + i)
            texts.append(base)
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())})
    )


def test_exact_dedup(text_ds):
    survivors = set(D.exact_dedup(text_ds, num_partitions=4).to_pandas()["doc_id"])
    # exact dup groups: {i, 2000+i} for i % 5 == 0 -> survivor i (min)
    for i in range(0, 40, 5):
        assert i in survivors
        assert 2000 + i not in survivors
    # near-dups are NOT exact dups: both survive
    assert 1000 in survivors or 0 in survivors
    assert 1000 in survivors


def test_fingerprint_dedup_whitespace_case_insensitive():
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": ["Hello  World", "hello world", "different text"],
            }
        )
    )
    survivors = set(D.fingerprint_dedup(ds, num_partitions=2).to_pandas()["doc_id"])
    assert survivors == {1, 3}


def test_minhash_dedup_pairs_finds_neardups(text_ds):
    pairs = D.minhash_dedup_pairs(text_ds, threshold=0.7, num_partitions=4).to_pandas()
    found = set(zip(pairs.left_id, pairs.right_id))
    # every near-dup pair (i, 1000+i) must be found
    for i in range(0, 40, 2):
        assert (i, 1000 + i) in found, f"missing near-dup pair {i}"
    # all verified jaccards respect the threshold
    assert (pairs.jaccard >= 0.7).all()


def test_minhash_survivors(text_ds):
    survivors = set(D.minhash_dedup(text_ds, threshold=0.7, num_partitions=4).to_pandas()["doc_id"])
    for i in range(0, 40, 2):
        assert str(i) in survivors or i in survivors
        assert 1000 + i not in survivors and str(1000 + i) not in survivors


def test_simhash_pairs(text_ds):
    pairs = D.simhash_dedup_pairs(text_ds, max_hamming=8, num_partitions=4).to_pandas()
    found = set(zip(pairs.left_id, pairs.right_id))
    # exact dups have hamming 0 -> always found (pigeonhole guarantee)
    for i in range(0, 40, 5):
        assert (i, 2000 + i) in found
    # one-word-in-32 near-dups land within a small hamming radius often;
    # the chunk banding beyond hamming < num_chunks is probabilistic
    near = sum((i, 1000 + i) in found for i in range(0, 40, 2))
    assert near >= 10


def test_embedding_dedup_pairs():
    rng = np.random.RandomState(0)
    base = rng.randn(30, 16).astype(np.float32)
    vecs = list(base) + [base[i] + rng.normal(0, 1e-3, 16).astype(np.float32) for i in range(10)]
    ids = list(range(30)) + [100 + i for i in range(10)]
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            }
        )
    )
    pairs = D.embedding_dedup_pairs(ds, threshold=0.999, num_partitions=4).to_pandas()
    found = set(zip(pairs.left_id, pairs.right_id))
    hits = sum((i, 100 + i) in found for i in range(10))
    assert hits >= 8  # LSH multi-probe recall
    assert (pairs.cosine >= 0.999).all()


def test_popcount64():
    xs = np.array([0, 1, 3, 0xFFFFFFFFFFFFFFFF, 0x8000000000000001], dtype=np.uint64)
    assert D._popcount64(xs).tolist() == [0, 1, 2, 64, 2]


def test_band_candidates_metered_not_silent():
    """A hot band must emit capped pairs WITH an overflow count, and every
    member must stay reachable (star pattern) for downstream components."""
    n = 60
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(n)), pa.int64()),
                # identical text -> every doc lands in every band together
                "text": pa.array(["same text for everyone here"] * n, pa.string()),
            }
        )
    )
    cands = D.minhash_candidate_pairs(ds, num_partitions=2, max_pairs_per_block=100).to_pandas()
    total_possible = n * (n - 1) // 2
    assert len(cands) < total_possible
    assert cands["overflow"].max() > 0  # metered, not silent
    # star keeps everyone connected to the min id
    hub_pairs = set(zip(cands.left_id, cands.right_id))
    for i in range(1, n):
        assert (0, i) in hub_pairs


def test_jaccard_verify_broadcast_equals_shuffle(text_ds):
    bc = (
        D.minhash_dedup_pairs(text_ds, threshold=0.7, num_partitions=4, attach_strategy="broadcast")
        .to_pandas()
        .sort_values(["left_id", "right_id"])
        .reset_index(drop=True)
    )
    sh = (
        D.minhash_dedup_pairs(text_ds, threshold=0.7, num_partitions=4, attach_strategy="shuffle")
        .to_pandas()
        .sort_values(["left_id", "right_id"])
        .reset_index(drop=True)
    )
    assert bc[["left_id", "right_id"]].equals(sh[["left_id", "right_id"]])
    assert np.allclose(bc["jaccard"], sh["jaccard"])


def test_embedding_dedup_hot_bucket_capped_metered():
    """Near-identical vectors all share one signature bucket: above the cap
    the block is truncated but the overflow column meters it."""
    rng = np.random.RandomState(3)
    base = rng.randn(16).astype(np.float32)
    vecs = [base + rng.normal(0, 1e-4, 16).astype(np.float32) for _ in range(40)]
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(list(range(40)), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            }
        )
    )
    pairs = D.embedding_dedup_pairs(
        ds, threshold=0.99, num_partitions=2, max_block_size=10
    ).to_pandas()
    assert pairs["overflow"].max() > 0
    # chunked matmul still finds pairs among the capped members
    assert len(pairs) > 0


def test_planted_fixture_modes():
    from entity_matching_datasets_ray.synth import PLANTED_ID_OFFSET, planted_dup_docs

    ids = rd.from_arrow(pa.table({"doc_id": pa.array(list(range(20)), pa.int64())}))
    mh = planted_dup_docs(ids, mode="minhash").to_pandas()
    assert len(mh) == 40
    pairs = D.minhash_dedup_pairs(
        rd.from_pandas(mh), threshold=0.8, num_partitions=2
    ).to_pandas()
    found = set(zip(pairs.left_id, pairs.right_id))
    assert found == {(i, i + PLANTED_ID_OFFSET) for i in range(20)}

    sh = planted_dup_docs(ids, mode="simhash").to_pandas()
    pairs2 = D.simhash_dedup_pairs(
        rd.from_pandas(sh), max_hamming=3, num_partitions=2
    ).to_pandas()
    found2 = set(zip(pairs2.left_id, pairs2.right_id))
    assert found2 == {(i, i + PLANTED_ID_OFFSET) for i in range(20)}


def _brute_token_jaccard_pairs(texts: dict, threshold: float):
    toks = {i: frozenset(t.lower().split()) for i, t in texts.items()}
    out = []
    ids = sorted(toks)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            ta, tb = toks[a], toks[b]
            if not ta or not tb:
                continue
            j = len(ta & tb) / len(ta | tb)
            if j >= threshold:
                out.append((a, b, j))
    return sorted(out)


@pytest.mark.parametrize("threshold", [0.5, 0.9])
def test_jaccard_similarity_join_exact(threshold):
    """100%-recall contract: the prefix-filtered distributed join must
    equal brute force exactly, values bit-identical — including the
    float-ceil edge (0.9 * 20 == 18.000000000000004 must not shrink the
    prefix)."""
    rng = np.random.RandomState(11)
    vocab = [f"w{k}" for k in range(60)]
    texts = {}
    for i in range(120):
        L = rng.randint(3, 21)
        texts[i] = " ".join(rng.choice(vocab, L, replace=False))
    texts[120] = " ".join(f"w{k}" for k in range(20))        # exactly 20 tokens
    texts[121] = " ".join(f"w{k}" for k in range(1, 20)) + " w0"  # same set
    texts[122] = ""  # empty: skipped on both sides
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array([texts[i] for i in sorted(texts)], pa.string()),
            }
        )
    )
    got = D.jaccard_similarity_join(
        ds, threshold=threshold, id_col="doc_id", text_col="text", num_partitions=4
    ).to_pandas()
    got_t = sorted(zip(got.left_id, got.right_id, got.jaccard))
    assert got_t == _brute_token_jaccard_pairs(texts, threshold)
    assert (120, 121, 1.0) in got_t


def test_jaccard_join_broadcast_equals_shuffle():
    rng = np.random.RandomState(5)
    vocab = [f"t{k}" for k in range(30)]
    texts = {}
    for i in range(30):
        base = list(rng.choice(vocab, rng.randint(6, 12), replace=False))
        texts[2 * i] = " ".join(base)
        # planted near-dup: drop one token -> high-Jaccard partner
        texts[2 * i + 1] = " ".join(base[:-1])
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array([texts[i] for i in sorted(texts)], pa.string()),
            }
        )
    )
    res = {}
    for strat in ("broadcast", "shuffle"):
        df = D.jaccard_similarity_join(
            ds, threshold=0.6, id_col="doc_id", text_col="text",
            num_partitions=3, attach_strategy=strat,
        ).to_pandas()
        res[strat] = sorted(zip(df.left_id, df.right_id, df.jaccard))
    assert res["broadcast"] == res["shuffle"] == _brute_token_jaccard_pairs(texts, 0.6)


def test_ngram_jaccard_join_matches_brute_force(ray_session):
    """Char-3-gram Jaccard join == brute-force ngram_jaccard over all
    pairs, including a typo pair token-Jaccard would miss."""
    import itertools

    import pandas as pd
    import ray.data as rd

    from entity_matching_datasets_ray.functions.similarity import ngram_jaccard
    from entity_matching_datasets_ray.stages.dedup import ngram_jaccard_join

    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brwon fox jumps over the lazy dog",  # typo: shares grams, not tokens
        3: "a completely different sentence about ray data pipelines",
        4: "a completely different sentense about ray data pipelines",
        5: "short",
    }
    thr = 0.6
    want = sorted(
        (a, b)
        for a, b in itertools.combinations(sorted(texts), 2)
        if ngram_jaccard(texts[a].lower(), texts[b].lower(), 3) >= thr
    )
    assert len(want) >= 2  # both typo pairs must be in play
    ds = rd.from_pandas(pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())}))
    got = ngram_jaccard_join(ds, n=3, threshold=thr).to_pandas()
    got_pairs = sorted(zip(got["left_id"], got["right_id"]))
    assert got_pairs == want


# --------------------------------------------------------------------------
# winnowed local fingerprints
# --------------------------------------------------------------------------


def _winnow_brute(text, k, w):
    """Window-by-window reference: rightmost min per window, distinct union."""
    from entity_matching_datasets_ray.functions.text import md5_lower64

    toks = (text or "").lower().split()
    n = len(toks) - k + 1
    if n < 1:
        return set()
    h = [md5_lower64(" ".join(toks[i : i + k])) for i in range(n)]
    sel = set()
    if n <= w:
        m = min(h)
        sel.add(max(i for i in range(n) if h[i] == m))
    else:
        for j in range(n - w + 1):
            win = h[j : j + w]
            m = min(win)
            sel.add(j + max(i for i in range(w) if win[i] == m))
    return {h[i] for i in sel}


def test_winnow_kernel_matches_bruteforce():
    from entity_matching_datasets_ray.functions.text import winnow_fingerprints

    rng = np.random.RandomState(7)
    vocab = ["a", "b", "c", "dog", "cat", "x1", "the", "of"]
    for _ in range(120):
        t = " ".join(vocab[i] for i in rng.randint(0, len(vocab), rng.randint(0, 14)))
        for k in (1, 2, 4):
            for w in (1, 3, 4, 6):
                got = set(winnow_fingerprints(t, k, w).tolist())
                assert got == _winnow_brute(t, k, w), (t, k, w)


def test_winnow_kernel_edges():
    from entity_matching_datasets_ray.functions.text import winnow_fingerprints

    assert winnow_fingerprints(None).size == 0
    assert winnow_fingerprints("").size == 0
    assert winnow_fingerprints("one two three", k=4).size == 0  # < k tokens
    # case/whitespace normalization: identical fingerprints
    a = winnow_fingerprints("The  Quick\tBrown Fox Jumps Over Lazy")
    b = winnow_fingerprints("the quick brown fox jumps over lazy")
    assert a.tolist() == b.tolist() and a.size > 0


def test_winnow_coverage_guarantee():
    """Any shared passage of >= k + w - 1 tokens yields a shared fingerprint
    (the SIGMOD'03 winnowing guarantee), regardless of surrounding text."""
    from entity_matching_datasets_ray.functions.text import winnow_fingerprints

    k, w = 4, 4
    passage = "alpha beta gamma delta epsilon zeta eta"  # k + w - 1 = 7 tokens
    rng = np.random.RandomState(3)
    vocab = [f"u{j}" for j in range(200)]
    for trial in range(20):
        pre_a = " ".join(vocab[i] for i in rng.choice(100, rng.randint(0, 12), replace=False))
        post_a = " ".join(vocab[i] for i in rng.choice(100, rng.randint(0, 12), replace=False))
        pre_b = " ".join(vocab[100 + i] for i in rng.choice(100, rng.randint(0, 12), replace=False))
        post_b = " ".join(vocab[100 + i] for i in rng.choice(100, rng.randint(0, 12), replace=False))
        da = f"{pre_a} {passage} {post_a}".strip()
        db = f"{pre_b} {passage} {post_b}".strip()
        shared = set(winnow_fingerprints(da, k, w).tolist()) & set(
            winnow_fingerprints(db, k, w).tolist()
        )
        assert shared, trial


def test_winnow_overlap_pairs_end_to_end(ray_session):
    """Stage output == pure-Python reference (fps -> df stoplist -> shared
    counts), incl. the boilerplate drop: a header in every doc exceeds the
    df cap, so it creates no pairs."""
    from collections import Counter

    from entity_matching_datasets_ray.functions.text import winnow_fingerprints

    k, w, cap, min_shared = 4, 4, 3, 2
    header = "standard license header tokens common to every document here"
    passage = "alpha beta gamma delta epsilon zeta eta theta iota"
    rng = np.random.RandomState(5)
    vocab = [f"v{j}" for j in range(400)]

    def noise(n, lo, hi):
        return " ".join(vocab[i] for i in rng.choice(range(lo, hi), n, replace=False))

    texts = {
        0: f"{header} {noise(20, 0, 80)} {passage}",
        1: f"{header} {passage} {noise(20, 80, 160)}",
        2: f"{header} {noise(25, 160, 240)}",
        3: f"{header} {noise(25, 240, 320)}",
        4: f"{header} {noise(25, 320, 400)}",
    }

    fps = {i: set(winnow_fingerprints(t, k, w).tolist()) for i, t in texts.items()}
    df_counts = Counter(h for s in fps.values() for h in s)
    kept = {h for h, c in df_counts.items() if c <= cap}
    want = {}
    for a in texts:
        for b in texts:
            if a < b:
                n = len(fps[a] & fps[b] & kept)
                if n >= min_shared:
                    want[(a, b)] = n
    assert want, "fixture must produce at least one pair"
    assert (0, 1) in want  # the planted shared passage
    # header fps appear in all 5 docs > cap: ensure the stoplist bites
    assert any(c > cap for c in df_counts.values())

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(texts), pa.int64()),
                "text": pa.array(list(texts.values()), pa.string()),
            }
        )
    )
    out = D.winnow_overlap_pairs(
        ds, k=k, w=w, min_shared=min_shared, max_docs_per_fp=cap, num_partitions=4
    ).to_pandas()
    got = {
        (int(a), int(b)): int(n)
        for a, b, n in zip(out["doc_id_a"], out["doc_id_b"], out["n_shared"])
    }
    assert got == want
    assert list(out["doc_id_a"]) == sorted(out["doc_id_a"])
