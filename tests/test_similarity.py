"""Unit + property tests for the similarity kernels."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from entity_matching_datasets_ray.functions import hashing as H
from entity_matching_datasets_ray.functions import similarity as S


def test_levenshtein_known():
    assert S.levenshtein("kitten", "sitting") == 3
    assert S.levenshtein("", "abc") == 3
    assert S.levenshtein("abc", "abc") == 0
    # long-string fallback path
    assert S.levenshtein("a" * 100 + "b", "a" * 100 + "c") == 1


@given(st.text(max_size=80), st.text(max_size=80))
@settings(max_examples=200, deadline=None)
def test_levenshtein_properties(a, b):
    d = S.levenshtein(a, b)
    assert d == S.levenshtein(b, a)
    assert d <= max(len(a), len(b))
    assert (d == 0) == (a == b)
    # Myers bit-parallel must agree with the DP fallback
    if len(a) <= 64:
        assert d == S._levenshtein_dp(a, b)


def test_jaro_winkler_known():
    assert S.jaro_winkler("martha", "marhta") == pytest.approx(0.9611, abs=1e-3)
    assert S.jaro_winkler("dixon", "dicksonx") == pytest.approx(0.8133, abs=1e-3)
    assert S.jaro_winkler("abc", "abc") == 1.0
    assert S.jaro_winkler("", "") == 1.0
    assert S.jaro_winkler("a", "") == 0.0


def test_token_jaccard():
    assert S.token_jaccard(["a", "b"], ["b", "c"]) == pytest.approx(1 / 3)
    assert S.token_jaccard([], []) == 1.0
    assert S.token_jaccard(["a"], []) == 0.0


def test_ngram_jaccard_typo_robust():
    a, b = "western digital camera", "western digitla camera"
    assert S.ngram_jaccard(a, b, 3) > 0.6
    assert S.token_jaccard(a.split(), b.split()) == pytest.approx(0.5)


def test_tfidf_cosine():
    idf = {"rare": 5.0, "common": 0.1}
    hi = S.tfidf_cosine(["rare", "common"], ["rare"], idf)
    lo = S.tfidf_cosine(["rare", "common"], ["common"], idf)
    assert hi > lo
    assert S.tfidf_cosine(["x"], ["x"], {}) == 1.0
    assert S.tfidf_cosine([], ["x"], {}) == 0.0


def test_numeric_closeness():
    assert S.numeric_closeness(10.0, 10.0) == 1.0
    assert S.numeric_closeness(None, 10.0) == 0.5
    assert S.numeric_closeness(10.0, 20.0) == pytest.approx(0.5)


def test_minhash_jaccard_estimate():
    a, b = H.make_perm_params(256, seed=7)
    s1 = {f"tok{i}" for i in range(100)}
    s2 = {f"tok{i}" for i in range(50, 150)}  # true J = 50/150 = 1/3
    h1 = H.token_hashes(sorted(s1))
    h2 = H.token_hashes(sorted(s2))
    sig1 = H.minhash_signature(h1, a, b)
    sig2 = H.minhash_signature(h2, a, b)
    est = (sig1 == sig2).mean()
    assert abs(est - 1 / 3) < 0.12


def test_minhash_matrix_matches_single():
    a, b = H.make_perm_params(32, seed=42)
    h = H.token_hashes(["x", "y", "z"])
    single = H.minhash_signature(h, a, b)
    mat = H.minhash_signature_matrix([h, np.empty(0, dtype=np.uint64)], a, b)
    assert (mat[0] == single).all()
    assert (mat[1] == np.uint64(0xFFFFFFFFFFFFFFFF)).all()


def test_simhash_hamming():
    h1 = H.token_hashes([f"t{i}" for i in range(50)])
    h2 = H.token_hashes([f"t{i}" for i in range(45)] + ["a", "b", "c", "d", "e"])
    h3 = H.token_hashes([f"u{i}" for i in range(50)])
    near = H.hamming64(H.simhash64(h1), H.simhash64(h2))
    far = H.hamming64(H.simhash64(h1), H.simhash64(h3))
    assert near < far


def test_hash64_deterministic():
    assert H.hash64("abc") == H.hash64("abc")
    assert H.hash64("abc") != H.hash64("abd")
    assert H.content_hash("a", "b") != H.content_hash("ab", "")


def test_batched_kernels_bit_identical_to_scalar():
    """jaro_winkler_batch / levenshtein_ratio_batch must equal the scalar
    kernels EXACTLY (the calibrated weights and the scorer memo depend on
    it), across unicode, empties, equal pairs and 64-char caps."""
    import random

    import numpy as np

    from entity_matching_datasets_ray.functions import similarity as S
    from entity_matching_datasets_ray.functions.similarity_batch import (
        jaro_winkler_batch,
        levenshtein_ratio_batch,
    )

    random.seed(7)
    alphabet = "abcdefgh 0123456789é漢"
    cases = [
        ("", ""), ("a", ""), ("", "b"), ("abc", "abc"),
        ("martha", "marhta"), ("dixon", "dicksonx"),
        ("a" * 64, "a" * 63 + "b"), ("ab", "ba"),
    ]
    for _ in range(1500):
        a = "".join(random.choice(alphabet) for _ in range(random.randint(0, 64)))
        b = "".join(random.choice(alphabet) for _ in range(random.randint(0, 64)))
        if random.random() < 0.25:
            b = a
        cases.append((a, b))
    A = [c[0] for c in cases]
    B = [c[1] for c in cases]
    jw = jaro_winkler_batch(A, B)
    lev = levenshtein_ratio_batch(A, B)
    for i, (a, b) in enumerate(cases):
        assert S.jaro_winkler(a, b) == jw[i], (a, b)
        assert S.levenshtein_ratio(a, b) == lev[i], (a, b)
