"""Scorer consistency + calibration-machinery tests."""

import numpy as np
import pandas as pd
import pytest

from entity_matching_datasets_ray.stages.scoring import (
    FEATURE_COLUMNS,
    FEATURE_NAMES,
    PairScorer,
    compute_pair_features,
    default_idf_value,
    fit_logistic,
)

IDF = {"alpha": 2.0, "beta": 1.0, "laptop": 0.5, "hp": 1.5}


def _row(i, left, right):
    row = {"left_id": f"l{i}", "right_id": f"r{i}"}
    for f in FEATURE_COLUMNS:
        if f == "doc_id":
            continue
        row[f"l_{f}"] = left.get(f)
        row[f"r_{f}"] = right.get(f)
    return row


CASES = [
    (
        {"norm_name": "hp alpha laptop", "norm_brand": "hp", "modelno": "A1",
         "price_num": 10.0, "phone_norm": None, "addr": None, "city": None,
         "venue": None, "year": None, "authors": None, "artist": None,
         "album": None, "date_iso": None, "time": None},
        {"norm_name": "hp alpha laptop", "norm_brand": "hp", "modelno": "A1",
         "price_num": 10.0, "phone_norm": None, "addr": None, "city": None,
         "venue": None, "year": None, "authors": None, "artist": None,
         "album": None, "date_iso": None, "time": None},
    ),
    (
        {"norm_name": "hp beta laptop", "norm_brand": "hp", "modelno": "A1",
         "price_num": 10.0, "phone_norm": "111-222-3333", "addr": "12 Main St",
         "city": "la", "venue": "sigmod", "year": "1999",
         "authors": "Alice Smith, Bob Jones", "artist": "erin kim",
         "album": "silver jazz", "date_iso": "2001-02-03", "time": "03:05"},
        {"norm_name": "dell gamma monitor", "norm_brand": "dell", "modelno": "B2",
         "price_num": 20.0, "phone_norm": "111-222-9999", "addr": "99 Oak Ave",
         "city": "nyc", "venue": "vldb", "year": "2001",
         "authors": "Alice Smith", "artist": "erin k", "album": "gold jazz",
         "date_iso": "2001-02-04", "time": "03:06"},
    ),
    (
        {"norm_name": "", "norm_brand": None, "modelno": "", "price_num": None,
         "phone_norm": None, "addr": "", "city": None, "venue": None,
         "year": None, "authors": None, "artist": None, "album": None,
         "date_iso": None, "time": None},
        {"norm_name": "some name", "norm_brand": "x", "modelno": None,
         "price_num": 5.0, "phone_norm": None, "addr": None, "city": None,
         "venue": None, "year": None, "authors": None, "artist": None,
         "album": None, "date_iso": None, "time": None},
    ),
]


def test_scorer_batch_matches_scalar_reference():
    """The vectorized __call__ must produce the exact per-row features of
    compute_pair_features (the calibrated weights depend on it)."""
    batch = pd.DataFrame([_row(i, l, r) for i, (l, r) in enumerate(CASES)])
    scorer = PairScorer(IDF, n_docs=100)
    got = scorer(batch)
    for i, (l, r) in enumerate(CASES):
        expect = compute_pair_features(
            {k: (None if v == "" else v) for k, v in l.items()},
            {k: (None if v == "" else v) for k, v in r.items()},
            IDF,
            default_idf_value(100),
        )
        np.testing.assert_allclose(
            got.iloc[i][FEATURE_NAMES].to_numpy(dtype=float),
            np.array(expect),
            atol=1e-12,
            err_msg=f"case {i}",
        )


def test_scores_monotone_in_similarity():
    batch = pd.DataFrame([_row(i, l, r) for i, (l, r) in enumerate(CASES[:2])])
    out = PairScorer(IDF, n_docs=100)(batch)
    assert out.iloc[0].score > 0.5  # identical records
    assert out.iloc[1].score < 0.5  # dissimilar records


def test_fit_logistic_separates():
    rng = np.random.RandomState(0)
    X = np.vstack([rng.normal(0.9, 0.05, (200, 3)), rng.normal(0.2, 0.05, (800, 3))])
    y = np.array([1.0] * 200 + [0.0] * 800)
    w, b = fit_logistic(X, y)
    p = 1 / (1 + np.exp(-(X @ w + b)))
    assert ((p >= 0.5) == (y == 1)).mean() > 0.99
