"""Heavy hitters (vocab_topk): equality to a pandas brute force, null
safety, deterministic tie-break, k larger than the vocabulary."""

import pandas as pd
import ray.data as rd

from entity_matching_datasets_ray.stages.text_analysis import vocab_topk


def brute(texts, k):
    toks = pd.Series(texts).dropna().str.lower().str.split().explode().dropna()
    vc = toks.value_counts().reset_index()
    vc.columns = ["token", "cnt"]
    vc = vc.sort_values(["cnt", "token"], ascending=[False, True], kind="mergesort")
    return vc.head(k).reset_index(drop=True)


def test_vocab_topk_matches_brute(ray_session):
    texts = [
        "the cat sat on the mat",
        "the dog\tsat on a log",
        None,
        "A a a B b the THE",
        "  ",
    ] * 7
    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(5)
    got = vocab_topk(ds, "text", k=4).to_pandas()
    want = brute(texts, 4)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want, check_dtype=False)


def test_vocab_topk_k_exceeds_vocab(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"text": ["x y", "y"]}))
    got = vocab_topk(ds, "text", k=100).to_pandas()
    assert list(got["token"]) == ["y", "x"]
    assert list(got["cnt"]) == [2, 1]
