"""KMV distinct-count sketch: accuracy, partitioning independence, exact
small-cardinality path, integer-key contract."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from entity_matching_datasets_ray.stages.sketches import kmv_distinct


def test_kmv_estimate_accuracy_and_partition_independence(ray_session):
    n = 50_000
    keys = pd.DataFrame({"k": np.arange(n, dtype=np.int64) * 7 + 3})
    ests = []
    for parts in (2, 16):
        out = kmv_distinct(rd.from_pandas(keys).repartition(parts), "k", k=1024).to_pandas()
        assert out["k_used"].iloc[0] == 1024
        ests.append(int(out["n_distinct_est"].iloc[0]))
    assert ests[0] == ests[1]  # sketch is partition-independent
    rel_err = abs(ests[0] - n) / n
    assert rel_err < 0.1  # ~3 sigma at k=1024 is ~0.094


def test_kmv_exact_below_k_with_duplicates(ray_session):
    df = pd.DataFrame({"k": np.tile(np.arange(100, dtype=np.int64), 50)})  # 100 distinct, 5000 rows
    out = kmv_distinct(rd.from_pandas(df).repartition(8), "k", k=1024).to_pandas()
    assert out["n_distinct_est"].iloc[0] == 100
    assert out["k_used"].iloc[0] == 100


def test_kmv_rejects_non_integer_keys(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"k": ["a", "b"]}))
    with pytest.raises(Exception):
        kmv_distinct(ds, "k").to_pandas()


def _exact_hitters(texts, num, den):
    import collections

    toks = []
    for t in texts:
        if t is not None:
            toks.extend(str(t).lower().split())
    n = len(toks)
    cnt = collections.Counter(toks)
    rows = sorted(
        ((tok, c) for tok, c in cnt.items() if c * den >= num * n),
        key=lambda r: (-r[1], r[0]),
    )
    return rows, n


def test_heavy_hitters_exact_vs_serial(ray_session):
    """Distributed two-pass result == serial Counter at several partition
    layouts (candidate completeness is partitioning-dependent only in its
    PROOF, never its output)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from entity_matching_datasets_ray.stages.sketches import heavy_hitters

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(200)]
    # skewed: a few very hot tokens + long uniform tail
    weights = np.array([50.0] * 5 + [1.0] * 195)
    weights /= weights.sum()
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 12), p=weights))
        for _ in range(400)
    ] + [None, ""]
    want, n = _exact_hitters(texts, 1, 50)
    assert want, "fixture must produce at least one hitter"
    for parts in (1, 3, 9):
        ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(parts)
        got = heavy_hitters(ds, "text", min_frac_num=1, min_frac_den=50).to_pandas()
        assert list(map(tuple, got[["token", "cnt"]].itertuples(index=False))) == want


def test_heavy_hitters_threshold_edge(ray_session):
    """A token EXACTLY at the integer threshold is kept; one below is not
    (cnt*den >= num*N, no float ceil)."""
    import pandas as pd
    import ray.data as rd

    from entity_matching_datasets_ray.stages.sketches import heavy_hitters

    # N = 10 tokens; threshold num/den = 1/5 -> cnt*5 >= 10 -> cnt >= 2
    texts = ["a a b b c", "d e f g h"]
    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(2)
    got = heavy_hitters(ds, "text", min_frac_num=1, min_frac_den=5).to_pandas()
    assert list(map(tuple, got[["token", "cnt"]].itertuples(index=False))) == [
        ("a", 2), ("b", 2),
    ]


def test_heavy_hitters_empty_corpus(ray_session):
    import pandas as pd
    import ray.data as rd

    from entity_matching_datasets_ray.stages.sketches import heavy_hitters

    ds = rd.from_pandas(pd.DataFrame({"text": pd.array([None, ""], dtype=object)}))
    got = heavy_hitters(ds, "text")
    assert got.count() == 0
    # Dataset-level schema survives even though Ray's to_pandas drops
    # columns for 0-row results
    assert got.schema().names == ["token", "cnt"]


def test_quantile_sketch_exact_mode(ray_session):
    """Every block under k distinct values -> bit-identical to the
    quantile_disc rule (element at 1-indexed rank ceil(q*n))."""
    import math

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from entity_matching_datasets_ray.stages.sketches import quantile_sketch

    rng = np.random.default_rng(3)
    vals = rng.choice(np.arange(1.0, 41.0), size=5000)  # 40 distinct
    qs = (0.1, 0.5, 0.9, 0.99)
    want = [float(np.sort(vals)[math.ceil(q * len(vals)) - 1]) for q in qs]
    for parts in (1, 4, 16):
        ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(parts)
        got = quantile_sketch(ds, "x", qs=qs, k=256).to_pandas()
        assert list(got["x"]) == want, f"parts={parts}"
        assert list(got["q"]) == list(qs)


def test_quantile_sketch_error_bound(ray_session):
    """Approximate mode (distinct >> k): the returned value's true rank
    is within sum_b(n_b/k) + max-hot-count of the target rank."""
    import math

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from entity_matching_datasets_ray.stages.sketches import quantile_sketch

    rng = np.random.default_rng(5)
    vals = rng.standard_normal(20000)  # ~all distinct
    parts, k = 8, 64
    ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(parts)
    got = quantile_sketch(ds, "x", qs=(0.25, 0.5, 0.9), k=k).to_pandas()
    srt = np.sort(vals)
    n = len(vals)
    bound = n / k + 1 + parts  # sum_b ceil(n_b/k)-ish slack, values distinct
    for q, v in zip(got["q"], got["x"]):
        true_rank = np.searchsorted(srt, v, side="right")
        target = math.ceil(q * n)
        assert abs(true_rank - target) <= bound, (q, true_rank, target, bound)


def test_heavy_hitters_rejects_safety_one(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from entity_matching_datasets_ray.stages.sketches import heavy_hitters

    ds = rd.from_pandas(pd.DataFrame({"text": ["a b"]}))
    with pytest.raises(ValueError, match="safety"):
        heavy_hitters(ds, "text", min_frac_num=1, min_frac_den=5, safety=1)


def test_profile_columns_counts_and_estimates(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from entity_matching_datasets_ray.functions.text import md5_lower64
    from entity_matching_datasets_ray.stages.sketches import _TWO64, profile_columns

    rng = np.random.RandomState(4)
    n = 5000
    df = pd.DataFrame(
        {
            "big": rng.randint(0, 10**9, n),          # >> k distinct: estimator path
            "small": rng.randint(0, 37, n),            # < k distinct: exact path
            "s": pd.array(
                [None if i % 7 == 0 else f"v{i % 53}" for i in range(n)], dtype="string"
            ),                                          # string + nulls
        }
    )
    k = 256
    out = (
        profile_columns(rd.from_pandas(df).repartition(6), ["big", "small", "s"], k=k)
        .to_pandas()
        .set_index("column_name")
    )
    assert list(out.index) == ["big", "s", "small"]
    for c in ("big", "small", "s"):
        assert out.loc[c, "n_rows"] == n
    assert out.loc["big", "n_null"] == 0 and out.loc["s", "n_null"] == n // 7 + 1

    def serial_est(vals):
        hs = np.unique(
            np.fromiter((md5_lower64(str(v)) for v in set(vals)), np.uint64, len(set(vals)))
        )[:k]
        if hs.size < k:
            return hs.size, hs.size
        return int(np.floor((k - 1) * _TWO64 / float(hs.max()))), k

    # exact path: < k distinct -> exact counts
    assert out.loc["small", "n_distinct_est"] == 37 and out.loc["small", "k_used"] == 37
    assert out.loc["s", "n_distinct_est"] == 53
    # estimator path: bit-identical to the serial spec
    est, used = serial_est(df["big"].tolist())
    assert out.loc["big", "n_distinct_est"] == est and out.loc["big", "k_used"] == used
    assert abs(est - df["big"].nunique()) / df["big"].nunique() < 0.2  # sane estimate
