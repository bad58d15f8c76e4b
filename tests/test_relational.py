"""Relational operator tests that don't need the DuckDB oracle harness:
adaptive anti-join (broadcast vs shuffle equality) and exact cent sums."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from entity_matching_datasets_ray.pipelines.relational import _cents, anti_join


def _tables():
    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3, 4, 5, 6], pa.int32()),
                "name": [f"n{i}" for i in range(6)],
            }
        )
    )
    right = rd.from_arrow(
        pa.table({"rk": pa.array([2, 2, 4, 9], pa.int32())})
    )
    return left, right


def test_anti_join_broadcast():
    left, right = _tables()
    out = anti_join(left, right, on="k", right_on="rk").to_pandas().sort_values("k")
    assert out["k"].tolist() == [1, 3, 5, 6]


def test_anti_join_shuffle_matches_broadcast():
    left, right = _tables()
    # force the shuffle fallback with a tiny broadcast cap
    out = (
        anti_join(left, right, on="k", right_on="rk", max_broadcast_keys=1)
        .to_pandas()
        .sort_values("k")
    )
    assert out["k"].tolist() == [1, 3, 5, 6]
    assert list(out.columns) == ["k", "name"]


def test_cents_exact():
    t = pa.table({"x": pa.array([1013.7, -994.28, 0.01, 104997.88])})
    assert _cents(t["x"]).to_pylist() == [101370, -99428, 1, 10499788]


def test_set_op_intersect_except(ray_session):
    import pandas as pd
    import ray.data as rd

    from entity_matching_datasets_ray.pipelines.relational import set_op

    a = rd.from_pandas(pd.DataFrame({"k": [1, 2, 2, 3, 5]})).repartition(3)
    b = rd.from_pandas(pd.DataFrame({"k": [2, 3, 3, 4]})).repartition(2)
    inter = sorted(set_op(a, b, "k", "intersect").to_pandas()["k"])
    assert inter == [2, 3]
    exc = sorted(set_op(a, b, "k", "except").to_pandas()["k"])
    assert exc == [1, 5]
    import pytest

    with pytest.raises(ValueError):
        set_op(a, b, "k", "union")


def test_grouped_collect_and_cont_quantiles(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from entity_matching_datasets_ray.pipelines.relational import grouped_collect, grouped_quantiles

    df = pd.DataFrame({"k": ["a", "a", "b", "a", "b"], "v": [3, 1, 9, 2, 4]})
    got = (
        grouped_collect(rd.from_pandas(df).repartition(3), ["k"], "v", num_buckets=4)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(got["items"]) == ["1,2,3", "4,9"]

    # cont quantiles: interpolation matches numpy's linear method; n=1 group
    df2 = pd.DataFrame({"k": ["x"] * 5 + ["y"], "v": [1.0, 2.0, 3.0, 4.0, 10.0, 7.0]})
    q = (
        grouped_quantiles(rd.from_pandas(df2), ["k"], "v", qs=(0.5, 0.9), method="cont")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert q.loc[0, "p50"] == 3.0
    assert abs(q.loc[0, "p90"] - np.quantile([1, 2, 3, 4, 10], 0.9)) < 1e-12
    assert q.loc[1, "p50"] == 7.0 and q.loc[1, "p90"] == 7.0


def test_global_quantiles_matches_numpy(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from entity_matching_datasets_ray.pipelines.relational import global_quantiles

    rng = np.random.default_rng(4)
    vals = np.round(rng.uniform(0, 1000, 5000), 2)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(13)
    got = global_quantiles(ds, "v", (0.01, 0.5, 0.9, 1.0)).to_pandas()
    sv = np.sort(vals)
    import math

    for _, row in got.iterrows():
        want = sv[max(0, math.ceil(row["q"] * len(sv)) - 1)]
        assert row["v"] == want, (row["q"], row["v"], want)


def test_grouped_topk_matches_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from entity_matching_datasets_ray.pipelines.relational import grouped_topk

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 3, 4000),   # LOW-cardinality key on purpose
            "id": np.arange(4000, dtype=np.int64),
            "v": np.round(rng.uniform(0, 100, 4000), 2),
        }
    )
    got = (
        grouped_topk(rd.from_pandas(df).repartition(11), ["k"], ["v", "id"], [False, True], 5)
        .to_pandas()
        .sort_values(["k", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["v", "id"], ascending=[False, True])
        .groupby("k", sort=False)
        .head(5)
        .sort_values(["k", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_grouped_collect_multi_key(ray_session):
    import pandas as pd
    import ray.data as rd

    from entity_matching_datasets_ray.pipelines.relational import grouped_collect

    df = pd.DataFrame(
        {"a": ["x", "x", "y"], "b": [1, 1, 2], "v": [3, 1, 9]}
    )
    got = (
        grouped_collect(rd.from_pandas(df).repartition(2), ["a", "b"], "v", num_buckets=4)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert list(got["items"]) == ["1,3", "9"]


def test_grouped_quantiles_sorted_equals_in_memory(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from entity_matching_datasets_ray.pipelines.relational import (
        grouped_quantiles,
        grouped_quantiles_sorted,
    )

    rng = np.random.default_rng(13)
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], 3000),  # low-cardinality key
            "v": np.round(rng.uniform(0, 500, 3000), 2),
        }
    )
    for parts in (3, 17):
        ds = rd.from_pandas(df).repartition(parts)
        a = (
            grouped_quantiles(ds, ["k"], "v", (0.1, 0.5, 0.9))
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        b = (
            grouped_quantiles_sorted(ds, "k", "v", (0.1, 0.5, 0.9))
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a[b.columns], b)
        ac = (
            grouped_quantiles(ds, ["k"], "v", (0.1, 0.5, 0.9), method="cont")
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        bc = (
            grouped_quantiles_sorted(ds, "k", "v", (0.1, 0.5, 0.9), method="cont")
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(ac[bc.columns], bc)


def test_semi_join_both_paths(ray_session):
    import pandas as pd
    import ray.data as rd

    from entity_matching_datasets_ray.pipelines.relational import semi_join

    left = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3, 4], "x": ["a", "b", "c", "d"]}))
    right = rd.from_pandas(pd.DataFrame({"rk": [2, 2, 4, 9]}))  # dup right keys
    for cap in (1000, 1):  # broadcast path, then forced shuffle path
        out = (
            semi_join(left, right, on="k", right_on="rk", max_broadcast_keys=cap)
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        assert list(out["k"]) == [2, 4]          # never duplicated
        assert list(out.columns) == ["k", "x"]   # full left rows


def test_membership_join_null_semantics_both_paths(ray_session):
    """SQL EXISTS / NOT EXISTS over equality: NULL never matches — a NULL
    right key witnesses nothing, a NULL left key matches nothing, on BOTH
    the broadcast and shuffle plans (ADVICE r3: the broadcast path used to
    let null match null via pc.is_in skip_nulls=False)."""
    import pandas as pd
    import ray.data as rd

    from entity_matching_datasets_ray.pipelines.relational import anti_join, semi_join

    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, None, 4], pa.int64()),
                  "x": ["a", "b", "c", "d"]})
    )
    right = rd.from_arrow(pa.table({"rk": pa.array([2, None, 9], pa.int64())}))
    for cap in (1000, 1):  # broadcast, then forced shuffle
        semi = (
            semi_join(left, right, on="k", right_on="rk", max_broadcast_keys=cap)
            .to_pandas().sort_values("x")
        )
        anti = (
            anti_join(left, right, on="k", right_on="rk", max_broadcast_keys=cap)
            .to_pandas().sort_values("x")
        )
        assert list(semi["x"]) == ["b"], f"cap={cap}"          # EXISTS
        assert list(anti["x"]) == ["a", "c", "d"], f"cap={cap}"  # NOT EXISTS


def test_membership_join_probe_skips_driver_stream_on_large_right(ray_session):
    """With a right key set far over the cap, the KMV probe must route to
    the shuffle plan without the driver ever streaming the right side:
    iter_batches on the right Dataset would be the old behavior — here we
    just assert correctness and that the plan gives the same answer as the
    broadcast plan on a small equivalent."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from entity_matching_datasets_ray.pipelines.relational import semi_join

    left = rd.from_pandas(pd.DataFrame({"k": np.arange(50, dtype=np.int64), "x": ["v"] * 50}))
    # 20k distinct right keys, cap 1000 -> KMV estimate >> cap -> shuffle
    right = rd.from_pandas(pd.DataFrame({"rk": np.arange(0, 40000, 2, dtype=np.int64)}))
    out = (
        semi_join(left, right, on="k", right_on="rk", max_broadcast_keys=1000)
        .to_pandas().sort_values("k")
    )
    assert list(out["k"]) == list(range(0, 50, 2))


def test_bloom_membership_matches_exact(ray_session):
    """Bloom semi/anti == plain semi/anti on a randomized key universe —
    exactness must be independent of fp rate, so run one config with a
    TINY bitmap (m=1024 floor, heavy fp) and one sized normally."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from entity_matching_datasets_ray.pipelines.relational import (
        anti_join, bloom_anti_join, bloom_semi_join, semi_join,
    )

    rng = np.random.default_rng(7)
    left = rd.from_pandas(pd.DataFrame({
        "k": rng.integers(0, 500, 300), "x": np.arange(300),
    }))
    right = rd.from_pandas(pd.DataFrame({"rk": rng.integers(250, 750, 200)}))

    exact_semi = semi_join(left, right, on="k", right_on="rk").to_pandas()
    exact_anti = anti_join(left, right, on="k", right_on="rk").to_pandas()
    for expected in (1, 100_000):  # m floor (fp-heavy) vs roomy bitmap
        bs = bloom_semi_join(left, right, on="k", right_on="rk",
                             expected_keys=expected).to_pandas()
        ba = bloom_anti_join(left, right, on="k", right_on="rk",
                             expected_keys=expected).to_pandas()
        for got, want in ((bs, exact_semi), (ba, exact_anti)):
            pd.testing.assert_frame_equal(
                got.sort_values("x").reset_index(drop=True),
                want.sort_values("x").reset_index(drop=True),
            )


def test_bloom_membership_dtype_and_null_semantics(ray_session):
    """int32 left vs int64 right must not bloom-test false-negative
    (canonical int64 hashing), and NULL keys follow EXISTS semantics:
    semi drops them, anti keeps them."""
    import pandas as pd
    import ray.data as rd

    from entity_matching_datasets_ray.pipelines.relational import (
        bloom_anti_join, bloom_semi_join,
    )

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, None, 4], pa.int32()),
        "x": ["a", "b", "c", "d"],
    }))
    right = rd.from_arrow(pa.table({"rk": pa.array([2, None, 9], pa.int64())}))
    semi = bloom_semi_join(left, right, on="k", right_on="rk",
                           expected_keys=1000).to_pandas().sort_values("x")
    anti = bloom_anti_join(left, right, on="k", right_on="rk",
                           expected_keys=1000).to_pandas().sort_values("x")
    assert list(semi["x"]) == ["b"]
    assert list(anti["x"]) == ["a", "c", "d"]


def test_bloom_membership_string_keys(ray_session):
    import pandas as pd
    import ray.data as rd

    from entity_matching_datasets_ray.pipelines.relational import bloom_semi_join

    left = rd.from_pandas(pd.DataFrame({"k": ["aa", "bb", "cc"], "x": [1, 2, 3]}))
    right = rd.from_pandas(pd.DataFrame({"rk": ["bb", "zz"]}))
    out = bloom_semi_join(left, right, on="k", right_on="rk",
                          expected_keys=100).to_pandas()
    assert list(out["k"]) == ["bb"]
