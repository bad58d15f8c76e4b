"""Record fusion (survivorship) — equality to a pandas brute-force
reference at several partitionings, plus rule edge cases."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from entity_matching_datasets_ray.stages.fusion import FuseRule, fuse_records

RULES = [
    ("top_s", "mode", "s"),
    ("long_s", "longest", "s"),
    ("min_v", "min", "v"),
    ("max_v", "max", "v"),
    ("sum_w", "sum", "w"),
    ("nd_s", "count_distinct", "s"),
    ("latest_s", "max_by", "s", "ts"),
    ("earliest_s", "min_by", "s", "ts"),
]


def brute_fuse(df: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for k, g in df.groupby("k", sort=True):
        row = {"k": k, "n_members": len(g)}
        nn = g.dropna(subset=["s"])
        if len(nn):
            c = nn.groupby("s").size().reset_index(name="c")
            c = c.sort_values(["c", "s"], ascending=[False, True])
            row["top_s"] = c["s"].iloc[0]
            ln = nn.assign(L=nn["s"].str.len()).sort_values(["L", "s"], ascending=[False, True])
            row["long_s"] = ln["s"].iloc[0]
        else:
            row["top_s"] = row["long_s"] = None
        row["min_v"] = g["v"].min()
        row["max_v"] = g["v"].max()
        row["sum_w"] = g["w"].sum() if g["w"].notna().any() else np.nan
        row["nd_s"] = nn["s"].nunique()
        both = g.dropna(subset=["s", "ts"])
        for out, asc in (("latest_s", False), ("earliest_s", True)):
            if len(both):
                o = both.sort_values(["ts", "s"], ascending=[asc, True])
                row[out] = o["s"].iloc[0]
            else:
                row[out] = None
        rows.append(row)
    return pd.DataFrame(rows)


def make_df(n=400, seed=7):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 60, n),
            "s": rng.choice(["a", "bb", "bb", "ccc", "d", None], n),
            "v": rng.choice([1.0, 2.5, 9.0, np.nan], n),
            "w": rng.integers(1, 5, n).astype("int64"),
            "ts": pd.to_datetime("2020-01-01")
            + pd.to_timedelta(rng.integers(0, 10, n), unit="D"),
        }
    )
    return df


@pytest.mark.parametrize("parts", [1, 3, 16])
def test_fuse_matches_brute_force(ray_session, parts):
    df = make_df()
    got = (
        fuse_records(rd.from_pandas(df).repartition(parts), "k", RULES, num_buckets=8)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = brute_fuse(df)
    got = got[want.columns]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_fuse_all_null_group(ray_session):
    df = pd.DataFrame(
        {"k": [1, 1], "s": [None, None], "v": [np.nan, np.nan], "w": [1, 2],
         "ts": pd.to_datetime([None, None])}
    )
    got = fuse_records(rd.from_pandas(df), "k", RULES, num_buckets=2).to_pandas()
    assert got["n_members"].iloc[0] == 2
    assert got["nd_s"].iloc[0] == 0
    assert pd.isna(got["top_s"].iloc[0]) and pd.isna(got["latest_s"].iloc[0])


def test_fuse_rule_validation():
    with pytest.raises(ValueError):
        FuseRule("x", "median", "c")
    with pytest.raises(ValueError):
        FuseRule("x", "max_by", "c")
