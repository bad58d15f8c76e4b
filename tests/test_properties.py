"""Hypothesis property tests over the pure kernels (the reference's test
currency is example-based; these pin the invariants the engine relies on)."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from entity_matching_datasets_ray.functions.normalizers import (
    canonicalize_versions,
    format_colval,
    normalize_name,
    parse_colval,
)

_field = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd"), whitelist_characters=" "),
    min_size=1,
    max_size=30,
).filter(lambda s: s.strip() and "COL" not in s and "VAL" not in s)


@settings(max_examples=200, deadline=None)
@given(st.dictionaries(st.sampled_from(["name", "brand", "price", "city"]), _field, min_size=1))
def test_colval_roundtrip(fields):
    """format -> parse recovers every field (whitespace-normalized), the
    COL/VAL grammar invariant the Ditto reader depends on."""
    fields = {k: " ".join(v.split()) for k, v in fields.items() if v.strip()}
    line = format_colval(fields, sorted(fields))
    back = parse_colval(line)
    assert {k: " ".join(v.split()) for k, v in back.items()} == fields


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcdefghij v.0123456789", max_size=60))
def test_canonicalize_versions_idempotent(s):
    once = canonicalize_versions(s.lower())
    assert canonicalize_versions(once) == once


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=80))
def test_normalize_name_is_idempotent_and_clean(s):
    out = normalize_name(s)
    assert normalize_name(out) == out
    assert "  " not in out
    assert out == out.strip()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=200),
       st.sampled_from([0.25, 0.5, 0.75, 0.9]))
def test_quantile_index_rule_matches_sorted_element(values, q):
    """grouped_quantiles' index rule (sorted[ceil(q*n)-1]) always returns
    a REAL element at the documented rank."""
    v = np.sort(np.asarray(values))
    n = len(v)
    idx = max(0, math.ceil(q * n) - 1)
    got = v[idx]
    assert got in values
    # at least ceil(q*n) elements are <= the selected value
    assert (v <= got).sum() >= math.ceil(q * n)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 6),                      # cluster key
            st.sampled_from(["a", "bb", "bb", "ccc", None]),  # string attr
            st.one_of(st.none(), st.integers(-5, 5)),          # order attr
        ),
        min_size=1,
        max_size=60,
    )
)
def test_fuse_records_matches_brute_force_any_input(ray_session, rows):
    """fuse_records == a weight-unaware pandas brute force on arbitrary
    inputs (nulls, ties, singleton clusters) at a fixed partitioning —
    the combiner's weights and the bucketed merge must be invisible."""
    import pandas as pd
    import ray.data as rd

    from entity_matching_datasets_ray.stages.fusion import fuse_records

    df = pd.DataFrame(rows, columns=["k", "s", "o"])
    got = (
        fuse_records(
            rd.from_pandas(df).repartition(3),
            "k",
            [("mode_s", "mode", "s"), ("best_s", "max_by", "s", "o"), ("max_o", "max", "o")],
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    for _, row in got.iterrows():
        g = df[df["k"] == row["k"]]
        assert row["n_members"] == len(g)
        nn = g.dropna(subset=["s"])
        if len(nn):
            c = nn.groupby("s").size().reset_index(name="c")
            c = c.sort_values(["c", "s"], ascending=[False, True], kind="mergesort")
            assert row["mode_s"] == c["s"].iloc[0]
        else:
            assert pd.isna(row["mode_s"])
        both = g.dropna(subset=["s", "o"]).sort_values(
            ["o", "s"], ascending=[False, True], kind="mergesort"
        )
        if len(both):
            assert row["best_s"] == both["s"].iloc[0]
        else:
            assert pd.isna(row["best_s"])
    assert set(got["k"]) == set(df["k"])
