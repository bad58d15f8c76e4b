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
