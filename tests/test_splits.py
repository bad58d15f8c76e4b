"""Leakage-safe splits: cluster-constant assignment, SQL-matching hash,
proportions, determinism across partitionings."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from entity_matching_datasets_ray.stages.splits import (
    _RESOLUTION,
    assign_splits,
    split_boundaries,
)


def _clustered_frame(n_clusters=500, rng_seed=3):
    rng = np.random.RandomState(rng_seed)
    sizes = rng.randint(1, 6, n_clusters)
    cluster = np.repeat(np.arange(n_clusters, dtype=np.int64), sizes)
    return pd.DataFrame(
        {"doc_id": np.arange(len(cluster), dtype=np.int64), "cluster": cluster}
    )


@pytest.mark.parametrize("parts", [1, 4])
def test_no_cluster_straddles_splits(parts):
    df = _clustered_frame()
    out = (
        assign_splits(rd.from_pandas(df).repartition(parts), "cluster")
        .to_pandas()
    )
    per_cluster = out.groupby("cluster")["split"].nunique()
    assert (per_cluster == 1).all()
    # and multi-member clusters actually exist in the fixture
    assert (out.groupby("cluster").size() > 1).any()


def test_split_matches_sql_hash_formula():
    """Engine assignment == the documented HUGEINT SQL expression."""
    import duckdb

    df = _clustered_frame(n_clusters=2000)
    out = (
        assign_splits(rd.from_pandas(df), "cluster", {"train": 0.8, "valid": 0.1, "test": 0.1})
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    sql = duckdb.sql(
        """
        SELECT doc_id,
               CASE WHEN h < 800000 THEN 'train'
                    WHEN h < 900000 THEN 'valid'
                    ELSE 'test' END AS split
        FROM (
            SELECT doc_id,
                   ((CAST(cluster AS HUGEINT) * 11400714819323198485)
                     % 18446744073709551616) % 1000000 AS h
            FROM df
        ) ORDER BY doc_id
        """
    ).df()
    assert list(out["split"]) == list(sql["split"])


def test_split_proportions_and_weights():
    df = pd.DataFrame({"cluster": np.arange(200_000, dtype=np.int64)})
    out = assign_splits(
        rd.from_pandas(df), "cluster", {"train": 0.9, "test": 0.1}
    ).to_pandas()
    frac = (out["split"] == "train").mean()
    assert abs(frac - 0.9) < 0.01


def test_string_keys_deterministic():
    # compare the cluster->split MAPPING, not positional row order: the
    # assignment is a pure function of the key, but to_pandas row order
    # through repartition is not a Ray contract (flaked under host load)
    df = pd.DataFrame({"cluster": [f"c{i % 50}" for i in range(400)]})
    a = assign_splits(rd.from_pandas(df).repartition(1), "cluster").to_pandas()
    b = assign_splits(rd.from_pandas(df).repartition(7), "cluster").to_pandas()
    a_map = dict(zip(a["cluster"], a["split"]))
    b_map = dict(zip(b["cluster"], b["split"]))
    assert a_map == b_map
    assert (a.groupby("cluster")["split"].nunique() == 1).all()
    assert (b.groupby("cluster")["split"].nunique() == 1).all()
    # salt re-rolls the assignment
    c = assign_splits(rd.from_pandas(df), "cluster", salt=1).to_pandas()
    c_map = dict(zip(c["cluster"], c["split"]))
    assert a_map != c_map


def test_boundaries_cover_resolution():
    names, bounds = split_boundaries({"a": 1, "b": 1, "c": 1})
    assert names == ["a", "b", "c"]
    assert bounds[-1] == _RESOLUTION
    with pytest.raises(ValueError):
        split_boundaries({"a": -1.0})


def test_deterministic_sample_nested_and_stable():
    """Threshold sampling is NESTED (sample(0.2) is a subset of
    sample(0.5)) and partitioning-independent."""
    from entity_matching_datasets_ray.stages.splits import deterministic_sample

    df = pd.DataFrame({"doc_id": np.arange(5000, dtype=np.int64)})
    s20 = set(
        deterministic_sample(rd.from_pandas(df).repartition(4), "doc_id", 0.2)
        .to_pandas()["doc_id"]
    )
    s50 = set(
        deterministic_sample(rd.from_pandas(df).repartition(1), "doc_id", 0.5)
        .to_pandas()["doc_id"]
    )
    assert s20 <= s50
    assert abs(len(s20) / 5000 - 0.2) < 0.02
    assert abs(len(s50) / 5000 - 0.5) < 0.02
    with pytest.raises(ValueError):
        deterministic_sample(rd.from_pandas(df), "doc_id", 1.5)


def test_stratified_sample_rates():
    from entity_matching_datasets_ray.stages.splits import stratified_sample

    n = 30000
    rng = np.random.RandomState(8)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": rng.choice(["en", "de", "fr"], n),
        }
    )
    out = stratified_sample(
        rd.from_pandas(df).repartition(3), "doc_id", "lang",
        {"en": 0.5, "de": 0.25}, default_fraction=0.0,
    ).to_pandas()
    base = df.groupby("lang").size()
    got = out.groupby("lang").size()
    assert abs(got.get("en", 0) / base["en"] - 0.5) < 0.02
    assert abs(got.get("de", 0) / base["de"] - 0.25) < 0.02
    assert got.get("fr", 0) == 0  # default_fraction=0 drops unlisted strata


def test_mix_corpora_deterministic_and_rated(ray_session):
    """Multi-corpus mixture: per-source rates hold (hash-slice sampling),
    provenance tags ride along, the interleave is reproducible under
    repartitioning, and sources genuinely interleave (not concatenate)."""
    from entity_matching_datasets_ray.stages.splits import mix_corpora

    n = 4000
    a = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "v": ["a"] * n})
    b = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "v": ["b"] * n})
    srcs = [("A", rd.from_pandas(a), 0.5), ("B", rd.from_pandas(b).repartition(7), 0.2)]
    out = mix_corpora(srcs, "doc_id").to_pandas()
    counts = out["source"].value_counts()
    assert abs(counts["A"] / n - 0.5) < 0.05
    assert abs(counts["B"] / n - 0.2) < 0.05
    # reproducible under different input partitioning
    srcs2 = [("A", rd.from_pandas(a).repartition(5), 0.5), ("B", rd.from_pandas(b), 0.2)]
    out2 = mix_corpora(srcs2, "doc_id").to_pandas()
    key = ["mix_key", "source", "doc_id"]
    pd.testing.assert_frame_equal(
        out.sort_values(key).reset_index(drop=True)[["source", "doc_id"]],
        out2.sort_values(key).reset_index(drop=True)[["source", "doc_id"]],
    )
    # interleaved: the first 10% of the stream already contains both sources
    head = out.head(len(out) // 10)
    assert set(head["source"]) == {"A", "B"}


def test_mix_corpora_string_keys_hetero_schema_tiebreak(ray_session):
    """String item keys hash via the SQL-reproducible FNV path, sources
    with extra columns are reconciled by the `columns` projection, and
    tiebreak_cols make the interleave ORDER itself reproducible when the
    primary key repeats within a source."""
    from entity_matching_datasets_ray.stages.splits import mix_corpora

    n = 2000
    a = pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64),
         "item_id": [f"a:{i}" for i in range(n)]}
    )
    # wider schema + repeated doc_id per item (chunk-like)
    b = pd.DataFrame(
        {"doc_id": np.repeat(np.arange(n // 2, dtype=np.int64), 2),
         "item_id": [f"b:{i // 2}:{i % 2}" for i in range(n)],
         "extra": ["x"] * n}
    )
    srcs = [("A", rd.from_pandas(a), 0.5), ("B", rd.from_pandas(b).repartition(7), 0.4)]
    out = mix_corpora(
        srcs, key_col="item_id", columns=["doc_id", "item_id"]
    ).to_pandas()
    assert list(out.columns) == ["doc_id", "item_id", "source", "mix_key"]
    counts = out["source"].value_counts()
    assert abs(counts["A"] / n - 0.5) < 0.05
    assert abs(counts["B"] / n - 0.4) < 0.05
    # the emitted ORDER (not just the set) is identical across partitionings
    # because item_id is unique per source — no tie columns needed here
    srcs2 = [("A", rd.from_pandas(a).repartition(5), 0.5), ("B", rd.from_pandas(b), 0.4)]
    out2 = mix_corpora(
        srcs2, key_col="item_id", columns=["doc_id", "item_id"]
    ).to_pandas()
    pd.testing.assert_frame_equal(out.reset_index(drop=True), out2.reset_index(drop=True))

    # tiebreak_cols: keying on the REPEATING doc_id, order is only
    # deterministic once item_id breaks the tie
    srcs3 = [("B", rd.from_pandas(b).repartition(7), 1.0)]
    o1 = mix_corpora(srcs3, key_col="doc_id", columns=["doc_id", "item_id"],
                     tiebreak_cols=("item_id",)).to_pandas()
    srcs4 = [("B", rd.from_pandas(b).repartition(3), 1.0)]
    o2 = mix_corpora(srcs4, key_col="doc_id", columns=["doc_id", "item_id"],
                     tiebreak_cols=("item_id",)).to_pandas()
    pd.testing.assert_frame_equal(o1.reset_index(drop=True), o2.reset_index(drop=True))

    with pytest.raises(ValueError, match="must include key_col"):
        mix_corpora(srcs3, key_col="doc_id", columns=["item_id"])


def test_weighted_sample_matches_spec_and_caps(ray_session):
    import pandas as pd
    import ray.data as rd

    from entity_matching_datasets_ray.stages.splits import (
        _RESOLUTION,
        _hash_frac,
        weighted_sample,
    )

    ids = list(range(400))
    # weights spanning the cap: 0 (never), tiny, around the rate, huge (always)
    w = [(i * 37) % 250 for i in ids]
    w[0] = 0
    w[1] = -5  # negative weight: never sampled
    w[2] = 10_000  # >> den/num: always sampled (cap at p=1)
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "wt": w})).repartition(6)

    num, den = 1, 100
    out = weighted_sample(ds, "doc_id", "wt", num, den).to_pandas()

    import pyarrow as pa

    h = _hash_frac(pa.chunked_array([pa.array(ids, pa.int64())]), 0)
    want = {i for i, (hi, wi) in enumerate(zip(h, w)) if hi * den < wi * num * _RESOLUTION}
    assert set(out["doc_id"]) == want
    assert 0 not in want and 1 not in want and 2 in want
    # repeatable: second run identical
    out2 = weighted_sample(ds, "doc_id", "wt", num, den).to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])
    # float weight column is rejected (ulp on the threshold boundary)
    fds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "wt": [float(x) for x in w]}))
    import pytest as _pytest
    import ray.exceptions

    with _pytest.raises(ray.exceptions.RayTaskError):
        weighted_sample(fds, "doc_id", "wt", num, den).to_pandas()
