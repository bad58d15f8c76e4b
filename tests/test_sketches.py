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
