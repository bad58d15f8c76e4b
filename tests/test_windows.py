"""Time-ordered operator tests: sliding windows, partitioned lag, as-of
join — each against an in-memory brute-force reference, across
partitionings (the as-of boundary exchange must be exact)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from entity_matching_datasets_ray.stages.windows import (
    asof_join,
    lag_partitioned,
    sliding_window_agg,
)


@pytest.fixture(scope="module")
def events():
    rng = np.random.RandomState(9)
    n = 500
    ts = pd.Timestamp("2024-03-01") + pd.to_timedelta(
        np.sort(rng.choice(10 * 24 * 3600, n, replace=False)), unit="s"
    )
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": rng.choice(["a", "b", "c"], n),
            "ts": ts,
            "value": np.round(rng.uniform(0, 100, n), 2),
        }
    )


def test_sliding_window_matches_bruteforce(events):
    out = (
        sliding_window_agg(rd.from_pandas(events), "ts", ["event_type"], "value", 3, 1)
        .to_pandas()
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    # brute force: window covers t iff start <= t < start + 3h
    rows = []
    for _, r in events.iterrows():
        base = r.ts.floor("h")
        for i in range(3):
            rows.append((r.event_type, base - pd.Timedelta(hours=i), r.value))
    bf = (
        pd.DataFrame(rows, columns=["event_type", "window_start", "value"])
        .groupby(["event_type", "window_start"])
        .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        .reset_index()
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    assert len(out) == len(bf)
    assert (out["n_events"].to_numpy() == bf["n_events"].to_numpy()).all()
    assert np.allclose(out["sum_value"], bf["sum_value"], atol=1e-9)


def test_lag_matches_pandas(events):
    out = (
        lag_partitioned(rd.from_pandas(events), "event_type", "ts", "event_id", "value")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    bf = events.sort_values(["ts", "event_id"]).copy()
    bf["prev_event_id"] = bf.groupby("event_type")["event_id"].shift(1)
    bf["prev_value"] = bf.groupby("event_type")["value"].shift(1)
    bf = bf.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_series_equal(out["prev_event_id"], bf["prev_event_id"], check_names=False)
    pd.testing.assert_series_equal(out["prev_value"], bf["prev_value"], check_names=False)


def test_lag_single_hot_key_spanning_many_partitions():
    """A single key across many sorted blocks must lag correctly via the
    per-block carry exchange — no whole-key pandas group anywhere."""
    rng = np.random.RandomState(3)
    n = 2000
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        np.sort(rng.choice(10**6, n, replace=False)), unit="s"
    )
    df = pd.DataFrame(
        {
            "event_id": rng.permutation(n).astype(np.int64),
            "event_type": "hot",  # ONE key — the scale-killer case
            "ts": ts,
            "value": np.round(rng.uniform(0, 100, n), 2),
        }
    )
    out = (
        lag_partitioned(
            rd.from_pandas(df).repartition(16), "event_type", "ts", "event_id", "value"
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    bf = df.sort_values(["ts", "event_id"]).copy()
    bf["prev_event_id"] = bf["event_id"].shift(1)
    bf["prev_value"] = bf["value"].shift(1)
    bf = bf.sort_values("event_id").reset_index(drop=True)
    assert np.allclose(
        out["prev_event_id"].to_numpy(), bf["prev_event_id"].to_numpy(), equal_nan=True
    )
    assert np.allclose(out["prev_value"].to_numpy(), bf["prev_value"].to_numpy(), equal_nan=True)


def test_asof_native_int_dtype_and_tie_determinism():
    """asof_event_id must be nullable int64 (never float64/NaN), and with
    duplicate build timestamps the largest-tiebreak build row must win,
    identically at every partitioning."""
    probe = pd.DataFrame(
        {
            "event_id": np.array([100, 101, 102], dtype=np.int64),
            "ts": pd.to_datetime(["2024-01-01 00:30", "2024-01-01 01:00", "2024-01-01 02:00"]),
        }
    )
    # two build rows share ts 01:00 — ties must resolve to the larger id (6)
    build = pd.DataFrame(
        {
            "event_id": np.array([5, 6, 7], dtype=np.int64),
            "ts": pd.to_datetime(["2024-01-01 01:00", "2024-01-01 01:00", "2024-01-01 03:00"]),
        }
    )
    for parts in (1, 2, 3):
        res = asof_join(
            rd.from_pandas(probe),
            rd.from_pandas(build),
            "ts", "ts", ["event_id"], ["event_id"], num_partitions=parts,
        )
        sch = dict(zip(res.schema().names, res.schema().types))
        # native Arrow int64 end-to-end (pandas may still widen nulls to
        # float64 on conversion — exactly as DuckDB's .df() does)
        assert sch["asof_event_id"] == pa.int64()
        out = res.to_pandas().sort_values("event_id").reset_index(drop=True)
        assert pd.isna(out["asof_event_id"].iloc[0])
        assert out["asof_event_id"].iloc[1] == 6  # tie → largest build id
        assert out["asof_event_id"].iloc[2] == 6


@pytest.mark.parametrize("parts", [2, 7])
def test_asof_join_matches_bruteforce(events, parts):
    probe = events[events.event_type == "a"][["event_id", "ts"]]
    build = events[events.event_type == "b"][["event_id", "ts"]]
    out = (
        asof_join(
            rd.from_pandas(probe.reset_index(drop=True)),
            rd.from_pandas(build.reset_index(drop=True)),
            "ts", "ts", ["event_id"], ["event_id"], num_partitions=parts,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    bts = build["ts"].to_numpy()
    bid = build["event_id"].to_numpy()
    expected = []
    for _, r in probe.iterrows():
        mask = bts <= r.ts.to_datetime64()
        expected.append(float(bid[mask][-1]) if mask.any() else np.nan)
    got = out["asof_event_id"].to_numpy()
    exp = np.asarray(expected)
    assert len(got) == len(exp)
    assert np.allclose(got, exp, equal_nan=True)


def _brute_sessions(df: pd.DataFrame, gap) -> pd.DataFrame:
    df = df.sort_values(["key", "ts", "event_id"]).reset_index(drop=True)
    prev_ts = df.groupby("key")["ts"].shift(1)
    is_new = prev_ts.isna() | ((df["ts"] - prev_ts) > gap)
    idx = is_new.astype("int64").groupby(df["key"]).cumsum()
    out = df[["event_id", "key", "ts"]].copy()
    out["session_id"] = df["key"].astype(str) + ":" + idx.astype(str)
    return out.sort_values("event_id").reset_index(drop=True)


@pytest.mark.parametrize("parts", [1, 2, 7])
def test_sessionize_matches_bruteforce(parts):
    from datetime import timedelta

    from entity_matching_datasets_ray.stages.windows import sessionize

    rng = np.random.RandomState(21)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "key": rng.choice(["u1", "u2", "u3", "u4"], n),
            "ts": pd.Timestamp("2024-05-01")
            + pd.to_timedelta(np.sort(rng.choice(3 * 24 * 3600, n, replace=False)), unit="s"),
        }
    )
    gap = timedelta(minutes=45)
    out = (
        sessionize(rd.from_pandas(df), "key", "ts", "event_id", gap, num_partitions=parts)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, _brute_sessions(df, gap))


def test_sessionize_key_spans_many_partitions():
    """One key across 16 partitions: the per-block carry + prefix-sum
    offset chain must thread session indices through every boundary,
    including blocks whose first row continues the previous session."""
    from datetime import timedelta

    from entity_matching_datasets_ray.stages.windows import sessionize

    n = 1000
    # alternate 10-minute continuation steps with occasional 2h jumps
    steps = np.where(np.arange(n) % 97 == 0, 7200, 600)
    ts = pd.Timestamp("2024-06-01") + pd.to_timedelta(np.cumsum(steps), unit="s")
    df = pd.DataFrame(
        {"event_id": np.arange(n, dtype=np.int64), "key": "solo", "ts": ts}
    )
    gap = timedelta(hours=1)
    out = (
        sessionize(rd.from_pandas(df), "key", "ts", "event_id", gap, num_partitions=16)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = _brute_sessions(df, gap)
    pd.testing.assert_frame_equal(out, exp)
    # sanity: multiple sessions actually exist and the count matches
    assert out["session_id"].nunique() == exp["session_id"].nunique() > 5


def _brute_interval_pairs(ev: pd.DataFrame, iv: pd.DataFrame):
    out = []
    for _, r in iv.iterrows():
        m = ev[(ev.ts >= r.start) & (ev.ts < r.end)]
        out.extend((r.interval_id, e) for e in m.event_id)
    return sorted(out)


@pytest.mark.parametrize("bin_width", ["30min", "2h", "7h"])
@pytest.mark.parametrize("parts", [2, 5])
def test_interval_join_matches_bruteforce(bin_width, parts):
    from entity_matching_datasets_ray.stages.windows import interval_join

    rng = np.random.RandomState(9)
    n = 600
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-03-01")
            + pd.to_timedelta(rng.randint(0, 5 * 24 * 3600, n), unit="s"),
        }
    )
    starts = pd.Timestamp("2024-03-01") + pd.to_timedelta(
        rng.randint(0, 5 * 24 * 3600, 40), unit="s"
    )
    iv = pd.DataFrame(
        {
            "interval_id": np.arange(40, dtype=np.int64),
            "start": starts,
            # mixed lengths: shorter and much longer than every bin width
            "end": starts + pd.to_timedelta(rng.randint(60, 12 * 3600, 40), unit="s"),
        }
    )
    got = interval_join(
        rd.from_pandas(ev).repartition(parts),
        rd.from_pandas(iv).repartition(2),
        bin_width=bin_width,
        emit="pairs",
        num_partitions=parts,
    ).to_pandas()
    assert sorted(zip(got.interval_id, got.event_id)) == _brute_interval_pairs(ev, iv)

    counts = interval_join(
        rd.from_pandas(ev).repartition(parts),
        rd.from_pandas(iv).repartition(2),
        bin_width=bin_width,
        emit="counts",
        num_partitions=parts,
    ).to_pandas()
    exp = (
        pd.Series([i for i, _ in _brute_interval_pairs(ev, iv)])
        .value_counts()
        .sort_index()
    )
    got_c = counts.sort_values("interval_id").set_index("interval_id")["n_events"]
    assert dict(got_c) == dict(exp)


def test_interval_join_empty_and_boundary():
    """end is EXCLUSIVE, start inclusive; intervals with no events vanish."""
    from entity_matching_datasets_ray.stages.windows import interval_join

    ev = pd.DataFrame(
        {
            "event_id": np.array([1, 2], dtype=np.int64),
            "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 01:00:00"]),
        }
    )
    iv = pd.DataFrame(
        {
            "interval_id": np.array([10, 11, 12], dtype=np.int64),
            "start": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:30:00", "2024-01-02 00:00:00"]
            ),
            "end": pd.to_datetime(
                ["2024-01-01 01:00:00", "2024-01-01 02:00:00", "2024-01-03 00:00:00"]
            ),
        }
    )
    got = interval_join(
        rd.from_pandas(ev), rd.from_pandas(iv), bin_width="1h", emit="pairs"
    ).to_pandas()
    # interval 10: event 1 only (event 2 at ts==end excluded);
    # interval 11: event 2; interval 12: nothing
    assert sorted(zip(got.interval_id, got.event_id)) == [(10, 1), (11, 2)]


def test_row_number_matches_pandas_window():
    """row_number over a mixed-cardinality key == pandas groupby.cumcount."""
    from entity_matching_datasets_ray.stages.windows import row_number_partitioned

    rng = np.random.RandomState(11)
    n = 1500
    df = pd.DataFrame(
        {
            "event_id": rng.permutation(n).astype(np.int64),
            "user_id": rng.randint(0, 40, n).astype(np.int64),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.choice(10**6, n, replace=False), unit="s"),
        }
    )
    out = (
        row_number_partitioned(rd.from_pandas(df).repartition(9), "user_id", "ts", "event_id")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    bf = df.sort_values(["user_id", "ts", "event_id"]).copy()
    bf["rn"] = bf.groupby("user_id").cumcount() + 1
    bf = bf.sort_values("event_id").reset_index(drop=True)
    assert (out["rn"].to_numpy() == bf["rn"].to_numpy()).all()


def test_row_number_single_hot_key_spanning_many_partitions():
    """ONE key across 16 sorted blocks: offsets must chain through the
    running per-block count carry."""
    from entity_matching_datasets_ray.stages.windows import row_number_partitioned

    rng = np.random.RandomState(5)
    n = 3000
    df = pd.DataFrame(
        {
            "event_id": rng.permutation(n).astype(np.int64),
            "user_id": np.int64(7),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(np.sort(rng.choice(10**6, n, replace=False)), unit="s"),
        }
    )
    out = (
        row_number_partitioned(rd.from_pandas(df).repartition(16), "user_id", "ts", "event_id")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    bf = df.sort_values(["ts", "event_id"]).copy()
    bf["rn"] = np.arange(1, n + 1)
    bf = bf.sort_values("event_id").reset_index(drop=True)
    assert (out["rn"].to_numpy() == bf["rn"].to_numpy()).all()


def test_rank_features_matches_pandas():
    """percent_rank + ntile(k) == pandas rank/qcut-free brute force."""
    from entity_matching_datasets_ray.stages.windows import rank_features

    rng = np.random.RandomState(17)
    n = 1200
    df = pd.DataFrame(
        {
            "event_id": rng.permutation(n).astype(np.int64),
            "user_id": rng.randint(0, 30, n).astype(np.int64),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.choice(10**6, n, replace=False), unit="s"),
        }
    )
    got = (
        rank_features(rd.from_pandas(df).repartition(7), "user_id", "ts", "event_id", ntile_k=4)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    bf = df.sort_values(["user_id", "ts", "event_id"]).copy()
    bf["rn"] = bf.groupby("user_id").cumcount() + 1
    bf["n"] = bf.groupby("user_id")["rn"].transform("max")
    bf["percent_rank"] = np.where(bf["n"] > 1, (bf["rn"] - 1) / (bf["n"] - 1), 0.0)

    def sql_ntile(rn, n, k=4):
        big, size_big, size_small = n % k, -(-n // k), n // k
        cut = big * size_big
        if rn - 1 < cut:
            return (rn - 1) // size_big + 1
        return big + (rn - 1 - cut) // size_small + 1

    bf["tile"] = [sql_ntile(r, c) for r, c in zip(bf["rn"], bf["n"])]
    bf = bf.sort_values("event_id").reset_index(drop=True)
    assert (got["rn"].to_numpy() == bf["rn"].to_numpy()).all()
    assert np.allclose(got["percent_rank"].to_numpy(), bf["percent_rank"].to_numpy())
    assert (got["tile"].to_numpy() == bf["tile"].to_numpy()).all()


def test_row_number_non_datetime_order_column(ray_session):
    """ORDER BY an int sequence and a string id (no datetime anywhere) —
    ADVICE r3: the block-identity key used .to_pydatetime() and crashed."""
    import pandas as pd
    import ray.data as rd

    from entity_matching_datasets_ray.stages.windows import row_number_partitioned

    df = pd.DataFrame(
        {
            "sid": [f"s{i:03d}" for i in range(40)],
            "grp": ["g1", "g2"] * 20,
            "seq": list(range(40)),
        }
    )
    out = (
        row_number_partitioned(
            rd.from_pandas(df).repartition(5), "grp", "seq", "sid", num_partitions=5
        )
        .to_pandas()
        .sort_values(["grp", "seq"])
        .reset_index(drop=True)
    )
    want = df.sort_values(["grp", "seq"]).groupby("grp").cumcount() + 1
    assert out["rn"].tolist() == want.tolist()


def test_pack_token_budget_matches_serial(ray_session):
    """Distributed exclusive prefix-sum packing == a serial cumsum, under
    any partitioning; offsets stay within budget; sequences are dense."""
    import pandas as pd
    import ray.data as rd

    from entity_matching_datasets_ray.stages.windows import pack_token_budget

    rng = np.random.RandomState(4)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(3000, dtype=np.int64),
            "idx": np.zeros(3000, dtype=np.int64),
            "n_tok": rng.randint(1, 40, 3000).astype(np.int64),
        }
    )
    out = (
        pack_token_budget(
            rd.from_pandas(df).repartition(9), ["doc_id", "idx"], "n_tok", 256,
            num_partitions=9,
        )
        .to_pandas()
        .sort_values(["doc_id", "idx"])
        .reset_index(drop=True)
    )
    cum_excl = df["n_tok"].cumsum() - df["n_tok"]
    assert list(out["seq_id"]) == list(cum_excl // 256)
    assert list(out["tok_offset"]) == list(cum_excl % 256)
    assert (out["tok_offset"] < 256).all()
    seqs = sorted(out["seq_id"].unique())
    assert seqs == list(range(seqs[-1] + 1))  # dense sequence ids
