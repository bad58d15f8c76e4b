"""Time-ordered operators Ray Data lacks natively: sliding (hopping)
window aggregation, partitioned lag, and a distributed as-of join.

The reference has no event-time operators (SURVEY.md §2.8); these are the
training-data-pipeline extensions a 100 TB event stream needs, each
expressed Ray-Data-first:

- ``sliding_window_agg``: flat-map each row into the hop-aligned windows
  covering it (window/hop rows out per row in), then a partial-aggregated
  groupby on (key, window_start) — the same exact-int64-cents
  accumulation as the relational suite, so results are bit-stable.
- ``lag_partitioned``: previous row's columns within (key, ts) order —
  one groupby(key).map_groups with an in-group sort + shift. Partitioning
  assumption: one key's rows fit in a partition (same as any
  PARTITION BY window function; salt or range-split hot keys upstream).
- ``asof_join``: every probe row gets the latest build row with
  ``build_ts <= probe_ts``. ONE global range-partitioned sort of the
  tagged union, a per-block backward-fill, and a tiny driver-side prefix
  exchange (one carry row per block) — the SNM-global boundary-exchange
  pattern applied to time. No per-key partitioning assumption at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _cents(col) -> pa.Array:
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(100.0))), pa.int64())


def sliding_window_agg(
    ds,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    window_hours: int = 3,
    hop_hours: int = 1,
):
    """Hopping-window count + exact cent sum per key.

    Output: key_cols + (window_start, n_events, sum_value); a row at time
    t contributes to the ``window_hours / hop_hours`` windows whose
    [start, start+window) covers t.
    """
    from ray.data.aggregate import Count, Sum

    if window_hours % hop_hours != 0:
        raise ValueError("window must be a multiple of hop")
    k = window_hours // hop_hours

    def explode(t: pa.Table) -> pa.Table:
        base = pc.floor_temporal(t[ts_col], multiple=hop_hours, unit="hour")
        parts = []
        for i in range(k):
            start = pc.subtract(
                base,
                pa.scalar(i * hop_hours * 3_600_000_000, pa.duration("us")),
            )
            cols = {c: t[c] for c in key_cols}
            cols["window_start"] = start
            cols["value_c"] = _cents(t[value_col])
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    agg = (
        ds.select_columns(key_cols + [ts_col, value_col])
        .map_batches(explode, batch_format="pyarrow")
        .groupby(key_cols + ["window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value_c", alias_name="value_c"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in key_cols}
        cols["window_start"] = t["window_start"]
        cols["n_events"] = t["n_events"]
        cols["sum_value"] = pc.divide(pc.cast(t["value_c"], pa.float64()), pa.scalar(100.0))
        return pa.table(cols)

    return agg.map_batches(finalize, batch_format="pyarrow")


def lag_partitioned(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    num_partitions: int | None = None,
):
    """SQL ``lag(...) OVER (PARTITION BY key ORDER BY ts, id)``:
    each row gets the previous row's id and value within its key.
    """

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col])
        out = g[[id_col, key_col, ts_col]].copy()
        out["prev_" + id_col] = g[id_col].shift(1)
        out["prev_" + value_col] = g[value_col].shift(1)
        return out

    return (
        ds.select_columns([key_col, ts_col, id_col, value_col])
        .groupby(key_col, num_partitions=num_partitions)
        .map_groups(per_key, batch_format="pandas")
    )


def asof_join(
    probe,
    build,
    probe_ts: str,
    build_ts: str,
    probe_cols: list[str],
    build_cols: list[str],
    num_partitions: int | None = None,
):
    """For every probe row, the latest build row with build_ts <= probe_ts
    (ties at equal timestamps: the build row sorts first, so it IS
    visible to the probe; among equal-ts build rows the one with the
    largest last ``build_cols`` value wins deterministically).

    Distributed mechanics: tag both streams, globally sort the union by
    (ts, tag) — builds before probes at equal ts — then backward-fill
    build values inside each sorted block; the only cross-block state is
    ONE carry row per block (its last build row), which the driver orders
    by block start and turns into a broadcast prefix map. Two passes over
    the materialized sorted union; no per-key assumption, no skew
    sensitivity.
    """
    import ray
    import ray.data as rd

    def tag_probe(t: pa.Table) -> pa.Table:
        cols = {
            "__ts": pc.cast(t[probe_ts], pa.timestamp("us")),
            "__tag": pa.array([1] * t.num_rows, pa.int8()),
        }
        for c in probe_cols:
            cols[c] = t[c]
        for c in build_cols:
            cols["b_" + c] = pa.nulls(t.num_rows, pa.float64())
        return pa.table(cols)

    def tag_build(t: pa.Table) -> pa.Table:
        cols = {
            "__ts": pc.cast(t[build_ts], pa.timestamp("us")),
            "__tag": pa.array([0] * t.num_rows, pa.int8()),
        }
        for c in probe_cols:
            cols[c] = pa.nulls(t.num_rows, pa.int64())
        for c in build_cols:
            cols["b_" + c] = pc.cast(t[c], pa.float64())
        return pa.table(cols)

    p = probe.select_columns(probe_cols + [probe_ts]).map_batches(tag_probe, batch_format="pyarrow")
    b = build.select_columns(build_cols + [build_ts]).map_batches(tag_build, batch_format="pyarrow")
    u = p.union(b)
    if num_partitions:
        u = u.repartition(num_partitions)
    s = u.sort(["__ts", "__tag"]).materialize()

    bcols = ["b_" + c for c in build_cols]

    def block_carry(df: pd.DataFrame) -> pd.DataFrame:
        """One row per block: block start key + its last build row."""
        df = df.sort_values(["__ts", "__tag"])
        builds = df[df["__tag"] == 0]
        row = {
            "blk_ts": df["__ts"].iloc[0],
            "blk_tag": np.int8(df["__tag"].iloc[0]),
            "has_build": len(builds) > 0,
        }
        for c in bcols:
            row[c] = builds[c].iloc[-1] if len(builds) else np.nan
        return pd.DataFrame([row])

    carries = s.map_batches(block_carry, batch_format="pandas", batch_size=None).to_pandas()
    carries = carries.sort_values(["blk_ts", "blk_tag"]).reset_index(drop=True)
    # prefix: carry into block i = last build row among blocks < i
    carry_map: dict = {}
    last = {c: np.nan for c in bcols}
    for _, row in carries.iterrows():
        carry_map[(row["blk_ts"], int(row["blk_tag"]))] = dict(last)
        if row["has_build"]:
            last = {c: row[c] for c in bcols}
    carry_ref = ray.put(carry_map)

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        cm = ray.get(carry_ref)
        df = df.sort_values(["__ts", "__tag"]).reset_index(drop=True)
        carry = cm.get((df["__ts"].iloc[0], int(df["__tag"].iloc[0])), {c: np.nan for c in bcols})
        for c in bcols:
            filled = df[c].ffill()
            filled = filled.fillna(carry[c])
            df[c] = filled
        out = df[df["__tag"] == 1]
        return out[probe_cols + ["__ts"] + bcols].rename(
            columns={"__ts": probe_ts, **{("b_" + c): ("asof_" + c) for c in build_cols}}
        )

    return s.map_batches(fill, batch_format="pandas", batch_size=None)
