"""Time-ordered operators Ray Data lacks natively: sliding (hopping)
window aggregation, partitioned lag, a distributed as-of join, gap-based
sessionization, and a distributed range/interval join.

The reference has no event-time operators (SURVEY.md §2.8); these are the
training-data-pipeline extensions a 100 TB event stream needs, each
expressed Ray-Data-first:

- ``sliding_window_agg``: flat-map each row into the hop-aligned windows
  covering it (window/hop rows out per row in), then a partial-aggregated
  groupby on (key, window_start) — the same exact-int64-cents
  accumulation as the relational suite, so results are bit-stable.
- ``lag_partitioned``: previous row's columns within (key, ts) order —
  ONE global sort on (key, ts, id), a per-block shift(1) masked on key
  change, and one carry row per block (its last row) exchanged through
  the driver. NO per-key partitioning assumption: a key with billions of
  rows spans many sorted blocks and each block only needs its
  predecessor's single last row.
- ``asof_join``: every probe row gets the latest build row with
  ``build_ts <= probe_ts``. ONE global range-partitioned sort of the
  tagged union, a per-block Arrow forward-fill, and a tiny driver-side
  prefix exchange (one carry row per block) — the SNM-global
  boundary-exchange pattern applied to time. No per-key partitioning
  assumption at all. Build/probe columns keep their NATIVE Arrow types
  throughout (int64 stays nullable int64, never float64), and the sort
  key carries a unique per-row tiebreaker so equal-timestamp rows order
  deterministically run-to-run.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _key_scalar(v):
    """Normalize a scalar for block-identity dict keys (equality only):
    pandas Timestamps -> stdlib datetime, numpy scalars -> python
    scalars, everything else (str, ...) unchanged — so the driver-side
    summary value and the worker-side first-row value compare equal
    regardless of boxing, and a non-datetime ORDER BY column (int
    sequence, string) works instead of crashing on .to_pydatetime()
    (ADVICE r3)."""
    to_pydt = getattr(v, "to_pydatetime", None)
    if to_pydt is not None:
        return to_pydt()
    item = getattr(v, "item", None)
    if item is not None:
        v = item()
    if isinstance(v, float) and v != v:
        return "__nan__"  # NaN != NaN would always miss the dict
    return v


def _cents(col) -> pa.Array:
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(100.0))), pa.int64())


def block_carry(
    ds,
    order_cols: list[str],
    summarize,
    summary_cols: list[str],
    walk,
    apply,
    num_partitions: int | None = None,
    select_cols: list[str] | None = None,
):
    """The distributed block-summary-carry pattern, centralized (VERDICT r4
    item 5): ONE global sort; each sorted block ships one tiny summary row;
    the driver walks the O(num_blocks) summary table in block order and
    hands each block a carry state; a second pass applies it per block.
    This is how every order-dependent operator (lag / row_number /
    percent_rank / sessionize / prefix-sum packing) avoids whole-key
    groups: a key spanning a billion rows costs one summary row per block.

    Contracts the helper enforces so call sites can't drift:
    - batch == block (``batch_size=None``) on both passes, over the SAME
      materialized sorted dataset — the block set is identical by
      construction;
    - block identity = ``_key_scalar``-normalized first-row ``order_cols``
      tuple, computed the same way on the driver and in the worker;
    - STRICT carry lookup: a missing or duplicate block identity raises
      (it means the batch==block invariant broke), never defaults to 0.

    Callers provide only the operator logic:
    - ``summarize(sorted_df) -> dict`` of SCALAR fields (``summary_cols``
      names them, for empty-block schema stability);
    - ``walk(summaries: list[dict]) -> list[state]`` aligned with block
      order (runs on the driver; may scan forward, backward, or both);
    - ``apply(sorted_df, state) -> DataFrame`` (``state=None`` for an
      empty block — return the empty output schema).
    """
    import ray

    sel = ds.select_columns(select_cols) if select_cols else ds
    if num_partitions:
        sel = sel.repartition(num_partitions)
    s = sel.sort(order_cols).materialize()
    kcols = [f"blk{i}" for i in range(len(order_cols))]

    def _summary(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(columns=[*kcols, *summary_cols])
        df = df.sort_values(order_cols)
        row = {k: df[c].iloc[0] for k, c in zip(kcols, order_cols)}
        row.update(summarize(df))
        return pd.DataFrame([row])

    sdf = (
        s.map_batches(_summary, batch_format="pandas", batch_size=None)
        .to_pandas()
        .sort_values(kcols)
        .reset_index(drop=True)
    )
    # column-wise extraction (Series.tolist), never iterrows: iterrows
    # row-coerces mixed dtypes to float64, breaking key equality for
    # large int ids (the r4 itertuples lesson, now in one place)
    idents = [
        tuple(_key_scalar(v) for v in vals)
        for vals in zip(*(sdf[k].tolist() for k in kcols))
    ]
    states = walk(sdf.drop(columns=kcols).to_dict("records"))
    if len(states) != len(idents):
        raise ValueError(
            f"walk returned {len(states)} states for {len(idents)} blocks"
        )
    carry = dict(zip(idents, states))
    if len(carry) != len(idents):
        raise ValueError(
            "duplicate block identity in carry map — order_cols are not "
            f"unique across blocks: {len(idents) - len(carry)} collisions"
        )
    carry_ref = ray.put(carry)

    def _apply(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return apply(df, None)
        cm = ray.get(carry_ref)
        df = df.sort_values(order_cols).reset_index(drop=True)
        bkey = tuple(_key_scalar(df[c].iloc[0]) for c in order_cols)
        if bkey not in cm:  # strict: a missing identity is a bug, not 0
            raise KeyError(
                f"block identity {bkey!r} missing from carry map — "
                "batch==block invariant violated"
            )
        return apply(df, cm[bkey])

    return s.map_batches(_apply, batch_format="pandas", batch_size=None)


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

    Scale-safe mechanics: the shared ``block_carry`` pattern — within each
    sorted block prev = shift(1) masked where the key changes; the carry
    into block i is block i-1's single last row (whatever key it belongs
    to). A key spanning many blocks costs one carry row per block, never
    one task per key.
    """

    def summarize(df: pd.DataFrame) -> dict:
        return {
            "last_key": df[key_col].iloc[-1],
            "last_id": float(df[id_col].iloc[-1]),
            "last_value": float(df[value_col].iloc[-1]),
        }

    def walk(summaries: list[dict]) -> list:
        states, prev = [], None
        for row in summaries:
            states.append(prev)
            prev = (row["last_key"], row["last_id"], row["last_value"])
        return states

    def apply(df: pd.DataFrame, carry) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                columns=[id_col, key_col, ts_col, "prev_" + id_col, "prev_" + value_col]
            )
        prev_id = df[id_col].astype("float64").shift(1)
        prev_val = df[value_col].astype("float64").shift(1)
        same = df[key_col].eq(df[key_col].shift(1))
        if carry is not None and carry[0] == df[key_col].iloc[0]:
            prev_id.iloc[0] = carry[1]
            prev_val.iloc[0] = carry[2]
            same.iloc[0] = True
        prev_id[~same] = np.nan
        prev_val[~same] = np.nan
        out = df[[id_col, key_col, ts_col]].copy()
        out["prev_" + id_col] = prev_id
        out["prev_" + value_col] = prev_val
        return out

    return block_carry(
        ds,
        [key_col, ts_col, id_col],
        summarize,
        ["last_key", "last_id", "last_value"],
        walk,
        apply,
        num_partitions=num_partitions,
        select_cols=[key_col, ts_col, id_col, value_col],
    )


def asof_join(
    probe,
    build,
    probe_ts: str,
    build_ts: str,
    probe_cols: list[str],
    build_cols: list[str],
    num_partitions: int | None = None,
    probe_tiebreak: str | None = None,
    build_tiebreak: str | None = None,
):
    """For every probe row, the latest build row with build_ts <= probe_ts
    (ties at equal timestamps: the build row sorts first, so it IS
    visible to the probe; among equal-ts build rows the one with the
    largest tiebreaker id wins, deterministically).

    Distributed mechanics: tag both streams, globally sort the union by
    (ts, tag, tiebreak) — builds before probes at equal ts, and a unique
    per-row integer tiebreaker (default: the first probe/build column,
    assumed a unique id) so the order — and therefore block boundaries
    and equal-ts winners — is deterministic run-to-run. Then Arrow
    ``fill_null_forward`` of the build values inside each sorted block;
    the only cross-block state is ONE carry row per block (its last
    build row), which the driver orders by block start and turns into a
    broadcast prefix map. Build and probe columns are carried in their
    NATIVE Arrow types (an int64 build id joins as nullable int64 — it
    is never cast through float64, so no NaN-vs-NULL or >2^53 precision
    loss). Two passes over the materialized sorted union; no per-key
    assumption, no skew sensitivity.
    """
    import ray

    probe_tiebreak = probe_tiebreak or probe_cols[0]
    build_tiebreak = build_tiebreak or build_cols[0]
    p_schema = dict(zip(probe.schema().names, probe.schema().types))
    b_schema = dict(zip(build.schema().names, build.schema().types))
    ptypes = {c: p_schema[c] for c in probe_cols}
    btypes = {c: b_schema[c] for c in build_cols}
    bcols = ["b_" + c for c in build_cols]
    SKEY = [("__ts", "ascending"), ("__tag", "ascending"), ("__tb", "ascending")]

    def tag_probe(t: pa.Table) -> pa.Table:
        cols = {
            "__ts": pc.cast(t[probe_ts], pa.timestamp("us")),
            "__tag": pa.array(np.ones(t.num_rows, np.int8)),
            "__tb": pc.cast(t[probe_tiebreak], pa.int64()),
        }
        for c in probe_cols:
            cols[c] = t[c]
        for c in build_cols:
            cols["b_" + c] = pa.nulls(t.num_rows, btypes[c])
        return pa.table(cols)

    def tag_build(t: pa.Table) -> pa.Table:
        cols = {
            "__ts": pc.cast(t[build_ts], pa.timestamp("us")),
            "__tag": pa.array(np.zeros(t.num_rows, np.int8)),
            "__tb": pc.cast(t[build_tiebreak], pa.int64()),
        }
        for c in probe_cols:
            cols[c] = pa.nulls(t.num_rows, ptypes[c])
        for c in build_cols:
            cols["b_" + c] = t[c]
        return pa.table(cols)

    psel = list(dict.fromkeys(probe_cols + [probe_ts, probe_tiebreak]))
    bsel = list(dict.fromkeys(build_cols + [build_ts, build_tiebreak]))
    p = probe.select_columns(psel).map_batches(tag_probe, batch_format="pyarrow")
    b = build.select_columns(bsel).map_batches(tag_build, batch_format="pyarrow")
    u = p.union(b)
    if num_partitions:
        u = u.repartition(num_partitions)
    s = u.sort(["__ts", "__tag", "__tb"]).materialize()

    def _blk_key(t: pa.Table) -> tuple:
        return (t["__ts"][0].as_py(), t["__tag"][0].as_py(), t["__tb"][0].as_py())

    def block_carry(t: pa.Table) -> pa.Table:
        """One row per block: block-start key + the block's last build row."""
        cols: dict = {}
        if t.num_rows == 0:
            cols["blk_ts"] = pa.nulls(0, pa.timestamp("us"))
            cols["blk_tag"] = pa.nulls(0, pa.int8())
            cols["blk_tb"] = pa.nulls(0, pa.int64())
            cols["has_build"] = pa.nulls(0, pa.bool_())
            for c in build_cols:
                cols["b_" + c] = pa.nulls(0, btypes[c])
            return pa.table(cols)
        t = t.take(pc.sort_indices(t, sort_keys=SKEY))
        builds = t.filter(pc.equal(t["__tag"], pa.scalar(0, pa.int8())))
        ts0, tag0, tb0 = _blk_key(t)
        cols["blk_ts"] = pa.array([ts0], pa.timestamp("us"))
        cols["blk_tag"] = pa.array([tag0], pa.int8())
        cols["blk_tb"] = pa.array([tb0], pa.int64())
        cols["has_build"] = pa.array([builds.num_rows > 0])
        for c in build_cols:
            v = builds["b_" + c][builds.num_rows - 1].as_py() if builds.num_rows else None
            cols["b_" + c] = pa.array([v], btypes[c])
        return pa.table(cols)

    carries = s.map_batches(block_carry, batch_format="pyarrow", batch_size=None).take_all()
    carries.sort(key=lambda r: (r["blk_ts"], r["blk_tag"], r["blk_tb"]))
    # prefix: carry into block i = last build row among blocks < i
    carry_map: dict = {}
    last: dict = {c: None for c in build_cols}
    for row in carries:
        carry_map[(row["blk_ts"], row["blk_tag"], row["blk_tb"])] = dict(last)
        if row["has_build"]:
            last = {c: row["b_" + c] for c in build_cols}
    carry_ref = ray.put(carry_map)

    out_names = probe_cols + [probe_ts] + ["asof_" + c for c in build_cols]

    def fill(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = {c: pa.nulls(0, ptypes[c]) for c in probe_cols}
            cols[probe_ts] = pa.nulls(0, pa.timestamp("us"))
            for c in build_cols:
                cols["asof_" + c] = pa.nulls(0, btypes[c])
            return pa.table(cols)
        cm = ray.get(carry_ref)
        t = t.take(pc.sort_indices(t, sort_keys=SKEY))
        carry = cm.get(_blk_key(t), {c: None for c in build_cols})
        cols = {c: t[c] for c in probe_cols}
        cols[probe_ts] = t["__ts"]
        for c in build_cols:
            col = pc.fill_null_forward(t["b_" + c])
            if carry.get(c) is not None:
                col = pc.fill_null(col, pa.scalar(carry[c], btypes[c]))
            cols["asof_" + c] = col
        mask = pc.equal(t["__tag"], pa.scalar(1, pa.int8()))
        return pa.table({n: cols[n] for n in out_names}).filter(mask)

    return s.map_batches(fill, batch_format="pyarrow", batch_size=None)


def sessionize(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    gap,
    num_partitions: int | None = None,
):
    """Gap-based sessionization: within each key (ordered by ts, id) a new
    session starts when the time since the previous event exceeds ``gap``
    (a ``datetime.timedelta``). Returns (id, key, ts, session_id) with
    ``session_id = "<key>:<1-based session index>"`` — equivalent to the
    SQL lag-gap-flag + running-sum window idiom.

    Scale mechanics (the shared ``block_carry`` pattern, extended with a
    session-count prefix sum): each block resolves sessions locally; the
    cross-block state per block is its first/last row + the last key's
    in-block session-start count; the driver walk hands each block (a)
    whether its first row starts a new session and (b) the session-index
    offset for its first key — a key spanning a billion rows costs one
    summary row per block, never a whole-key pandas group.
    """

    def _starts(df: pd.DataFrame) -> pd.Series:
        """is-new-session per row with in-block prev; first row -> True."""
        prev_ts = df[ts_col].shift(1)
        same = df[key_col].eq(df[key_col].shift(1))
        return ~same | ((df[ts_col] - prev_ts) > gap)

    def summarize(df: pd.DataFrame) -> dict:
        df = df.reset_index(drop=True)
        starts = _starts(df)
        last_key = df[key_col].iloc[-1]
        return {
            "first_key": df[key_col].iloc[0],
            "first_ts": df[ts_col].iloc[0],
            "last_key": last_key,
            "last_ts": df[ts_col].iloc[-1],
            "n_last_key_sessions": int(starts[(df[key_col] == last_key).to_numpy()].sum()),
        }

    def walk(summaries: list[dict]) -> list:
        # state per block = (first_is_new, first_key_offset)
        states = []
        prev_key = prev_ts = None
        prev_count = 0  # sessions of prev_key seen up to the previous block
        for row in summaries:
            if prev_key is not None and row["first_key"] == prev_key:
                first_is_new = (row["first_ts"] - prev_ts) > gap
                offset = prev_count
            else:
                first_is_new = True
                offset = 0
            states.append((bool(first_is_new), int(offset)))
            n_last = int(row["n_last_key_sessions"])
            if row["last_key"] == row["first_key"]:
                # summarize counted the first row as a start; subtract if
                # the driver resolved it as a continuation
                prev_count = offset + n_last - (0 if first_is_new else 1)
            else:
                prev_count = n_last
            prev_key, prev_ts = row["last_key"], row["last_ts"]
        return states

    def apply(df: pd.DataFrame, state) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(columns=[id_col, key_col, ts_col, "session_id"])
        first_is_new, offset = state
        starts = _starts(df).to_numpy(copy=True)
        starts[0] = first_is_new
        idx = (
            pd.Series(starts.astype("int64"))
            .groupby(df[key_col].to_numpy(), sort=False)
            .cumsum()
            .to_numpy()
        )
        idx[(df[key_col] == df[key_col].iloc[0]).to_numpy()] += offset
        out = df[[id_col, key_col, ts_col]].copy()
        out["session_id"] = df[key_col].astype(str) + ":" + pd.Series(idx).astype(str)
        return out

    return block_carry(
        ds,
        [key_col, ts_col, id_col],
        summarize,
        ["first_key", "first_ts", "last_key", "last_ts", "n_last_key_sessions"],
        walk,
        apply,
        num_partitions=num_partitions,
        select_cols=[key_col, ts_col, id_col],
    )


def interval_join(
    events,
    intervals,
    *,
    event_id_col: str = "event_id",
    event_ts_col: str = "ts",
    interval_id_col: str = "interval_id",
    start_col: str = "start",
    end_col: str = "end",
    bin_width,
    emit: str = "counts",
    num_partitions: int | None = None,
):
    """Distributed range/interval join: event e matches interval i iff
    ``start <= ts < end``. ``emit="pairs"`` returns (interval_id,
    event_id); ``emit="counts"`` returns (interval_id, n_events) for
    intervals with >= 1 event (inner semantics) WITHOUT ever materializing
    the pair set — counts are partial per time-bin and summed in a tiny
    groupby.

    Mechanics (time-bin bucketing, the standard distributed range-join
    plan): pick a bin width W; every event hashes to exactly ONE bin
    (floor(ts / W)); every interval is REPLICATED to each bin it overlaps
    (ceil(len/W)+1 copies at most — bounded, choose W near the typical
    interval length). Events and interval copies co-locate via one
    groupby(bin) shuffle; inside a bin the events are sorted once and each
    interval resolves its matches with two searchsorteds (O(I log E) per
    bin, fully vectorized). A pair is produced exactly once because the
    event exists in exactly one bin. Skewed bins are the caller's lever:
    smaller W splits hot regions across more bins.
    """
    if emit not in ("pairs", "counts"):
        raise ValueError(emit)
    w_us = int(pd.Timedelta(bin_width).value // 1000)  # microseconds
    if w_us <= 0:
        raise ValueError(f"bin_width must be positive: {bin_width}")

    def _us(col) -> np.ndarray:
        return pc.cast(col, pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )

    def event_rows(t: pa.Table) -> pa.Table:
        ts = _us(t.column(event_ts_col).combine_chunks())
        return pa.table(
            {
                "bin": pa.array(ts // w_us, pa.int64()),
                "kind": pa.array(np.zeros(len(ts), np.int8), pa.int8()),
                "eid": t.column(event_id_col),
                "ts_us": pa.array(ts, pa.int64()),
                "iid": pa.nulls(len(ts), t.schema.field(event_id_col).type),
                "start_us": pa.nulls(len(ts), pa.int64()),
                "end_us": pa.nulls(len(ts), pa.int64()),
            }
        )

    def interval_rows(t: pa.Table) -> pa.Table:
        s = _us(t.column(start_col).combine_chunks())
        e = _us(t.column(end_col).combine_chunks())
        iid = t.column(interval_id_col).combine_chunks()
        # half-open [start, end): the last covered bin holds end-1
        first = s // w_us
        last = np.maximum(e - 1, s) // w_us
        reps = (last - first + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(s)), reps)
        offs = np.concatenate(([0], np.cumsum(reps)[:-1]))
        bins = np.arange(int(reps.sum())) - np.repeat(offs, reps) + np.repeat(first, reps)
        n = len(idx)
        return pa.table(
            {
                "bin": pa.array(bins, pa.int64()),
                "kind": pa.array(np.ones(n, np.int8), pa.int8()),
                "eid": pa.nulls(n, iid.type),
                "ts_us": pa.nulls(n, pa.int64()),
                "iid": iid.take(pa.array(idx)),
                "start_us": pa.array(s[idx], pa.int64()),
                "end_us": pa.array(e[idx], pa.int64()),
            }
        )

    ev = events.select_columns([event_id_col, event_ts_col]).map_batches(
        event_rows, batch_format="pyarrow"
    )
    iv = intervals.select_columns([interval_id_col, start_col, end_col]).map_batches(
        interval_rows, batch_format="pyarrow"
    )
    unioned = ev.union(iv)
    if num_partitions:
        unioned = unioned.repartition(num_partitions)

    def per_bin(t: pa.Table) -> pa.Table:
        """Arrow throughout — the union carries nulls in the other side's
        columns and a pandas round-trip would degrade int64 ids to
        float64; filtering + take keeps every id in its native type."""
        kinds = t.column("kind")
        ev_t = t.filter(pc.equal(kinds, 0))
        iv_t = t.filter(pc.equal(kinds, 1))
        iid_type = t.schema.field("iid").type
        eid_type = t.schema.field("eid").type
        if ev_t.num_rows == 0 or iv_t.num_rows == 0:
            if emit == "pairs":
                return pa.table(
                    {
                        interval_id_col: pa.nulls(0, iid_type),
                        event_id_col: pa.nulls(0, eid_type),
                    }
                )
            return pa.table(
                {
                    interval_id_col: pa.nulls(0, iid_type),
                    "n_events": pa.nulls(0, pa.int64()),
                }
            )
        ts = ev_t.column("ts_us").to_numpy(zero_copy_only=False)
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        lo = np.searchsorted(ts, iv_t.column("start_us").to_numpy(zero_copy_only=False), side="left")
        hi = np.searchsorted(ts, iv_t.column("end_us").to_numpy(zero_copy_only=False), side="left")
        cnt = hi - lo
        iid = iv_t.column("iid").combine_chunks()
        if emit == "counts":
            m = cnt > 0
            return pa.table(
                {
                    interval_id_col: iid.filter(pa.array(m)),
                    "n_events": pa.array(cnt[m], pa.int64()),
                }
            )
        total = int(cnt.sum())
        pos = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt) + np.repeat(lo, cnt)
        eid_sorted = ev_t.column("eid").combine_chunks().take(pa.array(order))
        return pa.table(
            {
                interval_id_col: iid.take(pa.array(np.repeat(np.arange(len(cnt)), cnt))),
                event_id_col: eid_sorted.take(pa.array(pos)),
            }
        )

    matched = unioned.groupby("bin", num_partitions=num_partitions).map_groups(
        per_bin, batch_format="pyarrow"
    )
    if emit == "pairs":
        return matched
    from ray.data.aggregate import Sum

    return matched.groupby(interval_id_col).aggregate(Sum("n_events", alias_name="n_events"))


def row_number_partitioned(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    out_col: str = "rn",
    num_partitions: int | None = None,
):
    """SQL ``row_number() OVER (PARTITION BY key ORDER BY ts, id)`` —
    scale-safe general window numbering.

    The shared ``block_carry`` pattern: local ``cumcount`` within each
    sorted block; the per-block summary is first/last key + their
    in-block row counts; the driver walk keeps one running (key, count)
    pair, so a key spanning many blocks costs one summary row per block —
    never a whole-key pandas group (the r02 low-cardinality-PARTITION-BY
    lesson).
    """

    def summarize(df: pd.DataFrame) -> dict:
        fk, lk = df[key_col].iloc[0], df[key_col].iloc[-1]
        return {
            "first_key": fk,
            "last_key": lk,
            "n_first": int((df[key_col] == fk).sum()),
            "n_last": int((df[key_col] == lk).sum()),
        }

    def walk(summaries: list[dict]) -> list:
        # offset for each block's FIRST key = rows of that key in all
        # preceding blocks (one running counter; keys fully inside a
        # block never carry)
        states = []
        run_key, run_cnt = None, 0
        for row in summaries:
            off = run_cnt if row["first_key"] == run_key else 0
            states.append(off)
            base = off + row["n_last"] if row["last_key"] == row["first_key"] else row["n_last"]
            run_key, run_cnt = row["last_key"], int(base)
        return states

    def apply(df: pd.DataFrame, off) -> pd.DataFrame:
        if len(df) == 0:
            out = df[[id_col, key_col, ts_col]].copy()
            out[out_col] = pd.Series(dtype="int64")
            return out
        local = df.groupby(key_col, sort=False).cumcount().to_numpy()
        fk = df[key_col].iloc[0]
        rn = local + 1 + np.where(df[key_col].to_numpy() == fk, off, 0)
        out = df[[id_col, key_col, ts_col]].copy()
        out[out_col] = rn.astype("int64")
        return out

    return block_carry(
        ds,
        [key_col, ts_col, id_col],
        summarize,
        ["first_key", "last_key", "n_first", "n_last"],
        walk,
        apply,
        num_partitions=num_partitions,
        select_cols=[key_col, ts_col, id_col],
    )


def rank_features(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    ntile_k: int = 4,
    num_partitions: int | None = None,
):
    """percent_rank() and ntile(k) OVER (PARTITION BY key ORDER BY ts, id)
    — JOIN-FREE since r4: one global sort, and the per-block summary walk
    runs both FORWARD (rows of the block's first key in preceding blocks
    — the row_number offset) and BACKWARD (rows of the block's last key
    in following blocks), so every block knows each of its keys' TOTAL
    count locally: interior keys are wholly in-block, only the edge keys
    need the two carries. Replaces the per-key count aggregate + hash
    join (one fewer all-to-all; also Ray 2.49's hash join intermittently
    built schema-less empty partitions at tiny scale and crashed in
    finalize — observed on events_rank_features at sf0.001).

    Formulas match SQL exactly: percent_rank = (rn-1)/(n-1) (0.0 when
    n == 1), ntile bucket = smallest valid SQL tile assignment, computed
    with the standard remainder rule (first ``n % k`` tiles get
    ``ceil(n/k)`` rows) — integer math both sides.

    Driver state: one summary row per block, O(num_blocks).
    """

    def summarize(df: pd.DataFrame) -> dict:
        fk, lk = df[key_col].iloc[0], df[key_col].iloc[-1]
        return {
            "first_key": fk,
            "last_key": lk,
            "n_first": int((df[key_col] == fk).sum()),
            "n_last": int((df[key_col] == lk).sum()),
        }

    def walk(summaries: list[dict]) -> list:
        states = [[0, 0] for _ in summaries]
        # forward: rows of each block's FIRST key in preceding blocks
        run_key, run_cnt = None, 0
        for st, row in zip(states, summaries):
            off = run_cnt if row["first_key"] == run_key else 0
            st[0] = off
            base = off + row["n_last"] if row["last_key"] == row["first_key"] else row["n_last"]
            run_key, run_cnt = row["last_key"], int(base)
        # backward: rows of each block's LAST key in following blocks
        run_key, run_cnt = None, 0
        for st, row in zip(states[::-1], summaries[::-1]):
            aft = run_cnt if row["last_key"] == run_key else 0
            st[1] = aft
            base = aft + row["n_first"] if row["first_key"] == row["last_key"] else row["n_first"]
            run_key, run_cnt = row["first_key"], int(base)
        return states

    def finalize(df: pd.DataFrame, state) -> pd.DataFrame:
        out_cols = [id_col, key_col, ts_col, "rn"]
        if len(df) == 0:
            out = df[[id_col, key_col, ts_col]].copy()
            out["rn"] = pd.Series(dtype="int64")
            out["percent_rank"] = pd.Series(dtype="float64")
            out["tile"] = pd.Series(dtype="int64")
            return out
        off, aft = state
        fk, lk = df[key_col].iloc[0], df[key_col].iloc[-1]
        keys = df[key_col].to_numpy()
        grp = df.groupby(key_col, sort=False)
        local = grp.cumcount().to_numpy()
        sizes = grp[key_col].transform("size").to_numpy(dtype=np.int64)
        is_first = keys == fk
        is_last = keys == lk
        r = local + 1 + np.where(is_first, off, 0)
        n = sizes + np.where(is_first, off, 0) + np.where(is_last, aft, 0)
        pr = np.where(n > 1, (r - 1) / np.maximum(1, n - 1), 0.0)
        big = n % ntile_k               # first `big` tiles are one row larger
        size_big = -(-n // ntile_k)     # ceil(n/k)
        size_small = n // ntile_k
        cut = big * size_big            # rows covered by the larger tiles
        in_big = (r - 1) < cut
        tile = np.where(
            in_big,
            (r - 1) // np.maximum(1, size_big) + 1,
            big + (r - 1 - cut) // np.maximum(1, size_small) + 1,
        ).astype("int64")
        out = df[[id_col, key_col, ts_col]].copy()
        out["rn"] = r.astype("int64")
        out["percent_rank"] = pr
        out["tile"] = tile
        return out[out_cols + ["percent_rank", "tile"]]

    return block_carry(
        ds,
        [key_col, ts_col, id_col],
        summarize,
        ["first_key", "last_key", "n_first", "n_last"],
        walk,
        finalize,
        num_partitions=num_partitions,
        select_cols=[key_col, ts_col, id_col],
    )


def pack_token_budget(
    ds,
    order_cols: list[str],
    token_col: str,
    budget: int,
    num_partitions: int | None = None,
):
    """Contiguous token-budget SEQUENCE PACKING — the step after corpus
    mixing in a pretraining pipeline: concatenate the (deterministically
    ordered) stream and cut it every ``budget`` tokens. Each row gets
    ``seq_id`` (which training sequence its first token lands in) and
    ``tok_offset`` (its first token's position inside that sequence):
    ``seq_id = exclusive_prefix_sum(tokens) // budget``.

    ``order_cols`` must be a UNIQUE composite (same contract as
    ``row_number_partitioned``'s (key, ts, id)) so the global order — and
    therefore the packing — is deterministic under any partitioning.

    ``token_col`` is injection-friendly: any counting stage can feed it —
    whitespace/BPE-ish counts (``stages/text_analysis.token_counts``) or
    a REAL ranked-merge BPE vocabulary via ``functions/text.BPETokenizer``
    (+ ``load_bpe_merges`` for a standard public ``merges.txt``; this
    container ships none, so tests wire a small inline table — see
    tests/test_text_analysis.py::test_bpe_tokenizer_counts_and_packing).

    Scale mechanics (a distributed exclusive PREFIX SUM via the shared
    ``block_carry`` pattern): each sorted block ships one summary row
    (its token total); the driver's running sum gives each block its
    global token offset (O(num_blocks) state); the apply pass assigns
    ``offset + local exclusive cumsum`` vectorized per block. Integer
    math end to end — bit-identical to a SQL window cumsum oracle.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive: {budget}")

    def summarize(df: pd.DataFrame) -> dict:
        return {"toks": int(df[token_col].sum())}

    def walk(summaries: list[dict]) -> list:
        states, running = [], 0
        for row in summaries:
            states.append(running)
            running += int(row["toks"])
        return states

    def assign(df: pd.DataFrame, off) -> pd.DataFrame:
        if len(df) == 0:
            out = df.copy()
            out["seq_id"] = pd.Series(dtype="int64")
            out["tok_offset"] = pd.Series(dtype="int64")
            return out
        toks = df[token_col].to_numpy(dtype=np.int64)
        cum_excl = off + np.cumsum(toks) - toks
        out = df.copy()
        out["seq_id"] = (cum_excl // budget).astype("int64")
        out["tok_offset"] = (cum_excl % budget).astype("int64")
        return out

    # no select_cols: packing annotates every input column, it doesn't
    # project
    return block_carry(
        ds,
        order_cols,
        summarize,
        ["toks"],
        walk,
        assign,
        num_partitions=num_partitions,
    )
