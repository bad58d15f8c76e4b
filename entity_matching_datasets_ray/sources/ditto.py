"""Ditto text format reader/writer + DeepMatcher wide-CSV converter.

Re-implements the reference's converter pipelines
(/root/reference/Converters/computers/{dcm,walmart,iTuens,computer}.py) as
Ray Data stages:

- **reader** (S1): ``ray.data.read_text`` -> per-batch parse of
  ``left \\t right \\t label`` lines with COL/VAL entity decoding; malformed
  lines (wrong field count, non-integer label) are dropped in-batch and
  *counted* in a ``dropped`` metrics column (dcm.py:67-77 skips with a
  stderr log; we meter instead).
- **schema-union inference** (M3): distributed pass 1 —
  flat_map keys -> unique() — replaces the reference's in-memory
  ``all_fields`` set (dcm.py:39-51).
- **wide-row builder** (M5/M6): pass 2 builds
  ``id, label, left_<f>..., right_<f>...`` rows. Row ids are content
  hashes, not file-order counters (dcm.py:38,88): deterministic under
  parallelism (SURVEY.md §4 'Ordering').
- **writer** (S4): records -> ``COL k VAL v ... \\t ... \\t label`` lines
  (wdc/computers/prompt.py:236-256).
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..functions.hashing import content_hash
from ..functions.normalizers import format_colval, parse_colval

_TABS = re.compile(r"\t+")


def parse_ditto_lines(batch: pa.Table) -> pa.Table:
    """text lines -> (left_entity, right_entity, label, dropped) rows.

    ``dropped`` carries, on every surviving row, the number of malformed
    lines discarded from its batch (metric, not data).
    """
    lines = batch.column("text").to_pylist()
    lefts: list[str] = []
    rights: list[str] = []
    labels: list[int] = []
    dropped = 0
    for line in lines:
        if not line or not line.strip():
            continue
        parts = [p for p in _TABS.split(line.strip()) if p != ""]
        if len(parts) != 3:
            dropped += 1
            continue
        try:
            label = int(parts[2])
        except ValueError:
            dropped += 1
            continue
        lefts.append(parts[0])
        rights.append(parts[1])
        labels.append(label)
    return pa.table(
        {
            "left_entity": pa.array(lefts, pa.string()),
            "right_entity": pa.array(rights, pa.string()),
            "label": pa.array(labels, pa.int8()),
            "dropped": pa.array([dropped] * len(lefts), pa.int64()),
        }
    )


def read_ditto(path: str, override_num_blocks: int | None = None):
    """Ditto text file(s) -> Dataset of raw pair rows."""
    import ray.data as rd

    return rd.read_text(path, override_num_blocks=override_num_blocks).map_batches(
        parse_ditto_lines, batch_format="pyarrow"
    )


def infer_fields(pairs_ds) -> list[str]:
    """Distributed schema-union inference (pass 1): the set of COL keys
    across both sides of every pair, sorted (dcm.py:39-59). Emits per-batch
    partial key sets, unions the small result on the driver."""

    def keys_batch(t: pa.Table) -> pa.Table:
        seen: set[str] = set()
        for col in ("left_entity", "right_entity"):
            for ent in t.column(col).to_pylist():
                seen.update(parse_colval(ent).keys())
        return pa.table({"field": pa.array(sorted(seen), pa.string())})

    parts = pairs_ds.map_batches(keys_batch, batch_format="pyarrow")
    return sorted(set(parts.unique("field")))


def order_fields(all_fields: list[str], preferred_order: list[str] | None = None) -> list[str]:
    """Column-order pinning (M4): preferred fields first, rest sorted
    (walmart.py:52-58)."""
    preferred = [f for f in (preferred_order or []) if f in all_fields]
    rest = sorted(f for f in all_fields if f not in preferred)
    return preferred + rest


def to_wide_rows(pairs_ds, fields: list[str]):
    """Pass 2: build DeepMatcher wide rows with ""-fill for absent fields
    (dcm.py:82-87). ``id`` is a content hash of the pair text —
    deterministic regardless of execution order."""

    def build(t: pa.Table) -> pa.Table:
        lefts = t.column("left_entity").to_pylist()
        rights = t.column("right_entity").to_pylist()
        labels = t.column("label").to_pylist()
        cols: dict[str, list] = {"id": [], "label": []}
        for f in fields:
            cols[f"left_{f}"] = []
            cols[f"right_{f}"] = []
        for le, ri, lab in zip(lefts, rights, labels):
            ld = parse_colval(le)
            rd_ = parse_colval(ri)
            cols["id"].append(content_hash(le, ri))
            cols["label"].append(lab)
            for f in fields:
                cols[f"left_{f}"].append(ld.get(f, ""))
                cols[f"right_{f}"].append(rd_.get(f, ""))
        arrays = {"id": pa.array(cols["id"], pa.string()), "label": pa.array(cols["label"], pa.int8())}
        for f in fields:
            arrays[f"left_{f}"] = pa.array(cols[f"left_{f}"], pa.string())
            arrays[f"right_{f}"] = pa.array(cols[f"right_{f}"], pa.string())
        return pa.table(arrays)

    return pairs_ds.map_batches(build, batch_format="pyarrow")


def convert_ditto_to_wide(path: str, preferred_order: list[str] | None = None):
    """Full converter pipeline (reference E1): read -> infer -> widen."""
    pairs = read_ditto(path)
    fields = order_fields(infer_fields(pairs), preferred_order)
    return to_wide_rows(pairs, fields), fields


def write_ditto_lines(wide_ds, fields: list[str]):
    """Wide rows -> Ditto text lines Dataset (single ``line`` column)."""

    def fmt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        labels = t.column("label").to_pylist()
        left_cols = {f: t.column(f"left_{f}").to_pylist() for f in fields}
        right_cols = {f: t.column(f"right_{f}").to_pylist() for f in fields}
        lines = []
        for i in range(n):
            le = format_colval({f: left_cols[f][i] or "" for f in fields}, fields)
            ri = format_colval({f: right_cols[f][i] or "" for f in fields}, fields)
            lines.append(f"{le}\t{ri}\t{labels[i]}")
        return pa.table({"line": pa.array(lines, pa.string())})

    return wide_ds.map_batches(fmt, batch_format="pyarrow")


def read_pair_csv(path: str, **kwargs):
    """DeepMatcher wide pair CSV (id, label, left_*, right_*) -> Dataset
    (reference S2: pd.read_csv in every process_dataset —
    DeepMather/Amazon/prompt.py:214)."""
    import ray.data as rd

    return rd.read_csv(path, **kwargs)


def split_record(row: dict, side: str) -> dict:
    """Project one side's sub-record out of a wide pair row by stripping
    the ``left_`` / ``right_`` prefix (reference M7:
    DeepMather/Amazon/prompt.py:209-210)."""
    prefix = f"{side}_"
    return {
        k[len(prefix):]: v
        for k, v in row.items()
        if k.startswith(prefix)
    }


def read_eval_log(path: str):
    """Matcher evaluation TSV (gold, pred, result, probability, text_left,
    text_right — /root/reference/datamodel/*.tsv) -> Dataset."""
    import ray.data as rd
    from pyarrow import csv as pacsv

    return rd.read_csv(
        path,
        parse_options=pacsv.ParseOptions(delimiter="\t"),
    )
