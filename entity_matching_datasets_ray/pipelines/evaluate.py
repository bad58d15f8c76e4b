"""Pairwise precision/recall/F1 evaluation.

The reference's correctness currency (SURVEY.md §0: matcher eval logs in
/root/reference/datamodel/*.tsv carry gold/pred/TP-FP-FN-TN from which
P/R/F1 is computed). Here:

- cluster-level pairwise F1: predicted pairs = all intra-cluster doc
  pairs; gold pairs = ground-truth positives. TP = gold pairs whose two
  docs share a predicted cluster; FP = predicted - TP; FN = gold - TP.
- confusion-matrix aggregation over an eval-log-shaped table
  (gold, pred, probability) -> P/R/F1, the direct analogue of the
  reference logs.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def pairwise_f1(clusters, gold_pairs, num_partitions: int = 16) -> dict[str, float]:
    """clusters (doc_id, entity_id) x gold (left_doc_id, right_doc_id) ->
    {precision, recall, f1, tp, fp, fn, n_pred_pairs, n_gold_pairs}.

    Distributed: two hash joins attach cluster ids to the gold pairs; the
    predicted-pair count comes from a groupby(entity_id).count aggregate
    (sum k*(k-1)/2) — intra-cluster pairs are never materialized.
    """
    from ray.data.aggregate import Count

    lc = clusters.map_batches(
        lambda t: t.rename_columns(["left_doc_id", "left_entity"]), batch_format="pyarrow"
    )
    rc = clusters.map_batches(
        lambda t: t.rename_columns(["right_doc_id", "right_entity"]), batch_format="pyarrow"
    )
    g = gold_pairs.select_columns(["left_doc_id", "right_doc_id"])
    g = g.join(lc, join_type="inner", num_partitions=num_partitions, on=("left_doc_id",))
    g = g.join(rc, join_type="inner", num_partitions=num_partitions, on=("right_doc_id",))

    def tally(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        same = pc.equal(batch.column("left_entity"), batch.column("right_entity"))
        return pa.table(
            {
                "tp": pa.array([pc.sum(pc.cast(same, pa.int64())).as_py() or 0], pa.int64()),
                "n": pa.array([batch.num_rows], pa.int64()),
            }
        )

    parts = g.map_batches(tally, batch_format="pyarrow").to_pandas()
    tp = int(parts["tp"].sum())
    n_gold_joined = int(parts["n"].sum())
    n_gold = gold_pairs.count()

    sizes = clusters.groupby("entity_id").aggregate(Count(alias_name="k")).to_pandas()
    n_pred = int((sizes["k"] * (sizes["k"] - 1) // 2).sum())

    fp = n_pred - tp
    fn = n_gold - tp
    precision = tp / n_pred if n_pred else 1.0
    recall = tp / n_gold if n_gold else 1.0
    f1 = 2 * precision * recall / (precision + recall) if (precision + recall) else 0.0
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "n_pred_pairs": n_pred,
        "n_gold_pairs": n_gold,
        "n_gold_joined": n_gold_joined,
    }


def confusion_f1(eval_ds) -> dict[str, float]:
    """Eval-log table (gold:int, pred:int) -> P/R/F1 via partial
    per-batch confusion counts + a tiny final sum (SURVEY.md §2.5 G2)."""

    def tally(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        gold = pc.cast(batch.column("gold"), pa.int32())
        pred = pc.cast(batch.column("pred"), pa.int32())
        g1 = pc.equal(gold, 1)
        p1 = pc.equal(pred, 1)
        tp = pc.sum(pc.cast(pc.and_(g1, p1), pa.int64())).as_py() or 0
        fp = pc.sum(pc.cast(pc.and_(pc.invert(g1), p1), pa.int64())).as_py() or 0
        fn = pc.sum(pc.cast(pc.and_(g1, pc.invert(p1)), pa.int64())).as_py() or 0
        tn = batch.num_rows - tp - fp - fn
        return pa.table(
            {k: pa.array([v], pa.int64()) for k, v in
             [("tp", tp), ("fp", fp), ("fn", fn), ("tn", tn)]}
        )

    parts: pd.DataFrame = eval_ds.map_batches(tally, batch_format="pyarrow").to_pandas()
    tp, fp, fn, tn = (int(parts[c].sum()) for c in ["tp", "fp", "fn", "tn"])
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if (precision + recall) else 0.0
    return {"precision": precision, "recall": recall, "f1": f1,
            "tp": tp, "fp": fp, "fn": fn, "tn": tn}
