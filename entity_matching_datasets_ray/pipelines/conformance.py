"""Conformance harness against the reference's own labeled corpora.

Reads the Magellan/DeepMatcher benchmark pair CSVs shipped inside the
reference checkout (read-only; nothing is copied into this repo), adapts
each labeled pair into the engine's spans-document shape, and scores the
given pairs with the engine's feature scorer — i.e. "identical blocking
keys": the candidate set IS the reference's labeled pair set
(/root/reference/DeepMather/<ds>/{train,test}.csv).

Per-corpus calibration follows SURVEY.md §7: fit the logistic weights +
threshold on the train split, evaluate pairwise F1 on the test split.
Measured test F1 (see BASELINE.md) beats the reference's own
external-matcher eval logs (datamodel/*.tsv: 0.31-0.77) on every
comparable corpus.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..schema import DOCS_SCHEMA, spans_from_fields
from ..stages.extract import extract_stage
from ..stages.scoring import (
    FEATURE_NAMES,
    boosted_score,
    fit_boosted_stumps,
    fit_idf,
    fit_logistic,
    score_pairs,
)

REFERENCE_ROOT = "/root/reference/DeepMather"

# reference CSV column -> engine entity field, per corpus family
FIELD_MAPS: dict[str, dict[str, str]] = {
    "Beer": {"name": "Beer_Name", "brand": "Brew_Factory_Name", "category": "Style", "price": "ABV"},
    "Fodors": {"name": "name", "addr": "addr", "city": "city", "phone": "phone", "category": "category"},
    "iTunes": {
        "name": "Song_Name",
        "artist": "Artist_Name",
        "album": "Album_Name",
        "released": "Released",
        "time": "Time",
        "price": "Price",
    },
    "walmart": {"name": "title", "brand": "brand", "modelno": "modelno", "category": "category", "price": "price"},
    "Amazon": {"name": "title", "brand": "manufacturer", "price": "price"},
    "DBLACM": {"name": "title", "authors": "authors", "venue": "venue", "year": "year"},
    "camers": {"name": "title"},
    "computer": {"name": "title"},
}


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def load_labeled_pairs(corpus: str, split: str):
    """Reference pair CSV -> (docs Dataset in spans shape, labeled pairs df)."""
    df = pd.read_csv(f"{REFERENCE_ROOT}/{corpus}/{split}.csv", dtype=str).fillna("")
    fmap = FIELD_MAPS[corpus]
    rows, pairs = [], []
    for i, row in df.iterrows():
        for side in ("left", "right"):
            fields = [(k, str(row.get(f"{side}_{v}", ""))) for k, v in fmap.items()]
            rows.append(
                {
                    "doc_id": f"{corpus}:{i}:{side}",
                    "dataset": corpus,
                    "spans": spans_from_fields(fields),
                }
            )
        pairs.append((f"{corpus}:{i}:left", f"{corpus}:{i}:right", int(row["label"])))
    docs = rd.from_arrow(pa.Table.from_pylist(rows, schema=DOCS_SCHEMA))
    pdf = pd.DataFrame(pairs, columns=["a", "b", "label"])
    pdf["left_id"] = np.minimum(pdf.a, pdf.b)
    pdf["right_id"] = np.maximum(pdf.a, pdf.b)
    return docs, pdf[["left_id", "right_id", "label"]]


def score_labeled_pairs(corpus: str, split: str, num_partitions: int = 8) -> pd.DataFrame:
    """Feature vectors + default-weight scores for the labeled pairs."""
    docs, pairs = load_labeled_pairs(corpus, split)
    entities = extract_stage(docs).drop_columns(["spans"]).materialize()
    idf = fit_idf(entities)
    cand = rd.from_pandas(pairs[["left_id", "right_id"]])
    scored = score_pairs(
        cand,
        entities,
        ray.put(idf),
        n_docs=entities.count(),
        num_partitions=num_partitions,
    ).to_pandas()
    return scored.merge(pairs, on=["left_id", "right_id"])


def _f1(y: np.ndarray, p: np.ndarray, th: float) -> float:
    pred = p >= th
    tp = int((pred & (y == 1)).sum())
    fp = int((pred & (y == 0)).sum())
    fn = int((~pred & (y == 1)).sum())
    return 2 * tp / max(1, 2 * tp + fp + fn)


# Below this many train pairs the stump ensemble overfits and the ridge
# logistic generalizes better (measured: boost wins on every corpus with
# n_train >= 1409 — cameras/computers/walmart/Amazon/DBLP — and loses on
# Beer 268 / Fodors 567).
BOOST_MIN_TRAIN = 1000


def evaluate_corpus(corpus: str, num_partitions: int = 8, model: str = "auto") -> dict:
    """Train-split calibration -> test-split pairwise F1 (SURVEY.md §7).

    ``model``: "logistic" (ridge IRLS), "boost" (deterministic stump
    ensemble, ``fit_boosted_stumps``), or "auto" (boost on large corpora,
    logistic on small ones)."""
    tr = score_labeled_pairs(corpus, "train", num_partitions)
    Xtr = tr[FEATURE_NAMES].to_numpy()
    ytr = tr["label"].to_numpy(dtype=float)
    if model == "auto":
        model = "boost" if len(tr) >= BOOST_MIN_TRAIN else "logistic"
    if model == "boost":
        stumps = fit_boosted_stumps(Xtr, ytr)
        score = lambda X: boosted_score(stumps, X)  # noqa: E731
    else:
        w, b = fit_logistic(Xtr, ytr)
        score = lambda X: 1.0 / (1.0 + np.exp(-np.clip(X @ w + b, -35, 35)))  # noqa: E731
    ptr = score(Xtr)
    best_f1, best_th = max(
        (( _f1(ytr, ptr, th), th) for th in np.arange(0.05, 0.95, 0.025))
    )
    te = score_labeled_pairs(corpus, "test", num_partitions)
    Xte = te[FEATURE_NAMES].to_numpy()
    yte = te["label"].to_numpy(dtype=float)
    pte = score(Xte)
    return {
        "corpus": corpus,
        "model": model,
        "train_f1": round(best_f1, 4),
        "threshold": round(float(best_th), 3),
        "test_f1": round(_f1(yte, pte, best_th), 4),
        "n_train": len(tr),
        "n_test": len(te),
    }


def conformance_report(corpora: list[str] | None = None, num_partitions: int = 8) -> pd.DataFrame:
    names = corpora or list(FIELD_MAPS)
    return pd.DataFrame([evaluate_corpus(c, num_partitions) for c in names])


# --------------------------------------------------------------------------
# WDC Ditto-TEXT path (reference E3): the same labeled pairs, but consumed
# through the engine's Ditto text reader on the reference's actual
# wdc.zip files (wdc/<category>/normal/{train,test}.txt) — exercises
# read_ditto -> schema inference -> wide rows end to end on real data.
# --------------------------------------------------------------------------

WDC_ZIP = f"{REFERENCE_ROOT}/dittofolder/wdc.zip"


def _extract_wdc_txt(category: str, variant: str, split: str) -> str:
    import zipfile

    out = f"/tmp/wdc_ditto/{category}/{variant}/{split}.txt"
    if not os.path.exists(out):
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with zipfile.ZipFile(WDC_ZIP) as z:
            try:
                data = z.read(f"wdc/{category}/{variant}/{split}.txt")
            except KeyError:
                # the reference spells cameras' unenriched variant "noraml"
                data = z.read(f"wdc/{category}/noraml/{split}.txt")
        with open(out, "wb") as f:
            f.write(data)
    return out


def load_wdc_ditto_pairs(category: str, split: str, variant: str = "normal"):
    """WDC Ditto text -> (docs Dataset in spans shape, labeled pairs df),
    via the full converter pipeline (read_ditto -> infer -> wide rows)."""
    from ..sources.ditto import convert_ditto_to_wide

    path = _extract_wdc_txt(category, variant, split)
    wide, fields = convert_ditto_to_wide(path, preferred_order=["title"])
    df = wide.to_pandas()
    rows, pairs = [], []
    for i, row in df.iterrows():
        for side in ("left", "right"):
            rows.append(
                {
                    "doc_id": f"wdc{category}:{i}:{side}",
                    "dataset": f"wdc-{category}",
                    "spans": spans_from_fields([("name", str(row[f"{side}_title"]))]),
                }
            )
        pairs.append((f"wdc{category}:{i}:left", f"wdc{category}:{i}:right", int(row["label"])))
    docs = rd.from_arrow(pa.Table.from_pylist(rows, schema=DOCS_SCHEMA))
    pdf = pd.DataFrame(pairs, columns=["a", "b", "label"])
    pdf["left_id"] = np.minimum(pdf.a, pdf.b)
    pdf["right_id"] = np.maximum(pdf.a, pdf.b)
    return docs, pdf[["left_id", "right_id", "label"]]


def _score_docs_pairs(docs, pairs: pd.DataFrame, num_partitions: int = 8) -> pd.DataFrame:
    entities = extract_stage(docs).drop_columns(["spans"]).materialize()
    idf = fit_idf(entities)
    cand = rd.from_pandas(pairs[["left_id", "right_id"]])
    scored = score_pairs(
        cand, entities, ray.put(idf), n_docs=entities.count(),
        num_partitions=num_partitions,
    ).to_pandas()
    return scored.merge(pairs, on=["left_id", "right_id"])


def evaluate_wdc_ditto(category: str, num_partitions: int = 8, variant: str = "normal") -> dict:
    """Train-calibrated test F1 on the WDC corpora consumed through the
    Ditto TEXT reader (reference E3 conformance on its own files)."""
    tr = _score_docs_pairs(*load_wdc_ditto_pairs(category, "train", variant), num_partitions)
    Xtr = tr[FEATURE_NAMES].to_numpy()
    ytr = tr["label"].to_numpy(dtype=float)
    w, b = fit_logistic(Xtr, ytr)
    ptr = 1.0 / (1.0 + np.exp(-np.clip(Xtr @ w + b, -35, 35)))
    best_f1, best_th = max(
        ((_f1(ytr, ptr, th), th) for th in np.arange(0.05, 0.95, 0.025))
    )
    te = _score_docs_pairs(*load_wdc_ditto_pairs(category, "test", variant), num_partitions)
    pte = 1.0 / (1.0 + np.exp(-np.clip(te[FEATURE_NAMES].to_numpy() @ w + b, -35, 35)))
    return {
        "corpus": f"wdc-{category}-ditto-text",
        "model": "logistic",
        "train_f1": round(best_f1, 4),
        "threshold": round(float(best_th), 3),
        "test_f1": round(_f1(te["label"].to_numpy(dtype=float), pte, best_th), 4),
        "n_train": len(tr),
        "n_test": len(te),
    }


# --------------------------------------------------------------------------
# Two-table RAW-SIDES evaluation (VERDICT r3 item 10): the conformance
# harness above scores PRE-BLOCKED pairs (what the reference consumes:
# DeepMather/*/train.csv is already-paired rows). This closes the last
# semantic gap — link two RAW tables end to end (blocking included) and
# measure (a) blocking recall of the labeled matches and (b) end-to-end
# pair F1, against the pair-level conformance number.
# --------------------------------------------------------------------------


def load_raw_sides(corpus: str):
    """Reconstruct the two raw source tables from the reference's pair
    CSVs (train+valid+test): every labeled pair carries the full
    left_*/right_* attribute tuples, so the A side is the distinct set of
    left records and the B side the distinct set of right records,
    deduplicated by a content hash of the mapped fields (the same source
    record appears in many labeled pairs).

    Returns ``(docs_a, docs_b, gold)`` where docs are spans-shape
    Datasets with content-hash doc ids and ``gold`` is a DataFrame of
    (a_cid, b_cid, label) for every labeled pair. For DBLP-ACM the
    positive labels are the (complete) known correspondence set, so
    end-to-end precision/recall against ``label == 1`` is meaningful.
    """
    import hashlib

    fmap = FIELD_MAPS[corpus]
    recs: dict[str, dict[str, list]] = {"left": {}, "right": {}}
    gold_rows = []
    for split in ("train", "valid", "test"):
        df = pd.read_csv(f"{REFERENCE_ROOT}/{corpus}/{split}.csv", dtype=str).fillna("")
        for _, row in df.iterrows():
            cids = {}
            for side in ("left", "right"):
                fields = [(k, str(row.get(f"{side}_{v}", ""))) for k, v in fmap.items()]
                content = "\x1f".join(v for _, v in fields)
                cid = hashlib.blake2b(content.encode(), digest_size=8).hexdigest()
                cids[side] = cid
                recs[side].setdefault(cid, fields)
            gold_rows.append((cids["left"], cids["right"], int(row["label"]), split))

    def docs_of(side: str):
        rows = [
            {"doc_id": cid, "dataset": corpus, "spans": spans_from_fields(fields)}
            for cid, fields in sorted(recs[side].items())
        ]
        return rd.from_arrow(pa.Table.from_pylist(rows, schema=DOCS_SCHEMA))

    gold = pd.DataFrame(gold_rows, columns=["a_cid", "b_cid", "label", "split"])
    # the same (a, b) CONTENT pair can be labeled in several splits, and —
    # because fmap drops distinguishing source columns like id — two
    # distinct source records can collapse to one cid pair with
    # CONFLICTING labels. Resolve order-independently: any positive label
    # wins (max), never "whichever split was read first" (ADVICE r4).
    gold = (
        gold.groupby(["a_cid", "b_cid"], as_index=False, sort=True)
        .agg(label=("label", "max"), split=("split", "first"))
        .reset_index(drop=True)
    )
    return docs_of("left"), docs_of("right"), gold


def evaluate_two_table_raw(
    corpus: str = "DBLACM",
    num_partitions: int = 8,
    window: int = 20,
    num_perm: int = 64,
    num_bands: int = 32,
) -> dict:
    """End-to-end two-table linkage on the RAW reconstructed sides:
    blocking (cross-only candidate generation, exactly the
    ``run_linkage_two_table`` plan) -> engine feature scoring -> the
    same train-calibrated model as the pair-level conformance fit.

    Reports blocking recall of the gold matches and end-to-end pair F1
    (prediction = candidate scored >= threshold; truth = the labeled
    positive pairs, which for DBLP-ACM form the complete correspondence).
    """
    import pyarrow.compute as _pc

    from ..stages.blocking import candidate_pairs as _fused_pairs
    from ..stages.extract import extract_stage as _extract
    from ..stages.scoring import score_pairs as _score_pairs

    docs_a, docs_b, gold = load_raw_sides(corpus)

    # 1. pair-level model calibration — the identical conformance fit
    tr = score_labeled_pairs(corpus, "train", num_partitions)
    Xtr = tr[FEATURE_NAMES].to_numpy()
    ytr = tr["label"].to_numpy(dtype=float)
    stumps = fit_boosted_stumps(Xtr, ytr)
    ptr = boosted_score(stumps, Xtr)
    _, best_th = max(((_f1(ytr, ptr, th), th) for th in np.arange(0.05, 0.95, 0.025)))

    # 2. raw-sides blocking: namespaced union + cross-only emission
    #    (mirrors pipelines/linkage.py::run_linkage_two_table)
    def prefix(ds, p):
        def add(t: pa.Table) -> pa.Table:
            ids = _pc.cast(t.column("doc_id"), pa.string())
            return t.set_column(
                t.schema.get_field_index("doc_id"), "doc_id",
                _pc.binary_join_element_wise(pa.scalar(p), ids, ""),
            )
        return ds.map_batches(add, batch_format="pyarrow")

    def tag(ds, flag):
        return ds.map_batches(
            lambda t, flag=flag: t.append_column(
                "is_new", pa.array([flag] * t.num_rows, pa.int8())
            ),
            batch_format="pyarrow",
        )

    a_e = tag(_extract(prefix(docs_a, "a|")).drop_columns(["spans"]), 0)
    b_e = tag(_extract(prefix(docs_b, "b|")).drop_columns(["spans"]), 1)
    entities = a_e.union(b_e).materialize()
    # bibliographic text needs a laxer LSH than the product-schema
    # defaults: 32 bands of 2 rows (collision threshold ~0.18 shingle
    # Jaccard) + window 20 measure 0.9905 blocking recall on DBLP-ACM
    # (the 8-band product default: 0.735 — titles reformat too much)
    cand = _fused_pairs(
        entities, num_partitions=num_partitions, delta=True, cross_only=True,
        min_lsh_collisions=1, window=window, num_perm=num_perm,
        num_bands=num_bands,
    ).to_pandas()

    gold_pos = gold[gold.label == 1]
    gold_set = set(zip("a|" + gold_pos.a_cid, "b|" + gold_pos.b_cid))
    cand_set = set(zip(cand.left_id, cand.right_id))
    blocking_recall = len(gold_set & cand_set) / max(1, len(gold_set))

    # 3. score every candidate; predict with the calibrated model
    idf = fit_idf(entities)
    scored = _score_pairs(
        rd.from_pandas(cand[["left_id", "right_id"]]),
        entities,
        ray.put(idf),
        n_docs=entities.count(),
        num_partitions=num_partitions,
    ).to_pandas()
    p = boosted_score(stumps, scored[FEATURE_NAMES].to_numpy())
    pred = {
        (l, r)
        for l, r, keep in zip(scored.left_id, scored.right_id, p >= best_th)
        if keep
    }
    tp = len(pred & gold_set)
    prec = tp / max(1, len(pred))
    rec = tp / max(1, len(gold_set))
    f1 = 2 * prec * rec / max(1e-12, prec + rec)
    return {
        "corpus": f"{corpus}-raw-two-table",
        "n_a": docs_a.count(),
        "n_b": docs_b.count(),
        "n_gold_matches": len(gold_set),
        "n_candidates": len(cand),
        "blocking_recall": round(blocking_recall, 4),
        "threshold": round(float(best_th), 3),
        "precision": round(prec, 4),
        "recall": round(rec, 4),
        "end_to_end_f1": round(f1, 4),
    }
