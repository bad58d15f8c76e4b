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
