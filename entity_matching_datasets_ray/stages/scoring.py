"""Pairwise feature scoring: stateful actor pool + calibrated logistic model.

The engine-side replacement for the reference's per-pair LLM judgment
(/root/reference/DeepMather/Amazon/prompt.py:151-206): candidate pairs are
joined to their entity feature rows (hash join on doc_id), then a
``map_batches`` actor pool computes Jaro-Winkler / Levenshtein /
token-Jaccard / TF-IDF-cosine + typed-agreement features and a calibrated
logistic score. The IDF vector is fitted once with a partial-aggregated
groupby pass and broadcast via ``ray.put`` (read once per actor in
``__init__`` — never re-shipped per batch). SURVEY.md §2.3 A1/A4.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..functions import similarity as S
from .extract import token_rows

# Entity columns carried through the pair joins (narrow on purpose: ids +
# features only cross the shuffle; display fields re-join at the end —
# SURVEY.md §7 "wide pair records").
FEATURE_COLUMNS = [
    "doc_id",
    "norm_name",
    "norm_brand",
    "modelno",
    "price_num",
    "phone_norm",
    "addr",
    "city",
    "venue",
    "year",
    "authors",
    "artist",
    "album",
    "date_iso",
    "time",
]

FEATURE_NAMES = [
    "name_jw",
    "name_lev",
    "name_jac",
    "name_ng_jac",
    "name_contain",
    "name_tfidf",
    "name_num_jac",
    "name_tfidf_contain",
    "brand_eq",
    "model_eq",
    "price_close",
    "phone_eq",
    "addr_jw",
    "city_eq",
    "venue_eq",
    "year_eq",
    "authors_jac",
    "artist_jw",
    "album_jw",
    "date_eq",
    "time_eq",
    # appended (index-stable for the 0..7 name block): 1.0 iff BOTH sides
    # carry numeric tokens with zero overlap — a version/model CONFLICT,
    # distinct from one-side-missing (which num_jac scores 0.0 too).
    "name_num_conflict",
    # product-title spec block (functions/titles.py — deterministic
    # stand-in for the reference computer prompt's attribute rules,
    # DeepMather/computer/single.py:40-64). All default-weight 0; the
    # per-corpus conformance fits learn them where titles carry specs.
    "name_sku_jac",        # part-number token overlap (0.5 none / 0 one-side)
    "name_sku_conflict",   # both sides carry part numbers, zero overlap
    "name_cap_conflict",   # both sides carry capacities, zero overlap
    "name_spec_jac",       # canonical interface/speed/form-factor overlap
    # appended r5 (VERDICT r4 item 6 — per-corpus headroom; default 0):
    "name_num_contain",    # numeric-token containment (marketplace-suffix
    # robust model-number agreement: dot against the SMALLER numeric set)
    "name_seg_jac",        # jaccard over alnum-boundary-SEGMENTED tokens
    # ("wb2100" == "wb-2100" == "wb 2100" — camera model segmentation)
    "name_segnum_jac",     # jaccard over segmented DIGIT runs only (the
    # model-number core: "wb2100" vs "wb-2100" share "2100"; measured
    # +0.03-0.05 F1 on WDC cameras)
    "name_segnum_contain",  # same sets, containment (|∩|/min)
    "name_segnum_conflict",  # both sides carry digit runs, zero overlap
    "time_conflict",       # both time/duration fields present and unequal
    "price_conflict",      # both prices present, relative gap > 20%
]

# Calibrated on the deterministic synthetic corpus: fit_logistic over the
# blocking-produced candidate features of a 20000-entity seed-42 corpus
# (IRLS, class-balanced; see tests/test_pipeline_e2e.py); intercept last.
DEFAULT_WEIGHTS = {
    "name_jw": 1.179,
    "name_lev": 1.765,
    "name_jac": 1.734,
    "name_ng_jac": 1.654,
    "name_contain": 1.280,
    "name_tfidf": 2.899,
    # 0 by default: on the seeded corpus numeric-token overlap fires on the
    # identical-name hard negatives (shared display numbers) and merges
    # clusters; per-corpus calibration (pipelines/conformance.py) learns a
    # positive weight where model numbers are discriminative.
    "name_num_jac": 0.0,
    # 0 by default for the same reason; per-corpus fits use it (robust to
    # marketplace-title suffix tokens: dot against the SHORTER side's norm).
    "name_tfidf_contain": 0.0,
    "brand_eq": 1.018,
    "model_eq": 1.628,
    "price_close": 1.643,
    "phone_eq": 3.373,
    "addr_jw": 0.739,
    "city_eq": 1.135,
    "venue_eq": 0.782,
    "year_eq": 1.814,
    "authors_jac": 2.150,
    "artist_jw": 0.685,
    "album_jw": 0.690,
    "date_eq": 1.282,
    "time_eq": 1.275,
    # 0 by default (doesn't perturb the synth-calibrated scores);
    # per-corpus fits learn a negative weight where versions discriminate.
    "name_num_conflict": 0.0,
    "name_sku_jac": 0.0,
    "name_sku_conflict": 0.0,
    "name_cap_conflict": 0.0,
    "name_spec_jac": 0.0,
    # r5 per-corpus features: 0 by default (scores of every synth-
    # calibrated pipeline are bit-unchanged); the conformance fits learn
    # them where the corpus carries the signal (cameras/iTunes).
    "name_num_contain": 0.0,
    "name_seg_jac": 0.0,
    "name_segnum_jac": 0.0,
    "name_segnum_contain": 0.0,
    "name_segnum_conflict": 0.0,
    "time_conflict": 0.0,
    "price_conflict": 0.0,
    "_intercept": -16.798,
}


def fit_idf(entities, max_vocab: int = 1_000_000) -> dict[str, float]:
    """Corpus IDF over normalized-name tokens.

    Per-batch partial counts (extract.token_rows) -> groupby(token).sum —
    the shuffle moves one row per distinct token per batch, not one per
    token occurrence. Vocabulary capped at ``max_vocab`` by document
    frequency (rare tail falls back to default idf in the scorer).
    """
    from ray.data.aggregate import Sum

    n_docs = max(1, entities.count())
    partials = entities.select_columns(["norm_name"]).map_batches(
        token_rows, batch_format="pyarrow"
    )
    dfs = partials.groupby("token").aggregate(Sum("df", alias_name="df"))
    if dfs.count() > max_vocab:
        dfs = dfs.sort("df", descending=True).limit(max_vocab)
    table = dfs.to_pandas()
    return {
        t: math.log((1.0 + n_docs) / (1.0 + d)) + 1.0
        for t, d in zip(table["token"], table["df"])
    }


def default_idf_value(n_docs: int) -> float:
    return math.log((1.0 + n_docs) / 2.0) + 1.0


# Edit-distance kernels are O(len^2); cap the strings they see. True
# duplicates overwhelmingly agree in their first characters after
# normalization, and token/tfidf features cover the long tail.
EDIT_KERNEL_CAP = 64

# Cheap-reject gate: when ALL set-overlap/tfidf features fall below these
# bounds, the pair cannot clear a sane match threshold (the fitted weights
# put >10 logits on name similarity), so the expensive O(len^2) edit
# kernels are skipped and the n-gram Jaccard stands in for jw/lev — a
# conservative under-estimate, so borderline negatives score lower, never
# higher. Measured on the 20k-entity corpus: gates 51% of candidates while
# touching 30/26723 gold pairs (0.1%), most re-linked by transitivity
# (tests assert F1 >= 0.99 with the fast path active).
CHEAP_REJECT_JAC = 0.45
CHEAP_REJECT_TFIDF = 0.55

# letter runs | digit runs (norm_name is already lowercased)
import re as _re  # noqa: E402

_SEG_RE = _re.compile(r"[a-z]+|[0-9]+")


class _Side:
    """Precomputed per-document name features. Cached per unique
    ``norm_name`` inside each scorer actor: a document participates in many
    candidate pairs, so tokenization / shingling / TF-IDF vectorization are
    amortized across all of them."""

    __slots__ = (
        "name",
        "capped",
        "tok_set",
        "num_set",
        "seg_set",
        "segnum_set",
        "shingles",
        "vec",
        "norm",
        "spec_set",
        "cap_set",
        "sku_set",
    )

    def __init__(self, name: str, idf: dict[str, float], default_idf: float):
        from ..functions.titles import title_profile

        self.name = name
        self.capped = name[:EDIT_KERNEL_CAP]
        tokens = name.split(" ") if name else []
        self.tok_set = set(tokens)
        # digit-bearing tokens (model numbers, sizes, years) — the highest-
        # signal tokens in product titles; their overlap is a feature.
        self.num_set = {t for t in self.tok_set if any(c.isdigit() for c in t)}
        # alnum-boundary segmentation: "wb2100"/"wb-2100"/"wb 2100" all
        # yield {"wb","2100"} — the camera-model tokenization drift
        self.seg_set = frozenset(_SEG_RE.findall(name)) if name else frozenset()
        # segmented DIGIT runs only — the model-number core
        self.segnum_set = frozenset(t for t in self.seg_set if t.isdigit())
        # product-title spec block (amortized across the side's pairs by
        # the per-actor side cache, like everything else in this class)
        self.spec_set, self.cap_set, self.sku_set = title_profile(name)
        self.shingles = S.ngram_shingles(name, 3)
        tf: dict[str, int] = {}
        for t in tokens:
            tf[t] = tf.get(t, 0) + 1
        self.vec = {t: c * idf.get(t, default_idf) for t, c in tf.items()}
        self.norm = math.sqrt(sum(w * w for w in self.vec.values()))


def _name_features_cheap(l: _Side, r: _Side) -> tuple[float, float, float, float, float, float, bool]:
    """(jac, ng_jac, contain, tfidf, num_jac, tfidf_contain, gated) — the
    set/tfidf features plus the cheap-reject verdict; the O(len^2) edit
    kernels are the caller's (possibly batched) concern."""
    sl, sr = l.tok_set, r.tok_set
    if not sl and not sr:
        jac = 1.0
        contain = 1.0
    elif not sl or not sr:
        jac = 0.0
        contain = 0.0
    else:
        inter = len(sl & sr)
        jac = inter / (len(sl) + len(sr) - inter)
        contain = inter / min(len(sl), len(sr))
    ssl, ssr = l.shingles, r.shingles
    if not ssl and not ssr:
        ng = 1.0
    elif not ssl or not ssr:
        ng = 0.0
    else:
        ninter = len(ssl & ssr)
        ng = ninter / (len(ssl) + len(ssr) - ninter)
    nl, nr = l.num_set, r.num_set
    num_conflict = 0.0
    if not nl and not nr:
        num_jac = 0.5  # no numeric tokens on either side: uninformative
    elif not nl or not nr:
        num_jac = 0.0
    else:
        ninter2 = len(nl & nr)
        num_jac = ninter2 / (len(nl) + len(nr) - ninter2)
        if ninter2 == 0:
            num_conflict = 1.0
    if l.norm == 0.0 or r.norm == 0.0:
        tfidf = 1.0 if (not sl and not sr) else 0.0
        tfidf_contain = tfidf
    else:
        a, b = (l.vec, r.vec) if len(l.vec) <= len(r.vec) else (r.vec, l.vec)
        dot = sum(w * b[t] for t, w in a.items() if t in b)
        tfidf = dot / (l.norm * r.norm)
        mn = min(l.norm, r.norm)
        tfidf_contain = min(1.0, dot / (mn * mn))
    gated = jac < CHEAP_REJECT_JAC and ng < CHEAP_REJECT_JAC and tfidf < CHEAP_REJECT_TFIDF
    return jac, ng, contain, tfidf, num_jac, tfidf_contain, num_conflict, gated


def _jac_or_missing(a: frozenset, b: frozenset) -> float:
    if not a and not b:
        return 0.5
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def _extra_name_block(l: _Side, r: _Side) -> tuple[float, float, float, float, float]:
    """(num_contain, seg_jac, segnum_jac, segnum_contain, segnum_conflict)
    — the r5 per-corpus name features; missing conventions mirror num_jac
    (0.5 both-missing / 0.0 one-side) for the numeric sets and name_jac
    (1.0 both-empty / 0.0 one-empty) for the full segment set."""
    nl, nr = l.num_set, r.num_set
    if not nl and not nr:
        num_contain = 0.5
    elif not nl or not nr:
        num_contain = 0.0
    else:
        num_contain = len(nl & nr) / min(len(nl), len(nr))
    sl, sr = l.seg_set, r.seg_set
    if not sl and not sr:
        seg_jac = 1.0
    elif not sl or not sr:
        seg_jac = 0.0
    else:
        inter = len(sl & sr)
        seg_jac = inter / (len(sl) + len(sr) - inter)
    dl, dr = l.segnum_set, r.segnum_set
    segnum_conflict = 0.0
    if not dl and not dr:
        segnum_jac = segnum_contain = 0.5
    elif not dl or not dr:
        segnum_jac = segnum_contain = 0.0
    else:
        dinter = len(dl & dr)
        segnum_jac = dinter / (len(dl) + len(dr) - dinter)
        segnum_contain = dinter / min(len(dl), len(dr))
        if dinter == 0:
            segnum_conflict = 1.0
    return num_contain, seg_jac, segnum_jac, segnum_contain, segnum_conflict


def _title_spec_block(l: _Side, r: _Side) -> tuple[float, float, float, float]:
    """(sku_jac, sku_conflict, cap_conflict, spec_jac) — the appended
    product-title features; missing conventions mirror num_jac/num_conflict."""
    sku_jac = _jac_or_missing(l.sku_set, r.sku_set)
    sku_conflict = 1.0 if (l.sku_set and r.sku_set and not (l.sku_set & r.sku_set)) else 0.0
    cap_conflict = 1.0 if (l.cap_set and r.cap_set and not (l.cap_set & r.cap_set)) else 0.0
    spec_jac = _jac_or_missing(l.spec_set, r.spec_set)
    return sku_jac, sku_conflict, cap_conflict, spec_jac


def _name_features(l: _Side, r: _Side, edit_memo: dict | None = None) -> tuple[float, float, float, float, float, float, float, float]:
    """(jw, lev, jac, ng_jac, contain, tfidf, num_jac, tfidf_contain)
    between two cached sides.
    Must stay numerically identical to the uncached formulas in
    functions/similarity.py (the calibrated weights depend on it)."""
    jac, ng, contain, tfidf, num_jac, tfidf_contain, _num_conflict, gated = _name_features_cheap(l, r)
    if gated:
        jw = lev = ng
    elif edit_memo is not None:
        key = (l.capped, r.capped)
        hit = edit_memo.get(key)
        if hit is None:
            hit = (
                S.jaro_winkler(l.capped, r.capped),
                S.levenshtein_ratio(l.capped, r.capped),
            )
            if len(edit_memo) >= 500_000:
                edit_memo.clear()
            edit_memo[key] = hit
        jw, lev = hit
    else:
        jw = S.jaro_winkler(l.capped, r.capped)
        lev = S.levenshtein_ratio(l.capped, r.capped)
    return jw, lev, jac, ng, contain, tfidf, num_jac, tfidf_contain


def _batch_name_features(
    feats: np.ndarray, lnames: list, rnames: list, side_fn, edit_memo: dict
) -> None:
    """Fill feats[:, 0:8] for a batch: cheap features + gate per row in
    Python (set ops over cached sides), then ONE vectorized call into the
    batched Jaro-Winkler / Myers-Levenshtein kernels for the unique,
    non-gated, non-memoized capped pairs (functions/similarity_batch.py —
    bit-identical to the scalar kernels)."""
    from ..functions.similarity_batch import (
        jaro_winkler_batch,
        levenshtein_ratio_batch,
    )

    conflict_idx = FEATURE_NAMES.index("name_num_conflict")
    sku_jac_idx = FEATURE_NAMES.index("name_sku_jac")
    extra_idx = FEATURE_NAMES.index("name_num_contain")
    n = len(lnames)
    pending: dict[tuple, list[int]] = {}
    for i in range(n):
        ls = side_fn(_none_if_na(lnames[i]))
        rs = side_fn(_none_if_na(rnames[i]))
        jac, ng, contain, tfidf, num_jac, tfc, num_conflict, gated = _name_features_cheap(ls, rs)
        feats[i, 2] = jac
        feats[i, 3] = ng
        feats[i, 4] = contain
        feats[i, 5] = tfidf
        feats[i, 6] = num_jac
        feats[i, 7] = tfc
        feats[i, conflict_idx] = num_conflict
        feats[i, sku_jac_idx : sku_jac_idx + 4] = _title_spec_block(ls, rs)
        feats[i, extra_idx : extra_idx + 5] = _extra_name_block(ls, rs)
        if gated:
            feats[i, 0] = feats[i, 1] = ng
            continue
        key = (ls.capped, rs.capped)
        hit = edit_memo.get(key)
        if hit is not None:
            feats[i, 0], feats[i, 1] = hit
        else:
            pending.setdefault(key, []).append(i)
    if pending:
        keys = list(pending.keys())
        jw = jaro_winkler_batch([k[0] for k in keys], [k[1] for k in keys])
        lev = levenshtein_ratio_batch([k[0] for k in keys], [k[1] for k in keys])
        if len(edit_memo) >= 500_000:
            edit_memo.clear()
        for key, w, v in zip(keys, jw, lev):
            w = float(w)
            v = float(v)
            edit_memo[key] = (w, v)
            for i in pending[key]:
                feats[i, 0] = w
                feats[i, 1] = v


_AUX_COLUMNS = [
    "norm_brand",
    "modelno",
    "price_num",
    "phone_norm",
    "addr",
    "city",
    "venue",
    "year",
    "authors",
    "artist",
    "album",
    "date_iso",
    "time",
]


def _aux_features(left: dict, right: dict) -> list[float]:
    """FEATURE_NAMES[6:]: typed-agreement features on the non-name fields."""
    la, ra = (left["authors"] or "").lower().split(", "), (right["authors"] or "").lower().split(", ")
    return [
        S.exact_or_missing(left["norm_brand"], right["norm_brand"]),
        S.exact_or_missing(left["modelno"], right["modelno"]),
        S.numeric_closeness(left["price_num"], right["price_num"]),
        S.exact_or_missing(left["phone_norm"], right["phone_norm"]),
        S.jaro_winkler((left["addr"] or "").lower(), (right["addr"] or "").lower())
        if (left["addr"] or right["addr"])
        else 0.5,
        S.exact_or_missing(left["city"], right["city"]),
        S.exact_or_missing(left["venue"], right["venue"]),
        S.exact_or_missing(left["year"], right["year"]),
        S.token_jaccard(la, ra) if (left["authors"] or right["authors"]) else 0.5,
        S.jaro_winkler(left["artist"] or "", right["artist"] or "")
        if (left["artist"] or right["artist"])
        else 0.5,
        S.jaro_winkler(left["album"] or "", right["album"] or "")
        if (left["album"] or right["album"])
        else 0.5,
        S.exact_or_missing(left["date_iso"], right["date_iso"]),
        S.exact_or_missing(left["time"], right["time"]),
    ]


def compute_pair_features(left: dict, right: dict, idf: dict[str, float], default_idf: float) -> list[float]:
    """One candidate pair -> feature vector (FEATURE_NAMES order)."""
    ln, rn = left["norm_name"] or "", right["norm_name"] or ""
    ls = _Side(ln, idf, default_idf)
    rs = _Side(rn, idf, default_idf)
    jw, lev, name_jac, name_ng, contain, tfidf, num_jac, tfc = _name_features(ls, rs)
    num_conflict = _name_features_cheap(ls, rs)[6]
    lt, rt = _none_if_na(left["time"]), _none_if_na(right["time"])
    time_conflict = 1.0 if (lt not in (None, "") and rt not in (None, "") and lt != rt) else 0.0
    lp, rp = _none_if_na(left["price_num"]), _none_if_na(right["price_num"])
    if lp is None or rp is None:
        price_conflict = 0.0
    else:
        denom = max(abs(float(lp)), abs(float(rp)), 1e-9)
        price_conflict = 1.0 if abs(float(lp) - float(rp)) / denom > 0.2 else 0.0
    return (
        [jw, lev, name_jac, name_ng, contain, tfidf, num_jac, tfc]
        + _aux_features(left, right)
        + [num_conflict]
        + list(_title_spec_block(ls, rs))
        + list(_extra_name_block(ls, rs))
        + [time_conflict, price_conflict]
    )


class PairScorer:
    """Actor-pool callable: scores batches of joined candidate pairs.

    ``__init__`` runs once per actor: resolves the broadcast IDF object ref
    (``ray.put`` on the driver), materializes the weight vector. ``__call__``
    runs per batch. SURVEY.md §2.3 A1.
    """

    def __init__(
        self,
        idf_ref,
        n_docs: int,
        weights: dict[str, float] | None = None,
    ):
        self.idf = ray.get(idf_ref) if isinstance(idf_ref, ray.ObjectRef) else idf_ref
        self.default_idf = default_idf_value(n_docs)
        w = dict(DEFAULT_WEIGHTS)
        if weights:
            w.update(weights)
        self.w = np.array([w[f] for f in FEATURE_NAMES])
        self.b = w["_intercept"]
        self._sides: dict[str, _Side] = {}  # per-actor memo (bounded below)
        self._edit_memo: dict = {}  # (capped_l, capped_r) -> (jw, lev)

    _SIDE_CACHE_MAX = 250_000

    def _side(self, name) -> _Side:
        key = name or ""
        s = self._sides.get(key)
        if s is None:
            if len(self._sides) >= self._SIDE_CACHE_MAX:
                self._sides.clear()
            s = _Side(key, self.idf, self.default_idf)
            self._sides[key] = s
        return s

    @staticmethod
    def _clean_col(series: pd.Series) -> np.ndarray:
        """object array with NaN/'' normalized to None (vectorized)."""
        arr = series.to_numpy(dtype=object, copy=True)
        mask = pd.isna(series).to_numpy() | (arr == "")
        arr[mask] = None
        return arr

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        feats = np.empty((n, len(FEATURE_NAMES)))
        side = self._side
        memo = self._edit_memo

        # --- name features: cheap set features per row, edit kernels
        # batched+vectorized over the unique non-gated population ---------
        lnames = batch["l_norm_name"].tolist()
        rnames = batch["r_norm_name"].tolist()
        _batch_name_features(feats, lnames, rnames, side, memo)

        # --- exact-agreement aux features: fully vectorized --------------
        def eq_feature(col: str) -> np.ndarray:
            l = self._clean_col(batch[f"l_{col}"])
            r = self._clean_col(batch[f"r_{col}"])
            missing = (l == None) | (r == None)  # noqa: E711 (elementwise)
            return np.where(missing, 0.5, (l == r).astype(np.float64))

        col_idx = {f: j for j, f in enumerate(FEATURE_NAMES)}
        for col, fname in [
            ("norm_brand", "brand_eq"),
            ("modelno", "model_eq"),
            ("phone_norm", "phone_eq"),
            ("city", "city_eq"),
            ("venue", "venue_eq"),
            ("year", "year_eq"),
            ("date_iso", "date_eq"),
            ("time", "time_eq"),
        ]:
            feats[:, col_idx[fname]] = eq_feature(col)

        lp = batch["l_price_num"].to_numpy(dtype=np.float64, na_value=np.nan)
        rp = batch["r_price_num"].to_numpy(dtype=np.float64, na_value=np.nan)
        with np.errstate(invalid="ignore", divide="ignore"):
            denom = np.maximum(np.maximum(np.abs(lp), np.abs(rp)), 1e-9)
            close = np.maximum(0.0, 1.0 - np.abs(lp - rp) / denom)
            rel_gap = np.abs(lp - rp) / denom
        missing_price = np.isnan(lp) | np.isnan(rp)
        feats[:, col_idx["price_close"]] = np.where(missing_price, 0.5, close)
        feats[:, col_idx["price_conflict"]] = np.where(
            ~missing_price & (rel_gap > 0.2), 1.0, 0.0
        )
        ltime = self._clean_col(batch["l_time"])
        rtime = self._clean_col(batch["r_time"])
        both_time = (ltime != None) & (rtime != None)  # noqa: E711 (elementwise)
        feats[:, col_idx["time_conflict"]] = np.where(
            both_time & (ltime != rtime), 1.0, 0.0
        )

        # --- string-similarity aux features: batched Jaro-Winkler over
        # the non-null rows (one vectorized call per column; bit-identical
        # to the scalar kernel), token-Jaccard stays a set-op loop --------
        from ..functions.similarity_batch import jaro_winkler_batch

        for col, fname, kind in [
            ("addr", "addr_jw", "jw_lower"),
            ("authors", "authors_jac", "tok_jac"),
            ("artist", "artist_jw", "jw"),
            ("album", "album_jw", "jw"),
        ]:
            l = self._clean_col(batch[f"l_{col}"])
            r = self._clean_col(batch[f"r_{col}"])
            out_col = np.full(n, 0.5)
            present = np.flatnonzero(~((l == None) & (r == None)))  # noqa: E711
            if len(present) == 0:
                feats[:, col_idx[fname]] = out_col
                continue
            if kind == "tok_jac":
                for i in present:
                    out_col[i] = S.token_jaccard(
                        (l[i] or "").lower().split(", "), (r[i] or "").lower().split(", ")
                    )
            else:
                if kind == "jw_lower":
                    a = [(l[i] or "").lower() for i in present]
                    b = [(r[i] or "").lower() for i in present]
                else:
                    a = [(l[i] or "") for i in present]
                    b = [(r[i] or "") for i in present]
                # aux strings are uncapped in the scalar path; raise the
                # encode cap well past any real field length
                out_col[present] = jaro_winkler_batch(a, b, max_len=4096)
            feats[:, col_idx[fname]] = out_col

        z = feats @ self.w + self.b
        score = 1.0 / (1.0 + np.exp(-z))
        out = pd.DataFrame({"left_id": batch["left_id"], "right_id": batch["right_id"]})
        for j, f in enumerate(FEATURE_NAMES):
            out[f] = feats[:, j]
        out["score"] = score
        return out


def _none_if_na(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


def _prefixed(entities, prefix: str):
    sel = entities.select_columns(FEATURE_COLUMNS)
    names = [f"{prefix}{c}" for c in FEATURE_COLUMNS]
    return sel.map_batches(
        lambda t, names=names: t.rename_columns(names), batch_format="pyarrow"
    )


class BroadcastPairScorer(PairScorer):
    """Scorer for the broadcast path: the whole entity feature table is
    ``ray.put`` once and read into each actor's ``__init__``; batches carry
    bare (left_id, right_id) pairs and sides come from a dict lookup —
    no shuffle join at all. Used when the entity table fits comfortably in
    worker memory; the partitioned hash join is the big-side path."""

    def __init__(self, features_ref, idf_ref, n_docs, weights=None):
        super().__init__(idf_ref, n_docs, weights)
        obj = ray.get(features_ref) if isinstance(features_ref, ray.ObjectRef) else features_ref
        self.fdf: pd.DataFrame = obj  # indexed by doc_id

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # C-level hash lookups: one reindex per side, no per-row python
        l = self.fdf.reindex(batch["left_id"].to_numpy())
        r = self.fdf.reindex(batch["right_id"].to_numpy())
        l.columns = [f"l_{c}" for c in l.columns]
        r.columns = [f"r_{c}" for c in r.columns]
        merged = pd.concat(
            [
                batch[["left_id", "right_id"]].reset_index(drop=True),
                l.reset_index(drop=True),
                r.reset_index(drop=True),
            ],
            axis=1,
        )
        return super().__call__(merged)


def broadcast_features(entities) -> pd.DataFrame:
    """Driver-side: entity table -> doc_id-indexed feature frame for
    ray.put (zero-copy into each actor via the object store)."""
    df = entities.select_columns(FEATURE_COLUMNS).to_pandas()
    return df.set_index("doc_id")


# Above this row count the entity feature table stops being broadcast and
# pair enrichment falls back to partitioned hash joins. ~500k rows x ~200 B
# ≈ 100 MB per worker — comfortable; at 10^12 docs the join path is used.
BROADCAST_MAX_DOCS = 500_000


def score_pairs(
    pairs,
    entities,
    idf_ref,
    n_docs: int,
    weights: dict[str, float] | None = None,
    num_partitions: int = 32,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 2048,
    join_strategy: str = "auto",
):
    """pairs (left_id,right_id) x entities -> scored pairs.

    Side-feature attachment is adaptive (``join_strategy``):
    - ``broadcast`` (auto when the entity table is small): features are
      ``ray.put`` once; scorer actors look sides up in ``__init__``-loaded
      state — zero shuffle.
    - ``shuffle`` (auto at scale): two partitioned hash joins bring each
      side's feature row to the pair (both sides large at 10^12 docs).
    """
    if join_strategy == "auto":
        join_strategy = "broadcast" if n_docs <= BROADCAST_MAX_DOCS else "shuffle"

    # The candidate stream arrives in one coarse block per dedup partition;
    # actor-pool tasks are block-granular, so a handful of huge blocks
    # starves/imbalances the pool (observed: 18 tasks on a 12-actor pool,
    # 2x wall). Split into fine-grained blocks first (no shuffle, cheap).
    hi = concurrency[1] if isinstance(concurrency, tuple) else concurrency
    pairs = pairs.repartition(max(64, 8 * int(hi or 8)))

    if join_strategy == "broadcast":
        feat_ref = ray.put(broadcast_features(entities))
        return pairs.select_columns(["left_id", "right_id"]).map_batches(
            BroadcastPairScorer,
            fn_constructor_kwargs=dict(
                features_ref=feat_ref, idf_ref=idf_ref, n_docs=n_docs, weights=weights
            ),
            batch_format="pandas",
            batch_size=batch_size,
            concurrency=concurrency,
        )

    left_feat = _prefixed(entities, "l_")
    right_feat = _prefixed(entities, "r_")
    joined = pairs.join(
        left_feat,
        join_type="inner",
        num_partitions=num_partitions,
        on=("left_id",),
        right_on=("l_doc_id",),
    )
    joined = joined.join(
        right_feat,
        join_type="inner",
        num_partitions=num_partitions,
        on=("right_id",),
        right_on=("r_doc_id",),
    )
    # join output is one block per join partition — split again so the
    # scorer pool gets fine-grained, well-balanced tasks
    joined = joined.repartition(max(64, 8 * int(hi or 8)))
    return joined.map_batches(
        PairScorer,
        fn_constructor_kwargs=dict(idf_ref=idf_ref, n_docs=n_docs, weights=weights),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# --------------------------------------------------------------------------
# calibration (deterministic logistic fit, plain numpy)
# --------------------------------------------------------------------------


def fit_boosted_stumps(
    X: np.ndarray,
    y: np.ndarray,
    n_rounds: int = 120,
    lr: float = 0.25,
    n_bins: int = 32,
) -> list[tuple[int, float, float, float]]:
    """Deterministic class-balanced gradient boosting with depth-1 stumps
    (LogitBoost-style, plain numpy — no external ML deps).

    Returns ``[(feature_idx, threshold, left_value, right_value), ...]``;
    score with ``boosted_score``. Captures the non-linear feature
    interactions (containment x version-conflict etc.) a single logistic
    can't — lifts Walmart-Amazon conformance F1 0.69 -> 0.76 at identical
    features. Exhaustive quantile-threshold search per round keeps the fit
    deterministic (no RNG)."""
    n, d = X.shape
    n_pos = max(1.0, y.sum())
    n_neg = max(1.0, n - y.sum())
    sw = np.where(y == 1, n / (2 * n_pos), n / (2 * n_neg))
    F = np.zeros(n)
    stumps: list[tuple[int, float, float, float]] = []
    cand = [
        np.unique(np.quantile(X[:, j], np.linspace(0.02, 0.98, n_bins)))
        for j in range(d)
    ]
    for _ in range(n_rounds):
        p = 1.0 / (1.0 + np.exp(-F))
        g = sw * (y - p)
        h = sw * p * (1 - p) + 1e-9
        best = None
        for j in range(d):
            xj = X[:, j]
            for th in cand[j]:
                m = xj >= th
                gl, gr = g[~m].sum(), g[m].sum()
                hl, hr = h[~m].sum(), h[m].sum()
                gain = gl * gl / max(hl, 1e-9) + gr * gr / max(hr, 1e-9)
                if best is None or gain > best[0]:
                    best = (gain, j, th, gl / max(hl, 1e-9), gr / max(hr, 1e-9))
        _, j, th, vl, vr = best
        F += lr * np.where(X[:, j] >= th, vr, vl)
        stumps.append((j, float(th), lr * vl, lr * vr))
    return stumps


def boosted_score(stumps: list[tuple[int, float, float, float]], X: np.ndarray) -> np.ndarray:
    """Probability scores for a stump ensemble from ``fit_boosted_stumps``."""
    F = np.zeros(len(X))
    for j, th, vl, vr in stumps:
        F += np.where(X[:, j] >= th, vr, vl)
    return 1.0 / (1.0 + np.exp(-F))


def fit_logistic(
    X: np.ndarray, y: np.ndarray, iters: int = 25, l2: float = 1e-3
) -> tuple[np.ndarray, float]:
    """Deterministic class-balanced IRLS (Newton) logistic regression.

    Class weights equalize the positive/negative mass so the heavily
    negative-skewed candidate set (blocking emits ~100x more non-matches
    than matches) doesn't drown the positives."""
    n, d = X.shape
    Xa = np.hstack([X, np.ones((n, 1))])
    w = np.zeros(d + 1)
    n_pos = max(1.0, y.sum())
    n_neg = max(1.0, n - y.sum())
    sw = np.where(y == 1, n / (2 * n_pos), n / (2 * n_neg))
    reg = l2 * np.eye(d + 1)
    reg[d, d] = 0.0  # don't regularize the intercept
    for _ in range(iters):
        z = np.clip(Xa @ w, -35, 35)
        p = 1.0 / (1.0 + np.exp(-z))
        g = Xa.T @ (sw * (p - y)) / n + reg @ w
        r = np.maximum(sw * p * (1 - p), 1e-9)
        H = (Xa * r[:, None]).T @ Xa / n + reg
        w -= np.linalg.solve(H, g)
    return w[:d], float(w[d])
