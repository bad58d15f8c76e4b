"""Text-analysis stages over a documents table: language-ID, quality
scoring, token counting, fingerprinting (kernels in functions/text.py).

One stateless vectorized ``map_batches`` each; ``annotate_documents``
fuses them into a single pass (one read, one scan — the hot path never
re-reads the text column)."""

from __future__ import annotations

import pyarrow as pa

from ..functions.text import (
    count_tokens_bpeish,
    count_tokens_ws,
    detect_language,
    document_fingerprint,
    quality_features,
)

QUALITY_KEYS = [
    "q_len",
    "q_mean_word_len",
    "q_punct_ratio",
    "q_stop_ratio",
    "q_alpha_ratio",
    "quality_score",
]


def annotate_documents(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Single-pass annotation: lang_pred, token counts, quality features,
    fingerprint."""

    def annotate(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        langs = [detect_language(s) for s in texts]
        ws = [count_tokens_ws(s) for s in texts]
        bp = [count_tokens_bpeish(s) for s in texts]
        fps = [document_fingerprint(s) for s in texts]
        quals = [quality_features(s) for s in texts]
        out = t.append_column("lang_pred", pa.array(langs, pa.string()))
        out = out.append_column("n_tokens_ws", pa.array(ws, pa.int64()))
        out = out.append_column("n_tokens_bpe", pa.array(bp, pa.int64()))
        out = out.append_column("fingerprint", pa.array(fps, pa.uint64()))
        for k in QUALITY_KEYS:
            out = out.append_column(k, pa.array([q[k] for q in quals], pa.float64()))
        return out

    return ds.map_batches(annotate, batch_format="pyarrow")


def token_counts(ds, id_col: str = "doc_id", text_col: str = "text"):
    """(id, n_tokens_ws, n_tokens_bpe) — whitespace + BPE-ish counts."""

    def count(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_tokens_ws": pa.array([count_tokens_ws(s) for s in texts], pa.int64()),
                "n_tokens_bpe": pa.array([count_tokens_bpeish(s) for s in texts], pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(count, batch_format="pyarrow")


def chunk_documents(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap_tokens: int = 16,
):
    """Split documents into overlapping token-window chunks (the standard
    pretraining-corpus chunker): chunk i covers whitespace tokens
    [i*stride, i*stride + chunk_tokens), stride = chunk - overlap; the
    final partial chunk is kept. Pure flat-map — streams at any scale.

    Output: (id, chunk_index, chunk_text, n_chunk_tokens).
    """
    if overlap_tokens >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk")
    stride = chunk_tokens - overlap_tokens

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        out_id, out_ix, out_txt, out_n = [], [], [], []
        for i, s in zip(ids, texts):
            toks = (s or "").split()
            if not toks:
                continue
            start = 0
            ix = 0
            while start < len(toks):
                piece = toks[start : start + chunk_tokens]
                out_id.append(i)
                out_ix.append(ix)
                out_txt.append(" ".join(piece))
                out_n.append(len(piece))
                if start + chunk_tokens >= len(toks):
                    break
                start += stride
                ix += 1
        return pa.table(
            {
                id_col: pa.array(out_id, type=t.schema.field(id_col).type),
                "chunk_index": pa.array(out_ix, pa.int64()),
                "chunk_text": pa.array(out_txt, pa.string()),
                "n_chunk_tokens": pa.array(out_n, pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(explode, batch_format="pyarrow")


def quality_filter(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    langs: tuple[str, ...] | None = None,
):
    """C4/Gopher-style corpus hygiene filter: keep documents whose quality
    score clears ``min_quality`` (and optionally whose detected language is
    allowed). One fused vectorized pass; emits (id, lang_pred,
    quality_score) for the survivors."""

    def f(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        langs_pred = [detect_language(s) for s in texts]
        quals = [quality_features(s)["quality_score"] for s in texts]
        keep = [
            q >= min_quality and (langs is None or lg in langs)
            for q, lg in zip(quals, langs_pred)
        ]
        out = pa.table(
            {
                id_col: t.column(id_col),
                "lang_pred": pa.array(langs_pred, pa.string()),
                "quality_score": pa.array(quals, pa.float64()),
            }
        )
        return out.filter(pa.array(keep, pa.bool_()))

    return ds.select_columns([id_col, text_col]).map_batches(f, batch_format="pyarrow")


def language_histogram(ds, text_col: str = "text", num_partitions: int | None = None):
    """Detected-language distribution: per-batch partial counts -> tiny
    groupby sum (no full-row shuffle)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for s in t.column(text_col).to_pylist():
            lang = detect_language(s)
            counts[lang] = counts.get(lang, 0) + 1
        return pa.table(
            {
                "lang_pred": pa.array(list(counts.keys()), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    return (
        ds.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang_pred", num_partitions=num_partitions)
        .aggregate(Sum("n", alias_name="n"))
    )


def vocab_topk(ds, text_col: str = "text", k: int = 50, lowercase: bool = True):
    """Distributed heavy hitters: global top-k tokens by occurrence count.

    Three stages, none of which moves the corpus:
    1. per-batch partial counts (pandas explode + value_counts — one row
       per DISTINCT token per batch crosses the shuffle, not one per
       occurrence),
    2. ``groupby(token).sum`` merges partials,
    3. per-block local top-k prunes the merged vocab to <= k rows per
       block (each token lives in exactly one post-groupby block, so
       pruning is lossless), and the surviving <= k x num_blocks rows
       take a tiny final sort + limit.

    Deterministic order: count desc, token asc. Tokens are whitespace-
    split, empty-dropped, optionally lowercased (matches the oracle's
    ``string_split_regex(lower(text), '\\s+')``).
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].dropna().astype(str)
        if lowercase:
            s = s.str.lower()
        toks = s.str.split().explode().dropna()
        vc = toks.value_counts()
        return pd.DataFrame({"token": vc.index.astype(str), "cnt": vc.to_numpy("int64")})

    merged = (
        ds.select_columns([text_col])
        .map_batches(partial_counts, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["cnt", "token"], ascending=[False, True], kind="mergesort").head(k)

    return (
        merged.map_batches(local_topk, batch_format="pandas")
        .sort(["cnt", "token"], descending=[True, False])
        .limit(k)
    )


def flag_contaminated(
    ds,
    benchmark,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 8,
    min_hits: int = 1,
    max_benchmark_shingles: int = 50_000_000,
):
    """Benchmark decontamination: flag corpus documents sharing at least
    ``min_hits`` distinct token ``ngram``-grams with a benchmark set (the
    standard pretraining-hygiene pass — GPT-3-style 8-gram overlap).

    Scale shape: the benchmark side is the SMALL side by construction
    (eval sets are thousands of docs, the corpus is the 100 TB side) —
    its distinct shingle hashes are collected once, guarded by a hard
    count, and broadcast via ``ray.put``; the corpus then streams through
    one vectorized ``map_batches`` membership test (numpy ``isin`` on
    uint64 hashes). No shuffle at all.

    Returns (id, n_contaminated) for flagged docs — distinct doc shingles
    found in the benchmark set, SQL-reproducible (whitespace lowercase
    tokens, space-joined n-grams).
    """
    import numpy as np
    import ray

    from ..functions.hashing import hash64

    def shingle_hashes(text: str) -> set:
        toks = (text or "").lower().split()
        if len(toks) < ngram:
            return set()
        return {hash64(" ".join(toks[i : i + ngram])) for i in range(len(toks) - ngram + 1)}

    bench_hashes: set = set()
    for b in benchmark.select_columns([text_col]).iter_batches(
        batch_size=4096, batch_format="pyarrow"
    ):
        for s in b[text_col].to_pylist():
            bench_hashes.update(shingle_hashes(s))
        if len(bench_hashes) > max_benchmark_shingles:
            raise ValueError(
                f"benchmark shingle set exceeds {max_benchmark_shingles}; "
                "decontamination assumes a small benchmark side"
            )
    bench_arr = np.fromiter(bench_hashes, dtype=np.uint64, count=len(bench_hashes))
    bench_arr.sort()
    bench_ref = ray.put(bench_arr)

    def flag(t: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        out_ids, out_hits = [], []
        for i, s in zip(ids, texts):
            hs = shingle_hashes(s)
            if not hs:
                continue
            arr = np.fromiter(hs, dtype=np.uint64, count=len(hs))
            # sorted-array membership: searchsorted hit check
            pos = np.searchsorted(bench, arr)
            pos = np.clip(pos, 0, len(bench) - 1) if len(bench) else pos
            hits = int((bench[pos] == arr).sum()) if len(bench) else 0
            if hits >= min_hits:
                out_ids.append(i)
                out_hits.append(hits)
        return pa.table(
            {
                id_col: pa.array(out_ids, t.schema.field(id_col).type),
                "n_contaminated": pa.array(out_hits, pa.int64()),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow")


def repetition_signals(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns=(2, 3),
    code_limit: int = 2**62,
):
    """Within-document repetition statistics — the Gopher-rules family of
    pretraining quality signals (Rae et al. 2021 §A1.1: duplicate-n-gram /
    top-n-gram fractions; used by RedPajama/Dolma/FineWeb curation).
    Complements :func:`quality_filter` (length/punct/stopword heuristics)
    with the repetition dimension it lacks.

    Per document and each n in ``ns``, over lowercase whitespace tokens:

    - ``top{n}_cnt``: occurrence count of the most frequent n-gram
      (0 when the doc has fewer than n tokens);
    - ``dup{n}_pos``: number of n-gram positions whose gram occurs >= 2
      times (the duplicated-gram coverage numerator).

    All outputs are INTEGERS (counts, not fractions) so the SQL oracle is
    bit-identical by construction — callers derive the Gopher fractions as
    ``dup{n}_pos / (n_tokens - n + 1)`` with their own float policy.

    Scale shape: map-only (one pass, zero shuffle — a doc's text lives in
    one row, so its gram counts are complete per batch). Vectorized per
    doc: batch-level token factorization, n-gram identity as a base-M
    positional code over int64 (M = distinct tokens in batch + 1; guarded
    against overflow with a string-join fallback), ``np.unique`` counts.
    """
    import numpy as np
    import pandas as pd

    ns = tuple(sorted(ns))

    def signals(df: pd.DataFrame) -> pd.DataFrame:
        token_lists = df[text_col].fillna("").astype(str).str.lower().str.split()
        flat = [t for ts in token_lists for t in ts]
        codes, uniq = pd.factorize(np.asarray(flat, dtype=object)) if flat else (
            np.empty(0, np.int64),
            [],
        )
        M = np.int64(len(uniq) + 1)
        out = {
            id_col: df[id_col].to_numpy(),
            "n_tokens": np.fromiter(
                (len(ts) for ts in token_lists), np.int64, len(token_lists)
            ),
        }
        for n in ns:
            out[f"top{n}_cnt"] = np.zeros(len(df), np.int64)
            out[f"dup{n}_pos"] = np.zeros(len(df), np.int64)
        pos = 0
        for row, ts in enumerate(token_lists):
            T = len(ts)
            c = codes[pos : pos + T].astype(np.int64)
            pos += T
            for n in ns:
                if T < n:
                    continue
                if (len(uniq) + 1) ** n >= code_limit:
                    # positional code would overflow int64: exact fallback
                    grams = np.array(
                        [" ".join(ts[i : i + n]) for i in range(T - n + 1)], object
                    )
                else:
                    grams = np.zeros(T - n + 1, np.int64)
                    for j in range(n):
                        grams = grams * M + c[j : T - n + 1 + j]
                _, cnts = np.unique(grams, return_counts=True)
                out[f"top{n}_cnt"][row] = cnts.max()
                out[f"dup{n}_pos"][row] = cnts[cnts >= 2].sum()
        return pd.DataFrame(out)

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(signals, batch_format="pandas")
        .sort(id_col)
    )


def doc_top_terms(ds, id_col: str = "doc_id", text_col: str = "text", k: int = 3):
    """Characteristic terms per document — a TF-IDF-style ranking in PURE
    integers: top-k terms per doc ordered by (tf desc, df asc, term asc).
    Rarity replaces the idf logarithm as a tie-break, which keeps every
    comparison integer-exact (no float ln whose last ulp could flip a
    rank between engines), so the oracle is bit-identical by construction.

    Scale shape (the one pattern no other text op here uses — a token-
    stream equi-join against a derived statistic table):
      1. explode (doc, term, tf): flat per-batch pandas groupby — a doc's
         text lives in ONE row, so per-batch (doc, term) counts are
         complete; no shuffle.
      2. df table: ``groupby(term).count`` over the already-distinct
         (doc, term) rows — the exploded rows ARE the combiner output.
      3. hash join on term attaches df to the (doc, term, tf) stream.
      4. ``grouped_topk`` per doc (partial top-k semigroup prune, never a
         whole-key pandas group).
    """
    import pandas as pd

    from ..pipelines.relational import grouped_topk

    def explode_tf(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].fillna("").astype(str).str.lower().str.split()
        out = df[[id_col]].copy()
        out["term"] = s
        out = out.explode("term").dropna(subset=["term"])
        g = out.groupby([id_col, "term"], sort=False).size().reset_index(name="tf")
        g["tf"] = g["tf"].astype("int64")
        return g

    from ray.data.aggregate import Count

    # materialize: dt feeds BOTH the df aggregate and the join probe side;
    # without it Ray re-executes the full tokenize/explode pass twice
    # (r5 code-review). The pinned blocks are the (doc, term, tf) summary
    # stream, not the corpus; the object store spills them if needed.
    dt = ds.select_columns([id_col, text_col]).map_batches(
        explode_tf, batch_format="pandas"
    ).materialize()
    df_tbl = dt.groupby("term").aggregate(Count(alias_name="df"))
    joined = dt.join(
        df_tbl, join_type="inner", num_partitions=8, on=("term",), right_on=("term",)
    )
    top = grouped_topk(joined, [id_col], ["tf", "df", "term"], [False, True, True], k)
    return top.sort([id_col, "tf", "df", "term"], descending=[False, True, False, False])


def phonetic_histogram(ds, text_col: str = "text", num_partitions: int | None = None):
    """Distribution of Soundex phonetic keys over each document's FIRST
    token — the classic record-linkage blocking-key profile (how big would
    phonetic blocks be?). Uses :func:`..functions.normalizers.soundex`
    (simplified American Soundex, exactly SQL-expressible).

    Scale shape = :func:`language_histogram`'s: per-batch partial counts
    with a distinct-token soundex memo (one row per distinct code per
    batch crosses the shuffle), ``groupby(code).sum``, tiny sort.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from ..functions.normalizers import soundex

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].fillna("").astype(str).str.split().str[0].dropna()
        if not len(toks):
            return pd.DataFrame({"code": pd.Series([], dtype=str), "cnt": pd.Series([], dtype="int64")})
        memo: dict[str, str] = {}
        codes = toks.map(lambda t: memo.get(t) or memo.setdefault(t, soundex(t)))
        vc = codes.value_counts()
        return pd.DataFrame({"code": vc.index.astype(str), "cnt": vc.to_numpy("int64")})

    return (
        ds.select_columns([text_col])
        .map_batches(partial, batch_format="pandas")
        .groupby("code", num_partitions=num_partitions)
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort("code")
    )
