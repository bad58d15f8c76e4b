"""The flagship record-linkage pipeline: docs -> entity clusters.

Composition (SURVEY.md §3 "Our engine's lifecycle"):

    read docs (doc_id, spans)
      -> extract+normalize      map_batches, zero-copy Arrow
      -> blocking (SNM + LSH + exact keys)   groupby shuffles, capped blocks
      -> exact pair dedup       groupby on (left_id, right_id)
      -> feature scoring        actor pool (IDF broadcast; side features
                                via broadcast lookup or partitioned hash join)
      -> threshold filter -> matched edges
      -> connected components   iterative groupby-min
      -> canonical election     min doc_id per component (+ singletons)

No stage materializes the full input; the only driver-side data are the
IDF dict (bounded vocab) and per-round CC checksums.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import ray

from ..stages.blocking import candidate_pairs_auto
from ..stages.clustering import attach_singletons, connected_components
from ..stages.extract import extract_stage
from ..stages.scoring import fit_idf, score_pairs


@dataclass
class LinkageConfig:
    window: int = 10                  # SNM sliding window
    num_perm: int = 32                # MinHash permutations
    num_bands: int = 8                # LSH bands (rows = num_perm // bands)
    seed: int = 42
    threshold: float = 0.7            # match-score cutoff (calibrated: P~0.99 R~0.997 at 20k entities)
    num_partitions: int = 32          # shuffle/join partitioning
    num_buckets: int | None = None    # two-level-grouping fan-out (default 8x partitions)
    scorer_concurrency: int | tuple = (1, 8)
    scorer_batch_size: int = 2048
    max_vocab: int = 1_000_000
    weights: dict | None = None
    join_strategy: str = "auto"       # broadcast (small entity table) | shuffle (at scale)
    exact_keys: tuple = (("norm_brand", "modelno"), ("phone_norm",), ("skeleton_key",))
    checkpoint_root: str | None = None  # per-partition lineage checkpoint dir (resume)
    blocking_path: str = "auto"       # fused (1 shuffle) | multi (per-pass) | auto by CPU count
    snm_strategy: str = "bucket"      # bucket (first-token) | global (true sorted-neighborhood)
    # evidence pre-rank: LSH-only pairs need >= this many band collisions
    # to reach the scorer (1 = off); drops are metered in `pruned`.
    # Default 2: -43% candidates / -30% scoring wall on the synth corpus
    # for a 0.0017 F1 cost (0.9977 -> 0.9960, still >= the 0.99 gate)
    min_lsh_collisions: int = 2


def run_linkage(
    docs,
    config: LinkageConfig | None = None,
    return_intermediates: bool = False,
    timings: dict | None = None,
):
    """docs Dataset -> clusters Dataset (doc_id, entity_id).

    With ``return_intermediates`` also returns the entity table and scored
    pairs (tests / metrics). Passing a ``timings`` dict materializes each
    phase and records its wall seconds + row counts (benchmark use; adds
    barriers, so leave it None in production runs)."""
    import time as _time

    cfg = config or LinkageConfig()
    t0 = _time.time()

    entities = extract_stage(docs)
    # The entity table is consumed by several downstream stages (blocking
    # passes, both scorer joins, singleton attach); materialize once so the
    # extract work isn't re-executed per consumer. It is ids+features only.
    entities = entities.drop_columns(["spans"]).materialize()
    n_docs = entities.count()

    idf = fit_idf(entities, max_vocab=cfg.max_vocab)
    idf_ref = ray.put(idf)

    if timings is not None:
        timings["prep_sec"] = round(_time.time() - t0, 2)
        t0 = _time.time()

    pairs = candidate_pairs_auto(
        entities,
        path=cfg.blocking_path,
        snm_strategy=cfg.snm_strategy,
        window=cfg.window,
        num_perm=cfg.num_perm,
        num_bands=cfg.num_bands,
        seed=cfg.seed,
        num_partitions=cfg.num_partitions,
        num_buckets=cfg.num_buckets or 8 * cfg.num_partitions,
        exact_keys=cfg.exact_keys,
        min_lsh_collisions=cfg.min_lsh_collisions,
    )
    if timings is not None:
        pairs = pairs.materialize()
        timings["blocking_sec"] = round(_time.time() - t0, 2)
        timings["n_candidates"] = pairs.count()
        t0 = _time.time()

    if cfg.checkpoint_root:
        # Resumable path: the expensive scoring stage runs under
        # per-partition lineage checkpointing (state/lineage.py) — a rerun
        # after a crash redoes only partitions whose manifest entry is
        # missing or whose input fingerprint changed (north rule:
        # checkpoint per-partition lineage + counters, BASELINE.json:14).
        scored = _score_checkpointed(pairs, entities, idf, n_docs, cfg)
    else:
        scored = score_pairs(
            pairs,
            entities,
            idf_ref,
            n_docs=n_docs,
            weights=cfg.weights,
            num_partitions=cfg.num_partitions,
            concurrency=cfg.scorer_concurrency,
            batch_size=cfg.scorer_batch_size,
            join_strategy=cfg.join_strategy,
        )

    if return_intermediates:
        # callers will consume `scored` again; pin it so the expensive
        # blocking+scoring chain executes exactly once.
        scored = scored.materialize()

    # The matched-edge table is tiny relative to the candidate stream and is
    # consumed repeatedly by the CC rounds — materialize it so the whole
    # scoring pipeline is executed exactly once. (At larger-than-memory edge
    # scale this would be a write_parquet + re-read checkpoint instead; see
    # state/lineage.py.)
    edges = (
        scored.filter(expr=f"score >= {cfg.threshold}")
        .select_columns(["left_id", "right_id"])
        .materialize()
    )
    if timings is not None:
        timings["scoring_sec"] = round(_time.time() - t0, 2)
        timings["n_edges"] = edges.count()
        t0 = _time.time()
    labels = connected_components(edges, num_partitions=cfg.num_partitions)
    # clusters is two string columns per doc and is consumed multiple times
    # by evaluation joins; pin it too.
    clusters = attach_singletons(labels, entities, num_partitions=cfg.num_partitions).materialize()
    if timings is not None:
        timings["clustering_sec"] = round(_time.time() - t0, 2)

    if return_intermediates:
        return clusters, entities, scored
    return clusters


def run_linkage_incremental(
    existing_clusters,
    old_docs,
    new_docs,
    config: LinkageConfig | None = None,
    timings: dict | None = None,
):
    """Incremental cluster maintenance: fold a delta of NEW documents into
    existing clusters without re-scoring the old corpus against itself.

    Streaming-ingest semantics the reference's batch scripts lack (and a
    100 TB pipeline needs): blocking runs over the tagged union but emits
    only pairs touching a new doc (``candidate_pairs(..., delta=True)`` —
    O(delta x block) instead of O(n^2)); only those pairs are scored; the
    existing clusters enter connected components as label edges
    (doc_id -> entity_id), so transitivity with the old components is
    preserved and the canonical min-id election stays consistent with a
    full recompute.

    IDF-drift caveat: IDF is refit over the union, which also shifts
    old-x-old pair scores — but old-x-old pairs are never rescored, so
    full-recompute equivalence holds only when no old-x-old score crosses
    the threshold under the refit IDF. In the steady-state regime this
    pipeline targets (delta << corpus) the drift per fold is O(|delta|/n)
    and the equivalence test in tests/test_pipeline_e2e.py holds; for
    adversarial deltas, pin the IDF (pass the previous fold's dict) or
    periodically run a full recompute.
    """
    import time as _time

    import pyarrow as _pa
    import pyarrow.compute as _pc

    cfg = config or LinkageConfig()
    t0 = _time.time()

    def tag(ds, flag: int):
        return ds.map_batches(
            lambda t, flag=flag: t.append_column(
                "is_new", _pa.array([flag] * t.num_rows, _pa.int8())
            ),
            batch_format="pyarrow",
        )

    old_e = tag(extract_stage(old_docs).drop_columns(["spans"]), 0)
    new_e = tag(extract_stage(new_docs).drop_columns(["spans"]), 1)
    entities = old_e.union(new_e).materialize()
    n_docs = entities.count()
    # IDF is refit over the union so delta scores match a full recompute;
    # at scale this is the same partial-agg token pass as the full run.
    idf = fit_idf(entities, max_vocab=cfg.max_vocab)
    idf_ref = ray.put(idf)
    if timings is not None:
        timings["prep_sec"] = round(_time.time() - t0, 2)
        t0 = _time.time()

    from ..stages.blocking import candidate_pairs as _fused_pairs

    pairs = _fused_pairs(
        entities,
        window=cfg.window,
        num_perm=cfg.num_perm,
        num_bands=cfg.num_bands,
        seed=cfg.seed,
        num_partitions=cfg.num_partitions,
        num_buckets=cfg.num_buckets or 8 * cfg.num_partitions,
        exact_keys=cfg.exact_keys,
        delta=True,
        min_lsh_collisions=cfg.min_lsh_collisions,
    )
    if timings is not None:
        pairs = pairs.materialize()
        timings["blocking_sec"] = round(_time.time() - t0, 2)
        timings["n_delta_candidates"] = pairs.count()
        t0 = _time.time()

    scored = score_pairs(
        pairs,
        entities,
        idf_ref,
        n_docs=n_docs,
        weights=cfg.weights,
        num_partitions=cfg.num_partitions,
        concurrency=cfg.scorer_concurrency,
        batch_size=cfg.scorer_batch_size,
        join_strategy=cfg.join_strategy,
    )
    new_edges = (
        scored.filter(expr=f"score >= {cfg.threshold}")
        .select_columns(["left_id", "right_id"])
    )
    # existing clusters -> label edges (doc -> its canonical id)
    label_edges = existing_clusters.map_batches(
        lambda t: _pa.table(
            {"left_id": t.column("doc_id"), "right_id": t.column("entity_id")}
        ).filter(_pc.not_equal(t.column("doc_id"), t.column("entity_id"))),
        batch_format="pyarrow",
    )
    edges = new_edges.union(label_edges).materialize()
    if timings is not None:
        timings["scoring_sec"] = round(_time.time() - t0, 2)
        timings["n_edges"] = edges.count()
        t0 = _time.time()

    labels = connected_components(edges, num_partitions=cfg.num_partitions)
    clusters = attach_singletons(labels, entities, num_partitions=cfg.num_partitions).materialize()
    if timings is not None:
        timings["clustering_sec"] = round(_time.time() - t0, 2)
    return clusters


def _score_checkpointed(pairs, entities, idf: dict, n_docs: int, cfg: LinkageConfig):
    """Score candidate pairs under per-partition lineage checkpointing.

    Side features travel inside the partition function (broadcast dict) so
    each partition is scored independently of any live Dataset — exactly
    what makes the partition replayable on resume.
    """
    import pandas as pd

    from ..stages.scoring import BroadcastPairScorer, broadcast_features
    from ..state.lineage import run_stage

    fdf = broadcast_features(entities)
    weights = cfg.weights

    threshold = cfg.threshold

    def score_partition(table):
        import pyarrow as pa

        scorer = BroadcastPairScorer(fdf, idf, n_docs, weights)
        batch = table.select(["left_id", "right_id"]).to_pandas()
        out = scorer(batch) if len(batch) else pd.DataFrame(
            {"left_id": pd.Series(dtype=str), "right_id": pd.Series(dtype=str)}
        )
        counters = {
            "pairs_scored": int(len(out)),
            "matches": int((out["score"] >= threshold).sum()) if len(out) else 0,
        }
        return pa.Table.from_pandas(out, preserve_index=False), counters

    scored, _report = run_stage(
        pairs.select_columns(["left_id", "right_id"]),
        cfg.checkpoint_root,
        "score_pairs",
        score_partition,
        num_partitions=cfg.num_partitions,
        key_columns=["left_id"],
    )
    return scored


def run_linkage_two_table(
    docs_a,
    docs_b,
    config: LinkageConfig | None = None,
    one_to_one: bool = False,
    timings: dict | None = None,
):
    """A x B record linkage — the reference's actual task shape (match
    table A against table B: DBLP vs ACM, Amazon vs Google, ...). The
    reference consumes PRE-BLOCKED pair CSVs (DeepMather/*/train.csv
    carries left_*/right_* of already-paired rows); here blocking is part
    of the engine, so a user brings two raw tables.

    Returns matched pairs ``(a_id, b_id, score)``.

    Scale design: ids are namespaced ``a|`` / ``b|`` (two sources may
    collide on raw ids), sides union into one entity table, and blocking
    REUSES the delta-emission machinery with ``is_new = (side == B)``
    in ``cross_only`` mode: ONLY A x B pairs are emitted at the source —
    neither A x A nor B x B ever enters the pair shuffle (with |B| ~ |A|
    the old post-shuffle B x B filter wasted up to ~half the shuffled
    pair volume). Because pair emission orders ids and ``'a|' < 'b|'``,
    a cross pair is exactly (left LIKE 'a|%', right LIKE 'b|%') — now
    asserted per batch rather than filtered.

    ``one_to_one=True`` keeps only MUTUAL best matches (the standard ER
    symmetric-best heuristic): best-per-A and best-per-B tables (ties ->
    higher score, then smaller partner id) are computed with two tiny
    grouped reductions and intersected via a count-2 groupby — no driver
    materialization. The result carries (a_id, b_id, score): both sides
    hold the same score for a pair, so a Max aggregate passes it through
    the intersection.
    """
    import pyarrow as _pa
    import pyarrow.compute as _pc

    cfg = config or LinkageConfig()

    def prefix(ds, p: str):
        def add(t: _pa.Table) -> _pa.Table:
            ids = _pc.cast(t.column("doc_id"), _pa.string())
            return t.set_column(
                t.schema.get_field_index("doc_id"),
                "doc_id",
                _pc.binary_join_element_wise(_pa.scalar(p), ids, ""),
            )

        return ds.map_batches(add, batch_format="pyarrow")

    def tag(ds, flag: int):
        return ds.map_batches(
            lambda t, flag=flag: t.append_column(
                "is_new", _pa.array([flag] * t.num_rows, _pa.int8())
            ),
            batch_format="pyarrow",
        )

    a_e = tag(extract_stage(prefix(docs_a, "a|")).drop_columns(["spans"]), 0)
    b_e = tag(extract_stage(prefix(docs_b, "b|")).drop_columns(["spans"]), 1)
    entities = a_e.union(b_e).materialize()
    n_docs = entities.count()
    idf = fit_idf(entities, max_vocab=cfg.max_vocab)
    idf_ref = ray.put(idf)

    from ..stages.blocking import candidate_pairs as _fused_pairs

    pairs = _fused_pairs(
        entities,
        window=cfg.window,
        num_perm=cfg.num_perm,
        num_bands=cfg.num_bands,
        seed=cfg.seed,
        num_partitions=cfg.num_partitions,
        num_buckets=cfg.num_buckets or 8 * cfg.num_partitions,
        exact_keys=cfg.exact_keys,
        delta=True,
        cross_only=True,
        min_lsh_collisions=cfg.min_lsh_collisions,
    )

    def assert_cross(t: _pa.Table) -> _pa.Table:
        # cross_only emission guarantees this; cheap per-batch invariant
        # check instead of the old (wasteful) post-shuffle filter
        if t.num_rows:
            ok = _pc.and_(
                _pc.starts_with(t.column("left_id"), "a|"),
                _pc.starts_with(t.column("right_id"), "b|"),
            )
            if not _pc.all(ok).as_py():
                raise AssertionError(
                    "cross_only blocking emitted a non-cross pair"
                )
        return t

    pairs = pairs.map_batches(assert_cross, batch_format="pyarrow")

    scored = score_pairs(
        pairs,
        entities,
        idf_ref,
        n_docs=n_docs,
        weights=cfg.weights,
        num_partitions=cfg.num_partitions,
        concurrency=cfg.scorer_concurrency,
        batch_size=cfg.scorer_batch_size,
        join_strategy=cfg.join_strategy,
    )

    def strip(t: _pa.Table) -> _pa.Table:
        return _pa.table(
            {
                "a_id": _pc.utf8_slice_codeunits(t.column("left_id"), 2, 2**30),
                "b_id": _pc.utf8_slice_codeunits(t.column("right_id"), 2, 2**30),
                "score": t.column("score"),
            }
        )

    matches = scored.filter(expr=f"score >= {cfg.threshold}").map_batches(
        strip, batch_format="pyarrow"
    )
    if not one_to_one:
        return matches

    matches = matches.materialize()

    def best_per(key: str):
        import numpy as np
        import pandas as pd

        other = "b_id" if key == "a_id" else "a_id"

        def bucket_of(df: pd.DataFrame) -> pd.DataFrame:
            from ..functions.hashing import pandas_bucket

            df = df.copy()
            df["__bucket"] = pandas_bucket(df[key], 64)
            return df

        def pick(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values([key, "score", other], ascending=[True, False, True],
                                kind="mergesort")
            return df.drop_duplicates(key)[["a_id", "b_id", "score"]]

        return (
            matches.map_batches(bucket_of, batch_format="pandas")
            .groupby("__bucket")
            .map_groups(pick, batch_format="pandas")
        )

    # both sides carry the SAME score for the same pair, so Max is a
    # passthrough — the score survives the mutual-best intersection
    # (the r3 one_to_one dropped it; documented limitation now gone)
    from ray.data.aggregate import Count as _Count, Max as _Max

    both = best_per("a_id").union(best_per("b_id"))
    counted = both.groupby(["a_id", "b_id"]).aggregate(
        _Count(alias_name="__sides"), _Max("score", alias_name="score")
    )

    def mutual_only(t: _pa.Table) -> _pa.Table:
        keep = _pc.equal(t.column("__sides"), _pa.scalar(2, t.column("__sides").type))
        return t.filter(keep).select(["a_id", "b_id", "score"])

    return counted.map_batches(mutual_only, batch_format="pyarrow")
