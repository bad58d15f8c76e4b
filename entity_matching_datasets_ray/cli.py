"""Command-line entry points — the engine-side equivalents of the
reference's per-script CLIs (``python walmart.py``, ``python prompt.py``:
/root/reference/Converters/computers/walmart.py:106-115,
/root/reference/DeepMather/Amazon/prompt.py:247-261).

Usage (this script OWNS its Ray session):

    python -m entity_matching_datasets_ray.cli convert IN.txt OUT_DIR
    python -m entity_matching_datasets_ray.cli enrich SPEC IN.csv OUT_DIR
    python -m entity_matching_datasets_ray.cli link DOCS_PARQUET OUT_DIR \\
        [--threshold 0.7] [--checkpoint DIR]
    python -m entity_matching_datasets_ray.cli dedup IN_PARQUET OUT_DIR \\
        [--method exact|minhash]

Outputs are partitioned Parquet directories (resumable layout).
"""

from __future__ import annotations

import argparse
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _write_counted(ds, path: str) -> int:
    """STREAMING write, then a metadata-only row count of what was
    written. ``count()`` on the lazy Dataset would re-execute the whole
    pipeline (ADVICE r3); materializing first would pin a possibly
    larger-than-memory output in the object store. Parquet footers carry
    the row counts for free — but only the files THIS write produced are
    counted (a pre-existing output dir would otherwise inflate the count
    with stale files, ADVICE r4)."""
    import os

    import pyarrow.dataset as pads

    before = set()
    if os.path.isdir(path):
        for root, _, files in os.walk(path):
            before.update(os.path.join(root, f) for f in files if f.endswith(".parquet"))
    ds.write_parquet(path)
    after = []
    for root, _, files in os.walk(path):
        after.extend(os.path.join(root, f) for f in files if f.endswith(".parquet"))
    new = [f for f in after if f not in before]
    if not new:
        return 0
    return pads.dataset(new, format="parquet").count_rows()


def cmd_convert(args) -> int:
    from .sources.ditto import convert_ditto_to_wide

    wide, fields = convert_ditto_to_wide(args.input)
    n_out = _write_counted(wide, args.output)
    print(f"fields: {fields}")
    print(f"rows: {n_out} -> {args.output}")
    return 0


def cmd_enrich(args) -> int:
    from .pipelines.enrich import SPECS, enrich_pairs
    from .sources.ditto import read_pair_csv

    if args.spec not in SPECS:
        print(f"unknown spec {args.spec!r}; have {sorted(SPECS)}", file=sys.stderr)
        return 2
    out = enrich_pairs(read_pair_csv(args.input), SPECS[args.spec])
    n_out = _write_counted(out, args.output)
    print(f"rows: {n_out} -> {args.output}")
    return 0


def cmd_link(args) -> int:
    import ray.data as rd

    from .pipelines.linkage import LinkageConfig, run_linkage

    docs = rd.read_parquet(args.input)
    cfg = LinkageConfig(
        threshold=args.threshold,
        num_partitions=args.partitions,
        checkpoint_root=args.checkpoint,
    )
    clusters = run_linkage(docs, cfg)
    n_out = _write_counted(clusters, args.output)
    print(f"clusters: {n_out} rows -> {args.output}")
    return 0


def cmd_dedup(args) -> int:
    import ray.data as rd

    from .stages.dedup import exact_dedup, minhash_dedup

    ds = rd.read_parquet(args.input, columns=[args.id_col, args.text_col])
    if args.method == "exact":
        out = exact_dedup(ds, id_col=args.id_col, text_col=args.text_col)
    else:
        out = minhash_dedup(
            ds, id_col=args.id_col, text_col=args.text_col, threshold=args.threshold
        )
    n_out = _write_counted(out, args.output)
    print(f"survivors: {n_out} -> {args.output}")
    return 0


def cmd_annotate(args) -> int:
    import ray.data as rd

    from .stages.text_analysis import annotate_documents

    ds = rd.read_parquet(args.input, columns=[args.id_col, args.text_col])
    out = annotate_documents(ds, id_col=args.id_col, text_col=args.text_col)
    n_out = _write_counted(out, args.output)
    print(f"annotated: {n_out} -> {args.output}")
    return 0


def cmd_chunk(args) -> int:
    import ray.data as rd

    from .stages.text_analysis import chunk_documents

    ds = rd.read_parquet(args.input, columns=[args.id_col, args.text_col])
    out = chunk_documents(
        ds, id_col=args.id_col, text_col=args.text_col,
        chunk_tokens=args.chunk_tokens, overlap_tokens=args.overlap,
    )
    n_out = _write_counted(out, args.output)
    print(f"chunks: {n_out} -> {args.output}")
    return 0


def cmd_link_delta(args) -> int:
    """Fold a delta of new docs into existing clusters (incremental)."""
    import ray.data as rd

    from .pipelines.linkage import LinkageConfig, run_linkage_incremental

    clusters = rd.read_parquet(args.clusters)
    old_docs = rd.read_parquet(args.old_docs)
    new_docs = rd.read_parquet(args.new_docs)
    cfg = LinkageConfig(threshold=args.threshold, num_partitions=args.partitions)
    merged = run_linkage_incremental(clusters, old_docs, new_docs, cfg)
    n_out = _write_counted(merged, args.output)
    print(f"clusters after delta: {n_out} rows -> {args.output}")
    return 0


def cmd_ann(args) -> int:
    import numpy as np
    import ray.data as rd

    from .stages.ann import brute_force_topk, ivf_topk, lsh_topk

    ds = rd.read_parquet(args.input, columns=[args.id_col, args.vec_col])
    q = ds.sort(args.id_col).limit(args.n_queries).to_pandas()
    fn = {"brute": brute_force_topk, "lsh": lsh_topk, "ivf": ivf_topk}[args.method]
    out = fn(
        ds, q[args.id_col].tolist(), np.stack(q[args.vec_col].to_numpy()),
        k=args.k, id_col=args.id_col, vec_col=args.vec_col,
    )
    n_out = _write_counted(out, args.output)
    print(f"matches: {n_out} -> {args.output}")
    return 0


def cmd_link2(args) -> int:
    import ray.data as rd

    from .pipelines.linkage import LinkageConfig, run_linkage_two_table

    a = rd.read_parquet(args.table_a)
    b = rd.read_parquet(args.table_b)
    cfg = LinkageConfig(threshold=args.threshold, num_partitions=args.partitions)
    out = run_linkage_two_table(a, b, cfg, one_to_one=args.one_to_one)
    n_out = _write_counted(out, args.output)
    print(f"matches: {n_out} -> {args.output}")
    return 0


def cmd_fuse(args) -> int:
    import ray.data as rd

    from .stages.fusion import fuse_records

    ds = rd.read_parquet(args.input)
    rules = []
    for spec in args.rule:
        parts = spec.split(":")
        if len(parts) not in (3, 4):
            raise SystemExit(f"--rule must be out:rule:col[:order_col], got {spec!r}")
        rules.append(tuple(parts))
    out = fuse_records(ds, args.cluster_col, rules)
    n_out = _write_counted(out, args.output)
    print(f"golden records: {n_out} -> {args.output}")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="entity_matching_datasets_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("convert", help="Ditto text -> DeepMatcher wide parquet")
    c.add_argument("input")
    c.add_argument("output")
    c.set_defaults(fn=cmd_convert)

    e = sub.add_parser("enrich", help="normalize a wide pair CSV with a DatasetSpec")
    e.add_argument("spec")
    e.add_argument("input")
    e.add_argument("output")
    e.set_defaults(fn=cmd_enrich)

    l = sub.add_parser("link", help="spans docs parquet -> entity clusters")
    l.add_argument("input")
    l.add_argument("output")
    l.add_argument("--threshold", type=float, default=0.7)
    l.add_argument("--partitions", type=int, default=16)
    l.add_argument("--checkpoint", default=None)
    l.set_defaults(fn=cmd_link)

    d = sub.add_parser("dedup", help="document dedup -> survivor ids parquet")
    d.add_argument("input")
    d.add_argument("output")
    d.add_argument("--method", choices=["exact", "minhash"], default="exact")
    d.add_argument("--id-col", default="doc_id")
    d.add_argument("--text-col", default="text")
    d.add_argument("--threshold", type=float, default=0.8)
    d.set_defaults(fn=cmd_dedup)

    a = sub.add_parser("annotate", help="langid/quality/tokens/fingerprint per doc")
    a.add_argument("input")
    a.add_argument("output")
    a.add_argument("--id-col", default="doc_id")
    a.add_argument("--text-col", default="text")
    a.set_defaults(fn=cmd_annotate)

    ch = sub.add_parser("chunk", help="overlapping token-window chunks")
    ch.add_argument("input")
    ch.add_argument("output")
    ch.add_argument("--id-col", default="doc_id")
    ch.add_argument("--text-col", default="text")
    ch.add_argument("--chunk-tokens", type=int, default=512)
    ch.add_argument("--overlap", type=int, default=64)
    ch.set_defaults(fn=cmd_chunk)

    ld = sub.add_parser("link-delta", help="fold new docs into existing clusters")
    ld.add_argument("clusters")
    ld.add_argument("old_docs")
    ld.add_argument("new_docs")
    ld.add_argument("output")
    ld.add_argument("--threshold", type=float, default=0.7)
    ld.add_argument("--partitions", type=int, default=16)
    ld.set_defaults(fn=cmd_link_delta)

    an = sub.add_parser("ann", help="top-k similarity search over embeddings")
    an.add_argument("input")
    an.add_argument("output")
    an.add_argument("--method", choices=["brute", "lsh", "ivf"], default="brute")
    an.add_argument("--id-col", default="vec_id")
    an.add_argument("--vec-col", default="embedding")
    an.add_argument("--k", type=int, default=10)
    an.add_argument("--n-queries", type=int, default=5)
    an.set_defaults(fn=cmd_ann)

    l2 = sub.add_parser("link2", help="two-table A x B matching -> (a_id, b_id[, score])")
    l2.add_argument("table_a")
    l2.add_argument("table_b")
    l2.add_argument("output")
    l2.add_argument("--threshold", type=float, default=0.7)
    l2.add_argument("--partitions", type=int, default=16)
    l2.add_argument("--one-to-one", action="store_true", help="mutual best match only")
    l2.set_defaults(fn=cmd_link2)

    fu = sub.add_parser("fuse", help="clustered rows -> one golden record per cluster")
    fu.add_argument("input")
    fu.add_argument("output")
    fu.add_argument("--cluster-col", required=True)
    fu.add_argument(
        "--rule", action="append", required=True,
        help="out:rule:col[:order_col] (rule: mode|longest|min|max|sum|count_distinct|min_by|max_by); repeatable",
    )
    fu.set_defaults(fn=cmd_fuse)

    args = p.parse_args(argv)
    _init_ray(args.num_cpus)
    try:
        return args.fn(args)
    finally:
        import ray

        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
