"""CLI smoke tests (reuse the session Ray; cli only inits if needed)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from entity_matching_datasets_ray import cli
from entity_matching_datasets_ray.synth import synth_docs_table


def test_convert(tmp_path):
    src = tmp_path / "in.txt"
    src.write_text(
        "COL title VAL dell laptop\tCOL title VAL dell laptop pro\t1\n"
        "COL title VAL hp monitor\tCOL title VAL hp monitor 24\t0\n"
    )
    out = tmp_path / "wide"
    assert cli.main(["convert", str(src), str(out)]) == 0
    t = pq.read_table(str(out))
    assert set(t.column_names) >= {"id", "label", "left_title", "right_title"}


def test_link_and_dedup(tmp_path):
    docs = synth_docs_table(60)
    src = tmp_path / "docs.parquet"
    pq.write_table(docs, src)
    out = tmp_path / "clusters"
    assert cli.main(["link", str(src), str(out), "--partitions", "2"]) == 0
    t = pq.read_table(str(out))
    assert set(t.column_names) == {"doc_id", "entity_id"}

    # dedup over a tiny documents-like table
    dsrc = tmp_path / "texts.parquet"
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": ["same text", "same text", "other"]}),
        dsrc,
    )
    dout = tmp_path / "survivors"
    assert cli.main(["dedup", str(dsrc), str(dout)]) == 0
    s = pq.read_table(str(dout))
    assert sorted(s.column("doc_id").to_pylist()) == [1, 3]


def test_enrich_unknown_spec(tmp_path):
    src = tmp_path / "x.csv"
    src.write_text("id,label\n1,0\n")
    assert cli.main(["enrich", "nope", str(src), str(tmp_path / "o")]) == 2


def test_chunk_and_annotate(tmp_path):
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": ["the quick brown fox jumps over the lazy dog", "hello world"],
        }
    )
    src = tmp_path / "docs.parquet"
    pq.write_table(docs, str(src))
    out1 = tmp_path / "chunks"
    assert cli.main(["chunk", str(src), str(out1), "--chunk-tokens", "4", "--overlap", "1"]) == 0
    t = pq.read_table(str(out1))
    assert set(t.column_names) == {"doc_id", "chunk_index", "chunk_text", "n_chunk_tokens"}
    out2 = tmp_path / "annot"
    assert cli.main(["annotate", str(src), str(out2)]) == 0
    t2 = pq.read_table(str(out2))
    assert "lang_pred" in t2.column_names and "quality_score" in t2.column_names


def test_fuse_cli(tmp_path):
    rows = pa.table(
        {
            "k": pa.array([1, 1, 2], pa.int64()),
            "name": ["bb", "a", "z"],
            "price": [5.0, 2.0, 1.0],
        }
    )
    src = tmp_path / "rows.parquet"
    pq.write_table(rows, str(src))
    out = tmp_path / "golden"
    assert (
        cli.main(
            [
                "fuse", str(src), str(out),
                "--cluster-col", "k",
                "--rule", "top_name:mode:name",
                "--rule", "max_price:max:price",
            ]
        )
        == 0
    )
    t = pq.read_table(str(out)).to_pandas().sort_values("k").reset_index(drop=True)
    assert list(t.columns) == ["k", "n_members", "top_name", "max_price"]
    assert t["max_price"].tolist() == [5.0, 1.0]
