"""Ditto reader/converter/writer tests (reference pipeline E1 semantics)."""

import pyarrow as pa
import pytest
import ray.data as rd

from entity_matching_datasets_ray.sources import ditto as D

LINES = [
    "COL title VAL dell laptop COL price VAL 9.99\tCOL title VAL dell laptop pro\t1",
    # multi-tab separator tolerated
    "COL title VAL hp monitor\t\tCOL title VAL hp monitor 24in COL brand VAL hp\t0",
    # value containing the literal token COL
    "COL title VAL best COL ever\tCOL title VAL best col ever\t1",
    "",  # blank -> skipped silently
    "only two\tfields",  # malformed -> dropped+counted
    "COL title VAL x\tCOL title VAL y\tnot_an_int",  # bad label -> dropped
]


@pytest.fixture()
def raw_ds(tmp_path):
    p = tmp_path / "pairs.txt"
    p.write_text("\n".join(LINES))
    return D.read_ditto(str(p), override_num_blocks=1)


def test_reader_parses_and_drops(raw_ds):
    df = raw_ds.to_pandas()
    assert len(df) == 3
    assert set(df.label) == {0, 1}
    assert df.dropped.iloc[0] == 2  # two malformed lines counted


def test_schema_inference(raw_ds):
    fields = D.infer_fields(raw_ds)
    assert fields == ["brand", "price", "title"]
    assert D.order_fields(fields, ["title"]) == ["title", "brand", "price"]


def test_wide_rows(raw_ds):
    fields = D.order_fields(D.infer_fields(raw_ds), ["title"])
    wide = D.to_wide_rows(raw_ds, fields).to_pandas()
    assert list(wide.columns) == [
        "id", "label", "left_title", "right_title",
        "left_brand", "right_brand", "left_price", "right_price",
    ]
    row = wide[wide.left_title == "best COL ever"].iloc[0]
    assert row.right_title == "best col ever"
    assert row.left_price == ""  # ""-fill for absent fields (dcm.py:82-87)
    # ids are content hashes: deterministic, unique
    assert wide.id.nunique() == 3


def test_ditto_roundtrip(raw_ds):
    fields = D.order_fields(D.infer_fields(raw_ds), ["title"])
    wide = D.to_wide_rows(raw_ds, fields)
    lines = D.write_ditto_lines(wide, fields).to_pandas()["line"]
    reparsed = rd.from_arrow(
        pa.table({"text": pa.array(list(lines), pa.string())})
    ).map_batches(D.parse_ditto_lines, batch_format="pyarrow").to_pandas()
    assert len(reparsed) == 3
    assert reparsed.dropped.sum() == 0


def test_eval_log_reader(tmp_path):
    p = tmp_path / "log.tsv"
    p.write_text(
        "gold\tpred\tresult\tprobability\ttext_left\ttext_right\n"
        "1\t1\tTP\t0.9\ta\tb\n"
        "0\t1\tFP\t0.8\tc\td\n"
    )
    df = D.read_eval_log(str(p)).to_pandas()
    assert list(df.columns) == ["gold", "pred", "result", "probability", "text_left", "text_right"]
    assert len(df) == 2


def test_docs_io_parquet_roundtrip(tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from entity_matching_datasets_ray.sources.docs_io import read_docs, write_docs
    from entity_matching_datasets_ray.synth import synth_docs_table

    tbl = synth_docs_table(20)
    out = str(tmp_path / "docs")
    write_docs(rd.from_arrow(tbl), out)
    back = read_docs(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    orig = tbl.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(back["doc_id"]) == list(orig["doc_id"])
    # span sequence (kind, text, media_ref, offset) survives the round trip
    assert back["spans"].map(len).tolist() == orig["spans"].map(len).tolist()
    for bs, os_ in zip(back["spans"], orig["spans"]):
        for b, o in zip(bs, os_):
            assert (b["kind"], b["text"], b["media_ref"], b["offset"]) == (
                o["kind"], o["text"], o["media_ref"], o["offset"]
            )


def test_docs_io_lance_gate():
    import pytest

    from entity_matching_datasets_ray.sources.docs_io import read_docs

    with pytest.raises(ImportError, match="lance"):
        read_docs("/tmp/nonexistent.lance")
