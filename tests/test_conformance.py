"""Conformance vs the reference's own labeled corpora (skipped when the
reference checkout is absent). Floors are set below measured test-F1
(BASELINE.md) with margin; every floor exceeds the corresponding
reference external-matcher log where one exists (walmart textual log:
F1=0.313 at n=2049)."""

import pytest

from entity_matching_datasets_ray.pipelines import conformance as C

pytestmark = pytest.mark.skipif(
    not C.reference_available(), reason="reference checkout not present"
)

FLOORS = {
    "Beer": 0.75,
    "Fodors": 0.90,
    "iTunes": 0.60,
    "Amazon": 0.55,
    "walmart": 0.72,
    "DBLACM": 0.90,
}


@pytest.mark.parametrize("corpus", ["Beer", "Fodors"])
def test_small_corpora_f1(corpus):
    m = C.evaluate_corpus(corpus, num_partitions=4)
    assert m["test_f1"] >= FLOORS[corpus], m


@pytest.mark.parametrize("corpus", ["iTunes", "DBLACM"])
def test_medium_corpora_f1(corpus):
    m = C.evaluate_corpus(corpus, num_partitions=4)
    assert m["test_f1"] >= FLOORS[corpus], m


def test_walmart_beats_reference_matcher_log():
    """The reference's datamodel/test_textual_log.tsv records F1=0.313 on
    n=2049 walmart test pairs; the engine must beat it decisively."""
    m = C.evaluate_corpus("walmart", num_partitions=4)
    assert m["n_test"] == 2049
    assert m["test_f1"] >= FLOORS["walmart"] > 0.313, m


def test_beer_enrich_schema_matches_golden():
    """Structural conformance: our deterministic Beer enrichment produces
    the reference's widened enriched schema
    (DeepMather/Beer/geemazero/train_enriched.csv header)."""
    import pandas as pd
    import ray.data as rd

    from entity_matching_datasets_ray.pipelines.enrich import SPECS, enrich_pairs

    golden_header = pd.read_csv(
        f"{C.REFERENCE_ROOT}/Beer/geemazero/train_enriched.csv", nrows=0
    ).columns.tolist()
    raw = pd.read_csv(f"{C.REFERENCE_ROOT}/Beer/train.csv", dtype=str).head(50)
    out = enrich_pairs(rd.from_pandas(raw), SPECS["beer"]).to_pandas()
    assert set(out.columns) == set(golden_header)


def test_wdc_ditto_text_path_matches_csv_path():
    """Reference E3: consuming the WDC corpora through the Ditto TEXT
    reader (wdc.zip train/test.txt -> read_ditto -> schema inference ->
    wide rows) must reproduce the converted-CSV path's quality."""
    m_txt = C.evaluate_wdc_ditto("cameras", num_partitions=4)
    assert m_txt["n_test"] == 1057
    assert m_txt["test_f1"] >= 0.65, m_txt


def test_computers_beats_reference_finetuned_log():
    """VERDICT r02 #9: computers with the title-spec feature block
    (functions/titles.py) must reach >=0.72; the reference's fine-tuned
    matcher logs 0.751/0.770 (datamodel/test_log_epoch11.tsv) and the
    measured engine F1 is 0.7582 (BASELINE.md)."""
    m = C.evaluate_corpus("computer", num_partitions=4)
    assert m["n_test"] == 1098
    assert m["test_f1"] >= 0.72, m


def test_dblp_acm_raw_two_table_end_to_end():
    """VERDICT r3 item 10: link the two RAW DBLP / ACM tables
    (reconstructed from the pair CSVs, deduped by content hash) end to
    end — blocking recall of the labeled matches must be near-total and
    end-to-end F1 close to the pair-level conformance fit (0.940)."""
    m = C.evaluate_two_table_raw("DBLACM", num_partitions=4)
    assert m["blocking_recall"] >= 0.98, m
    assert m["end_to_end_f1"] >= 0.90, m  # measured 0.931 (pair-level fit: 0.940)
    # sanity: the sides really deduplicated (DBLP ~2.6k, ACM ~2.3k)
    assert 2000 <= m["n_a"] <= 3000 and 2000 <= m["n_b"] <= 3000, m
