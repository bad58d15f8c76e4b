"""Enrichment-pipeline tests: per-spec normalization semantics
(reference E2, deterministic replacements for the prompt rules)."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from entity_matching_datasets_ray.pipelines.enrich import SPECS, enrich_pairs, normalize_record


def test_registry_covers_reference_families():
    assert set(SPECS) == {"amazon", "walmart", "dblp_acm", "fodors", "beer", "itunes", "wdc"}


def test_beer_schema_widening_and_coercions():
    spec = SPECS["beer"]
    rec = normalize_record(
        {
            "beer_name": "hop  hop storm IPA",
            "brew_factory_name": "red brick brewing",
            "style": "American Amber / Red Ale",
            "abv": "8.10 %",
        },
        spec,
    )
    assert list(rec) == list(spec.expected_keys)  # 9 widened fields
    assert rec["name"] == "Hop Storm IPA"  # dedupe adjacent + title case
    assert rec["abv"] == 8.1
    assert rec["primary_style"] == "American Amber"
    assert rec["secondary_style"] == "Red Ale"
    assert rec["is_amber"] is True and rec["is_ale"] is True
    assert rec["is_lager"] is False


def test_itunes_formats():
    rec = normalize_record(
        {
            "song_name": "midnight  river",
            "artist_name": "erin kim",
            "album_name": "silver jazz",
            "genre": "jazz",
            "price": "$ 1.29",
            "copyright": "2015 label",
            "time": "3:5",
            "released": "18-May-15",
        },
        SPECS["itunes"],
    )
    assert rec["price"] == "USD 1.29"
    assert rec["time"] == "03:05"
    assert rec["released"] == "2015-05-18"
    assert rec["song"] == "Midnight River"


def test_fodors_phone_and_city():
    rec = normalize_record(
        {
            "name": "chen's `cafe'",
            "addr": "12 main st.",
            "city": "la",
            "phone": "404/351 -9533",
            "category": "chinese",
            "class": "5",
        },
        SPECS["fodors"],
    )
    assert rec["phone"] == "404-351-9533"
    assert rec["city"] == "los angeles"
    assert rec["addr"] == "12 main street"


def test_dblp_venue_year():
    rec = normalize_record(
        {
            "title": "query  query optimization",
            "authors": "a smith, b jones",
            "venue": "VLDB J.",
            "year": "pub. 1997 ed.",
        },
        SPECS["dblp_acm"],
    )
    assert rec["venue"] == "Vldb Journal"
    assert rec["year"] == "1997"
    assert rec["title"] == "Query Optimization"


def test_null_sentinels_become_none():
    rec = normalize_record(
        {"title": "unknown", "manufacturer": "-", "price": "n/a"}, SPECS["amazon"]
    )
    assert rec == {"title": None, "manufacturer": None, "price": None}


def test_enrich_pairs_dataset():
    t = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "label": pa.array([1, 0], pa.int8()),
            "left_Beer_Name": ["old  old ale", "crisp pils"],
            "right_Beer_Name": ["old ale", "city lager"],
            "left_Brew_Factory_Name": ["mill co", "hopworks"],
            "right_Brew_Factory_Name": ["mill co.", "cold spring"],
            "left_Style": ["English Ale", "Czech Pilsner / Lager"],
            "right_Style": ["english ale", "Munich Lager"],
            "left_ABV": ["5.6%", "-"],
            "right_ABV": ["5.60 %", "4.9%"],
        }
    )
    out = enrich_pairs(rd.from_arrow(t), SPECS["beer"]).to_pandas().sort_values("id")
    assert "left_primary_style" in out.columns and "right_is_lager" in out.columns
    assert out.iloc[0].left_name == "Old Ale"
    assert out.iloc[0].left_abv == 5.6 and out.iloc[0].right_abv == 5.6
    assert bool(out.iloc[1].right_is_lager) is True
    assert out.iloc[1].left_abv != out.iloc[1].left_abv or out.iloc[1].left_abv is None  # NaN/None


def test_wdc_title_cleanup():
    rec = normalize_record({"title": '"Seagate ST31000524NS 3.5in | CDW.com"@en'}, SPECS["wdc"])
    assert rec["title"] == "Seagate ST31000524NS 3.5 inch"


GOLDEN_BEER = "/root/reference/DeepMather/Beer/geemazero/train_enriched.csv"


@pytest.mark.skipif(not __import__("os").path.exists(GOLDEN_BEER), reason="reference absent")
def test_beer_enriched_schema_matches_reference_golden():
    """Golden-output conformance (M12): the engine's enriched wide schema
    over the reference's own raw Beer train.csv must equal the header of
    the reference's regenerable golden file, column for column in order
    (DeepMather/Beer/geemazero/train_enriched.csv:1)."""
    import csv

    with open(GOLDEN_BEER, newline="") as f:
        golden_header = next(csv.reader(f))

    raw = pd.read_csv("/root/reference/DeepMather/Beer/train.csv", nrows=8)
    out = enrich_pairs(rd.from_pandas(raw), SPECS["beer"])
    assert out.schema().names == golden_header
    # row shape: one enriched row per raw pair row, no drops
    assert out.count() == len(raw)
