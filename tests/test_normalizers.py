"""Unit tests for the scalar normalizer kernels (SURVEY.md §2.7).

Expected values are lifted from the reference's coercion rules and prompt
examples (FIXTURES.md 'Scalar-kernel unit fixtures').
"""

import pytest

from entity_matching_datasets_ray.functions import normalizers as N


def test_parse_colval_basic():
    d = N.parse_colval("COL title VAL dell laptop COL price VAL $3.00")
    assert d == {"title": "dell laptop", "price": "$3.00"}


def test_parse_colval_col_inside_value():
    # literal "COL" inside a value must not split (iTuens.py:5-9 stress case)
    d = N.parse_colval("COL title VAL best COL ever COL price VAL 9.99")
    assert d["title"] == "best COL ever"
    assert d["price"] == "9.99"


def test_parse_colval_empty_and_keys_lowercased():
    assert N.parse_colval("") == {}
    assert N.parse_colval("COL Title VAL X") == {"title": "X"}


def test_format_colval_roundtrip():
    rec = {"title": "dell laptop", "price": "9.99"}
    line = N.format_colval(rec, ["title", "price"])
    assert line == "COL title VAL dell laptop COL price VAL 9.99"
    assert N.parse_colval(line) == rec


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("$3.00", 3.0),
        ("$129.95", 129.95),
        ("$ 1.29", 1.29),
        ("1,299.99", 1299.99),
        ("USD 5.00", 5.0),
        ("n/a", None),
        ("unknown", None),
        ("", None),
        (None, None),
    ],
)
def test_parse_price(raw, expected):
    assert N.parse_price(raw) == expected


@pytest.mark.parametrize(
    "raw,expected",
    [("5.6%", 5.6), ("8.10 %", 8.1), ("-", None), ("abv 4.2", 4.2), ("999", None)],
)
def test_parse_abv(raw, expected):
    assert N.parse_abv(raw) == expected


@pytest.mark.parametrize(
    "raw,expected",
    [("true", True), ("Yes", True), ("1", True), (1, True), ("false", False),
     ("no", False), (None, False), ("garbage", False)],
)
def test_parse_bool(raw, expected):
    assert N.parse_bool(raw) is expected


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("26-Aug-11", "2011-08-26"),
        ("May 18 , 2015", "2015-05-18"),
        ("2015-05-18", "2015-05-18"),
        ("unknown", None),
    ],
)
def test_normalize_date_iso(raw, expected):
    assert N.normalize_date_iso(raw) == expected


def test_normalize_time_mmss():
    assert N.normalize_time_mmss("3:5") == "03:05"
    assert N.normalize_time_mmss("6:30") == "06:30"
    assert N.normalize_time_mmss("-") is None


def test_normalize_phone_us():
    assert N.normalize_phone_us("213/857 -0034") == "213-857-0034"
    assert N.normalize_phone_us("404-237-7601") == "404-237-7601"
    assert N.normalize_phone_us("(404) 237 7601") == "404-237-7601"
    assert N.normalize_phone_us("") is None


def test_extract_year4():
    assert N.extract_year4("pub. 1997 ed.") == "1997"
    assert N.extract_year4("no year") is None
    assert N.extract_year4("20199") is None  # 5-digit run is not a year


def test_venue_city_brand_tables():
    assert "vldb journal" in N.canonicalize_venue("VLDB J.").lower()
    assert N.expand_city("la").lower() == "los angeles"
    assert N.canonicalize_brand("Hewlett Packard").lower() == "hp"


def test_strip_lang_tags_and_quotes():
    assert N.strip_lang_tags('"Dell Laptop"@en') == '"Dell Laptop'
    assert N.strip_quotes('"Dell Laptop"') == "Dell Laptop"


def test_strip_vendor_suffix():
    assert N.strip_vendor_suffix("HP Monitor | CDW.com") == "HP Monitor"
    assert N.strip_vendor_suffix("HP Monitor | Come As You Arts-US") == "HP Monitor"


def test_dedupe_adjacent_tokens():
    assert N.dedupe_adjacent_tokens("big big deal Deal now") == "big deal now"


def test_normalize_name_composite():
    out = N.normalize_name('"Hewlett Packard  wireless wireless Laptop AB123 | CDW.com"@en')
    assert out == "hp wireless laptop ab123"


def test_null_sentinels():
    for s in ["", "-", "n/a", "NA", "none", "NULL", "unknown", "VAL -"]:
        assert N.null_if_sentinel(s) is None
    assert N.null_if_sentinel("real value") == "real value"


# ---------------------------------------------------------------------------
# property tests (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_token = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")), min_size=1, max_size=10
)


@given(st.dictionaries(_token, _token, min_size=1, max_size=6))
@settings(max_examples=100, deadline=None)
def test_colval_roundtrip_property(record):
    # keys are lowercased by the parser; values are whitespace-collapsed
    rec = {k.lower(): v for k, v in record.items()}
    line = N.format_colval(rec, sorted(rec))
    parsed = N.parse_colval(line)
    assert parsed == {k: N.collapse_ws(v).strip(" |;,:") for k, v in rec.items()}


@given(st.text(max_size=80))
@settings(max_examples=100, deadline=None)
def test_normalize_name_idempotent(s):
    once = N.normalize_name(s)
    assert N.normalize_name(once) == once


@given(st.floats(min_value=0.01, max_value=99999, allow_nan=False))
@settings(max_examples=50, deadline=None)
def test_price_roundtrip(v):
    v = round(v, 2)
    assert N.parse_price(f"${v:.2f}") == v
    assert N.parse_price(N.format_price_usd(v)) == v


def test_title_profile_spec_canonicalization():
    """Reference computer prompt equivalences (computer/single.py:40-64):
    SATA III == SATA 3 == SATA 6Gb/s; USB 3.1 Gen1 == USB 3.0; capacities
    unify across unit spellings; part numbers survive exactly."""
    from entity_matching_datasets_ray.functions.normalizers import normalize_name
    from entity_matching_datasets_ray.functions.titles import title_profile

    a = title_profile(normalize_name('Seagate Barracuda ST2000DM006 2TB 3.5in SATA III 7200RPM'))
    b = title_profile(normalize_name('Seagate Barracuda 2 TB ST2000DM006 SATA 6Gb/s 3.5" 7200 RPM'))
    assert a == b
    spec, cap, sku = a
    assert spec == frozenset({"sata6g", "3.5in", "7200rpm"})
    assert cap == frozenset({"2048gb"})
    assert sku == frozenset({"st2000dm006"})

    s1 = title_profile(normalize_name("SanDisk Ultra USB 3.1 Gen1 64GB"))
    s2 = title_profile(normalize_name("SanDisk Ultra USB 3.0 64 GB"))
    assert s1 == s2
    # different capacity -> conflict signal is derivable (disjoint cap sets)
    s3 = title_profile(normalize_name("SanDisk Ultra USB 3.0 128GB"))
    assert not (s1[1] & s3[1]) and s1[1] and s3[1]
    # "sata 6gb s" must NOT leak a 6gb capacity
    assert title_profile(normalize_name("WD Red 6TB SATA 6Gb/s"))[1] == frozenset({"6144gb"})


def test_soundex_anchors():
    from entity_matching_datasets_ray.functions.normalizers import soundex

    # NARA classic anchors (simplified variant: H/W code to 0 like vowels)
    assert soundex("Robert") == "R163"
    assert soundex("Rupert") == "R163"
    assert soundex("Ashcraft") == "A226"
    assert soundex("Tymczak") == "T522"
    assert soundex("Pfister") == "P236"  # adjacent same-code P,F collapse
    assert soundex("Jackson") == "J250"
    # normalization + degenerate inputs
    assert soundex("  o'Brien ") == soundex("OBRIEN")
    assert soundex("123") == ""
    assert soundex(None) == ""
    assert soundex("o123") == "O000"
