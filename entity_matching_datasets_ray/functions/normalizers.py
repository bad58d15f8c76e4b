"""Deterministic scalar normalization kernels.

These re-implement, as pure deterministic functions, the normalization
semantics the reference delegates to LLM prompts or inline coercers
(reference citations are ``/root/reference/<path>:<lines>``):

- COL/VAL parsing        -> Converters/computers/dcm.py:7-29, iTuens.py:5-21
- language-tag stripping -> Converters/computers/computer.py:45-56
- price coercion         -> DeepMather/Amazon/prompt.py:23-39, walmart/prompt.py:20-38
- ABV coercion           -> DeepMather/Beer/prompt.py:43-63
- bool coercion          -> DeepMather/Beer/prompt.py:30-42
- year extraction        -> Converters/computers/dcm.py:93-97
- date/time/price fmt    -> DeepMather/iTunes/process.py:100-121
- phone formatting       -> DeepMather/Fodors/prompt.py:55
- venue canonicalization -> DeepMather/DBLACM/prompt.py:56-70
- city expansion         -> DeepMather/Fodors/prompt.py:51-71
- text cleanup rules     -> DeepMather/Amazon/prompt.py:75-93,
                            DeepMather/computer/single.py:40-64
- null sentinels         -> union of Amazon/prompt.py:31, Beer/prompt.py:48,
                            iTunes/process.py:102, Beer/process.py:93-108

All functions are scalar ``str|None -> value`` with ``None``-safe behavior;
stage code applies them per-batch (pandas ``Series.map`` or list
comprehension inside ``map_batches``). They hold no state and are safe to
serialize into Ray tasks.
"""

from __future__ import annotations

import re
from typing import Optional

# --------------------------------------------------------------------------
# null sentinels
# --------------------------------------------------------------------------

NULL_SENTINELS = frozenset(
    {"", "-", "n/a", "na", "none", "null", "unknown", "val -", "nan", "missing"}
)


def is_null_sentinel(s: Optional[str]) -> bool:
    return s is None or s.strip().lower() in NULL_SENTINELS


def null_if_sentinel(s: Optional[str]) -> Optional[str]:
    """Map the reference's assorted missing-value sentinels to None."""
    return None if is_null_sentinel(s) else s


# --------------------------------------------------------------------------
# COL/VAL (Ditto format) parsing
# --------------------------------------------------------------------------

_COLVAL_MARK = re.compile(r"COL\s+(\S+)\s+VAL\s")


def parse_colval(entity: str) -> dict[str, str]:
    """Parse a ``COL <key> VAL <value> ...`` token stream into a dict.

    Robust to the literal token ``COL`` appearing inside values: we segment
    by successive ``COL <key> VAL`` markers and slice the value between
    markers (reference: Converters/computers/dcm.py:7-29). Keys are
    lowercased; values are whitespace-collapsed and stripped of trailing
    ``|;,:`` separators.
    """
    out: dict[str, str] = {}
    if not entity:
        return out
    matches = list(_COLVAL_MARK.finditer(entity))
    for i, m in enumerate(matches):
        key = m.group(1).strip().lower()
        start = m.end()
        end = matches[i + 1].start() if i + 1 < len(matches) else len(entity)
        val = collapse_ws(entity[start:end]).strip(" |;,:")
        if key:
            out[key] = val
    return out


def format_colval(record: dict[str, str], field_order: list[str] | None = None) -> str:
    """Re-emit a record as a COL/VAL token stream.

    Reference (Ditto writer): DeepMather/dittofolder/wdc.zip ->
    wdc/computers/prompt.py:236-256.
    """
    keys = field_order if field_order is not None else sorted(record)
    return " ".join(f"COL {k} VAL {record.get(k, '')}" for k in keys).strip()


# --------------------------------------------------------------------------
# generic text cleanup
# --------------------------------------------------------------------------

_WS = re.compile(r"\s+")
_LANG_TAG = re.compile(r'"?\s*@(?:en|nl|fr|de|es|it)\b\.?', re.IGNORECASE)
_QUOTES = "\"'`“”‘’"


def collapse_ws(s: Optional[str]) -> str:
    """Collapse runs of whitespace to single spaces and trim."""
    if s is None:
        return ""
    return _WS.sub(" ", s).strip()


def strip_lang_tags(s: Optional[str]) -> str:
    """Remove ``@en`` / ``@NL`` / ``@fr`` language suffix tags.

    Reference: Converters/computers/computer.py:45-56.
    """
    if s is None:
        return ""
    return collapse_ws(_LANG_TAG.sub(" ", s))


def strip_quotes(s: Optional[str]) -> str:
    """Strip surrounding/stray quote characters and backticks."""
    if s is None:
        return ""
    return collapse_ws(s.strip(_QUOTES).replace("``", " ").replace("''", " "))


def title_case(s: Optional[str]) -> str:
    """Title-case words, leaving all-caps tokens (SKUs, acronyms) intact.

    Reference (prompt rule): DeepMather/Amazon/prompt.py:75-93.
    """
    if s is None:
        return ""
    out = []
    for tok in collapse_ws(s).split(" "):
        if tok.isupper() and len(tok) > 1:
            out.append(tok)  # acronym / SKU: keep
        elif tok and tok[0].isalpha():
            out.append(tok[0].upper() + tok[1:].lower())
        else:
            out.append(tok)
    return " ".join(out)


def dedupe_adjacent_tokens(s: Optional[str]) -> str:
    """Drop consecutive duplicate words (case-insensitive).

    Reference (prompt rule): DeepMather/Amazon/prompt.py:91.
    """
    if s is None:
        return ""
    out: list[str] = []
    prev = None
    for tok in collapse_ws(s).split(" "):
        low = tok.lower()
        if low != prev:
            out.append(tok)
        prev = low
    return " ".join(out)


_VENDOR_SUFFIX = re.compile(
    r"\s*(\||@|—|–| - )\s*(come as you arts-us|cdw\.com|walmart\.com|amazon\.com|"
    r"ebay|best ?buy|newegg(\.com)?|staples|office ?depot|b&h( photo( video)?)?|"
    r"free shipping.*|buy online.*)\s*$",
    re.IGNORECASE,
)


def strip_vendor_suffix(s: Optional[str]) -> str:
    """Remove trailing vendor-site suffixes from product titles.

    Reference (prompt rule): DeepMather/computer/single.py:40-64 and
    WDC camera/computer titles like ``... | CDW.com``.
    """
    if s is None:
        return ""
    prev = None
    cur = collapse_ws(s)
    while prev != cur:
        prev = cur
        cur = _VENDOR_SUFFIX.sub("", cur).strip()
    return cur


def apply_table(s: Optional[str], table: dict[str, str]) -> str:
    """Replace whole-phrase occurrences per a canonical-form table.

    Used for abbreviation expansion / brand / venue / city canonicalization
    (tables below). Matching is case-insensitive, longest-phrase-first, on
    word boundaries.
    """
    if s is None:
        return ""
    out = collapse_ws(s)
    for k in sorted(table, key=len, reverse=True):
        out = re.sub(rf"(?<![\w]){re.escape(k)}(?![\w])", table[k], out, flags=re.IGNORECASE)
    return collapse_ws(out)


# Reference prompt tables (Amazon/prompt.py:75-93, computer/single.py:40-64,
# DBLACM/prompt.py:56-70, Fodors/prompt.py:51-71).
ABBREV_TABLE = {
    "st.": "street",
    "ave.": "avenue",
    "blvd.": "boulevard",
    "cs3": "creative suite 3",
    "cs4": "creative suite 4",
    "sata iii": "sata 6gb/s",
    "sata ii": "sata 3gb/s",
    "3.5in": "3.5 inch",
    "2.5in": "2.5 inch",
    "w/": "with",
}

BRAND_TABLE = {
    "adobe systems inc": "adobe",
    "adobe systems": "adobe",
    "hewlett packard": "hp",
    "hewlett-packard": "hp",
    "h.p.": "hp",
    "international business machines": "ibm",
    "microsoft corporation": "microsoft",
    "microsoft corp": "microsoft",
    "western digital corp": "western digital",
}

VENUE_TABLE = {
    "sigmod conference": "sigmod",
    "international conference on management of data": "sigmod",
    "acm sigmod": "sigmod",
    "vldb j.": "vldb journal",
    "the vldb journal": "vldb journal",
    "very large data bases": "vldb",
    "acm trans . database syst .": "acm transactions on database systems",
    "acm transactions on database systems ( tods )": "acm transactions on database systems",
    "sigmod record": "acm sigmod record",
}

CITY_TABLE = {
    "la": "los angeles",
    "l.a.": "los angeles",
    "nyc": "new york",
    "new york city": "new york",
    "sf": "san francisco",
}


def expand_abbrev(s: Optional[str]) -> str:
    return apply_table(s, ABBREV_TABLE)


def canonicalize_brand(s: Optional[str]) -> str:
    return apply_table(s, BRAND_TABLE)


def canonicalize_venue(s: Optional[str]) -> str:
    return apply_table(s, VENUE_TABLE)


def expand_city(s: Optional[str]) -> str:
    return apply_table(s, CITY_TABLE)


# --------------------------------------------------------------------------
# typed coercions
# --------------------------------------------------------------------------

_DIGITS = re.compile(r"\d")
_PHONE_DIGITS = re.compile(r"\D+")


def normalize_phone_us(s: Optional[str]) -> Optional[str]:
    """``404/351 -9533`` -> ``404-351-9533`` (Fodors/prompt.py:55)."""
    if is_null_sentinel(s):
        return None
    digits = _PHONE_DIGITS.sub("", s or "")
    if len(digits) == 11 and digits.startswith("1"):
        digits = digits[1:]
    if len(digits) == 10:
        return f"{digits[:3]}-{digits[3:6]}-{digits[6:]}"
    if len(digits) == 7:
        return f"{digits[:3]}-{digits[3:]}"
    return null_if_sentinel(s)


_YEAR4 = re.compile(r"(?<!\d)((?:17|18|19|20)\d{2})(?!\d)")


def extract_year4(s: Optional[str]) -> Optional[str]:
    """First plausible 4-digit year, else None (dcm.py:93-97)."""
    if s is None:
        return None
    m = _YEAR4.search(s)
    return m.group(1) if m else None


_NUM = re.compile(r"[-+]?\d{1,3}(?:,\d{3})+(?:\.\d+)?|[-+]?\d*\.?\d+")


def parse_price(s: Optional[str]) -> Optional[float]:
    """``"$129.95"``/``"$ 1.29"`` -> float rounded to 2 decimals; sentinel ->
    None; never fabricate (Amazon/prompt.py:23-39, walmart/prompt.py:20-38).
    """
    if is_null_sentinel(s):
        return None
    m = _NUM.search(s.replace("$", " ").replace("USD", " "))
    if not m:
        return None
    try:
        return round(float(m.group(0).replace(",", "")), 2)
    except ValueError:
        return None


def parse_abv(s: Optional[str]) -> Optional[float]:
    """``"8.10 %"`` -> 8.1; placeholders -> None (Beer/prompt.py:43-63)."""
    if is_null_sentinel(s):
        return None
    m = _NUM.search(s)
    if not m:
        return None
    try:
        v = float(m.group(0).replace(",", ""))
    except ValueError:
        return None
    return v if 0.0 <= v <= 100.0 else None


_TRUTHY = frozenset({"true", "yes", "y", "1", "t"})
_FALSY = frozenset({"false", "no", "n", "0", "f"})


def parse_bool(s: object) -> bool:
    """Truthy-string/number -> bool; None/unknown -> False (Beer/prompt.py:30-42)."""
    if s is None:
        return False
    if isinstance(s, bool):
        return s
    if isinstance(s, (int, float)):
        return s != 0
    low = str(s).strip().lower()
    if low in _TRUTHY:
        return True
    if low in _FALSY:
        return False
    return False


_MONTHS = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
}
_DATE_DMY = re.compile(r"(\d{1,2})\s*-\s*([A-Za-z]{3,})\s*-\s*(\d{2,4})")
_DATE_MDY = re.compile(r"([A-Za-z]{3,})\s+(\d{1,2})\s*,\s*(\d{2,4})")
_DATE_ISO = re.compile(r"(\d{4})-(\d{1,2})-(\d{1,2})")


def _fix_year(y: int) -> int:
    if y < 100:
        return 2000 + y if y < 70 else 1900 + y
    return y


def normalize_date_iso(s: Optional[str]) -> Optional[str]:
    """``"26-Aug-11"`` / ``"May 18 , 2015"`` -> ``YYYY-MM-DD``
    (iTunes/process.py:116-121)."""
    if is_null_sentinel(s):
        return None
    s = collapse_ws(s)
    m = _DATE_ISO.search(s)
    if m:
        return f"{int(m.group(1)):04d}-{int(m.group(2)):02d}-{int(m.group(3)):02d}"
    m = _DATE_DMY.search(s)
    if m:
        mon = _MONTHS.get(m.group(2)[:3].lower())
        if mon:
            return f"{_fix_year(int(m.group(3))):04d}-{mon:02d}-{int(m.group(1)):02d}"
    m = _DATE_MDY.search(s)
    if m:
        mon = _MONTHS.get(m.group(1)[:3].lower())
        if mon:
            return f"{_fix_year(int(m.group(3))):04d}-{mon:02d}-{int(m.group(2)):02d}"
    return None


_TIME = re.compile(r"(\d{1,3})\s*:\s*(\d{1,2})")


def normalize_time_mmss(s: Optional[str]) -> Optional[str]:
    """``"3:5"`` -> ``"03:05"``; ``"6:30"`` -> ``"06:30"``
    (iTunes/process.py:111-114)."""
    if is_null_sentinel(s):
        return None
    m = _TIME.search(s)
    if not m:
        return None
    return f"{int(m.group(1)):02d}:{int(m.group(2)):02d}"


def format_price_usd(v: Optional[float]) -> Optional[str]:
    """float -> ``"USD X.XX"`` (iTunes/process.py:100-110)."""
    if v is None:
        return None
    return f"USD {v:.2f}"


# --------------------------------------------------------------------------
# composite name normalizer (the blocking-key-critical chain)
# --------------------------------------------------------------------------

_NON_ALNUM = re.compile(r"[^0-9a-z ]+")

# Version-token canonicalization (software/product titles — the dominant
# positive-pair noise in the reference's Amazon-Google / Walmart corpora):
# "v22" / "v. 3.5" / "version 2.0" -> bare number; "2.0" / "2 .0" -> "2"
# (trailing .0 is formatting, "10.2.8" is untouched); small roman numerals
# -> digits ("warlords iii" vs "warlords 3"). Applied before punctuation
# stripping so dots still delimit.
_VERSION_PREFIX = re.compile(r"\bv(?:er(?:sion)?)?\.?\s*(\d+(?:\.\d+)*)\b")
_TRAILING_DOT0 = re.compile(r"\b(\d+)\s*\.\s*0\b")
_ROMAN_TOKENS = {"ii": "2", "iii": "3", "iv": "4", "vii": "7", "viii": "8", "ix": "9"}
_ROMAN_RE = re.compile(r"\b(ii|iii|iv|vii|viii|ix)\b")


def canonicalize_versions(t: str) -> str:
    """Lowercased text -> version-token-canonical text (see above)."""
    t = _VERSION_PREFIX.sub(r"\1", t)
    t = _TRAILING_DOT0.sub(r"\1", t)
    return _ROMAN_RE.sub(lambda m: _ROMAN_TOKENS[m.group(1)], t)


def normalize_name(s: Optional[str]) -> str:
    """Canonical text form used for blocking keys and match features.

    Chain: strip lang tags / quotes / vendor suffixes, lowercase,
    canonicalize version tokens, expand abbreviations, canonicalize
    brands, strip punctuation, collapse whitespace, dedupe adjacent
    tokens. Deterministic stand-in for the reference's prompt-encoded
    cleanup (Amazon/prompt.py:75-93 et al.).
    """
    if is_null_sentinel(s):
        return ""
    t = strip_vendor_suffix(strip_quotes(strip_lang_tags(s))).lower()
    t = canonicalize_versions(t)
    t = apply_table(t, ABBREV_TABLE)
    t = apply_table(t, BRAND_TABLE)
    t = _NON_ALNUM.sub(" ", t)
    t = collapse_ws(t)
    # post-strip canonicalization to FIXPOINT: punctuation stripping can
    # expose version/roman forms ("v:2" -> "v 2", "ivª" -> "iv") the
    # pre-strip pass could not see, and overlapping runs ("v v 6") need
    # one pass per 'v' — without the loop the chain is not idempotent
    # (hypothesis-found).
    prev = None
    while prev != t:
        prev = t
        t = canonicalize_versions(t)
    out = dedupe_adjacent_tokens(t)
    # the cleaned result can itself be a bare null sentinel (",na$" -> "na")
    return "" if is_null_sentinel(out) else out


def name_tokens(s: Optional[str]) -> list[str]:
    return [t for t in normalize_name(s).split(" ") if t]


# --------------------------------------------------------------------------
# phonetic keys
# --------------------------------------------------------------------------

_SOUNDEX_CODES = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
    "01230120022455012623010202",
)
_SOUNDEX_STRIP = re.compile(r"[^A-Za-z]")
_SOUNDEX_RUNS = re.compile(r"([0-9])\1+")


def soundex(s: Optional[str]) -> str:
    """Simplified American Soundex — the classic phonetic blocking key for
    person/entity names (Russell 1918; standard in record-linkage
    blocking).

    Deterministic spec, chosen to be exactly SQL-expressible (the strict
    variant's H/W-transparency rule is NOT applied; H/W code to 0 like
    vowels — documented deviation):

    1. uppercase, strip non-letters; empty -> "";
    2. code every letter (B F P V->1, C G J K Q S X Z->2, D T->3, L->4,
       M N->5, R->6, vowels+H W Y->0);
    3. collapse adjacent equal codes;
    4. key = first LETTER + the first 3 nonzero codes after position 1,
       right-padded with '0' to length 4.

    Classic anchors hold: ROBERT/RUPERT -> R163, ASHCRAFT -> A226.
    """
    u = _SOUNDEX_STRIP.sub("", s or "").upper()
    if not u:
        return ""
    collapsed = _SOUNDEX_RUNS.sub(r"\1", u.translate(_SOUNDEX_CODES))
    rest = collapsed[1:].replace("0", "")
    return u[0] + (rest + "000")[:3]
