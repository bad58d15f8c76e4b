"""Deterministic enrichment pipelines: the engine's replacement for the
reference's per-dataset LLM normalization (pipeline E2).

The reference re-instantiates one `OllamaFeatureExtractor` per dataset dir
with dataset-specific EXPECTED_KEYS / key_map / prompt text
(/root/reference/DeepMather/Amazon/prompt.py:11-19, Beer/prompt.py:10-26,
Fodors/prompt.py:10-20, DBLACM/prompt.py:10-21, iTunes/prompt.py:27-44,
walmart/prompt.py — SURVEY.md §2.9). Here that template is formalized as a
``DatasetSpec`` registry: schema + key_map + scalar-normalizer chain +
derived-field builders, applied as one vectorized ``map_batches`` over
wide pair rows (``id, label, left_*, right_*``). Output schema mirrors the
reference's enriched CSVs (e.g. Beer widens 4 raw fields to 10 normalized
per side: Beer/prompt.py:10-21, golden header
DeepMather/Beer/geemazero/train_enriched.csv:1).

Unlike the LLM version, these chains are pure functions: rerunning is
byte-identical, and there is nothing to cache or retry.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable

import pyarrow as pa

from ..functions import normalizers as N

# --------------------------------------------------------------------------
# spec
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class DatasetSpec:
    """Per-corpus enrichment recipe (reference extension surface §2.9)."""

    name: str
    key_map: dict  # raw (lowercased) field -> canonical field
    normalizers: dict  # canonical field -> scalar fn (str|None -> value)
    derived: dict = field(default_factory=dict)  # new field -> fn(record dict)
    expected_keys: tuple = ()  # output field order (canonical + derived)

    def output_fields(self) -> list[str]:
        if self.expected_keys:
            return list(self.expected_keys)
        return sorted(set(self.key_map.values()) | set(self.derived))


def _clean_text(s):
    if N.is_null_sentinel(s):
        return None
    return N.dedupe_adjacent_tokens(
        N.collapse_ws(N.strip_vendor_suffix(N.strip_quotes(N.strip_lang_tags(s))))
    )


def _title(s):
    v = _clean_text(s)
    return N.title_case(v) if v else None


_STYLE_SPLIT = re.compile(r"\s*/\s*")


def _beer_primary(rec):
    style = rec.get("style")
    return _STYLE_SPLIT.split(style)[0] if style else None


def _beer_secondary(rec):
    style = rec.get("style")
    parts = _STYLE_SPLIT.split(style) if style else []
    return parts[1] if len(parts) > 1 else None


def _style_flag(word):
    def f(rec):
        style = (rec.get("style") or "").lower()
        return word in style

    return f


_SPECIAL_ING = re.compile(
    r"(?:\bw/\s*|\bwith\s+|\bbrewed with\s+)([a-z0-9 ,&'-]+)$|\(([^)]+)\)\s*$",
    re.IGNORECASE,
)


def _beer_special_ingredients(rec):
    """Deterministic stand-in for the LLM's special-ingredient extraction
    (Beer/prompt.py:10-21): a trailing 'w/ X' / 'with X' clause or final
    parenthetical in the beer name."""
    name = rec.get("name") or ""
    m = _SPECIAL_ING.search(name)
    if not m:
        return None
    return (m.group(1) or m.group(2) or "").strip() or None


# --------------------------------------------------------------------------
# registry — one spec per reference corpus family
# --------------------------------------------------------------------------

SPECS: dict[str, DatasetSpec] = {}


def _register(spec: DatasetSpec):
    SPECS[spec.name] = spec
    return spec


# Amazon-Google software (DeepMather/Amazon/prompt.py:11-15,23-39)
_register(
    DatasetSpec(
        name="amazon",
        key_map={"title": "title", "manufacturer": "manufacturer", "price": "price"},
        normalizers={
            "title": _title,
            "manufacturer": lambda s: (
                N.title_case(N.canonicalize_brand(_clean_text(s))) if _clean_text(s) else None
            ),
            "price": N.parse_price,
        },
        expected_keys=("title", "manufacturer", "price"),
    )
)

# Walmart-Amazon (DeepMather/walmart/prompt.py:20-38,252-264)
_register(
    DatasetSpec(
        name="walmart",
        key_map={
            "title": "title",
            "category": "category",
            "brand": "brand",
            "modelno": "modelno",
            "price": "price",
        },
        normalizers={
            "title": _title,
            "category": _clean_text,
            "brand": lambda s: (
                N.canonicalize_brand(_clean_text(s)).lower() if _clean_text(s) else None
            ),
            "modelno": lambda s: (_clean_text(s) or "").upper() or None,
            "price": N.parse_price,
        },
        expected_keys=("title", "category", "brand", "modelno", "price"),
    )
)

# DBLP-ACM bibliographic (DeepMather/DBLACM/prompt.py:24-46,56-70)
_register(
    DatasetSpec(
        name="dblp_acm",
        key_map={"title": "title", "authors": "authors", "venue": "venue", "year": "year"},
        normalizers={
            "title": _title,
            "authors": _clean_text,
            "venue": lambda s: (
                N.title_case(N.canonicalize_venue(_clean_text(s))) if _clean_text(s) else None
            ),
            "year": N.extract_year4,
        },
        expected_keys=("title", "authors", "venue", "year"),
    )
)

# Fodors-Zagat restaurants (DeepMather/Fodors/prompt.py:10-20,51-71)
_register(
    DatasetSpec(
        name="fodors",
        key_map={
            "name": "name",
            "addr": "addr",
            "city": "city",
            "phone": "phone",
            "category": "category",
            "class": "class",
        },
        normalizers={
            "name": _title,
            "addr": lambda s: (
                N.expand_abbrev(_clean_text(s)) if _clean_text(s) else None
            ),
            "city": lambda s: (N.expand_city(_clean_text(s)) if _clean_text(s) else None),
            "phone": N.normalize_phone_us,
            "category": _clean_text,
            "class": _clean_text,
        },
        expected_keys=("name", "addr", "city", "phone", "category", "class"),
    )
)

# Beer (DeepMather/Beer/prompt.py:10-21,30-63; process.py:28-53,110-116) —
# the schema-widening case: 4 raw fields -> 10 normalized per side.
_register(
    DatasetSpec(
        name="beer",
        key_map={
            "beer_name": "name",
            "brew_factory_name": "brewery",
            "style": "style",
            "abv": "abv",
        },
        normalizers={
            "name": _title,
            "brewery": _title,
            "style": _clean_text,
            "abv": N.parse_abv,
        },
        derived={
            "primary_style": _beer_primary,
            "secondary_style": _beer_secondary,
            "is_amber": _style_flag("amber"),
            "is_ale": _style_flag("ale"),
            "is_lager": _style_flag("lager"),
            "is_imperial": _style_flag("imperial"),
            "special_ingredients": _beer_special_ingredients,
        },
        expected_keys=(
            "name",
            "brewery",
            "primary_style",
            "secondary_style",
            "abv",
            "is_amber",
            "is_ale",
            "is_lager",
            "is_imperial",
            "special_ingredients",
        ),
    )
)

# iTunes-Amazon songs (DeepMather/iTunes/process.py:100-121, prompt.py:27-44)
_register(
    DatasetSpec(
        name="itunes",
        key_map={
            "song_name": "song",
            "artist_name": "artist",
            "album_name": "album",
            "genre": "genre",
            "price": "price",
            "copyright": "copyright",
            "time": "time",
            "released": "released",
        },
        normalizers={
            "song": _title,
            "artist": _title,
            "album": _title,
            "genre": _clean_text,
            "price": lambda s: N.format_price_usd(N.parse_price(s)),
            "copyright": _clean_text,
            "time": N.normalize_time_mmss,
            "released": N.normalize_date_iso,
        },
        expected_keys=(
            "song",
            "artist",
            "album",
            "genre",
            "price",
            "copyright",
            "time",
            "released",
        ),
    )
)

# WDC cameras / computers: title-only (Converters/computers/computer.py:45-56,
# DeepMather/computer/single.py:40-64)
_register(
    DatasetSpec(
        name="wdc",
        key_map={"title": "title"},
        normalizers={
            "title": lambda s: (
                N.expand_abbrev(_clean_text(s)) if _clean_text(s) else None
            )
        },
        expected_keys=("title",),
    )
)


# --------------------------------------------------------------------------
# pipeline
# --------------------------------------------------------------------------


def normalize_record(raw: dict, spec: DatasetSpec) -> dict:
    """One raw per-side record -> normalized record (pure function)."""
    rec: dict = {}
    for raw_key, canon in spec.key_map.items():
        v = raw.get(raw_key)
        fn = spec.normalizers.get(canon)
        rec[canon] = fn(v) if fn else N.null_if_sentinel(v)
    for name, fn in spec.derived.items():
        rec[name] = fn(rec)
    return {k: rec.get(k) for k in spec.output_fields()}


def enrich_pairs(wide_ds, spec: DatasetSpec):
    """Wide pair rows (id, label, left_<raw>, right_<raw>) -> enriched wide
    rows (id, label, left_<canon>..., right_<canon>...).

    One stateless vectorized map_batches — the whole of reference pipeline
    E2 minus the LLM round-trips (Amazon/prompt.py:212-244)."""
    out_fields = spec.output_fields()
    raw_keys = list(spec.key_map.keys())

    def enrich(t: pa.Table) -> pa.Table:
        n = t.num_rows
        names = {c.lower(): c for c in t.column_names}
        sides = {}
        for side in ("left", "right"):
            raw_cols = {}
            for rk in raw_keys:
                col = names.get(f"{side}_{rk}")
                raw_cols[rk] = t.column(col).to_pylist() if col else [None] * n
            recs = [
                normalize_record({k: raw_cols[k][i] for k in raw_keys}, spec)
                for i in range(n)
            ]
            sides[side] = recs
        arrays: dict[str, pa.Array] = {}
        if "id" in names:
            arrays["id"] = t.column(names["id"])
        if "label" in names:
            arrays["label"] = t.column(names["label"])
        for side in ("left", "right"):
            for f in out_fields:
                vals = [r[f] for r in sides[side]]
                if all(isinstance(v, bool) or v is None for v in vals) and any(
                    isinstance(v, bool) for v in vals
                ):
                    arrays[f"{side}_{f}"] = pa.array(vals, pa.bool_())
                elif all(isinstance(v, float) or v is None for v in vals) and any(
                    isinstance(v, float) for v in vals
                ):
                    arrays[f"{side}_{f}"] = pa.array(vals, pa.float64())
                else:
                    arrays[f"{side}_{f}"] = pa.array(
                        [str(v) if v is not None and not isinstance(v, str) else v for v in vals],
                        pa.string(),
                    )
        return pa.table(arrays)

    return wide_ds.map_batches(enrich, batch_format="pyarrow")
