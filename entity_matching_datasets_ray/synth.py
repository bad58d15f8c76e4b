"""Deterministic synthetic corpus generator (spans-table shape).

Produces the mandated input table (``doc_id``, ``spans``) at arbitrary
scale, with ground truth: documents generated from the same logical entity
are duplicates the pipeline must cluster together. The perturbations mirror
the noise classes observed in the reference corpora
(/root/reference/DeepMather/*/train.csv; see FIXTURES.md F2-F8):

- brand-name variants (``Hewlett Packard`` vs ``HP``) — walmart F3;
- vendor-site title suffixes (``... | CDW.com``) — WDC F8;
- language tags (``"..."@en``) — Converters/computers/computer.py:45-56;
- price format variants (``$129.95`` / ``USD 129.95`` / sentinel) — F2;
- phone format variants (``404/351 -9533``) — Fodors F5;
- date format variants (``18-May-15`` / ``May 18 , 2015``) — iTunes F7;
- venue canonicalization variants (``VLDB J.``) — DBLP-ACM F4;
- case noise, duplicated adjacent words, adjacent-char typos — prompt
  cleanup rules (Amazon/prompt.py:75-93).

Everything is a pure function of ``(seed, family, entity_index)`` so the
same corpus can be generated in parallel inside Ray tasks at any scale
(no shared RNG state) — generation itself is a ``ray.data.range ->
map_batches`` pipeline at benchmark scale.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .functions.hashing import hash64

_ISO_DATE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
from .schema import DOCS_SCHEMA, PAIRS_SCHEMA, spans_from_fields

FAMILIES = ["products", "bib", "restaurants", "songs"]

_BRANDS = [
    ("hp", "Hewlett Packard"),
    ("adobe", "Adobe Systems Inc"),
    ("microsoft", "Microsoft Corporation"),
    ("sony", "Sony"),
    ("samsung", "Samsung"),
    ("canon", "Canon"),
    ("logitech", "Logitech"),
    ("western digital", "Western Digital Corp"),
    ("apple", "Apple"),
    ("dell", "Dell"),
]
_NOUNS = [
    "laptop", "monitor", "keyboard", "camera", "printer", "router", "drive",
    "mouse", "tablet", "speaker", "headset", "projector", "scanner", "charger",
]
_ADJS = [
    "wireless", "portable", "professional", "compact", "ultra", "premium",
    "gaming", "ergonomic", "slim", "rugged", "digital", "smart",
]
_CATEGORIES = ["electronics", "office", "computers", "accessories", "photo"]
_VENDOR_SUFFIXES = [" | CDW.com", " | Come As You Arts-US", " - Walmart.com", " | Newegg"]

_FIRST = ["alice", "bob", "carol", "david", "erin", "frank", "grace", "henry", "irene", "jack"]
_LAST = ["smith", "jones", "chen", "garcia", "mueller", "tanaka", "kumar", "rossi", "novak", "kim"]
_VENUES = [
    ("sigmod", "SIGMOD Conference"),
    ("vldb journal", "VLDB J."),
    ("vldb", "Very Large Data Bases"),
    ("icde", "ICDE"),
    ("acm transactions on database systems", "ACM Trans . Database Syst ."),
]
_TOPICS = [
    "query optimization", "stream processing", "data integration", "entity resolution",
    "index structures", "transaction management", "approximate counting", "graph mining",
    "columnar storage", "adaptive execution", "semantic caching", "schema matching",
]

_CUISINES = ["italian", "french", "mexican", "japanese", "american", "thai", "indian"]
_STREETS = ["main st.", "oak ave.", "sunset blvd.", "market st.", "5th ave.", "elm st."]
_CITIES = [("los angeles", "la"), ("new york", "nyc"), ("san francisco", "sf"), ("chicago", "chicago"), ("atlanta", "atlanta")]
_REST_WORDS = ["grill", "bistro", "kitchen", "cafe", "house", "garden", "corner", "table"]

_GENRES = ["rock", "pop", "jazz", "electronic", "folk", "hip-hop", "classical"]
_SONG_WORDS = ["midnight", "summer", "river", "golden", "echo", "silver", "wild", "broken",
               "velvet", "neon", "paper", "thunder", "quiet", "crimson"]


def _rng_for(seed: int, family: str, idx: int) -> np.random.RandomState:
    return np.random.RandomState(hash64(f"{seed}:{family}:{idx}") % (2**31 - 1))


def _pick(rng: np.random.RandomState, items: list):
    return items[int(rng.randint(0, len(items)))]


def _typo(rng: np.random.RandomState, s: str) -> str:
    """Swap one pair of adjacent alpha chars inside a word of length>=5."""
    idxs = [i for i in range(len(s) - 1) if s[i].isalpha() and s[i + 1].isalpha()]
    if not idxs:
        return s
    i = idxs[int(rng.randint(0, len(idxs)))]
    return s[:i] + s[i + 1] + s[i] + s[i + 2 :]


# --------------------------------------------------------------------------
# canonical entity builders (one per family)
# --------------------------------------------------------------------------


def _hword(rng: np.random.RandomState, pool: list) -> str:
    """Word with an entropy suffix: keeps the corpus vocabulary growing with
    corpus size (Heaps-law-ish), so cross-entity shingle overlap — and with
    it candidate-pair density — stays roughly constant as the corpus scales
    instead of exploding quadratically on a tiny fixed pool."""
    return f"{_pick(rng, pool)}{rng.randint(0, 100)}"


def _entity_products(rng: np.random.RandomState, idx: int) -> dict[str, str]:
    brand, _ = _pick(rng, _BRANDS)
    model = f"{chr(65 + rng.randint(0, 26))}{chr(65 + rng.randint(0, 26))}{rng.randint(100, 9999)}"
    name = f"{brand} {_hword(rng, _ADJS)} {_pick(rng, _ADJS)} {_pick(rng, _NOUNS)} {model}"
    return {
        "name": name,
        "brand": brand,
        "category": _pick(rng, _CATEGORIES),
        "modelno": model,
        "price": f"{rng.randint(10, 2000)}.{rng.randint(0, 100):02d}",
    }


def _entity_bib(rng: np.random.RandomState, idx: int) -> dict[str, str]:
    venue, _ = _pick(rng, _VENUES)
    authors = ", ".join(
        f"{_pick(rng, _FIRST)} {_pick(rng, _LAST)}" for _ in range(int(rng.randint(1, 4)))
    )
    name = f"{_pick(rng, _ADJS)} {_hword(rng, _TOPICS)} for {_pick(rng, _TOPICS)} e{idx}"
    return {
        "name": name,
        "authors": authors,
        "venue": venue,
        "year": str(1990 + int(rng.randint(0, 30))),
    }


def _entity_restaurants(rng: np.random.RandomState, idx: int) -> dict[str, str]:
    city, _ = _pick(rng, _CITIES)
    name = f"{_pick(rng, _LAST)}'s {_pick(rng, _CUISINES)} {_pick(rng, _REST_WORDS)} {idx % 97}"
    phone = f"{rng.randint(200, 999)}-{rng.randint(200, 999)}-{rng.randint(1000, 9999)}"
    return {
        "name": name,
        "addr": f"{rng.randint(1, 999)} {_pick(rng, _STREETS)}",
        "city": city,
        "phone": phone,
        "category": _pick(rng, _CUISINES),
    }


def _entity_songs(rng: np.random.RandomState, idx: int) -> dict[str, str]:
    artist = f"{_pick(rng, _FIRST)} {_pick(rng, _LAST)}"
    name = f"{_hword(rng, _SONG_WORDS)} {_pick(rng, _SONG_WORDS)} {_pick(rng, _SONG_WORDS)} s{idx}"
    mon = int(rng.randint(1, 13))
    day = int(rng.randint(1, 29))
    year = 2000 + int(rng.randint(0, 20))
    return {
        "name": name,
        "artist": artist,
        "album": f"{_pick(rng, _SONG_WORDS)} {_pick(rng, _GENRES)}",
        "released": f"{year:04d}-{mon:02d}-{day:02d}",
        "time": f"{rng.randint(1, 9)}:{rng.randint(0, 60):02d}",
        "price": f"{rng.randint(0, 2)}.{rng.randint(0, 100):02d}",
    }


_BUILDERS = {
    "products": _entity_products,
    "bib": _entity_bib,
    "restaurants": _entity_restaurants,
    "songs": _entity_songs,
}

_FIELD_ORDER = {
    "products": ["name", "brand", "category", "modelno", "price"],
    "bib": ["name", "authors", "venue", "year"],
    "restaurants": ["name", "addr", "city", "phone", "category"],
    "songs": ["name", "artist", "album", "released", "time", "price"],
}


# --------------------------------------------------------------------------
# perturbations (noise classes from the reference corpora)
# --------------------------------------------------------------------------


def _perturb(rng: np.random.RandomState, family: str, rec: dict[str, str]) -> dict[str, str]:
    out = dict(rec)
    choices = int(rng.randint(1, 4))
    for _ in range(choices):
        op = int(rng.randint(0, 10))
        if op == 0:
            out["name"] = out["name"].upper()
        elif op == 1:
            out["name"] = out["name"].title()
        elif op == 2 and family == "products":
            out["name"] = out["name"] + _pick(rng, _VENDOR_SUFFIXES)
        elif op == 3 and family == "products":
            for short, long in _BRANDS:
                if short in out["name"]:
                    out["name"] = out["name"].replace(short, long, 1)
                    out["brand"] = long
                    break
        elif op == 4:
            out["name"] = f'"{out["name"]}"@en'
        elif op == 5 and "price" in out:
            style = int(rng.randint(0, 4))
            if style == 0:
                out["price"] = f"${out['price']}"
            elif style == 1:
                out["price"] = f"USD {out['price']}"
            elif style == 2:
                out["price"] = f"$ {out['price']}"
            else:
                out["price"] = "unknown"
        elif op == 6 and "phone" in out and out["phone"].count("-") == 2:
            a, b, c = out["phone"].split("-")
            out["phone"] = f"{a}/{b} -{c}"
        elif op == 7 and "released" in out and _ISO_DATE.match(out["released"]):
            y, m, d = out["released"].split("-")
            months = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
                      "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
            if rng.randint(0, 2):
                out["released"] = f"{int(d)}-{months[int(m) - 1]}-{y[2:]}"
            else:
                out["released"] = f"{months[int(m) - 1]} {int(d)} , {y}"
        elif op == 7 and "venue" in out:
            for canon, variant in _VENUES:
                if out["venue"] == canon:
                    out["venue"] = variant
                    break
        elif op == 8:
            words = out["name"].split(" ")
            i = int(rng.randint(0, len(words)))
            words.insert(i, words[i])  # duplicated adjacent word
            out["name"] = " ".join(words)
        elif op == 9:
            out["name"] = _typo(rng, out["name"])
        elif op == 7 and "city" in out:
            for full, short in _CITIES:
                if out["city"] == full:
                    out["city"] = short
                    break
    return out


# --------------------------------------------------------------------------
# document materialization
# --------------------------------------------------------------------------


def n_copies(seed: int, family: str, idx: int) -> int:
    """1-3 duplicate documents per entity (deterministic)."""
    return 1 + hash64(f"copies:{seed}:{family}:{idx}") % 3


def make_documents(seed: int, family: str, idx: int) -> list[dict]:
    """All duplicate documents for one logical entity."""
    rng = _rng_for(seed, family, idx)
    canonical = _BUILDERS[family](rng, idx)
    order = _FIELD_ORDER[family]
    docs = []
    for copy in range(n_copies(seed, family, idx)):
        rec = canonical if copy == 0 else _perturb(rng, family, canonical)
        media = []
        if hash64(f"media:{seed}:{family}:{idx}:{copy}") % 3 == 0:
            media.append(f"synthetic://img/{family}/{idx}/{copy}")
        fields = [(k, rec[k]) for k in order if k in rec]
        docs.append(
            {
                "doc_id": f"{family}:{idx:08d}:{copy}",
                "dataset": family,
                "spans": spans_from_fields(fields, media),
            }
        )
    return docs


def docs_batch(
    entity_indices: np.ndarray, seed: int = 42, families: list[str] | None = None
) -> pa.Table:
    """Batch generator: entity index -> its documents (all families).

    Used inside ``ray.data.range(n).map_batches(...)`` for parallel,
    shared-nothing corpus generation at benchmark scale.
    """
    families = families or FAMILIES
    rows = []
    for idx in entity_indices:
        fam = families[int(idx) % len(families)]
        rows.extend(make_documents(seed, fam, int(idx)))
    return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)


def truth_pairs(n_entities: int, seed: int = 42, families: list[str] | None = None) -> pa.Table:
    """Ground-truth positive pairs: every intra-entity doc pair, label 1."""
    families = families or FAMILIES
    left, right = [], []
    for idx in range(n_entities):
        fam = families[idx % len(families)]
        k = n_copies(seed, fam, idx)
        ids = [f"{fam}:{idx:08d}:{c}" for c in range(k)]
        for i in range(k):
            for j in range(i + 1, k):
                left.append(ids[i])
                right.append(ids[j])
    return pa.Table.from_arrays(
        [
            pa.array(left, pa.string()),
            pa.array(right, pa.string()),
            pa.array([1] * len(left), pa.int8()),
        ],
        schema=PAIRS_SCHEMA,
    )


def synth_docs_table(n_entities: int, seed: int = 42, families: list[str] | None = None) -> pa.Table:
    """Small-scale local materialization (tests)."""
    return docs_batch(np.arange(n_entities), seed=seed, families=families)


def synth_docs_dataset(n_entities: int, seed: int = 42, parallelism: int = -1):
    """Ray Data corpus generation: range -> map_batches (shared-nothing)."""
    import ray.data as rd

    ds = rd.range(n_entities, override_num_blocks=parallelism if parallelism > 0 else None)
    ds = ds.map_batches(
        lambda b: docs_batch(b["id"], seed=seed),
        batch_format="numpy",
        batch_size=4096,
    )
    # NOTE (r4): deliberately NO repartition/materialize here. Ray bundles
    # fused tasks by INPUT bytes, so the 8-byte-id range makes downstream
    # extract run ~5-wide at sandbox scale (~1 s of the 32-CPU headline) —
    # but a barrier here is a full-corpus all-to-all in exactly the
    # constrained-memory scenario the spill probe guards (materialize
    # LIVELOCKED the 12k/256MB probe by pinning blocks; a lazy repartition
    # still doubled its blocking wall). At real scale the input has real
    # bytes and fans out by itself; the blocking-internal pre-split on the
    # narrow entity table covers the stage that matters.
    return ds


PLANTED_ID_OFFSET = 1_000_000


def planted_linkage_docs(
    ids_ds, id_col: str = "doc_id", copies: int = 2, n_tokens: int = 8, first_copy: int = 0
):
    """Exact-duplicate linkage fixture over an id column (the planted-
    fixture pattern, applied to the FULL linkage pipeline).

    Each id becomes ``copies`` identical spans-table documents
    ``p:{id:08d}:{c}`` whose single entity field is a hash-derived token
    name — a pure function of the id, mutually dissimilar across ids. A
    correct blocking→scoring→CC pipeline must therefore produce exactly
    the clusters ``{p:id:0 … p:id:copies-1}`` with canonical entity
    ``p:id:0`` — SQL-derivable from the id column alone, with zero
    tolerance for cross-id merges (precision) or split clusters (recall).

    Built as a streaming ``map_batches``; nothing is materialized on the
    driver.
    """

    def gen(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        rows = []
        for i in ids:
            name = " ".join(f"{hash64(f'pl:{i}:{j}'):016x}" for j in range(n_tokens))
            spans = spans_from_fields([("name", name)])
            for c in range(first_copy, first_copy + copies):
                rows.append(
                    {
                        "doc_id": f"p:{int(i):08d}:{c}",
                        "dataset": "planted",
                        "spans": spans,
                    }
                )
        return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)

    return ids_ds.select_columns([id_col]).map_batches(gen, batch_format="pyarrow")


def planted_truth_pairs(ids_ds, id_col: str = "doc_id", copies: int = 2):
    """Gold positive pairs for ``planted_linkage_docs``: every intra-id
    doc pair, label 1 (streaming)."""

    def gen(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        left, right = [], []
        for i in ids:
            names = [f"p:{int(i):08d}:{c}" for c in range(copies)]
            for a in range(copies):
                for b in range(a + 1, copies):
                    left.append(names[a])
                    right.append(names[b])
        return pa.Table.from_arrays(
            [
                pa.array(left, pa.string()),
                pa.array(right, pa.string()),
                pa.array([1] * len(left), pa.int8()),
            ],
            schema=PAIRS_SCHEMA,
        )

    return ids_ds.select_columns([id_col]).map_batches(gen, batch_format="pyarrow")


def planted_dup_docs(ids_ds, id_col: str = "doc_id", mode: str = "minhash", n_tokens: int = 30):
    """Deterministic near-dup fixture over an id column: for each id, a
    base document of hash-derived 16-hex-char tokens (pure function of the
    id — mutually near-disjoint shingle sets across ids) plus a planted
    near-duplicate at ``id + PLANTED_ID_OFFSET``.

    - ``mode="minhash"``: the duplicate drops the last token (char-shingle
      Jaccard ~ (n-1)/n, well above any sane near-dup threshold).
    - ``mode="simhash"``: the duplicate reverses token order (identical
      token bag -> identical simhash, Hamming distance 0).

    The expected verified pair set is therefore exactly
    ``{(id, id + PLANTED_ID_OFFSET)}`` — SQL-derivable from the id column
    alone, which makes dedup operators oracle-checkable end to end
    (shingle -> signature -> band -> bucket -> verify) with zero tolerance
    for false positives among the mutually-distinct base docs.

    Built as a streaming ``map_batches`` over the id column (scales with
    the input; nothing is materialized on the driver).
    """
    if mode not in ("minhash", "simhash"):
        raise ValueError(mode)

    def gen(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        out_ids: list[int] = []
        out_text: list[str] = []
        for i in ids:
            toks = [f"{hash64(f'{i}:{j}'):016x}" for j in range(n_tokens)]
            out_ids.append(i)
            out_text.append(" ".join(toks))
            out_ids.append(i + PLANTED_ID_OFFSET)
            if mode == "minhash":
                out_text.append(" ".join(toks[:-1]))
            else:
                out_text.append(" ".join(reversed(toks)))
        return pa.table(
            {
                id_col: pa.array(out_ids, pa.int64()),
                "text": pa.array(out_text, pa.string()),
            }
        )

    return ids_ds.select_columns([id_col]).map_batches(gen, batch_format="pyarrow")
