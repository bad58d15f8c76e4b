"""Product-title spec extraction for the scorer's title features.

Deterministic stand-in for the reference's LLM normalization rules for
computer titles (DeepMather/computer/single.py:40-64): extract and
canonicalize the attributes the prompt tells the LLM to preserve — part
numbers, capacity, interface/bus (with the prompt's own equivalences,
e.g. "SATA III" == "SATA 6Gb/s"), speed, form factor — so that two
listings of the same part agree on them and different parts conflict.

All functions take an ALREADY-NORMALIZED name (normalizers.normalize_name
output: lowercase, punctuation stripped, roman numerals arabicized), so
"SATA 6Gb/s" arrives as "sata 6gb s" and "SATA III" as "sata 3".
Pure functions of the string — safe to memoize per scorer actor.
"""

from __future__ import annotations

import re

# --- interface/bus/speed/form-factor canonicalization --------------------
# order matters: longest/most-specific first. Patterns are written against
# normalize_name output ("/" and "." are stripped to spaces).
_SPEC_PATTERNS: list[tuple[re.Pattern, str]] = [
    # SATA revisions (single.py: "SATA III / SATA 3 -> SATA 6Gb/s")
    (re.compile(r"\bsata\s*6\s*gb\s*s?\b"), "sata6g"),
    (re.compile(r"\bsata\s*3\s*gb\s*s\b"), "sata3g"),
    (re.compile(r"\bsata\s*1\s*5\s*gb\s*s\b"), "sata1g5"),
    (re.compile(r"\bsata\s*3\b"), "sata6g"),
    (re.compile(r"\bsata\s*2\b"), "sata3g"),
    (re.compile(r"\bsata\s*1\b"), "sata1g5"),
    (re.compile(r"\bsata\b"), "sata"),
    # USB (single.py: "USB 3.1 Gen1 -> USB 3.0; keep Gen2 if explicit")
    (re.compile(r"\busb\s*3\s*(?:1|2)?\s*gen\s*2\b"), "usb3gen2"),
    (re.compile(r"\busb\s*3(?:\s*(?:0|1))?\s*(?:gen\s*1)?\b"), "usb3"),
    (re.compile(r"\busb\s*2(?:\s*0)?\b"), "usb2"),
    (re.compile(r"\busb\s*c\b"), "usbc"),
    # memory generation + speed ("ddr4 2400" after normalization)
    (re.compile(r"\bddr(\d)\s*(\d{3,4})\b"), r"ddr\1-\2"),
    (re.compile(r"\bddr\s*(\d)\b"), r"ddr\1"),
    # PCIe generation/lanes ("pcie 3 x4", "pci e 3 0 x 4")
    (re.compile(r"\bpci\s*e?\s*(\d)(?:\s*0)?\s*x\s*(\d{1,2})\b"), r"pcie\1x\2"),
    (re.compile(r"\bpci\s*e\b|\bpcie\b"), "pcie"),
    (re.compile(r"\bnvme\b"), "nvme"),
    # spindle speed ("7200rpm" or "7200 rpm")
    (re.compile(r"\b(\d{4,5})\s*rpm\b"), r"\1rpm"),
    # M.2 form factor + size ("m 2 2280")
    (re.compile(r"\bm\s*2\s*(22(?:30|42|60|80)|2280)\b"), r"m2-\1"),
    (re.compile(r"\bm\s*2\b"), "m2"),
    # drive form factor: 2.5"/3.5"/1.8" arrive as "2 5" / "3 5 inch" / "1 8"
    (re.compile(r"\b([123])\s(5|8)(?:\s*inch(?:es)?|\s*in\b)?\b"), r"\1.\2in"),
]

# capacity: value + tb/gb/mb unit, possibly fused ("250gb") or spaced
# ("6 tb"); kit notation "2x4gb" contributes its module size
_CAP_RE = re.compile(r"\b(\d+(?:\s\d)?)\s*(tb|gb|mb)\b")

# SKU-ish tokens: letters+digits, length >= 5 ("st2000dm006", "wd60efrx",
# "7te250bw"); capacity/speed tokens are excluded by the filters below
_SKU_EXCLUDE = re.compile(r"^\d+(tb|gb|mb|rpm)$|^(ddr|usb|pcie|sata)\d*")


def title_profile(norm_name: str) -> tuple[frozenset, frozenset, frozenset]:
    """(spec, capacity, sku) token sets for one normalized title.

    Spec patterns run first and CONSUME their spans ("sata 6gb s" must not
    leak a 6gb capacity), then capacities are read off the residual, then
    SKU-ish tokens off what remains."""
    spec = set()
    for pat, repl in _SPEC_PATTERNS:
        def _add(m, repl=repl):
            spec.add(m.expand(repl))
            return " "  # consume so the less-specific patterns can't re-match
        norm_name = pat.sub(_add, norm_name)

    cap = set()

    def _cap(m):
        num = m.group(1)
        if " " in num:
            whole, frac = num.split(" ")
            # decimal points arrive as spaces from normalize_name; accept
            # the fused reading ("1 5 tb" == 1.5 TB) only for a single
            # leading digit — "500 1 tb" reads as 1 TB
            num = f"{whole}.{frac}" if len(whole) == 1 else frac
        v = float(num)
        unit = m.group(2)
        gb = v * 1024 if unit == "tb" else v if unit == "gb" else v / 1024
        cap.add(f"{gb:g}gb")
        return " "

    norm_name = _CAP_RE.sub(_cap, norm_name)

    sku = set()
    for t in norm_name.split():
        if len(t) >= 5 and any(c.isdigit() for c in t) and any(c.isalpha() for c in t):
            if not _SKU_EXCLUDE.match(t):
                sku.add(t)
    return frozenset(spec), frozenset(cap), frozenset(sku)


def spec_tokens(norm_name: str) -> frozenset:
    """Canonical interface/speed/form-factor tokens found in the title."""
    return title_profile(norm_name)[0]


def capacity_tokens(norm_name: str) -> frozenset:
    """Canonical capacities in GB (e.g. '0.25gb', '2048gb')."""
    return title_profile(norm_name)[1]


def sku_tokens(norm_name: str) -> frozenset:
    """Part-number-like tokens (the prompt's 'keep part numbers exact')."""
    return title_profile(norm_name)[2]
