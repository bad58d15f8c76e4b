"""Mandated documents-table IO (BASELINE.json input_hint): columns
``doc_id: string``, ``spans: list<struct<kind, text, media_ref, offset>>``.

The north star names Lance as the table format. The ``lance`` library is
not installed in this environment (no network), so:

- ``format="lance"`` uses ``ray.data.read_lance`` when the library is
  importable and raises a clear error naming the missing dependency when
  it is not (honest gate, not a silent fallback);
- ``format="parquet"`` (and the ``auto`` default, which sniffs the path)
  reads the identical schema from Parquet — the layout the driver's
  testdata ships. All downstream stages are format-agnostic: they see a
  ``ray.data.Dataset`` of zero-copy Arrow blocks either way.
"""

from __future__ import annotations

import os


def _lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_docs(path: str, format: str = "auto", columns: list[str] | None = None):
    """Documents table -> Dataset (doc_id, spans[, ...]).

    ``format``: "auto" (sniff: ``.lance`` dir -> lance, else parquet),
    "lance", or "parquet".
    """
    import ray.data as rd

    if format == "auto":
        format = "lance" if path.rstrip("/").endswith(".lance") else "parquet"
    if format == "lance":
        if not _lance_available():
            raise ImportError(
                "reading Lance tables requires the 'lance' (pylance) library, "
                "which is not installed in this environment; write/read the "
                "same schema as Parquet (format='parquet') instead"
            )
        return rd.read_lance(path, columns=columns)
    if format == "parquet":
        return rd.read_parquet(path, columns=columns)
    raise ValueError(f"unknown format: {format}")


def write_docs(ds, path: str, format: str = "auto", **kwargs):
    """Dataset -> documents table on disk (partitioned files, resumable)."""
    if format == "auto":
        format = "lance" if path.rstrip("/").endswith(".lance") else "parquet"
    if format == "lance":
        if not _lance_available():
            raise ImportError(
                "writing Lance tables requires the 'lance' (pylance) library, "
                "which is not installed in this environment; use format='parquet'"
            )
        return ds.write_lance(path, **kwargs)
    if format == "parquet":
        return ds.write_parquet(path, **kwargs)
    raise ValueError(f"unknown format: {format}")


def docs_path_format(path: str) -> str:
    """Best-effort sniff for logging/UX."""
    if path.rstrip("/").endswith(".lance"):
        return "lance"
    if os.path.isdir(path) or path.endswith((".parquet", ".pq")):
        return "parquet"
    return "parquet"
