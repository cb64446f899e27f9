"""C4-style line-level cleaning (Raffel et al. 2020, §2.2 rules,
deterministic variant).

The named cleaning recipe of the C4 corpus, reduced to its deterministic
line/page rules so the result is exact and SQL-oracle-checkable:

line KEPT iff
  * it ends in a terminal punctuation mark (``. ! ? "``), and
  * it has at least 5 space-separated words, and
  * it does not contain the word "javascript" (case-insensitive).
page KEPT iff
  * at least 3 lines survive, and
  * the raw text contains neither "lorem ipsum" (case-insensitive)
    nor a curly brace ``{``.

Everything is a stateless per-row decision → one streaming
``map_batches`` pass, no shuffle, no driver state. Word counting uses a
space-only split within a line (lines cannot contain newlines), the
same explicit class the DuckDB oracle uses.

Reference analog: none (beyond-reference LLM-data-pipeline operator).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_TERMINAL = (".", "!", "?", '"')
_SPACES = re.compile(r" +")


def _line_kept(line: str) -> bool:
    if not line.endswith(_TERMINAL):
        return False
    stripped = line.strip(" ")
    if not stripped:
        return False
    if len(_SPACES.split(stripped)) < 5:
        return False
    return "javascript" not in line.lower()


def c4_clean_doc(text: str) -> tuple[str, int, int, int]:
    """→ (clean_text, n_kept, n_total, page_kept)."""
    lines = text.split("\n")
    kept = [ln for ln in lines if _line_kept(ln)]
    page_kept = int(len(kept) >= 3
                    and "lorem ipsum" not in text.lower()
                    and "{" not in text)
    return "\n".join(kept), len(kept), len(lines), page_kept


def c4_clean_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    rows = [c4_clean_doc(t) for t in texts]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "clean_text": pa.array([r[0] for r in rows], pa.string()),
        "n_lines_kept": pa.array([r[1] for r in rows], pa.int64()),
        "n_lines_total": pa.array([r[2] for r in rows], pa.int64()),
        "page_kept": pa.array([r[3] for r in rows], pa.int64()),
    })


def c4_clean(ds):
    """Dataset[(doc_id, text, ...)] → per-doc cleaned text + counters
    (all docs; filtering is a trivial downstream mask on page_kept)."""
    return ds.map_batches(c4_clean_batch, batch_format="pyarrow")


def c4_filter(ds):
    """Filtered form: only surviving pages, text replaced by the cleaned
    lines."""
    def keep(batch: pa.Table) -> pa.Table:
        mask = batch.column("page_kept").to_numpy(zero_copy_only=False) == 1
        out = batch.filter(pa.array(mask))
        return pa.table({"doc_id": out.column("doc_id"),
                         "text": out.column("clean_text")})
    return c4_clean(ds).map_batches(keep, batch_format="pyarrow")
