"""Benchmark decontamination for training corpora.

Flags documents that contain any n-token window from a benchmark
snippet set — the GPT-3 Appendix-C / PaLM-style 13-gram decontamination
rule (Brown et al. 2020): a training document is contaminated when any
13-token window of its text exactly matches a window drawn from an
evaluation benchmark.

Scale shape (100 TB): the benchmark side is SMALL by nature (eval
suites are thousands of documents → at most a few hundred thousand
snippets of ~100 bytes), so it is collected once, deduplicated,
broadcast via ``ray.put`` and turned into one frozenset per worker
process; the corpus side streams through ``map_batches`` doing O(tokens)
hash-set probes per document. Nothing about the corpus materializes and
no shuffle is involved — the operator is embarrassingly parallel.

Token semantics use the explicit ASCII whitespace class ``[ \\t\\n\\r\\f]+``
on both the Ray side and the DuckDB oracle (DuckDB RE2 ``\\s`` is
ASCII-only; keeping the class explicit makes the two sides provably
identical — same convention as simhash/top_terms).

Reference analog: none (beyond-reference LLM-data-pipeline operator).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# explicit ASCII whitespace — must match the oracle's string_split_regex
_WS_RE = re.compile(r"[ \t\n\r\f]+")
_STRIP = " \t\n\r\f"


def _tokens(text: str) -> list[str]:
    stripped = text.strip(_STRIP)
    if not stripped:
        return []
    return _WS_RE.split(stripped)


def snippet_of(text: str, skip: int = 2, n_tokens: int = 13) -> str | None:
    """The benchmark snippet drawn from one document: tokens
    ``[skip, skip + n_tokens)`` joined by a single space, or None when
    the document is too short to yield a full window."""
    toks = _tokens(text)
    if len(toks) < skip + n_tokens:
        return None
    return " ".join(toks[skip:skip + n_tokens])


def benchmark_snippets(ds, every: int = 97, skip: int = 2,
                       n_tokens: int = 13) -> list[str]:
    """Derive a deterministic benchmark snippet set from the corpus
    itself: every ``every``-th document (by doc_id) contributes its
    tokens[skip : skip+n_tokens] window.  In production the snippets
    come from real eval suites; the derivation here exists so tests and
    oracles need no external data.

    ONE pruned, filtered pass over (doc_id, text); only the ~1/every
    benchmark subset ever reaches the driver (the benchmark side is the
    small side by construction — identical to a real eval suite)."""
    import pyarrow.compute as pc

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = (ids % every) == 0
        batch = batch.filter(pa.array(keep))
        snips = [snippet_of(t, skip, n_tokens)
                 for t in batch.column("text").to_pylist()]
        snips = [s for s in snips if s is not None]
        return pa.table({"snippet": pa.array(snips, pa.string())})

    parts = list(ds.map_batches(pick, batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow"))
    if not parts:
        return []
    col = pa.concat_tables(parts).column("snippet")
    return sorted(set(pc.unique(col.combine_chunks()).to_pylist()))


# per-process SINGLE-SLOT cache [key, frozenset]: a dict keyed by
# ObjectRef hex pinned every past broadcast for the process lifetime
# (repeated runs on long-lived workers leaked each old snippet set)
_SNIPPET_CACHE: list = [None, None]


def decontam_flags(ds, snippets: list[str], n_tokens: int = 13):
    """Append (n_hits, contaminated) per document: n_hits = number of
    ``n_tokens``-token windows of the document that exactly match a
    benchmark snippet; contaminated = 1 when n_hits > 0.

    Broadcast: snippets are ``ray.put`` once; each worker process builds
    the frozenset once (keyed by the ObjectRef) and probes it with every
    window — O(doc tokens) per document regardless of benchmark size."""
    import ray

    ref = ray.put(list(snippets))
    key = ref.hex()

    def flag(batch: pa.Table) -> pa.Table:
        if _SNIPPET_CACHE[0] != key:
            _SNIPPET_CACHE[0] = key
            _SNIPPET_CACHE[1] = frozenset(ray.get(ref))
        bench = _SNIPPET_CACHE[1]
        hits = np.zeros(batch.num_rows, dtype=np.int64)
        if bench:
            for i, text in enumerate(batch.column("text").to_pylist()):
                toks = _tokens(text)
                n = 0
                for j in range(len(toks) - n_tokens + 1):
                    if " ".join(toks[j:j + n_tokens]) in bench:
                        n += 1
                hits[i] = n
        batch = batch.append_column("n_hits", pa.array(hits, pa.int64()))
        return batch.append_column(
            "contaminated", pa.array((hits > 0).astype(np.int64), pa.int64()))

    return ds.map_batches(flag, batch_format="pyarrow")


def drop_contaminated(ds, snippets: list[str], n_tokens: int = 13):
    """Streaming filter form: keep only uncontaminated documents, with
    the flag columns removed (pipeline building block for clean_corpus-
    style compositions)."""
    flagged = decontam_flags(ds, snippets, n_tokens)

    def keep(batch: pa.Table) -> pa.Table:
        mask = batch.column("contaminated").to_numpy(zero_copy_only=False) == 0
        return batch.filter(pa.array(mask)).drop_columns(
            ["n_hits", "contaminated"])

    return flagged.map_batches(keep, batch_format="pyarrow")
