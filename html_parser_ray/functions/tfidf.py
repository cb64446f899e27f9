"""TF-IDF-style salient-term extraction with a broadcast document-
frequency table — the canonical "small side broadcast, big side streams"
two-pass corpus statistic.

Pass 1 (df): per-batch partial document-frequency counts (each doc
contributes each distinct word once, combined WITHIN the batch before
anything shuffles) → one small groupby over (word, partial_df) rows →
df table, bounded by vocabulary size.

Pass 2 (score): the df table is `ray.put` ONCE and read from the local
object store by every task (never re-shipped per batch); each batch
computes per-doc term frequencies and the salience score

    score = tf × ((N × 1000) // df)

an integer-exact idf surrogate (monotone in tf/df for fixed N; log-free
so a DuckDB oracle reproduces it bit-for-bit — float ln() across engines
is exactly the kind of cross-engine hazard the simhash oracle hit).
Top term per doc by (score DESC, word ASC).

At 100 TB the broadcast side is the vocabulary: fine for word-level
vocabularies (≤ ~10M terms ≈ a few hundred MB); for unbounded n-gram
vocabularies the df table would be pruned by min-df before the
broadcast (documented knob, not needed here).
"""

from __future__ import annotations

import re

import pyarrow as pa

from .common import _tokens_of


def document_frequency(ds):
    """Dataset[..., text] → Dataset(word, df). Partial-combined per
    batch; only (word, partial_df) rows cross the exchange."""
    from ray.data.aggregate import Sum

    def partial_df(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for text in batch.column("text").to_pylist():
            for tok in set(_tokens_of(text)):
                counts[tok] = counts.get(tok, 0) + 1
        return pa.table({"word": pa.array(list(counts), pa.string()),
                         "df": pa.array(list(counts.values()), pa.int64())})

    return ds.map_batches(partial_df, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("df", alias_name="df"))


def top_terms(ds, n_docs: int):
    """Dataset[doc_id, text] → Dataset(doc_id, top_term, tf, df, score):
    the most salient term per document. Empty docs get
    ('', 0, 0, 0)."""
    import ray

    df_rows = document_frequency(ds).take_all()   # vocabulary-bounded
    df_map = {r["word"]: r["df"] for r in df_rows}
    df_ref = ray.put(df_map)

    def score_batch(batch: pa.Table) -> pa.Table:
        dfm = ray.get(df_ref)
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        terms, tfs, dfs, scores = [], [], [], []
        for text in texts:
            tf: dict[str, int] = {}
            for tok in _tokens_of(text):
                tf[tok] = tf.get(tok, 0) + 1
            if not tf:
                terms.append("")
                tfs.append(0)
                dfs.append(0)
                scores.append(0)
                continue
            best_w, best_s = None, -1
            for w, c in tf.items():
                s = c * ((n_docs * 1000) // dfm[w])
                if s > best_s or (s == best_s and w < best_w):
                    best_w, best_s = w, s
            terms.append(best_w)
            tfs.append(tf[best_w])
            dfs.append(dfm[best_w])
            scores.append(best_s)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "top_term": pa.array(terms, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
            "df": pa.array(dfs, pa.int64()),
            "score": pa.array(scores, pa.int64()),
        })

    return ds.map_batches(score_batch, batch_format="pyarrow")
