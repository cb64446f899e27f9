"""TF-IDF-style salient-term extraction with a bounded document-
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

100-TB posture: the broadcast side is the vocabulary. ``min_df`` prunes
the df table INSIDE the dataset before it is collected (pruned words
are excluded from candidacy — they are the ultra-rare tail; a doc whose
every word is pruned yields ('', 0, 0, 0)). If the pruned table still
exceeds ``broadcast_limit`` rows, the df table stays a Dataset and
scoring switches to a partitioned LEFT OUTER join over exploded
(doc_id, word, tf) rows + a hash-partitioned per-doc segment argmax —
bit-identical to the broadcast path (pytest-pinned), document text
never shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .common import _tokens_of
from .lmscore import DEFAULT_BROADCAST_LIMIT


def document_frequency(ds, min_df: int = 1):
    """Dataset[..., text] → Dataset(word, df). Partial-combined per
    batch; only (word, partial_df) rows cross the exchange. ``min_df``
    prunes inside the dataset — nothing below it reaches a driver."""
    from ray.data.aggregate import Sum

    def partial_df(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for text in batch.column("text").to_pylist():
            for tok in set(_tokens_of(text)):
                counts[tok] = counts.get(tok, 0) + 1
        return pa.table({"word": pa.array(list(counts), pa.string()),
                         "df": pa.array(list(counts.values()), pa.int64())})

    out = ds.map_batches(partial_df, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("df", alias_name="df"))
    if min_df > 1:
        import pyarrow.compute as pc
        out = out.map_batches(
            lambda b: b.filter(pc.greater_equal(b.column("df"), min_df)),
            batch_format="pyarrow")
    return out


def top_terms(ds, n_docs: int, min_df: int = 1,
              broadcast_limit: int = DEFAULT_BROADCAST_LIMIT,
              num_partitions: int = 16):
    """Dataset[doc_id, text] → Dataset(doc_id, top_term, tf, df, score):
    the most salient term per document among words with df ≥ ``min_df``.
    Docs with no candidate words get ('', 0, 0, 0)."""
    import ray

    df_ds = document_frequency(ds, min_df=min_df).materialize()
    if df_ds.count() > broadcast_limit:
        return _top_terms_joined(ds, df_ds, n_docs, num_partitions)

    df_map = {r["word"]: r["df"] for r in df_ds.take_all()}
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
            best_w, best_s = None, -1
            for w, c in tf.items():
                d = dfm.get(w)
                if d is None:            # pruned below min_df
                    continue
                s = c * ((n_docs * 1000) // d)
                if s > best_s or (s == best_s and w < best_w):
                    best_w, best_s = w, s
            if best_w is None:
                terms.append("")
                tfs.append(0)
                dfs.append(0)
                scores.append(0)
                continue
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


def _argmax_block(group: pa.Table) -> pa.Table:
    """One hash partition of (doc_id, word, tf, df, score) rows → the
    (score DESC, word ASC) winner per doc_id — one lexsort + segment
    mask, no per-doc Python (topk.py's segment idiom)."""
    if group.num_rows == 0:
        return pa.table({
            "doc_id": pa.array([], pa.int64()),
            "top_term": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "df": pa.array([], pa.int64()),
            "score": pa.array([], pa.int64()),
        })
    ids = group.column("doc_id").to_numpy(zero_copy_only=False)
    scores = group.column("score").to_numpy(zero_copy_only=False)
    words = np.array(group.column("word").to_pylist(), dtype=object)
    _u, inv = np.unique(scores, return_inverse=True)
    desc_rank = (len(_u) - 1) - inv
    order = np.lexsort((words, desc_rank, ids))
    ids_sorted = ids[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = ids_sorted[1:] != ids_sorted[:-1]
    keep = order[first]
    out = group.take(pa.array(keep, pa.int64()))
    return pa.table({
        "doc_id": out.column("doc_id"),
        "top_term": out.column("word"),
        "tf": out.column("tf"),
        "df": out.column("df"),
        "score": out.column("score"),
    })


def _top_terms_joined(ds, df_ds, n_docs: int, num_partitions: int):
    """Over-limit path: exploded per-doc (word, tf) bags LEFT OUTER join
    the df Dataset (null df = pruned word or empty-doc placeholder —
    masked to the ('', 0) candidate with score 0, which only wins when a
    doc has no unpruned words), then a hash-partitioned segment argmax
    per doc."""
    from .dedup import _hash_part

    def explode(batch: pa.Table) -> pa.Table:
        ids_out, words, tfs = [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            tf: dict[str, int] = {}
            for tok in _tokens_of(text):
                tf[tok] = tf.get(tok, 0) + 1
            if not tf:
                ids_out.append(doc_id)
                words.append("")
                tfs.append(0)
                continue
            for w, c in tf.items():
                ids_out.append(doc_id)
                words.append(w)
                tfs.append(c)
        return pa.table({
            "doc_id": pa.array(ids_out, pa.int64()),
            "word": pa.array(words, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
        })

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    if df_ds.count() == 0:
        # empty df table (min_df pruned everything): schema-less join
        # would fail; every word is pruned → df=0 masks all candidates
        joined = exploded.map_batches(
            lambda b: b.append_column(
                "df", pa.array(np.zeros(b.num_rows, np.int64))),
            batch_format="pyarrow")
    else:
        joined = exploded.join(df_ds, "left_outer", num_partitions,
                               on=("word",))

    def score_part(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        df = pc.fill_null(batch.column("df"), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        tf = batch.column("tf").to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        pruned = df == 0
        score = np.where(pruned, 0,
                         tf * ((n_docs * 1000) // np.maximum(df, 1)))
        words = np.array(batch.column("word").to_pylist(), dtype=object)
        words[pruned] = ""               # mask pruned → placeholder
        tf = np.where(pruned, 0, tf)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "word": pa.array(list(words), pa.string()),
            "tf": pa.array(tf, pa.int64()),
            "df": pa.array(df, pa.int64()),
            "score": pa.array(score, pa.int64()),
            "part": pa.array(_hash_part(ids.astype(np.uint64),
                                        num_partitions), pa.int64()),
        })

    return (joined.map_batches(score_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(lambda g: _argmax_block(g.drop_columns(["part"])),
                        batch_format="pyarrow"))
