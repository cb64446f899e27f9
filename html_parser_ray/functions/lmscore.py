"""Unigram language-model scoring: corpus-level token statistics → a
per-document negative-log-likelihood quality score, the
perplexity-filtering step of CCNet-style pipelines (Wenzek et al. 2020,
public) with the LM reduced to the corpus's own unigram distribution so
the operator is self-contained and integer-exact.

Score (exact int64, no floats — bit-for-bit SQL-oracle-checkable):

    ilog2(x)      = bit_length(x) - 1          (floor of log2)
    bits(token w) = ilog2(N_total) - ilog2(cnt(w))   surprisal in whole
                                                      bits, occurrence-
                                                      weighted
    nll_bits      = Σ bits(w) over the doc's token stream
    mean_bits_bp  = nll_bits * 10_000 // n_tokens    (0 for empty docs)

High mean_bits ⇒ the doc is full of corpus-rare tokens (gibberish,
boilerplate hashes, foreign scripts) — the filtering signal. ilog2
matches SQL `length(bin(cnt)) - 1` exactly; float log() across engines
is the cross-engine hazard the simhash oracle hit, so it is avoided.

Scale shape: pass 1 computes (word, cnt) with per-batch partial combine
(only partial-count rows shuffle) + one vocabulary-bounded groupby; the
count table is `ray.put` ONCE and read zero-copy by every scoring task.
For unbounded vocabularies, `min_count` prunes the broadcast table —
pruned tokens fall back to cnt=1 (max surprisal), which is also what any
out-of-vocabulary token costs, so pruning only saturates the score of
already-rare tokens.
"""

from __future__ import annotations

import re

import pyarrow as pa

from .common import _tokens_of


def _ilog2(x: int) -> int:
    return x.bit_length() - 1


def token_counts_table(ds, min_count: int = 1):
    """Dataset[..., text] → Dataset(word, cnt): corpus occurrence counts,
    partial-combined per batch, pruned below ``min_count``."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for text in batch.column("text").to_pylist():
            for tok in _tokens_of(text):
                counts[tok] = counts.get(tok, 0) + 1
        return pa.table({"word": pa.array(list(counts), pa.string()),
                         "cnt": pa.array(list(counts.values()), pa.int64())})

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("cnt", alias_name="cnt"))
    if min_count > 1:
        import pyarrow.compute as pc
        out = out.map_batches(
            lambda b: b.filter(pc.greater_equal(b.column("cnt"),
                                                min_count)),
            batch_format="pyarrow")
    return out


def lm_unigram_model(ds, min_count: int = 1):
    """ONE corpus count pass → (cnt_map, log_n). ``n_total`` (hence
    ilog2(N)) is summed over the UNPRUNED counts — pruning must only
    saturate already-rare tokens (cnt falls back to 1), never shift
    every document's surprisal by changing N. Reusable: lm_filter's
    threshold pass and output pass share one model."""
    cnt_rows = token_counts_table(ds, min_count=1).take_all()
    n_total = sum(r["cnt"] for r in cnt_rows)
    cnt_map = {r["word"]: r["cnt"] for r in cnt_rows
               if r["cnt"] >= min_count}
    return cnt_map, (_ilog2(n_total) if n_total else 0)


def lm_score(ds, min_count: int = 1, model=None):
    """Dataset[doc_id, text, ...] → Dataset(doc_id, n_tokens, nll_bits,
    mean_bits_bp) — unigram-LM surprisal per document (see module
    docstring for the exact rule). Pass ``model`` from
    lm_unigram_model to reuse one count pass across calls."""
    import ray

    cnt_map, log_n = (model if model is not None
                      else lm_unigram_model(ds, min_count))
    cnt_ref = ray.put(cnt_map)

    def score(batch: pa.Table) -> pa.Table:
        cm = ray.get(cnt_ref)
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        n_toks, nlls, means = [], [], []
        for text in texts:
            toks = _tokens_of(text)
            nll = sum(log_n - _ilog2(cm.get(t, 1)) for t in toks)
            n_toks.append(len(toks))
            nlls.append(nll)
            means.append(nll * 10_000 // len(toks) if toks else 0)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_toks, pa.int64()),
            "nll_bits": pa.array(nlls, pa.int64()),
            "mean_bits_bp": pa.array(means, pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def bigram_counts_table(ds, min_count: int = 1):
    """Dataset[..., text] → Dataset(w1, w2, cnt): corpus adjacent-pair
    counts, partial-combined per batch (only (pair, partial-count) rows
    shuffle), pruned below ``min_count``. At web scale the bigram vocab
    is the table that NEEDS min_count pruning (Zipf tail ~ corpus
    size); pruned pairs fall back to cnt=1 at scoring time = maximum
    conditional surprisal, which is also what any unseen pair costs."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[tuple[str, str], int] = {}
        for text in batch.column("text").to_pylist():
            toks = _tokens_of(text)
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        return pa.table({
            "w1": pa.array([k[0] for k in counts], pa.string()),
            "w2": pa.array([k[1] for k in counts], pa.string()),
            "cnt": pa.array(list(counts.values()), pa.int64()),
        })

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["w1", "w2"]).aggregate(Sum("cnt", alias_name="cnt"))
    if min_count > 1:
        import pyarrow.compute as pc
        out = out.map_batches(
            lambda b: b.filter(pc.greater_equal(b.column("cnt"),
                                                min_count)),
            batch_format="pyarrow")
    return out


def bigram_lm_score(ds, min_count: int = 1):
    """Dataset[doc_id, text, ...] → Dataset(doc_id, n_tokens, nll_bits,
    mean_bits_bp) — bigram-conditional LM surprisal, integer-exact:

        first token:   bits = ilog2(N_total) - ilog2(cnt1(w))
        later tokens:  bits = ilog2(cnt1(w_prev)) - ilog2(cnt2(w_prev, w))
        nll_bits      = Σ bits;  mean_bits_bp = nll * 10_000 // n_tokens

    The conditional term is the integer skeleton of -log2 P(w|w_prev) =
    log2 cnt(w_prev) - log2 cnt(w_prev,w) — a strictly sharper quality
    signal than the unigram score (word-salad with common words scores
    high here and low there). Unseen/pruned lookups fall back to cnt=1
    (max surprisal). Same two-pass broadcast shape as lm_score; the
    bigram table is the one to prune via ``min_count`` at 100 TB."""
    import ray

    cnt_rows = token_counts_table(ds, min_count=1).take_all()
    cnt_map = {r["word"]: r["cnt"] for r in cnt_rows}
    n_total = sum(cnt_map.values())
    log_n = _ilog2(n_total) if n_total else 0
    big_rows = bigram_counts_table(ds, min_count=min_count).take_all()
    big_map = {(r["w1"], r["w2"]): r["cnt"] for r in big_rows}
    uni_ref = ray.put(cnt_map)
    big_ref = ray.put(big_map)

    def score(batch: pa.Table) -> pa.Table:
        uni = ray.get(uni_ref)
        big = ray.get(big_ref)
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        n_toks, nlls, means = [], [], []
        for text in texts:
            toks = _tokens_of(text)
            if toks:
                nll = log_n - _ilog2(uni.get(toks[0], 1))
                for a, b in zip(toks, toks[1:]):
                    nll += max(0, _ilog2(uni.get(a, 1))
                               - _ilog2(big.get((a, b), 1)))
            else:
                nll = 0
            n_toks.append(len(toks))
            nlls.append(nll)
            means.append(nll * 10_000 // len(toks) if toks else 0)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_toks, pa.int64()),
            "nll_bits": pa.array(nlls, pa.int64()),
            "mean_bits_bp": pa.array(means, pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")
