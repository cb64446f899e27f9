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

Scale shape (100-TB posture):
- pass 1 computes (word, cnt) with per-batch partial combine (only
  partial-count rows shuffle) + one vocabulary-bounded groupby;
- ``n_total`` is a DISTRIBUTED Sum over the unpruned count table — the
  unpruned vocabulary never reaches the driver;
- the ``min_count`` prune runs INSIDE the dataset before any
  ``take_all``; pruned tokens fall back to cnt=1 (max surprisal), which
  is also what any out-of-vocabulary token costs, so pruning only
  saturates the score of already-rare tokens and never shifts N;
- the pruned table is broadcast (``ray.put`` once, zero-copy reads)
  only while it fits ``broadcast_limit`` rows; past the limit the model
  stays a Dataset and scoring switches to a partitioned LEFT OUTER join
  (exploded (doc_id, word, occ) rows × count table) + one per-doc
  groupby — same pattern as linkgraph.pagerank's distributed fallback.
  Both paths produce bit-identical scores (pytest-pinned).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .common import _tokens_of

# Broadcast guard: rows of the (word, cnt) table shipped to the driver /
# object store. ~50M rows ≈ low-GB pickled — fine for one node's heap;
# web-scale hapax vocabularies blow past it and take the join path.
DEFAULT_BROADCAST_LIMIT = 50_000_000


class DistributedCounts:
    """Marker model payload: the count table stayed a (materialized)
    Dataset because it exceeded ``broadcast_limit``. Scoring dispatches
    to the partitioned-join path when it sees this."""

    def __init__(self, counts_ds):
        self.counts_ds = counts_ds


def _ilog2(x: int) -> int:
    return x.bit_length() - 1


def _ilog2_np(arr: np.ndarray) -> np.ndarray:
    """Vectorized floor(log2) for positive int64 — exact via frexp
    (counts ≤ ~2^53 tokens ≫ any real corpus, so the float64 cast is
    lossless; frexp(2^k) = (0.5, k+1) exactly, no log2 rounding)."""
    _m, e = np.frexp(arr.astype(np.float64))
    return (e - 1).astype(np.int64)


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


def lm_unigram_model(ds, min_count: int = 1,
                     broadcast_limit: int = DEFAULT_BROADCAST_LIMIT):
    """ONE corpus count pass → (payload, log_n) where payload is a
    ``dict`` word→cnt (broadcast path) or a :class:`DistributedCounts`
    (vocabulary > ``broadcast_limit`` — the table never leaves the
    cluster). ``n_total`` (hence ilog2(N)) is a distributed Sum over the
    UNPRUNED counts — pruning must only saturate already-rare tokens
    (cnt falls back to 1), never shift every document's surprisal by
    changing N. Reusable: lm_filter's threshold pass and output pass
    share one model (the materialized table is reused on the join
    path)."""
    import pyarrow.compute as pc

    counts = token_counts_table(ds, min_count=1).materialize()
    n_total = counts.sum("cnt") or 0
    log_n = _ilog2(n_total) if n_total else 0
    pruned = counts
    if min_count > 1:
        pruned = counts.map_batches(
            lambda b: b.filter(pc.greater_equal(b.column("cnt"),
                                                min_count)),
            batch_format="pyarrow").materialize()
    if pruned.count() > broadcast_limit:
        return DistributedCounts(pruned), log_n
    cnt_map = {r["word"]: r["cnt"] for r in pruned.take_all()}
    return cnt_map, log_n


def lm_score(ds, min_count: int = 1, model=None,
             broadcast_limit: int = DEFAULT_BROADCAST_LIMIT,
             num_partitions: int = 16):
    """Dataset[doc_id, text, ...] → Dataset(doc_id, n_tokens, nll_bits,
    mean_bits_bp) — unigram-LM surprisal per document (see module
    docstring for the exact rule). Pass ``model`` from
    lm_unigram_model to reuse one count pass across calls."""
    import ray

    payload, log_n = (model if model is not None
                      else lm_unigram_model(ds, min_count, broadcast_limit))
    if isinstance(payload, DistributedCounts):
        return _lm_score_joined(ds, payload.counts_ds, log_n,
                                num_partitions)
    cnt_ref = ray.put(payload)

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


def _finish_doc_scores(grouped):
    """(doc_id, n_tokens, nll_bits) → + mean_bits_bp, column order pinned
    to the broadcast path's output."""
    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        nll = batch.column("nll_bits").to_numpy(zero_copy_only=False)
        mean = np.where(n > 0, nll * 10_000 // np.maximum(n, 1), 0)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": batch.column("n_tokens"),
            "nll_bits": batch.column("nll_bits"),
            "mean_bits_bp": pa.array(mean, pa.int64()),
        })

    return grouped.map_batches(finish, batch_format="pyarrow")


def _lm_score_joined(ds, counts_ds, log_n: int, num_partitions: int):
    """Over-limit path: per-doc token bags join the count Dataset on
    ``word`` (LEFT OUTER — missing/pruned words fall back to cnt=1),
    then one per-doc groupby sums the bits. Only (doc_id, word, occ)
    rows and the count table shuffle; document text never does."""
    from ray.data.aggregate import Max, Sum

    def explode(batch: pa.Table) -> pa.Table:
        ids_out, words, occs, ntoks = [], [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            toks = _tokens_of(text)
            if not toks:
                ids_out.append(doc_id)
                words.append("")          # placeholder: occ=0 → bits=0
                occs.append(0)
                ntoks.append(0)
                continue
            tf: dict[str, int] = {}
            for t in toks:
                tf[t] = tf.get(t, 0) + 1
            for w, c in tf.items():
                ids_out.append(doc_id)
                words.append(w)
                occs.append(c)
                ntoks.append(len(toks))
        return pa.table({
            "doc_id": pa.array(ids_out, pa.int64()),
            "word": pa.array(words, pa.string()),
            "occ": pa.array(occs, pa.int64()),
            "n_tok": pa.array(ntoks, pa.int64()),
        })

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    if counts_ds.count() == 0:
        # an EMPTY count table (empty corpus, or min_count pruned
        # everything) loses its schema and the join cannot resolve the
        # key — and semantically every lookup would fall back to cnt=1
        # anyway, so synthesize that directly
        joined = exploded.map_batches(
            lambda b: b.append_column(
                "cnt", pa.array(np.ones(b.num_rows, np.int64))),
            batch_format="pyarrow")
    else:
        joined = exploded.join(counts_ds, "left_outer", num_partitions,
                               on=("word",))

    def bits(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cnt = pc.fill_null(batch.column("cnt"), 1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        occ = batch.column("occ").to_numpy(zero_copy_only=False)
        b = (log_n - _ilog2_np(np.maximum(cnt, 1))) * occ
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tok": batch.column("n_tok"),
            "bits": pa.array(b, pa.int64()),
        })

    grouped = (joined.map_batches(bits, batch_format="pyarrow")
               .groupby("doc_id")
               .aggregate(Max("n_tok", alias_name="n_tokens"),
                          Sum("bits", alias_name="nll_bits")))
    return _finish_doc_scores(grouped)


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


def bigram_lm_score(ds, min_count: int = 1,
                    broadcast_limit: int = DEFAULT_BROADCAST_LIMIT,
                    num_partitions: int = 16):
    """Dataset[doc_id, text, ...] → Dataset(doc_id, n_tokens, nll_bits,
    mean_bits_bp) — bigram-conditional LM surprisal, integer-exact:

        first token:   bits = ilog2(N_total) - ilog2(cnt1(w))
        later tokens:  bits = ilog2(cnt1(w_prev)) - ilog2(cnt2(w_prev, w))
        nll_bits      = Σ bits;  mean_bits_bp = nll * 10_000 // n_tokens

    The conditional term is the integer skeleton of -log2 P(w|w_prev) =
    log2 cnt(w_prev) - log2 cnt(w_prev,w) — a strictly sharper quality
    signal than the unigram score (word-salad with common words scores
    high here and low there). Unseen/pruned lookups fall back to cnt=1
    (max surprisal). Same bounded-broadcast-or-join shape as lm_score:
    ``n_total`` is a distributed Sum, the ``min_count`` prune runs
    inside the dataset, and past ``broadcast_limit`` the uni+bigram
    tables stay Datasets and scoring becomes two partitioned LEFT OUTER
    joins + one per-doc groupby (bit-identical, pytest-pinned)."""
    import ray

    uni = token_counts_table(ds, min_count=1).materialize()
    n_total = uni.sum("cnt") or 0
    log_n = _ilog2(n_total) if n_total else 0
    big = bigram_counts_table(ds, min_count=min_count).materialize()

    if uni.count() > broadcast_limit or big.count() > broadcast_limit:
        return _bigram_joined(ds, uni, big, log_n, num_partitions)

    cnt_map = {r["word"]: r["cnt"] for r in uni.take_all()}
    big_map = {(r["w1"], r["w2"]): r["cnt"] for r in big.take_all()}
    uni_ref = ray.put(cnt_map)
    big_ref = ray.put(big_map)

    def score(batch: pa.Table) -> pa.Table:
        uni_m = ray.get(uni_ref)
        big_m = ray.get(big_ref)
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        n_toks, nlls, means = [], [], []
        for text in texts:
            toks = _tokens_of(text)
            if toks:
                nll = log_n - _ilog2(uni_m.get(toks[0], 1))
                for a, b in zip(toks, toks[1:]):
                    nll += max(0, _ilog2(uni_m.get(a, 1))
                               - _ilog2(big_m.get((a, b), 1)))
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


def _bigram_joined(ds, uni_ds, big_ds, log_n: int, num_partitions: int):
    """Over-limit path for the bigram score. Row kinds from the explode:
    kind=0 first-token rows (bits = log_n − ilog2(cnt1)), kind=1
    adjacent-pair rows combined per doc (bits = max(0, ilog2(cnt1(w1)) −
    ilog2(cnt2(w1,w2))) × occ), kind=2 empty-doc placeholders (bits=0).
    Two LEFT OUTER joins attach cnt2 (on (w1,w2)) and cnt1 (on w1);
    nulls — pruned or placeholder — fall back to 1 exactly like the
    broadcast maps' ``.get(…, 1)``."""
    from ray.data.aggregate import Max, Sum
    import pyarrow.compute as pc

    uni2 = uni_ds.map_batches(
        lambda b: b.rename_columns(["w1", "cnt1"]),
        batch_format="pyarrow")
    big2 = big_ds.map_batches(
        lambda b: b.rename_columns(["w1", "w2", "cnt2"]),
        batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        ids_out, kinds, w1s, w2s, occs, ntoks = [], [], [], [], [], []

        def emit(doc_id, kind, w1, w2, occ, ntok):
            ids_out.append(doc_id)
            kinds.append(kind)
            w1s.append(w1)
            w2s.append(w2)
            occs.append(occ)
            ntoks.append(ntok)

        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            toks = _tokens_of(text)
            if not toks:
                emit(doc_id, 2, "", "", 0, 0)
                continue
            emit(doc_id, 0, toks[0], "", 1, len(toks))
            pf: dict[tuple[str, str], int] = {}
            for a, b in zip(toks, toks[1:]):
                pf[(a, b)] = pf.get((a, b), 0) + 1
            for (a, b), c in pf.items():
                emit(doc_id, 1, a, b, c, len(toks))
        return pa.table({
            "doc_id": pa.array(ids_out, pa.int64()),
            "kind": pa.array(kinds, pa.int64()),
            "w1": pa.array(w1s, pa.string()),
            "w2": pa.array(w2s, pa.string()),
            "occ": pa.array(occs, pa.int64()),
            "n_tok": pa.array(ntoks, pa.int64()),
        })

    def _const_col(upstream, name):
        # empty side: schema-less join would fail; every lookup falls
        # back to 1 anyway (same rule as the broadcast maps' .get(…, 1))
        return upstream.map_batches(
            lambda b: b.append_column(
                name, pa.array(np.ones(b.num_rows, np.int64))),
            batch_format="pyarrow")

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    if big_ds.count() == 0:
        j1 = _const_col(exploded, "cnt2")
    else:
        j1 = exploded.join(big2, "left_outer", num_partitions,
                           on=("w1", "w2"))
    if uni_ds.count() == 0:
        j2 = _const_col(j1, "cnt1")
    else:
        j2 = j1.join(uni2, "left_outer", num_partitions, on=("w1",))

    def bits(batch: pa.Table) -> pa.Table:
        cnt1 = pc.fill_null(batch.column("cnt1"), 1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        cnt2 = pc.fill_null(batch.column("cnt2"), 1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        kind = batch.column("kind").to_numpy(zero_copy_only=False)
        occ = batch.column("occ").to_numpy(zero_copy_only=False)
        il1 = _ilog2_np(np.maximum(cnt1, 1))
        il2 = _ilog2_np(np.maximum(cnt2, 1))
        b = np.where(kind == 0, log_n - il1,
                     np.maximum(il1 - il2, 0)) * occ
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tok": batch.column("n_tok"),
            "bits": pa.array(b, pa.int64()),
        })

    grouped = (j2.map_batches(bits, batch_format="pyarrow")
               .groupby("doc_id")
               .aggregate(Max("n_tok", alias_name="n_tokens"),
                          Sum("bits", alias_name="nll_bits")))
    return _finish_doc_scores(grouped)
