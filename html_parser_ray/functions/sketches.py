"""Distributed summary operators: heavy-hitter top-k words and exact
quantiles — the sketch/summary layer a 100-TB corpus profile needs.

Both follow the same scale shape: a per-batch PARTIAL summary inside
`map_batches` (bounded output per batch, independent of batch row count),
one small `groupby` over the partials, and a driver-side finish over a
result whose size is bounded by the summary capacity — never by the
corpus. Nothing unbounded ever reaches the driver.

heavy-hitter pattern (two-phase, exact result):
  1. Misra-Gries summary per batch (capacity m): at most m (word, weight)
     rows per batch, each weight an UNDERestimate with error ≤
     batch_tokens/(m+1). Merging by summation keeps the mergeable-summary
     guarantee (Agarwal et al. 2012, "Mergeable Summaries"): global
     underestimate with error ≤ N/(m+1).
  2. Candidate prune: top (candidate_factor × k) summary words by merged
     weight. Any true top-k word is present as long as its frequency gap
     vs the cut exceeds N/(m+1) — size m generously (default 4096).
  3. Exact verify: broadcast the candidate vocabulary (ray.put), recount
     ONLY candidates in one more pass, exact groupby-sum, top-k with the
     deterministic (count DESC, word ASC) order.
The final answer is EXACT (sketch only prunes), so a plain SQL word-count
top-k oracles it.

exact quantiles via value histogram:
  per-batch value-counts → groupby(value).sum → the histogram (bounded by
  value CARDINALITY, not row count) is sorted on the driver and walked by
  cumulative count. Rank rule pinned to DuckDB's quantile_disc:
  rank = max(1, ceil(q·n)) over the sorted multiset, computed in exact
  integer arithmetic (q in basis points) — verified against DuckDB at
  n ∈ {4,5,10,20,...,50000}. Right when cardinality ≪ rows (ints, enums,
  bucketed floats); for unbounded-cardinality columns a KLL/GK sketch
  would replace the histogram (documented trade, not needed here).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .common import _tokens_of  # noqa: F401 (re-exported: invindex, cms)


def misra_gries(tokens: list[str], capacity: int) -> dict[str, int]:
    """Classic Misra-Gries frequent-items summary: ≤ capacity counters,
    each an underestimate by at most len(tokens)/(capacity+1)."""
    counters: dict[str, int] = {}
    for tok in tokens:
        if tok in counters:
            counters[tok] += 1
        elif len(counters) < capacity:
            counters[tok] = 1
        else:
            dead = [w for w in counters if counters[w] == 1]
            for w in counters:
                counters[w] -= 1
            for w in dead:
                del counters[w]
    return counters


def heavy_hitter_words(ds, k: int = 10, capacity: int = 4096,
                       candidate_factor: int = 4):
    """Dataset[..., text] → pa.Table(word, count) of the EXACT top-k
    words (count DESC, word ASC), computed sketch-first. Returns a small
    in-memory table (≤ k rows) — the driver-side finish is bounded by
    candidate_factor × k, never by the corpus."""
    import ray
    from ray.data.aggregate import Sum

    def summarize(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for text in batch.column("text").to_pylist():
            toks.extend(_tokens_of(text))
        counters = misra_gries(toks, capacity)
        return pa.table({"word": pa.array(list(counters), pa.string()),
                         "wt": pa.array(list(counters.values()), pa.int64())})

    merged = ds.map_batches(summarize, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("wt", alias_name="wt"))
    # (wt DESC, word ASC) — the word tie-break mirrors the final output
    # order, so weight ties at the candidate cut keep exactly the words
    # the exact top-k would select, instead of an arbitrary subset.
    cand = merged.sort(["wt", "word"], descending=[True, False]) \
        .limit(candidate_factor * k).take_all()
    cand_words = frozenset(r["word"] for r in cand)
    cand_ref = ray.put(cand_words)

    def recount(batch: pa.Table) -> pa.Table:
        vocab = ray.get(cand_ref)
        counts: dict[str, int] = {}
        for text in batch.column("text").to_pylist():
            for tok in _tokens_of(text):
                if tok in vocab:
                    counts[tok] = counts.get(tok, 0) + 1
        return pa.table({"word": pa.array(list(counts), pa.string()),
                         "count": pa.array(list(counts.values()), pa.int64())})

    exact = ds.map_batches(recount, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("count", alias_name="count")) \
        .take_all()
    exact.sort(key=lambda r: (-r["count"], r["word"]))
    top = exact[:k]
    return pa.table({"word": pa.array([r["word"] for r in top], pa.string()),
                     "count": pa.array([r["count"] for r in top], pa.int64())})


def exact_quantiles(ds, col: str, q_bps: list[int]):
    """Dataset[..., col:int] → pa.Table(q_bp, value): exact discrete
    quantiles via a distributed value histogram. Shuffles one row per
    DISTINCT value per batch; the driver sees only the global histogram
    (cardinality-bounded)."""
    from ray.data.aggregate import Sum

    def value_counts(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(vals, return_counts=True)
        return pa.table({"value": pa.array(uniq, pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    from .common import bounded_take_all
    hist = bounded_take_all(
        ds.map_batches(value_counts, batch_format="pyarrow")
        .groupby("value").aggregate(Sum("n", alias_name="n")),
        what=f"exact_quantiles value histogram over '{col}'")
    hist.sort(key=lambda r: r["value"])
    counts = np.array([r["n"] for r in hist], dtype=np.int64)
    values = np.array([r["value"] for r in hist], dtype=np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q_bp in q_bps:
        # DuckDB quantile_disc rank rule, exact integer arithmetic
        rank = max(1, -(-q_bp * n // 10_000))
        idx = int(np.searchsorted(cum, rank, side="left"))
        out_q.append(q_bp)
        out_v.append(int(values[idx]) if n else 0)
    return pa.table({"q_bp": pa.array(out_q, pa.int64()),
                     "value": pa.array(out_v, pa.int64())})


def grouped_quantiles(ds, *, group_col: str, col: str,
                      q_bps: list[int]):
    """Dataset[..., group, col:int] → Dataset(group, q_bp, value): exact
    discrete quantiles PER GROUP — the per-language/per-host length and
    score percentile profile of a corpus report.

    Scale shape: per batch, one lexsort segment combine collapses rows
    to (group, value, partial n) — bounded by groups×values present in
    the batch — then ``groupby([group, value]).sum`` builds the global
    per-group histograms, and ONE vectorized cumsum finish per GROUP
    (``groupby(group).map_groups``; group cardinality is languages /
    hosts — bounded by design, like stratified_sample) selects the
    ranked values. Rank rule pinned to DuckDB ``quantile_disc``:
    rank = max(1, ceil(q_bp·n/10⁴)) in pure integer arithmetic — same
    rule as exact_quantiles. Payload never shuffles; only (group,
    value, count) rows move.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "value": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        groups = np.array(batch.column(group_col).to_pylist(),
                          dtype=object)
        vals = batch.column(col).to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, groups))
        g_s, v_s = groups[order], vals[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = (g_s[1:] != g_s[:-1]) | (v_s[1:] != v_s[:-1])
        idx = np.flatnonzero(first)
        n = np.diff(np.append(idx, len(order)))
        return pa.table({
            group_col: pa.array(list(g_s[idx]), pa.string()),
            "value": pa.array(v_s[idx].astype(np.int64), pa.int64()),
            "n": pa.array(n.astype(np.int64), pa.int64()),
        })

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([group_col, "value"])
            .aggregate(Sum("n", alias_name="n")))

    qs = np.array(sorted(q_bps), dtype=np.int64)

    def finish(group: pa.Table) -> pa.Table:
        vals = group.column("value").to_numpy(zero_copy_only=False)
        cnts = group.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(vals)
        vals, cnts = vals[order], cnts[order]
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        # rank = max(1, ceil(q*n/10000)) — quantile_disc, integer-exact
        ranks = np.maximum(1, -(-qs * n // 10_000))
        idx = np.searchsorted(cum, ranks, side="left")
        g = group.column(group_col).to_pylist()[0]
        return pa.table({
            group_col: pa.array([g] * len(qs), pa.string()),
            "q_bp": pa.array(qs, pa.int64()),
            "value": pa.array(vals[idx].astype(np.int64), pa.int64()),
        })

    return hist.groupby(group_col).map_groups(finish,
                                              batch_format="pyarrow")


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch

def _hll_hash63(values: list[str]) -> np.ndarray:
    """63-bit md5-derived hash (md5_number_lower % 2^63 — the repo's
    standard cross-engine hash, int64-representable on both sides)."""
    import hashlib
    import struct
    return np.array(
        [struct.unpack("<Q", hashlib.md5(v.encode()).digest()[8:])[0]
         & ((1 << 63) - 1) for v in values],
        dtype=np.int64)


def _hll_ranks(h: np.ndarray, low_bits: int) -> np.ndarray:
    """rank = position of the first 1-bit of the low field from the MSB
    side, 1-based; all-zero low -> low_bits + 1. Integer-exact: the
    float log2 is corrected by exact shifts (shared by the global and
    grouped register builders so the rank rule cannot drift)."""
    low_mask = (1 << low_bits) - 1
    low = h & low_mask
    ilog2 = np.zeros(len(low), dtype=np.int64)
    nz = low > 0
    ilog2[nz] = np.floor(np.log2(low[nz])).astype(np.int64)
    # exact-integer guard against float log2 edge error
    ilog2[nz] += (low[nz] >> (ilog2[nz] + 1)) > 0
    ilog2[nz] -= (low[nz] >> ilog2[nz]) == 0
    return np.where(nz, low_bits - ilog2, low_bits + 1).astype(np.int64)


def hll_registers(ds, col: str, p: int = 6):
    """Dataset[..., col:string] → Dataset[(reg, max_rank)] — the 2^p
    HyperLogLog registers (Flajolet et al. 2007) of the column's
    distinct-value count, as a MERGEABLE integer aggregate.

    This is the approximate-count-distinct primitive a 100-TB profile
    needs (distinct urls / hosts / fingerprints without an exact
    groupby): per batch only (reg, rank) pairs leave — at most 2^p rows
    after the in-batch partial max — and the global combine is a plain
    ``groupby(reg).max(rank)``, associative and idempotent, so register
    tables from different corpus shards (or days) merge by the same
    max. Registers are exact integers — bit-reproducible and
    SQL-expressible (rank = (63-p) - ilog2(low bits) via length(bin())
    in DuckDB) — the float estimation step is separate (hll_estimate).
    """
    from ray.data.aggregate import Max

    low_bits = 63 - p

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_pylist()
        if not vals:
            return pa.table({"reg": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64())})
        h = _hll_hash63(vals)
        reg = (h >> low_bits).astype(np.int64)
        rank = _hll_ranks(h, low_bits)
        # in-batch partial max per register
        order = np.lexsort((-rank, reg))
        reg_s, rank_s = reg[order], rank[order]
        first = np.ones(len(reg_s), dtype=bool)
        first[1:] = reg_s[1:] != reg_s[:-1]
        return pa.table({"reg": pa.array(reg_s[first], pa.int64()),
                         "rank": pa.array(rank_s[first], pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("reg").aggregate(Max("rank", alias_name="max_rank")))


def hll_registers_by_group(ds, *, group_col: str, col: str, p: int = 6):
    """Dataset[..., group, col] → Dataset[(group, reg, max_rank)]: one
    HyperLogLog register table PER GROUP — approximate distinct-count
    grouped by a key (distinct urls per host, distinct fingerprints per
    language) without the exact ``groupby(group, value)`` shuffle.

    Scale shape: the per-batch partial emits at most
    ``groups-in-batch × 2^p`` rows (partial max per (group, reg) via one
    lexsort segment reduction — no per-group Python), and the global
    combine is ``groupby([group, reg]).max(rank)`` over register rows
    only; the value column never shuffles. Finish per group with
    hll_estimate over its ≤2^p rows. Registers are exact integers —
    same 63-bit md5 rank rule as hll_registers, SQL-oracle-able.
    """
    from ray.data.aggregate import Max

    low_bits = 63 - p

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "reg": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64())})
        groups = np.array(batch.column(group_col).to_pylist(),
                          dtype=object)
        h = _hll_hash63(batch.column(col).to_pylist())
        reg = (h >> low_bits).astype(np.int64)
        rank = _hll_ranks(h, low_bits)
        # partial max per (group, reg): lexsort + first-of-segment mask
        order = np.lexsort((-rank, reg, groups))
        g_s, reg_s, rank_s = groups[order], reg[order], rank[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = (g_s[1:] != g_s[:-1]) | (reg_s[1:] != reg_s[:-1])
        return pa.table({group_col: pa.array(list(g_s[first]), pa.string()),
                         "reg": pa.array(reg_s[first], pa.int64()),
                         "rank": pa.array(rank_s[first], pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([group_col, "reg"])
            .aggregate(Max("rank", alias_name="max_rank")))


def hll_estimate(registers: pa.Table, p: int = 6) -> float:
    """Standard HLL estimate with the small-range linear-counting
    correction from a (reg, max_rank) register table (absent registers
    count as rank 0; the classic large-range correction is a 32-bit-hash
    artifact — unnecessary for this 63-bit hash). Accepts CONCATENATED
    per-shard register tables: duplicate reg rows combine by max (the
    HLL merge rule). Driver-side finish over ≤2^p rows per shard."""
    import math
    m = 1 << p
    regs = np.zeros(m, dtype=np.int64)
    idx = registers.column("reg").to_numpy(zero_copy_only=False)
    val = registers.column("max_rank").to_numpy(zero_copy_only=False)
    # maximum.at, not fancy-assign: concatenated shard tables carry
    # duplicate reg rows and last-write-wins would silently undercount
    np.maximum.at(regs, idx, val)
    if m >= 128:
        alpha = 0.7213 / (1 + 1.079 / m)
    else:
        alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213)
    raw = alpha * m * m / float(np.sum(np.exp2(-regs.astype(np.float64))))
    zeros = int(np.count_nonzero(regs == 0))
    if raw <= 2.5 * m and zeros:
        return m * math.log(m / zeros)        # linear counting
    return raw


def distinct_count_by_group(ds, *, group_col: str, col: str,
                            hash_values: bool = True):
    """Dataset[..., group, col] → Dataset(group, n_distinct): EXACT
    count-distinct per group — the precise counterpart of
    hll_registers_by_group, for when the report must be exact (dedup
    audits, per-language unique-document counts).

    Scale shape: an in-batch lexsort combiner first collapses each batch
    to its distinct (group, value-key) pairs, so the shuffle ships each
    pair once per batch at most; ``groupby([group, key]).count()``
    makes them globally distinct, and a second in-batch combiner + tiny
    ``groupby(group).sum`` counts them. With ``hash_values`` (default)
    the value key is the md5 hex of the value — a 32-byte key in the
    shuffle regardless of payload size (= DuckDB ``md5(col)``, so the
    pair stage is itself oracle-able). Payload never moves; the only
    all-to-all is over (group, 32-byte key) pairs.
    """
    import hashlib
    from ray.data.aggregate import Count, Sum

    def pairs(batch: pa.Table) -> pa.Table:
        # NULL values don't count — SQL count(DISTINCT col) semantics
        # (and str(None) would conflate NULL with a literal 'None')
        batch = batch.filter(pa.compute.is_valid(batch.column(col)))
        if batch.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "vkey": pa.array([], pa.string())})
        groups = batch.column(group_col).to_pylist()
        vals = batch.column(col).to_pylist()
        if hash_values:
            vals = [hashlib.md5(str(v).encode("utf-8")).hexdigest()
                    for v in vals]
        else:
            vals = [str(v) for v in vals]
        seen = sorted(set(zip(groups, vals)))
        return pa.table({
            group_col: pa.array([g for g, _ in seen], pa.string()),
            "vkey": pa.array([v for _, v in seen], pa.string()),
        })

    distinct_pairs = (ds.map_batches(pairs, batch_format="pyarrow")
                      .groupby([group_col, "vkey"]).aggregate(Count()))

    def count_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "n_distinct": pa.array([], pa.int64())})
        groups = np.array(batch.column(group_col).to_pylist(),
                          dtype=object)
        uniq, cnt = np.unique(groups, return_counts=True)
        return pa.table({
            group_col: pa.array(list(uniq), pa.string()),
            "n_distinct": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    return (distinct_pairs.map_batches(count_partial,
                                       batch_format="pyarrow")
            .groupby(group_col)
            .aggregate(Sum("n_distinct", alias_name="n_distinct")))


def range_partition(ds, col: str, n_buckets: int):
    """Append a ``bucket`` column assigning each row to one of
    ``n_buckets`` value ranges with (near-)equal row counts — the range
    partitioner that gives sort-merge/as-of stages co-located key ranges
    WITHOUT a global sort.

    Boundaries are the exact (k/n)-quantiles (same pinned quantile_disc
    rank rule as exact_quantiles); bucket(v) = number of boundaries
    strictly below v, so values equal to a boundary land in the lower
    bucket — deterministic and SQL-expressible. Two streaming passes:
    the histogram pass (bounded by value cardinality) and the assign
    pass; the boundary list (n_buckets-1 ints) rides in the task
    closure."""
    q_bps = [(k * 10000) // n_buckets for k in range(1, n_buckets)]
    qt = exact_quantiles(ds, col, q_bps)
    bounds = np.sort(np.asarray(qt.column("value").to_pylist(),
                                dtype=np.int64))

    def assign(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_numpy(zero_copy_only=False)
        bucket = np.searchsorted(bounds, vals, side="left")
        return batch.append_column(
            "bucket", pa.array(bucket.astype(np.int64), pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# count-min sketch (Cormode & Muthukrishnan 2005)

# canonical cross-engine hash (= DuckDB md5_number_lower)
from .common import _md5_low64_str as _md5_low64  # noqa: E402


def cms_table(ds, *, width: int = 1024, depth: int = 4):
    """Dataset[..., text] → Dataset(d, cell, cnt): a count-min sketch of
    the corpus word frequencies as mergeable integer registers.

    Scale shape: per batch, token counts collapse into at most
    ``depth × width`` (row, cell, partial-count) entries — bounded by the
    sketch size, independent of batch rows — then ONE small
    ``groupby(d, cell).sum`` merges partials (counter matrices merge by
    addition, the mergeable-summaries property). Row d's hash is
    md5_low64(f"{d}:{tok}") % width = DuckDB
    ``md5_number_lower(concat(d,':',tok)) % width`` — integer-exact and
    SQL-oracle-able. Point estimate = min over rows (see cms_estimate):
    always an OVERestimate, error ≤ N·e/width with prob 1−e^-depth.

    Use at 100 TB: approximate per-token frequency without materializing
    the Zipf-tail vocabulary (the exact token_counts_table's weakness);
    4×1024 int64 cells vs billions of (word, cnt) rows.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for text in batch.column("text").to_pylist():
            for tok in _tokens_of(text):
                counts[tok] = counts.get(tok, 0) + 1
        cells: dict[tuple[int, int], int] = {}
        for tok, c in counts.items():
            for d in range(depth):
                cell = _md5_low64(f"{d}:{tok}") % width
                cells[(d, cell)] = cells.get((d, cell), 0) + c
        return pa.table({
            "d": pa.array([k[0] for k in cells], pa.int64()),
            "cell": pa.array([k[1] for k in cells], pa.int64()),
            "cnt": pa.array(list(cells.values()), pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["d", "cell"]).aggregate(Sum("cnt", alias_name="cnt")))


def cms_estimate(cms_rows: pa.Table, word: str, *, width: int = 1024,
                 depth: int = 4) -> int:
    """Point-query the sketch produced by cms_table: min over the word's
    depth cells (0 if any cell is absent = true count 0 guaranteed).
    Driver-side finish over the bounded register table."""
    reg = {(d, c): n for d, c, n in zip(
        cms_rows.column("d").to_pylist(),
        cms_rows.column("cell").to_pylist(),
        cms_rows.column("cnt").to_pylist())}
    return min(reg.get((d, _md5_low64(f"{d}:{word}") % width), 0)
               for d in range(depth))


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970) as mergeable bit registers

def _bloom_positions(key: str, *, n_words: int, k: int) -> list[int]:
    m = n_words * 63
    return [_md5_low64(f"{j}:{key}") % m for j in range(k)]


def bloom_build(ds, *, column: str = "text", n_words: int = 256,
                k: int = 4):
    """Dataset[..., column] → Dataset(word_idx, bits): a Bloom filter
    over the column's values as mergeable int64 bit registers
    (63 usable bits per word so every register stays positive int64 —
    same convention as the 63-bit md5 keys elsewhere in this repo).

    Scale shape: per batch, at most ``n_words`` (word_idx, partial-bits)
    rows leave — bounded by the filter size — and a ``groupby(word_idx)``
    with a custom bitwise-OR AggregateFn merges them (Bloom filters merge
    by OR). Membership never false-negative; false-positive rate ≈
    (1 − e^{−k·n/m})^k, pytest-bounded.

    Use at 100 TB: the membership prefilter for delta/incremental dedup —
    the existing corpus's content hashes compress to m bits shipped to
    every ingest worker; only candidate hits pay the exact marker
    co-shuffle (delta_exact_dedup).
    """
    from ray.data.aggregate import AggregateFn

    def partial(batch: pa.Table) -> pa.Table:
        words = np.zeros(n_words, dtype=np.int64)
        for v in batch.column(column).to_pylist():
            for h in _bloom_positions(str(v), n_words=n_words, k=k):
                words[h // 63] |= np.int64(1) << np.int64(h % 63)
        nz = np.nonzero(words)[0]
        return pa.table({"word_idx": pa.array(nz.astype(np.int64)),
                         "bits": pa.array(words[nz])})

    bit_or = AggregateFn(
        init=lambda key: 0,
        merge=lambda a, b: a | b,
        accumulate_block=lambda acc, block: acc | int(
            np.bitwise_or.reduce(
                block.column("bits").to_numpy(zero_copy_only=False),
                initial=np.int64(0))),
        name="bits",
    )
    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("word_idx").aggregate(bit_or))


def bloom_might_contain(registers: pa.Table, key: str, *,
                        n_words: int = 256, k: int = 4) -> bool:
    """Driver-side membership probe of bloom_build's register table."""
    reg = dict(zip(registers.column("word_idx").to_pylist(),
                   registers.column("bits").to_pylist()))
    return all(reg.get(h // 63, 0) >> (h % 63) & 1
               for h in _bloom_positions(key, n_words=n_words, k=k))
