"""BPE vocabulary induction over a corpus (Sennrich et al. 2016).

Tokenizer training is part of the training-data pipeline: the corpus
the engine cleans is also the corpus the tokenizer is learned from.
Standard shape (the one real BPE trainers use):

1. distributed WORD-COUNT pass — per-batch partial counts inside
   ``map_batches`` (explicit ASCII whitespace + lowercase, the repo's
   token convention), one ``groupby(word).sum`` shuffle of (word, n)
   rows; the result is bounded by VOCABULARY size, not corpus size;
2. driver-side merge loop over the word-count table — each round counts
   adjacent symbol pairs weighted by word frequency and merges the most
   frequent pair (ties: lexicographically smallest pair), exactly
   Sennrich's algorithm. Word-level counts make this independent of
   corpus size, so the loop costs O(vocab × merges) wherever it runs.

Determinism: counts are exact integers and the tie rule is pinned, so
the learned merge list is bit-reproducible — asserted in pytest.

Reference analog: none (beyond-reference LLM-data-pipeline operator).
"""

from __future__ import annotations

import re

import pyarrow as pa

_WS = re.compile(r"[ \t\n\r\f]+")
END = "</w>"            # end-of-word marker, per the original algorithm


def word_counts(ds, *, text_col: str = "text"):
    """Dataset[..., text] → Dataset[(word, n)] — the distributed pass.

    Thin rename over lmscore.token_counts_table so the corpus has ONE
    pinned tokenization (the explicit ASCII class both SQL oracles use);
    a second copy here could silently diverge the BPE vocabulary from
    the LM scores."""
    from .lmscore import token_counts_table

    if text_col != "text":
        ds = ds.map_batches(
            lambda b: pa.table({"text": b.column(text_col)}),
            batch_format="pyarrow")
    return token_counts_table(ds).map_batches(
        lambda b: pa.table({"word": b.column("word"),
                            "n": b.column("cnt")}),
        batch_format="pyarrow")


def bpe_merges(counts: pa.Table, n_merges: int) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a (word, n) count table.

    Driver-side finish over the bounded vocabulary (Sennrich et al.
    2016, Algorithm 1): symbols start as characters + ``</w>``; each
    round merges the globally most frequent adjacent pair."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, n in zip(counts.column("word").to_pylist(),
                    counts.column("n").to_pylist()):
        vocab[tuple(w) + (END,)] = vocab.get(tuple(w) + (END,), 0) + n

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


# one-slot rank-dict memo keyed on merge-list IDENTITY (holding the
# reference keeps the id stable): encoding a corpus calls bpe_encode per
# word, and rebuilding the 32k-entry dict each call was O(|merges|)
# before any matching started
_RANK_CACHE: list = [None, None]


def _merge_ranks(merges: list[tuple[str, str]]) -> dict:
    if _RANK_CACHE[0] is not merges:
        _RANK_CACHE[0] = merges
        _RANK_CACHE[1] = {m: i for i, m in enumerate(merges)}
    return _RANK_CACHE[1]


def bpe_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply a learned merge list to one word (greedy, merge-order
    priority — the standard inference rule)."""
    syms = list(word) + [END]
    rank = _merge_ranks(merges)
    while len(syms) > 1:
        best_i, best_r = -1, len(merges)
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = rank.get(pair, len(merges))
            if r < best_r:
                best_i, best_r = i, r
        if best_i < 0 or best_r == len(merges):
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_train(ds, n_merges: int, *, text_col: str = "text"
              ) -> list[tuple[str, str]]:
    """Corpus → learned merge list (distributed count + driver finish)."""
    parts = list(word_counts(ds, text_col=text_col)
                 .iter_batches(batch_format="pyarrow"))
    tbl = (pa.concat_tables(parts) if parts
           else pa.table({"word": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())}))
    return bpe_merges(tbl, n_merges)
