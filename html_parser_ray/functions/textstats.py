"""Text-analysis operators for training-data pipelines.

Language-ID (char-n-gram heuristic), quality scoring (length/punct/stopword
ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (normalized-text hash + rolling shingle hash). All are
stateless `map_batches` transforms over the ``documents`` table schema
(doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

_WS_SPLIT = re.compile(r"\s+")
# GPT-2-style coarse pretokenizer (public regex family): words, numbers,
# punctuation runs, whitespace handled implicitly
_BPE_ISH = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")
_NORM_WS = re.compile(r"[ \t\n\f\r]+")

# tiny public stopword seeds per language for the n-gram/stopword heuristic
_STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "nicht", "mit", "den"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "pour", "que"},
    "es": {"el", "la", "los", "de", "y", "un", "una", "es", "para", "que"},
}


def ws_token_count(text: str) -> int:
    stripped = text.strip()
    if not stripped:
        return 0
    return len(_WS_SPLIT.split(stripped))


def bpe_ish_token_count(text: str) -> int:
    return len(_BPE_ISH.findall(text))


def normalize_text(text: str) -> str:
    return _NORM_WS.sub(" ", text).strip()


def fingerprint_md5(text: str) -> str:
    return hashlib.md5(normalize_text(text).lower().encode("utf-8")).hexdigest()


def rolling_fingerprint(text: str, window: int = 8) -> int:
    """Deterministic 64-bit rolling (Rabin-Karp-style) document hash."""
    norm = normalize_text(text).lower()
    h = 0
    acc = 0
    base = 1_000_003
    mask = (1 << 64) - 1
    pw = pow(base, window - 1, 1 << 64)
    for i, ch in enumerate(norm):
        acc = (acc * base + ord(ch)) & mask
        if i >= window - 1:
            h ^= acc
            acc = (acc - ord(norm[i - window + 1]) * pw) & mask
    return h & ((1 << 63) - 1)


def detect_lang(text: str) -> str:
    """Cheap deterministic language-ID heuristic.

    1. Script detection: CJK / Arabic / Cyrillic by codepoint ranges.
    2. Latin languages: stopword hit-rate per language table.
    """
    cjk = arabic = cyr = latin = 0
    for ch in text[:2000]:
        cp = ord(ch)
        if 0x4E00 <= cp <= 0x9FFF or 0x3040 <= cp <= 0x30FF:
            cjk += 1
        elif 0x0600 <= cp <= 0x06FF:
            arabic += 1
        elif 0x0400 <= cp <= 0x04FF:
            cyr += 1
        elif 0x41 <= cp <= 0x7A:
            latin += 1
    total = cjk + arabic + cyr + latin
    if total == 0:
        return "und"
    if cjk / total > 0.25:
        return "zh"
    if arabic / total > 0.25:
        return "ar"
    if cyr / total > 0.25:
        return "ru"
    words = set(_WS_SPLIT.split(text[:2000].lower()))
    best_lang, best_hits = "en", -1
    for lang, stops in _STOPWORDS.items():
        hits = len(words & stops)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang


_PUNCT = set(".,;:!?()[]{}\"'`")


def quality_counts(text: str) -> tuple[int, int, int, int, int, int, int]:
    """(n_chars, n_ws_tokens, n_bpe_tokens, n_lines, punct_count,
    alpha_count, stopword_hits) — all integers, so downstream ratio
    scaling can stay in exact integer arithmetic (SQL-oracle-stable)."""
    n_chars = len(text)
    tokens = _WS_SPLIT.split(text.strip()) if text.strip() else []
    n_tokens = len(tokens)
    n_lines = text.count("\n") + 1
    punct = sum(1 for c in text if c in _PUNCT)
    alpha = sum(1 for c in text if c.isalpha())
    stops = _STOPWORDS["en"]
    stop_hits = sum(1 for t in tokens if t.lower() in stops)
    return (n_chars, n_tokens, bpe_ish_token_count(text), n_lines,
            punct, alpha, stop_hits)


def quality_features(text: str) -> tuple[int, int, int, int, float, float, float]:
    """(n_chars, n_ws_tokens, n_bpe_tokens, n_lines, punct_ratio,
    alpha_ratio, stopword_ratio)"""
    n_chars, n_tokens, n_bpe, n_lines, punct, alpha, stop_hits = \
        quality_counts(text)
    return (n_chars, n_tokens, n_bpe, n_lines,
            punct / n_chars if n_chars else 0.0,
            alpha / n_chars if n_chars else 0.0,
            stop_hits / n_tokens if n_tokens else 0.0)


def _ratio_bp(num: int, den: int) -> int:
    """round-half-up basis points via exact integer arithmetic — identical
    in Python and DuckDB (`(num*20000 + den) // (2*den)`), unlike float
    round() whose half-even ties can differ across engines."""
    return (num * 20_000 + den) // (2 * den) if den else 0


# ---------------------------------------------------------------------------
# batch transforms (map_batches, batch_format="pyarrow")

def token_count_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_ws_tokens": pa.array([ws_token_count(t) for t in texts], pa.int64()),
        "n_bpe_tokens": pa.array([bpe_ish_token_count(t) for t in texts], pa.int64()),
    })


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "fingerprint": pa.array([fingerprint_md5(t) for t in texts], pa.string()),
        "rolling_fp": pa.array([rolling_fingerprint(t) for t in texts], pa.int64()),
    })


def langid_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "lang_pred": pa.array([detect_lang(t) for t in texts], pa.string()),
        "lang_true": batch.column("lang"),
    })


def quality_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    feats = [quality_counts(t) for t in texts]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_chars": pa.array([f[0] for f in feats], pa.int64()),
        "n_ws_tokens": pa.array([f[1] for f in feats], pa.int64()),
        "n_bpe_tokens": pa.array([f[2] for f in feats], pa.int64()),
        "n_lines": pa.array([f[3] for f in feats], pa.int64()),
        # basis points via exact integer arithmetic (DuckDB-oracle-stable)
        "punct_ratio_bp": pa.array(
            [_ratio_bp(f[4], f[0]) for f in feats], pa.int64()),
        "alpha_ratio_bp": pa.array(
            [_ratio_bp(f[5], f[0]) for f in feats], pa.int64()),
        "stopword_ratio_bp": pa.array(
            [_ratio_bp(f[6], f[1]) for f in feats], pa.int64()),
    })


def repetition_counts(text: str) -> tuple[int, int, int, int, int]:
    """Gopher-style repetition signals (Rae et al. 2021, public) over the
    normalized single-space word stream, in exact integer basis points so
    a DuckDB oracle reproduces them bit-for-bit:

    (n_words,
     dup_word_frac_bp       — repeated word occurrences / total words,
     top2_char_frac_bp      — chars covered by the most frequent 2-gram
                              (count × len("w1 w2")) / len(norm text),
     top3_char_frac_bp      — same for 3-grams,
     dup3_char_frac_bp      — chars of words covered by ANY 3-gram that
                              occurs ≥2 times, each word counted once,
                              / total word chars)

    Tie-break for "most frequent": highest count, then lexicographically
    smallest n-gram string — matches SQL ORDER BY cnt DESC, g ASC.
    """
    norm = normalize_text(text)
    words = norm.split(" ") if norm else []
    n_words = len(words)
    if n_words == 0:
        return (0, 0, 0, 0, 0)
    total_chars = len(norm)
    word_chars = total_chars - (n_words - 1)
    dup_word_bp = (n_words - len(set(words))) * 10_000 // n_words

    def top_ngram_bp(n: int) -> int:
        if n_words < n:
            return 0
        counts: dict[str, int] = {}
        for i in range(n_words - n + 1):
            g = " ".join(words[i:i + n])
            counts[g] = counts.get(g, 0) + 1
        best_cnt = max(counts.values())
        best = min(g for g, c in counts.items() if c == best_cnt)
        return best_cnt * len(best) * 10_000 // total_chars

    dup3_bp = 0
    if n_words >= 3:
        counts3: dict[tuple, int] = {}
        for i in range(n_words - 2):
            g = (words[i], words[i + 1], words[i + 2])
            counts3[g] = counts3.get(g, 0) + 1
        covered = bytearray(n_words)
        for i in range(n_words - 2):
            if counts3[(words[i], words[i + 1], words[i + 2])] >= 2:
                covered[i] = covered[i + 1] = covered[i + 2] = 1
        cov_chars = sum(len(w) for w, c in zip(words, covered) if c)
        dup3_bp = cov_chars * 10_000 // word_chars if word_chars else 0

    return (n_words, dup_word_bp, top_ngram_bp(2), top_ngram_bp(3), dup3_bp)


def repetition_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    feats = [repetition_counts(t) for t in texts]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_words": pa.array([f[0] for f in feats], pa.int64()),
        "dup_word_frac_bp": pa.array([f[1] for f in feats], pa.int64()),
        "top2_char_frac_bp": pa.array([f[2] for f in feats], pa.int64()),
        "top3_char_frac_bp": pa.array([f[3] for f in feats], pa.int64()),
        "dup3_char_frac_bp": pa.array([f[4] for f in feats], pa.int64()),
    })


def deterministic_sample_batch(batch: pa.Table, mod: int = 10,
                               keep: int = 0) -> pa.Table:
    """Deterministic holdout-style sampling: keep rows whose
    md5(doc_id)-derived value % mod == keep (reference analog: hash(id)%10
    holdout selection, run-tokenizer-fixtures.mjs:56-62). Never
    random_sample — determinism is a product requirement."""
    ids = batch.column("doc_id").to_pylist()
    mask = [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % mod == keep
            for i in ids]
    return batch.filter(pa.array(mask, pa.bool_()))


def nfc_batch(batch: pa.Table) -> pa.Table:
    """Unicode NFC normalization of the text column (web text arrives in
    mixed normalization; training corpora want one canonical form).

    Emits text_nfc + changed flag + post-NFC codepoint count. Uses
    CPython's C-accelerated ``unicodedata`` with the ``is_normalized``
    quick-check fast path: already-NFC text (the overwhelming majority of
    real web text — all ASCII is) is returned as-is with no allocation,
    so at 100 TB the operator is a near-zero-copy streaming pass.
    (This build's pyarrow utf8_normalize lacks composition — verified
    broken for NFC/NFKC — so the kernel is per-row C calls instead;
    parity with DuckDB nfc_normalize differentially checked on 3,000
    random combining-mark/jamo cases, 0 diffs.)"""
    import unicodedata
    texts = batch.column("text").to_pylist()
    out = []
    changed = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if unicodedata.is_normalized("NFC", t):
            out.append(t)
        else:
            out.append(unicodedata.normalize("NFC", t))
            changed[i] = 1
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "text_nfc": pa.array(out, pa.string()),
        "changed": pa.array(changed, pa.int64()),
        "n_chars_nfc": pa.array([len(t) for t in out], pa.int64()),
    })


def compression_ratio_batch(batch: pa.Table, *, level: int = 6) -> pa.Table:
    """Append zlib compression-ratio quality signals: highly repetitive
    machine-generated text compresses far below natural prose, so the
    ratio is a cheap single-pass quality gate (used alongside the
    Gopher repetition rules; e.g. RefinedWeb drops extreme outliers).

    Emits n_bytes (utf-8), n_compressed (zlib level ``level``), and
    ratio_bp = n_compressed*10000//n_bytes (0 for empty). Deterministic
    for a fixed zlib version — value-tested in pytest; no SQL oracle by
    documented impossibility (no zlib in DuckDB). Stateless map_batches,
    no shuffle."""
    import zlib
    texts = batch.column("text").to_pylist()
    n_bytes = np.empty(len(texts), dtype=np.int64)
    n_comp = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        raw = t.encode("utf-8")
        n_bytes[i] = len(raw)
        n_comp[i] = len(zlib.compress(raw, level))
    ratio = np.where(n_bytes > 0, n_comp * 10_000 // np.maximum(n_bytes, 1),
                     0)
    batch = batch.append_column("n_bytes", pa.array(n_bytes, pa.int64()))
    batch = batch.append_column("n_compressed", pa.array(n_comp, pa.int64()))
    return batch.append_column("compression_bp",
                               pa.array(ratio.astype(np.int64), pa.int64()))
