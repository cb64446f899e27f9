"""Unit tests for the pure per-batch functions (dedup, textstats, ann) —
no Ray needed; batch transforms are plain pa.Table → pa.Table."""

import numpy as np
import pyarrow as pa

from html_parser_ray.functions import ann, dedup, textstats


def _doc_batch(texts, ids=None):
    ids = ids or list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string()),
                     "lang": pa.array(["en"] * len(texts), pa.string())})


# ---------------------------------------------------------------------------
# dedup primitives

def test_minhash_similar_docs_share_bands():
    a = "the quick brown fox jumps over the lazy dog " * 10
    b = a + "extra tail words here"
    c = "completely different content about other topics entirely " * 10
    sig_a = dedup.minhash_signature(a)
    sig_b = dedup.minhash_signature(b)
    sig_c = dedup.minhash_signature(c)
    bands_a = set(dedup.lsh_band_keys(sig_a))
    assert bands_a & set(dedup.lsh_band_keys(sig_b)), "near-dups must collide"
    assert not bands_a & set(dedup.lsh_band_keys(sig_c))


def test_minhash_deterministic():
    t = "some deterministic text for hashing purposes right here"
    assert dedup.minhash_signature(t) == dedup.minhash_signature(t)


def test_simhash_hamming_close_for_near_dups():
    a = "word " * 50 + "alpha beta gamma delta"
    b = "word " * 50 + "alpha beta gamma epsilon"
    c = "unrelated totally distinct vocabulary set here now"
    ha, hb, hc = dedup.simhash64(a), dedup.simhash64(b), dedup.simhash64(c)
    assert bin(ha ^ hb).count("1") < bin(ha ^ hc).count("1")


def test_jaccard_bounds():
    assert dedup.jaccard("a b c d e", "a b c d e") == 1.0
    assert dedup.jaccard("a b c d e", "v w x y z") == 0.0
    assert dedup.jaccard("", "") == 1.0


# ---------------------------------------------------------------------------
# textstats

def test_token_counts():
    assert textstats.ws_token_count("") == 0
    assert textstats.ws_token_count("  one  two\nthree ") == 3
    assert textstats.bpe_ish_token_count("don't stop 123!") == 6


def test_fingerprint_normalization_invariant():
    assert textstats.fingerprint_md5("A  b\tc") == textstats.fingerprint_md5("a b c")
    assert textstats.rolling_fingerprint("A  b\tc same tail words") == \
        textstats.rolling_fingerprint("a b c same tail words")


def test_detect_lang_scripts():
    assert textstats.detect_lang("这是一个中文文档的例子" * 5) == "zh"
    assert textstats.detect_lang("это русский текст пример" * 5) == "ru"
    assert textstats.detect_lang("the cat sat on the mat and it is a test") == "en"
    assert textstats.detect_lang("der hund ist nicht mit den katzen") == "de"
    assert textstats.detect_lang("12345 !!!") == "und"


def test_quality_features_shapes():
    n_chars, n_tok, n_bpe, n_lines, punct, alpha, stop = \
        textstats.quality_features("The cat. And a dog!\nSecond line.")
    assert n_chars > 0 and n_tok == 7 and n_lines == 2
    assert 0 <= punct <= 1 and 0 <= alpha <= 1 and 0 <= stop <= 1


def test_batch_transforms_schema():
    batch = _doc_batch(["hello world", "", "a b c"])
    out = textstats.token_count_batch(batch)
    assert out.column("n_ws_tokens").to_pylist() == [2, 0, 3]
    out = textstats.quality_batch(batch)
    assert out.num_rows == 3
    out = textstats.langid_batch(batch)
    assert out.column_names == ["doc_id", "lang_pred", "lang_true"]
    out = dedup.simhash_batch(batch)
    assert out.num_rows == 3


# ---------------------------------------------------------------------------
# ann primitives

def test_deterministic_query_vector_unit_norm():
    v1 = ann.deterministic_query_vector(64, seed=7)
    v2 = ann.deterministic_query_vector(64, seed=7)
    assert v1 == v2
    assert abs(np.linalg.norm(v1) - 1.0) < 1e-5
    assert ann.deterministic_query_vector(64, seed=8) != v1


# ---------------------------------------------------------------------------
# LSH scale guards: bucket caps + hyperplane bucket cardinality

def test_cap_bucket_truncates_and_logs(caplog):
    import logging
    rows = [(i, b"sig") for i in range(50)]
    with caplog.at_level(logging.WARNING, logger="html_parser_ray.functions.dedup"):
        out = dedup._cap_bucket(rows, 10, "0:deadbeef")
    assert out == rows[:10]
    assert any("capping at 10" in r.message and "40 members dropped" in r.message
               for r in caplog.records)
    # under the cap: untouched, no log
    caplog.clear()
    assert dedup._cap_bucket(rows, 100, "k") == rows
    assert not caplog.records


def test_hyperplane_bucket_cardinality_grows_with_corpus():
    """Unlike the old fixed-low-bit sign scheme (<=2^4 buckets forever),
    hyperplane LSH bucket count scales with corpus size, keeping per-bucket
    O(k^2) verify bounded."""
    rng = np.random.RandomState(7)

    def n_buckets(n):
        vecs = rng.randn(n, 64).astype("float32")
        unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        keys = dedup.hyperplane_keys(unit, sign_bits=16, n_tables=1)[0]
        return len(set(keys))

    small, large = n_buckets(200), n_buckets(2000)
    assert large > small * 4          # cardinality keeps growing
    assert small > 100                # random vectors spread out immediately


def test_hyperplane_keys_deterministic_and_identical_vectors_collide():
    rng = np.random.RandomState(3)
    vecs = rng.randn(8, 32).astype("float32")
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    k1 = dedup.hyperplane_keys(unit, sign_bits=16, n_tables=4)
    k2 = dedup.hyperplane_keys(unit, sign_bits=16, n_tables=4)
    assert k1 == k2
    dup = np.vstack([unit, unit[:1]])
    k3 = dedup.hyperplane_keys(dup, sign_bits=16, n_tables=4)
    for t in range(4):
        assert k3[t][8] == k3[t][0]   # exact copy shares every table bucket
