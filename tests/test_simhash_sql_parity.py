"""simhash ⇔ DuckDB-oracle parity on adversarial inputs.

The r3 code review found the first oracle draft diverged on non-space
whitespace (Python \\s and str.strip() are Unicode-aware; DuckDB's RE2 \\s
and trim() are not). Both sides now tokenize with the explicit ASCII class
[ \\t\\n\\r\\f]+ and drop empty tokens; this test pins that equivalence on
exactly the inputs that broke the draft (tabs, newlines, NBSP, empties,
unicode case), independent of what the synthetic corpus happens to
contain. No Ray needed — the oracle SQL runs over a registered DuckDB
view and the Python side is the plain kernel function.
"""

import os
import sys

import duckdb
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NASTY_TEXTS = [
    "hello world",
    "\thello world\n",          # leading tab / trailing newline
    "\n",                        # whitespace-only
    "",                          # empty
    "a\xa0b",                    # NBSP: ONE token on both sides
    "a b",                  # unicode line separator: one token
    "  double  spaces  ",
    "tab\tsep\ttokens",
    "line\nbreaks\r\nmixed\fformfeed",
    "ÄÖÜ Straße CAFÉ",          # unicode lowercasing
    "word " * 50 + "tail",
    "\t\n\f \r",                 # all-ASCII-whitespace
]


def test_simhash64_matches_duckdb_oracle_on_nasty_inputs():
    import __ray_entry__ as em
    from html_parser_ray.functions.dedup import simhash64

    tbl = pa.table({
        "doc_id": pa.array(range(len(NASTY_TEXTS)), pa.int64()),
        "text": pa.array(NASTY_TEXTS, pa.string()),
    })
    con = duckdb.connect()
    con.register("documents", tbl)
    rows = con.execute(em.oracle_sql()["simhash"]).fetchall()
    got_sql = {doc_id: int(sh) for doc_id, sh in rows}
    for i, text in enumerate(NASTY_TEXTS):
        assert got_sql[i] == simhash64(text), (
            f"doc {i} {text!r}: sql={got_sql[i]} py={simhash64(text)}")


def test_simhash64_whitespace_only_and_empty_are_zero():
    from html_parser_ray.functions.dedup import simhash64
    assert simhash64("") == 0
    assert simhash64(" \t\n\f\r ") == 0
