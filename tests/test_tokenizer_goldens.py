"""360-case tokenizer conformance corpus (html5lib-style).

Targeted entity / comment / doctype / tag edge cases, initial-state
overrides (rcdata/rawtext/script_data/plaintext/cdata with lastStartTag
arming) and seeded random compositions; goldens produced by driving the
reference's vendored parse5 Tokenizer through
tools/ref_oracle/tokenizer_oracle.mjs with the reference facade semantics
(first-wins attrs, adjacent-character merging, EOF append)."""

import json
import os

import pytest

from html_parser_ray.htmlcore.tokens import tokenize

ROOT = os.path.join(os.path.dirname(__file__), "fixtures",
                    "tokenizer_goldens")

from .holdout import is_holdout

# routine runs exclude the hash(id)%10==0 holdout slice; the release gate
# (tests/test_holdout_release.py) executes it
with open(os.path.join(ROOT, "cases.jsonl")) as f:
    ALL_CASES = [json.loads(line) for line in f]
CASES = [c for c in ALL_CASES if not is_holdout(str(c["id"]))]
with open(os.path.join(ROOT, "golden.jsonl")) as f:
    GOLDEN = {json.loads(line)["id"]: json.loads(line)["tokens"]
              for line in f}


@pytest.mark.parametrize("chunk", range(0, len(CASES), 40))
def test_tokenizer_goldens_chunk(chunk):
    for case in CASES[chunk:chunk + 40]:
        got = tokenize(case["html"], initial_state=case["initialState"],
                       last_start_tag=case["lastStartTag"])
        assert got == GOLDEN[case["id"]], (
            f"case {case['id']} ({case['initialState']}): "
            f"{case['html'][:100]!r}")


# ---------------------------------------------------------------------------
# initial-state expansion (reference: run-tokenizer-fixtures.mjs:79-95
# expands each fixture across its initialStates list; here every base case
# is systematically expanded across ALL six state families with matching
# lastStartTag arming — 1,803 cases, goldens from the parse5 oracle)

with open(os.path.join(ROOT, "expanded_cases.jsonl")) as f:
    EXPANDED = [json.loads(line) for line in f]
with open(os.path.join(ROOT, "expanded_golden.jsonl")) as f:
    EXPANDED_GOLDEN = {json.loads(line)["id"]: json.loads(line)["tokens"]
                       for line in f}


def test_expansion_corpus_size():
    assert len(EXPANDED) >= 1800


@pytest.mark.parametrize("chunk", range(0, len(EXPANDED), 200))
def test_tokenizer_state_expansion_chunk(chunk):
    for case in EXPANDED[chunk:chunk + 200]:
        got = tokenize(case["html"], initial_state=case["initialState"],
                       last_start_tag=case["lastStartTag"])
        assert got == EXPANDED_GOLDEN[case["id"]], (
            f"case {case['id']} ({case['initialState']}): "
            f"{case['html'][:100]!r}")
