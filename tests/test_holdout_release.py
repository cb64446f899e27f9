"""Release gate: execute the held-out golden-fixture partition.

Routine pytest runs exclude every golden case with hash(id) % 10 == 0
(tests/holdout.py — the reference's holdout policy, test/holdout/README.md
+ run-serializer-fixtures.mjs:17-23). This suite executes exactly that
slice across the tree, tokenizer, and serializer golden corpora; run it
explicitly at release:

    python -m pytest tests/test_holdout_release.py -m release -q
"""

import json
import os

import pytest

from .holdout import is_holdout

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.mark.release
def test_holdout_tree_goldens():
    from .test_tree_goldens import GOLDEN, _load, run_tree_case
    cases, _ = _load(holdout=True)
    assert cases, "holdout partition of the tree corpus is empty"
    for case in cases:
        run_tree_case(case, GOLDEN)


@pytest.mark.release
def test_holdout_tokenizer_goldens():
    from html_parser_ray.htmlcore.tokens import tokenize
    from .test_tokenizer_goldens import ALL_CASES, GOLDEN
    cases = [c for c in ALL_CASES if is_holdout(str(c["id"]))]
    assert cases, "holdout partition of the tokenizer corpus is empty"
    for case in cases:
        got = tokenize(case["html"], initial_state=case["initialState"],
                       last_start_tag=case["lastStartTag"])
        assert got == GOLDEN[case["id"]], (
            f"case {case['id']} ({case['initialState']}): "
            f"{case['html'][:100]!r}")


@pytest.mark.release
def test_holdout_serializer_goldens():
    from html_parser_ray.htmlcore.fixture_serializer import (
        serialize_fixture_token_stream,
    )
    path = os.path.join(FIXTURES, "serializer_goldens", "cases.jsonl")
    with open(path, encoding="utf-8") as f:
        cases = [c for c in (json.loads(line) for line in f)
                 if is_holdout(c["id"])]
    assert cases, "holdout partition of the serializer corpus is empty"
    for case in cases:
        got = serialize_fixture_token_stream(case["input"], case["options"])
        assert got == case["expected"], (
            f"{case['id']}: {got!r} != {case['expected']!r}")
