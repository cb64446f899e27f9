"""800-case tree-construction conformance corpus.

Cases are seeded random fragment compositions (documents + fragment
contexts + scripting on/off) whose golden `| `-normalized trees were
produced by driving the reference's vendored parse5 through
tools/ref_oracle/oracle.mjs (the same facade transformations the reference
applies). Regenerate with the commands in tools/ref_oracle/oracle.mjs after
grammar changes; every tree must stay byte-identical.
"""

import json
import os

import pytest

from html_parser_ray.htmlcore.api import parse, parse_fragment
from html_parser_ray.htmlcore.normalize import normalize_tree

ROOT = os.path.join(os.path.dirname(__file__), "fixtures", "tree_goldens")


def _load(holdout: bool = False):
    # routine runs exclude the hash(id)%10==0 holdout slice; the release
    # gate (tests/test_holdout_release.py) executes it
    from .holdout import is_holdout
    with open(os.path.join(ROOT, "cases.jsonl")) as f:
        cases = [c for c in (json.loads(line) for line in f)
                 if is_holdout(str(c["id"])) == holdout]
    with open(os.path.join(ROOT, "golden.jsonl")) as f:
        golden = {json.loads(line)["id"]: json.loads(line)["tree"]
                  for line in f}
    return cases, golden


def run_tree_case(case, golden):
    if case["fragment"]:
        tree = parse_fragment(case["html"], case["fragment"],
                              scripting_enabled=case["scripting"])
    else:
        tree = parse(case["html"], scripting_enabled=case["scripting"])
    got = normalize_tree(tree)
    expected = golden[case["id"]].rstrip("\n")
    assert got == expected, (
        f"case {case['id']} (fragment={case['fragment']}, "
        f"scripting={case['scripting']}): {case['html'][:120]!r}")


CASES, GOLDEN = _load()


@pytest.mark.parametrize("chunk", range(0, len(CASES), 50))
def test_tree_goldens_chunk(chunk):
    for case in CASES[chunk:chunk + 50]:
        run_tree_case(case, GOLDEN)
