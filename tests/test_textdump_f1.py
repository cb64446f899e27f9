"""Independent visible-text quality gate: token-F1 vs a lynx/w3m-style
text dump produced by an INDEPENDENT extractor over an independently
parsed tree (tools/ref_oracle/textdump_oracle.mjs over the reference's
vendored parse5).

This is the sandbox port of the reference's third-party-renderer compare
(scripts/dev/visible-text-oracle-compare.mjs:20-60 runs `lynx -dump` /
`w3m -dump` and scores a multiset token F1; those binaries are not
installable here). The committed fixture (regenerate with
tools/gen_textdump_fixture.py) makes the test hermetic — no node needed
at test time; html_sha256 guards against synth-generator drift.

Expected divergences (deliberate extraction semantics vs what a text
browser renders — each matches the REFERENCE's visibleText, verified by
its fixture parity suite):
- select subtrees are skipped (reference mod.ts:1312) — a text browser
  renders option text; malformed pages whose unclosed <select><option>
  swallows trailing content diverge hardest (the F1≈0 tail);
- hidden subtrees are skipped; lynx has no CSS and renders them;
- noscript fallback semantics differ from a scriptless text browser;
- form-control values (input/button) are included; text browsers draw
  widgets instead.
Measured distribution at fixture-generation time (600 docs):
mean 0.8815, median 1.0, p10 0.5, frac≥0.95 = 0.648. Gates below sit
under those with margin and exist to catch REGRESSIONS in the
extraction layer, not to re-litigate the semantic differences.
"""

import gzip
import hashlib
import json
import os
import re
import statistics
from collections import Counter

import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "textdump",
                       "dumps.jsonl.gz")
N_DOCS = 600
SEED = 777
SIZE_SCALE = 2

# the reference's tokenizeForSimilarity: lowercase, strip non-letter/number,
# whitespace-split (visible-text-oracle-compare.mjs:21-28)
_NONWORD = re.compile(r"[^\w\s]|_", re.UNICODE)


def _tokens(value: str) -> list[str]:
    return [t for t in _NONWORD.sub(" ", value.lower()).split() if t]


def token_f1(expected: str, actual: str) -> float:
    te, ta = _tokens(expected), _tokens(actual)
    if not te and not ta:
        return 1.0
    if not te or not ta:
        return 0.0
    ce, ca = Counter(te), Counter(ta)
    overlap = sum(min(c, ca[t]) for t, c in ce.items())
    precision, recall = overlap / len(ta), overlap / len(te)
    if precision == 0 or recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


@pytest.fixture(scope="module")
def fixture_dumps() -> dict[str, dict]:
    with gzip.open(FIXTURE, "rt", encoding="utf-8") as f:
        return {d["id"]: d for d in (json.loads(line) for line in f)}


def test_visible_text_token_f1_vs_independent_dump(fixture_dumps):
    from html_parser_ray.htmlcore.api import parse
    from html_parser_ray.htmlcore.extract import visible_text
    from html_parser_ray.htmlcore.sniff import decode_html_bytes
    from html_parser_ray.sources.synth import make_page

    assert len(fixture_dumps) == N_DOCS
    f1s = []
    for i in range(N_DOCS):
        page = make_page(i, seed=SEED, size_scale=SIZE_SCALE)
        text, _sniff = decode_html_bytes(page["html"], None)
        entry = fixture_dumps[str(i)]
        assert hashlib.sha256(text.encode("utf-8")).hexdigest() == \
            entry["html_sha256"], f"synth drift at doc {i}: regenerate " \
            "fixture with tools/gen_textdump_fixture.py"
        f1s.append(token_f1(entry["dump"], visible_text(parse(text))))

    f1s.sort()
    mean = statistics.mean(f1s)
    median = f1s[len(f1s) // 2]
    frac_hi = sum(1 for x in f1s if x >= 0.95) / len(f1s)
    assert mean >= 0.85, f"mean token-F1 {mean:.4f} < 0.85"
    assert median >= 0.999, f"median token-F1 {median:.4f} < 0.999"
    assert frac_hi >= 0.60, f"frac(F1>=0.95) {frac_hi:.3f} < 0.60"
