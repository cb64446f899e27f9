"""Golden-regeneration gate: re-derive a deterministic sample of the
committed error-stream and insertion-mode-transition golden corpora
through the reference's own vendored parser (node oracles) and diff.

The corpora's protocol is "regenerate through the oracles, never
hand-edit" — this script makes that protocol executable: a kernel or
golden edit that breaks parity fails the release gate even without a
full fresh-seed sweep. Skips cleanly (exit 0 with a notice) when node
or the reference checkout is absent, so the gate still runs in
environments without the oracle toolchain.

Usage: python tools/regen_golden_sample.py [sample_per_corpus=25]
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "tests", "fixtures")
ORACLES = os.path.join(REPO, "tools", "ref_oracle")
REFERENCE_PARSER = ("/root/reference/src/internal/vendor/parse5/"
                    "parser/index.js")

CORPORA = [
    ("error_stream_goldens", "error_oracle.mjs", "errors"),
    ("transition_goldens", "transition_oracle.mjs", "transitions"),
]


def _sample(cases: list[dict], k: int) -> list[int]:
    """Deterministic hash-rank sample (the reference's holdout idiom:
    stable under corpus append, no RNG)."""
    ranked = sorted(
        range(len(cases)),
        key=lambda i: hashlib.md5(
            cases[i]["html"].encode("utf-8", "surrogatepass")).hexdigest())
    return sorted(ranked[:k])


def check_corpus(name: str, oracle: str, field: str, k: int) -> int:
    path = os.path.join(FIXTURES, name, "cases.jsonl")
    with open(path, encoding="utf-8") as f:
        cases = [json.loads(line) for line in f if line.strip()]
    idxs = _sample(cases, min(k, len(cases)))
    payload = "".join(
        json.dumps({"id": i, "html": cases[i]["html"],
                    "fragment": cases[i].get("fragment"),
                    "scripting": cases[i].get("scripting", False)},
                   ensure_ascii=False) + "\n"
        for i in idxs)
    proc = subprocess.run(
        ["node", os.path.join(ORACLES, oracle)],
        input=payload.encode("utf-8"), capture_output=True, timeout=300)
    if proc.returncode != 0:
        print(f"FAIL {name}: oracle exited {proc.returncode}: "
              f"{proc.stderr.decode()[:500]}")
        return 1
    got = {r["id"]: r[field]
           for r in (json.loads(line)
                     for line in proc.stdout.decode().splitlines()
                     if line.strip())}
    bad = 0
    for i in idxs:
        want = [list(map(_norm, row)) for row in cases[i][field]]
        have = [list(map(_norm, row)) for row in got.get(i, [["<missing>"]])]
        if want != have:
            bad += 1
            print(f"FAIL {name}[{i}]: committed golden != oracle output")
            print(f"  html: {cases[i]['html'][:120]!r}")
            print(f"  committed: {want[:4]}")
            print(f"  oracle   : {have[:4]}")
    status = "ok  " if not bad else "FAIL"
    print(f"{status} {name}: {len(idxs) - bad}/{len(idxs)} sampled cases "
          f"match the node oracle")
    return bad


def _norm(v):
    return list(v) if isinstance(v, (list, tuple)) else v


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    if shutil.which("node") is None:
        print("skip: node not on PATH — golden-sample regeneration "
              "unavailable in this environment")
        return 0
    if not os.path.exists(REFERENCE_PARSER):
        print("skip: reference checkout absent — golden-sample "
              "regeneration unavailable in this environment")
        return 0
    bad = sum(check_corpus(*spec, k) for spec in CORPORA)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
