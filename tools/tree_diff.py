"""Cross-check the Python tree builder against the reference's vendored
parse5 via tools/ref_oracle/oracle.mjs on a JSONL corpus.

Usage: python tools/tree_diff.py cases.jsonl [--show N]
Each case line: {"id": ..., "html": ..., "fragment": null|tag, "scripting": bool}
"""

from __future__ import annotations

import json
import subprocess
import sys

sys.path.insert(0, ".")

from html_parser_ray.htmlcore.api import parse, parse_fragment  # noqa: E402
from html_parser_ray.htmlcore.normalize import normalize_tree  # noqa: E402


def run(cases_path: str, show: int = 5) -> int:
    cases = [json.loads(line) for line in open(cases_path) if line.strip()]
    proc = subprocess.run(
        ["node", "tools/ref_oracle/oracle.mjs"],
        input="\n".join(json.dumps(c) for c in cases),
        capture_output=True, text=True, timeout=600)
    if proc.returncode != 0:
        print("oracle failed:", proc.stderr[:2000])
        return 1
    golden = {}
    for line in proc.stdout.splitlines():
        if line.strip():
            rec = json.loads(line)
            golden[rec["id"]] = rec

    fails = 0
    shown = 0
    for case in cases:
        gold = golden.get(case["id"])
        if gold is None or "error" in gold:
            print(f"{case['id']}: oracle error {gold and gold.get('error')}")
            continue
        try:
            if case.get("fragment"):
                tree = parse_fragment(case["html"], case["fragment"],
                                      scripting_enabled=case.get("scripting", True))
            else:
                tree = parse(case["html"],
                             scripting_enabled=case.get("scripting", True))
            mine = normalize_tree(tree)
        except Exception as exc:  # noqa: BLE001
            fails += 1
            print(f"{case['id']}: EXCEPTION {type(exc).__name__}: {exc}")
            continue
        if mine != gold["tree"]:
            fails += 1
            if shown < show:
                shown += 1
                print(f"=== {case['id']} MISMATCH  input={case['html'][:120]!r}")
                g, m = gold["tree"].splitlines(), mine.splitlines()
                for i in range(max(len(g), len(m))):
                    gl = g[i] if i < len(g) else "<missing>"
                    ml = m[i] if i < len(m) else "<missing>"
                    marker = "  " if gl == ml else "! "
                    print(f"{marker}ref: {gl}")
                    if gl != ml:
                        print(f"{marker}got: {ml}")
    print(f"tree-diff: {len(cases) - fails}/{len(cases)} match")
    return 0 if fails == 0 else 2


if __name__ == "__main__":
    show = 5
    if "--show" in sys.argv:
        i = sys.argv.index("--show")
        show = int(sys.argv[i + 1])
    run(sys.argv[1], show)
