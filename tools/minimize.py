"""Batch delta-minimizer for tree divergences vs the parse5 oracle.

Greedy token-deletion; each round evaluates every single-deletion candidate
in ONE oracle subprocess call (node startup dominates otherwise).
"""

from __future__ import annotations

import json
import re
import subprocess
import sys

sys.path.insert(0, ".")

from html_parser_ray.htmlcore.api import parse, parse_fragment  # noqa: E402
from html_parser_ray.htmlcore.normalize import normalize_tree  # noqa: E402

_TOK = re.compile(r"<[^>]*>|[^<]+")


def oracle_batch(reqs: list[dict]) -> dict[str, str | None]:
    inp = "\n".join(json.dumps(r) for r in reqs)
    proc = subprocess.run(["node", "tools/ref_oracle/oracle.mjs"], input=inp,
                          capture_output=True, text=True, timeout=600)
    out: dict[str, str | None] = {}
    for line in proc.stdout.splitlines():
        if line.strip():
            rec = json.loads(line)
            out[rec["id"]] = rec.get("tree")
    return out


def mine(html: str, frag, scripting: bool) -> str | None:
    try:
        if frag:
            return normalize_tree(parse_fragment(html, frag, scripting_enabled=scripting))
        return normalize_tree(parse(html, scripting_enabled=scripting))
    except Exception as exc:  # noqa: BLE001
        return f"<EXC {type(exc).__name__}: {exc}>"


def minimize(html: str, frag, scripting: bool, max_rounds: int = 60) -> str:
    toks = _TOK.findall(html)
    for _ in range(max_rounds):
        cands = []
        for i in range(len(toks)):
            cands.append("".join(toks[:i] + toks[i + 1:]))
        # also try halving from each side for speed
        cands.append("".join(toks[:len(toks) // 2]))
        cands.append("".join(toks[len(toks) // 2:]))
        reqs = [{"id": str(j), "html": c, "fragment": frag, "scripting": scripting}
                for j, c in enumerate(cands)]
        gold = oracle_batch(reqs)
        best = None
        for j, c in enumerate(cands):
            g = gold.get(str(j))
            if g is None:
                continue
            if mine(c, frag, scripting) != g:
                best = c
                break
        if best is None:
            return "".join(toks)
        toks = _TOK.findall(best)
        if len(toks) <= 1:
            return best
    return "".join(toks)


def main(cases_path: str, limit: int = 10) -> None:
    cases = [json.loads(line) for line in open(cases_path) if line.strip()]
    gold = oracle_batch(cases)
    bad = []
    for c in cases:
        g = gold.get(c["id"])
        if g is not None and mine(c["html"], c.get("fragment"), c.get("scripting", True)) != g:
            bad.append(c)
    print(f"{len(bad)} failures; minimizing up to {limit}")
    seen = set()
    count = 0
    for c in bad:
        if count >= limit:
            break
        m = minimize(c["html"], c.get("fragment"), c.get("scripting", True))
        key = (m, c.get("fragment"), c.get("scripting", True))
        if key in seen:
            continue
        seen.add(key)
        count += 1
        print(f"--- frag={c.get('fragment')} scripting={c.get('scripting', True)}")
        print(f"    {m!r}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 10)
