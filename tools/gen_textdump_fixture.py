"""Generate the independent visible-text oracle fixture.

Runs tools/ref_oracle/textdump_oracle.mjs (a lynx/w3m-style text dump over
the reference's vendored parse5 — the sandbox stand-in for the reference's
`lynx -dump`/`w3m -dump` token-F1 compare,
scripts/dev/visible-text-oracle-compare.mjs:20-60) over N deterministic
synthetic pages and writes tests/fixtures/textdump/dumps.jsonl.gz with
{"id", "html_sha256", "dump"} per page. tests/test_textdump_f1.py then
compares this repo's visibleText against the committed dumps WITHOUT
needing node (hermetic; the html_sha256 guards against synth drift).

Usage: python tools/gen_textdump_fixture.py
"""

import gzip
import hashlib
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from html_parser_ray.sources.synth import make_page          # noqa: E402
from html_parser_ray.htmlcore.sniff import decode_html_bytes  # noqa: E402

N_DOCS = 600
SEED = 777
SIZE_SCALE = 2
OUT = os.path.join(REPO, "tests", "fixtures", "textdump", "dumps.jsonl.gz")


def main() -> None:
    cases = []
    for i in range(N_DOCS):
        page = make_page(i, seed=SEED, size_scale=SIZE_SCALE)
        text, _sniff = decode_html_bytes(page["html"], None)
        cases.append({"id": str(i), "html": text})

    proc = subprocess.run(
        ["node", os.path.join(REPO, "tools", "ref_oracle",
                              "textdump_oracle.mjs")],
        input="\n".join(json.dumps(c) for c in cases),
        capture_output=True, text=True, timeout=600, check=True)
    dumps = {d["id"]: d for d in
             (json.loads(line) for line in proc.stdout.splitlines())}
    errors = [d for d in dumps.values() if "error" in d]
    if errors:
        raise SystemExit(f"oracle errors: {errors[:3]}")

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with gzip.open(OUT, "wt", encoding="utf-8") as f:
        for c in cases:
            f.write(json.dumps({
                "id": c["id"],
                "html_sha256": hashlib.sha256(
                    c["html"].encode("utf-8")).hexdigest(),
                "dump": dumps[c["id"]]["dump"],
            }) + "\n")
    print(f"wrote {len(cases)} dumps to {OUT}")

    # report the F1 distribution so the pytest gate can be set honestly
    from html_parser_ray.htmlcore.api import parse
    from html_parser_ray.htmlcore.extract import visible_text
    from tests.test_textdump_f1 import token_f1
    f1s = sorted(token_f1(dumps[c["id"]]["dump"],
                          visible_text(parse(c["html"]))) for c in cases)
    n = len(f1s)
    print(json.dumps({
        "mean": round(statistics.mean(f1s), 4),
        "median": round(f1s[n // 2], 4),
        "p10": round(f1s[n // 10], 4),
        "min": round(f1s[0], 4),
        "frac_ge_0.95": round(sum(1 for x in f1s if x >= 0.95) / n, 4),
    }))


if __name__ == "__main__":
    main()
