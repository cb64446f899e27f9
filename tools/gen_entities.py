"""Generate the HTML named-character-reference table for the tokenizer.

Source: the public WHATWG entities.json (https://html.spec.whatwg.org/entities.json),
a copy of which ships in the reference checkout at
/root/reference/vendor/whatwg/entities.json. The table is public spec data, not code.

Output: html_parser_ray/htmlcore/entities.json  — mapping
    name (without leading '&', WITH trailing ';' when present) -> replacement chars

Run:  python tools/gen_entities.py
"""

import json
import pathlib

SRC = pathlib.Path("/root/reference/vendor/whatwg/entities.json")
DST = pathlib.Path(__file__).resolve().parents[1] / "html_parser_ray" / "htmlcore" / "entities.json"


def main() -> None:
    raw = json.loads(SRC.read_text())
    table = {name.lstrip("&"): info["characters"] for name, info in raw.items()}
    DST.write_text(json.dumps(table, ensure_ascii=True, sort_keys=True, separators=(",", ":")))
    print(f"wrote {DST} with {len(table)} entries")


if __name__ == "__main__":
    main()
