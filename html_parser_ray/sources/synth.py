"""Deterministic synthetic Common-Crawl-style page table generator.

Produces the BASELINE.json ``input_hint`` schema:
  (url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string)

Seeded and fully deterministic — same (seed, n_rows) ⇒ byte-identical table.
The recipe mix mirrors what the reference's corpora exercise (FIXTURES.md §1):
clean articles, tables + foster parenting, hidden subtrees, control values,
noscript fallback, pre/textarea, entities, malformed markup (adoption agency,
unclosed tags, quirks doctypes), encoding variants, and rare pathological
outliers (deep nesting / repeated sections) for skew testing.
"""

from __future__ import annotations

import datetime
import random

import pyarrow as pa

LANGS = ("en", "de", "fr", "es", "ar", "zh")

_WORDS = {
    "en": "the quick brown fox jumps over lazy dog data pipeline extraction scale web crawl".split(),
    "de": "der schnelle braune fuchs springt über den faulen hund daten skala netz".split(),
    "fr": "le renard brun rapide saute par dessus le chien paresseux données échelle".split(),
    "es": "el zorro marrón rápido salta sobre el perro perezoso datos escala red".split(),
    "ar": "الثعلب البني السريع يقفز فوق الكلب الكسول بيانات شبكة".split(),
    "zh": "敏捷 的 棕色 狐狸 跳过 懒惰 的 狗 数据 规模 网络 抓取".split(),
}

_BASE_TS = datetime.datetime(2024, 1, 1)


def _sentence(rng: random.Random, lang: str, n: int) -> str:
    words = _WORDS[lang]
    return " ".join(rng.choice(words) for _ in range(n))


def _recipe_article(rng: random.Random, lang: str) -> str:
    paras = "".join(
        f"<p>{_sentence(rng, lang, rng.randint(8, 40))}</p>"
        for _ in range(rng.randint(2, 8)))
    items = "".join(
        f"<li>{_sentence(rng, lang, rng.randint(2, 8))}</li>"
        for _ in range(rng.randint(2, 6)))
    return (f"<nav><a href='/'>Home</a><a href='/x'>More</a></nav>"
            f"<main><article><h1>{_sentence(rng, lang, 5)}</h1>{paras}"
            f"<ul>{items}</ul></article></main>"
            f"<aside>{_sentence(rng, lang, 6)}</aside>"
            f"<footer>{_sentence(rng, lang, 4)}</footer>")


def _recipe_table(rng: random.Random, lang: str) -> str:
    rows = "".join(
        "<tr>" + "".join(f"<td>{_sentence(rng, lang, 2)}</td>"
                         for _ in range(rng.randint(2, 5))) + "</tr>"
        for _ in range(rng.randint(2, 6)))
    foster = f"<table><tr><td>{_sentence(rng, lang, 2)}</td></tr>{_sentence(rng, lang, 3)}</table>"
    return f"<h2>{_sentence(rng, lang, 3)}</h2><table><thead><tr><th>A</th><th>B</th></tr></thead><tbody>{rows}</tbody></table>{foster}"


def _recipe_hidden(rng: random.Random, lang: str) -> str:
    return (f"<div hidden>{_sentence(rng, lang, 10)}</div>"
            f"<div style='display:none'>{_sentence(rng, lang, 8)}</div>"
            f"<div aria-hidden='true'>{_sentence(rng, lang, 6)}</div>"
            f"<div>{_sentence(rng, lang, 12)}</div>")


def _recipe_controls(rng: random.Random, lang: str) -> str:
    return (f"<p><img alt='{_sentence(rng, lang, 2)}' src='x.png'>"
            f"<input type='submit' value='{rng.choice(_WORDS[lang])}'>"
            f"<button value='{rng.choice(_WORDS[lang])}'></button>"
            f"<input aria-label='{_sentence(rng, lang, 2)}'>"
            f"<input type='hidden' value='secret'></p>"
            f"<p>{_sentence(rng, lang, 10)}</p>")


def _recipe_noscript(rng: random.Random, lang: str) -> str:
    inner = f"&lt;div&gt;{_sentence(rng, lang, 4)}&lt;/div&gt;"
    return (f"<noscript>{inner}</noscript>"
            f"<script>var x = '<div>ignored</div>';</script>"
            f"<p>{_sentence(rng, lang, 8)}</p>")


def _recipe_pre(rng: random.Random, lang: str) -> str:
    lines = "\n".join(_sentence(rng, lang, 4) for _ in range(rng.randint(2, 5)))
    return (f"<pre>\n{lines}\n</pre><textarea>{lines}</textarea>"
            f"<p>a&amp;b &copy; &notit; &#169; &#x2713;</p>")


def _recipe_malformed(rng: random.Random, lang: str) -> str:
    return (f"<b><i>{_sentence(rng, lang, 4)}</b>{_sentence(rng, lang, 3)}</i>"
            f"<p>{_sentence(rng, lang, 5)}<div>{_sentence(rng, lang, 5)}"
            f"<ul><li>{_sentence(rng, lang, 2)}<li>{_sentence(rng, lang, 2)}"
            f"</frameset><select><option>{rng.choice(_WORDS[lang])}")


def _recipe_deep(rng: random.Random, lang: str) -> str:
    depth = rng.randint(150, 220)
    return "<div>" * depth + _sentence(rng, lang, 6) + "</div>" * depth


def _recipe_giant(rng: random.Random, lang: str) -> str:
    section = f"<section><h2>{_sentence(rng, lang, 4)}</h2><p>{_sentence(rng, lang, 60)}</p></section>"
    return section * rng.randint(200, 400)


_RECIPES = (
    (_recipe_article, 40),
    (_recipe_table, 15),
    (_recipe_hidden, 10),
    (_recipe_controls, 10),
    (_recipe_noscript, 5),
    (_recipe_pre, 8),
    (_recipe_malformed, 10),
    (_recipe_deep, 1),
    (_recipe_giant, 1),
)
_RECIPE_FNS = [r for r, _ in _RECIPES]
_RECIPE_WEIGHTS = [w for _, w in _RECIPES]

_QUIRKS_DOCTYPES = (
    "", "<!doctype html>", "<!DOCTYPE HTML PUBLIC \"-//W3C//DTD HTML 4.0 Transitional//EN\">",
    "<!doctype html>", "<!doctype html>",
)


def make_page(i: int, seed: int = 42, size_scale: int = 1) -> dict:
    """``size_scale`` repeats the recipe body to reach CC-realistic page
    sizes (~size_scale × 0.8 KB mean); 1 keeps tests fast, bench uses ~32."""
    rng = random.Random((seed << 32) ^ i)
    lang = LANGS[i % len(LANGS)]
    recipe = rng.choices(_RECIPE_FNS, weights=_RECIPE_WEIGHTS, k=1)[0]
    if size_scale <= 1:
        body = recipe(rng, lang)
    else:
        reps = rng.randint(max(1, size_scale // 2), size_scale * 2)
        if recipe in (_recipe_deep, _recipe_giant):
            reps = min(reps, max(1, size_scale // 4))  # bound outliers
        body = "".join(recipe(rng, lang) for _ in range(reps))
    doctype = rng.choice(_QUIRKS_DOCTYPES)
    title = _sentence(rng, lang, 3)

    enc_roll = rng.random()
    if enc_roll < 0.80:
        head = f"<head><meta charset='utf-8'><title>{title}</title></head>"
        html = f"{doctype}<html lang='{lang}'>{head}<body>{body}</body></html>".encode("utf-8")
    elif enc_roll < 0.90:
        head = f"<head><meta charset='windows-1252'><title>{title}</title></head>"
        text = f"{doctype}<html lang='{lang}'>{head}<body>{body} café – naïve</body></html>"
        html = text.encode("cp1252", errors="replace")
    elif enc_roll < 0.95:
        head = f"<head><title>{title}</title></head>"
        html = b"\xef\xbb\xbf" + f"{doctype}<html lang='{lang}'>{head}<body>{body}</body></html>".encode("utf-8")
    else:
        # meta variants: latin-1 alias or prescan-blocking comment
        if rng.random() < 0.5:
            head = f"<head><meta http-equiv='Content-Type' content='text/html; charset=latin-1'><title>{title}</title></head>"
        else:
            head = f"<head><!-- unterminated <meta charset='utf-8'> comment <title>{title}</title></head>"
        html = f"{doctype}<html lang='{lang}'>{head}<body>{body}</body></html>".encode("utf-8")

    ts = _BASE_TS + datetime.timedelta(seconds=(i * 2654435761) % (365 * 86400))
    return {
        "url": f"https://example.org/{lang}/doc-{i:08d}",
        "warc_ts": ts,
        "html": html,
        "text": "",
        "lang": lang,
    }


SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def make_table(n_rows: int, seed: int = 42, start: int = 0,
               size_scale: int = 1) -> pa.Table:
    rows = [make_page(i, seed, size_scale)
            for i in range(start, start + n_rows)]
    return pa.Table.from_pylist(rows, schema=SCHEMA)


def write_pages_parquet(path: str, n_rows: int, seed: int = 42,
                        rows_per_file: int = 10_000, start: int = 0,
                        size_scale: int = 1) -> None:
    import pyarrow.parquet as pq
    import os
    os.makedirs(path, exist_ok=True)
    end = start + n_rows
    part = 0
    while start < end:
        n = min(rows_per_file, end - start)
        pq.write_table(make_table(n, seed, start, size_scale),
                       f"{path}/part-{part:05d}.parquet")
        start += n
        part += 1


def pages_dataset(n_rows: int, seed: int = 42, parallelism: int = 32,
                  size_scale: int = 1):
    """Distributed generation: ray.data.range → map_batches(make_page)."""
    import ray

    def build(batch):
        rows = [make_page(i, seed, size_scale)
                for i in batch["id"].to_pylist()]
        return pa.Table.from_pylist(rows, schema=SCHEMA)

    return (ray.data.range(n_rows, override_num_blocks=parallelism)
            .map_batches(build, batch_format="pyarrow"))
