"""URL canonicalization + host extraction for web-corpus pipelines.

Canonical form (the common crawl-dedup prep):
  * scheme and host lowercased
  * default ports stripped (http:80, https:443)
  * fragment dropped
  * path dot-segments resolved (RFC 3986 §5.2.4) and empty path → "/"
  * tracking params dropped (utm_*, fbclid, gclid)
  * remaining query params sorted by (key, value) for a stable key

`host` and a registered-domain heuristic (last two labels, or last three
when the second-level label is a known public-suffix second level like
co/com/ac) come along for host-level rollups.

Stateless map_batches transform: a hand-rolled parser (stdlib-only, no
per-row urllib object churn) over the batch's url column; nothing
shuffles. Host-level rollups then groupby the (tiny) host column only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_DEFAULT_PORTS = {"http": "80", "https": "443"}
_TRACKING_PREFIXES = ("utm_",)
_TRACKING_KEYS = {"fbclid", "gclid"}
_SECOND_LEVEL_SUFFIXES = {"co", "com", "ac", "org", "net", "gov", "edu"}


def _resolve_dots(path: str) -> str:
    out: list[str] = []
    for seg in path.split("/"):
        if seg == "..":
            if out:
                out.pop()
        elif seg != "." and seg != "":
            out.append(seg)
    return "/" + "/".join(out)


def canonicalize_url(url: str) -> tuple[str, str, str]:
    """(canonical_url, host, registered_domain)."""
    rest = url
    scheme = ""
    if "://" in rest:
        scheme, rest = rest.split("://", 1)
    scheme = scheme.lower()
    rest = rest.split("#", 1)[0]               # drop fragment
    query = ""
    if "?" in rest:
        rest, query = rest.split("?", 1)
    hostport, _, path = rest.partition("/")
    host = hostport.lower()
    if ":" in host:
        host, port = host.rsplit(":", 1)
        if _DEFAULT_PORTS.get(scheme) != port:
            host = f"{host}:{port}"
    path = _resolve_dots("/" + path)
    params = []
    for pair in query.split("&"):
        if not pair:
            continue
        key = pair.split("=", 1)[0]
        if key.lower().startswith(_TRACKING_PREFIXES) \
                or key.lower() in _TRACKING_KEYS:
            continue
        params.append(pair)
    params.sort()
    canon = f"{scheme}://{host}{path}"
    if params:
        canon += "?" + "&".join(params)
    bare_host = host.rsplit(":", 1)[0] if ":" in host else host
    labels = bare_host.split(".")
    if len(labels) >= 3 and labels[-2] in _SECOND_LEVEL_SUFFIXES:
        reg = ".".join(labels[-3:])
    else:
        reg = ".".join(labels[-2:]) if len(labels) >= 2 else bare_host
    return canon, host, reg


def canonicalize_batch(batch: pa.Table) -> pa.Table:
    urls = batch.column("url").to_pylist()
    res = [canonicalize_url(u) for u in urls]
    out = {name: batch.column(name) for name in batch.column_names}
    out["canonical_url"] = pa.array([r[0] for r in res], pa.string())
    out["host"] = pa.array([r[1] for r in res], pa.string())
    out["registered_domain"] = pa.array([r[2] for r in res], pa.string())
    return pa.table(out)


def _host_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial combine: collapse to one row per domain BEFORE
    the shuffle (same combiner pattern as functions/windows.py) — what
    crosses the exchange is |domains-in-batch| rows, not |docs|."""
    g = batch.select(["registered_domain", "n_chars"]) \
        .group_by("registered_domain") \
        .aggregate([("n_chars", "sum"), ("n_chars", "count")])
    return pa.table({
        "registered_domain": g.column("registered_domain"),
        "n_docs": g.column("n_chars_count").cast(pa.int64()),
        "sum_chars": g.column("n_chars_sum").cast(pa.int64()),
    })


def host_rollup(ds):
    """Dataset[..., url, n_chars] → per-registered-domain doc count and
    char sum. Canonicalize in map_batches (stateless, vectorized),
    partial-aggregate per batch, then one small groupby over the
    partials — only (domain, n_docs, sum_chars) rows move."""
    from ray.data.aggregate import Sum
    canon = ds.map_batches(canonicalize_batch, batch_format="pyarrow")
    partial = canon.map_batches(_host_partial, batch_format="pyarrow")
    return partial.groupby("registered_domain").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("sum_chars", alias_name="sum_chars"))


def url_blocklist_flags(ds, *, blocked_domains: list[str],
                        blocked_substrings: list[str],
                        url_col: str = "url"):
    """Append (blocked, reason) per row — UT1/RefinedWeb-style URL
    filtering (Penedo et al. 2023): a document is blocked when its
    canonical host equals or is a subdomain of a blocked domain, or its
    lowercased raw URL contains a blocked substring.

    Rule order is pinned (sorted domains first, then sorted substrings;
    first match wins) so the reason column is deterministic and
    SQL-expressible. The blocklists are tiny broadcast state (UT1 is
    ~4M entries ≈ 100 MB — ray.put once, shared per node); the corpus
    streams with no shuffle."""
    import ray

    doms = frozenset(blocked_domains)
    subs = sorted(blocked_substrings)
    ref = ray.put((doms, subs))

    def flag(batch: pa.Table) -> pa.Table:
        b_doms, b_subs = ray.get(ref)
        urls = batch.column(url_col).to_pylist()
        blocked = np.zeros(len(urls), dtype=np.int64)
        reasons = []
        for i, u in enumerate(urls):
            host = canonicalize_url(u)[1]
            # a NON-default port survives canonicalization in the host
            # ("spam.example.com:8080") and used to bypass the domain
            # match entirely — strip it (bracketed IPv6 excepted)
            if ":" in host and not host.endswith("]"):
                host = host.rsplit(":", 1)[0]
            low = u.lower()
            reason = ""
            # suffix-set probe: O(#labels) membership tests instead of a
            # linear scan over the (UT1-scale, ~4M-entry) domain list;
            # min() over the matched suffixes reproduces the pinned
            # "first in sorted order" rule exactly
            matches = []
            suffix = host
            while suffix:
                if suffix in b_doms:
                    matches.append(suffix)
                dot = suffix.find(".")
                if dot == -1:
                    break
                suffix = suffix[dot + 1:]
            if matches:
                reason = f"domain:{min(matches)}"
            if not reason:
                for s in b_subs:
                    if s in low:
                        reason = f"substring:{s}"
                        break
            if reason:
                blocked[i] = 1
            reasons.append(reason)
        batch = batch.append_column("blocked",
                                    pa.array(blocked, pa.int64()))
        return batch.append_column("reason", pa.array(reasons, pa.string()))

    return ds.map_batches(flag, batch_format="pyarrow")
