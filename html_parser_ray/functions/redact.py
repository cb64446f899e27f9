"""PII redaction for training corpora: vectorized regex scrubbing of
emails, IPv4 addresses and NANP-style phone numbers inside `map_batches`.

Patterns are RE2-compatible (no lookarounds, no backreferences) so the
exact same redaction is expressible in DuckDB's regexp_replace — the
driver oracle runs both engines over the same text and compares
bit-for-bit. Replacement order is fixed (email → ip → phone) and the
patterns are mutually non-overlapping by construction (emails contain
'@', IPs are dotted digit quads bounded by non-digits, phones contain
'-' groups), so the order never changes the result.

At 100 TB this is a stateless map_batches stage: patterns compile once at
module import, each batch does len(texts) re.subn calls with no Python
work beyond the list comprehension, nothing shuffles.
"""

from __future__ import annotations

import re

import pyarrow as pa

# RE2-compatible: character classes + bounded repeats only.
EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
# re.ASCII pins \b to ASCII word chars — RE2's \b is ASCII-only, and
# without the flag Python's Unicode \b diverges from the DuckDB oracle
# whenever a non-ASCII letter abuts the digit quad (e.g. "χ10.0.0.1").
IPV4_RE = re.compile(
    r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", re.ASCII)
# 2-3 dash groups so the canonical NANP form +1-212-555-0187 (country
# code + THREE groups) matches, not only +C-XXX-XXXX
PHONE_RE = re.compile(r"\+[0-9]{1,3}(?:-[0-9]{2,4}){2,3}")

EMAIL_TOKEN = "[EMAIL]"
IP_TOKEN = "[IP]"
PHONE_TOKEN = "[PHONE]"


def redact(text: str) -> tuple[str, int, int, int]:
    """(redacted_text, n_emails, n_ips, n_phones)."""
    out, n_email = EMAIL_RE.subn(EMAIL_TOKEN, text)
    out, n_ip = IPV4_RE.subn(IP_TOKEN, out)
    out, n_phone = PHONE_RE.subn(PHONE_TOKEN, out)
    return out, n_email, n_ip, n_phone


def redact_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    res = [redact(t) for t in texts]
    out = {name: batch.column(name)
           for name in batch.column_names if name != "text"}
    out["text"] = pa.array([r[0] for r in res], pa.string())
    out["n_emails"] = pa.array([r[1] for r in res], pa.int64())
    out["n_ips"] = pa.array([r[2] for r in res], pa.int64())
    out["n_phones"] = pa.array([r[3] for r in res], pa.int64())
    return pa.table(out)


def redact_corpus(ds):
    """Dataset[..., text] → Dataset with text scrubbed + per-doc PII
    counts. Stateless tasks (no actor pool needed — no setup cost)."""
    return ds.map_batches(redact_batch, batch_format="pyarrow")
