"""Held-out fixture partition (the reference's holdout policy,
test/holdout/README.md + run-serializer-fixtures.mjs:17-23): a
deterministic hash(id) % 10 == 0 slice of every golden corpus is EXCLUDED
from routine pytest runs and executed only by the release gate
(tests/test_holdout_release.py, marker ``release``):

    python -m pytest tests/test_holdout_release.py -m release

The split uses the reference's own fixture-id hash
(Math.imul(hash, 37) + charCode, unsigned 32-bit) so the partition is
stable across runs and languages.
"""

HOLDOUT_MOD = 10


def holdout_hash(fixture_id: str) -> int:
    h = 0
    for ch in fixture_id:
        h = (h * 37 + ord(ch)) & 0xFFFFFFFF
    return h


def is_holdout(fixture_id: str) -> bool:
    return holdout_hash(fixture_id) % HOLDOUT_MOD == 0
