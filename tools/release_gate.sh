#!/bin/sh -e
# Release gate (mirrors the reference's release eval profile shape):
# routine suite + the held-out golden partition + the driver-identical
# oracle compare. Run from the repo root with the box otherwise idle.
python -m pytest tests/ -q
python -m pytest tests/test_holdout_release.py -m release -q
# golden-regeneration protocol: a deterministic sample of the committed
# error-stream/transition corpora is re-derived through the reference's
# vendored parser and diffed (skips with a notice when node is absent)
python tools/regen_golden_sample.py 50
python tools/check_oracle.py "${1:-/root/testdata/sf0.001}"
