"""End-to-end extraction pipelines (Ray-Data-native, streaming).

read_parquet → ExtractStage (actor pool) → write_parquet / rollups.
Wide steps: rollups pre-aggregate inside map_batches before the small
groupby; partitioning key is hash(url) (north rule) for resumable output.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.extract import ExtractStage, extract_pages, DEFAULT_BUDGETS


def read_pages(sf_dir_or_path: str, columns: list[str] | None = None):
    """Column-pruned parquet read of the pages table."""
    import ray
    return ray.data.read_parquet(sf_dir_or_path, columns=columns)


def extract_pipeline(pages_ds, *, concurrency=None, batch_size: int = 64):
    """pages → extracted text Dataset (streaming, never materializes)."""
    return extract_pages(pages_ds, concurrency=concurrency,
                         batch_size=batch_size)


# ---------------------------------------------------------------------------
# rollups: extraction stats by (lang, ts_bucket) — partial-aggregate inside
# map_batches so the all-to-all groupby only moves tiny per-batch partials
# (SURVEY.md §2.5)

def _partial_rollup(batch: pa.Table) -> pa.Table:
    ts = batch.column("warc_ts")
    bucket = pc.strftime(ts, format="%Y-%m")
    tbl = batch.append_column("ts_bucket", bucket)
    langs = tbl.column("lang").to_pylist()
    buckets = tbl.column("ts_bucket").to_pylist()
    n_errors = tbl.column("n_errors").to_pylist()
    quirks = tbl.column("quirks_mode").to_pylist()
    text_len = tbl.column("n_chars").to_pylist()
    status = tbl.column("status").to_pylist()

    agg: dict[tuple[str, str], list] = {}
    for i in range(len(langs)):
        key = (langs[i], buckets[i])
        slot = agg.get(key)
        if slot is None:
            slot = agg[key] = [0, 0, 0, 0, 0]  # docs, errors, quirks, chars, failed
        slot[0] += 1
        slot[1] += n_errors[i]
        slot[2] += 1 if quirks[i] == "quirks" else 0
        slot[3] += text_len[i]
        slot[4] += 1 if status[i] != "ok" else 0

    keys = sorted(agg)
    return pa.table({
        "lang": pa.array([k[0] for k in keys], pa.string()),
        "ts_bucket": pa.array([k[1] for k in keys], pa.string()),
        "docs": pa.array([agg[k][0] for k in keys], pa.int64()),
        "parse_errors": pa.array([agg[k][1] for k in keys], pa.int64()),
        "quirks_docs": pa.array([agg[k][2] for k in keys], pa.int64()),
        "text_chars": pa.array([agg[k][3] for k in keys], pa.int64()),
        "failed_docs": pa.array([agg[k][4] for k in keys], pa.int64()),
    })


def rollup_stats(extracted_ds):
    """Dataset[extracted] → Dataset[(lang, ts_bucket, docs, parse_errors,
    quirks_docs, text_chars, failed_docs, mean_text_chars)]."""
    from ray.data.aggregate import Sum

    partial = extracted_ds.map_batches(_partial_rollup, batch_format="pyarrow")
    rolled = partial.groupby(["lang", "ts_bucket"]).aggregate(
        Sum("docs", alias_name="docs"),
        Sum("parse_errors", alias_name="parse_errors"),
        Sum("quirks_docs", alias_name="quirks_docs"),
        Sum("text_chars", alias_name="text_chars"),
        Sum("failed_docs", alias_name="failed_docs"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        docs = batch.column("docs")
        chars = batch.column("text_chars")
        mean = pc.divide(pc.cast(chars, pa.float64()), pc.cast(docs, pa.float64()))
        return batch.append_column("mean_text_chars", mean)

    return rolled.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# url-hash partitioning (north rule): deterministic lineage key

def add_url_bucket(ds, n_buckets: int = 64):
    """Append part = hash(url) % n_buckets (deterministic, shuffle-free)."""
    import zlib

    def bucketize(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        part = [zlib.crc32(u.encode()) % n_buckets for u in urls]
        return batch.append_column("part", pa.array(part, pa.int32()))

    return ds.map_batches(bucketize, batch_format="pyarrow")


def write_extracted(extracted_ds, out_dir: str, n_buckets: int = 64):
    """Partitioned, resumable-friendly output: out_dir/part=K/*.parquet."""
    ds = add_url_bucket(extracted_ds, n_buckets)
    ds.write_parquet(out_dir, partition_cols=["part"])


# ---------------------------------------------------------------------------
# giant-document skew routing (SURVEY.md §4.2 "Skew"): at high parallelism a
# handful of multi-MB documents straggle whole dispatch bundles. A
# two-branch filter+union re-executes the upstream read per consumer (2×
# scan I/O of a 100-TB corpus to isolate ~0.1% of rows), so the routing is
# a SINGLE pass: one generator stage splits each block, yielding the small
# rows in bulk and every giant row as its own single-row batch, and one
# extract pool consumes the stream. Giant isolation granularity is then
# bounded by ``batch_size`` (a giant shares a bundle with at most
# batch_size-1 small rows) and, above DataContext.target_max_block_size,
# by Ray's dynamic output-block splitting; per-row budgets bound the
# worst case regardless.

GIANT_DOC_BYTES = 1_000_000


def extract_with_skew_routing(pages_ds, *, giant_bytes: int = GIANT_DOC_BYTES,
                              concurrency=None, batch_size: int = 16):
    import pyarrow.compute as pc
    from ..stages.extract import extract_pages

    def split(batch: pa.Table):
        sizes = pc.binary_length(batch.column("html"))
        small_mask = pc.less_equal(sizes, giant_bytes)
        small = batch.filter(small_mask)
        if small.num_rows:
            yield small
        giant = batch.filter(pc.invert(small_mask))
        for i in range(giant.num_rows):   # each giant in its own batch
            yield giant.slice(i, 1)

    routed = pages_ds.map_batches(split, batch_format="pyarrow")
    return extract_pages(routed, concurrency=concurrency,
                         batch_size=batch_size)


def write_quarantine(extracted_ds, out_dir: str):
    """Split ok rows from failed rows: failures land in
    ``out_dir/_quarantine/`` with their error payloads so a 10^12-doc run
    can be audited/replayed without grepping the main output."""
    import pyarrow.compute as pc

    def bad_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.not_equal(batch.column("status"), "ok"))

    bad = extracted_ds.map_batches(bad_only, batch_format="pyarrow")
    import os
    bad.write_parquet(os.path.join(out_dir, "_quarantine"))


def run_extract(input_path: str, out_dir: str, *, concurrency=None,
                batch_size: int = 16, n_buckets: int = 64,
                skew_routing: bool = True) -> None:
    """Flagship job: read → extract (skew-routed) → partitioned write.
    Streaming end-to-end."""
    pages = read_pages(input_path, columns=["url", "warc_ts", "html", "lang"])
    if skew_routing:
        extracted = extract_with_skew_routing(
            pages, concurrency=concurrency, batch_size=batch_size)
    else:
        extracted = extract_pipeline(pages, concurrency=concurrency,
                                     batch_size=batch_size)
    write_extracted(extracted, out_dir, n_buckets)


# --------------------------------------------------------------------------
# CLI entry point for `ray job submit` (the production invocation on a
# fixed-size cluster — the north rule's submission path):
#
#   ray job submit --address http://<head>:8265 -- \
#       python -m html_parser_ray.pipelines.extract \
#       /data/pages/ /out/extracted/ --buckets 256
#
# This is one of the three places allowed to own a Ray session (with
# bench.py and the test fixture); the init is guarded so it also works
# when submitted into an already-initialised driver.

def _main(argv: list[str]) -> int:
    import argparse

    parser = argparse.ArgumentParser(
        prog="python -m html_parser_ray.pipelines.extract",
        description="Streaming HTML extraction: pages parquet -> "
                    "url-hash-partitioned extracted parquet")
    parser.add_argument("input_path", help="pages parquet dir/file")
    parser.add_argument("out_dir", help="output directory")
    parser.add_argument("--buckets", type=int, default=64,
                        help="url-hash output partitions (default 64)")
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--concurrency", type=int, default=None,
                        help="actor pool size (default ~75%% of CPUs)")
    parser.add_argument("--no-skew-routing", action="store_true")
    args = parser.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init()  # in `ray job submit` this attaches to the cluster
    try:
        run_extract(args.input_path, args.out_dir,
                    concurrency=args.concurrency,
                    batch_size=args.batch_size,
                    n_buckets=args.buckets,
                    skew_routing=not args.no_skew_routing)
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    import sys
    raise SystemExit(_main(sys.argv[1:]))
