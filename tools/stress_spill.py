"""Memory-pressure stress: run the flagship extract over the 4x corpus
(64,000 CC-scale pages, ~2.5 GB of html) with a deliberately SMALL
object store so Ray's streaming executor must spill to disk, then assert
(a) completion with every doc ok and (b) BIT-IDENTICAL output on the
16k-page slice that overlaps the standard bench corpus (pages are a pure
function of index, so slice digests must match a no-pressure run).

This is the 100-TB posture evidence the round-4 verdict asked for: at
real scale the object store is ALWAYS too small for the in-flight data,
and correctness must not depend on everything fitting in plasma.

Usage: python tools/stress_spill.py [store_mb=1024] [n_pages=64000]
Prints one JSON line; exits nonzero on any mismatch.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyarrow as pa

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# the standard bench corpus size (sf0.1); env override for smoke tests
OVERLAP = int(os.environ.get("GRAFT_SPILL_OVERLAP", "16000"))


def _ensure_corpus(n_pages: int) -> str:
    import ray
    path = os.path.join("/tmp/graft_bench",
                        f"pages_n{n_pages}_scale32_seed42")
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        from html_parser_ray.sources.synth import pages_dataset
        pages_dataset(n_pages, seed=42, parallelism=256,
                      size_scale=32).write_parquet(path)
        with open(marker, "w") as f:
            f.write("ok")
    return path


def _slice_digest(extracted) -> dict:
    """Distributed order-independent digest of the overlapping slice:
    per-row blake2b over the row's full extract output, summed mod 2^61
    (commutative, so block order / parallelism cannot change it)."""
    import hashlib

    def fold(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        status = batch.column("status").to_pylist()
        chars = batch.column("n_chars").to_pylist()
        acc = 0
        n_in = 0
        n_ok = 0
        total_ok = 0
        for u, t, s, c in zip(urls, texts, status, chars):
            total_ok += s == "ok"
            if int(u[-8:]) >= OVERLAP:
                continue
            n_in += 1
            n_ok += s == "ok"
            h = hashlib.blake2b(
                f"{u}\x00{s}\x00{c}\x00{t}".encode(), digest_size=8)
            acc = (acc + int.from_bytes(h.digest(), "big")) % (1 << 61)
        return pa.table({"digest": pa.array([acc], pa.int64()),
                         "rows": pa.array([n_in], pa.int64()),
                         "ok": pa.array([n_ok], pa.int64()),
                         "total_n": pa.array([batch.num_rows], pa.int64()),
                         "total_ok": pa.array([total_ok], pa.int64())})

    out = extracted.map_batches(fold, batch_format="pyarrow") \
        .sum(["digest", "rows", "ok", "total_n", "total_ok"])
    return {"digest": out["sum(digest)"] % (1 << 61),
            "rows": out["sum(rows)"], "ok": out["sum(ok)"],
            "total_n": out["sum(total_n)"],
            "total_ok": out["sum(total_ok)"]}


class _SpillSampler:
    """Samples the Ray session's spill directory (files come and go as
    objects are spilled/freed, so END-of-run size understates; the
    sampler records cumulative created bytes and peak on-disk bytes).
    The grpc-backed memory_summary API is unavailable in this container,
    so disk observation is the ground truth here."""

    def __init__(self, session_dir: str):
        import glob
        import threading
        self._dirs = lambda: glob.glob(
            os.path.join(session_dir, "ray_spilled_objects*"))
        self._stop = threading.Event()
        self.peak_bytes = 0
        self.seen: dict[str, int] = {}
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self) -> None:
        while not self._stop.is_set():
            total = 0
            for d in self._dirs():
                try:
                    for name in os.listdir(d):
                        p = os.path.join(d, name)
                        try:
                            size = os.path.getsize(p)
                        except OSError:
                            continue
                        total += size
                        prev = self.seen.get(p, 0)
                        if size > prev:
                            self.seen[p] = size
                except OSError:
                    pass
            self.peak_bytes = max(self.peak_bytes, total)
            self._stop.wait(0.25)

    def finish(self) -> dict:
        self._stop.set()
        self._thread.join(timeout=5)
        return {"spilled_file_bytes_cum": sum(self.seen.values()),
                "spilled_files": len(self.seen),
                "peak_on_disk_bytes": self.peak_bytes}


def _run_leg(corpus: str, num_cpus: int,
             object_store_mb: int | None) -> dict:
    import ray
    from html_parser_ray.stages.extract import extract_pages

    kwargs = {}
    if object_store_mb is not None:
        kwargs["object_store_memory"] = object_store_mb * 1024 * 1024
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             log_to_driver=False, **kwargs)
    sampler = _SpillSampler(
        ray._private.worker.global_worker.node.get_session_dir_path())
    try:
        pages = ray.data.read_parquet(
            corpus, columns=["url", "warc_ts", "html", "lang"],
            override_num_blocks=max(64, num_cpus * 4))
        t0 = time.perf_counter()
        extracted = extract_pages(pages, batch_size=16)
        digest = _slice_digest(extracted)
        elapsed = time.perf_counter() - t0
        spill = sampler.finish()
        return {"elapsed_s": round(elapsed, 1),
                "slice": {k: digest[k] for k in ("digest", "rows", "ok")},
                "total_docs": digest["total_n"],
                "total_ok": digest["total_ok"],
                "object_store_mb": object_store_mb,
                "spill": spill}
    finally:
        ray.shutdown()


def _run_materialize_leg(corpus: str, num_cpus: int,
                         store_mb: int) -> dict:
    """Force the SPILL path itself (the streaming legs above bound
    in-flight bytes via backpressure and may never spill): materialize
    the full extract output — text blocks larger than the store must
    spill to disk and be restored for the digest pass."""
    import ray
    from html_parser_ray.stages.extract import extract_pages

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             log_to_driver=False,
             object_store_memory=store_mb * 1024 * 1024)
    sampler = _SpillSampler(
        ray._private.worker.global_worker.node.get_session_dir_path())
    try:
        pages = ray.data.read_parquet(
            corpus, columns=["url", "warc_ts", "html", "lang"],
            override_num_blocks=max(64, num_cpus * 4))
        t0 = time.perf_counter()
        mat = extract_pages(pages, batch_size=16).materialize()
        digest = _slice_digest(mat)
        elapsed = time.perf_counter() - t0
        spill = sampler.finish()
        return {"elapsed_s": round(elapsed, 1),
                "slice": {k: digest[k] for k in ("digest", "rows", "ok")},
                "total_docs": digest["total_n"],
                "total_ok": digest["total_ok"],
                "object_store_mb": store_mb,
                "spill": spill}
    finally:
        ray.shutdown()


def main() -> int:
    store_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 64_000
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray as _ray
    _ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
              log_to_driver=False)
    corpus_big = _ensure_corpus(n_pages)
    corpus_std = _ensure_corpus(OVERLAP)
    _ray.shutdown()

    # leg A: no pressure, standard 16k corpus — the reference digest
    ref = _run_leg(corpus_std, num_cpus, object_store_mb=None)
    # leg B: 4x corpus under a small object store, streaming — the
    # executor THROTTLES to keep in-flight bytes under plasma (observed:
    # zero spill files); must complete and match
    stressed = _run_leg(corpus_big, num_cpus, object_store_mb=store_mb)
    # leg C: 16k corpus MATERIALIZED under the small store — retained
    # blocks exceed plasma, so the spill/restore path itself runs
    mat = _run_materialize_leg(corpus_std, num_cpus, store_mb)

    identical = (ref["slice"]["digest"] == stressed["slice"]["digest"]
                 == mat["slice"]["digest"]
                 and ref["slice"]["rows"] == stressed["slice"]["rows"]
                 == mat["slice"]["rows"] == OVERLAP)
    complete = stressed["total_ok"] == stressed["total_docs"] == n_pages
    result = {
        "metric": "spill-stress extract (4x corpus, small object store)",
        "n_pages": n_pages,
        "object_store_mb": store_mb,
        "num_cpus": num_cpus,
        "stressed": stressed,
        "materialized": mat,
        "reference": ref,
        "slice_identical": identical,
        "complete_all_ok": complete,
        "spill_exercised": mat["spill"]["spilled_files"] > 0,
        "passed": bool(identical and complete),
    }
    print(json.dumps(result))
    return 0 if result["passed"] else 1


if __name__ == "__main__":
    sys.exit(main())
