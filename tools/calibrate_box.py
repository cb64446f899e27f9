"""Single-box scaling-confound calibration.

Measures the single-thread extract-kernel rate (parse_bytes + visible_text,
no Ray) on an idle box vs with N background pure-CPU burner processes.

On a virtualized single node, per-core throughput drops when sibling cores
are busy (frequency scaling / shared memory bandwidth) — a confound that a
fixed-size multi-node cluster does NOT have, since nodes do not share
silicon. The measured drop bounds the *apparent* scaling efficiency of any
CPU-bound pipeline benchmarked at two parallelism levels on one box, which
is why bench.py --scaling also offers GRAFT_SCALING_CONTROLLED=1
(equal-occupancy legs). Results are recorded in BASELINE.md.

Usage: python tools/calibrate_box.py [n_docs]
"""

import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _burner(stop_at: float) -> None:
    x = 1
    while time.time() < stop_at:
        x = (x * 1103515245 + 12345) % 2147483648


def kernel_rate(n_docs: int) -> float:
    from html_parser_ray.sources.synth import make_table
    from html_parser_ray.htmlcore.api import parse_bytes
    from html_parser_ray.htmlcore.extract import visible_text
    tbl = make_table(n_docs, seed=42, size_scale=32)
    htmls = tbl.column("html").to_pylist()
    t0 = time.perf_counter()
    for h in htmls:
        visible_text(parse_bytes(h))
    return len(htmls) / (time.perf_counter() - t0)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    n_cores = os.cpu_count() or 32
    results = {}
    for burners in (0, n_cores // 2 - 1, n_cores - 1):
        procs = []
        if burners:
            stop = time.time() + 120
            procs = [mp.Process(target=_burner, args=(stop,))
                     for _ in range(burners)]
            for p in procs:
                p.start()
            time.sleep(2)
        rate = kernel_rate(n_docs)
        results[burners] = rate
        print(f"burners={burners:>2}: {rate:6.1f} docs/s single-thread")
        for p in procs:
            p.terminate()
        for p in procs:
            p.join()
    idle = results[0]
    for burners, rate in results.items():
        if burners:
            print(f"per-core capacity at occupancy {burners + 1}: "
                  f"{rate / idle:.3f} of idle")


if __name__ == "__main__":
    main()
