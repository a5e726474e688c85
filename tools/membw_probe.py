#!/usr/bin/env python
"""Measured machine-ceiling probes for the scaling-efficiency analysis
(BENCH/BASELINE.md). Two independent workloads, each run at increasing
process counts on this box:

* ``stream`` — a numpy triad (``y = y + s*x`` over ~256 MB arrays per
  process): pure memory-bandwidth streaming, trivially parallel, no
  Python-interpreter time. If *this* stops scaling at N processes, the
  box's memory bus — not any Spark plan — is the ceiling.
* ``parse`` — the engine's actual HTML parse kernel
  (spider_spark.functions.parse.parse_page) over a deterministic corpus:
  CPU-bound per-page work, the dominant per-page cost of a crawl round.
  Its process-scaling bounds what any parallel runtime could achieve for
  the fetch-parse phase on this machine.

Output: one JSON line with aggregate throughput per process count and
the scaling efficiency of each step vs the 1-process baseline.

Run: ``python tools/membw_probe.py`` (takes ~1-2 min; run on an idle box).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

STREAM_MB = 256
DURATION_S = 3.0
COUNTS = (1, 2, 4, 8, 16, 32)


def _stream_worker(dur: float, out):
    n = STREAM_MB * 1024 * 1024 // 8
    x = np.ones(n)
    y = np.zeros(n)
    # warm the pages in
    y += x
    t0 = time.perf_counter()
    iters = 0
    while time.perf_counter() - t0 < dur:
        y += 1.000001 * x  # triad: reads x,y writes y → 3 arrays touched
        iters += 1
    elapsed = time.perf_counter() - t0
    out.put(iters * 3 * n * 8 / elapsed)  # bytes/sec touched


def _parse_worker(dur: float, out):
    from spider_spark.functions.parse import parse_page

    # ~1.2 KB synthetic page, same shape as the bench corpus
    pages = [
        (
            "<html><head><title>Doc %d</title></head><body>"
            '<a>skip</a><a href="https://h0.example/d/%d?q=1">q</a>'
            '<a href="https://h1.example/d/%d">c1</a><p>'
            % (i, i, i)
            + ("lorem ipsum dolor sit amet %d consectetur " % i) * 24
            + "</p></body></html>"
        ).encode()
        for i in range(64)
    ]
    t0 = time.perf_counter()
    done = 0
    while time.perf_counter() - t0 < dur:
        for p in pages:
            parse_page(p)
        done += len(pages)
    elapsed = time.perf_counter() - t0
    out.put(done / elapsed)  # pages/sec


def run_step(worker, n_procs: int, trials: int = 3) -> float:
    """Best-of-``trials`` (first trial is a discarded warmup): this box is
    virtualized and individual samples swing ±30%, so single-shot numbers
    mislead — the max is the machine's demonstrated capability."""
    best = 0.0
    for t in range(trials + 1):
        q = mp.Queue()
        procs = [
            mp.Process(target=worker, args=(DURATION_S, q)) for _ in range(n_procs)
        ]
        for p in procs:
            p.start()
        total = sum(q.get() for _ in procs)
        for p in procs:
            p.join()
        if t > 0:  # skip warmup
            best = max(best, total)
    return best


def main() -> None:
    os.environ.setdefault("OMP_NUM_THREADS", "1")  # no BLAS threading
    result: dict = {"box_cpus": os.cpu_count(), "stream_mb_per_proc": STREAM_MB}
    for name, worker, unit in (
        ("stream", _stream_worker, "GB/s"),
        ("parse", _parse_worker, "pages/s"),
    ):
        scale = 1e9 if name == "stream" else 1.0
        vals = {}
        for n in COUNTS:
            if n > os.cpu_count():
                break
            vals[n] = round(run_step(worker, n) / scale, 1)
        base = vals[1]
        result[name] = {
            "unit": unit,
            "throughput": vals,
            "efficiency_vs_1": {
                n: round(v / (base * n), 3) for n, v in vals.items()
            },
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
