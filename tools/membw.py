"""Host memory-bandwidth ceiling microbenchmark (BENCH/MEMBW.md).

Pure numpy memcpy (no Spark, no JVM): P processes, each pinned to its
own CPU, streaming-copying a 256 MB buffer. Aggregate GB/s vs P shows
how much byte-moving parallelism the SANDBOX HOST can express — the
context needed to interpret BENCH/BASELINE.md: a stage that moves
payload bytes cannot scale past the host's plateau no matter what the
query plan does, whereas N → 4N EXECUTORS on a real cluster multiplies
aggregate bandwidth by 4 (each machine brings its own memory bus).

Usage: python tools/membw.py
"""
from __future__ import annotations

import multiprocessing as mp
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SZ = 256 << 20
N_ITER = 8


def _worker(cpu: int, q) -> None:
    os.sched_setaffinity(0, {cpu})
    a = np.ones(SZ // 8, dtype=np.float64)
    b = np.empty_like(a)
    np.copyto(b, a)                    # fault pages before timing
    t0 = time.time()
    for _ in range(N_ITER):
        np.copyto(b, a)
    q.put((time.time() - t0, N_ITER * SZ * 2))


def bench(n_procs: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=_worker, args=(i, q)) for i in range(n_procs)]
    t0 = time.time()
    for p in ps:
        p.start()
    res = [q.get() for _ in ps]
    for p in ps:
        p.join()
    wall = time.time() - t0
    return sum(r[1] for r in res) / wall / 1e9


def main() -> None:
    # APPEND-ONLY: the file's headline table is the canonical HEALTHY
    # window; a fresh probe only appends a row to the window-health
    # log (the 2026-08-18 12:30 run clobbered the whole file — that
    # mistake is why this writer no longer rewrites anything)
    rows = [(n, round(bench(n), 1)) for n in (1, 2, 4, 8, 16, 32)]
    path = os.path.join(REPO, "BENCH", "MEMBW.md")
    stamp = time.strftime("%Y-%m-%d %H:%M")
    cells = " | ".join(str(dict(rows)[n]) for n in (1, 2, 4, 8, 16, 32))
    line = f"| {stamp} | {cells} | (unjudged — compare 1p/8p vs healthy) |"
    with open(path, "a") as fh:
        fh.write(line + "\n")
    for n, g in rows:
        print(f"{n:2d} procs: {g:6.1f} GB/s")
    print(f"appended window-health row to {path}; edit the verdict cell")


if __name__ == "__main__":
    main()
