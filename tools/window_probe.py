"""Fast host-window probe: the fault-path figure that predicts job speed.

The 2026-08-19 calibration (BENCH/MEMBW.md) showed the canonical
tools/membw.py 1p cell is dominated by PINNED fresh-page fault/alloc
time, not copy speed — and that fault-path health is what Spark jobs
track (tasks continually allocate Arrow buffers / shuffle blocks /
numpy temporaries). This probe measures exactly that signal in ~5 s:

- pinned_fault_gbps:   np.ones fill rate on fresh pages, process pinned
                       to CPU 0 (the bench_scaling children pin their
                       whole tree, so this is their allocation regime);
- unpinned_fault_gbps: same, unpinned;
- copy_gbps:           steady-state memcpy (sanity: always fast).

Decision rule for firing a pinned scaling run (bench_scaling.py):
pinned_fault_gbps ≥ 1.5 — the healthy 2026-08-18 04:59 canonical row
(1p 3.1 GB/s wall-protocol over a 4 GB numerator) implies total setup
≲ 0.2 s for 0.75 GB of faults, i.e. pinned faulting ≥ ~4 GB/s in that
window; 1.5 leaves margin for probe noise. Below that, a pinned run
measures the host's fault path, not the engine.

Usage: python tools/window_probe.py   # one JSON line, no file writes
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

SZ = 256 << 20


def _fault_worker(pin: bool, q) -> None:
    import numpy as np
    if pin:
        os.sched_setaffinity(0, {0})
    t0 = time.time()
    a = np.ones(SZ // 8, dtype=np.float64)      # fresh pages: alloc+fill
    fault = SZ / (time.time() - t0) / 1e9
    b = np.empty_like(a)
    np.copyto(b, a)                             # fault b before timing
    t0 = time.time()
    for _ in range(4):
        np.copyto(b, a)
    copy = 4 * SZ * 2 / (time.time() - t0) / 1e9
    q.put((round(fault, 2), round(copy, 2)))


def probe(samples: int = 3) -> dict:
    # max over N samples per config: the fault path is violently
    # bursty (measured 0.1 → 4.2 GB/s within seconds, 2026-08-19
    # calibration) — a single shot reads one burst, max-of-N reads
    # the window's uncontended capability, the same min/max-of-N
    # discipline every bench in this repo applies.
    out = {}
    for pin in (True, False):
        faults, copies = [], []
        for _ in range(samples):
            q = mp.Queue()
            p = mp.Process(target=_fault_worker, args=(pin, q))
            p.start()
            fault, copy = q.get()
            p.join()
            faults.append(fault)
            copies.append(copy)
        key = "pinned" if pin else "unpinned"
        out[f"{key}_fault_gbps"] = max(faults)
        out[f"{key}_fault_all"] = faults
        out["copy_gbps"] = max(copies)          # last wins; both ~equal
    out["scaling_run_ok"] = out["pinned_fault_gbps"] >= 1.5
    return out


if __name__ == "__main__":
    print(json.dumps(probe()))
