"""Attribute the BENCH_r01→r02 headline regression (VERDICT r2 item 2).

Replays the driver's exact bench path (`python bench.py`, sf0.1,
32 CPUs) against the round-1 code (git worktree at the r1 tag) and the
current code, ALTERNATING invocations, and keeps the per-query MIN
across invocations per version — the protocol this host's 5-10× noise
swings require (memory: sandbox-host-noise; each invocation is itself
a median-of-3 inside bench.py).

Usage: python tools/bench_regression.py [r1_worktree] [n_rounds]
Writes BENCH/REGRESSION.md and prints one JSON line.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cwd: str) -> dict:
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_SF_DIR", None)
    env.pop("SPARK_GRAFT_CPUS", None)
    out = subprocess.run([sys.executable, "bench.py"], cwd=cwd, env=env,
                         capture_output=True, text=True, timeout=1800)
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"bench in {cwd} failed:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    r1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r1tree"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    best: dict[str, dict[str, float]] = {"r1": {}, "now": {}}
    for i in range(rounds):
        for tag, cwd in (("now", REPO), ("r1", r1)):
            res = run_bench(cwd)
            for q, s in res["queries"].items():
                cur = best[tag].get(q)
                best[tag][q] = s if cur is None else min(cur, s)
            print(json.dumps({"round": i, "version": tag,
                              "total": res["value"],
                              "queries": res["queries"]}), flush=True)

    qs = sorted(set(best["r1"]) | set(best["now"]))
    rows = []
    for q in qs:
        a, b = best["r1"].get(q), best["now"].get(q)
        d = (None if a is None or b is None
             else round((b - a) / a * 100))
        rows.append((q, a, b, d))
    t1 = round(sum(v for v in best["r1"].values()), 2)
    t2 = round(sum(v for v in best["now"].values()), 2)
    print(json.dumps({"r1_total_min": t1, "now_total_min": t2,
                      "per_query_min": rows}))

    md = ["# BENCH — r1 vs current, driver bench path (min across "
          f"{rounds} alternated invocations, each median-of-3 inside "
          "bench.py; sf0.1, 600k payload rows, 32 CPUs)",
          "",
          "| query | r1 best | now best | Δ% |",
          "|---|---|---|---|"]
    for q, a, b, d in rows:
        md.append(f"| {q} | {a} | {b} | "
                  f"{'+' if d is not None and d > 0 else ''}{d} |")
    md += ["", f"**Totals (sum of per-query bests): r1 {t1} s → "
               f"now {t2} s.**"]
    with open(os.path.join(REPO, "BENCH", "REGRESSION.md"), "w") as fh:
        fh.write("\n".join(md) + "\n")


if __name__ == "__main__":
    main()
