"""Scaling evidence for the r5 audio family (fingerprint near-dup).

Same discipline as bench_scaling.py (the north_rule harness): the
IDENTICAL job at local[8] and local[32] on the same materialized
corpus, process tree pinned to exactly that many CPUs, fresh JVM per
run, levels alternated, min of N runs per level (this host's noise is
5-10× on identical stages — memory: sandbox-host-noise).

Job under test: parquet scan → audiofp.near_dup_audio (one Arrow
fingerprint pass with batched FFT → (frame_idx, subfp) band shuffle →
JVM bit-error-rate verify) → count. This is the audio analogue of the
text LSH dedup job, and the shape that must scale at 100 TB.

Usage: python tools/bench_audiofp.py [n_clips] [runs]
        (defaults 40_000 clips, 3 runs/level)
Appends a section to BENCH/AUDIOFP.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BUILD = r"""
import os, sys
sys.path.insert(0, {repo!r})
from canned_yaml_spark.session import get_spark
from canned_yaml_spark import audiofp
spark = get_spark("audiofp_build", cores=32, shuffle_partitions=64)
corpus = audiofp.chirp_corpus_df(spark, {n_clips}, dup_every=5)
(corpus.repartition(64)
       .write.mode("overwrite").parquet({path!r}))
print("built", spark.read.parquet({path!r}).count())
spark.stop()
"""

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
cores = int(os.environ["SG_CORES"])
os.sched_setaffinity(0, set(range(cores)))
from canned_yaml_spark.session import get_spark
from canned_yaml_spark import audiofp
spark = get_spark(f"audiofp_{{cores}}", cores=cores, shuffle_partitions=64,
                  extra_conf={{"spark.local.dir": "/dev/shm/spark-tmp"}})
corpus = spark.read.parquet({path!r})
mode = os.environ.get("SG_MODE", "neardup")
if mode == "fp_dense":
    # compute-bound control (the audio analogue of the s64 row-suite
    # control in bench_scaling.py): fingerprint-only at hop=16 — 8x
    # the FFT work per byte moved, so the N->4N criterion measures
    # compute scaling with the host's memory-bus ceiling amortized
    def job():
        return audiofp.fingerprint(corpus, hop=16).count()
else:
    def job():
        return audiofp.near_dup_audio(corpus).count()
n_pairs = job()                                 # warm-up
ts = []
for _ in range({runs}):
    t0 = time.time(); job(); ts.append(time.time() - t0)
print(json.dumps({{"cores": cores, "secs": round(min(ts), 3),
                   "runs": [round(t, 3) for t in ts],
                   "n_pairs": n_pairs}}))
spark.stop()
"""


def run_child(script: str, env: dict) -> dict:
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True,
                         env={**os.environ, **env}, cwd=REPO)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"child failed (cores={env.get('SG_CORES')})")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    path = f"/dev/shm/audiofp_corpus_{n_clips}"
    os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        subprocess.run([sys.executable, "-c",
                        BUILD.format(repo=REPO, n_clips=n_clips,
                                     path=path)],
                       check=True, cwd=REPO)

    mode = os.environ.get("SG_MODE", "neardup")
    # alternate levels so slow host windows hit both equally
    results: dict[int, list[dict]] = {8: [], 32: []}
    for _ in range(runs):
        for cores in (8, 32):
            r = run_child(CHILD.format(repo=REPO, path=path, runs=1),
                          {"SG_CORES": str(cores), "SG_MODE": mode})
            results[cores].append(r)
            print(r)
    best = {c: min(x["secs"] for x in results[c]) for c in (8, 32)}
    thr = {c: n_clips / best[c] for c in (8, 32)}
    eff = (thr[32] / thr[8]) / 4.0
    line = {"op": ("fingerprint hop=16 (compute-bound control)"
                   if mode == "fp_dense" else "near_dup_audio"),
            "n_clips": n_clips,
            "t8": best[8], "t32": best[32],
            "clips_per_sec_8": round(thr[8]),
            "clips_per_sec_32": round(thr[32]),
            "scaling_efficiency": round(eff, 3),
            "n_pairs": results[32][0]["n_pairs"],
            "runs_per_level": runs}
    print(json.dumps(line))
    stamp = time.strftime("%Y-%m-%d %H:%M")
    with open(os.path.join(REPO, "BENCH", "AUDIOFP.md"), "a") as f:
        f.write(f"\n## {line['op']} scaling — {stamp}\n\n"
                f"{n_clips} clips (+20% injected dups), corpus + "
                f"shuffle on /dev/shm, process tree pinned, fresh JVM "
                f"per run, levels alternated, min of {runs}.\n\n"
                f"| cores | secs (min) | clips/s | all runs |\n"
                f"|---|---|---|---|\n")
        for c in (8, 32):
            allr = [x["secs"] for x in results[c]]
            f.write(f"| {c} | {best[c]} | {round(thr[c])} | {allr} |\n")
        f.write(f"\nscaling efficiency (T8/T32)/4 = **{eff:.3f}**; "
                f"{line['n_pairs']} verified pairs.\n")


if __name__ == "__main__":
    main()
