"""Scaling evidence for the media decode family (SIX real containers).

Same discipline as bench_scaling.py / bench_audiofp.py: the IDENTICAL
job at local[8] and local[32] on the same materialized corpus, process
tree pinned to exactly that many CPUs, fresh JVM per run, levels
alternated, min of N runs per level (memory: sandbox-host-noise).

Job under test: parquet scan → multimodal.extract_media_meta (ONE
Arrow pass decoding every container — WAV chunk walk, BMP stride/row
order, PNG inflate+unfilter, Y4M frame walk, JPEG Huffman+IDCT, GIF
LZW+composition) → count. No shuffle: this measures pure decode
compute scaling, the cost that dominates a media-validation pass at
100 TB. The sequential entropy walks (JPEG Huffman, GIF LZW, rice in
the audio family) are per-row Python inside Arrow batches, so this is
exactly the family where N→4N compute scaling must be demonstrated,
not assumed.

Usage: python tools/bench_media.py [n_rows] [runs]
        (defaults 800_000 rows, 3 runs/level)
Appends a section to BENCH/MEDIA.md and prints one JSON line.
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
from canned_yaml_spark import multimodal
import pandas as pd
spark = get_spark("media_build", cores=32, shuffle_partitions=64)

mix = os.environ.get("SG_MIX", "mix")

def gen(batches):
    for pdf in batches:
        if mix == "jpeg":
            # compute-dense control: all healthy JPEGs — maximal
            # Python work (Huffman walk + IDCT) per byte moved, the
            # media analogue of the s64 row-suite control
            rows = [(f"media_{{int(k):010d}}", int(k) % 64,
                     bytearray(multimodal.encode_jpeg(int(k))))
                    for k in pdf["id"]]
        else:
            rows = [multimodal.media_row(int(k)) for k in pdf["id"]]
        yield pd.DataFrame(rows, columns=["media_id", "part_id",
                                          "media"]) \
            .astype({{"part_id": "int32"}})

(spark.range(0, {n_rows}, 1, 64).mapInPandas(
    gen, "media_id string, part_id int, media binary")
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
from canned_yaml_spark import multimodal
spark = get_spark(f"media_{{cores}}", cores=cores, shuffle_partitions=64,
                  extra_conf={{"spark.local.dir": "/dev/shm/spark-tmp"}})
corpus = spark.read.parquet({path!r})

def job():
    return multimodal.extract_media_meta(corpus).count()

n = job()                                       # warm-up
ts = []
for _ in range({runs}):
    t0 = time.time(); job(); ts.append(time.time() - t0)
print(json.dumps({{"cores": cores, "secs": round(min(ts), 3),
                   "runs": [round(t, 3) for t in ts], "n_rows": n}}))
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
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    mix = os.environ.get("SG_MIX", "mix")
    path = f"/dev/shm/media_corpus_{mix}_{n_rows}"
    os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        subprocess.run([sys.executable, "-c",
                        BUILD.format(repo=REPO, n_rows=n_rows,
                                     path=path)],
                       check=True, cwd=REPO)

    results: dict[int, list[dict]] = {8: [], 32: []}
    for _ in range(runs):
        for cores in (8, 32):
            r = run_child(CHILD.format(repo=REPO, path=path, runs=1),
                          {"SG_CORES": str(cores)})
            results[cores].append(r)
            print(r)
    best = {c: min(x["secs"] for x in results[c]) for c in (8, 32)}
    thr = {c: n_rows / best[c] for c in (8, 32)}
    eff = (thr[32] / thr[8]) / 4.0
    line = {"op": f"extract_media_meta ({mix} corpus)",
            "n_rows": n_rows,
            "t8": best[8], "t32": best[32],
            "rows_per_sec_8": round(thr[8]),
            "rows_per_sec_32": round(thr[32]),
            "scaling_efficiency": round(eff, 3),
            "runs_per_level": runs}
    print(json.dumps(line))
    stamp = time.strftime("%Y-%m-%d %H:%M")
    with open(os.path.join(REPO, "BENCH", "MEDIA.md"), "a") as f:
        if f.tell() == 0:
            f.write("# Media decode scaling (extract_media_meta)\n")
        desc = ("ALL-JPEG compute-dense control (healthy, Huffman+IDCT "
                "per row)" if mix == "jpeg" else
                "media_row slot mix (WAV/BMP/Y4M/PNG/JPEG/GIF/MP4/stub, "
                "every 10th truncated)")
        f.write(f"\n## {n_rows} rows ({mix}) — {stamp}\n\n"
                f"{desc}, corpus + shuffle on /dev/shm, "
                f"process tree pinned, fresh JVM per run, levels "
                f"alternated, min of {runs}.\n\n"
                f"| cores | secs (min) | rows/s | all runs |\n"
                f"|---|---|---|---|\n")
        for c in (8, 32):
            allr = [x["secs"] for x in results[c]]
            f.write(f"| {c} | {best[c]} | {round(thr[c])} | {allr} |\n")
        f.write(f"\nscaling efficiency (T8/T32)/4 = **{eff:.3f}**.\n")


if __name__ == "__main__":
    main()
