"""Round-6 optimization harness: per-family isolation of the bench
queries (guide §1.4 noop-sink discipline) + explain capture.

NOT part of the frozen driver contract (bench.py is untouched); this
exists to attribute q0_full_suite's wall time to its check families
and to record before/after plans under plans/r06/.

Usage:
  python tools/bench_r06.py families   # q0 family-by-family timings
  python tools/bench_r06.py queries    # q1..q10 noop-isolated timings
  python tools/bench_r06.py plans TAG  # write plans/r06/<q>_<TAG>.txt
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: F401,E402

from canned_yaml_spark import (  # noqa: E402
    compile_spec, dataset, derive, drift, fixtures, payload,
)
from canned_yaml_spark import job as jobmod  # noqa: E402
from canned_yaml_spark.runner import row_verdicts, row_violations  # noqa: E402
from canned_yaml_spark.session import get_spark  # noqa: E402

BENCH_ROWS = int(os.environ.get("BENCH_ROWS", "600000"))
BENCH_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".bench", f"clips_{BENCH_ROWS}")
RUNS = int(os.environ.get("BENCH_RUNS", "3"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def setup():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench_r06", cores=cpus, shuffle_partitions=cpus)
    clips_b = spark.read.parquet(f"{BENCH_DIR}/clips.parquet")
    ref_b = spark.read.parquet(f"{BENCH_DIR}/clips_ref.parquet")
    suite_b = compile_spec("specs/clips.spec.yaml", clips_b.schema)
    dim = derive.codec_dim_df(spark)
    hist = fixtures.reference_hist_df(spark)
    ks_ref = fixtures.reference_dur_sample()
    clips_d = derive.clips_df(spark, sf_dir)
    suite_d = compile_spec("specs/clips.spec.yaml", clips_d.schema)
    # same warm-up as bench.py
    clips_b.select("clip_id", "sr_hz", "dur_ms", "codec", "transcript",
                   "part_id").count()
    ref_b.select("clip_id").count()
    clips_d.count()
    return spark, clips_b, ref_b, suite_b, dim, hist, ks_ref, clips_d, suite_d


def bench_all(items):
    spark = items[0]
    out = {}
    for name, thunk in items[1]:
        spark.sparkContext.setJobDescription(name)
        ts = []
        for _ in range(RUNS):
            t0 = time.time()
            thunk()
            ts.append(round(time.time() - t0, 3))
        out[name] = {"min": min(ts), "samples": ts}
        print(f"{name:28s} min={min(ts):7.3f}  {ts}", flush=True)
    spark.sparkContext.setJobDescription(None)
    return out


def family_items(spark, clips_b, ref_b, suite_b, dim, hist, ks_ref):
    """q0's constituent families, each noop-isolated."""
    uc = suite_b.unique_checks[0]
    rc = suite_b.ref_checks[0]
    dc = suite_b.drift_checks[0]
    pc = suite_b.payload_checks[0]
    ac = suite_b.audio_checks[0] if suite_b.audio_checks else None
    fams = [
        ("f_row", lambda: noop(row_violations(clips_b, suite_b))),
        ("f_unique", lambda: noop(dataset.unique_violations(clips_b, uc))),
        ("f_ref", lambda: noop(dataset.referential_violations(
            clips_b, dim, rc))),
        ("f_psi", lambda: noop(drift.psi_violations(clips_b, dc, hist))),
        ("f_ks", lambda: noop(drift.ks_violations(clips_b, dc, ks_ref))),
        ("f_payload", lambda: noop(payload.payload_violations(
            clips_b, ref_b, pc))),
    ]
    if ac is not None:
        fams.append(("f_audio_stats", lambda: noop(
            payload.audio_stats_violations(clips_b, ac))))
    fams.append(("f_q0_all", lambda: jobmod.all_violations(
        clips_b, suite_b, dims={"codec_dim": dim}, clips_ref=ref_b,
        expected_hist=hist, ks_reference=ks_ref).count()))
    return fams


def query_items(spark, clips_b, ref_b, suite_b, dim, hist, ks_ref,
                clips_d, suite_d):
    return [
        ("q1_row_suite", lambda: noop(row_violations(clips_b, suite_b))),
        ("q2_verdicts", lambda: noop(row_verdicts(clips_b, suite_b))),
        ("q3_uniqueness", lambda: noop(dataset.unique_violations(
            clips_b, suite_b.unique_checks[0]))),
        ("q4_referential", lambda: noop(dataset.referential_violations(
            clips_b, dim, suite_b.ref_checks[0]))),
        ("q5_stats", lambda: noop(dataset.column_stats(
            clips_b, ["sr_hz", "dur_ms"]))),
        ("q6_drift_psi", lambda: noop(drift.psi_per_partition(
            clips_b, suite_b.drift_checks[0], hist))),
        ("q7_drift_ks", lambda: noop(drift.ks_per_partition(
            clips_b, suite_b.drift_checks[0], ks_ref))),
        ("q8_payload_snr", lambda: noop(payload.payload_violations(
            clips_b, ref_b, suite_b.payload_checks[0]))),
        ("q9_derived_suite", lambda: noop(row_violations(clips_d, suite_d))),
        ("q10_salted_agg", lambda: noop(dataset.salted_group_count(
            clips_b, "codec"))),
    ]


def write_plans(tag, spark, clips_b, ref_b, suite_b, dim, hist, ks_ref,
                clips_d, suite_d):
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    dfs = {
        "q0_full_suite": jobmod.all_violations(
            clips_b, suite_b, dims={"codec_dim": dim}, clips_ref=ref_b,
            expected_hist=hist, ks_reference=ks_ref),
        "q1_row_suite": row_violations(clips_b, suite_b),
        "q2_verdicts": row_verdicts(clips_b, suite_b),
        "q3_uniqueness": dataset.unique_violations(
            clips_b, suite_b.unique_checks[0]),
        "q4_referential": dataset.referential_violations(
            clips_b, dim, suite_b.ref_checks[0]),
        "q5_stats": dataset.column_stats(clips_b, ["sr_hz", "dur_ms"]),
        "q6_drift_psi": drift.psi_per_partition(
            clips_b, suite_b.drift_checks[0], hist),
        "q7_drift_ks": drift.ks_per_partition(
            clips_b, suite_b.drift_checks[0], ks_ref),
        "q8_payload_snr": payload.payload_violations(
            clips_b, ref_b, suite_b.payload_checks[0]),
        "q9_derived_suite": row_violations(clips_d, suite_d),
        "q10_salted_agg": dataset.salted_group_count(clips_b, "codec"),
    }
    for name, df in dfs.items():
        p = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(p, "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        print("wrote", p)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "families"
    ctx = setup()
    spark = ctx[0]
    if mode == "families":
        out = bench_all((spark, family_items(*ctx[:7])))
        print(json.dumps(out))
    elif mode == "queries":
        out = bench_all((spark, query_items(*ctx)))
        print(json.dumps(out))
    elif mode == "plans":
        write_plans(sys.argv[2], *ctx)
    spark.stop()


if __name__ == "__main__":
    main()
