"""Skew evidence with numbers (BENCH/SKEW.md).

Two measured cases on the 9.6M-row bucketed corpus (codec is 0.70-hot):

A. Non-algebraic aggregate on the hot key:
   plain  — percentile(dur_ms, 0.5) groupBy codec: every raw value of
            the hot key funnels through ONE reducer task.
   redist — grouped_exact_median: count-by-(codec, dur_ms) first
            (algebraic, map-side combine), median from the histogram.
   Both produce identical medians (asserted).

B. Skewed sort-merge join (broadcast disabled so the join must
   shuffle on the hot key): AQE skewJoin ON vs OFF.

Each case at local[8] and local[32], min of 3 runs.
Usage: python tools/exp_skew.py [rows]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUCKETS = 32

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from canned_yaml_spark.session import get_spark
from canned_yaml_spark import dataset
from pyspark.sql import functions as F

cores = int(os.environ["SG_CORES"])
wh = os.environ["SG_WAREHOUSE"]
skew_join = os.environ["SG_SKEWJOIN"] == "1"
spark = get_spark(f"skew_{{cores}}", cores=cores, shuffle_partitions=cores,
                  extra_conf={{
    "spark.local.dir": "/dev/shm/spark-tmp",
    "spark.sql.warehouse.dir": wh,
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.enabled": str(skew_join).lower(),
    # make the splitter see our 9.6M-row sandbox partitions as skewed
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8MB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4MB",
}})
ddl = open(os.path.join(wh, "clips_b.schema")).read()
spark.sql(f'''CREATE TABLE clips_b ({{ddl}}) USING PARQUET
  CLUSTERED BY (clip_id) SORTED BY (clip_id) INTO {buckets} BUCKETS
  LOCATION '{{wh}}/clips_b' ''')
clips = spark.table("clips_b").select("clip_id", "codec", "dur_ms",
                                      "transcript", "part_id")

def best(fn, n=3):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.time(); fn(); ts.append(round(time.time() - t0, 2))
    return min(ts), ts

res = {{"cores": cores, "skew_join": skew_join}}
if os.environ["SG_CASE"] in ("agg", "both"):
    plain = lambda: clips.groupBy("codec").agg(
        F.percentile("dur_ms", 0.5).alias("median")).count()
    redist = lambda: dataset.grouped_exact_median(
        clips, "codec", "dur_ms").count()
    # identical results before timing
    a = {{r.codec: round(r.median, 4) for r in clips.groupBy("codec").agg(
        F.percentile("dur_ms", 0.5).alias("median")).collect()}}
    b = {{r.codec: round(r.median, 4) for r in dataset.grouped_exact_median(
        clips, "codec", "dur_ms").collect()}}
    assert a == b, (a, b)
    res["agg_plain"], res["agg_plain_runs"] = best(plain)
    res["agg_redist"], res["agg_redist_runs"] = best(redist)
    # gather: collect_list has NO partial reduction — the hot key's
    # ~70% of all transcript bytes land on ONE reducer task. The
    # salted form collects per (key, salt) then merges 16 arrays.
    # .collect() of the downstream sum forces the collect_list to run
    # (a bare .count() lets ColumnPruning drop the unused aggregate)
    gather_plain = lambda: clips.groupBy("codec").agg(
        F.size(F.collect_list("transcript")).alias("n")) \
        .agg(F.sum("n")).collect()
    def gather_salted():
        s1 = (clips.withColumn("_salt", F.pmod(
                  F.xxhash64("clip_id"), F.lit(16)))
                   .groupBy("codec", "_salt")
                   .agg(F.size(F.collect_list("transcript")).alias("n1")))
        s1.agg(F.sum("n1")).collect()
    res["gather_plain"], res["gather_plain_runs"] = best(gather_plain)
    res["gather_salted"], res["gather_salted_runs"] = best(gather_salted)
if os.environ["SG_CASE"] in ("join", "both"):
    # per-codec profile joined back on the hot key; broadcast disabled
    # forces a shuffle join carrying the skew
    prof = clips.groupBy("codec").agg(F.avg("dur_ms").alias("avg_dur"))
    j = lambda: clips.join(prof, "codec").filter(
        F.col("dur_ms") > F.col("avg_dur")).count()
    res["join"], res["join_runs"] = best(j)
print(json.dumps(res))
spark.stop()
"""


def run(cores, case, skew_join, wh):
    env = dict(os.environ, SG_CORES=str(cores), SG_WAREHOUSE=wh,
               SG_CASE=case, SG_SKEWJOIN="1" if skew_join else "0")
    out = subprocess.run([sys.executable, "-c",
                          CHILD.format(repo=REPO, buckets=BUCKETS)],
                         env=env, capture_output=True, text=True,
                         timeout=1200)
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(lines[-1])


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 9_600_000
    wh = os.path.join(REPO, ".bench", f"warehouse_{rows}")
    out = {"rows": rows,
           "measured_at": time.strftime("%Y-%m-%d %H:%M:%S")}
    for cores in (8, 32):
        out[f"agg_c{cores}"] = run(cores, "agg", True, wh)
        out[f"join_skew_on_c{cores}"] = run(cores, "join", True, wh)
        out[f"join_skew_off_c{cores}"] = run(cores, "join", False, wh)
    print(json.dumps(out, indent=1))

    md = f"""# BENCH — skew handling, measured (9,600,000 rows, codec 0.70-hot)

Min of 3 runs per cell after warm-up; bucketed corpus; tmpfs shuffle.
Measured {out['measured_at']}.

## A. Non-algebraic aggregate on the hot key (exact median by codec)

`percentile(dur_ms, 0.5)` ships every raw value of a group to one
reducer — the 0.70-hot codec funnels ~6.7M values through a single
task. `grouped_exact_median` redistributes by (codec, dur_ms) first
(map-side-combining count), then takes the weighted median of the tiny
histogram. Identical results asserted before timing.

| plan | local[8] | local[32] |
|---|---|---|
| plain percentile (funnel) | {out['agg_c8']['agg_plain']} s | {out['agg_c32']['agg_plain']} s |
| redistribute-by-value     | {out['agg_c8']['agg_redist']} s | {out['agg_c32']['agg_redist']} s |

At 9.6M rows the percentile funnel is only ~77 MB of doubles, so both
plans are sub-second — the plan-shape difference is what matters at
10^12 (the redistribute form's reducers receive ≤ |values| rows per
key). The funnel becomes measurable when the grouped payload is wide:

## A2. Gather (collect_list of transcripts — no partial reduction)

The hot key routes ~70% of all transcript bytes to ONE reducer;
salting by a row-local hash splits it 16 ways, then merges counts.

| plan | local[8] | local[32] |
|---|---|---|
| plain collect_list (funnel) | {out['agg_c8']['gather_plain']} s | {out['agg_c32']['gather_plain']} s |
| salted two-stage            | {out['agg_c8']['gather_salted']} s | {out['agg_c32']['gather_salted']} s |

## B. Skewed shuffle join — AQE skew-split OFF vs ON

clips ⋈ per-codec profile on `codec` (broadcast disabled, so the
shuffle join carries the hot key; AQE splits the oversized partition
when enabled).

| AQE skewJoin | local[8] | local[32] |
|---|---|---|
| off | {out['join_skew_off_c8']['join']} s | {out['join_skew_off_c32']['join']} s |
| on  | {out['join_skew_on_c8']['join']} s | {out['join_skew_on_c32']['join']} s |

(The engine's production plan for this join is `F.broadcast(dim)` —
dataset.referential_violations — which never shuffles the fact side;
this table is the evidence for what AQE buys when a broadcast is not
possible.)

Raw runs: BENCH/skew_runs.json.
"""
    with open(os.path.join(REPO, "BENCH", "SKEW.md"), "w") as fh:
        fh.write(md)
    with open(os.path.join(REPO, "BENCH", "skew_runs.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
