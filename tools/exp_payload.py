"""One-off experiment: payload-family variants at both levels.

Variants:
  hint     — current SHUFFLE_HASH hint (per-task hashmap of ref side)
  nohint   — let Spark pick (bucketed+sorted tables → SMJ w/o sort?)
  arrow32k — hint + Arrow batch 32768

Usage: python tools/exp_payload.py [rows]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUCKETS = 32

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from canned_yaml_spark.session import get_spark
from canned_yaml_spark import compile_spec, payload
from pyspark.sql import functions as F

cores = int(os.environ["SG_CORES"])
wh = os.environ["SG_WAREHOUSE"]
arrow = os.environ.get("SG_ARROW", "8192")
spark = get_spark(f"exp_{{cores}}", cores=cores, shuffle_partitions=cores,
                  extra_conf={{"spark.local.dir": "/dev/shm/spark-tmp",
                               "spark.sql.warehouse.dir": wh,
                               "spark.sql.execution.arrow.maxRecordsPerBatch": arrow}})
for name in ("clips_b", "clips_ref_b"):
    ddl_cols = open(os.path.join(wh, f"{{name}}.schema")).read()
    spark.sql(f'''CREATE TABLE {{name}} ({{ddl_cols}}) USING PARQUET
      CLUSTERED BY (clip_id) SORTED BY (clip_id) INTO {buckets} BUCKETS
      LOCATION '{{wh}}/{{name}}' ''')
clips = spark.table("clips_b")
ref = spark.table("clips_ref_b")
suite = compile_spec(os.path.join({repo!r}, "specs/clips.spec.yaml"), clips.schema)
pc = suite.payload_checks[0]

import canned_yaml_spark.payload as pl
variant = os.environ["SG_VARIANT"]
if variant == "nohint":
    # monkeypatch: identical pipeline minus the SHUFFLE_HASH hint
    orig_hint = None
    from pyspark.sql import DataFrame
    real_hint = DataFrame.hint
    DataFrame.hint = lambda self, *a, **k: self
v = pl.payload_violations(clips, ref, pc)
plan = v._jdf.queryExecution().executedPlan().toString()
join_kind = ("SortMergeJoin" if "SortMergeJoin" in plan else
             "ShuffledHashJoin" if "ShuffledHashJoin" in plan else "?")
has_sort = plan.count("Sort ")
v.count()   # warm
ts = []
for _ in range(4):
    t0 = time.time(); v.count(); ts.append(round(time.time() - t0, 2))
print(json.dumps({{"cores": cores, "variant": variant, "join": join_kind,
                   "n_sort": has_sort, "best": min(ts), "runs": ts}}))
spark.stop()
"""


def run(cores, variant, wh, arrow="8192"):
    env = dict(os.environ, SG_CORES=str(cores), SG_WAREHOUSE=wh,
               SG_VARIANT=variant, SG_ARROW=arrow)
    out = subprocess.run([sys.executable, "-c",
                          CHILD.format(repo=REPO, buckets=BUCKETS)],
                         env=env, capture_output=True, text=True, timeout=1200)
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    print(lines[-1] if lines else out.stderr[-2000:])


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 9_600_000
    wh = os.path.join(REPO, ".bench", f"warehouse_{rows}")
    for variant, arrow in [("hint", "8192"), ("nohint", "8192"),
                           ("hint", "32768")]:
        for cores in (32, 8):
            run(cores, variant, wh, arrow)


if __name__ == "__main__":
    main()
