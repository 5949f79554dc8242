"""Round-6 per-operator timing sweep: run every __spark_entry__
query at a given sf dir with the noop sink, record seconds. This is
the examination evidence for OPTIMIZATION_r06.md's operator checklist
(bench.py stays the only driver-timed surface).

Usage: python tools/op_sweep.py [sf_dir] [runs] [only_substr...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from canned_yaml_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    only = tuple(sys.argv[3:])
    spark = get_spark("op_sweep", cores=32, shuffle_partitions=32)
    out = {}
    for name, fn in entrymod.queries().items():
        if only and not any(s in name for s in only):
            continue
        spark.sparkContext.setJobDescription(name)
        ts = []
        try:
            for _ in range(runs):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop") \
                                 .mode("overwrite").save()
                ts.append(round(time.time() - t0, 3))
            out[name] = {"min": min(ts), "samples": ts}
            print(f"{name:28s} min={min(ts):8.3f}  {ts}", flush=True)
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e)[:200]}
            print(f"{name:28s} ERROR {str(e)[:160]}", flush=True)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
