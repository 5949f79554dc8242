"""Measured shuffle-width comparison: inline-signature banding vs the
storage-backed signature table (VERDICT r2 item 5).

Runs both near-dup paths on the same injected sf0.1 documents corpus,
asserts identical verified pair sets, and reads per-stage shuffle
write bytes from the Spark UI REST API — the actual bytes the band
shuffle carries, not an estimate. Appends the table to BENCH/LSH.md.

Usage: python tools/exp_sigtable.py [sf_dir]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from canned_yaml_spark import dedup  # noqa: E402
from canned_yaml_spark.session import get_spark  # noqa: E402


def shuffle_bytes(ui: str) -> int:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages"))
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("exp_sigtable", cores=32, shuffle_partitions=32,
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.local.dir": "/dev/shm/spark-tmp"})
    ui = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}"
    docs = dedup.with_dup_injection(
        spark.read.parquet(f"{sf_dir}/documents.parquet")).cache()
    docs.count()

    b0 = shuffle_bytes(ui)
    t0 = time.time()
    inline = {(r.doc_a, r.doc_b) for r in dedup.near_dup_pairs(docs).collect()}
    t_inline = time.time() - t0
    b_inline = shuffle_bytes(ui) - b0

    sig_path = "/dev/shm/spark-tmp/exp_sigs"
    shutil.rmtree(sig_path, ignore_errors=True)
    b1 = shuffle_bytes(ui)
    t0 = time.time()
    sig = dedup.materialize_signatures(docs, sig_path)
    stored = {(r.doc_a, r.doc_b)
              for r in dedup.near_dup_pairs_storage(docs, sig).collect()}
    t_stored = time.time() - t0
    b_stored = shuffle_bytes(ui) - b1

    assert stored == inline, (len(stored), len(inline))
    result = {"pairs": len(inline),
              "inline_shuffle_mb": round(b_inline / 1e6, 1),
              "storage_shuffle_mb": round(b_stored / 1e6, 1),
              "inline_secs": round(t_inline, 1),
              "storage_secs": round(t_stored, 1)}
    print(json.dumps(result))

    md = f"""

## Storage-backed signature table (round 3, measured)

Same corpus (sf0.1 documents + injected dups), identical verified
output ({result['pairs']} pairs, asserted set-equal). Total shuffle
write bytes across every stage of each path, from the Spark UI REST
API:

| path | shuffle write | wall (32 cores) |
|---|---|---|
| inline signatures through the band join (near_dup_pairs) | {result['inline_shuffle_mb']} MB | {result['inline_secs']} s |
| materialized sig table, band on ids (near_dup_pairs_storage) | {result['storage_shuffle_mb']} MB | {result['storage_secs']} s |

The storage path's band-stage rows carry (doc_id, band, bucket) ≈ 24 B
instead of the ~1 KB slot-tagged signature; the signatures are read
back from the stored table only for the prefilter join, which a
doc_id-bucketed signature table makes exchange-free in production. At
10^12 docs the inline path's band shuffle is ~40× wider — this is the
plan named in dedup.py (near_dup_pairs step 1) and ROADMAP item 3,
now implemented and measured. Wall time at sandbox scale is dominated
by fixed stage costs; the shuffle-width ratio is the number that
matters at corpus scale. Re-run: `python tools/exp_sigtable.py`.
"""
    with open(os.path.join(REPO, "BENCH", "LSH.md"), "a") as fh:
        fh.write(md)
    spark.stop()


if __name__ == "__main__":
    main()
