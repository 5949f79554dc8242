"""Incremental dedup vs full re-dedup: cost evidence for BENCH/LSH.md.

Scenario: a corpus already deduped once (signature table materialized),
then a delta arrives (the injected near/exact duplicates). Compare

  full   — near_dup_pairs over corpus+delta (re-shingles everything)
  incr   — near_dup_pairs_incremental over (delta, stored signatures)

and assert the incremental pair set equals the full run's pairs
restricted to those touching the delta. Prints one JSON line; appends
a section to BENCH/LSH.md when SG_WRITE_MD=1.

Usage: python tools/bench_incremental.py [sf_dir] [n_copies]
n_copies > 1 replicates the documents table (ids offset) to scale the
corpus without new data files.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    from pyspark.sql import functions as F

    from canned_yaml_spark import dedup
    from canned_yaml_spark.session import get_spark

    spark = get_spark("bench_incremental", cores=32)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
                     .select("doc_id", "text")
    if n_copies > 1:
        parts = [docs.select((F.col("doc_id") + F.lit(i * 10_000_000))
                             .alias("doc_id"), "text")
                 for i in range(n_copies)]
        base = parts[0]
        for p in parts[1:]:
            base = base.unionByName(p)
        docs = base
    docs = docs.cache()
    n_docs = docs.count()

    # the delta is injected from the FIRST copy only, so growing
    # n_copies shrinks delta/corpus — the regime incremental dedup
    # exists for (a nightly delta against a year of corpus)
    first = docs.filter(F.col("doc_id") < 10_000_000)
    d2 = dedup.with_dup_injection(first)
    delta = d2.join(docs.select("doc_id"), "doc_id", "left_anti").cache()
    n_delta = delta.count()
    all_docs = docs.unionByName(delta).cache()
    all_docs.count()

    # one-time cost (amortized across every later delta): sig table
    sig_path = os.path.join(REPO, ".bench", f"sig_store_{n_docs}")
    t0 = time.time()
    sig = dedup.materialize_signatures(docs, sig_path)
    t_sig = time.time() - t0

    t0 = time.time()
    incr = dedup.near_dup_pairs_incremental(delta, docs, sig).collect()
    t_incr = time.time() - t0

    t0 = time.time()
    full = dedup.near_dup_pairs(all_docs).collect()
    t_full = time.time() - t0

    delta_ids = {r.doc_id for r in delta.select("doc_id").collect()}
    want = {(r.doc_a, r.doc_b, r.jaccard) for r in full
            if r.doc_a in delta_ids or r.doc_b in delta_ids}
    got = {(r.doc_a, r.doc_b, r.jaccard) for r in incr}
    result = {
        "n_docs": n_docs, "n_delta": n_delta,
        "t_sig_materialize": round(t_sig, 2),
        "t_incremental": round(t_incr, 2),
        "t_full_rerun": round(t_full, 2),
        "speedup_vs_full": round(t_full / t_incr, 2) if t_incr else None,
        "pairs_incremental": len(got),
        "pairs_full_touching_delta": len(want),
        "exact_match": got == want,
    }
    print(json.dumps(result))
    if os.environ.get("SG_WRITE_MD") == "1":
        with open(os.path.join(REPO, "BENCH", "LSH.md"), "a") as fh:
            fh.write(f"""

## Incremental dedup of a corpus delta (round 4)

Stored-signature path (`near_dup_pairs_incremental`): the delta
({n_delta:,} docs) is shingled+minhashed; the {n_docs:,}-doc corpus is
touched ONLY through its materialized signature table, band-projected
and semi-joined against the broadcast set of delta bucket keys —
no corpus re-shingle, no corpus-wide band shuffle.

| path | seconds |
|---|---|
| full re-dedup (corpus+delta) | {result['t_full_rerun']} |
| incremental (delta vs sig store) | {result['t_incremental']} |
| one-time sig materialize (amortized) | {result['t_sig_materialize']} |

Speedup {result['speedup_vs_full']}× at this scale; output equality
with the restricted full run verified in-process (exact_match =
{result['exact_match']}) and in pytest
(test_near_dup_incremental_matches_full). At 10^12 docs the gap is
structural: full re-dedup re-pays the shingle pass + full band shuffle
per delta, incremental pays O(delta) + one sig-table scan.
""")
    spark.stop()


if __name__ == "__main__":
    main()
