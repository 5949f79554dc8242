"""ANN recall/cost sweep (VERDICT r2 item 4): measured recall@10 of
multi-table multi-probe sign-bit LSH vs the exact baseline on a
100k-vector clustered corpus, across bits × tables × probes.

Recall is the fraction of the exact top-10 (by cosine) recovered per
query, averaged over 100 queries drawn from the corpus. Cost is the
mean candidate fraction — how much of the corpus a query touches —
which is the number the bucket index exists to shrink: brute force is
1.0 by definition.

Usage: python tools/bench_ann.py [n_vectors]      # default 100_000
Writes BENCH/ANN.md and prints one JSON line per setting.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from canned_yaml_spark import similarity  # noqa: E402
from canned_yaml_spark.session import get_spark  # noqa: E402

K = 10
N_QUERIES = 100


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("bench_ann", cores=32, shuffle_partitions=32,
                      extra_conf={"spark.local.dir": "/dev/shm/spark-tmp"})
    emb = similarity.synth_clustered_embeddings(spark, n).cache()
    emb.count()
    q = (emb.filter(F.col("vec_id") % (n // N_QUERIES) == 0)
            .select(F.col("vec_id").alias("q_id"),
                    F.col("embedding").alias("q_vec"))).cache()
    q.count()

    t0 = time.time()
    exact = similarity.cosine_topk(emb, q, K).cache()
    exact.count()
    t_exact = time.time() - t0

    rows = []
    for bits in (8, 12, 16):
        for tables in (1, 2, 4):
            for probes in (0, bits):
                t0 = time.time()
                approx = similarity.ann_topk_lsh(
                    emb, q, K, bits=bits, tables=tables, probes=probes)
                rec = (similarity.recall_at_k(exact, approx, K)
                       .agg(F.avg("recall")).collect()[0][0])
                secs = time.time() - t0
                # candidate fraction: distinct (q, vec) pairs scored
                n_cand = (similarity.ann_topk_lsh(
                    emb, q, 10**9, bits=bits, tables=tables,
                    probes=probes).count())
                frac = n_cand / (N_QUERIES * n)
                row = {"bits": bits, "tables": tables, "probes": probes,
                       "recall_at_10": round(rec, 4),
                       "cand_frac": round(frac, 5),
                       "secs": round(secs, 2)}
                rows.append(row)
                print(json.dumps(row), flush=True)

    best = min((r for r in rows if r["recall_at_10"] >= 0.9),
               key=lambda r: r["cand_frac"], default=None)
    lines = [f"# BENCH — ANN recall@{K} (multi-table multi-probe LSH)",
             "",
             f"Corpus: {n:,} deterministic clustered vectors "
             "(similarity.synth_clustered_embeddings: 1024 centroids + "
             f"counter-hash noise), {N_QUERIES} queries drawn from the "
             f"corpus, exact baseline = cosine_topk ({t_exact:.1f}s). "
             "cand_frac = fraction of the corpus scored per query "
             "(brute force = 1.0). probes=bits means all flip-1-bit "
             "neighbors of the query bucket, chosen per table by "
             "smallest |margin| (similarity.ann_topk_lsh). Re-run: "
             "`python tools/bench_ann.py`.",
             "",
             "| bits | tables | probes | recall@10 | cand_frac | secs |",
             "|---|---|---|---|---|---|"]
    lines += [f"| {r['bits']} | {r['tables']} | {r['probes']} | "
              f"{r['recall_at_10']} | {r['cand_frac']} | {r['secs']} |"
              for r in rows]
    if best:
        lines += ["",
                  f"**Documented operating point: bits={best['bits']}, "
                  f"tables={best['tables']}, probes={best['probes']} → "
                  f"recall@10 = {best['recall_at_10']} at cand_frac = "
                  f"{best['cand_frac']}** (target ≥ 0.9 met at "
                  f"{n:,} vectors; the lowest-cost setting above the bar)."]
    lines += ["",
              "Multi-probe is what holds recall as buckets shrink: at a "
              "fixed table budget, flipping the low-|margin| bits "
              "recovers the near-boundary neighbors that single-bucket "
              "probing loses — compare each probes=0 row with its "
              "probes=bits twin.",
              "",
              "Scale shape: the corpus-side index is ONE projection "
              "pass + ONE shuffle keyed on (table, bucket); query cost "
              "per lookup is tables·(1+probes) bucket reads. Growing "
              "bits with log2(n) keeps bucket size constant, and the "
              "recall lost to narrower buckets is bought back with "
              "probes (rows above), not with corpus rescans."]
    with open(os.path.join(REPO, "BENCH", "ANN.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
