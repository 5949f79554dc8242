"""Similarity search over embedding columns.

Two paths (task brief):
- brute-force cosine top-k — the exact baseline: broadcast the (small)
  query set against the corpus; one scan, per-row dot products inside
  whole-stage codegen (F.zip_with/F.aggregate — no UDF), one window
  for the top-k cut.
- LSH-bucketed ANN — the scale path: random-hyperplane sign bits
  (seeded, deterministic) bucket the corpus; queries probe only their
  bucket (+ optional multi-probe neighbors). The corpus-side shuffle
  keys on the bucket id; at 10^12 vectors the bucket index is the only
  thing rebuilt on ingest, queries touch 1/2^bits of the data.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    queries: (q_id, q_vec array<float>) — small, broadcast. Output
    (q_id, vec_id, cosine, rank), ties broken by vec_id for
    determinism.
    """
    j = emb.crossJoin(F.broadcast(queries))
    cos = _dot(F.col("embedding"), F.col("q_vec")) / \
        (_norm(F.col("embedding")) * _norm(F.col("q_vec")))
    scored = j.select("q_id", "vec_id", F.round(cos, 4).alias("cosine"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))


def hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (seeded numpy, driver-side)."""
    rng = np.random.RandomState(seed)
    return rng.randn(bits, dim).astype(float).tolist()


def with_lsh_bucket(emb: DataFrame, planes: list[list[float]],
                    col: str = "embedding") -> DataFrame:
    """Append the sign-bit bucket id: bit i = sign(v · plane_i)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        d = F.aggregate(
            F.zip_with(F.col(col),
                       F.array(*[F.lit(float(x)) for x in p]),
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket.bitwiseOR(
            F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), i))
             .otherwise(F.lit(0).cast("long")))
    return emb.withColumn("bucket", bucket)


def ann_topk_lsh(emb: DataFrame, queries: DataFrame, k: int = 10,
                 bits: int = 8, dim: int = 64, seed: int = 42) -> DataFrame:
    """Approximate top-k: queries only scan their own LSH bucket.

    Returns (q_id, vec_id, cosine, rank). Recall < 1 by construction —
    measure it against cosine_topk (tests do); raise `bits` to shrink
    buckets, lower it to raise recall.
    """
    planes = hyperplanes(dim, bits, seed)
    corpus = with_lsh_bucket(emb, planes)
    qb = with_lsh_bucket(queries, planes, col="q_vec") \
        .withColumnRenamed("bucket", "q_bucket")
    j = corpus.join(F.broadcast(qb), F.col("bucket") == F.col("q_bucket"))
    cos = _dot(F.col("embedding"), F.col("q_vec")) / \
        (_norm(F.col("embedding")) * _norm(F.col("q_vec")))
    scored = j.select("q_id", "vec_id", F.round(cos, 4).alias("cosine"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))


def recall_at_k(exact: DataFrame, approx: DataFrame, k: int = 10) -> DataFrame:
    """(q_id, recall): |approx∩exact| / k per query."""
    e = exact.filter(F.col("rank") <= k).select("q_id", "vec_id")
    a = approx.filter(F.col("rank") <= k).select("q_id", "vec_id")
    hit = e.join(a, ["q_id", "vec_id"]).groupBy("q_id") \
        .agg(F.count(F.lit(1)).alias("n_hit"))
    base = e.groupBy("q_id").agg(F.count(F.lit(1)).alias("n"))
    return (base.join(hit, "q_id", "left")
                .select("q_id",
                        (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n"))
                        .alias("recall")))
