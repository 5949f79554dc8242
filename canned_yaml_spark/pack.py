"""Token-packing plan: concat-and-chunk, as a distributed prefix sum.

LLM pretraining consumes documents as ONE long token stream chopped
into fixed-size training rows ("concat and chunk"): document i starts
at the global token offset = sum of all earlier documents' lengths,
and occupies bins floor(offset/budget) .. floor((offset+len-1)/budget).
Producing that plan for 10^12 documents is a GLOBAL prefix sum — the
naive `SUM() OVER (ORDER BY ...)` window funnels the whole table
through one reducer, which is exactly the kind of scale-killer this
engine avoids.

`pack_offsets` computes the identical numbers with the classic
two-pass distributed prefix sum:

1. group documents by contiguous ranges of the (integer) ordering key
   — ``group = order // group_span`` — and aggregate one subtotal per
   group (ONE narrow shuffle of (group, subtotal) pairs, map-side
   combined);
2. cumsum the subtotals on the tiny groups frame (G rows — a window
   over data proportional to parallelism, not to the table) to get
   each group's base offset;
3. broadcast the bases back and compute each document's offset as
   base + its within-group running total (per-group window — the
   sessionize shape, one shuffle on the group key).

The DuckDB oracle restates the STRAIGHT global cumsum — so the gate
proves the distributed decomposition is exactly equal to the
single-reducer definition, in integer arithmetic, at any scale factor.

Contract: ``order_col`` is an integer, globally unique, and the
concatenation order (doc_id here). Lengths are int64 token counts;
offsets are exact int64 (no floats anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_offsets(docs: DataFrame, *, budget: int,
                 order_col: str = "doc_id",
                 len_col: str = "n_tokens",
                 group_span: int = 4096) -> DataFrame:
    """Packing plan: (order_col, n_tokens, start_offset, first_bin,
    last_bin, n_bins) per document, in ``order_col`` concatenation
    order. Documents with NULL or negative length are excluded
    (validate upstream); zero-length documents keep an offset but span
    zero bins (first_bin/last_bin NULL, n_bins 0).
    """
    if budget <= 0:
        raise ValueError("budget must be a positive token count")
    if group_span <= 0:
        raise ValueError("group_span must be positive")
    d = (docs.select(F.col(order_col).alias("_ord"),
                     F.col(len_col).cast("long").alias("_len"))
             .filter(F.col("_len").isNotNull() & (F.col("_len") >= 0))
             .withColumn("_g", F.floor(F.col("_ord") / group_span)))

    # pass 1: one subtotal per group (narrow shuffle, map-side combine)
    sub = d.groupBy("_g").agg(F.sum("_len").alias("_gsum"))
    # pass 2: base offset per group — the window runs over G rows
    # (parallelism-sized, not table-sized), so one partition is fine
    wg = Window.orderBy("_g").rowsBetween(Window.unboundedPreceding, -1)
    bases = sub.select("_g", F.coalesce(F.sum("_gsum").over(wg),
                                        F.lit(0)).alias("_base"))
    # pass 3: within-group running total + broadcast base
    ww = (Window.partitionBy("_g").orderBy("_ord")
                .rowsBetween(Window.unboundedPreceding, -1))
    out = (d.join(F.broadcast(bases), on="_g")
             .withColumn("_local", F.coalesce(F.sum("_len").over(ww),
                                              F.lit(0)))
             .withColumn("start_offset", F.col("_base") + F.col("_local")))
    first = F.floor(F.col("start_offset") / budget)
    last = F.floor((F.col("start_offset") + F.col("_len") - 1) / budget)
    return out.select(
        F.col("_ord").alias(order_col),
        F.col("_len").alias("n_tokens"),
        "start_offset",
        F.when(F.col("_len") > 0, first).alias("first_bin"),
        F.when(F.col("_len") > 0, last).alias("last_bin"),
        F.when(F.col("_len") > 0, last - first + 1)
         .otherwise(F.lit(0)).alias("n_bins"))
