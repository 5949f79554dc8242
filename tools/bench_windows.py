"""Measure the training-window chunking paths (BENCH/WINDOWS.md).

Same corpus, same windows, two plans:
- window_slices: pure-JVM sequence → posexplode → substring(binary)
  (stateless codecs — no Python anywhere), vs
- windows_decoded: Arrow decode → python slice per window (the framed-
  codec fallback), forced onto the SAME raw-pcm corpus for an
  apples-to-apples ratio.

Both run in one process back to back (N_RUNS each, min taken), so the
ratio is insensitive to the host window-health swings that plague
absolute numbers (BENCH/MEMBW.md). Sink: count + a checksum agg over
win_bytes so the byte column is actually materialized, not pruned.

Usage: python tools/bench_windows.py [n_clips]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from canned_yaml_spark import segment  # noqa: E402
from canned_yaml_spark.session import get_spark  # noqa: E402

N_RUNS = 3


def main() -> int:
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = get_spark("bench_windows", cores=32)

    # 4000-sample pcm clips → 20 windows each at win=256 hop=192
    from canned_yaml_spark.resample import mod_corpus_df
    keys = spark.range(n_clips).select(F.col("id").alias("k"))
    corpus = mod_corpus_df(spark, keys).cache()
    n_rows = corpus.count()

    def timed(df):
        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.time()
            # checksum forces win_bytes materialization end to end
            df.agg(F.count("*"), F.sum(F.crc32("win_bytes"))).collect()
            best = min(best, time.time() - t0)
        return best

    jvm = timed(segment.window_slices(corpus, 256, 192))
    arrow = timed(segment.windows_decoded(corpus, 256, 192))
    n_win = segment.window_slices(corpus, 256, 192).count()

    print(f"corpus: {n_rows} clips  windows: {n_win}")
    print(f"window_slices (pure JVM):   {jvm:7.2f} s  "
          f"({n_win / jvm:,.0f} windows/s)")
    print(f"windows_decoded (Arrow):    {arrow:7.2f} s  "
          f"({n_win / arrow:,.0f} windows/s)")
    print(f"ratio (Arrow / JVM):        {arrow / jvm:7.2f}x")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
