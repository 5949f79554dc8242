"""Silence-split segmentation (segment.py)."""

import numpy as np
import pyspark.sql.functions as F

from canned_yaml_spark import segment


def test_clip_segments_hand_cases():
    f = segment._clip_segments
    z, a = np.zeros(300, dtype="<i2"), np.full(300, 1000, dtype="<i2")
    # plain [gap, seg, gap]
    assert f(np.concatenate([z, a, z]), 16, 200, 1) == [(300, 600)]
    # short pause (< min_gap) stays INSIDE its segment
    pause = np.zeros(100, dtype="<i2")
    assert f(np.concatenate([z, a, pause, a, z]), 16, 200, 1) \
        == [(300, 1000)]
    # two segments around a long gap
    assert f(np.concatenate([a, z, a]), 16, 200, 1) \
        == [(0, 300), (600, 900)]
    # no leading/trailing silence: whole clip is one segment
    assert f(a, 16, 200, 1) == [(0, 300)]
    # all silence / empty: nothing
    assert f(z, 16, 200, 1) == []
    assert f(np.zeros(0, dtype="<i2"), 16, 200, 1) == []
    # min_seg filters slivers
    sliver = np.full(5, 1000, dtype="<i2")
    assert f(np.concatenate([z, sliver, z]), 16, 200, 10) == []
    # threshold boundary: |s| == thresh IS silence, thresh+1 is not
    b = np.full(300, 17, dtype="<i2")
    assert f(np.concatenate([z, b, z]), 16, 200, 1) == [(300, 600)]
    assert f(np.full(900, 16, dtype="<i2"), 16, 200, 1) == []


def test_segments_matches_fixture_arithmetic(spark):
    keys = spark.range(40).select(F.col("id").alias("k"))
    corpus = segment.seg_corpus_df(spark, keys)
    got = {(r.clip_id, r.seg_idx): (r.seg_start, r.seg_end)
           for r in segment.segments(corpus).collect()}
    expected = {}
    for k in range(40):
        pos = 0
        for j in range(k % 3 + 1):
            pos += segment.SEG_GAP
            ln = segment.seg_len(k, j)
            expected[(f"clip_{k:010d}", j)] = (pos, pos + ln)
            pos += ln
    assert got == expected


def test_segments_skips_undecodable_and_silent(spark):
    rows = [
        ("bad", "flac", bytearray(b"garbage")),
        ("silent", "pcm_s16le",
         bytearray(np.zeros(1000, dtype="<i2").tobytes())),
    ]
    df = spark.createDataFrame(rows, "clip_id string, codec string, "
                                     "bytes binary")
    assert segment.segments(df).collect() == []
