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


# ------------------------------------------ fixed training windows
def _win_clip(spark, pcm, codec):
    from canned_yaml_spark import audio
    return spark.createDataFrame(
        [("c0", bytearray(audio.encode(pcm, codec)), codec)],
        "clip_id string, bytes binary, codec string")


def test_window_bounds_arithmetic(spark):
    pcm = np.arange(1000, dtype="<i2")
    df = _win_clip(spark, pcm, "pcm_s16le")
    rows = (segment.window_slices(df, win=256, hop=192, emit_bytes=False)
            .orderBy("win_idx").collect())
    # starts 0,192,384,576,744? no: last start <= 1000-256=744 → 0..576
    # step 192 → [0,192,384,576]; the 768 tail (232 samples) is dropped
    assert [(r.win_idx, r.win_start, r.win_end) for r in rows] == \
        [(0, 0, 256), (1, 192, 448), (2, 384, 640), (3, 576, 832)]


def test_window_edges(spark):
    pcm = np.arange(256, dtype="<i2")
    df = _win_clip(spark, pcm, "pcm_s16le")
    # n == win → exactly one window
    assert segment.window_slices(df, 256, 192).count() == 1
    # n < win → no windows
    assert segment.window_slices(df, 257, 192).count() == 0


def test_window_slices_commute_with_decode(spark):
    """For stateless raw codecs, slicing the stream == slicing the
    decode — the property that makes the pure-JVM path sound."""
    from canned_yaml_spark import audio
    rng = np.random.default_rng(7)
    pcm = rng.integers(-30000, 30000, 700).astype("<i2")
    for codec in ("pcm_s16le", "ulaw", "alaw"):
        df = _win_clip(spark, pcm, codec)
        full = audio.decode(audio.encode(pcm, codec), codec)
        for r in segment.window_slices(df, 128, 100).collect():
            got = audio.decode(bytes(r.win_bytes), codec)
            assert np.array_equal(got, full[r.win_start:r.win_end])


def test_window_slices_pure_jvm_plan(spark):
    df = _win_clip(spark, np.arange(600, dtype="<i2"), "ulaw")
    plan = segment.window_slices(df, 128, 64)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_window_skips_framed_and_corrupt(spark):
    from canned_yaml_spark import audio
    pcm = np.arange(600, dtype="<i2")
    rows = [
        ("flac", bytearray(audio.encode(pcm, "flac"))),   # framed
        ("pcm_s16le", bytearray(pcm.tobytes()[:-1])),     # dangling byte
        ("pcm_s16le", None),                              # NULL payload
        ("pcm_s16le", bytearray(pcm.tobytes())),          # good
    ]
    df = spark.createDataFrame(
        [(f"c{i}", b, c) for i, (c, b) in enumerate(rows)],
        "clip_id string, bytes binary, codec string")
    out = segment.window_slices(df, 256, 192).select("clip_id").distinct()
    assert [r.clip_id for r in out.collect()] == ["c3"]


def test_windows_decoded_matches_jvm_path(spark):
    """The Arrow fallback (framed codecs) must cut the same windows as
    the JVM path does over the same samples: flac stub is lossless, so
    windows_decoded(flac clip) == window_slices(pcm clip) with the
    codec column normalized."""
    pcm = np.arange(900, dtype="<i2")
    jvm = (segment.window_slices(_win_clip(spark, pcm, "pcm_s16le"),
                                 200, 150)
           .select("clip_id", "win_idx", "win_start", "win_end",
                   "win_bytes").collect())
    arrow = (segment.windows_decoded(_win_clip(spark, pcm, "flac"),
                                     200, 150)
             .select("clip_id", "win_idx", "win_start", "win_end",
                     "win_bytes").collect())
    assert len(jvm) == len(arrow) > 0
    for a, b in zip(sorted(jvm, key=lambda r: r.win_idx),
                    sorted(arrow, key=lambda r: r.win_idx)):
        assert a.win_idx == b.win_idx and a.win_start == b.win_start
        assert bytes(a.win_bytes) == bytes(b.win_bytes)


def test_window_validation():
    import pytest

    for bad in ((0, 1), (1, 0), (-1, 1)):
        with pytest.raises(ValueError):
            segment.window_slices(None, *bad)
        with pytest.raises(ValueError):
            segment.windows_decoded(None, *bad)
