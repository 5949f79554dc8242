"""Sample-rate conversion (resample.py)."""

import numpy as np
import pyspark.sql.functions as F

from canned_yaml_spark import resample as rs


def test_resample_group_hand_values():
    # 4 samples at 16k -> 12k (ratio 4/3): positions 0, 4/3, 8/3;
    # n_out = 3*3//4 + 1 = 3
    m = np.array([[0, 300, 600, 900]], dtype=np.int16)
    out = rs._resample_group(m, 16000, 12000)
    assert out.tolist() == [[0, 400, 800]]     # exact thirds
    # upsample 2x: midpoints are exact halves of neighbors
    out2 = rs._resample_group(np.array([[0, 100, -100]], dtype=np.int16),
                              8000, 16000)
    assert out2.tolist() == [[0, 50, 100, 0, -100]]
    # single sample / empty
    assert rs._resample_group(np.array([[7]], dtype=np.int16),
                              16000, 12000).tolist() == [[7]]
    assert rs._resample_group(np.zeros((1, 0), dtype=np.int16),
                              16000, 12000).shape == (1, 0)
    # int16 extremes interpolate without overflow
    ex = rs._resample_group(np.array([[32767, -32768]], dtype=np.int16),
                            8000, 16000)
    assert ex.tolist() == [[32767, 0, -32768]]


def test_resample_operator_semantics(spark):
    pcm = rs.mod_pcm(3, 400)
    rows = [
        ("a", 16000, "pcm_s16le", bytearray(pcm.tobytes())),
        ("same", 12000, "pcm_s16le", bytearray(pcm.tobytes())),
        ("bad", 12000, "flac", bytearray(b"junk")),
        ("nosr", None, "pcm_s16le", bytearray(pcm.tobytes())),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, sr_hz int, codec string, bytes binary")
    out = {r.clip_id: r for r in rs.resample(df, 12000).collect()}

    a = out["a"]
    assert (a.sr_hz, a.n_samples) == (12000, (400 - 1) * 3 // 4 + 1)
    expect = rs._resample_group(pcm[None, :], 16000, 12000)[0]
    assert np.array_equal(np.frombuffer(bytes(a.bytes), dtype="<i2"),
                          expect)

    s = out["same"]                            # passthrough: bit-exact
    assert bytes(s.bytes) == pcm.tobytes() and s.n_samples == 400

    assert out["bad"].n_samples is None and out["bad"].bytes is None
    assert out["nosr"].n_samples is None


def test_resample_round_trip_spectrum_preserved():
    # down 16k->12k then up 12k->16k of a smooth low-frequency signal
    # stays close (linear interp error is second-order in the step)
    t = np.arange(4000) / 16000.0
    pcm = (10000 * np.sin(2 * np.pi * 400 * t)).astype(np.int16)
    down = rs._resample_group(pcm[None, :], 16000, 12000)
    up = rs._resample_group(down, 12000, 16000)[0]
    n = min(up.size, pcm.size)
    err = np.abs(up[:n].astype(np.int64) - pcm[:n].astype(np.int64))
    assert err.max() < 200                     # < 2% of amplitude


def test_downmix_mono_semantics(spark):
    import numpy as np
    from canned_yaml_spark import multimodal

    stereo = multimodal.encode_wav(3, 50, 16000, 2)
    mono_wav = multimodal.encode_wav(4, 50, 16000, 1)
    rows = [
        ("st", bytearray(stereo)),
        ("mo", bytearray(mono_wav)),
        ("bad", bytearray(b"RIFFxxxx")),
        ("nul", None),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    out = {r.clip_id: r for r in rs.downmix_mono(df).collect()}

    st = out["st"]
    assert (st.channels, st.n_frames) == (2, 50)
    got = np.frombuffer(bytes(st.bytes), dtype="<i2")
    s = lambda i: (i * 31 + 3 * 7) % 2048 - 1024
    want = np.array([(s(2 * f) + s(2 * f + 1)) // 2 for f in range(50)],
                    dtype="<i2")   # // floors toward -inf, as the op does
    assert np.array_equal(got, want)

    mo = out["mo"]                 # mono: bit-exact passthrough
    pcm, ch = multimodal.wav_pcm(mono_wav)
    assert ch == 1 and bytes(mo.bytes) == pcm.tobytes()

    assert out["bad"].channels is None and out["bad"].bytes is None
    assert out["nul"].n_frames is None


def test_downmix_floor_division_on_negative_sums():
    # (-3 + -4) // 2 = -4 (floor), not -3 (truncation): pin the exact
    # rounding contract the oracle restates with floor()
    import numpy as np
    from canned_yaml_spark import resample as rsm
    pcm = np.array([-3, -4, 5, 4], dtype="<i2")   # 2 frames, 2 ch

    def dec(buf):
        return pcm, 2

    # exercise through the public op with a stub decoder
    from canned_yaml_spark.session import get_spark
    spark = get_spark(cores=2)
    df = spark.createDataFrame([("x", bytearray(b"ignored"))],
                               "clip_id string, bytes binary")
    r = rsm.downmix_mono(df, decoder=dec).collect()[0]
    assert np.frombuffer(bytes(r.bytes), dtype="<i2").tolist() == [-4, 4]


def test_normalize_peak_exact_and_edges(spark):
    """Peak normalization: exact round-half-up rational values vs a
    straight numpy reference; output peak is exactly the target for
    any non-silent clip; silence passes through bit-exact; undecodable
    rows keep NULLs; target validation raises."""
    import numpy as np
    import pytest

    from canned_yaml_spark import resample as rs

    t = 30000
    pcm_a = rs.mod_pcm(5, 777)
    pcm_b = np.full(64, -3, dtype="<i2")     # constant negative
    silent = np.zeros(32, dtype="<i2")
    rows = [
        ("a", "pcm_s16le", bytearray(pcm_a.tobytes())),
        ("b", "pcm_s16le", bytearray(pcm_b.tobytes())),
        ("s", "pcm_s16le", bytearray(silent.tobytes())),
        ("bad", "flac", bytearray(b"notflac")),
    ]
    clips = spark.createDataFrame(
        rows, "clip_id string, codec string, bytes binary")
    out = {r.clip_id: r for r in
           rs.normalize_peak(clips, target_peak=t).collect()}

    def ref(x):
        p = int(np.abs(x.astype(np.int64)).max())
        return ((2 * x.astype(np.int64) * t + p) // (2 * p)).astype("<i2")

    got_a = np.frombuffer(bytes(out["a"].bytes), dtype="<i2")
    assert np.array_equal(got_a, ref(pcm_a))
    assert int(np.abs(got_a.astype(np.int64)).max()) == t
    assert out["a"].peak_in == int(np.abs(pcm_a.astype(np.int64)).max())

    got_b = np.frombuffer(bytes(out["b"].bytes), dtype="<i2")
    assert np.array_equal(got_b, np.full(64, -t, dtype="<i2"))

    assert bytes(out["s"].bytes) == silent.tobytes()   # silence: as-is
    assert out["s"].peak_in == 0

    assert out["bad"].bytes is None and out["bad"].peak_in is None

    with pytest.raises(ValueError):
        rs.normalize_peak(clips, target_peak=0)
    with pytest.raises(ValueError):
        rs.normalize_peak(clips, target_peak=40000)
