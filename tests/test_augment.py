"""Augmentation trio (augment.py): speed / gain / noise mix."""

import numpy as np
import pytest

from canned_yaml_spark import audio, augment


def _clips(spark, rows):
    return spark.createDataFrame(
        [(cid, bytearray(b) if b is not None else None, "pcm_s16le")
         for cid, b in rows],
        "clip_id string, bytes binary, codec string")


# -------------------------------------------------------------- speed
def test_speed_perturb_exact_positions(spark):
    pcm = np.arange(0, 1000, dtype="<i2")       # ramp: interp is exact
    df = _clips(spark, [("c0", pcm.tobytes())])
    [r] = augment.speed_perturb(df, 10, 9).collect()
    # n_out = (1000-1)*9//10 + 1 = 900; out[j] = round(j*10/9) on a ramp
    assert r.n_samples == 900
    got = np.frombuffer(bytes(r.bytes), dtype="<i2")
    j = np.arange(900, dtype=np.int64)
    f = j * 10 // 9
    rr = j * 10 % 9
    exp = np.rint((f * (9 - rr) + np.minimum(f + 1, 999) * rr) / 9.0)
    assert np.array_equal(got, exp.astype("<i2"))


def test_speed_perturb_passthrough_and_nulls(spark):
    pcm = audio.synth_pcm(3, 16000, 300)
    df = _clips(spark, [("c0", pcm.tobytes()), ("c1", None),
                        ("c2", pcm.tobytes()[:-1])])   # odd → undecodable
    rows = {r.clip_id: r for r in augment.speed_perturb(df, 1, 1).collect()}
    assert np.array_equal(
        np.frombuffer(bytes(rows["c0"].bytes), dtype="<i2"), pcm)
    assert rows["c1"].bytes is None and rows["c2"].bytes is None


def test_speed_factor_validation():
    for bad in ((0, 1), (1, 0), (-9, 10)):
        with pytest.raises(ValueError):
            augment.speed_perturb(None, *bad)


# --------------------------------------------------------------- gain
def test_gain_perturb_round_half_up_and_clamp(spark):
    x = np.array([-32768, -3, -2, -1, 0, 1, 2, 3, 32767], dtype="<i2")
    df = _clips(spark, [("c0", x.tobytes())])
    [r] = augment.gain_perturb(df, 3, 2).collect()     # ×1.5
    got = np.frombuffer(bytes(r.bytes), dtype="<i2")
    exp = np.clip((2 * x.astype(np.int64) * 3 + 2) // 4,
                  -32768, 32767)
    assert np.array_equal(got, exp.astype("<i2"))
    assert got[0] == -32768 and got[-1] == 32767       # clamped
    assert got[4] == 0 and got[5] == 2                 # 1.5 rounds up


def test_gain_perturb_matches_float_reference(spark):
    rng = np.random.default_rng(11)
    x = rng.integers(-20000, 20000, 500).astype("<i2")
    df = _clips(spark, [("c0", x.tobytes())])
    [r] = augment.gain_perturb(df, 7, 9).collect()
    got = np.frombuffer(bytes(r.bytes), dtype="<i2")
    exp = np.floor(x.astype(np.float64) * 7 / 9 + 0.5).astype(np.int64)
    assert np.array_equal(got, exp.astype("<i2"))


# ----------------------------------------------------------- noise mix
def _noise(spark, rows):
    return spark.createDataFrame(
        [(k, bytearray(b)) for k, b in rows],
        "noise_id int, bytes binary")


def test_mix_noise_tiles_and_exact_math(spark):
    x = np.arange(100, 110, dtype="<i2")               # 10 samples
    nz = np.array([10, -20, 30], dtype="<i2")          # tiles 3→10
    clips = _clips(spark, [("c0", x.tobytes())]) \
        .withColumn("noise_id", __import__("pyspark").sql.functions.lit(0))
    [r] = augment.mix_noise(clips, _noise(spark, [(0, nz.tobytes())]),
                            3, 1, 4).collect()
    got = np.frombuffer(bytes(r.bytes), dtype="<i2")
    tiled = nz[np.arange(10) % 3].astype(np.int64)
    exp = (3 * x.astype(np.int64) + tiled) // 4
    assert np.array_equal(got, exp.astype("<i2"))


def test_mix_noise_missing_or_bad_noise_is_null(spark):
    from pyspark.sql import functions as F
    x = audio.synth_pcm(5, 16000, 200)
    clips = _clips(spark, [("c0", x.tobytes()), ("c1", x.tobytes()),
                           ("c2", x.tobytes())]) \
        .withColumn("noise_id",
                    F.when(F.col("clip_id") == "c0", 9)     # no such bank row
                     .when(F.col("clip_id") == "c1", 1)     # odd-length noise
                     .otherwise(2))                         # empty noise
    noise = _noise(spark, [(1, b"\x01\x02\x03"), (2, b"")])
    rows = {r.clip_id: r
            for r in augment.mix_noise(clips, noise, 1, 1, 2).collect()}
    assert all(rows[c].bytes is None for c in ("c0", "c1", "c2"))


def test_mix_noise_broadcasts_the_bank(spark):
    # non-constant assignment key → the bank side must come in as a
    # broadcast hash join (the corpus side is never shuffled)
    clips = augment.assign_noise(
        _clips(spark, [(f"c{i}", b"\x00\x00") for i in range(8)]), 2)
    noise = _noise(spark, [(0, b"\x01\x00"), (1, b"\x02\x00")])
    plan = augment.mix_noise(clips, noise, 1, 1, 2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "ShuffleExchange" not in plan


def test_assign_noise_deterministic_and_in_range(spark):
    clips = _clips(spark, [(f"c{i}", b"\x00\x00") for i in range(50)])
    a = augment.assign_noise(clips, 7).select("clip_id", "noise_id")
    b = augment.assign_noise(clips, 7).select("clip_id", "noise_id")
    ra = sorted((r.clip_id, r.noise_id) for r in a.collect())
    assert ra == sorted((r.clip_id, r.noise_id) for r in b.collect())
    ids = [n for _, n in ra]
    assert all(0 <= n < 7 for n in ids) and len(set(ids)) > 1
    with pytest.raises(ValueError):
        augment.assign_noise(clips, 0)
