"""Acoustic fingerprinting + audio near-dup (audiofp.py)."""

import numpy as np
import pyspark.sql.functions as F

from canned_yaml_spark import audiofp
from canned_yaml_spark.audio import decode, encode


def _fp(pcm):
    return audiofp._batch_fingerprints([pcm], 256, 128, 33)[0]


def _ber_py(fa, fb):
    return sum(bin(x ^ y).count("1") for x, y in zip(fa, fb)) \
        / (32.0 * min(len(fa), len(fb)))


def test_fingerprint_robust_to_every_lossy_codec():
    # a lossy re-encode must stay within a few % BER AND keep at least
    # one exactly-matching frame (the LSH probe's survival condition);
    # a different key must sit near coin-flip distance
    for codec in ("flac", "opus", "mp3"):
        for k in (0, 7, 31):
            pcm = audiofp.chirp_pcm(k, 4000)
            fa = _fp(pcm)
            fb = _fp(decode(encode(pcm, codec), codec))
            assert len(fa) == len(fb) == 29
            assert _ber_py(fa, fb) <= 0.02, (codec, k)
            assert any(x == y for x, y in zip(fa, fb)), (codec, k)
    cross = _ber_py(_fp(audiofp.chirp_pcm(1, 4000)),
                    _fp(audiofp.chirp_pcm(2, 4000)))
    assert cross > 0.3


def test_fingerprint_deterministic():
    pcm = audiofp.chirp_pcm(5, 4000)
    assert _fp(pcm) == _fp(pcm.copy())


def test_fingerprint_edge_cases(spark):
    rows = [
        ("ok", "pcm_s16le",
         bytearray(audiofp.chirp_pcm(3, 2000).tobytes())),
        ("short", "pcm_s16le",
         bytearray(np.zeros(100, dtype="<i2").tobytes())),  # < 2 frames
        ("bad", "flac", bytearray(b"not flac")),
    ]
    df = spark.createDataFrame(rows, "clip_id string, codec string, "
                                     "bytes binary")
    out = {r.clip_id: r.fp for r in audiofp.fingerprint(df).collect()}
    assert out["bad"] is None
    assert out["short"] == []
    assert len(out["ok"]) == (2000 - 256) // 128  # 13 frame transitions
    assert all(0 <= v < (1 << 32) for v in out["ok"])


def test_near_dup_audio_exact_against_injection(spark):
    corpus = audiofp.chirp_corpus_df(spark, 200, dup_every=5)
    pairs = audiofp.near_dup_audio(corpus).collect()
    found = {(p.clip_a, p.clip_b) for p in pairs}
    expected = {(f"clip_{k:010d}", f"clip_{k:010d}_dup")
                for k in range(0, 200, 5)}
    assert found == expected               # recall AND precision 1.0
    assert max(p.ber for p in pairs) <= 0.02

    # verify stage is pure JVM over the carried fingerprints: one
    # self-join, no row-at-a-time Python anywhere, and no joins back
    # to the fingerprint table (exchange reuse is asserted on the
    # bench layout in tools/plan_audit.py — it depends on session
    # config, so it isn't pinned here)
    plan = (audiofp.near_dup_audio(corpus)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan


def test_near_dup_audio_min_overlap_rejects_prefix(spark):
    # a half-length truncation fingerprint-matches its source frame by
    # frame (BER 0 on the aligned prefix) but is NOT the same
    # recording — the overlap rule must reject it
    pcm = audiofp.chirp_pcm(9, 4000)
    rows = [
        ("full", "pcm_s16le", bytearray(pcm.tobytes())),
        ("half", "pcm_s16le", bytearray(pcm[:2000].tobytes())),
    ]
    df = spark.createDataFrame(rows, "clip_id string, codec string, "
                                     "bytes binary")
    assert audiofp.near_dup_audio(df).collect() == []
    got = audiofp.near_dup_audio(df, min_overlap=0.3).collect()
    assert [(r.clip_a, r.clip_b, r.ber) for r in got] == \
        [("full", "half", 0.0)]


def test_spectral_stats_physics(spark):
    # analytic sanity on known signals at 8 kHz: a pure 1 kHz tone has
    # centroid/rolloff at ~1 kHz, tiny flatness and no HF energy; white
    # hash-noise is flat with centroid near sr/4 and real HF share; a
    # band-limited clip (2 kHz-sampled content upsampled 4x) keeps its
    # rolloff near the ORIGINAL 1 kHz Nyquist — the transcode detector
    import numpy as np
    from canned_yaml_spark import resample as rs
    sr = 8000
    t = np.arange(4096) / sr
    tone = (20000 * np.sin(2 * np.pi * 1000 * t)).astype("<i2")
    i = np.arange(4096, dtype=np.float64)
    h = np.sin((i + 9.0) * 12.9898) * 43758.5453
    noise = (8000 * (2 * (h - np.floor(h)) - 1)).astype("<i2")
    lowres = rs._resample_group(noise[None, ::4], sr // 4, sr)[0]
    rows = [
        ("tone", sr, "pcm_s16le", bytearray(tone.tobytes())),
        ("noise", sr, "pcm_s16le", bytearray(noise.tobytes())),
        ("upsampled", sr, "pcm_s16le", bytearray(lowres.tobytes())),
        ("bad", sr, "flac", bytearray(b"junk")),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, sr_hz int, codec string, bytes binary")
    out = {r.clip_id: r for r in audiofp.spectral_stats(df).collect()}

    tn = out["tone"]
    assert abs(tn.centroid_hz - 1000) < 60
    assert abs(tn.rolloff95_hz - 1000) < 60
    assert tn.flatness < 0.01 and tn.hf_ratio < 0.01
    assert tn.bandwidth_hz < 200

    nz = out["noise"]
    assert nz.flatness > 0.4
    assert abs(nz.centroid_hz - sr / 4) < sr * 0.05
    assert nz.rolloff95_hz > 3200 and nz.hf_ratio > 0.05

    up = out["upsampled"]                  # band-limited: rolloff stays
    assert up.rolloff95_hz < 1300          # near the original 1 kHz
    assert up.hf_ratio < 0.01

    assert out["bad"].centroid_hz is None and out["bad"].n_frames is None


def test_batch_fingerprints_chunking_invariant():
    # the memory-bounding chunk loop (step = 2M // size) must not
    # change results across chunk boundaries: 1200 clips of 2000
    # samples → step 1000 → 2 chunks; compare against per-clip calls
    pcms = [audiofp.chirp_pcm(k, 2000) for k in range(1200)]
    batched = audiofp._batch_fingerprints(pcms, 256, 128, 33)
    for k in (0, 999, 1000, 1199):           # straddle the boundary
        solo = audiofp._batch_fingerprints([pcms[k]], 256, 128, 33)[0]
        assert batched[k] == solo


def test_x_spectral_spec_check(spark):
    # x-spectral as a first-class spec extension through the deep spec
    # and the job driver: band-limited and tonal clips flagged, clean
    # broadband clip passes, unknown codec skipped
    import numpy as np
    from canned_yaml_spark import compile_spec
    from canned_yaml_spark import job as jobmod
    from canned_yaml_spark import resample as rs

    sr = 8000
    i = np.arange(4096, dtype=np.float64)
    h = np.sin((i + 5.0) * 12.9898) * 43758.5453
    noise = (8000 * (2 * (h - np.floor(h)) - 1)).astype("<i2")
    lowres = rs._resample_group(noise[None, ::16], sr // 16, sr)[0]
    t = np.arange(4096) / sr
    tone = (20000 * np.sin(2 * np.pi * 440 * t)).astype("<i2")
    rows = [
        ("clean", 0, sr, "pcm_s16le", bytearray(noise.tobytes())),
        ("narrow", 0, sr, "pcm_s16le", bytearray(lowres.tobytes())),
        ("hum", 1, sr, "pcm_s16le", bytearray(tone.tobytes())),
        ("alien", 1, sr, "vorbis", bytearray(b"x")),
    ]
    clips = spark.createDataFrame(
        rows, "clip_id string, part_id int, sr_hz int, codec string, "
              "bytes binary")
    suite = compile_spec("""
type: object
properties:
  bytes:
    x-spectral:
      min_rolloff95_hz: 600.0
      max_flatness: 0.2
""")
    [sc] = suite.spectral_checks
    assert sc.rule_id == "x-spectral.bytes" and sc.max_flatness == 0.2
    from canned_yaml_spark import audiofp as afp
    out = afp.spectral_violations(clips, sc).collect()
    by_clip = {}
    for r in out:
        assert r.rule_id == "x-spectral.bytes" and r.severity == 1
        by_clip.setdefault(r.clip_id, []).append(r.message)
    assert "alien" not in by_clip
    assert any("rolloff95" in m for m in by_clip["narrow"])
    assert any("flatness" in m for m in by_clip["clean"])  # noise IS flat
    assert "hum" in by_clip   # tonal: rolloff 440 < 600
    # clean violates only flatness (its rolloff is high)
    assert not any("rolloff95" in m for m in by_clip["clean"])

    # wired through the job driver
    av = (jobmod.all_violations(clips, suite)
          .filter(F.col("rule_id") == "x-spectral.bytes"))
    assert av.count() == len(out)

    # deep spec variant compiles with both audio extensions
    deep = compile_spec(open("specs/clips_deep.spec.yaml").read())
    assert len(deep.spectral_checks) == 1 and len(deep.audio_checks) == 1


def test_near_dup_audio_incremental_matches_full(spark, tmp_path):
    # corpus of 150 clips with injected dups; the DELTA is 30 more
    # clips, every 5th a lossy re-encode of a CORPUS clip (cross
    # delta-vs-stored dups). incremental(delta, store) must equal the
    # delta-involving subset of a from-scratch run over corpus+delta,
    # with the corpus side never re-FFT'd (fp store only).
    from canned_yaml_spark.audio import encode
    import pandas as pd

    corpus = audiofp.chirp_corpus_df(spark, 150, dup_every=5)
    store_path = str(tmp_path / "fp_store")
    audiofp.fingerprint(corpus).write.parquet(store_path)
    fp_store = spark.read.parquet(store_path)

    rows = []
    for k in range(150, 180):
        pcm = audiofp.chirp_pcm(k, 4000)
        rows.append((f"clip_{k:010d}", 0, "pcm_s16le",
                     bytearray(pcm.tobytes())))
        if k % 5 == 0:     # re-encode of an EXISTING corpus clip
            src = audiofp.chirp_pcm(k - 150, 4000)
            rows.append((f"clip_{k:010d}_x", 0, "opus",
                         bytearray(encode(src, "opus"))))
    delta = spark.createDataFrame(
        rows, "clip_id string, part_id int, codec string, bytes binary")

    inc = {(r.clip_a, r.clip_b, r.ber) for r in
           audiofp.near_dup_audio_incremental(delta, fp_store).collect()}

    full = audiofp.near_dup_audio(corpus.unionByName(delta)).collect()
    delta_ids = {r[0] for r in rows}
    full_delta = {(r.clip_a, r.clip_b, r.ber) for r in full
                  if r.clip_a in delta_ids or r.clip_b in delta_ids}
    assert inc == full_delta
    # and the cross dups were actually found (delta re-encodes of
    # corpus clips k-150)
    expect_cross = {(f"clip_{k-150:010d}", f"clip_{k:010d}_x")
                    for k in range(150, 180) if k % 5 == 0}
    assert expect_cross <= {(a, b) for a, b, _ in inc}


def test_bandlimit_detector_margins(spark):
    """Margins behind the spectral_verdicts oracle: over a key sample,
    the REAL spectral_stats operator measures clean probe clips'
    rolloff95 far above the 2000 Hz floor and band-limited ones far
    below — and the detector flags exactly the injected set."""
    from canned_yaml_spark import audiofp as afp
    from canned_yaml_spark import compile_spec

    keys = spark.range(0, 600, 37).select(F.col("id").alias("k"))
    corpus = afp.bandlimit_corpus_df(spark, keys=keys, every=3)
    stats = afp.spectral_stats(corpus).collect()
    assert stats
    for r in stats:
        k = int(r.clip_id.split("_")[1])
        if k % 3 == 0:
            assert r.rolloff95_hz <= 1100.0, (r.clip_id, r.rolloff95_hz)
        else:
            assert r.rolloff95_hz >= 3000.0, (r.clip_id, r.rolloff95_hz)

    suite = compile_spec(
        {"type": "object",
         "properties": {"bytes": {"x-spectral":
                                  {"min_rolloff95_hz": 2000.0}}}},
        corpus.schema)
    [sc] = suite.spectral_checks
    flagged = {r.clip_id
               for r in afp.spectral_violations(corpus, sc).collect()}
    expected = {f"clip_{k:010d}" for k in range(0, 600, 37) if k % 3 == 0}
    assert flagged == expected


# ------------------------------------------------------ log-mel / MFCC
def test_mel_filterbank_geometry():
    import numpy as np
    fb = audiofp.mel_filterbank(8000, 1024, 26)
    assert fb.shape == (26, 513)
    # adjacent triangles are complementary: between the first and last
    # peaks every frequency's total weight is 1 (each bin is on the
    # falling edge of one filter and the rising edge of the next)
    freqs = np.arange(513) * 8000 / 1024
    lo = audiofp.mel_peak_hz(0, 26, 8000)
    hi = audiofp.mel_peak_hz(25, 26, 8000)
    inner = (freqs >= lo) & (freqs <= hi)
    assert np.allclose(fb.sum(axis=0)[inner], 1.0, atol=1e-9)
    # peak of band k has weight 1 on k and 0 on both neighbors
    for k in (0, 7, 25):
        m = audiofp.mel_filterbank(8000, 1024, 26)
        f = audiofp.mel_peak_hz(k, 26, 8000)
        pts = audiofp.mel_to_hz(np.linspace(
            audiofp.hz_to_mel(0.0), audiofp.hz_to_mel(4000.0), 28))
        assert abs(pts[k + 1] - f) < 1e-9


def test_dct2_ortho_properties():
    import numpy as np
    d = audiofp.dct2_ortho(26, 26)
    # orthonormal: D Dᵀ = I
    assert np.allclose(d @ d.T, np.eye(26), atol=1e-12)
    # constant vector → all energy in c0 = c·sqrt(N)
    c = audiofp.dct2_ortho(13, 26) @ np.full(26, 2.5)
    assert abs(c[0] - 2.5 * np.sqrt(26)) < 1e-9
    assert np.abs(c[1:]).max() < 1e-12


def test_mfcc_dominant_band_matches_injection(spark):
    # every band 0..25 carries tones at its own filter peak — the
    # full FFT → mel → argmax pipeline must land exactly there
    keys = spark.range(0, 52).select(F.col("id").alias("k"))
    corpus = audiofp.tone_band_corpus_df(spark, keys)
    got = audiofp.mfcc_stats(corpus) \
        .select("clip_id", "n_frames", "dominant_band").collect()
    assert len(got) == 52
    for r in got:
        k = int(r.clip_id[5:])
        assert r.dominant_band == k % 26, r
        assert r.n_frames == (4000 - 1024) // 512 + 1


def test_mfcc_stats_null_semantics(spark):
    rows = [
        ("ok", 8000, "pcm_s16le",
         audiofp.tone_band_pcm(1, 5, 26).tobytes()),
        ("short", 8000, "pcm_s16le", b"\x00\x00" * 100),  # < one frame
        ("corrupt", 8000, "flac", b"garbage"),
        ("nullsr", None, "pcm_s16le",
         audiofp.tone_band_pcm(2, 5, 26).tobytes()),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, sr_hz int, codec string, bytes binary")
    got = {r.clip_id: r for r in audiofp.mfcc_stats(df).collect()}
    assert got["ok"].dominant_band == 5
    assert len(got["ok"].log_mel) == 26 and len(got["ok"].mfcc) == 13
    for cid in ("short", "corrupt", "nullsr"):
        r = got[cid]
        assert r.n_frames is None and r.log_mel is None \
            and r.mfcc is None and r.dominant_band is None, r


def test_mfcc_sample_rate_scales_mel_geometry(spark):
    # the filterbank spans [0, sr/2]: a tone at 16 kHz-band-10's peak
    # is classified per the 16 kHz bank, not the 8 kHz one
    import numpy as np
    f = audiofp.mel_peak_hz(10, 26, 16000)
    t = np.arange(8000, dtype=np.float64) / 16000.0
    pcm = np.clip(0.6 * np.sin(2 * np.pi * f * t) * 32767,
                  -32768, 32767).astype("<i2")
    df = spark.createDataFrame(
        [("hi", 16000, "pcm_s16le", pcm.tobytes())],
        "clip_id string, sr_hz int, codec string, bytes binary")
    [r] = audiofp.mfcc_stats(df).collect()
    assert r.dominant_band == 10
