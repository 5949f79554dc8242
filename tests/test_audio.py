"""Audio codec stubs + SNR math (pure numpy, no Spark)."""

import numpy as np
import pytest

from canned_yaml_spark import audio


def test_synth_deterministic():
    a = audio.synth_pcm(7, 16000, 500)
    b = audio.synth_pcm(7, 16000, 500)
    assert np.array_equal(a, b)
    assert a.dtype == np.dtype("<i2")
    assert a.size == min(500 * 16000 // 1000, 4096)


def test_pcm_roundtrip_bit_exact():
    pcm = audio.synth_pcm(1, 8000, 300)
    assert np.array_equal(audio.decode(audio.encode(pcm, "pcm_s16le"),
                                       "pcm_s16le"), pcm)


def test_flac_stub_lossless():
    pcm = audio.synth_pcm(2, 22050, 400)
    dec = audio.decode(audio.encode(pcm, "flac"), "flac")
    assert audio.snr_db(pcm, dec) == float("inf")


@pytest.mark.parametrize("codec", ["opus", "mp3"])
def test_lossy_stubs_pass_30db_gate(codec):
    pcm = audio.synth_pcm(3, 44100, 400)
    dec = audio.decode(audio.encode(pcm, codec), codec)
    s = audio.snr_db(pcm, dec)
    assert 30.0 <= s < float("inf")


def test_truncated_payload_fails():
    pcm = audio.synth_pcm(4, 16000, 400)
    enc = audio.encode(pcm, "pcm_s16le")
    dec = audio.decode(enc[: len(enc) // 2], "pcm_s16le")
    assert audio.snr_db(pcm, dec) == float("-inf")


def test_truncated_zlib_undecodable():
    pcm = audio.synth_pcm(5, 16000, 400)
    enc = audio.encode(pcm, "flac")
    assert audio.decode(enc[: len(enc) // 2], "flac") is None


def test_wrong_magic_undecodable():
    pcm = audio.synth_pcm(6, 16000, 400)
    assert audio.decode(audio.encode(pcm, "flac"), "opus") is None


def test_unknown_codec():
    assert not audio.has_decoder("wav")
    assert audio.decode(b"RIFF....", "wav") is None
    with pytest.raises(NotImplementedError):
        audio.encode(np.zeros(4, "<i2"), "wav")


def test_snr_empty_and_mismatch():
    assert audio.snr_db(np.zeros(0, "<i2"), np.zeros(0, "<i2")) == float("inf")
    assert audio.snr_db(np.ones(4, "<i2"), None) == float("-inf")
    assert audio.snr_db(np.ones(4, "<i2"), np.ones(5, "<i2")) == float("-inf")


# --- G.711 µ-law / A-law: REAL codecs, audioop-cross-checked ---------------
#
# The stdlib's audioop (an independent C implementation of ITU-T G.711,
# present through Python 3.12) is the external oracle: every mapping is
# compared over its FULL domain — all 65536 int16 inputs for the
# encoders, all 256 bytes for the decoders. Same discipline as the WAV
# container's stdlib-`wave` cross-check.

audioop = pytest.importorskip("audioop")


def _all_int16():
    return np.arange(-32768, 32768, dtype=np.int16)


def test_ulaw_encode_matches_audioop_exhaustively():
    x = _all_int16()
    ref = np.frombuffer(audioop.lin2ulaw(x.tobytes(), 2), dtype=np.uint8)
    assert np.array_equal(audio.ulaw_encode(x), ref)


def test_ulaw_decode_matches_audioop_exhaustively():
    b = np.arange(256, dtype=np.uint8)
    ref = np.frombuffer(audioop.ulaw2lin(b.tobytes(), 2), dtype="<i2")
    assert np.array_equal(audio.ulaw_decode(b), ref)


def test_alaw_encode_matches_audioop_exhaustively():
    x = _all_int16()
    ref = np.frombuffer(audioop.lin2alaw(x.tobytes(), 2), dtype=np.uint8)
    assert np.array_equal(audio.alaw_encode(x), ref)


def test_alaw_decode_matches_audioop_exhaustively():
    b = np.arange(256, dtype=np.uint8)
    ref = np.frombuffer(audioop.alaw2lin(b.tobytes(), 2), dtype="<i2")
    assert np.array_equal(audio.alaw_decode(b), ref)


@pytest.mark.parametrize("codec", ["ulaw", "alaw"])
def test_g711_through_codec_registry_passes_30db_gate(codec):
    # companded log-PCM: lossy but ~37 dB on the synth corpus — above
    # the 30 dB payload gate with ~7 dB margin (pinned band)
    pcm = audio.synth_pcm(5, 16000, 400)
    dec = audio.decode(audio.encode(pcm, codec), codec)
    assert dec is not None and dec.size == pcm.size
    s = audio.snr_db(pcm, dec)
    assert 33.0 <= s <= 42.0


@pytest.mark.parametrize("codec", ["ulaw", "alaw"])
def test_g711_transcode_fixpoint(codec):
    # companding is idempotent after one pass: decode∘encode maps onto
    # the 256-point codebook, so a second encode round-trips bit-exactly
    pcm = audio.synth_pcm(6, 22050, 300)
    enc1 = audio.encode(pcm, codec)
    dec1 = audio.decode(enc1, codec)
    assert audio.encode(dec1, codec) == enc1
    assert np.array_equal(audio.decode(audio.encode(dec1, codec), codec),
                          dec1)


@pytest.mark.parametrize("codec", ["ulaw", "alaw"])
def test_g711_truncation_fails_gate(codec):
    # 1 byte/sample: truncation halves the sample count → length
    # mismatch → SNR -inf (hard fail), the same failure shape as raw PCM
    pcm = audio.synth_pcm(7, 16000, 400)
    enc = audio.encode(pcm, codec)
    dec = audio.decode(enc[: len(enc) // 2], codec)
    assert dec is not None and dec.size == pcm.size // 2
    assert audio.snr_db(pcm, dec) == float("-inf")


def test_g711_extremes_saturate_not_wrap():
    # full-scale inputs hit the top companding segment on both laws and
    # decode back to the curve's saturation values, never sign-flipped
    x = np.array([-32768, -32767, 32766, 32767], dtype=np.int16)
    for codec in ("ulaw", "alaw"):
        d = audio.decode(audio.encode(x, codec), codec)
        assert np.all(np.sign(d) == np.sign(x))
        assert np.all(np.abs(d.astype(np.int32)) <= 32768)


# --- IMA/DVI ADPCM: REAL codec, audioop-cross-checked ----------------------

def test_adpcm_codes_match_audioop_random_streams():
    """Encode AND decode parity with audioop's independent C
    implementation over random/structured streams, from the zero state
    and from arbitrary predictor states (audioop's state tuple ==
    the container header's (valpred, index))."""
    rng = np.random.default_rng(3)
    for trial in range(24):
        n = int(rng.integers(2, 900)) * 2
        kind = trial % 3
        if kind == 0:
            pcm = rng.integers(-32768, 32768, n).astype(np.int16)
        elif kind == 1:
            t = np.arange(n) / 8000.0
            pcm = (20000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
        else:
            pcm = np.zeros(n, dtype=np.int16)
            pcm[::7] = 32767
        state = (None if trial % 4 == 0 else
                 (int(rng.integers(-32768, 32768)),
                  int(rng.integers(0, 89))))
        ref_bytes, _ = audioop.lin2adpcm(pcm.tobytes(), 2, state)
        vp, ix = state if state else (0, 0)
        got = audio._adpcm_pack(audio._adpcm_encode_codes(pcm, vp, ix))
        assert got == ref_bytes
        ref_dec, _ = audioop.adpcm2lin(ref_bytes, 2, state)
        got_dec = audio._adpcm_decode_codes(
            audio._adpcm_unpack(ref_bytes, n), vp, ix)
        assert np.array_equal(
            np.frombuffer(ref_dec, dtype="<i2"), got_dec)


@pytest.mark.parametrize("n", [0, 1, 2, 601, 1024])
def test_adpcm_container_roundtrip_exact_length(n):
    # the header's sample count restores EXACT length (odd counts have
    # a half-filled final byte; headerless streams can't distinguish)
    pcm = audio.synth_pcm(9, 16000, 400)[:n].copy()
    enc = audio.encode(pcm, "adpcm_ima")
    dec = audio.decode(enc, "adpcm_ima")
    assert dec is not None and dec.size == n


def test_adpcm_smooth_signal_snr_band():
    """ADPCM's honest character: a one-tap adaptive predictor tracks
    smooth signals at 60+ dB (triangle corpus band pinned — the
    adpcm_snr gate's safety margin) but decorrelated samples at ~4 dB.
    The header-carried initial predictor state is load-bearing: from
    the cold (0,0) state the same triangle clips lose ~45 dB to the
    start-up transient."""
    from canned_yaml_spark.resample import mod_pcm, tri_pcm
    tri, cold, rnd = [], [], []
    for k in range(0, 4100, 41):
        n = 600 + k % 997
        s = tri_pcm(k, n)
        dec = audio.decode(audio.encode(s, "adpcm_ima"), "adpcm_ima")
        tri.append(audio.snr_db(s, dec))
        codes = audio._adpcm_encode_codes(s, 0, 0)
        cold.append(audio.snr_db(s, audio._adpcm_decode_codes(codes)))
        m = mod_pcm(k, n)
        decm = audio.decode(audio.encode(m, "adpcm_ima"), "adpcm_ima")
        rnd.append(audio.snr_db(m, decm))
    assert 60.0 <= min(tri) and max(tri) <= 66.0
    # cold start is harmless only when a clip happens to START near
    # zero; the worst case loses 40+ dB — that tail is why the header
    # carries the state
    assert min(cold) < 25.0
    assert max(rnd) < 10.0


def test_adpcm_corruption_rejected():
    pcm = audio.synth_pcm(10, 16000, 400)
    enc = audio.encode(pcm, "adpcm_ima")
    assert audio.decode(enc[: len(enc) // 2], "adpcm_ima") is None
    assert audio.decode(b"XXXX" + enc[4:], "adpcm_ima") is None
    assert audio.decode(enc + b"\x00", "adpcm_ima") is None
    bad_idx = enc[:10] + bytes([200]) + enc[11:]
    assert audio.decode(bad_idx, "adpcm_ima") is None
    assert audio.decode(enc[:8], "adpcm_ima") is None
