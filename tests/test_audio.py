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
