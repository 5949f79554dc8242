"""Sample-rate conversion (linear interpolation).

Training corpora arrive at mixed sample rates and get normalized to
one rate before featurization; this is that operator. Linear
interpolation at exact rational positions: output sample j sits at
input position j·sr_in/sr_out, so with f = (j·sr_in) // sr_out and
r = (j·sr_in) mod sr_out,

    out[j] = round( (in[f]·(sr_out − r) + in[f+1]·r) / sr_out )

— all-integer numerators (exact in int64), one float division, one
round. That exactness is what lets the driver gate value-check the
resampler against a DuckDB oracle that restates the same arithmetic
over the corpus's closed-form sample formula (oracle.sql_resample).

Distributed shape: embarrassingly parallel — scan → ONE mapInPandas →
(clip_id, sr_hz, n_samples, bytes), no join, no shuffle. Per batch the
math is (n_in, sr_in)-grouped matrix gathers: every clip in a group
shares the same f/r index vectors, so the interpolation is two
gathers + one fused multiply-add over a stacked int matrix, not a
per-sample Python loop.

A windowed-sinc resampler is the higher-fidelity production choice;
linear is the deterministic, dependency-free baseline and the plumbing
(schema, grouping, exactness contract) is identical.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from canned_yaml_spark.audio import decode

_RS_SCHEMA = ("clip_id string, sr_hz int, n_samples bigint, "
              "bytes binary")


def _resample_group(m: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """(clips, n_in) int16 matrix → (clips, n_out) int16, linear
    interpolation at exact rational positions. n_out covers the input
    span [0, n_in−1]: floor((n_in−1)·sr_out/sr_in) + 1."""
    n_in = m.shape[1]
    if n_in == 0:
        return m[:, :0]
    n_out = (n_in - 1) * sr_out // sr_in + 1
    j = np.arange(n_out, dtype=np.int64)
    f = j * sr_in // sr_out
    r = (j * sr_in % sr_out).astype(np.int64)
    f2 = np.minimum(f + 1, n_in - 1)
    a = m[:, f].astype(np.int64)
    b = m[:, f2].astype(np.int64)
    num = a * (sr_out - r) + b * r
    return np.rint(num / float(sr_out)).astype("<i2")


def resample(clips: DataFrame, sr_out: int,
             byte_col: str = "bytes", codec_col: str = "codec",
             sr_col: str = "sr_hz", id_col: str = "clip_id",
             decoder=None) -> DataFrame:
    """(clip_id, sr_hz, n_samples, bytes): every clip converted to
    sr_out. Undecodable payloads keep NULL n_samples/bytes (not
    dropped — callers count them); clips already at sr_out pass
    through untouched (bit-exact, no resampling error)."""
    if sr_out <= 0:
        raise ValueError(f"sr_out must be positive, got {sr_out}")
    dec_fn = decoder or decode
    src = clips.select(F.col(id_col).alias("clip_id"),
                       F.col(sr_col).cast("int").alias("_sr"),
                       F.col(byte_col).alias("_bytes"),
                       F.col(codec_col).alias("_codec"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            payloads = pdf["_bytes"].to_numpy()
            codecs = pdf["_codec"].to_numpy()
            srs = pdf["_sr"].to_numpy()
            out_bytes: list = [None] * n
            decs = [None] * n
            groups: dict[tuple[int, int], list[int]] = {}
            for i in range(n):
                # NULL sr arrives as NaN (nullable int -> float ndarray)
                if payloads[i] is None or pd.isna(srs[i]) or srs[i] <= 0:
                    continue
                d = dec_fn(payloads[i], codecs[i])
                if d is None:
                    continue
                decs[i] = d
                if int(srs[i]) == sr_out:          # passthrough
                    out_bytes[i] = d.astype("<i2").tobytes()
                    continue
                groups.setdefault((d.size, int(srs[i])), []).append(i)
            for (size, sr_in), idx_all in groups.items():
              # chunk: the int64 interpolation numerators are 8 B per
              # output sample ×3 temporaries — bound them per task
              step = max(1, 2_000_000 // max(size, 1))
              for lo in range(0, len(idx_all), step):
                idx = idx_all[lo:lo + step]
                m = np.empty((len(idx), size), dtype=np.int16)
                for j, i in enumerate(idx):
                    m[j] = decs[i]
                out = _resample_group(m, sr_in, sr_out)
                for j, i in enumerate(idx):
                    out_bytes[i] = out[j].tobytes()
            yield pd.DataFrame({
                "clip_id": pdf["clip_id"],
                "sr_hz": pd.array(
                    [sr_out if b is not None else None
                     for b in out_bytes], dtype="Int32"),
                "n_samples": pd.array(
                    [len(b) // 2 if b is not None else None
                     for b in out_bytes], dtype="Int64"),
                "bytes": out_bytes})

    return src.mapInPandas(run, _RS_SCHEMA)


#: downmix output schema
_DM_SCHEMA = ("clip_id string, channels int, n_frames bigint, "
              "bytes binary")


def downmix_mono(clips: DataFrame,
                 byte_col: str = "bytes", id_col: str = "clip_id",
                 decoder=None) -> DataFrame:
    """Stereo/multichannel → mono, the standard prep before ASR or
    fingerprinting: mono[f] = floor(mean of the frame's channel
    samples) over interleaved PCM. Exact integer arithmetic (int32
    channel sum, floor division), so the driver gate value-checks it
    against a DuckDB restatement (oracle.sql_downmix).

    decoder: (bytes) → (interleaved PCM16 ndarray, channels) or None;
    defaults to the RIFF/WAVE chunk walker (multimodal.wav_pcm), the
    container that actually carries channel counts. Mono passes
    through bit-exact; undecodable rows keep NULLs. Same distributed
    shape as resample: one mapInPandas, (n, ch)-grouped matrix math,
    no join, no shuffle.
    """
    if decoder is None:
        from canned_yaml_spark.multimodal import wav_pcm

        def decoder(buf):
            return wav_pcm(bytes(buf))
    src = clips.select(F.col(id_col).alias("clip_id"),
                       F.col(byte_col).alias("_bytes"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            payloads = pdf["_bytes"].to_numpy()
            chs: list = [None] * n
            out_bytes: list = [None] * n
            decs: list = [None] * n
            groups: dict[tuple[int, int], list[int]] = {}
            for i in range(n):
                if payloads[i] is None:
                    continue
                try:
                    pcm, ch = decoder(payloads[i])
                except ValueError:
                    continue
                if pcm is None or ch <= 0 or pcm.size % ch:
                    continue
                chs[i] = ch
                if ch == 1:                    # passthrough: bit-exact
                    out_bytes[i] = np.asarray(pcm, "<i2").tobytes()
                    continue
                decs[i] = pcm
                groups.setdefault((pcm.size, ch), []).append(i)
            for (size, ch), idx_all in groups.items():
              step = max(1, 2_000_000 // max(size, 1))
              for lo in range(0, len(idx_all), step):
                idx = idx_all[lo:lo + step]
                m = np.empty((len(idx), size), dtype=np.int16)
                for j, i in enumerate(idx):
                    m[j] = decs[i]
                fr = m.reshape(len(idx), size // ch, ch)
                mono = (fr.astype(np.int32).sum(axis=2)
                        // ch).astype("<i2")
                for j, i in enumerate(idx):
                    out_bytes[i] = mono[j].tobytes()
            yield pd.DataFrame({
                "clip_id": pdf["clip_id"],
                "channels": pd.array(chs, dtype="Int32"),
                "n_frames": pd.array(
                    [len(b) // 2 if b is not None else None
                     for b in out_bytes], dtype="Int64"),
                "bytes": out_bytes})

    return src.mapInPandas(run, _DM_SCHEMA)


# ------------------------------------------------------------ fixtures
def mod_pcm(key: int, n_samples: int = 4000) -> np.ndarray:
    """Closed-form PCM the SQL oracle can restate exactly: sample i of
    clip k is (i*31 + k*7) % 2048 − 1024 (the same cross-engine-exact
    modular family as multimodal.wav_sample)."""
    i = np.arange(n_samples, dtype=np.int64)
    return ((i * 31 + key * 7) % 2048 - 1024).astype("<i2")


def tri_pcm(key: int, n_samples: int, slope: int = 16,
            amp: int = 4000) -> np.ndarray:
    """Closed-form TRIANGLE wave for predictive-codec gates: sample i
    of clip k is |((i·slope + k·13) mod 4·amp) − 2·amp| − amp. Unlike
    the pseudo-random mod_pcm family this signal is smooth (|Δ| =
    slope per sample), which a one-tap adaptive predictor (IMA ADPCM)
    tracks at 60+ dB — mod_pcm's decorrelated samples would sit at
    ~4 dB under the same codec (the honest character of 4-bit ADPCM,
    pinned in tests/test_audio.py). Boundaries and values stay exactly
    restatable in SQL."""
    i = np.arange(n_samples, dtype=np.int64)
    return (np.abs((i * slope + key * 13) % (4 * amp) - 2 * amp)
            - amp).astype("<i2")


def mod_corpus_df(spark, keys: DataFrame,
                  n_samples: int = 4000, sr_hz: int = 16000) -> DataFrame:
    """(clip_id, sr_hz, codec, bytes) corpus of closed-form clips for
    the resample gate; keys: one-column ('k') DataFrame."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ks = [int(k) for k in pdf["k"]]
            yield pd.DataFrame({
                "clip_id": [f"clip_{k:010d}" for k in ks],
                "sr_hz": pd.array([sr_hz] * len(ks), dtype="int32"),
                "codec": ["pcm_s16le"] * len(ks),
                "bytes": [mod_pcm(k, n_samples).tobytes() for k in ks]})

    return keys.mapInPandas(gen, "clip_id string, sr_hz int, "
                                 "codec string, bytes binary")


#: peak-normalization output schema
_NP_SCHEMA = ("clip_id string, n_samples bigint, peak_in int, "
              "bytes binary")


def normalize_peak(clips: DataFrame, target_peak: int = 30000,
                   byte_col: str = "bytes", codec_col: str = "codec",
                   id_col: str = "clip_id", decoder=None) -> DataFrame:
    """Loudness (peak) normalization — the prep step between decode and
    featurization that puts every clip on one amplitude scale: gain =
    target_peak / max|x|, out[i] = round_half_up(x[i]·T / P) computed
    as the EXACT integer floor division (2·x·T + P) // (2·P). Exact
    rational arithmetic (numerators ≤ 2³² in int64, no float rounding
    ties — half-up by construction), so the driver gate value-checks
    the normalized samples against a DuckDB restatement
    (oracle.sql_normalize_peak). Output peak is exactly ±target_peak
    for any non-silent clip; no clipping while target_peak ≤ 32767.

    Silence (P == 0) passes through bit-exact (gain undefined);
    undecodable payloads keep NULLs (not dropped — callers count
    them). Same distributed shape as resample: one mapInPandas, no
    join, no shuffle; per batch the math is size-grouped matrix
    arithmetic with per-row peak vectors.
    """
    if not 0 < target_peak <= 32767:
        raise ValueError(f"target_peak must be in (0, 32767], "
                         f"got {target_peak}")
    dec_fn = decoder or decode
    t = int(target_peak)
    src = clips.select(F.col(id_col).alias("clip_id"),
                       F.col(byte_col).alias("_bytes"),
                       F.col(codec_col).alias("_codec"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            payloads = pdf["_bytes"].to_numpy()
            codecs = pdf["_codec"].to_numpy()
            out_bytes: list = [None] * n
            peaks: list = [None] * n
            decs: list = [None] * n
            groups: dict[int, list[int]] = {}
            for i in range(n):
                if payloads[i] is None:
                    continue
                d = dec_fn(payloads[i], codecs[i])
                if d is None:
                    continue
                p = int(np.abs(d.astype(np.int64)).max()) if d.size else 0
                peaks[i] = p
                if p == 0:                     # silence: gain undefined
                    out_bytes[i] = d.astype("<i2").tobytes()
                    continue
                decs[i] = d
                groups.setdefault(d.size, []).append(i)
            for size, idx_all in groups.items():
              # int64 numerators: 8 B × n_out per clip — bound per task
              step = max(1, 2_000_000 // max(size, 1))
              for lo in range(0, len(idx_all), step):
                idx = idx_all[lo:lo + step]
                m = np.empty((len(idx), size), dtype=np.int16)
                pv = np.empty((len(idx), 1), dtype=np.int64)
                for j, i in enumerate(idx):
                    m[j] = decs[i]
                    pv[j, 0] = peaks[i]
                out = ((2 * m.astype(np.int64) * t + pv)
                       // (2 * pv)).astype("<i2")
                for j, i in enumerate(idx):
                    out_bytes[i] = out[j].tobytes()
            yield pd.DataFrame({
                "clip_id": pdf["clip_id"],
                "n_samples": pd.array(
                    [len(b) // 2 if b is not None else None
                     for b in out_bytes], dtype="Int64"),
                "peak_in": pd.array(peaks, dtype="Int32"),
                "bytes": out_bytes})

    return src.mapInPandas(run, _NP_SCHEMA)
