"""Audio augmentation: speed perturbation, gain perturbation, noise mix.

The standard ASR training-data augmentation trio (speed 0.9/1.0/1.1,
gain jitter, additive noise). Everything is exact integer/rational
arithmetic so the driver gates value-check each op against a DuckDB
restatement — the same exactness contract as resample/downmix/
normalize_peak, whose machinery these ops reuse.

Distributed shape: speed and gain are embarrassingly parallel (scan →
ONE mapInPandas, no join, no shuffle — the resample shape). Noise mix
joins each clip to its assigned noise clip: the noise BANK is small by
construction (hundreds of clips against a corpus of billions), so the
join is a broadcast — no shuffle of the corpus — and the caller
chooses the assignment column (closed-form in the gate; production
uses assign_noise's xxhash64 bucketing, deterministic under retry).

Reference analog: the reference pipeline has no augmentation stage
(canned-yaml validates, it does not transform); these belong to the
task brief's training-data-pipeline family, like dedup/sampling.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from canned_yaml_spark.audio import decode
from canned_yaml_spark.resample import _resample_group

_SP_SCHEMA = "clip_id string, n_samples bigint, bytes binary"


def _check_frac(num: int, den: int) -> None:
    if num <= 0 or den <= 0:
        raise ValueError(f"factor must be a positive fraction, "
                         f"got {num}/{den}")


def speed_perturb(clips: DataFrame, num: int, den: int,
                  byte_col: str = "bytes", codec_col: str = "codec",
                  id_col: str = "clip_id", decoder=None) -> DataFrame:
    """Playback-speed change by the exact factor num/den (>1 → faster
    and shorter), the classic 3-way ASR augmentation: output sample j
    is the linear interpolation of the input at position j·num/den —
    precisely _resample_group's rational-position math with
    (sr_in, sr_out) = (num, den), so n_out = (n_in−1)·den//num + 1.
    The sample-rate LABEL is unchanged (that is the point: the same
    samples replayed at the same rate now span a different duration,
    shifting pitch and tempo together). num/den == 1 passes through
    bit-exact; undecodable rows keep NULLs.
    """
    _check_frac(num, den)
    dec_fn = decoder or decode
    src = clips.select(F.col(id_col).alias("clip_id"),
                       F.col(byte_col).alias("_bytes"),
                       F.col(codec_col).alias("_codec"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            payloads = pdf["_bytes"].to_numpy()
            codecs = pdf["_codec"].to_numpy()
            out_bytes: list = [None] * n
            decs: list = [None] * n
            groups: dict[int, list[int]] = {}
            for i in range(n):
                if payloads[i] is None:
                    continue
                d = dec_fn(payloads[i], codecs[i])
                if d is None:
                    continue
                if num == den:                 # passthrough: bit-exact
                    out_bytes[i] = d.astype("<i2").tobytes()
                    continue
                decs[i] = d
                groups.setdefault(d.size, []).append(i)
            for size, idx_all in groups.items():
                step = max(1, 2_000_000 // max(size, 1))
                for lo in range(0, len(idx_all), step):
                    idx = idx_all[lo:lo + step]
                    m = np.empty((len(idx), size), dtype=np.int16)
                    for j, i in enumerate(idx):
                        m[j] = decs[i]
                    out = _resample_group(m, num, den)
                    for j, i in enumerate(idx):
                        out_bytes[i] = out[j].tobytes()
            yield pd.DataFrame({
                "clip_id": pdf["clip_id"],
                "n_samples": pd.array(
                    [len(b) // 2 if b is not None else None
                     for b in out_bytes], dtype="Int64"),
                "bytes": out_bytes})

    return src.mapInPandas(run, _SP_SCHEMA)


def gain_perturb(clips: DataFrame, num: int, den: int,
                 byte_col: str = "bytes", codec_col: str = "codec",
                 id_col: str = "clip_id", decoder=None) -> DataFrame:
    """Exact rational gain num/den applied to every sample, rounded
    half-up and clamped to int16 — normalize_peak's arithmetic with a
    FIXED gain instead of a peak-derived one (gain jitter is drawn
    outside the engine so executors stay deterministic under retry):
    out = clamp(floor((2·x·num + den) / (2·den))). num/den == 1 is a
    bit-exact passthrough; undecodable rows keep NULLs."""
    _check_frac(num, den)
    dec_fn = decoder or decode
    src = clips.select(F.col(id_col).alias("clip_id"),
                       F.col(byte_col).alias("_bytes"),
                       F.col(codec_col).alias("_codec"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["_bytes"].to_numpy()
            codecs = pdf["_codec"].to_numpy()
            out_bytes: list = [None] * len(pdf)
            for i in range(len(pdf)):
                if payloads[i] is None:
                    continue
                d = dec_fn(payloads[i], codecs[i])
                if d is None:
                    continue
                if num == den:
                    out_bytes[i] = d.astype("<i2").tobytes()
                    continue
                x = d.astype(np.int64)
                y = (2 * x * num + den) // (2 * den)
                out_bytes[i] = np.clip(y, -32768, 32767) \
                    .astype("<i2").tobytes()
            yield pd.DataFrame({
                "clip_id": pdf["clip_id"],
                "n_samples": pd.array(
                    [len(b) // 2 if b is not None else None
                     for b in out_bytes], dtype="Int64"),
                "bytes": out_bytes})

    return src.mapInPandas(run, _SP_SCHEMA)


def assign_noise(clips: DataFrame, n_bank: int,
                 id_col: str = "clip_id",
                 out_col: str = "noise_id") -> DataFrame:
    """Deterministic noise assignment for production corpora: noise_id
    = xxhash64(clip_id) mod n_bank — pure JVM, stable under retry,
    uniform across the bank. The gate uses a closed-form assignment
    instead so its oracle stays arithmetic-only."""
    if n_bank <= 0:
        raise ValueError(f"n_bank must be positive, got {n_bank}")
    return clips.withColumn(
        out_col, F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_bank))
                  .cast("int"))


def mix_noise(clips: DataFrame, noise: DataFrame,
              num_sig: int, num_noise: int, den: int,
              noise_key_col: str = "noise_id",
              byte_col: str = "bytes", codec_col: str = "codec",
              id_col: str = "clip_id", decoder=None) -> DataFrame:
    """Additive noise augmentation with exact integer weights:
    out[i] = floor((num_sig·x[i] + num_noise·nz[i mod len(nz)]) / den),
    clamped to int16. The noise clip TILES to the signal's length
    (standard practice — noise banks hold short loops). Weights are
    integers so the mix is exactly restatable in SQL; a target-SNR mix
    is this op with weights chosen upstream from the bank's published
    RMS levels.

    noise: (noise_key_col, bytes) with RAW pcm_s16le payloads — a
    noise BANK, small by construction, broadcast to every task; the
    corpus is never shuffled. clips must already carry noise_key_col
    (see assign_noise). Rows whose noise key misses the bank, whose
    payload is undecodable, or whose assigned noise clip is empty keep
    NULLs.
    """
    _check_frac(num_sig, den)
    if num_noise < 0:
        raise ValueError(f"num_noise must be >= 0, got {num_noise}")
    dec_fn = decoder or decode
    src = clips.select(F.col(id_col).alias("clip_id"),
                       F.col(noise_key_col).alias("_nk"),
                       F.col(byte_col).alias("_bytes"),
                       F.col(codec_col).alias("_codec"))
    nz = noise.select(F.col(noise_key_col).alias("_nk"),
                      F.col("bytes").alias("_nz"))
    joined = src.join(F.broadcast(nz), "_nk", "left")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["_bytes"].to_numpy()
            codecs = pdf["_codec"].to_numpy()
            noises = pdf["_nz"].to_numpy()
            out_bytes: list = [None] * len(pdf)
            for i in range(len(pdf)):
                if payloads[i] is None or noises[i] is None:
                    continue
                d = dec_fn(payloads[i], codecs[i])
                if d is None or len(noises[i]) % 2:
                    continue
                nbuf = np.frombuffer(bytes(noises[i]), dtype="<i2")
                if nbuf.size == 0:
                    continue
                x = d.astype(np.int64)
                tiled = nbuf[np.arange(x.size) % nbuf.size] \
                    .astype(np.int64)
                y = (num_sig * x + num_noise * tiled) // den
                out_bytes[i] = np.clip(y, -32768, 32767) \
                    .astype("<i2").tobytes()
            yield pd.DataFrame({
                "clip_id": pdf["clip_id"],
                "n_samples": pd.array(
                    [len(b) // 2 if b is not None else None
                     for b in out_bytes], dtype="Int64"),
                "bytes": out_bytes})

    return joined.mapInPandas(run, _SP_SCHEMA)
