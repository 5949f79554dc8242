"""Silence-split audio segmentation (VAD-style).

Speech corpora are cut on silence before anything downstream
(transcription, dedup, quality gates) sees them; this is the operator
that does the cutting. A segment is a maximal run of samples NOT
contained in a silence run of length ≥ min_gap, where silence is
|sample| ≤ silence_thresh. Short pauses (< min_gap) stay inside their
segment; leading/trailing silence is trimmed.

Distributed shape: embarrassingly parallel — scan → ONE mapInPandas →
(clip_id, seg_idx, seg_start, seg_end) rows, no reference table, no
join, no shuffle. The per-clip run detection is O(n) numpy mask/diff
vector math, not a Python sample loop.

Unlike the FFT operators this one is exactly SQL-checkable: the gate
corpus lays out segments and gaps by closed-form arithmetic on the
clip key, so the DuckDB oracle restates every (start, end) boundary
analytically (oracle.sql_audio_segments).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from canned_yaml_spark.audio import decode

_SEG_SCHEMA = ("clip_id string, seg_idx int, seg_start bigint, "
               "seg_end bigint")


def _clip_segments(pcm: np.ndarray, silence_thresh: int,
                   min_gap: int, min_seg: int) -> list[tuple[int, int]]:
    """[(start, end)) active segments of one PCM array — pure mask
    arithmetic: silence runs come from the diff of the padded silence
    mask, runs ≥ min_gap split the clip, everything else is kept."""
    n = pcm.size
    if n == 0:
        return []
    mask = (np.abs(pcm.astype(np.int32)) <= silence_thresh)
    edges = np.flatnonzero(np.diff(np.concatenate(
        ([False], mask, [False])).astype(np.int8)))
    starts, ends = edges[::2], edges[1::2]       # silence runs
    long = (ends - starts) >= min_gap
    cut_s, cut_e = starts[long], ends[long]
    seg_starts = np.concatenate(([0], cut_e))
    seg_ends = np.concatenate((cut_s, [n]))
    keep = (seg_ends - seg_starts) >= max(min_seg, 1)
    return [(int(s), int(e))
            for s, e in zip(seg_starts[keep], seg_ends[keep])]


def segments(clips: DataFrame,
             silence_thresh: int = 16, min_gap: int = 200,
             min_seg: int = 1,
             byte_col: str = "bytes", codec_col: str = "codec",
             id_col: str = "clip_id", decoder=None) -> DataFrame:
    """(clip_id, seg_idx, seg_start, seg_end) — sample offsets
    (end exclusive) of each clip's active segments. Undecodable
    payloads and all-silence clips contribute no rows (the quality
    gates own those; this operator only cuts)."""
    dec_fn = decoder or decode
    src = clips.select(F.col(id_col).alias("clip_id"),
                       F.col(byte_col).alias("_bytes"),
                       F.col(codec_col).alias("_codec"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ss, ee = [], [], [], []
            payloads = pdf["_bytes"].to_numpy()
            codecs = pdf["_codec"].to_numpy()
            for i, cid in enumerate(pdf["clip_id"]):
                if payloads[i] is None:
                    continue
                pcm = dec_fn(payloads[i], codecs[i])
                if pcm is None:
                    continue
                for j, (s, e) in enumerate(_clip_segments(
                        pcm, silence_thresh, min_gap, min_seg)):
                    ids.append(cid)
                    idxs.append(j)
                    ss.append(s)
                    ee.append(e)
            yield pd.DataFrame({
                "clip_id": ids,
                "seg_idx": pd.array(idxs, dtype="int32"),
                "seg_start": pd.array(ss, dtype="int64"),
                "seg_end": pd.array(ee, dtype="int64")})

    return src.mapInPandas(run, _SEG_SCHEMA)


# ------------------------------------------------------------ fixtures
SEG_GAP = 250      #: silence gap between (and around) segments
SEG_NMAX = 3       #: max segments per clip (n_seg = k % 3 + 1)


def seg_len(key: int, j: int) -> int:
    """Closed-form length of segment j of clip key (shared with the
    SQL oracle: 400 + ((k*7 + j*13) % 200))."""
    return 400 + ((key * 7 + j * 13) % 200)


def seg_pcm(key: int) -> np.ndarray:
    """PCM with k%3+1 active segments (alternating ±1000 — always
    above any sensible silence threshold) separated and surrounded by
    SEG_GAP zero samples. Every boundary is closed-form in the key."""
    n_seg = key % SEG_NMAX + 1
    parts = []
    for j in range(n_seg):
        parts.append(np.zeros(SEG_GAP, dtype="<i2"))
        ln = seg_len(key, j)
        seg = np.full(ln, 1000, dtype="<i2")
        seg[1::2] = -1000
        parts.append(seg)
    parts.append(np.zeros(SEG_GAP, dtype="<i2"))
    return np.concatenate(parts)


def seg_corpus_df(spark, keys: DataFrame) -> DataFrame:
    """(clip_id, codec, bytes) corpus of gap-laid-out clips for the
    segmentation gate; keys: one-column ('k') DataFrame."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ks = [int(k) for k in pdf["k"]]
            yield pd.DataFrame({
                "clip_id": [f"clip_{k:010d}" for k in ks],
                "codec": ["pcm_s16le"] * len(ks),
                "bytes": [seg_pcm(k).tobytes() for k in ks]})

    return keys.mapInPandas(gen, "clip_id string, codec string, "
                                 "bytes binary")
