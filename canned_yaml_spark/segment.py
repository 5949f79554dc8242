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


# ----------------------------------------------- fixed training windows
#: raw STATELESS codecs: fixed bytes/sample, so slicing the byte stream
#: commutes with decoding it — window extraction never needs Python
RAW_BPS = {"pcm_s16le": 2, "ulaw": 1, "alaw": 1}

_WIN_SCHEMA = ("clip_id string, codec string, win_idx int, "
               "win_start bigint, win_end bigint, win_bytes binary")


def window_slices(clips: DataFrame, win: int, hop: int,
                  byte_col: str = "bytes", codec_col: str = "codec",
                  id_col: str = "clip_id",
                  emit_bytes: bool = True) -> DataFrame:
    """Cut clips into fixed-size training windows (`win` samples every
    `hop`), the prep step between segmentation and featurization.
    Output: (clip_id, codec, win_idx, win_start, win_end[, win_bytes])
    with win_end exclusive and the tail (< win samples) dropped —
    trainers want fixed shapes; window n covers [n·hop, n·hop + win).

    Spark-first shape: for raw stateless codecs (RAW_BPS — PCM16 and
    the G.711 pair) the sample count is length(bytes)/bps and a window
    IS a byte-range, so the whole operator is sequence → posexplode →
    substring COLUMN ops: no Arrow crossing, no Python, one
    whole-stage-codegen span, embarrassingly parallel, and the DuckDB
    oracle can restate it exactly (generate_series + blob slicing).
    Framed/entropy codecs can't be sliced without decode — those rows
    route through windows_decoded (Arrow) instead; this operator
    filters to RAW_BPS rows (and to streams whose byte length is a
    whole number of samples — a dangling byte means the payload is
    corrupt, which is the payload check's violation to raise, not
    ours to guess through).
    """
    if win <= 0 or hop <= 0:
        raise ValueError(f"win and hop must be positive, got {win}/{hop}")
    bps = F.element_at(
        F.create_map(*[F.lit(x) for kv in RAW_BPS.items() for x in kv]),
        F.col(codec_col))
    n = (F.length(F.col(byte_col)) / bps).cast("long")
    src = (clips.select(F.col(id_col).alias("clip_id"),
                        F.col(codec_col).alias("codec"),
                        F.col(byte_col).alias("_bytes"),
                        bps.alias("_bps"), n.alias("_n"))
                .filter(F.col("_bps").isNotNull() &
                        F.col("_bytes").isNotNull() &
                        (F.length("_bytes") % F.col("_bps") == 0) &
                        (F.col("_n") >= win)))
    starts = F.sequence(F.lit(0).cast("long"),
                        F.col("_n") - win, F.lit(hop).cast("long"))
    e = src.select("clip_id", "codec", "_bytes", "_bps",
                   F.posexplode(starts).alias("win_idx", "win_start"))
    cols = [F.col("clip_id"), F.col("codec"), F.col("win_idx"),
            F.col("win_start"),
            (F.col("win_start") + win).alias("win_end")]
    if emit_bytes:
        # substring on binary is 1-based; pure JVM byte-range copy
        cols.append(F.expr(
            f"substring(_bytes, cast(win_start * _bps + 1 as int), "
            f"{win} * _bps)").alias("win_bytes"))
    return e.select(*cols)


def windows_decoded(clips: DataFrame, win: int, hop: int,
                    byte_col: str = "bytes", codec_col: str = "codec",
                    id_col: str = "clip_id", decoder=None) -> DataFrame:
    """Arrow fallback for framed/entropy codecs: decode each payload
    once, then emit every window's samples re-encoded as pcm_s16le
    (the trainer-ready form — codec column says so). Same windowing
    rule as window_slices; undecodable rows contribute no windows.
    One mapInPandas pass, no join, no shuffle; the Python work is a
    strided slice per window over the already-decoded array."""
    if win <= 0 or hop <= 0:
        raise ValueError(f"win and hop must be positive, got {win}/{hop}")
    dec_fn = decoder or decode
    src = clips.select(F.col(id_col).alias("clip_id"),
                       F.col(byte_col).alias("_bytes"),
                       F.col(codec_col).alias("_codec"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ss, bs = [], [], [], []
            payloads = pdf["_bytes"].to_numpy()
            codecs = pdf["_codec"].to_numpy()
            for i, cid in enumerate(pdf["clip_id"]):
                if payloads[i] is None:
                    continue
                pcm = dec_fn(payloads[i], codecs[i])
                if pcm is None or pcm.size < win:
                    continue
                pcm = np.ascontiguousarray(pcm, dtype="<i2")
                n_win = (pcm.size - win) // hop + 1
                # one strided view + ONE contiguous memcpy for all of
                # the clip's windows, then cheap bytes-object slices
                # off that buffer — not n_win numpy slice+tobytes calls
                sw = np.lib.stride_tricks.as_strided(
                    pcm, shape=(n_win, win),
                    strides=(pcm.strides[0] * hop, pcm.strides[0]))
                buf = np.ascontiguousarray(sw).tobytes()
                step = win * 2
                ids.extend([cid] * n_win)
                idxs.extend(range(n_win))
                ss.extend(range(0, n_win * hop, hop))
                bs.extend(buf[o:o + step]
                          for o in range(0, n_win * step, step))
            yield pd.DataFrame({
                "clip_id": ids,
                "codec": ["pcm_s16le"] * len(ids),
                "win_idx": pd.array(idxs, dtype="int32"),
                "win_start": pd.array(ss, dtype="int64"),
                "win_end": pd.array([s + win for s in ss], dtype="int64"),
                "win_bytes": bs})

    return src.mapInPandas(run, _WIN_SCHEMA)
