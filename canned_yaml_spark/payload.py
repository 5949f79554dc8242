"""Payload validation: decode audio bytes, assert SNR + transcript equality.

input_hint per-row invariant: decoded-PCM allclose (SNR ≥ 30 dB) +
transcript equality against the per-clip reference. This is the only
place the engine crosses the JVM→Python boundary on the data path, and
it does so through Arrow batches (mapInPandas) — never row-at-a-time
Python UDFs.

Scale shape: clips ⋈ clips_ref is a key-equi join on clip_id. At
10^12 rows both sides are large → sort-merge join on clip_id; with
both tables bucketed by clip_id at write time the shuffle disappears
entirely (storage-side co-location). The Arrow batch size is bounded
by spark.sql.execution.arrow.maxRecordsPerBatch so executor memory
holds batch × payload, not partition × payload.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from canned_yaml_spark.audio import decode, has_decoder, snr_db
from canned_yaml_spark.checks import PayloadCheck

_OUT_SCHEMA = ("clip_id string, part_id int, rule_id string, "
               "severity int, message string")


def payload_violations(clips: DataFrame, clips_ref: DataFrame,
                       check: PayloadCheck,
                       id_col: str = "clip_id",
                       part_col: str = "part_id") -> DataFrame:
    """Long-form violation rows for payloads failing decode/SNR/transcript.

    clips_ref: (clip_id, pcm_ref binary — little-endian PCM16,
    transcript_ref string). Output has one row per failed clip with
    the failure mode in the message.
    """
    rule_id = check.rule_id
    severity = int(check.severity)
    snr_min = float(check.snr_db_min)
    byte_col = check.column

    joined = clips.select(
        F.col(id_col).alias("clip_id"),
        F.col(part_col).alias("part_id"),
        F.col(byte_col).alias("_bytes"),
        F.col("codec").alias("_codec"),
        F.col("transcript").alias("_transcript"),
    ).join(
        # SHUFFLE_HASH: a sort-merge join would sort 2×payload-sized
        # rows per partition; hashing only the (bounded) ref side is
        # strictly cheaper for payload-carrying joins. With both tables
        # bucketed by clip_id at write time (Iceberg/bucketed parquet)
        # the exchange disappears entirely.
        clips_ref.select(
            F.col("clip_id"),
            F.col("pcm_ref").alias("_pcm_ref"),
            F.col("transcript_ref").alias("_transcript_ref"),
        ).hint("SHUFFLE_HASH"),
        "clip_id", "inner",
    )

    # Identity-codec fast path, evaluated JVM-side BEFORE the Arrow
    # boundary: for pcm_s16le (the ~0.70 hot codec) a bit-exact payload
    # is SNR=+inf by definition, so byte equality proves the check.
    # Payloads of fast-path rows are nulled out here, which cuts the
    # JVM→Python Arrow transfer by the hot-codec fraction — at 10^12
    # rows that transfer, not the numpy math, is the payload check's
    # bottleneck.
    fast_ok = (F.col("_codec") == F.lit("pcm_s16le")) & \
        F.col("_bytes").isNotNull() & \
        (F.col("_bytes") == F.col("_pcm_ref"))
    joined = joined.select(
        "clip_id", "part_id", "_codec", "_transcript", "_transcript_ref",
        fast_ok.alias("_fast_ok"),
        F.when(~fast_ok, F.col("_bytes")).alias("_bytes"),
        F.when(~fast_ok, F.col("_pcm_ref")).alias("_pcm_ref"),
    )

    def check_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_part, out_msg = [], [], []
            codecs = pdf["_codec"].to_numpy()
            ids = pdf["clip_id"].to_numpy()
            parts = pdf["part_id"].to_numpy()
            payloads = pdf["_bytes"].to_numpy()
            refs = pdf["_pcm_ref"].to_numpy()
            ts = pdf["_transcript"].to_numpy()
            ts_ref = pdf["_transcript_ref"].to_numpy()
            fast = pdf["_fast_ok"].to_numpy()
            for i in range(len(pdf)):
                msgs = []
                if fast[i]:
                    t, tr = ts[i], ts_ref[i]
                    if (t is None) != (tr is None) or \
                            (t is not None and t != tr):
                        out_id.append(ids[i])
                        out_part.append(parts[i])
                        out_msg.append("transcript differs from reference")
                    continue
                ref_pcm = (np.frombuffer(refs[i], dtype="<i2")
                           if refs[i] is not None else np.zeros(0, "<i2"))
                if has_decoder(codecs[i]):
                    dec = decode(payloads[i], codecs[i]) \
                        if payloads[i] is not None else None
                    if dec is None:
                        msgs.append(f"payload undecodable as {codecs[i]}")
                    else:
                        s = snr_db(ref_pcm, dec)
                        if not s >= snr_min:
                            msgs.append(
                                f"SNR {s:.1f} dB < {snr_min:.1f} dB "
                                f"(decoded {dec.size} vs reference "
                                f"{ref_pcm.size} samples)")
                t, tr = ts[i], ts_ref[i]
                if (t is None) != (tr is None) or (t is not None and t != tr):
                    msgs.append("transcript differs from reference")
                for m in msgs:
                    out_id.append(ids[i])
                    out_part.append(parts[i])
                    out_msg.append(m)
            yield pd.DataFrame({
                "clip_id": out_id,
                "part_id": pd.array(out_part, dtype="int32"),
                "rule_id": rule_id,
                "severity": pd.array([severity] * len(out_id), dtype="int32"),
                "message": out_msg,
            })

    return joined.mapInPandas(check_batches, _OUT_SCHEMA)


def payload_snr_stats(clips: DataFrame, clips_ref: DataFrame,
                      check: PayloadCheck,
                      part_col: str = "part_id") -> DataFrame:
    """Per-partition SNR profile (metrics table support): decode all
    payloads, aggregate min/avg SNR and decode-failure count."""
    joined = clips.select(
        F.col("clip_id"), F.col(part_col).alias("part_id"),
        F.col(check.column).alias("_bytes"), F.col("codec").alias("_codec"),
    ).join(clips_ref.select("clip_id", F.col("pcm_ref").alias("_pcm_ref")),
           "clip_id", "inner")

    def snr_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parts, snrs, fails = [], [], []
            for i in range(len(pdf)):
                ref = np.frombuffer(pdf["_pcm_ref"].iat[i], dtype="<i2")
                dec = decode(pdf["_bytes"].iat[i], pdf["_codec"].iat[i])
                parts.append(int(pdf["part_id"].iat[i]))
                s = snr_db(ref, dec)
                snrs.append(np.nan if not np.isfinite(s) else s)
                fails.append(int(dec is None))
            yield pd.DataFrame({"part_id": pd.array(parts, dtype="int32"),
                                "snr": snrs,
                                "decode_fail": pd.array(fails, dtype="int32")})

    per_row = joined.mapInPandas(
        snr_batches, "part_id int, snr double, decode_fail int")
    return (per_row.groupBy("part_id")
            .agg(F.count(F.lit(1)).alias("n_payloads"),
                 F.min("snr").alias("snr_min"),
                 F.avg("snr").alias("snr_avg"),
                 F.sum("decode_fail").alias("n_decode_fail")))
