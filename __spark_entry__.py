"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship validation over /root/testdata/sf0.001.
queries()      — one entry per implemented operator (SURVEY.md §2),
                 each run against the deterministic clips corpus derived
                 from the sf dir's orders table (derive.py — bit-identical
                 in Spark and DuckDB by construction).
oracle_sql()   — independent DuckDB re-statements of the same semantics
                 (canned_yaml_spark/oracle.py), so agreement genuinely
                 cross-checks the engine.

Non-SQL-expressible ops (Arrow payload decode, KS applyInPandas) have
queries() entries without oracle entries → rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from canned_yaml_spark import compile_spec, dataset, derive, drift, fixtures
from canned_yaml_spark import oracle, payload
from canned_yaml_spark.runner import row_verdicts, row_violations

SPEC = "specs/clips.spec.yaml"
_VCOLS = ["clip_id", "part_id", "rule_id", "severity"]


def _suite(spark: SparkSession, clips: DataFrame):
    return compile_spec(SPEC, clips.schema)


# ------------------------------------------------------------- flagship
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full row-level constraint suite over the sf0.001 corpus,
    returning per-partition verdicts (the reference's verdict lifted to
    partitions, canner.cc:1101)."""
    clips = derive.clips_df(spark, "/root/testdata/sf0.001")
    suite = _suite(spark, clips)
    return row_verdicts(clips, suite)


# -------------------------------------------------------------- queries
def _q_row_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    clips = derive.clips_df(spark, sf_dir)
    return row_violations(clips, _suite(spark, clips)).select(*_VCOLS)


def _q_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    clips = derive.clips_df(spark, sf_dir)
    return row_verdicts(clips, _suite(spark, clips))


def _q_duplicate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    clips = derive.clips_df(spark, sf_dir)
    return dataset.duplicate_keys(clips, _suite(spark, clips).unique_checks[0])


def _q_unique_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    clips = derive.clips_df(spark, sf_dir)
    uc = _suite(spark, clips).unique_checks[0]
    return dataset.unique_violations(clips, uc).select(*_VCOLS)


def _q_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    clips = derive.clips_df(spark, sf_dir)
    rc = _suite(spark, clips).ref_checks[0]
    dim = derive.codec_dim_df(spark)
    return dataset.referential_violations(clips, dim, rc).select(*_VCOLS)


def _q_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    clips = derive.clips_df(spark, sf_dir)
    return dataset.column_stats_exact(clips, ["sr_hz", "dur_ms"])


def _q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    clips = derive.clips_df(spark, sf_dir)
    dc = _suite(spark, clips).drift_checks[0]
    exp = fixtures.reference_hist_df(spark)
    return (drift.psi_per_partition(clips, dc, exp)
            .select("part_id", F.round("psi", 4).alias("psi")))


def _q_oneof(spark: SparkSession, sf_dir: str) -> DataFrame:
    clips = derive.clips_df(spark, sf_dir)
    spec = {"type": "object", "properties": {"dur_ms": {"oneOf": [
        {"minimum": 200, "maximum": 5000},
        {"minimum": 4000, "maximum": 10000},
        {"minimum": 15000},
    ]}}}
    suite = compile_spec(spec, clips.schema)
    return row_violations(clips, suite).select(*_VCOLS)


def _q_anyof(spark: SparkSession, sf_dir: str) -> DataFrame:
    clips = derive.clips_df(spark, sf_dir)
    spec = {"type": "object", "properties": {"transcript": {"anyOf": [
        {"pattern": "^alpha"}, {"minLength": 10},
    ]}}}
    suite = compile_spec(spec, clips.schema)
    return row_violations(clips, suite).select(*_VCOLS)


def _q_type_duck(spark: SparkSession, sf_dir: str) -> DataFrame:
    # duck-typed 'integer' on a string staging column
    # (canner.cc:1068-1079 full-parse semantics)
    clips = derive.clips_df(spark, sf_dir)
    staged = (clips
              .filter(F.col("clip_id").rlike(oracle.CLIP_PATTERN))
              .select("clip_id", "part_id",
                      F.when(F.substring("clip_id", 6, 10).cast("long") % 4 == 0,
                             F.lit("42"))
                       .when(F.substring("clip_id", 6, 10).cast("long") % 4 == 1,
                             F.lit(" +7 "))
                       .when(F.substring("clip_id", 6, 10).cast("long") % 4 == 2,
                             F.lit("3.14"))
                       .otherwise(F.lit("abc")).alias("val")))
    spec = {"type": "object", "properties": {"val": {"type": "integer"}}}
    suite = compile_spec(spec, staged.schema)
    return row_violations(staged, suite).select(*_VCOLS)


def _q_salted_codec_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    clips = derive.clips_df(spark, sf_dir)
    return dataset.salted_group_count(clips, "codec").select("codec", "n")


# --- non-SQL-expressible (rows-only checks by the driver) -------------
def _q_payload_snr(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Arrow-vectorized payload decode + SNR vs reference (input_hint);
    # binary audio isn't derivable in SQL → fixture corpus, rows-only.
    clips = fixtures.clips_df(spark, 2000)
    ref = fixtures.clips_ref_df(spark, 2000)
    suite = compile_spec(SPEC, clips.schema)
    return (payload.payload_violations(clips, ref, suite.payload_checks[0])
            .select(*_VCOLS))


def _q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    clips = derive.clips_df(spark, sf_dir)
    dc = _suite(spark, clips).drift_checks[0]
    return (drift.ks_per_partition(clips, dc, fixtures.reference_dur_sample())
            .select("part_id", F.round("ks_stat", 4).alias("ks_stat"), "n"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "row_violations": _q_row_violations,
        "verdicts": _q_verdicts,
        "duplicate_keys": _q_duplicate_keys,
        "unique_violations": _q_unique_violations,
        "referential": _q_referential,
        "column_stats": _q_column_stats,
        "drift_psi": _q_drift_psi,
        "oneof": _q_oneof,
        "anyof": _q_anyof,
        "type_duck": _q_type_duck,
        "salted_codec_counts": _q_salted_codec_counts,
        "payload_snr": _q_payload_snr,   # rows-only (binary payloads)
        "ks_drift": _q_ks_drift,         # rows-only (applyInPandas)
    }


def oracle_sql() -> dict[str, str]:
    return {
        "row_violations": oracle.sql_row_violations(),
        "verdicts": oracle.sql_verdicts(),
        "duplicate_keys": oracle.sql_duplicate_keys(),
        "unique_violations": oracle.sql_unique_violations(),
        "referential": oracle.sql_referential_violations(),
        "column_stats": oracle.sql_column_stats(),
        "drift_psi": oracle.sql_drift_psi(),
        "oneof": oracle.sql_oneof_violations(),
        "anyof": oracle.sql_anyof_violations(),
        "type_duck": oracle.sql_type_duck(),
        "salted_codec_counts": oracle.sql_salted_codec_counts(),
    }
