"""Streaming validation: same suite, streaming source, AvailableNow."""

import pyspark.sql.functions as F

from canned_yaml_spark import fixtures, streaming
from canned_yaml_spark.runner import row_verdicts, row_violations


def test_stream_violations_match_batch(spark, suite, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "viol")
    chk = str(tmp_path / "chk")

    clips = fixtures.clips_df(spark, 400, max_samples=16)
    clips.write.parquet(src)

    stream = (spark.readStream
              .schema(clips.schema)
              .parquet(src))
    q = (streaming.validate_stream(stream, suite, out, chk)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    want = row_violations(clips, suite)
    assert got.count() == want.count()
    key = ["clip_id", "rule_id"]
    assert got.select(*key).exceptAll(want.select(*key)).count() == 0


def test_windowed_verdicts_streaming(spark, suite, tmp_path):
    src = str(tmp_path / "src2")
    out = str(tmp_path / "verd")
    chk = str(tmp_path / "chk2")

    clips = (fixtures.clips_df(spark, 200, max_samples=16)
             .withColumn("ts", F.to_timestamp(
                 F.lit("2026-01-01 00:00:00")) + (F.col("part_id") % 3)
                 * F.expr("INTERVAL 1 MINUTE")))
    # append-mode only emits a window once the watermark passes it, and
    # the watermark only advances between micro-batches — so: ship the
    # data in batch 1, a far-future flush sentinel in batch 2
    # (maxFilesPerTrigger=1 splits them), zero watermark delay.
    clips.coalesce(1).write.parquet(src)
    flush = (fixtures.clips_df(spark, 1, max_samples=16)
             .withColumn("ts", F.to_timestamp(F.lit("2026-01-01 01:00:00"))))
    flush.coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(clips.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    verd = streaming.windowed_verdicts(stream, suite, watermark="0 seconds")
    q = (verd.writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", chk)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = spark.read.parquet(out)
    assert got.count() > 0
    # all three 1-minute windows of real data emitted; the flush
    # sentinel's own window stays withheld
    total = got.agg(F.sum("n_rows")).collect()[0][0]
    assert total == 200
    assert got.filter(~F.col("pass")).count() > 0   # injected defects


def test_running_verdicts_stateful(spark, suite, tmp_path):
    # custom stateful op: running totals across micro-batches must end
    # at the batch-mode totals (maxFilesPerTrigger=1 forces 2 batches)
    src = str(tmp_path / "src3")
    out = str(tmp_path / "run_verd")
    chk = str(tmp_path / "chk3")

    first = fixtures.clips_df(spark, 200, max_samples=16)
    # rows 200..399 = full-corpus minus first-batch rows (a clip_id
    # range filter would drop injected 'CLIP-…' pattern rows)
    second = (fixtures.clips_df(spark, 400, max_samples=16)
              .subtract(first))
    first.coalesce(1).write.parquet(src)
    second.coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(first.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    rv = streaming.running_verdicts(stream, suite)
    # update output mode → parquet (append-only) goes via foreachBatch
    q = (rv.writeStream
         .foreachBatch(lambda df, _: df.write.mode("append").parquet(out))
         .option("checkpointLocation", chk)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = spark.read.parquet(out)
    assert got.count() > 0
    # the LAST update per partition equals the 400-row batch verdict
    last = (got.groupBy("part_id")
               .agg(F.max(F.struct("n_rows", "n_violations", "pass"))
                     .alias("s"))
               .select("part_id", "s.n_rows", "s.n_violations", "s.pass"))
    full = fixtures.clips_df(spark, 400, max_samples=16)
    want = {r.part_id: (r.n_rows, r.n_violations)
            for r in row_verdicts(full, suite).collect()}
    got_map = {r.part_id: (r.n_rows, r.n_violations) for r in last.collect()}
    assert got_map == want
    assert not got.filter("evicted").count()   # nothing timed out here
