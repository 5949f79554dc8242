"""Token-packing plan (canned_yaml_spark/pack.py): the two-pass
distributed prefix sum must equal the straight global cumsum."""

import pytest
from pyspark.sql import functions as F

from canned_yaml_spark.pack import pack_offsets


def test_pack_offsets_hand_case(spark):
    docs = spark.createDataFrame(
        [(0, 5), (1, 3), (2, 0), (3, 9), (4, 2), (5, None)],
        "doc_id long, n_tokens int")
    got = {r.doc_id: r for r in
           pack_offsets(docs, budget=8, group_span=2).collect()}
    assert 5 not in got                      # NULL length excluded
    # offsets: 0, 5, 8, 8, 17
    assert [got[i].start_offset for i in range(5)] == [0, 5, 8, 8, 17]
    # doc 0: tokens 0-4 -> bin 0 only
    assert (got[0].first_bin, got[0].last_bin, got[0].n_bins) == (0, 0, 1)
    # doc 1: tokens 5-7 -> bin 0
    assert (got[1].first_bin, got[1].last_bin) == (0, 0)
    # doc 2: zero-length -> spans nothing
    assert (got[2].first_bin, got[2].last_bin, got[2].n_bins) \
        == (None, None, 0)
    # doc 3: tokens 8-16 -> bins 1-2 (straddles the 16 boundary)
    assert (got[3].first_bin, got[3].last_bin, got[3].n_bins) == (1, 2, 2)
    # doc 4: tokens 17-18 -> bin 2
    assert (got[4].first_bin, got[4].last_bin) == (2, 2)


def test_pack_offsets_equals_global_cumsum(spark):
    # the decomposition must be EXACTLY the single-window definition,
    # across group boundaries and with sparse/duplicate-free ids
    docs = spark.range(0, 500).select(
        (F.col("id") * 7).alias("doc_id"),          # sparse ids
        ((F.col("id") * 2654435761) % 977).cast("int").alias("n_tokens"))
    got = pack_offsets(docs, budget=512, group_span=64)
    from pyspark.sql import Window
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    want = docs.select(
        "doc_id", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        .alias("start_offset"))
    joined = got.join(want.withColumnRenamed("start_offset", "want_off"),
                      on="doc_id")
    assert joined.filter(F.col("start_offset") != F.col("want_off")) \
                 .count() == 0
    assert got.count() == 500


def test_pack_offsets_validation(spark):
    docs = spark.createDataFrame([(1, 1)], "doc_id long, n_tokens int")
    with pytest.raises(ValueError):
        pack_offsets(docs, budget=0)
    with pytest.raises(ValueError):
        pack_offsets(docs, budget=8, group_span=0)
