"""Cross-engine identity: the derived clips corpus must be bit-identical
between Spark SQL and DuckDB (the oracle-gate backbone)."""

import duckdb
import pytest

from canned_yaml_spark import derive

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def both(spark):
    sdf = derive.clips_df(spark, SF_DIR).orderBy("clip_id", "sr_hz") \
        .toPandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"parquet_scan('{SF_DIR}/orders.parquet')")
    ddf = con.execute(
        f"WITH {derive.clips_duckdb_cte()} SELECT * FROM clips "
        f"ORDER BY clip_id, sr_hz").fetchdf().reset_index(drop=True)
    return sdf, ddf


def test_same_shape(both):
    sdf, ddf = both
    assert len(sdf) == len(ddf) > 0
    assert list(sdf.columns) == list(ddf.columns)


def test_identical_values(both):
    sdf, ddf = both
    for c in sdf.columns:
        a, b = sdf[c], ddf[c]
        if a.dtype == object:
            assert (a.fillna("\0") == b.fillna("\0")).all(), c
        else:
            assert (a.astype("int64") == b.astype("int64")).all(), c


def test_injections_present(both):
    sdf, _ = both
    assert (sdf.codec == "wav").sum() > 0
    assert (sdf.codec == "vorbis").sum() > 0
    assert sdf.transcript.isna().sum() > 0
    assert (len(sdf) - sdf.clip_id.nunique()) > 0
    assert sdf.clip_id.str.match(r"^CLIP-").sum() > 0


def test_codec_skew(both):
    sdf, _ = both
    frac = (sdf.codec == "pcm_s16le").mean()
    assert 0.6 < frac < 0.8  # the 0.70 hot key (FIXTURES.md)


# ---------------------------------------------------- nested corpus
@pytest.fixture(scope="module")
def both_nested(spark):
    sdf = derive.clips_nested_df(spark, SF_DIR).drop("meta") \
        .orderBy("clip_id").toPandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"parquet_scan('{SF_DIR}/orders.parquet')")
    ddf = con.execute(
        f"WITH {derive.clips_nested_duckdb_cte()} SELECT * EXCLUDE (meta) "
        f"FROM clips_nested ORDER BY clip_id").fetchdf() \
        .reset_index(drop=True)
    return sdf, ddf


def _canon_list(a):
    return "|".join("<N>" if x is None else str(x) for x in a)


def _canon_map(m):
    # Spark toPandas gives a plain dict; DuckDB fetchdf gives the
    # columnar {'key': [...], 'value': [...]} representation
    if set(m.keys()) == {"key", "value"} and isinstance(m["key"], list):
        pairs = zip(m["key"], m["value"])
    else:
        pairs = m.items()
    return "|".join(f"{k}={v}" for k, v in sorted(pairs))


def test_nested_identical(both_nested):
    sdf, ddf = both_nested
    assert len(sdf) == len(ddf) > 0
    assert list(sdf.columns) == list(ddf.columns)
    for c in sdf.columns:
        a, b = sdf[c], ddf[c]
        if c in ("tags", "pair"):
            assert (a.apply(_canon_list) == b.apply(_canon_list)).all(), c
        elif c == "attrs":
            assert (a.apply(_canon_map) == b.apply(_canon_map)).all(), c
        elif a.dtype == object:
            assert (a.fillna("\0") == b.fillna("\0")).all(), c
        else:
            assert (a.astype("int64") == b.astype("int64")).all(), c


def test_nested_injections_present(both_nested):
    sdf, _ = both_nested
    lens = sdf.tags.apply(len)
    assert (lens == 0).sum() > 0          # minItems injection
    assert (lens == 5).sum() > 0          # maxItems injection
    assert sdf.tags.apply(lambda t: "BAD42" in list(t)).sum() > 0
    assert sdf.tags.apply(lambda t: any(x is None for x in t)).sum() > 0
    assert (sdf.val_num == "abc").sum() > 0
    assert (sdf.val_bool == "yes").sum() > 0
    assert sdf.pair.apply(lambda p: str(p[0]).startswith("x")).sum() > 0
    assert sdf.pair.apply(lambda p: p[1] == "maybe").sum() > 0
    # attrs map injections (draft-07 object-keyword corpus): empty map
    # (minProperties), 4-key map (maxProperties), bad key (propertyNames)
    nkeys = sdf["attrs"].apply(len)   # NB: sdf.attrs is pandas metadata
    assert (nkeys == 0).sum() > 0
    assert (nkeys == 4).sum() > 0
    assert sdf["attrs"].apply(lambda m: "Bad Key!" in m).sum() > 0
