"""Full-vocabulary parity: a spec shaped after the reference's richest
schema (ip_allow.schema.json) compiles and validates nested documents
correctly — $ref chains, anyOf, oneOf, enum, items, pattern over a
struct-typed column. The reference's valid fixture
(/root/reference/config.yaml) translates to the 'good' rows here."""

import pytest
from pyspark.sql import types as T

from canned_yaml_spark import compile_spec
from canned_yaml_spark.runner import row_violations

RULE_T = T.StructType([
    T.StructField("apply", T.StringType()),
    T.StructField("range", T.StringType()),
    T.StructField("methods_str", T.StringType()),
    T.StructField("methods_arr", T.ArrayType(T.StringType())),
    T.StructField("port", T.IntegerType()),
])
SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType()),
    T.StructField("part_id", T.IntegerType()),
    T.StructField("rule", RULE_T),
])


@pytest.fixture(scope="module")
def suite(spark):
    return compile_spec("specs/ip_allow_like.spec.yaml", SCHEMA)


def _run(spark, suite, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {(r.clip_id, r.rule_id.split(".")[-1])
            for r in row_violations(df, suite).collect()}


def test_valid_fixture_rows_pass(spark, suite):
    # translation of config.yaml's four valid rules
    rows = [
        ("r1", 0, ("allow", "127.0.0.1", "all", None, 80)),
        ("r2", 0, ("allow", "::1", None, ["m_get", "m_post"], 443)),
        ("r3", 0, ("deny", "0/0", "m_purge", None, 8080)),
        ("r4", 0, ("deny", "::/0", None, ["all"], 1024)),
    ]
    assert _run(spark, suite, rows) == set()


def test_anyof_branches_via_ref(spark, suite):
    rows = [
        ("bad_method", 0, ("allow", "0/0", "DELETE", None, 80)),
        ("bad_elem", 0, ("allow", "0/0", None, ["m_get", "nope"], 80)),
        ("empty_arr", 0, ("allow", "0/0", None, [], 80)),
    ]
    v = _run(spark, suite, rows)
    assert ("bad_method", "anyOf") in v
    assert ("bad_elem", "anyOf") in v
    assert ("empty_arr", "anyOf") in v


def test_enum_action_and_required(spark, suite):
    rows = [
        ("bad_action", 0, ("permit", "0/0", "all", None, 80)),
        ("no_range", 0, ("allow", None, "all", None, 80)),
    ]
    v = _run(spark, suite, rows)
    assert ("bad_action", "enum") in v
    assert ("no_range", "range") in v        # required key


def test_oneof_port_bands(spark, suite):
    rows = [
        ("priv", 0, ("allow", "0/0", "all", None, 80)),
        ("eph", 0, ("allow", "0/0", "all", None, 40000)),
        ("zero", 0, ("allow", "0/0", "all", None, 0)),      # 0 matches
    ]
    v = _run(spark, suite, rows)
    assert ("zero", "oneOf") in v
    assert not any(c == "priv" for c, _ in v)
    assert not any(c == "eph" for c, _ in v)


def test_pattern_on_nested_field(spark, suite):
    rows = [("bad_range", 0, ("allow", "not an ip!", "all", None, 80))]
    assert ("bad_range", "pattern") in _run(spark, suite, rows)
