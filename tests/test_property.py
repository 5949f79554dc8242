"""Property-based tests (SURVEY.md §5 item 3, hypothesis):

generated specs × generated rows, cross-checked against an independent
pure-Python reference evaluator. Invariants:
- a row violating k checks yields exactly k violation rows;
- verdict == (no ERROR-severity violation);
- NULL values violate only `required`.
"""

import re

import hypothesis.strategies as st
import pytest
from hypothesis import HealthCheck, given, settings
from pyspark.sql import types as T

from canned_yaml_spark import compile_spec
from canned_yaml_spark.runner import row_violations

# ------------------------------------------------------- spec strategy
int_spec = st.fixed_dictionaries(
    {},
    optional={
        "minimum": st.integers(-100, 50),
        "maximum": st.integers(51, 200),
        "enum": st.lists(st.integers(-100, 200), min_size=1, max_size=5,
                         unique=True),
    })

str_spec = st.fixed_dictionaries(
    {},
    optional={
        "minLength": st.integers(0, 3),
        "maxLength": st.integers(4, 10),
        "pattern": st.sampled_from([r"^a", r"b$", r"^[a-c]+$"]),
        "enum": st.lists(st.text(alphabet="abc", min_size=1, max_size=4),
                         min_size=1, max_size=4, unique=True),
    })

spec_strategy = st.fixed_dictionaries({
    "type": st.just("object"),
    "required": st.lists(st.sampled_from(["i", "s"]), unique=True),
    "properties": st.fixed_dictionaries({"i": int_spec, "s": str_spec}),
})

row_strategy = st.tuples(
    st.one_of(st.none(), st.integers(-150, 250)),
    st.one_of(st.none(), st.text(alphabet="abcd", min_size=0, max_size=12)),
)


# ------------------------------------------- pure-Python reference
def ref_violations(spec: dict, i, s) -> set[str]:
    out = set()
    for col, val in (("i", i), ("s", s)):
        if col in spec.get("required", []) and val is None:
            out.add(f"required.{col}")
        if val is None:
            continue
        node = spec["properties"][col]
        p = f"properties.{col}"
        if "minimum" in node and val < node["minimum"]:
            out.add(f"{p}.minimum")
        if "maximum" in node and val > node["maximum"]:
            out.add(f"{p}.maximum")
        if "minLength" in node and len(val) < node["minLength"]:
            out.add(f"{p}.minLength")
        if "maxLength" in node and len(val) > node["maxLength"]:
            out.add(f"{p}.maxLength")
        if "pattern" in node and not re.search(node["pattern"], val):
            out.add(f"{p}.pattern")
        if "enum" in node and val not in node["enum"]:
            out.add(f"{p}.enum")
    return out


SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType()),
    T.StructField("part_id", T.IntegerType()),
    T.StructField("i", T.LongType()),
    T.StructField("s", T.StringType()),
])


@pytest.mark.usefixtures("spark")
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(spec=spec_strategy,
       rows=st.lists(row_strategy, min_size=1, max_size=6))
def test_engine_matches_reference(spark, spec, rows):
    suite = compile_spec(spec, SCHEMA)
    data = [(f"r{k}", k % 4, i, s) for k, (i, s) in enumerate(rows)]
    df = spark.createDataFrame(data, SCHEMA)
    got: dict[str, set] = {}
    for r in row_violations(df, suite).collect():
        got.setdefault(r.clip_id, set()).add(r.rule_id)
    for k, (i, s) in enumerate(rows):
        want = ref_violations(spec, i, s)
        assert got.get(f"r{k}", set()) == want, \
            f"row {k} (i={i!r}, s={s!r}) spec={spec}"


# ----------------------------------------------- XXH64-in-SQL property
@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.text(min_size=0, max_size=10).filter(
        lambda s: 0 < len(s.encode("utf-8")) < 32 or s == ""),
    min_size=1, max_size=20, unique=True))
def test_xxh64_sql_matches_spark_property(spark, strings):
    """Property: the oracle's XXH64 restatement (oracle.xxh64_stages)
    equals Spark's F.xxhash64 for ARBITRARY strings in the documented
    domain (UTF-8 length < 32) — hypothesis explores code points,
    lengths, and multi-byte boundaries the fixed-case test can't."""
    import duckdb
    from pyspark.sql import functions as F

    from canned_yaml_spark import oracle

    strings = [s for s in strings if len(s.encode("utf-8")) < 32]
    if not strings:
        return
    got = {r.s: r.h for r in spark.createDataFrame(
        [(s,) for s in strings], "s string")
        .select("s", F.xxhash64("s").alias("h")).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE tok (w VARCHAR)")
    con.executemany("INSERT INTO tok VALUES (?)", [(s,) for s in strings])
    ctes, final = oracle.xxh64_stages("tbytes")
    rows = con.execute(f"""
WITH tb AS (SELECT w, hex(encode(w)) AS hx,
                   CAST(octet_length(encode(w)) AS BIGINT) AS n FROM tok),
tbytes AS (
  SELECT w, n,
         list_transform(range(0, n), i ->
           ((strpos('0123456789ABCDEF',
                    substring(hx, CAST(2*i+1 AS INT), 1)) - 1) * 16
            + strpos('0123456789ABCDEF',
                     substring(hx, CAST(2*i+2 AS INT), 1)) - 1
           )::HUGEINT) AS bs
  FROM tb),
{ctes}
SELECT w, h_final FROM {final}
""").fetchall()
    for w, h in rows:
        h = int(h)
        signed = h - (1 << 64) if h >= (1 << 63) else h
        assert signed == got[w], repr(w)


# ----------------------- partition-scoped rule families vs pure pandas
part_rows = st.lists(
    st.tuples(st.integers(0, 3),                       # part_id
              st.one_of(st.none(), st.integers(0, 30)),    # v (measure)
              st.one_of(st.none(),
                        st.sampled_from(["a", "b", "c"]))),  # cat
    min_size=1, max_size=40)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=part_rows)
def test_completeness_frequency_match_pandas(spark, rows):
    """partition_completeness / partition_frequency vs a pure-pandas
    reference on arbitrary partitioned data — exact ratios, NULL
    exclusion, and the (count, value)-max tie-break."""
    import pandas as pd

    from canned_yaml_spark import dataset
    from canned_yaml_spark.checks import CompletenessCheck, FrequencyCheck

    df = spark.createDataFrame(rows, "part_id int, v int, cat string")
    pdf = pd.DataFrame(rows, columns=["part_id", "v", "cat"])

    comp = dataset.partition_completeness(
        df, [CompletenessCheck("r", "cat", 0.25)]).toPandas() \
        .set_index("part_id")
    for pid, g in pdf.groupby("part_id"):
        frac = g["cat"].isna().mean()
        assert comp.loc[pid, "null_frac"] == pytest.approx(frac, abs=5e-7)
        assert bool(comp.loc[pid, "breach"]) == (frac > 0.25)

    freq = dataset.partition_frequency(
        df, FrequencyCheck("r", "cat", max_share=0.5, min_distinct=2)) \
        .toPandas().set_index("part_id")
    for pid, g in pdf.groupby("part_id"):
        vals = g["cat"].dropna()
        if vals.empty:
            assert pid not in freq.index
            continue
        counts = vals.value_counts()
        mc = counts.max()
        # engine tie-break: max count, then max value
        top = max(v for v, c in counts.items() if c == mc)
        share = mc / len(vals)
        assert freq.loc[pid, "top_value"] == top
        assert freq.loc[pid, "top_share"] == pytest.approx(share, abs=5e-7)
        assert freq.loc[pid, "n_distinct"] == counts.size
        assert bool(freq.loc[pid, "breach"]) == (
            share > 0.5 or counts.size < 2)
