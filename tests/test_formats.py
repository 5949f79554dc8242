"""draft-07 `format` assertion profile (canned_yaml_spark/formats.py).

The core property: each format's predicate, hand-labeled on a curated
valid/invalid corpus, evaluates identically in Spark (Column) and
DuckDB (oracle SQL fragment) — the two renderings of the one
definition can never drift apart silently.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from canned_yaml_spark import formats
from canned_yaml_spark.compile import compile_spec

# hand-labeled: format -> (valid values, invalid values)
CASES = {
    "ipv4": (
        ["0.0.0.0", "255.255.255.255", "192.168.1.1", "9.9.9.9",
         "1.22.133.244"],
        ["256.1.1.1", "01.2.3.4", "1.2.3", "1.2.3.4.5", "1.2.3.a",
         "1.2.3.", "", " 1.2.3.4"],
    ),
    "ipv6": (
        ["::", "::1", "2001:db8::8a2e:370:7334", "fe80::1",
         "2001:0db8:0000:0000:0000:ff00:0042:8329",
         "::ffff:192.168.1.1", "::ffff:0:192.168.1.1",
         "1:2:3:4:5:6:7:8", "1:2:3:4:5:6:192.168.1.1",
         "1::192.168.1.1", "1:2:3:4:5:6:7::"],
        ["1:2:3:4:5:6:7:8:9", "12345::", ":::", "1::2::3",
         "02001:db8::1", "fe80::1%eth0", "1:2:3:4:5:6:7",
         "::ffff:256.1.1.1", ""],
    ),
    "uuid": (
        ["123e4567-e89b-12d3-a456-426614174000",
         "00000000-0000-0000-0000-000000000000",
         "ABCDEF01-2345-6789-abcd-ef0123456789"],
        ["123e4567e89b12d3a456426614174000",
         "123e4567-e89b-12d3-a456-42661417400g",
         "123e4567-e89b-12d3-a456-4266141740001",
         "123e4567-e89b-12d3-a456-42661417400", ""],
    ),
    "date": (
        ["2024-02-29", "1999-12-31", "2000-02-29", "1970-01-01",
         "2023-04-30"],
        ["2023-02-29", "1900-02-29", "2024-13-01", "2024-00-10",
         "2024-04-31", "24-01-01", "2024-1-1", "2024-01-00",
         "2024-01-32", ""],
    ),
    "time": (
        ["23:59:60Z", "00:00:00+00:00", "12:30:45.123z",
         "12:30:45-05:00", "12:30:45Z"],
        ["24:00:00Z", "12:60:00Z", "12:30:45", "12:30:45+24:00",
         "12:30:61Z", "1:30:45Z", ""],
    ),
    "date-time": (
        ["2024-02-29T12:30:45Z", "1985-04-12t23:20:50.52z",
         "1990-12-31T15:59:60-08:00"],
        ["2023-02-29T12:00:00Z", "2024-01-01 12:00:00Z",
         "2024-01-01T12:00:00", "2024-01-01", ""],
    ),
    "hostname": (
        ["example.com", "a", "foo-bar.baz", "xn--d1acufc.xn--p1ai",
         "a.b.c.d.e", "a" * 63 + ".com", ("a." * 60) + "com"],
        ["-foo.com", "foo-.com", "foo..com", "foo_bar.com",
         "a" * 64 + ".com", ("ab." * 85) + "com", ".foo.com", ""],
    ),
    "email": (
        ["joe@example.com", "a.b+c_d%e-f@sub.domain.org",
         "x@y.zz"],
        ["joe@localhost", "@example.com", "joe@", "joe@-bad.com",
         "jo e@example.com", "a" * 65 + "@example.com",
         "joe@example..com", ""],
    ),
    "uri": (
        ["https://example.com/a%20b?x=1#frag", "mailto:joe@example.com",
         "urn:isbn:0451450523", "ftp://ftp.is.co.za/rfc/rfc1808.txt",
         "scheme+x.y-z:"],
        ["example.com", "http://exa mple.com", "http://example.com/%zz",
         "1http://x", "://x", "", "/relative/path"],
    ),
    "json-pointer": (
        ["", "/foo/0", "/a~0b/c~1d", "/", "//", "/ "],
        ["foo", "/a~2b", "/a~", "~1"],
    ),
    "duration": (
        ["P1Y2M3DT4H5M6S", "P3W", "PT0.5S", "P1D", "PT1M", "P1Y",
         "PT36H"],
        ["P", "PT", "P1YT", "1Y", "P1S", "P-1D", "P1.5Y", "P3W1D",
         ""],
    ),
}


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@pytest.mark.parametrize("fmt", sorted(CASES))
def test_format_parity_spark_duckdb_handlabels(spark, duck, fmt):
    valid, invalid = CASES[fmt]
    vals = valid + invalid
    want = [True] * len(valid) + [False] * len(invalid)

    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got_spark = [
        r.ok for r in df.select(
            F.coalesce(formats.format_ok_column(fmt, F.col("v")),
                       F.lit(False)).alias("ok")).collect()]
    assert got_spark == want, (
        f"{fmt} spark: " + str([(v, g, w) for v, g, w
                                in zip(vals, got_spark, want) if g != w]))

    frag = formats.format_ok_sql(fmt, "v")
    got_duck = [
        duck.execute("SELECT COALESCE(" + frag + ", FALSE) "
                     "FROM (SELECT ?::VARCHAR AS v)", [v]).fetchone()[0]
        for v in vals]
    assert got_duck == want, (
        f"{fmt} duckdb: " + str([(v, g, w) for v, g, w
                                 in zip(vals, got_duck, want) if g != w]))


def test_format_annotation_only_by_default(spark):
    suite = compile_spec(
        {"type": "object",
         "properties": {"v": {"format": "ipv4"}}},
        spark.createDataFrame([("x",)], "v string").schema)
    assert not suite.row_checks
    assert any("annotation-only" in w for w in suite.warnings)


def test_format_asserts_when_opted_in(spark):
    df = spark.createDataFrame(
        [("1.2.3.4",), ("999.2.3.4",), (None,)], "v string")
    suite = compile_spec(
        {"type": "object", "x-assert-formats": True,
         "properties": {"v": {"format": "ipv4"}}}, df.schema)
    (check,) = suite.row_checks
    assert check.rule_id == "properties.v.format"
    bad = df.filter(check.violation).collect()
    # NULL is absent-not-validated (required covers presence)
    assert [r.v for r in bad] == ["999.2.3.4"]


def test_format_unknown_name_ignored_with_warning(spark):
    suite = compile_spec(
        {"type": "object", "x-assert-formats": True,
         "properties": {"v": {"format": "regex"}}},
        spark.createDataFrame([("x",)], "v string").schema)
    assert not suite.row_checks
    assert any("unknown format" in w for w in suite.warnings)


def test_format_on_non_string_statically_passes(spark):
    suite = compile_spec(
        {"type": "object", "x-assert-formats": True,
         "properties": {"n": {"format": "ipv4"}}},
        spark.createDataFrame([(1,)], "n int").schema)
    assert not suite.row_checks
    assert any("non-string" in w for w in suite.warnings)


def test_format_non_string_spec_value_raises(spark):
    from canned_yaml_spark.errors import SpecError
    with pytest.raises(SpecError):
        compile_spec({"type": "object",
                      "properties": {"v": {"format": 7}}},
                     spark.createDataFrame([("x",)], "v string").schema)


def test_format_parity_fuzz_spark_vs_duckdb(spark, duck):
    # dialect-drift guard: on ~600 adversarial strings (seeded PRNG
    # mutations of valid examples + random charset soup), Spark's Java
    # regex and DuckDB's RE2 must agree for EVERY format — no hand
    # labels, pure engine agreement. Any Java/RE2 semantic divergence
    # in the regex subset formats.py promises would surface here.
    import random
    rng = random.Random(42)
    alphabet = list("abcdef0123456789.:-TZ+%/~@ PYMDHSW")
    pool = []
    for valid, invalid in CASES.values():
        pool += valid + invalid
    vals = []
    for s in pool:
        vals.append(s)
        if s:
            # single-char mutation, deletion, duplication
            i = rng.randrange(len(s))
            vals.append(s[:i] + rng.choice(alphabet) + s[i + 1:])
            vals.append(s[:i] + s[i + 1:])
            vals.append(s + s[i])
    for _ in range(120):
        vals.append("".join(rng.choice(alphabet)
                            for _ in range(rng.randrange(1, 40))))
    vals = sorted(set(vals))

    df = spark.createDataFrame([(v,) for v in vals], "v string")
    sel = [F.coalesce(formats.format_ok_column(f, F.col("v")),
                      F.lit(False)).alias(f"f{i}")
           for i, f in enumerate(sorted(formats.FORMATS))]
    spark_rows = {r[0]: r[1:] for r in
                  df.select("v", *sel).collect()}

    frags = ", ".join(
        "COALESCE(" + formats.format_ok_sql(f, "v") + ", FALSE)"
        for f in sorted(formats.FORMATS))
    for v in vals:
        duck_row = tuple(duck.execute(
            f"SELECT {frags} FROM (SELECT ?::VARCHAR AS v)",
            [v]).fetchone())
        assert duck_row == spark_rows[v], (
            f"engine disagreement on {v!r}: "
            f"duck={duck_row} spark={spark_rows[v]} "
            f"(formats={sorted(formats.FORMATS)})")
