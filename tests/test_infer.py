"""Spec inference (infer.py): profile decisions, value formats, the
pattern template mechanics, and the round-trip guarantee — the inferred
spec compiled over the profiled table yields zero ERROR violations."""

from __future__ import annotations

import pytest

from canned_yaml_spark import infer
from canned_yaml_spark.compile import compile_spec
from canned_yaml_spark.runner import row_violations


# ------------------------------------------------------ template unit
@pytest.mark.parametrize("value, want", [
    ("clip_0000000001", r"^clip_\d+$"),
    ("u-12.3x", r"^u\-\d+\.\d+x$"),
    ("42", r"^\d+$"),
    ("nodigits", None),          # trivial template matches only itself
    ("", None),
])
def test_regex_template(value, want):
    assert infer.regex_template(value) == want


def test_completeness_budget_integer_ceil():
    assert infer.completeness_budget(0, 100) == 0.0
    assert infer.completeness_budget(1, 80) == 0.025      # 2/80 exact
    assert infer.completeness_budget(1, 3) == 0.6667      # ceil up
    assert infer.completeness_budget(99, 100) == 1.0      # capped
    assert infer.completeness_budget(5, 0) == 0.0


# ------------------------------------------------------------ profile
@pytest.fixture(scope="module")
def table(spark):
    rows = [
        ("u_001", "red", 10, None),
        ("u_002", "red", 20, "x"),
        ("u_003", "blue", 30, "y"),
        ("u_010", "red", 40, "z"),
    ]
    df = spark.createDataFrame(
        rows, "uid string, color string, score int, note string")
    df = df.cache()
    df.count()
    return df


def test_profile_decisions(table):
    by_col = {p.column: p for p in infer.profile(table, enum_max=3)}
    uid = by_col["uid"]
    assert uid.unique and uid.pattern == r"^u_\d+$"
    assert uid.enum_values is None          # 4 distinct > enum_max 3
    color = by_col["color"]
    assert color.enum_values == ("blue", "red")
    assert not color.unique                 # 2 distinct of 4 rows
    score = by_col["score"]
    assert (score.vmin, score.vmax) == (10, 40)
    assert score.unique
    note = by_col["note"]
    assert note.n_null == 1 and note.len_min == 1


def test_suggested_rules_formats(table):
    rules = dict(((c, k), v)
                 for c, k, v in infer.suggested_rules(table, enum_max=3))
    assert rules[("uid", "pattern")] == r"^u_\d+$"
    assert rules[("uid", "x-unique")] == "true"
    assert rules[("color", "enum")] == "blue,red"
    assert rules[("score", "minimum")] == "10"
    assert rules[("score", "maximum")] == "40"
    assert rules[("note", "x-completeness")] == "0.5000"
    assert rules[("uid", "required")] == "true"
    assert ("note", "required") not in rules


def test_enum_column_gets_no_pattern(table):
    # color's lexicographic min ('blue') has no digit run → no
    # template; uid is NOT an enum so pattern may coexist with bounds
    by_col = {p.column: p for p in infer.profile(table, enum_max=3)}
    assert by_col["color"].pattern is None


def test_pattern_rejected_when_not_universal(spark):
    df = spark.createDataFrame([("a_1",), ("b_2",), ("zzz",)],
                               "k string")
    [p] = infer.profile(df)
    # template from min value 'a_1' doesn't match 'zzz' → dropped
    assert p.pattern is None


# --------------------------------------------------------- round trip
def test_round_trip_zero_errors(clips):
    spec = infer.infer_spec(clips)
    suite = compile_spec(spec, clips.schema)
    v = row_violations(clips, suite)
    assert v.filter("severity >= 2").count() == 0


def test_round_trip_catches_fresh_defects(spark, clips):
    # the inferred spec is a real validator: rows OUTSIDE the profiled
    # distribution violate it
    spec = infer.infer_spec(clips)
    suite = compile_spec(spec, clips.schema)
    bad = spark.createDataFrame(
        [("c_x", bytearray(b"\x00\x01"), 3000_000, -5,
          "not_a_codec", "t", 0)],
        clips.schema)
    rules = {r.rule_id for r in row_violations(bad, suite).collect()}
    assert any("codec.enum" in r for r in rules)
    assert any("dur_ms" in r and "minimum" in r for r in rules)


def test_all_null_and_empty_edge(spark):
    df = spark.createDataFrame([(None,), (None,)], "v string")
    [p] = infer.profile(df)
    assert p.n_null == 2 and p.len_min is None and not p.unique
    spec = infer.infer_spec(df)
    assert spec["x-completeness"][0]["max_null_frac"] == 1.0
    assert "required" not in spec


def test_cli_infer_round_trip(spark, clips, tmp_path, capsys):
    # --infer prints a YAML draft that loads and compiles; validating
    # the profiled table with it then exits 0 (the full user loop)
    import yaml
    from canned_yaml_spark import cli
    path = str(tmp_path / "clips.parquet")
    clips.write.parquet(path)
    rc = cli.main(["--infer", "--table", path])
    assert rc == 0
    drafted = yaml.safe_load(capsys.readouterr().out)
    assert drafted["type"] == "object"
    spec_path = tmp_path / "draft.spec.yaml"
    spec_path.write_text(yaml.safe_dump(drafted))
    rc2 = cli.main(["--spec", str(spec_path), "--table", path,
                    "--no-resume"])
    assert rc2 == 0


def test_cli_requires_spec_or_infer(tmp_path):
    from canned_yaml_spark import cli
    with pytest.raises(SystemExit):
        cli.main(["--table", str(tmp_path)])
