"""Per-operator compiler tests (SURVEY.md §5 item 1): each §2 keyword
compiled against a tiny DataFrame with known-valid/invalid rows."""

import pytest
from pyspark.sql import types as T

from canned_yaml_spark import compile_spec
from canned_yaml_spark.runner import row_violations


def _schema(*fields):
    base = [T.StructField("clip_id", T.StringType()),
            T.StructField("part_id", T.IntegerType())]
    return T.StructType(base + list(fields))


def _viols(spark, spec, schema, rows):
    suite = compile_spec(spec, schema)
    df = spark.createDataFrame(rows, schema)
    out = row_violations(df, suite).collect()
    return {(r.clip_id, r.rule_id) for r in out}, suite


# ------------------------------------------------------------ type duck
def test_integer_duck_on_string_staging(spark):
    # full-parse svtoi semantics (canner.cc:1068-1079): '5 ' ok, '5x' not
    sch = _schema(T.StructField("v", T.StringType()))
    spec = {"type": "object", "properties": {"v": {"type": "integer"}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, "5"), ("b", 0, " +42 "), ("c", 0, "5x"),
        ("d", 0, "4.2"), ("e", 0, None)])
    assert v == {("c", "properties.v.type"), ("d", "properties.v.type")}


def test_boolean_duck_case_insensitive(spark):
    # canner.cc:1052-1058
    sch = _schema(T.StructField("v", T.StringType()))
    spec = {"type": "object", "properties": {"v": {"type": "boolean"}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, "true"), ("b", 0, "FALSE"), ("c", 0, "True"),
        ("d", 0, "yes"), ("e", 0, "1")])
    assert v == {("d", "properties.v.type"), ("e", "properties.v.type")}


def test_number_type_implemented():
    # 'number' is declared but never defined in the reference
    # (canner.cc:100 vs 1012-1087) — we implement it (SURVEY.md §2 #6).
    pass  # covered by test_number_duck below


def test_number_duck(spark):
    sch = _schema(T.StructField("v", T.StringType()))
    spec = {"type": "object", "properties": {"v": {"type": "number"}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, "4.25"), ("b", 0, "-1e3"), ("c", 0, "abc")])
    assert v == {("c", "properties.v.type")}


def test_multi_type_or_chain(spark):
    # "type": ["integer","boolean"] — OR of duck checks (canner.cc:440-467)
    sch = _schema(T.StructField("v", T.StringType()))
    spec = {"type": "object",
            "properties": {"v": {"type": ["integer", "boolean"]}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, "7"), ("b", 0, "false"), ("c", 0, "x")])
    assert v == {("c", "properties.v.type")}


def test_string_accepts_any_scalar_static(spark, clips):
    # any scalar satisfies 'string' (canner.cc:1081-1083): on an INT
    # column a 'string' type check is statically satisfied
    sch = _schema(T.StructField("v", T.IntegerType()))
    suite = compile_spec(
        {"type": "object", "properties": {"v": {"type": "string"}}}, sch)
    checks = {c.rule_id: c for c in suite.row_checks}
    assert checks["properties.v.type"].static_ok


def test_typed_column_type_check_elided(spark):
    sch = _schema(T.StructField("v", T.IntegerType()))
    suite = compile_spec(
        {"type": "object", "properties": {"v": {"type": "integer"}}}, sch)
    assert all(c.static_ok for c in suite.row_checks
               if c.rule_id == "properties.v.type")


def test_null_type(spark):
    sch = _schema(T.StructField("v", T.StringType()))
    spec = {"type": "object", "properties": {"v": {"type": "null"}}}
    v, _ = _viols(spark, spec, sch, [("a", 0, None), ("b", 0, "x")])
    assert v == {("b", "properties.v.type")}


# ----------------------------------------------------------- range/pattern
def test_exclusive_bounds(spark):
    sch = _schema(T.StructField("v", T.IntegerType()))
    spec = {"type": "object",
            "properties": {"v": {"exclusiveMinimum": 0, "exclusiveMaximum": 10}}}
    v, _ = _viols(spark, spec, sch, [("a", 0, 0), ("b", 0, 5), ("c", 0, 10)])
    assert v == {("a", "properties.v.exclusiveMinimum"),
                 ("c", "properties.v.exclusiveMaximum")}


def test_range_on_string_staging_casts(spark):
    sch = _schema(T.StructField("v", T.StringType()))
    spec = {"type": "object",
            "properties": {"v": {"minimum": 8000, "maximum": 48000}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, "16000"), ("b", 0, "3000"), ("c", 0, "junk")])
    # 'junk' try_casts to NULL → NULL >= 8000 is NULL → ~NULL is NULL →
    # isNotNull & NULL = NULL → when() skips: no range violation for
    # unparseable text (the type check owns that failure)
    assert v == {("b", "properties.v.minimum")}


def test_pattern_anchored(spark):
    sch = _schema(T.StructField("v", T.StringType()))
    spec = {"type": "object",
            "properties": {"v": {"pattern": r"^clip_[0-9]{10}$"}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, "clip_0000000001"), ("b", 0, "CLIP-7"),
        ("c", 0, "clip_123")])
    assert v == {("b", "properties.v.pattern"), ("c", "properties.v.pattern")}


# ------------------------------------------------------------- items
def test_items_uniform_forall(spark):
    sch = _schema(T.StructField("v", T.ArrayType(T.IntegerType())))
    spec = {"type": "object", "properties": {"v": {
        "type": "array", "minItems": 1, "maxItems": 3,
        "items": {"minimum": 0, "maximum": 100}}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, [1, 2]), ("b", 0, []), ("c", 0, [1, 2, 3, 4]),
        ("d", 0, [5, -1])])
    assert v == {("b", "properties.v.minItems"),
                 ("c", "properties.v.maxItems"),
                 ("d", "properties.v.items")}


def test_items_tuple_positional(spark):
    # positional items (canner.cc:673-705); replay.schema.json:136-147
    sch = _schema(T.StructField("v", T.ArrayType(T.StringType())))
    spec = {"type": "object", "properties": {"v": {
        "items": [{"enum": ["name"]}, {"minLength": 2}]}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, ["name", "value"]),
        ("b", 0, ["wrong", "value"]),
        ("c", 0, ["name", "x"]),
        ("d", 0, ["name"]),          # short arrays don't violate pos 2
    ])
    assert v == {("b", "properties.v.items[0]"),
                 ("c", "properties.v.items[1]")}


def test_tuple_schemas_beyond_max_items_dropped_with_warning(spark):
    # canner.cc:676-681
    sch = _schema(T.StructField("v", T.ArrayType(T.StringType())))
    spec = {"type": "object", "properties": {"v": {
        "maxItems": 1, "items": [{"minLength": 1}, {"minLength": 9}]}}}
    suite = compile_spec(spec, sch)
    assert any("dropped" in w for w in suite.warnings)
    assert not any("items[1]" in c.rule_id for c in suite.row_checks)


# ----------------------------------------------------------- combinators
def test_anyof_or_semantics(spark):
    # ip_allow.schema.json:24-38 (string-or-array of strings)
    sch = _schema(T.StructField("v", T.StringType()))
    spec = {"type": "object", "properties": {"v": {"anyOf": [
        {"enum": ["all"]}, {"pattern": "^m_"}]}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, "all"), ("b", 0, "m_get"), ("c", 0, "nope")])
    assert v == {("c", "properties.v.anyOf")}


def test_oneof_exactly_one(spark, clips):
    from canned_yaml_spark.runner import row_violations as rv
    sch = _schema(T.StructField("n", T.IntegerType()))
    spec = {"type": "object", "properties": {"n": {"oneOf": [
        {"minimum": 0, "maximum": 10},
        {"minimum": 5, "maximum": 20},
        {"minimum": 100}]}}}
    suite = compile_spec(spec, sch)
    df = spark.createDataFrame(
        [("one", 0, 3), ("two", 0, 7), ("zero", 0, 50), ("hi", 0, 150)], sch)
    out = {r.clip_id: r.message for r in rv(df, suite).collect()}
    # 0-match and >1-match are distinct errors (canner.cc:540-559)
    assert set(out) == {"two", "zero"}
    assert "2 of 3" in out["two"]
    assert "none of 3" in out["zero"]


def test_enum_composite_deep_equality(spark):
    # the reference's equal() compares only the FIRST element
    # (equal.cc:11-28, a bug we must NOT replicate): [1,99] would pass
    # under first-element-only equality but must fail here.
    sch = _schema(T.StructField("v", T.ArrayType(T.IntegerType())))
    spec = {"type": "object", "properties": {"v": {"enum": [[1, 2], [3]]}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, [1, 2]), ("b", 0, [3]), ("c", 0, [1, 99])])
    assert v == {("c", "properties.v.enum")}


# ---------------------------------------------------------------- $ref
def test_ref_chain_and_sibling_warning(spark):
    # nested definitions mirroring ip_allow.schema.json:97-104; sibling
    # keys of $ref ignored with a warning (canner.cc:772-784)
    sch = _schema(T.StructField("v", T.IntegerType()))
    spec = {
        "type": "object",
        "definitions": {
            "small": {"$ref": "#/definitions/base", "maximum": 999999},
            "base": {"minimum": 0, "maximum": 65535},
        },
        "properties": {"v": {"$ref": "#/definitions/small"}},
    }
    suite = compile_spec(spec, sch)
    assert any("ignored because of $ref" in w for w in suite.warnings)
    df = spark.createDataFrame([("a", 0, 80), ("b", 0, 70000)], sch)
    out = row_violations(df, suite).collect()
    assert {(r.clip_id, r.rule_id.split(".")[-1]) for r in out} == \
        {("b", "maximum")}


def test_ref_cycle_detected(spark):
    from canned_yaml_spark.errors import SpecError
    sch = _schema(T.StructField("v", T.IntegerType()))
    spec = {"type": "object",
            "definitions": {"a": {"$ref": "#/definitions/a"}},
            "properties": {"v": {"$ref": "#/definitions/a"}}}
    with pytest.raises(SpecError, match="cycle"):
        compile_spec(spec, sch)


# ------------------------------------------------------------ nested struct
def test_nested_struct_properties(spark):
    inner = T.StructType([T.StructField("host", T.StringType()),
                          T.StructField("port", T.IntegerType())])
    sch = _schema(T.StructField("v", inner))
    spec = {"type": "object", "properties": {"v": {
        "type": "object",
        "required": ["host"],
        "properties": {"port": {"minimum": 1, "maximum": 65535}}}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, ("example", 80)),
        ("b", 0, (None, 80)),
        ("c", 0, ("example", 0))])
    assert v == {("b", "properties.v.required.host"),
                 ("c", "properties.v.properties.port.minimum")}


def test_open_world_unknown_column_warns(spark):
    # generated code allows undeclared keys (canner.cc:741-756) — we
    # warn and skip rather than fail
    sch = _schema()
    suite = compile_spec(
        {"type": "object", "properties": {"ghost": {"type": "string"}}}, sch)
    assert any("ghost" in w for w in suite.warnings)
    assert not any("ghost" in c.rule_id for c in suite.row_checks)


def test_closed_world_flags_undeclared_columns(spark):
    # SURVEY §7(e): default open (canner.cc:741-756), WARN-severity
    # closed variant available (text.cpp:178-181)
    from pyspark.sql import functions as F

    from canned_yaml_spark.runner import row_violations
    df = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, None)],
        "clip_id string, part_id int, extra string")
    spec = {"type": "object", "x-closed-world": True,
            "properties": {"clip_id": {"type": "string"}},
            "required": ["clip_id"]}
    suite = compile_spec(spec, df.schema)
    v = row_violations(df, suite).collect()
    flagged = {(r.clip_id, r.rule_id, r.severity) for r in v}
    # part_id/extra are undeclared; a row violates only where the
    # column is non-null (NULL == key absent from the document)
    assert ("a", "closed-world.extra", 1) in flagged
    assert ("b", "closed-world.extra", 1) not in flagged
    assert ("a", "closed-world.part_id", 1) in flagged
    # open world (default): no closed-world checks emitted
    suite_open = compile_spec({"type": "object", "properties": {
        "clip_id": {"type": "string"}}}, df.schema)
    assert not any(c.rule_id.startswith("closed-world")
                   for c in suite_open.row_checks)


# ------------------------------------------- draft-07 applicators (r5)
def test_allof_per_branch_rule_ids(spark):
    # each allOf branch compiles to its OWN located predicate, so a
    # violation names which branch failed (the reference's generator
    # stops at anyOf/oneOf — canner.cc:469-559)
    sch = _schema(T.StructField("v", T.IntegerType()))
    spec = {"type": "object", "properties": {"v": {
        "allOf": [{"minimum": 10}, {"maximum": 20}]}}}
    v, _ = _viols(spark, spec, sch, [
        ("lo", 0, 5), ("ok", 0, 15), ("hi", 0, 25), ("nul", 0, None)])
    assert v == {("lo", "properties.v.allOf[0]"),
                 ("hi", "properties.v.allOf[1]")}


def test_not_inverts_subschema(spark):
    sch = _schema(T.StructField("v", T.StringType()))
    spec = {"type": "object", "properties": {"v": {
        "not": {"enum": ["banned", "worse"]}}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, "fine"), ("b", 0, "banned"), ("c", 0, "worse"),
        ("n", 0, None)])
    # NULL: enum-match is NULL -> negation stays NULL -> pass (absent
    # property validates; presence is `required`'s job)
    assert v == {("b", "properties.v.not"), ("c", "properties.v.not")}


def test_root_if_then_else_cross_column(spark):
    # the load-bearing root form: a CROSS-COLUMN conditional evaluated
    # over a whole-row struct so branch `properties` bind table columns
    sch = _schema(T.StructField("codec", T.StringType()),
                  T.StructField("sr_hz", T.IntegerType()))
    spec = {"type": "object",
            "if": {"properties": {"codec": {"enum": ["opus"]}},
                   "required": ["codec"]},
            "then": {"properties": {"sr_hz": {"maximum": 22050}}},
            "else": {"properties": {"sr_hz": {"minimum": 8000}}}}
    v, suite = _viols(spark, spec, sch, [
        ("opus_hi", 0, "opus", 48000),   # cond true, then fails
        ("opus_ok", 0, "opus", 16000),   # cond true, then passes
        ("flac_lo", 0, "flac", 3000),    # cond false, else fails
        ("flac_ok", 0, "flac", 16000),   # cond false, else passes
        ("null_lo", 0, None, 3000),      # required gates cond -> else arm
    ])
    assert v == {("opus_hi", "$.if"), ("flac_lo", "$.if"),
                 ("null_lo", "$.if")}
    # the violation message names the branch that actually failed
    from canned_yaml_spark.runner import row_violations
    df = spark.createDataFrame(
        [("opus_hi", 0, "opus", 48000), ("flac_lo", 0, "flac", 3000)], sch)
    msgs = {r.clip_id: r.message for r in row_violations(df, suite)
            .collect()}
    assert "then" in msgs["opus_hi"] and "else" in msgs["flac_lo"]


def test_root_if_without_else_passes_nonmatching(spark):
    sch = _schema(T.StructField("codec", T.StringType()),
                  T.StructField("sr_hz", T.IntegerType()))
    spec = {"type": "object",
            "if": {"properties": {"codec": {"enum": ["opus"]}},
                   "required": ["codec"]},
            "then": {"properties": {"sr_hz": {"maximum": 22050}}}}
    v, _ = _viols(spark, spec, sch, [
        ("flac_any", 0, "flac", 96000), ("opus_hi", 0, "opus", 48000)])
    assert v == {("opus_hi", "$.if")}


def test_root_applicators_need_schema(spark):
    from canned_yaml_spark.errors import SpecError
    with pytest.raises(SpecError):
        compile_spec({"type": "object",
                      "if": {"properties": {"a": {"minimum": 1}}},
                      "then": {"properties": {"b": {"minimum": 2}}}})


def test_root_allof_and_not(spark):
    sch = _schema(T.StructField("sr_hz", T.IntegerType()),
                  T.StructField("codec", T.StringType()))
    spec = {"type": "object",
            "allOf": [{"properties": {"sr_hz": {"minimum": 8000}}}],
            "not": {"properties": {"codec": {"enum": ["vorbis"]}},
                    "required": ["codec"]}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, 3000, "flac"),      # allOf[0] fails
        ("b", 0, 16000, "vorbis"),   # not fails
        ("c", 0, 16000, "flac")])
    assert v == {("a", "$.allOf[0]"), ("b", "$.not")}


# --------------------------------------- draft-07 completion batch (r5)
def test_const_deep_equality(spark):
    sch = _schema(T.StructField("v", T.StringType()))
    spec = {"type": "object", "properties": {"v": {"const": "fixed"}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, "fixed"), ("b", 0, "other"), ("n", 0, None)])
    assert v == {("b", "properties.v.const")}


def test_multiple_of_int_and_float(spark):
    sch = _schema(T.StructField("i", T.IntegerType()),
                  T.StructField("f", T.DoubleType()))
    spec = {"type": "object", "properties": {
        "i": {"multipleOf": 100},
        "f": {"multipleOf": 0.1}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, 400, 0.3),    # both multiples (0.3/0.1 needs the eps)
        ("b", 0, 450, 0.35),   # both violate
        ("n", 0, None, None)])
    assert v == {("b", "properties.i.multipleOf"),
                 ("b", "properties.f.multipleOf")}


def test_multiple_of_rejects_nonpositive():
    from canned_yaml_spark.errors import SpecError
    sch = _schema(T.StructField("i", T.IntegerType()))
    with pytest.raises(SpecError):
        compile_spec({"type": "object",
                      "properties": {"i": {"multipleOf": 0}}}, sch)


def test_unique_items(spark):
    sch = _schema(T.StructField("tags", T.ArrayType(T.StringType())))
    spec = {"type": "object", "properties": {"tags": {"uniqueItems": True}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, ["x", "y"]), ("b", 0, ["x", "x"]),
        ("c", 0, []), ("d", 0, [None, None]),  # null==null counts as dup
        ("n", 0, None)])
    assert v == {("b", "properties.tags.uniqueItems"),
                 ("d", "properties.tags.uniqueItems")}


def test_contains_exists_semantics(spark):
    sch = _schema(T.StructField("xs", T.ArrayType(T.IntegerType())))
    spec = {"type": "object", "properties": {"xs": {
        "contains": {"minimum": 100}}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, [1, 2, 150]),   # one element matches
        ("b", 0, [1, 2, 3]),     # none match
        ("c", 0, []),            # empty: no element matches
        ("d", 0, [5, None]),     # no TRUE + a NULL outcome -> pass (3VL)
        ("n", 0, None)])
    assert v == {("b", "properties.xs.contains"),
                 ("c", "properties.xs.contains")}


def test_min_max_properties_on_map(spark):
    sch = _schema(T.StructField("m", T.MapType(T.StringType(),
                                               T.StringType())))
    spec = {"type": "object", "properties": {"m": {
        "minProperties": 1, "maxProperties": 3}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, {"k": "v"}),
        ("b", 0, {}),                                  # too few
        ("c", 0, {"a": "1", "b": "2", "c": "3", "d": "4"}),  # too many
        ("n", 0, None)])
    assert v == {("b", "properties.m.minProperties"),
                 ("c", "properties.m.maxProperties")}


def test_min_properties_on_struct_counts_non_null(spark):
    # struct: present ⇔ non-NULL, the engine-wide column↔key convention
    inner = T.StructType([T.StructField("x", T.StringType()),
                          T.StructField("y", T.StringType())])
    sch = _schema(T.StructField("s", inner))
    spec = {"type": "object", "properties": {"s": {"minProperties": 2}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, ("1", "2")), ("b", 0, ("1", None)), ("n", 0, None)])
    assert v == {("b", "properties.s.minProperties")}


def test_property_names_pattern(spark):
    sch = _schema(T.StructField("m", T.MapType(T.StringType(),
                                               T.StringType())))
    spec = {"type": "object", "properties": {"m": {
        "propertyNames": {"pattern": "^[a-z_]+$"}}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, {"good_key": "v"}),
        ("b", 0, {"Bad Key!": "v"}),
        ("c", 0, {}),               # vacuously true
        ("n", 0, None)])
    assert v == {("b", "properties.m.propertyNames")}


def test_dependent_required(spark):
    sch = _schema(T.StructField("codec", T.StringType()),
                  T.StructField("bitrate", T.IntegerType()))
    spec = {"type": "object",
            "dependentRequired": {"codec": ["bitrate"]}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, "opus", 64000),
        ("b", 0, "opus", None),     # codec present, bitrate missing
        ("c", 0, None, None),       # codec absent: no obligation
        ("d", 0, None, 64000)])
    assert v == {("b", "$.dependentRequired.codec.bitrate")}


def test_dependent_required_missing_column_raises():
    from canned_yaml_spark.errors import SpecError
    sch = _schema(T.StructField("codec", T.StringType()))
    with pytest.raises(SpecError):
        compile_spec({"type": "object",
                      "dependentRequired": {"codec": ["bitrate"]}}, sch)


def test_dependencies_schema_form(spark):
    # schema-form dependencies = sugar for a root if/then conditional
    sch = _schema(T.StructField("codec", T.StringType()),
                  T.StructField("sr_hz", T.IntegerType()))
    spec = {"type": "object",
            "dependencies": {"codec": {
                "properties": {"sr_hz": {"minimum": 8000}}}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, "opus", 16000),
        ("b", 0, "opus", 3000),     # codec present, sr_hz below floor
        ("c", 0, None, 3000)])      # codec absent: schema not applied
    assert v == {("b", "$.dependencies.codec.if")}


# -------------------- patternProperties / additionalProperties (r5)
def test_root_pattern_properties_compile_time(spark):
    # column names are static → the rule binds matching columns at
    # compile time; the plan carries only per-column value checks
    sch = _schema(T.StructField("n_a", T.IntegerType()),
                  T.StructField("n_b", T.IntegerType()),
                  T.StructField("other", T.IntegerType()))
    spec = {"type": "object",
            "patternProperties": {"^n_": {"minimum": 1}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, 5, 0, -7),    # n_b=0 fires; other exempt
        ("b", 0, 0, 2, 1),     # n_a=0 fires
        ("n", 0, None, None, None)])
    assert v == {("a", "patternProperties.^n_.n_b.minimum"),
                 ("b", "patternProperties.^n_.n_a.minimum")}


def test_root_additional_properties_false_is_error_closed_world(spark):
    sch = _schema(T.StructField("extra", T.StringType()))
    spec = {"type": "object",
            "properties": {"clip_id": {"type": "string"},
                           "part_id": {"type": "integer"}},
            "additionalProperties": False}
    suite = compile_spec(spec, sch)
    from canned_yaml_spark.checks import Severity
    ap = [c for c in suite.row_checks
          if c.rule_id == "additionalProperties.extra"]
    assert len(ap) == 1 and ap[0].severity == Severity.ERROR
    v, _ = _viols(spark, spec, sch, [("a", 0, "x"), ("b", 0, None)])
    assert v == {("a", "additionalProperties.extra")}


def test_root_additional_properties_schema_and_pattern_exemption(spark):
    # extras = not declared AND not matched by any patternProperties
    sch = _schema(T.StructField("n_x", T.IntegerType()),
                  T.StructField("free", T.IntegerType()))
    spec = {"type": "object",
            "properties": {"clip_id": {}, "part_id": {}},
            "patternProperties": {"^n_": {}},
            "additionalProperties": {"maximum": 10}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, 99, 5),     # n_x exempt from the ap schema
        ("b", 0, 1, 99)])    # free violates maximum
    assert v == {("b", "additionalProperties.free.maximum")}


def test_map_pattern_properties_runtime_keys(spark):
    sch = _schema(T.StructField("m", T.MapType(T.StringType(),
                                               T.StringType())))
    spec = {"type": "object", "properties": {"m": {
        "patternProperties": {"^v": {"pattern": "^[0-9]+$"}}}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, {"v1": "42", "other": "text"}),   # matched key ok
        ("b", 0, {"v1": "oops"}),                  # matched key violates
        ("c", 0, {"other": "oops"}),               # unmatched key exempt
        ("d", 0, {"v2": None}),                    # NULL value validates
        ("n", 0, None)])
    assert v == {("b", "properties.m.patternProperties.^v")}


def test_map_additional_properties_false(spark):
    sch = _schema(T.StructField("m", T.MapType(T.StringType(),
                                               T.StringType())))
    spec = {"type": "object", "properties": {"m": {
        "properties": {"a": {}},
        "patternProperties": {"^p_": {}},
        "additionalProperties": False}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, {"a": "1", "p_x": "2"}),
        ("b", 0, {"a": "1", "rogue": "2"}),
        ("c", 0, {})])
    assert v == {("b", "properties.m.additionalProperties")}


def test_map_additional_properties_schema(spark):
    sch = _schema(T.StructField("m", T.MapType(T.StringType(),
                                               T.StringType())))
    spec = {"type": "object", "properties": {"m": {
        "properties": {"a": {}},
        "additionalProperties": {"type": "integer"}}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, {"a": "free", "x": "42"}),   # declared key exempt
        ("b", 0, {"x": "not_int"}),
        ("c", 0, {"x": None})])               # NULL value validates
    assert v == {("b", "properties.m.additionalProperties")}


def test_struct_pattern_and_additional_properties(spark):
    inner = T.StructType([T.StructField("v_num", T.StringType()),
                          T.StructField("extra", T.StringType())])
    sch = _schema(T.StructField("s", inner))
    spec = {"type": "object", "properties": {"s": {
        "patternProperties": {"^v_": {"type": "integer"}},
        "additionalProperties": False}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, ("42", None)),     # matches pattern, parses; no extra
        ("b", 0, ("xx", None)),     # pattern-matched field violates
        ("c", 0, ("42", "rogue"))])  # extra present (non-NULL)
    assert v == {("b", "properties.s.patternProperties.^v_.v_num.type"),
                 ("c", "properties.s.additionalProperties.extra")}


def test_pattern_properties_spec_validation():
    from canned_yaml_spark.errors import SpecError
    with pytest.raises(SpecError) as e:
        compile_spec({"type": "object",
                      "patternProperties": {"[unclosed": {}}},
                     _schema())
    assert "patternProperties" in e.value.path
    with pytest.raises(SpecError):
        compile_spec({"type": "object", "additionalProperties": 3},
                     _schema())


# ------------------------------------------------------ 2020-12 arrays
def test_prefix_items_positional(spark):
    # prefixItems = the 2020-12 spelling of tuple items: element i
    # validates against schema i; short arrays never violate.
    sch = _schema(T.StructField("xs", T.ArrayType(T.StringType())))
    spec = {"type": "object", "properties": {"xs": {
        "prefixItems": [{"type": "integer"}, {"type": "boolean"}]}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, ["1", "true"]),
        ("b", 0, ["x", "true"]),     # pos 0 not an integer
        ("c", 0, ["1", "maybe"]),    # pos 1 not a boolean
        ("d", 0, ["1"]),             # short: no violation
        ("e", 0, ["1", "true", "anything"]),  # open rest by default
        ("n", 0, None)])
    assert v == {("b", "properties.xs.prefixItems[0]"),
                 ("c", "properties.xs.prefixItems[1]")}


def test_prefix_items_rest_items_schema(spark):
    # 2020-12 §10.3.1.2: `items` governs only elements PAST the prefix
    sch = _schema(T.StructField("xs", T.ArrayType(T.StringType())))
    spec = {"type": "object", "properties": {"xs": {
        "prefixItems": [{"const": "head"}],
        "items": {"pattern": "^[a-z]+$"}}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, ["head", "ok", "fine"]),
        ("b", 0, ["head", "BAD"]),     # rest element fails pattern
        ("c", 0, ["BAD"]),             # only the prefix fails
        ("d", 0, ["head"]),            # no rest: items vacuous
        ("n", 0, None)])
    assert v == {("b", "properties.xs.items"),
                 ("c", "properties.xs.prefixItems[0]")}


def test_prefix_items_items_false_closes_array(spark):
    sch = _schema(T.StructField("xs", T.ArrayType(T.StringType())))
    spec = {"type": "object", "properties": {"xs": {
        "prefixItems": [{}, {}], "items": False}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, ["1", "2"]),
        ("b", 0, ["1", "2", "3"]),   # beyond the prefix
        ("c", 0, ["1"]),
        ("n", 0, None)])
    assert v == {("b", "properties.xs.items")}


def test_items_false_without_prefix_means_empty(spark):
    sch = _schema(T.StructField("xs", T.ArrayType(T.StringType())))
    spec = {"type": "object", "properties": {"xs": {"items": False}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, []), ("b", 0, ["x"]), ("n", 0, None)])
    assert v == {("b", "properties.xs.items")}


def test_min_max_contains(spark):
    sch = _schema(T.StructField("xs", T.ArrayType(T.IntegerType())))
    spec = {"type": "object", "properties": {"xs": {
        "contains": {"minimum": 100},
        "minContains": 2, "maxContains": 3}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, [100, 200]),             # 2 matches: ok
        ("b", 0, [100, 1, 2]),            # 1 match < minContains
        ("c", 0, [100, 200, 300, 400]),   # 4 matches > maxContains
        ("d", 0, [100, None, 1]),         # NULL counts optimistically
        ("e", 0, [100, 200, 300, None]),  # NULL not a definite match
        ("n", 0, None)])
    assert v == {("b", "properties.xs.minContains"),
                 ("c", "properties.xs.maxContains")}


def test_min_contains_zero_always_satisfied(spark):
    # minContains: 0 → even an empty / match-free array passes contains
    sch = _schema(T.StructField("xs", T.ArrayType(T.IntegerType())))
    spec = {"type": "object", "properties": {"xs": {
        "contains": {"minimum": 100}, "minContains": 0,
        "maxContains": 1}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, []), ("b", 0, [1, 2]), ("c", 0, [100, 200])])
    assert v == {("c", "properties.xs.maxContains")}


def test_min_max_contains_without_contains_warns(spark):
    sch = _schema(T.StructField("xs", T.ArrayType(T.IntegerType())))
    spec = {"type": "object", "properties": {"xs": {"minContains": 1}}}
    v, suite = _viols(spark, spec, sch, [("a", 0, [])])
    assert v == set()
    assert any("minContains" in w or "min/maxContains" in w
               for w in suite.warnings)


def test_dependent_schemas_2020_12(spark):
    # dependentSchemas = the schema half of draft-07's dependencies
    sch = _schema(T.StructField("codec", T.StringType()),
                  T.StructField("sr_hz", T.IntegerType()))
    spec = {"type": "object",
            "dependentSchemas": {"codec": {
                "properties": {"sr_hz": {"minimum": 8000}}}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, "pcm", 16000),
        ("b", 0, "pcm", 4000),    # codec present, sr too low
        ("c", 0, None, 4000),     # codec absent: schema not triggered
        ("d", 0, "pcm", None)])   # dependent value NULL: value rule gated
    assert {c for c, _ in v} == {"b"}
    assert all(r.startswith("$.dependentSchemas.codec") for _, r in v)


def test_defs_alias_resolves_ref(spark):
    # $defs = the 2020-12 spelling of definitions; resolve via pointer
    sch = _schema(T.StructField("v", T.StringType()))
    spec = {"type": "object",
            "$defs": {"tag": {"pattern": "^[a-z]+$"}},
            "properties": {"v": {"$ref": "#/$defs/tag"}}}
    v, _ = _viols(spark, spec, sch, [
        ("a", 0, "ok"), ("b", 0, "BAD")])
    assert len(v) == 1 and next(iter(v))[0] == "b"


# ------------------------------------------------ 2020-12 unevaluated*
def test_unevaluated_properties_false_on_struct_dynamic_if(spark):
    # claims flow only from APPLYING branches: 'b' is evaluated only on
    # rows where the if-branch matched (2020-12 §11 annotation flow)
    inner = T.StructType([T.StructField("a", T.StringType()),
                          T.StructField("b", T.StringType())])
    sch = _schema(T.StructField("o", inner))
    spec = {"type": "object", "properties": {"o": {
        "properties": {"a": {}},
        "if": {"properties": {"a": {"const": "on"}}, "required": ["a"]},
        "then": {"properties": {"b": {}}},
        "unevaluatedProperties": False}}}
    v, _ = _viols(spark, spec, sch, [
        ("w", 0, ("on", "x")),    # if matched: b evaluated
        ("x", 0, ("off", "x")),   # if not matched: b unevaluated
        ("y", 0, ("off", None)),  # b absent (NULL): nothing to flag
        ("n", 0, None)])
    assert v == {("x", "properties.o.unevaluatedProperties.b")}


def test_unevaluated_properties_schema_form_struct(spark):
    inner = T.StructType([T.StructField("a", T.StringType()),
                          T.StructField("extra", T.StringType())])
    sch = _schema(T.StructField("o", inner))
    spec = {"type": "object", "properties": {"o": {
        "properties": {"a": {}},
        "unevaluatedProperties": {"pattern": "^[a-z]+$"}}}}
    v, _ = _viols(spark, spec, sch, [
        ("w", 0, ("x", "ok")),
        ("x", 0, ("x", "BAD")),
        ("n", 0, ("x", None))])
    assert v == {("x", "properties.o.unevaluatedProperties.extra.pattern")}


def test_unevaluated_properties_on_map_anyof_claims(spark):
    sch = _schema(T.StructField("m", T.MapType(T.StringType(),
                                               T.StringType())))
    spec = {"type": "object", "properties": {"m": {
        "anyOf": [{"required": ["k1"], "properties": {"k1": {}}},
                  {"patternProperties": {"^p_": {}}}],
        "unevaluatedProperties": False}}}
    # branch 1 applies iff k1 present; branch 2 (no constraints) always
    # applies and claims p_* keys
    v, _ = _viols(spark, spec, sch, [
        ("w", 0, {"k1": "v", "p_x": "v"}),
        ("x", 0, {"k1": "v", "other": "v"}),   # 'other' unclaimed
        ("y", 0, {"p_x": "v"}),
        ("n", 0, None)])
    assert v == {("x", "properties.m.unevaluatedProperties")}


def test_unevaluated_items_false_dynamic_prefix_claims(spark):
    # which prefix length applies depends on WHICH anyOf branch
    # validates, per row
    sch = _schema(T.StructField("xs", T.ArrayType(T.StringType())))
    spec = {"type": "object", "properties": {"xs": {
        "anyOf": [{"prefixItems": [{"type": "number"},
                                   {"type": "boolean"}]},
                  {"prefixItems": [{"pattern": "^x"}]}],
        "unevaluatedItems": False}}}
    v, _ = _viols(spark, spec, sch, [
        ("w", 0, ["42", "true"]),       # branch 1: both claimed
        ("x", 0, ["x42", "true"]),      # only branch 2: idx 1 unclaimed
        ("y", 0, ["x42"]),              # branch 2 claims the lone elem
        ("n", 0, None)])
    assert {(c, r) for c, r in v if "unevaluatedItems" in r} == \
        {("x", "properties.xs.unevaluatedItems")}


def test_unevaluated_items_contains_claims_matching_elements(spark):
    # 2020-12 §11.2: contains claims exactly the MATCHING elements
    sch = _schema(T.StructField("xs", T.ArrayType(T.StringType())))
    spec = {"type": "object", "properties": {"xs": {
        "contains": {"pattern": "^[a-z]+$"},
        "unevaluatedItems": {"pattern": "^[0-9]+$"}}}}
    v, _ = _viols(spark, spec, sch, [
        ("w", 0, ["word", "123"]),    # word claimed, 123 passes schema
        ("x", 0, ["word", "BAD"]),    # BAD unclaimed and non-numeric
        ("n", 0, None)])
    assert v == {("x", "properties.xs.unevaluatedItems")}


def test_unevaluated_items_vacuous_with_items_schema(spark):
    sch = _schema(T.StructField("xs", T.ArrayType(T.StringType())))
    spec = {"type": "object", "properties": {"xs": {
        "items": {},                   # claims every element
        "unevaluatedItems": False}}}
    v, suite = _viols(spark, spec, sch, [("w", 0, ["anything"])])
    assert v == set()


def test_unevaluated_properties_ref_claims(spark):
    inner = T.StructType([T.StructField("a", T.StringType()),
                          T.StructField("b", T.StringType())])
    sch = _schema(T.StructField("o", inner))
    spec = {"type": "object",
            "$defs": {"base": {"properties": {"a": {}}}},
            "properties": {"o": {
                "allOf": [{"$ref": "#/$defs/base"}],
                "unevaluatedProperties": False}}}
    v, _ = _viols(spark, spec, sch, [
        ("w", 0, ("x", None)),
        ("x", 0, ("x", "y"))])        # b claimed by nobody
    assert v == {("x", "properties.o.unevaluatedProperties.b")}
