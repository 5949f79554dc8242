"""Spec loading + structural validation (SURVEY.md §5 item 1)."""

import pytest

from canned_yaml_spark.errors import SpecError
from canned_yaml_spark.spec import load_spec, resolve_ref


def test_root_must_be_map():
    with pytest.raises(SpecError, match="root"):
        load_spec("- a\n- b\n")


def test_yaml_and_json_both_load():
    # the reference parses JSON as YAML (canner.cc:978-983)
    assert load_spec('{"type": "object"}') == {"type": "object"}
    assert load_spec("type: object\n") == {"type": "object"}


def test_bad_type_name_located():
    with pytest.raises(SpecError, match=r"\$\.properties\.a\.type"):
        load_spec({"type": "object", "properties": {"a": {"type": "integre"}}})


def test_min_items_gt_max_items_rejected():
    # mirrors canner.cc:653-658
    with pytest.raises(SpecError, match="minItems"):
        load_spec({"properties": {"a": {"minItems": 3, "maxItems": 1}}})


def test_negative_bounds_rejected():
    with pytest.raises(SpecError, match="non-negative"):
        load_spec({"properties": {"a": {"minItems": -1}}})


def test_minimum_gt_maximum_rejected():
    with pytest.raises(SpecError, match="minimum"):
        load_spec({"properties": {"a": {"minimum": 10, "maximum": 1}}})


def test_empty_enum_slot_rejected():
    # wccp.schema.json:85 has a trailing empty slot; we reject loudly
    # (SURVEY.md §2.4 decision)
    with pytest.raises(SpecError, match="enum"):
        load_spec({"properties": {"a": {"enum": ["src_ip", ""]}}})


def test_enum_must_be_nonempty_list():
    with pytest.raises(SpecError, match="enum"):
        load_spec({"properties": {"a": {"enum": []}}})


def test_ref_resolution_walks_path():
    root = {"definitions": {"x": {"type": "string"}}}
    name, node = resolve_ref(root, "#/definitions/x", "$")
    assert name == "definitions_x"
    assert node == {"type": "string"}


def test_dangling_ref_is_located_error():
    root = {"definitions": {}}
    with pytest.raises(SpecError, match="does not resolve"):
        resolve_ref(root, "#/definitions/nope", "$.a")


def test_bad_ref_syntax():
    with pytest.raises(SpecError, match=r"\$ref"):
        load_spec({"properties": {"a": {"$ref": "definitions/x"}}})


def test_x_ref_shape():
    with pytest.raises(SpecError, match="x-ref"):
        load_spec({"properties": {"a": {"x-ref": {"table": "t"}}}})


def test_audio_stats_spec_validation():
    import pytest
    from canned_yaml_spark.errors import SpecError
    from canned_yaml_spark.spec import load_spec, validate_spec

    def check(frag):
        validate_spec(load_spec(frag), "$")

    with pytest.raises(SpecError, match="at least one threshold"):
        check("{type: object, properties: {b: {x-audio-stats: {}}}}")
    with pytest.raises(SpecError, match="fraction"):
        check("{type: object, properties: "
              "{b: {x-audio-stats: {max_clip_frac: 1.5}}}}")
    with pytest.raises(SpecError, match="must be a number"):
        check("{type: object, properties: "
              "{b: {x-audio-stats: {min_rms_db: loud}}}}")
    with pytest.raises(SpecError, match="must be a map"):
        check("{type: object, properties: {b: {x-audio-stats: true}}}")
    check("{type: object, properties: "
          "{b: {x-audio-stats: {max_silence_frac: 0.5}}}}")


def test_spectral_spec_validation():
    import pytest
    from canned_yaml_spark.errors import SpecError
    from canned_yaml_spark.spec import load_spec, validate_spec

    def check(frag):
        validate_spec(load_spec(frag), "$")

    with pytest.raises(SpecError, match="at least one threshold"):
        check("{type: object, properties: {b: {x-spectral: {}}}}")
    with pytest.raises(SpecError, match="must be a number"):
        check("{type: object, properties: "
              "{b: {x-spectral: {min_rolloff95_hz: low}}}}")
    with pytest.raises(SpecError, match="in \\[0, 1\\]"):
        check("{type: object, properties: "
              "{b: {x-spectral: {max_flatness: 3}}}}")
    with pytest.raises(SpecError, match="must be a map"):
        check("{type: object, properties: {b: {x-spectral: 4}}}")
    check("{type: object, properties: "
          "{b: {x-spectral: {min_rolloff95_hz: 300}}}}")


# --------------------------------------- draft-07 completion keywords (r5)
@pytest.mark.parametrize("node, loc", [
    ({"allOf": []}, ".allOf"),
    ({"not": ["x"]}, ".not"),
    ({"if": "x"}, ".if"),
    ({"contains": 3}, ".contains"),
    ({"propertyNames": []}, ".propertyNames"),
    ({"multipleOf": 0}, ".multipleOf"),
    ({"multipleOf": -2}, ".multipleOf"),
    ({"uniqueItems": "yes"}, ".uniqueItems"),
    ({"minProperties": -1}, ".minProperties"),
    ({"minProperties": 3, "maxProperties": 1}, ".minProperties"),
    ({"dependentRequired": ["a"]}, ".dependentRequired"),
    ({"dependentRequired": {"a": [1]}}, ".dependentRequired.a"),
    ({"dependencies": {"a": "b"}}, ".dependencies.a"),
])
def test_completion_keywords_located_errors(node, loc):
    spec = {"type": "object", "properties": {"v": node}}
    with pytest.raises(SpecError) as e:
        load_spec(spec)
    assert e.value.path.endswith(loc), (e.value.path, loc)


def test_completion_keywords_recurse():
    # a malformed node INSIDE an if/contains branch is caught eagerly
    with pytest.raises(SpecError) as e:
        load_spec({"type": "object", "properties": {"v": {
            "contains": {"enum": []}}}})
    assert "contains.enum" in e.value.path


import pytest as _pytest


@_pytest.mark.parametrize("node, loc", [
    ({"minContains": -1}, ".minContains"),
    ({"minContains": 3, "maxContains": 1}, ".minContains"),
    ({"prefixItems": []}, ".prefixItems"),
    ({"prefixItems": [3]}, ".prefixItems"),
    ({"prefixItems": [{}], "items": [{}]}, ".items"),
    ({"items": 3}, ".items"),
])
def test_2020_12_located_errors(node, loc):
    spec = {"type": "object", "properties": {"v": node}}
    with _pytest.raises(SpecError) as e:
        load_spec(spec)
    assert e.value.path.endswith(loc), (e.value.path, loc)


def test_dependent_schemas_rejects_array_form():
    with _pytest.raises(SpecError, match="schema map"):
        load_spec({"type": "object",
                   "dependentSchemas": {"a": ["b"]}})


def test_defs_validated_like_definitions():
    with _pytest.raises(SpecError) as e:
        load_spec({"type": "object",
                   "$defs": {"bad": {"minItems": -1}}})
    assert "$defs.bad" in e.value.path


@_pytest.mark.parametrize("node, loc", [
    ({"unevaluatedProperties": 3}, ".unevaluatedProperties"),
    ({"unevaluatedItems": "no"}, ".unevaluatedItems"),
    ({"unevaluatedItems": {"minItems": -1}}, ".unevaluatedItems.minItems"),
])
def test_unevaluated_located_errors(node, loc):
    spec = {"type": "object", "properties": {"v": node}}
    with _pytest.raises(SpecError) as e:
        load_spec(spec)
    assert e.value.path.endswith(loc), (e.value.path, loc)
