"""Spec loading + eager structural validation.

The reference loads the schema spec with YAML::Load — so both JSON and
YAML specs parse (/root/reference/canner/src/canner.cc:978-983) — and
requires the root to be a map (canner.cc:991-997). We do the same with
``yaml.safe_load`` (JSON is a YAML subset) and validate the spec shape
eagerly with located ``SpecError``s before any Spark work happens.

Supported vocabulary (the reference's, canner.cc:106-129, plus the
keywords its corpus uses but its generators silently ignore — see
SURVEY.md §2 #16 — plus dataset-level extensions mandated by
BASELINE.json):

  row-level:    type, properties, required, items, minItems, maxItems,
                oneOf, anyOf, enum, $ref/definitions,
                minimum, maximum (exclusiveMinimum/Maximum),
                pattern, minLength, maxLength
  dataset-level (x- extensions): x-unique, x-ref, x-drift, x-payload
"""

from __future__ import annotations

import json
import os
import re as _re
from typing import Any

from canned_yaml_spark.errors import SpecError

try:  # pyyaml ships with the environment; JSON fallback if not
    import yaml as _yaml
except ImportError:  # pragma: no cover
    _yaml = None

#: The 7 logical types of the reference's SchemaType enum
#: (/root/reference/canner/src/canner.cc:73,83-91).
SCHEMA_TYPES = ("null", "boolean", "object", "array", "number", "integer", "string")

#: Keywords understood at a schema node. Anything else is tolerated
#: (open vocabulary, like the reference which skips unknown keys) but
#: a '$ref' with siblings warns per canner.cc:772-784.
NODE_KEYWORDS = {
    "type", "properties", "required", "items", "minItems", "maxItems",
    "oneOf", "anyOf", "enum", "$ref", "definitions",
    "minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum",
    "pattern", "minLength", "maxLength",
    "x-unique", "x-ref", "x-drift", "x-payload", "x-audio-stats",
    "x-spectral", "x-severity", "x-closed-world", "x-quantile",
    "x-assert", "x-completeness", "x-frequency", "x-anomaly",
    "$schema", "title", "description",
}


def load_spec(source: str | dict) -> dict:
    """Load a spec from a path, a YAML/JSON string, or a dict.

    Mirrors the reference's load path (canner.cc:972-997): file →
    YAML parse → root-must-be-a-map check.
    """
    if isinstance(source, dict):
        spec = source
    else:
        text = source
        if os.path.exists(source):
            with open(source, "r", encoding="utf-8") as fh:
                text = fh.read()
        if _yaml is not None:
            spec = _yaml.safe_load(text)
        else:  # pragma: no cover
            spec = json.loads(text)
    if not isinstance(spec, dict):
        raise SpecError("$", "root of the spec must be a map "
                             "(reference: canner.cc:991-997)")
    validate_spec(spec, "$")
    return spec


def _is_int(v: Any) -> bool:
    return isinstance(v, int) and not isinstance(v, bool)


def _is_num(v: Any) -> bool:
    return _is_int(v) or isinstance(v, float)


def validate_spec(node: Any, path: str) -> None:
    """Eager structural validation of one spec node (recursive).

    Consistency checks mirror the reference: bounds must be
    non-negative ints with min ≤ max (canner.cc:625-658); type names
    must be from the 7-type lexicon (canner.cc:448-449); enum values
    must be present; $ref must be a string path. We additionally
    reject sloppy constructs the reference tolerates or crashes on,
    e.g. an empty enum slot (schema/wccp.schema.json:85 has a trailing
    empty string — SURVEY.md §2.4: we reject loudly).
    """
    if not isinstance(node, dict):
        raise SpecError(path, f"schema node must be a map, got {type(node).__name__}")

    if "type" in node:
        tv = node["type"]
        names = tv if isinstance(tv, list) else [tv]
        if not names:
            raise SpecError(path + ".type", "type list must not be empty")
        for i, name in enumerate(names):
            if name not in SCHEMA_TYPES:
                raise SpecError(f"{path}.type[{i}]",
                                f"'{name}' is not a valid type; must be one of "
                                f"{', '.join(SCHEMA_TYPES)}")

    for kw in ("minItems", "maxItems", "minLength", "maxLength",
               "minContains", "maxContains"):
        if kw in node:
            v = node[kw]
            if not _is_int(v) or v < 0:
                raise SpecError(f"{path}.{kw}",
                                f"must be a non-negative integer, got {v!r}")
    for lo_kw, hi_kw in (("minItems", "maxItems"), ("minLength", "maxLength"),
                         ("minContains", "maxContains")):
        if lo_kw in node and hi_kw in node and node[lo_kw] > node[hi_kw]:
            raise SpecError(f"{path}.{lo_kw}",
                            f"{lo_kw} ({node[lo_kw]}) > {hi_kw} ({node[hi_kw]}) "
                            f"(reference rejects this: canner.cc:653-658)")

    for kw in ("minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum"):
        if kw in node and not _is_num(node[kw]):
            raise SpecError(f"{path}.{kw}", f"must be a number, got {node[kw]!r}")
    lo = node.get("minimum", node.get("exclusiveMinimum"))
    hi = node.get("maximum", node.get("exclusiveMaximum"))
    if lo is not None and hi is not None and lo > hi:
        raise SpecError(f"{path}.minimum", f"minimum ({lo}) > maximum ({hi})")

    if "pattern" in node and not isinstance(node["pattern"], str):
        raise SpecError(f"{path}.pattern", "must be a regex string")

    if "required" in node:
        req = node["required"]
        if not isinstance(req, list) or not all(isinstance(k, str) for k in req):
            raise SpecError(f"{path}.required", "must be a list of property names")

    if "enum" in node:
        vals = node["enum"]
        if not isinstance(vals, list) or not vals:
            raise SpecError(f"{path}.enum", "must be a non-empty list")
        for i, v in enumerate(vals):
            if v is None and len(vals) > 1 and all(
                x is None or (isinstance(x, str) and x == "") for x in vals
            ):
                raise SpecError(f"{path}.enum[{i}]",
                                "empty/None enum slot (sloppy spec; cf. "
                                "wccp.schema.json:85) — rejected")
        if any(isinstance(v, str) and v == "" for v in vals):
            raise SpecError(f"{path}.enum",
                            "empty-string enum slot (sloppy spec; cf. "
                            "wccp.schema.json:85) — rejected")

    if "properties" in node:
        props = node["properties"]
        if not isinstance(props, dict):
            raise SpecError(f"{path}.properties", "must be a map")
        for name, sub in props.items():
            validate_spec(sub, f"{path}.properties.{name}")

    if "items" in node:
        items = node["items"]
        if isinstance(items, bool):
            # 2020-12 boolean form: True is a no-op, False closes the
            # array beyond prefixItems (or to empty with no prefix)
            pass
        elif isinstance(items, dict):
            validate_spec(items, f"{path}.items")
        elif isinstance(items, list):
            if "prefixItems" in node:
                raise SpecError(
                    f"{path}.items",
                    "array-form items (draft-07 tuple) cannot be combined "
                    "with prefixItems (its 2020-12 spelling); pick one")
            for i, sub in enumerate(items):
                validate_spec(sub, f"{path}.items[{i}]")
        else:
            raise SpecError(f"{path}.items",
                            "must be a map, a list of maps, or a boolean")

    if "prefixItems" in node:
        pfx = node["prefixItems"]
        if not isinstance(pfx, list) or not pfx \
                or not all(isinstance(s, dict) for s in pfx):
            raise SpecError(f"{path}.prefixItems",
                            "must be a non-empty list of schema maps")
        for i, sub in enumerate(pfx):
            validate_spec(sub, f"{path}.prefixItems[{i}]")

    for comb in ("anyOf", "oneOf", "allOf"):
        if comb in node:
            subs = node[comb]
            if not isinstance(subs, list) or not subs:
                raise SpecError(f"{path}.{comb}", "must be a non-empty list")
            for i, sub in enumerate(subs):
                validate_spec(sub, f"{path}.{comb}[{i}]")

    for kw in ("unevaluatedProperties", "unevaluatedItems"):
        if kw in node:
            uv = node[kw]
            if isinstance(uv, dict):
                validate_spec(uv, f"{path}.{kw}")
            elif not isinstance(uv, bool):
                raise SpecError(f"{path}.{kw}",
                                "must be a boolean or a schema map")

    for kw in ("not", "if", "then", "else", "contains", "propertyNames"):
        if kw in node:
            if not isinstance(node[kw], dict):
                raise SpecError(f"{path}.{kw}", "must be a schema map")
            validate_spec(node[kw], f"{path}.{kw}")

    if "multipleOf" in node:
        v = node["multipleOf"]
        if not _is_num(v) or v <= 0:
            raise SpecError(f"{path}.multipleOf",
                            f"must be a positive number, got {v!r}")

    if "uniqueItems" in node and not isinstance(node["uniqueItems"], bool):
        raise SpecError(f"{path}.uniqueItems", "must be a boolean")

    for kw in ("minProperties", "maxProperties"):
        if kw in node:
            v = node[kw]
            if not _is_int(v) or v < 0:
                raise SpecError(f"{path}.{kw}",
                                f"must be a non-negative integer, got {v!r}")
    if ("minProperties" in node and "maxProperties" in node
            and node["minProperties"] > node["maxProperties"]):
        raise SpecError(f"{path}.minProperties",
                        f"minProperties ({node['minProperties']}) > "
                        f"maxProperties ({node['maxProperties']})")

    if "patternProperties" in node:
        pp = node["patternProperties"]
        if not isinstance(pp, dict):
            raise SpecError(f"{path}.patternProperties",
                            "must be a map of regex -> schema")
        for rx, sub in pp.items():
            try:
                _re.compile(rx)
            except _re.error as e:
                raise SpecError(f"{path}.patternProperties.{rx}",
                                f"invalid regex: {e}") from None
            validate_spec(sub, f"{path}.patternProperties.{rx}")

    if "additionalProperties" in node:
        ap = node["additionalProperties"]
        if isinstance(ap, dict):
            validate_spec(ap, f"{path}.additionalProperties")
        elif not isinstance(ap, bool):
            raise SpecError(f"{path}.additionalProperties",
                            "must be a boolean or a schema map")

    for kw in ("dependentRequired", "dependencies", "dependentSchemas"):
        if kw in node:
            deps = node[kw]
            if not isinstance(deps, dict):
                raise SpecError(f"{path}.{kw}", "must be a map")
            for col, dv in deps.items():
                if isinstance(dv, dict):
                    validate_spec(dv, f"{path}.{kw}.{col}")
                elif kw == "dependentSchemas":
                    # 2020-12 split the draft-07 dependencies union in
                    # two; the schema half accepts only schema maps
                    raise SpecError(f"{path}.{kw}.{col}",
                                    "must be a schema map")
                elif not (isinstance(dv, list)
                          and all(isinstance(d, str) for d in dv)):
                    raise SpecError(
                        f"{path}.{kw}.{col}",
                        "must be a list of column names or a schema map")

    if "$ref" in node:
        ref = node["$ref"]
        if not isinstance(ref, str) or not ref.startswith("#/"):
            raise SpecError(f"{path}.$ref",
                            f"must be a '#/...' JSON-pointer string, got {ref!r}")

    for defs_kw in ("definitions", "$defs"):   # $defs = 2020-12 spelling
        if defs_kw in node:
            defs = node[defs_kw]
            if not isinstance(defs, dict):
                raise SpecError(f"{path}.{defs_kw}", "must be a map")
            for name, sub in defs.items():
                validate_spec(sub, f"{path}.{defs_kw}.{name}")

    if "x-ref" in node:
        xr = node["x-ref"]
        if not isinstance(xr, dict) or "table" not in xr or "key" not in xr:
            raise SpecError(f"{path}.x-ref", "must be a map with 'table' and 'key'")

    if "x-drift" in node:
        xd = node["x-drift"]
        if not isinstance(xd, dict) or "column" not in xd:
            raise SpecError(f"{path}.x-drift", "must be a map with at least 'column'")

    if "x-assert" in node:
        entries = node["x-assert"]
        if isinstance(entries, dict):
            entries = [entries]
        if not isinstance(entries, list) or not entries:
            raise SpecError(f"{path}.x-assert",
                            "must be a map or a non-empty list of maps")
        for i, xa in enumerate(entries):
            p = f"{path}.x-assert[{i}]"
            if not isinstance(xa, dict) or "expr" not in xa:
                raise SpecError(p, "must be a map with at least 'expr'")
            if not isinstance(xa["expr"], str) or not xa["expr"].strip():
                raise SpecError(f"{p}.expr",
                                "must be a non-empty SQL boolean expression")
            if "id" in xa and not isinstance(xa["id"], str):
                raise SpecError(f"{p}.id", "must be a string")

    if "x-completeness" in node:
        entries = node["x-completeness"]
        if isinstance(entries, dict):
            entries = [entries]
        if not isinstance(entries, list) or not entries:
            raise SpecError(f"{path}.x-completeness",
                            "must be a map or a non-empty list of maps")
        for i, xc in enumerate(entries):
            p = f"{path}.x-completeness[{i}]"
            if not isinstance(xc, dict) or "column" not in xc:
                raise SpecError(p, "must be a map with at least 'column'")
            mnf = xc.get("max_null_frac", 0.0)
            if not (isinstance(mnf, (int, float)) and not isinstance(mnf, bool)
                    and 0.0 <= float(mnf) <= 1.0):
                raise SpecError(f"{p}.max_null_frac",
                                f"must be a fraction in [0, 1], got {mnf!r}")

    if "x-frequency" in node:
        entries = node["x-frequency"]
        if isinstance(entries, dict):
            entries = [entries]
        if not isinstance(entries, list) or not entries:
            raise SpecError(f"{path}.x-frequency",
                            "must be a map or a non-empty list of maps")
        for i, xf in enumerate(entries):
            p = f"{path}.x-frequency[{i}]"
            if not isinstance(xf, dict) or "column" not in xf:
                raise SpecError(p, "must be a map with at least 'column'")
            if "max_share" in xf:
                ms = xf["max_share"]
                if not (isinstance(ms, (int, float))
                        and not isinstance(ms, bool)
                        and 0.0 < float(ms) <= 1.0):
                    raise SpecError(f"{p}.max_share",
                                    f"must be a fraction in (0, 1], got "
                                    f"{ms!r}")
            if "min_distinct" in xf:
                md = xf["min_distinct"]
                if not (isinstance(md, int) and not isinstance(md, bool)
                        and md >= 1):
                    raise SpecError(f"{p}.min_distinct",
                                    f"must be a positive integer, got {md!r}")
            if not any(k in xf for k in ("max_share", "min_distinct")):
                raise SpecError(p, "needs at least one threshold "
                                   "(max_share, min_distinct)")

    if "x-anomaly" in node:
        entries = node["x-anomaly"]
        if isinstance(entries, dict):
            entries = [entries]
        if not isinstance(entries, list) or not entries:
            raise SpecError(f"{path}.x-anomaly",
                            "must be a map or a non-empty list of maps")
        for i, xn in enumerate(entries):
            p = f"{path}.x-anomaly[{i}]"
            if not isinstance(xn, dict) or "column" not in xn:
                raise SpecError(p, "must be a map with at least 'column'")
            if "z_max" in xn:
                z = xn["z_max"]
                if not (isinstance(z, (int, float))
                        and not isinstance(z, bool) and float(z) > 0):
                    raise SpecError(f"{p}.z_max",
                                    f"must be a positive number, got "
                                    f"{z!r}")

    if "x-audio-stats" in node:
        xa = node["x-audio-stats"]
        if not isinstance(xa, dict):
            raise SpecError(f"{path}.x-audio-stats", "must be a map")
        for key in ("max_clip_frac", "max_silence_frac"):
            if key in xa and not (isinstance(xa[key], (int, float))
                                  and 0.0 <= float(xa[key]) <= 1.0):
                raise SpecError(f"{path}.x-audio-stats.{key}",
                                f"must be a fraction in [0, 1], got "
                                f"{xa[key]!r}")
        if "min_rms_db" in xa and not isinstance(xa["min_rms_db"],
                                                 (int, float)):
            raise SpecError(f"{path}.x-audio-stats.min_rms_db",
                            f"must be a number, got {xa['min_rms_db']!r}")
        if not any(k in xa for k in ("max_clip_frac", "max_silence_frac",
                                     "min_rms_db")):
            raise SpecError(f"{path}.x-audio-stats",
                            "needs at least one threshold (max_clip_frac, "
                            "max_silence_frac, min_rms_db)")

    if "x-spectral" in node:
        xs = node["x-spectral"]
        if not isinstance(xs, dict):
            raise SpecError(f"{path}.x-spectral", "must be a map")
        for key in ("min_rolloff95_hz", "max_flatness"):
            if key in xs and not isinstance(xs[key], (int, float)):
                raise SpecError(f"{path}.x-spectral.{key}",
                                f"must be a number, got {xs[key]!r}")
        if "max_flatness" in xs and not 0.0 <= float(xs["max_flatness"]) <= 1.0:
            raise SpecError(f"{path}.x-spectral.max_flatness",
                            f"must be in [0, 1], got {xs['max_flatness']!r}")
        if not any(k in xs for k in ("min_rolloff95_hz", "max_flatness")):
            raise SpecError(f"{path}.x-spectral",
                            "needs at least one threshold "
                            "(min_rolloff95_hz, max_flatness)")


def resolve_ref(root: dict, ref: str, path: str) -> tuple[str, dict]:
    """Resolve a '#/definitions/x'-style JSON pointer against the root.

    Mirrors the reference's ``locate`` walk (canner.cc:831-856).
    Returns (mangled_name, target_node).
    """
    parts = ref[2:].split("/")
    node: Any = root
    for part in parts:
        if not isinstance(node, dict) or part not in node:
            raise SpecError(path, f"$ref '{ref}' does not resolve "
                                  f"(reference: canner.cc:781,897)")
        node = node[part]
    if not isinstance(node, dict):
        raise SpecError(path, f"$ref '{ref}' target is not a schema node")
    return "_".join(parts), node
