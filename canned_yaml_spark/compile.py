"""Spec → CheckSuite compiler (the ``canner`` analog).

The reference compiles a schema spec into specialized C++ once, at
generation time (/root/reference/canner/src/canner.cc:999-1103); every
schema constant is baked into the emitted code. This compiler does the
same thing one level up: it folds the spec into literal-bearing
``pyspark.sql.Column`` expression trees on the driver, and Catalyst's
ConstantFolding + Tungsten whole-stage codegen produce the actual
machine code. No RDDs, no custom Catalyst rules, no per-row Python.

Keyword evaluation order matches the reference's ``validate_node``
dispatcher (canner.cc:764-829): $ref → type → object properties →
array properties → anyOf → oneOf → enum; the range/pattern/length
keywords the reference's corpus uses but its generators silently drop
(SURVEY.md §2 #16) slot in right after ``type``.

Static elision: when the table schema already guarantees a constraint
(e.g. ``type: integer`` on an IntegerType column), the check is marked
``static_ok`` and costs nothing at runtime — the tabular analog of the
reference's redundant-guard elision (canner.cc:613-623,726-731).
"""

from __future__ import annotations

import re as _re

from functools import reduce
from operator import and_, or_
from typing import Any, Union

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from canned_yaml_spark.checks import (
    AnomalyCheck, AudioStatsCheck, CatDriftCheck, Check, CheckSuite,
    CompletenessCheck,
    DriftCheck, FrequencyCheck, LoudnessCheck, MonotonicCheck,
    PayloadCheck, QuantileCheck,
    RefCheck, MediaCheck, Severity, SpectralCheck, TranscriptCheck,
    UniqueCheck,
)
from canned_yaml_spark import formats as _formats
from canned_yaml_spark.errors import SpecError
from canned_yaml_spark.spec import load_spec, resolve_ref

# Keyword order inside one schema node, per the reference dispatcher
# (canner.cc:764-829) with the extension keywords slotted after type.
_KW_ORDER = {
    "$ref": 0, "type": 1,
    "minimum": 2, "exclusiveMinimum": 2, "maximum": 3, "exclusiveMaximum": 3,
    "pattern": 4, "minLength": 5, "maxLength": 6,
    "properties": 7, "required": 7,
    "minItems": 8, "maxItems": 9, "items": 10,
    "anyOf": 11, "oneOf": 12, "enum": 13,
    "allOf": 14, "not": 15, "if": 16,
    # draft-07 completion keywords (reference lacks all of these)
    "multipleOf": 3, "const": 13, "uniqueItems": 10, "contains": 10,
    "minProperties": 7, "maxProperties": 7, "propertyNames": 7,
    "format": 4, "x-repetition": 6,
    # 2020-12 spellings (prefixItems = tuple items; min/maxContains
    # bound the contains match count; dependentSchemas = the schema
    # half of draft-07's dependencies union)
    "prefixItems": 10, "minContains": 10, "maxContains": 10,
    # unevaluated* must see every sibling applicator's annotations, so
    # they dispatch last (2020-12 §11: "after all others")
    "unevaluatedProperties": 17, "unevaluatedItems": 17,
}

_ATOMIC = (T.StringType, T.BooleanType, T.BinaryType, T.DateType,
           T.TimestampType, T.NumericType)
_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)

#: Full-parse integer text, mirroring the reference's svtoi check
#: (canner.cc:1068-1079): entire trimmed text must parse.
_INT_RE = r"^\s*[+-]?[0-9]+\s*$"

StaticOrCol = Union[bool, Column]


def _first_line(exc: Exception) -> str:
    """First line of a JVM exception message (the human part; the rest
    is a stack trace that would bury the located SpecError)."""
    return str(exc).strip().splitlines()[0] if str(exc).strip() else repr(exc)


def _dt(dtype: T.DataType | None, *classes) -> bool:
    return dtype is not None and isinstance(dtype, classes)


class _Pred:
    """One keyword's compiled predicate on a value expression.

    ``ok`` is True (statically satisfied by the schema), False
    (statically unsatisfiable), or a boolean Column. ``message`` is a
    Column so combinators can emit dynamic text (oneOf's 0-vs->1)."""

    __slots__ = ("keyword", "rule_id", "ok", "message", "severity")

    def __init__(self, keyword: str, rule_id: str, ok: StaticOrCol,
                 message: Column | str, severity: Severity = Severity.ERROR):
        self.keyword = keyword
        self.rule_id = rule_id
        self.ok = ok
        self.message = F.lit(message) if isinstance(message, str) else message
        self.severity = severity


def _and_all(oks: list[StaticOrCol]) -> StaticOrCol:
    """Conjunction over static/Column predicates with folding."""
    if any(o is False for o in oks):
        return False
    cols = [o for o in oks if o is not True]
    if not cols:
        return True
    return reduce(and_, cols)


def _negate(ok: StaticOrCol) -> StaticOrCol:
    return (not ok) if isinstance(ok, bool) else ~ok


def _or_all(oks: list[StaticOrCol]) -> StaticOrCol:
    if any(o is True for o in oks):
        return True
    cols = [o for o in oks if o is not False]
    if not cols:
        return False
    return reduce(or_, cols)


class _Compiler:
    def __init__(self, root: dict, schema: T.StructType | None):
        self.root = root
        self.schema = schema
        self.suite = CheckSuite()
        self._order = 0
        self._ref_stack: list[str] = []
        # draft-07 §7: format is annotation-only unless the
        # implementation's assertion profile is opted into.
        self.assert_formats = bool(root.get("x-assert-formats", False))

    # ---------------------------------------------------------- helpers
    def _next_order(self) -> int:
        self._order += 1
        return self._order

    def warn(self, msg: str) -> None:
        self.suite.warnings.append(msg)

    # ------------------------------------------------------ value preds
    def value_preds(self, node: dict, expr: Column, dtype: T.DataType | None,
                    path: str) -> list[_Pred]:
        """Compile one schema node against a value expression.

        Returns one _Pred per constraint keyword present, in reference
        dispatcher order. NULL values are *not* gated here — the
        caller decides (top level gates on isNotNull; `required`
        covers presence), matching JSON-Schema semantics where an
        absent property is simply not validated.
        """
        if "$ref" in node:
            extra = [k for k in node if k not in ("$ref", "description", "title")]
            if extra:
                # Reference ignores $ref siblings with a warning
                # (canner.cc:772-784); we do the same.
                self.warn(f"{path}: keys {extra} ignored because of $ref "
                          f"(reference: canner.cc:772-784)")
            name, target = resolve_ref(self.root, node["$ref"], path)
            if name in self._ref_stack:
                raise SpecError(path, f"$ref cycle through '{name}'")
            self._ref_stack.append(name)
            try:
                # compile at the CALL-SITE path: violations stay
                # located at the property that failed, not the shared
                # definition (the reference's errata carry call-site
                # context the same way; definitions are still compiled
                # per site — Catalyst CSE dedups identical subtrees)
                preds = self.value_preds(target, expr, dtype, path)
            finally:
                self._ref_stack.pop()
            return preds

        preds: list[_Pred] = []
        add = preds.append
        sev = Severity[node.get("x-severity", "ERROR").upper()]

        if "type" in node:
            names = node["type"] if isinstance(node["type"], list) else [node["type"]]
            ok = _or_all([self._type_ok(n, expr, dtype) for n in names])
            add(_Pred("type", f"{path}.type", ok,
                      f"value is not of type {'/'.join(names)}", sev))

        num = self._as_number(expr, dtype)
        if "minimum" in node:
            add(_Pred("minimum", f"{path}.minimum",
                      False if num is None else num >= F.lit(node["minimum"]),
                      f"value < minimum {node['minimum']}", sev))
        if "exclusiveMinimum" in node:
            add(_Pred("minimum", f"{path}.exclusiveMinimum",
                      False if num is None else num > F.lit(node["exclusiveMinimum"]),
                      f"value <= exclusiveMinimum {node['exclusiveMinimum']}", sev))
        if "maximum" in node:
            add(_Pred("maximum", f"{path}.maximum",
                      False if num is None else num <= F.lit(node["maximum"]),
                      f"value > maximum {node['maximum']}", sev))
        if "exclusiveMaximum" in node:
            add(_Pred("maximum", f"{path}.exclusiveMaximum",
                      False if num is None else num < F.lit(node["exclusiveMaximum"]),
                      f"value >= exclusiveMaximum {node['exclusiveMaximum']}", sev))

        scalar_ok = dtype is None or _dt(dtype, _ATOMIC)
        if "pattern" in node:
            ok: StaticOrCol
            if not scalar_ok:
                # pattern on a non-scalar value is unsatisfiable — the
                # branch folds to False (cf. the reference's type
                # guards, canner.cc:613-623)
                ok = False
            elif _dt(dtype, T.StringType) or dtype is None:
                ok = expr.rlike(node["pattern"])
            else:
                ok = expr.cast("string").rlike(node["pattern"])
            add(_Pred("pattern", f"{path}.pattern", ok,
                      f"value does not match pattern {node['pattern']!r}", sev))

        if "format" in node:
            fmt = node["format"]
            if not isinstance(fmt, str):
                raise SpecError(f"{path}.format", "format must be a string")
            if not self.assert_formats:
                # draft-07 default: annotation only — no predicate
                self.warn(f"{path}.format: '{fmt}' is annotation-only "
                          f"(set root x-assert-formats: true to assert)")
            elif fmt not in _formats.FORMATS:
                self.warn(f"{path}.format: unknown format {fmt!r} ignored "
                          f"(draft-07 §7.1: SHOULD ignore)")
            elif not (_dt(dtype, T.StringType) or dtype is None):
                # format constrains string instances only; any other
                # type passes vacuously (draft-07 §7.3) — elide
                self.warn(f"{path}.format: non-string value; statically "
                          f"passes (format applies to strings)")
            else:
                add(_Pred("format", f"{path}.format",
                          _formats.format_ok_column(fmt, expr),
                          f"value is not a valid {fmt}", sev))

        if "x-repetition" in node:
            # extension rule: duplicate n-gram fraction ceiling — the
            # Gopher-style degenerate-repetition gate as a VALUE
            # keyword, composing into the row suite's codegen span
            # like pattern/length (textops.dup_ngram_frac is pure
            # Column HOF algebra).
            xr = node["x-repetition"]
            if not isinstance(xr, dict) or "max_frac" not in xr:
                raise SpecError(f"{path}.x-repetition",
                                "x-repetition needs {max_frac, n?}")
            rep_n = xr.get("n", 2)
            if not isinstance(rep_n, int) or rep_n < 1:
                raise SpecError(f"{path}.x-repetition.n",
                                "n must be an integer >= 1")
            mf = xr["max_frac"]
            if not isinstance(mf, (int, float)) or not 0.0 <= mf <= 1.0:
                raise SpecError(f"{path}.x-repetition.max_frac",
                                "max_frac must be in [0, 1]")
            # severity may ride inside the rule dict (like the other
            # x- extension rules) or fall back to the node's x-severity
            rep_sev = (Severity[xr["severity"].upper()]
                       if "severity" in xr else sev)
            if not (_dt(dtype, T.StringType) or dtype is None):
                self.warn(f"{path}.x-repetition: non-string value; "
                          f"statically passes")
            else:
                from canned_yaml_spark import textops as _textops
                add(_Pred("x-repetition", f"{path}.x-repetition",
                          _textops.dup_ngram_frac(expr, rep_n)
                          <= F.lit(float(mf)),
                          f"duplicate {rep_n}-gram fraction > {mf}",
                          rep_sev))

        if "minLength" in node:
            add(_Pred("minLength", f"{path}.minLength",
                      (F.length(expr) >= F.lit(node["minLength"]))
                      if scalar_ok else False,
                      f"length < minLength {node['minLength']}", sev))
        if "maxLength" in node:
            add(_Pred("maxLength", f"{path}.maxLength",
                      (F.length(expr) <= F.lit(node["maxLength"]))
                      if scalar_ok else False,
                      f"length > maxLength {node['maxLength']}", sev))

        if any(kw in node for kw in ("properties", "required",
                                     "patternProperties",
                                     "additionalProperties")):
            preds.extend(self._object_preds(node, expr, dtype, path, sev))

        is_arr = _dt(dtype, T.ArrayType) or dtype is None
        if "minItems" in node:
            add(_Pred("minItems", f"{path}.minItems",
                      (F.size(expr) >= F.lit(node["minItems"])) if is_arr else False,
                      f"fewer than minItems {node['minItems']} elements "
                      f"(reference: canner.cc:360-376)", sev))
        if "maxItems" in node:
            add(_Pred("maxItems", f"{path}.maxItems",
                      (F.size(expr) <= F.lit(node["maxItems"])) if is_arr else False,
                      f"more than maxItems {node['maxItems']} elements", sev))
        if "items" in node or "prefixItems" in node:
            preds.extend(self._items_preds(node, expr, dtype, path, sev))

        if "unevaluatedProperties" in node:
            preds.extend(self._unevaluated_props_preds(node, expr, dtype,
                                                       path, sev))
        if "unevaluatedItems" in node:
            preds.extend(self._unevaluated_items_preds(node, expr, dtype,
                                                       path, sev))

        if "anyOf" in node:
            child_oks = [
                self._node_ok(sub, expr, dtype, f"{path}.anyOf[{i}]")
                for i, sub in enumerate(node["anyOf"])
            ]
            add(_Pred("anyOf", f"{path}.anyOf", _or_all(child_oks),
                      f"anyOf: none of {len(child_oks)} branches matched "
                      f"(reference: canner.cc:469-514)", sev))

        if "oneOf" in node:
            child_oks = [
                self._node_ok(sub, expr, dtype, f"{path}.oneOf[{i}]")
                for i, sub in enumerate(node["oneOf"])
            ]
            n = len(child_oks)
            statics = sum(1 for o in child_oks if o is True)
            cols = [o for o in child_oks if isinstance(o, Column)]
            if statics > 1:
                ok: StaticOrCol = False     # >1 branches always match
                msg: Column | str = f"oneOf: {statics} branches always match"
            elif not cols:
                ok = statics == 1
                msg = "oneOf: no branch matched"
            else:
                matches = reduce(
                    lambda a, b: a + b,
                    [o.cast("int") for o in cols],
                    F.lit(statics),
                )
                ok = matches == 1
                # 0 matches vs >1 matches are distinct errors in the
                # reference (canner.cc:540-559); keep that distinction.
                msg = F.when(matches == 0, F.lit(
                    f"oneOf: none of {n} branches matched"))\
                    .otherwise(F.concat(F.lit("oneOf: "), matches.cast("string"),
                                        F.lit(f" of {n} branches matched")))
            add(_Pred("oneOf", f"{path}.oneOf", ok, msg, sev))

        if "allOf" in node:
            # draft-07 applicator the reference lacks (its generator
            # stops at anyOf/oneOf — canner.cc:469-559); one located
            # predicate per branch, so a violation names WHICH branch
            for i, sub in enumerate(node["allOf"]):
                ok = self._node_ok(sub, expr, dtype, f"{path}.allOf[{i}]")
                add(_Pred("allOf", f"{path}.allOf[{i}]", ok,
                          f"allOf: branch {i} did not match", sev))

        if "not" in node:
            ok = self._node_ok(node["not"], expr, dtype, f"{path}.not")
            add(_Pred("not", f"{path}.not", _negate(ok),
                      "not: forbidden schema matched", sev))

        if "if" in node:
            # (if → then) ∧ (¬if → else); absent then/else validate.
            # The useful root form is the cross-column conditional —
            # compile_root lifts these keywords over a whole-row struct.
            cond = self._node_ok(node["if"], expr, dtype, f"{path}.if")
            then_ok = (self._node_ok(node["then"], expr, dtype,
                                     f"{path}.then")
                       if "then" in node else True)
            else_ok = (self._node_ok(node["else"], expr, dtype,
                                     f"{path}.else")
                       if "else" in node else True)
            ok = _and_all([_or_all([_negate(cond), then_ok]),
                           _or_all([cond, else_ok])])
            if isinstance(cond, Column):
                msg: Column | str = F.when(
                    cond, F.lit("conditional: 'then' schema failed")) \
                    .otherwise(F.lit("conditional: 'else' schema failed"))
            else:
                msg = ("conditional: 'then' schema failed" if cond
                       else "conditional: 'else' schema failed")
            add(_Pred("if", f"{path}.if", ok, msg, sev))

        if "enum" in node:
            add(_Pred("enum", f"{path}.enum",
                      self._enum_ok(node["enum"], expr, dtype, path),
                      f"value not in enum {node['enum']!r} "
                      f"(reference: canner.cc:564-605)", sev))

        if "const" in node:
            # draft-07 const ≡ single-element enum (same deep equality)
            add(_Pred("const", f"{path}.const",
                      self._enum_ok([node["const"]], expr, dtype, path),
                      f"value != const {node['const']!r}", sev))

        if "multipleOf" in node:
            d = node["multipleOf"]
            if not isinstance(d, (int, float)) or isinstance(d, bool) \
                    or d <= 0:
                raise SpecError(f"{path}.multipleOf",
                                "multipleOf must be a positive number")
            if num is None:
                ok = False
            elif isinstance(d, int):
                ok = num % F.lit(d) == 0
            else:
                # float divisor: integrality of the quotient, with an
                # epsilon for binary representation (0.3 / 0.1)
                q = num / F.lit(float(d))
                ok = F.abs(q - F.round(q)) < F.lit(1e-9)
            add(_Pred("multipleOf", f"{path}.multipleOf", ok,
                      f"value is not a multiple of {d}", sev))

        if node.get("uniqueItems"):
            add(_Pred("uniqueItems", f"{path}.uniqueItems",
                      (F.size(F.array_distinct(expr)) == F.size(expr))
                      if is_arr else False,
                      "array elements are not unique", sev))

        if "contains" in node:
            sub = node["contains"]
            minc = node.get("minContains")
            maxc = node.get("maxContains")
            elem_t = (dtype.elementType if _dt(dtype, T.ArrayType)
                      else None)

            def _contains_elem_ok(x: Column) -> Column:
                r = self._node_ok(sub, x, elem_t, f"{path}.contains")
                return F.lit(r) if isinstance(r, bool) else r

            if not is_arr:
                add(_Pred("contains", f"{path}.contains", False,
                          "contains constraint on non-array value", sev))
            elif minc is None and maxc is None:
                # 3-valued exists: any TRUE → pass; no TRUE and a NULL
                # outcome → NULL → pass at the gated top level (an
                # unjudgeable element never convicts the row)
                add(_Pred("contains", f"{path}.contains",
                          F.exists(expr, _contains_elem_ok),
                          "no array element matches the contains schema",
                          sev))
            else:
                # 2020-12 min/maxContains: bound the MATCH COUNT. The
                # same never-convict 3VL, now on counts: an unjudgeable
                # element counts toward minContains (optimistic) but
                # not toward maxContains (only definite matches can
                # exceed the ceiling).
                definite = F.size(F.filter(
                    expr,
                    lambda x: F.coalesce(_contains_elem_ok(x), F.lit(False))))
                possible = F.size(F.filter(
                    expr,
                    lambda x: F.coalesce(_contains_elem_ok(x), F.lit(True))))
                eff_min = 1 if minc is None else minc
                if eff_min > 0:     # minContains: 0 → contains always ok
                    kw = "contains" if minc is None else "minContains"
                    add(_Pred(kw, f"{path}.{kw}",
                              possible >= F.lit(eff_min),
                              f"fewer than {eff_min} array elements match "
                              f"the contains schema", sev))
                if maxc is not None:
                    add(_Pred("maxContains", f"{path}.maxContains",
                              definite <= F.lit(maxc),
                              f"more than {maxc} array elements match "
                              f"the contains schema", sev))
        elif "minContains" in node or "maxContains" in node:
            self.warn(f"{path}: min/maxContains without contains has no "
                      f"effect (2020-12 §6.4.4-6.4.5); skipped")

        if "minProperties" in node or "maxProperties" in node:
            nprops: Column | None
            if _dt(dtype, T.MapType):
                nprops = F.size(expr)
            elif _dt(dtype, T.StructType):
                # struct: a field counts as present when non-NULL (the
                # same column↔key convention as required/closed-world)
                nprops = reduce(
                    lambda a, b: a + b,
                    [expr.getField(f.name).isNotNull().cast("int")
                     for f in dtype.fields], F.lit(0))
            else:
                self.warn(f"{path}: min/maxProperties on non-object value; "
                          f"statically violated")
                nprops = None
            if "minProperties" in node:
                add(_Pred("minProperties", f"{path}.minProperties",
                          False if nprops is None
                          else nprops >= F.lit(node["minProperties"]),
                          f"fewer than minProperties "
                          f"{node['minProperties']} keys", sev))
            if "maxProperties" in node:
                add(_Pred("maxProperties", f"{path}.maxProperties",
                          False if nprops is None
                          else nprops <= F.lit(node["maxProperties"]),
                          f"more than maxProperties "
                          f"{node['maxProperties']} keys", sev))

        if "propertyNames" in node:
            sub = node["propertyNames"]
            if _dt(dtype, T.MapType):

                def _key_ok(k: Column) -> Column:
                    r = self._node_ok(sub, k, dtype.keyType,
                                      f"{path}.propertyNames")
                    return F.lit(r) if isinstance(r, bool) else r

                ok = F.forall(F.map_keys(expr), _key_ok)
            elif _dt(dtype, T.StructType):
                # field names are compile-time constants; Catalyst
                # constant-folds each literal check to true/false
                ok = _and_all([
                    self._node_ok(sub, F.lit(f.name), T.StringType(),
                                  f"{path}.propertyNames")
                    for f in dtype.fields])
            else:
                self.warn(f"{path}.propertyNames on non-object value; "
                          f"statically violated")
                ok = False
            add(_Pred("propertyNames", f"{path}.propertyNames", ok,
                      "a key violates the propertyNames schema", sev))

        preds.sort(key=lambda p: _KW_ORDER.get(p.keyword, 99))
        return preds

    def _node_ok(self, node: dict, expr: Column, dtype: T.DataType | None,
                 path: str) -> StaticOrCol:
        """A sub-schema 'matches' iff all its keyword predicates pass.
        Used by anyOf/oneOf branches (canner.cc:481-511: each branch is
        one lambda returning a single bool)."""
        preds = self.value_preds(node, expr, dtype, path)
        return _and_all([p.ok for p in preds])

    # ----------------------------------------------------------- object
    def _object_preds(self, node: dict, expr: Column,
                      dtype: T.DataType | None, path: str,
                      sev: Severity) -> list[_Pred]:
        """Nested object (StructType / MapType column) properties.

        Top-level (root) properties are handled separately in
        compile_root — there, properties are table columns.
        """
        preds: list[_Pred] = []
        if _dt(dtype, T.StructType):
            fields = {f.name: f.dataType for f in dtype.fields}
            for k in node.get("required", []):
                ok: StaticOrCol = (expr.getField(k).isNotNull()
                                   if k in fields else False)
                preds.append(_Pred("required", f"{path}.required.{k}", ok,
                                   f"required key '{k}' missing "
                                   f"(reference: canner.cc:378-398)", sev))
            for k, sub in node.get("properties", {}).items():
                if k not in fields:
                    self.warn(f"{path}.properties.{k}: field absent from struct; "
                              f"skipped (open-world, canner.cc:741-756)")
                    continue
                child = expr.getField(k)
                for p in self.value_preds(sub, child, fields[k],
                                          f"{path}.properties.{k}"):
                    gated = p.ok if isinstance(p.ok, bool) else \
                        (child.isNull() | p.ok)
                    preds.append(_Pred("properties", p.rule_id, gated,
                                       p.message, p.severity))
            # patternProperties / additionalProperties on a struct:
            # field names are compile-time constants, so pattern
            # matching happens at compile time and each covered field
            # gets its own located predicates (no runtime regex).
            pat_rxs = list(node.get("patternProperties", {}))
            for rx, sub in node.get("patternProperties", {}).items():
                for k, ftype in fields.items():
                    if not _re.search(rx, k):
                        continue
                    child = expr.getField(k)
                    for p in self.value_preds(
                            sub, child, ftype,
                            f"{path}.patternProperties.{rx}.{k}"):
                        gated = p.ok if isinstance(p.ok, bool) else \
                            (child.isNull() | p.ok)
                        preds.append(_Pred("patternProperties", p.rule_id,
                                           gated, p.message, p.severity))
            if "additionalProperties" in node:
                ap = node["additionalProperties"]
                declared = set(node.get("properties", {}))
                extras = [k for k in fields if k not in declared
                          and not any(_re.search(rx, k) for rx in pat_rxs)]
                for k in extras:
                    child = expr.getField(k)
                    if ap is False:
                        # present ⇔ non-NULL, the engine-wide convention
                        preds.append(_Pred(
                            "additionalProperties",
                            f"{path}.additionalProperties.{k}",
                            child.isNull(),
                            f"undeclared key '{k}' present", sev))
                    elif isinstance(ap, dict):
                        for p in self.value_preds(
                                ap, child, fields[k],
                                f"{path}.additionalProperties.{k}"):
                            gated = p.ok if isinstance(p.ok, bool) else \
                                (child.isNull() | p.ok)
                            preds.append(_Pred("additionalProperties",
                                               p.rule_id, gated,
                                               p.message, p.severity))
        elif _dt(dtype, T.MapType):
            for k in node.get("required", []):
                preds.append(_Pred("required", f"{path}.required.{k}",
                                   F.map_contains_key(expr, F.lit(k)),
                                   f"required key '{k}' missing", sev))
            for k, sub in node.get("properties", {}).items():
                child = F.try_element_at(expr, F.lit(k))
                for p in self.value_preds(sub, child, dtype.valueType,
                                          f"{path}.properties.{k}"):
                    gated = p.ok if isinstance(p.ok, bool) else \
                        (child.isNull() | p.ok)
                    preds.append(_Pred("properties", p.rule_id, gated,
                                       p.message, p.severity))
            # patternProperties / additionalProperties on a map: keys
            # are runtime values — one forall over map_entries per
            # rule, the same no-explode algebra as uniform items.
            # A NULL entry VALUE validates (absent-property semantics;
            # key presence is `required`'s job), matching the gated
            # struct path above.
            pat_rxs = list(node.get("patternProperties", {}))
            vt = dtype.valueType
            def _pat_pred(rx: str, sub: dict) -> _Pred:
                # factory so each forall lambda closes over its own
                # (rx, sub) — PySpark HOF lambdas must take exactly the
                # element argument, no defaulted closure params
                rpath = f"{path}.patternProperties.{rx}"

                def _entry_ok(e: Column) -> Column:
                    v = e.getField("value")
                    r = self._node_ok(sub, v, vt, rpath)
                    rr = F.lit(r) if isinstance(r, bool) else r
                    return (~e.getField("key").rlike(rx)
                            | v.isNull() | rr)

                return _Pred(
                    "patternProperties", rpath,
                    F.forall(F.map_entries(expr), _entry_ok),
                    f"a value under a key matching /{rx}/ violates its "
                    f"schema", sev)

            for rx, sub in node.get("patternProperties", {}).items():
                preds.append(_pat_pred(rx, sub))
            if "additionalProperties" in node:
                ap = node["additionalProperties"]
                declared = sorted(node.get("properties", {}))

                def _covered(k: Column) -> Column:
                    c = (k.isin(declared) if declared
                         else F.lit(False))
                    for rx in pat_rxs:
                        c = c | k.rlike(rx)
                    return c

                if ap is False:
                    preds.append(_Pred(
                        "additionalProperties",
                        f"{path}.additionalProperties",
                        F.forall(F.map_keys(expr), _covered),
                        "an undeclared key is present "
                        "(additionalProperties: false)", sev))
                elif isinstance(ap, dict):
                    apath = f"{path}.additionalProperties"

                    def _extra_entry_ok(e: Column) -> Column:
                        v = e.getField("value")
                        r = self._node_ok(ap, v, vt, apath)
                        rr = F.lit(r) if isinstance(r, bool) else r
                        return (_covered(e.getField("key"))
                                | v.isNull() | rr)

                    preds.append(_Pred(
                        "additionalProperties", apath,
                        F.forall(F.map_entries(expr), _extra_entry_ok),
                        "a value under an undeclared key violates the "
                        "additionalProperties schema", sev))
        else:
            # 'object' keywords on a non-object value: the reference
            # guards with is_object_type (canner.cc:726-731) and the
            # checks simply never fire; same here.
            if dtype is not None:
                self.warn(f"{path}: object keywords on non-struct value; elided")
        return preds

    # ------------------------------------------------------------ items
    def _items_preds(self, node: dict, expr: Column,
                     dtype: T.DataType | None, path: str,
                     sev: Severity) -> list[_Pred]:
        preds: list[_Pred] = []
        if not (_dt(dtype, T.ArrayType) or dtype is None):
            self.warn(f"{path}.items: on non-array value; statically violated")
            preds.append(_Pred("items", f"{path}.items", False,
                               "items constraint on non-array value", sev))
            return preds
        elem_t = dtype.elementType if _dt(dtype, T.ArrayType) else None
        items = node.get("items")
        prefix = node.get("prefixItems")

        def _uniform(sub: dict, value: Column, rule_id: str, msg: str) -> None:
            # Uniform items: every element validates (canner.cc:662-672)
            # → higher-order forall, no explode/shuffle.
            def elem_ok(x: Column) -> Column:
                ok = self._node_ok(sub, x, elem_t, rule_id)
                if ok is True:
                    return F.lit(True)
                if ok is False:
                    return F.lit(False)
                return x.isNull() | ok
            preds.append(_Pred("items", rule_id, F.forall(value, elem_ok),
                               msg, sev))

        def _positional(subs: list, kw: str) -> None:
            for i, sub in enumerate(subs):
                elem = F.get(expr, i)      # 0-based, NULL when out of range
                ok = self._node_ok(sub, elem, elem_t, f"{path}.{kw}[{i}]")
                if isinstance(ok, Column):
                    # Short arrays don't violate positional schemas
                    # (the reference switches on size, canner.cc:690-704).
                    ok = (F.size(expr) <= i) | elem.isNull() | ok
                preds.append(_Pred(kw, f"{path}.{kw}[{i}]", ok,
                                   f"element {i} violates its {kw} schema",
                                   sev))

        if prefix is not None:
            # 2020-12 §10.3.1.1-2: prefixItems is positional; `items`
            # then governs only elements PAST the prefix — a schema
            # validates the rest uniformly (forall over a slice, still
            # no explode), False forbids any rest.
            _positional(prefix, "prefixItems")
            n = len(prefix)
            if isinstance(items, dict):
                rest = F.slice(expr, F.lit(n + 1),
                               F.greatest(F.size(expr) - F.lit(n), F.lit(0)))
                _uniform(items, rest, f"{path}.items",
                         f"an element past prefixItems[{n - 1}] violates "
                         f"the items schema")
            elif items is False:
                preds.append(_Pred("items", f"{path}.items",
                                   F.size(expr) <= F.lit(n),
                                   f"more than the {n} prefixItems elements "
                                   f"(items: false)", sev))
        elif items is False:
            # closed array with no prefix: must be empty
            preds.append(_Pred("items", f"{path}.items",
                               F.size(expr) == F.lit(0),
                               "non-empty array (items: false)", sev))
        elif isinstance(items, dict):
            _uniform(items, expr, f"{path}.items",
                     "an element violates the items schema "
                     "(reference: canner.cc:662-672)")
        elif isinstance(items, list):
            # Positional/tuple items, draft-07 spelling (canner.cc:
            # 673-705): schemas beyond maxItems are dropped with a
            # warning (canner.cc:676-681).
            subs = items
            max_items = node.get("maxItems")
            if max_items is not None and len(subs) > max_items:
                self.warn(f"{path}.items: {len(subs) - max_items} tuple schemas "
                          f"beyond maxItems dropped (reference: canner.cc:676-681)")
                subs = subs[:max_items]
            _positional(subs, "items")
        return preds

    # ----------------------------------------- 2020-12 unevaluated*
    def _truthy(self, ok: StaticOrCol) -> StaticOrCol:
        """3VL → 2VL for annotation gating: an unjudgeable branch
        verdict means the branch's annotations do NOT flow."""
        return ok if isinstance(ok, bool) else F.coalesce(ok, F.lit(False))

    def _applied_subschemas(self, node: dict, expr: Column,
                            dtype: T.DataType | None, path: str
                            ) -> list[tuple[dict, StaticOrCol, str]]:
        """(subschema, appliesOk, subpath) for every in-place applicator
        branch whose annotations flow per 2020-12 §11: each branch is
        gated on its applicability AND on the branch validating (a
        failed anyOf arm contributes no annotations). `not` never
        contributes (its subschema must fail); nested dependentSchemas
        are a root-only construct in this engine and are documented out.
        """
        out: list[tuple[dict, StaticOrCol, str]] = []
        if "$ref" in node:
            name, target = resolve_ref(self.root, node["$ref"], path)
            if name not in self._ref_stack:
                self._ref_stack.append(name)
                try:
                    ok = self._node_ok(target, expr, dtype, path)
                    out.append((target, ok, path))
                finally:
                    self._ref_stack.pop()
            return out       # $ref siblings are ignored engine-wide
        for comb in ("allOf", "anyOf", "oneOf"):
            for i, sub in enumerate(node.get(comb, [])):
                sp = f"{path}.{comb}[{i}]"
                out.append((sub, self._node_ok(sub, expr, dtype, sp), sp))
        if "if" in node:
            cif = self._truthy(
                self._node_ok(node["if"], expr, dtype, f"{path}.if"))
            out.append((node["if"], cif, f"{path}.if"))
            if "then" in node:
                tok = self._node_ok(node["then"], expr, dtype,
                                    f"{path}.then")
                out.append((node["then"],
                            _and_all([cif, self._truthy(tok)]),
                            f"{path}.then"))
            if "else" in node:
                eok = self._node_ok(node["else"], expr, dtype,
                                    f"{path}.else")
                out.append((node["else"],
                            _and_all([_negate(cif), self._truthy(eok)]),
                            f"{path}.else"))
        return out

    def _prop_claims(self, node: dict, expr: Column,
                     dtype: T.DataType | None, path: str, _depth: int = 0
                     ) -> list[tuple[StaticOrCol, frozenset, tuple, bool]]:
        """Annotation claims over object KEYS: (applies, names, rxs,
        covers_all). covers_all is the additionalProperties annotation
        — when present, the claiming schema evaluates every key."""
        claims = [(True, frozenset(node.get("properties", {})),
                   tuple(node.get("patternProperties", {})),
                   "additionalProperties" in node
                   # a SUBSCHEMA's own unevaluatedProperties claims all
                   # keys for outer scopes; the node being compiled
                   # must not pre-claim its own keys (depth 0)
                   or (_depth > 0 and "unevaluatedProperties" in node))]
        if _depth >= 8:      # depth bound; $ref cycles guarded by stack
            return claims
        for sub, applies, sp in self._applied_subschemas(
                node, expr, dtype, path):
            a1 = self._truthy(applies)
            for a2, names, rxs, al in self._prop_claims(
                    sub, expr, dtype, sp, _depth + 1):
                claims.append((_and_all([a1, self._truthy(a2)]),
                               names, rxs, al))
        return claims

    def _item_claims(self, node: dict, expr: Column,
                     dtype: T.DataType | None, path: str, _depth: int = 0
                     ) -> list[tuple[StaticOrCol, int, bool, dict | None]]:
        """Annotation claims over array ELEMENTS: (applies, n_prefix,
        covers_rest, contains_schema). prefixItems / draft-07 tuple
        items claim positions < n; a schema/bool `items` (or a nested
        unevaluatedItems) claims everything; `contains` claims exactly
        the elements that match it (2020-12 §11.2)."""
        items = node.get("items")
        n_pfx = len(node.get("prefixItems",
                             items if isinstance(items, list) else []))
        covers_rest = ("items" in node and not isinstance(items, list)) \
            or (_depth > 0 and "unevaluatedItems" in node)
        claims = [(True, n_pfx, covers_rest, node.get("contains"))]
        if _depth >= 8:
            return claims
        for sub, applies, sp in self._applied_subschemas(
                node, expr, dtype, path):
            a1 = self._truthy(applies)
            for a2, n2, al2, c2 in self._item_claims(
                    sub, expr, dtype, sp, _depth + 1):
                claims.append((_and_all([a1, self._truthy(a2)]),
                               n2, al2, c2))
        return claims

    def _unevaluated_props_preds(self, node: dict, expr: Column,
                                 dtype: T.DataType | None, path: str,
                                 sev: Severity) -> list[_Pred]:
        uv = node["unevaluatedProperties"]
        preds: list[_Pred] = []
        if uv is True:
            return preds     # everything may remain unevaluated
        claims = self._prop_claims(node, expr, dtype, path)
        # static shortcut: an unconditionally-applying claim that
        # covers every key makes the keyword vacuous
        if any(a is True and al for a, _, _, al in claims[1:]):
            return preds
        if _dt(dtype, T.StructType):
            # field names are compile-time constants: the only dynamic
            # part is each claim's applicability Column
            for f in dtype.fields:
                k = f.name
                terms = [a for a, names, rxs, al in claims
                         if al or k in names
                         or any(_re.search(rx, k) for rx in rxs)]
                claimed = self._truthy(_or_all(terms)) if terms else False
                if claimed is True:
                    continue
                child = expr.getField(k)
                claimed_c = F.lit(False) if claimed is False else claimed
                if uv is False:
                    preds.append(_Pred(
                        "unevaluatedProperties",
                        f"{path}.unevaluatedProperties.{k}",
                        child.isNull() | claimed_c,
                        f"key '{k}' is unevaluated "
                        f"(unevaluatedProperties: false)", sev))
                else:
                    for p in self.value_preds(
                            uv, child, f.dataType,
                            f"{path}.unevaluatedProperties.{k}"):
                        gated = p.ok if isinstance(p.ok, bool) else \
                            (child.isNull() | claimed_c | p.ok)
                        preds.append(_Pred("unevaluatedProperties",
                                           p.rule_id, gated, p.message,
                                           p.severity))
        elif _dt(dtype, T.MapType):
            vt = dtype.valueType

            def _claimed_key(kcol: Column) -> Column:
                terms = []
                for a, names, rxs, al in claims:
                    if al:
                        cov: Column = F.lit(True)
                    else:
                        cov = (kcol.isin(*sorted(names)) if names
                               else F.lit(False))
                        for rx in rxs:
                            cov = cov | kcol.rlike(rx)
                    ac = F.lit(a) if isinstance(a, bool) else a
                    terms.append(ac & cov)
                out = terms[0]
                for t in terms[1:]:
                    out = out | t
                return F.coalesce(out, F.lit(False))

            if uv is False:
                preds.append(_Pred(
                    "unevaluatedProperties",
                    f"{path}.unevaluatedProperties",
                    F.forall(F.map_keys(expr), _claimed_key),
                    "an unevaluated key is present "
                    "(unevaluatedProperties: false)", sev))
            else:
                upath = f"{path}.unevaluatedProperties"

                def _entry_ok(e: Column) -> Column:
                    v = e.getField("value")
                    r = self._node_ok(uv, v, vt, upath)
                    rr = F.lit(r) if isinstance(r, bool) else r
                    return (_claimed_key(e.getField("key"))
                            | v.isNull() | rr)

                preds.append(_Pred(
                    "unevaluatedProperties", upath,
                    F.forall(F.map_entries(expr), _entry_ok),
                    "a value under an unevaluated key violates the "
                    "unevaluatedProperties schema", sev))
        elif dtype is not None:
            self.warn(f"{path}: unevaluatedProperties on non-object "
                      f"value; elided")
        return preds

    def _unevaluated_items_preds(self, node: dict, expr: Column,
                                 dtype: T.DataType | None, path: str,
                                 sev: Severity) -> list[_Pred]:
        uv = node["unevaluatedItems"]
        preds: list[_Pred] = []
        if uv is True:
            return preds
        if not (_dt(dtype, T.ArrayType) or dtype is None):
            self.warn(f"{path}.unevaluatedItems: on non-array value; "
                      f"statically violated")
            preds.append(_Pred("unevaluatedItems",
                               f"{path}.unevaluatedItems", False,
                               "unevaluatedItems on non-array value", sev))
            return preds
        elem_t = dtype.elementType if _dt(dtype, T.ArrayType) else None
        claims = self._item_claims(node, expr, dtype, path)
        if any(a is True and al for a, _, al, _ in claims):
            return preds     # statically all-evaluated: vacuous

        def _claimed(x: Column, i: Column) -> Column:
            terms = []
            for a, n_pfx, al, csub in claims:
                if al:
                    cov: Column = F.lit(True)
                else:
                    cov = F.lit(False)
                    if n_pfx:
                        cov = cov | (i < F.lit(n_pfx))
                    if csub is not None:
                        r = self._node_ok(csub, x, elem_t,
                                          f"{path}.unevaluatedItems")
                        rr = F.lit(r) if isinstance(r, bool) else \
                            F.coalesce(r, F.lit(False))
                        cov = cov | rr
                ac = F.lit(a) if isinstance(a, bool) else a
                terms.append(ac & cov)
            out = terms[0]
            for t in terms[1:]:
                out = out | t
            return F.coalesce(out, F.lit(False))

        # elements not claimed by any applying schema, keeping order;
        # the two-arg HOF lambda carries the element index — still one
        # codegen expression, no explode
        rest = F.filter(expr, lambda x, i: ~_claimed(x, i))
        if uv is False:
            preds.append(_Pred(
                "unevaluatedItems", f"{path}.unevaluatedItems",
                F.size(rest) == 0,
                "an array element is unevaluated "
                "(unevaluatedItems: false)", sev))
        else:
            upath = f"{path}.unevaluatedItems"

            def _elem_ok(x: Column) -> Column:
                r = self._node_ok(uv, x, elem_t, upath)
                if r is True:
                    return F.lit(True)
                if r is False:
                    return F.lit(False)
                return x.isNull() | r

            preds.append(_Pred(
                "unevaluatedItems", upath, F.forall(rest, _elem_ok),
                "an unevaluated array element violates the "
                "unevaluatedItems schema", sev))
        return preds

    # ------------------------------------------------------------ types
    def _as_number(self, expr: Column, dtype: T.DataType | None) -> Column | None:
        if _dt(dtype, T.NumericType) or dtype is None:
            return expr
        if _dt(dtype, T.StringType):
            return expr.try_cast("double")
        return None

    def _type_ok(self, name: str, expr: Column,
                 dtype: T.DataType | None) -> StaticOrCol:
        """Duck-typed type check, mirroring the reference's prelude
        predicates (canner.cc:1048-1083). On a typed table most of
        these fold to static True/False; on string staging columns the
        reference's text-based duck checks apply. 'number' is the
        predicate the reference declares but never defines
        (canner.cc:100 — SURVEY.md §2 #6): implemented properly here.
        """
        if name == "null":
            return expr.isNull()
        if dtype is None:  # untyped (treat as string staging)
            dtype = T.StringType()
        if name == "boolean":
            if _dt(dtype, T.BooleanType):
                return True
            if _dt(dtype, T.StringType):
                # case-insensitive true/false (canner.cc:1052-1058)
                return F.lower(F.trim(expr)).isin("true", "false")
            return False
        if name == "integer":
            if _dt(dtype, *_INTEGRAL):
                return True
            if _dt(dtype, T.StringType):
                return expr.rlike(_INT_RE)   # full-parse svtoi semantics
            if _dt(dtype, T.NumericType):
                return expr == F.floor(expr).cast(dtype)
            return False
        if name == "number":
            if _dt(dtype, T.NumericType):
                return True
            if _dt(dtype, T.StringType):
                return expr.try_cast("double").isNotNull()
            return False
        if name == "string":
            # Any scalar satisfies 'string' (canner.cc:1081-1083).
            return bool(_dt(dtype, _ATOMIC))
        if name == "object":
            return bool(_dt(dtype, T.StructType, T.MapType))
        if name == "array":
            return bool(_dt(dtype, T.ArrayType))
        raise SpecError("type", f"unknown type name {name!r}")  # pragma: no cover

    # ------------------------------------------------------------- enum
    def _enum_ok(self, values: list, expr: Column,
                 dtype: T.DataType | None, path: str) -> StaticOrCol:
        """Enum membership with *correct* deep equality.

        The reference's equal() only compares the first element of
        sequences/maps (equal.cc:11-28 — SURVEY.md §2.4); Spark's
        native struct/array equality is genuinely deep, so we get the
        fixed semantics for free. Scalars use isin (hash-set lookup);
        composite literals compare against F.array/F.struct literals.
        """
        scalars = [v for v in values if not isinstance(v, (list, dict))]
        composites = [v for v in values if isinstance(v, (list, dict))]
        # candidates whose shape can't match the value's type fold to
        # False (scalar literal vs array column, list literal vs scalar
        # column, ...) — analysis-time type safety, semantics unchanged
        scalar_compat = dtype is None or _dt(dtype, _ATOMIC)
        list_compat = dtype is None or _dt(dtype, T.ArrayType)
        dict_compat = dtype is None or _dt(dtype, T.StructType, T.MapType)
        oks: list[StaticOrCol] = []
        if scalars and scalar_compat:
            non_null = [v for v in scalars if v is not None]
            if non_null:
                oks.append(expr.isin(*non_null))
            if any(v is None for v in scalars):
                oks.append(expr.isNull())
        for v in composites:
            if isinstance(v, list) and list_compat:
                oks.append(expr.eqNullSafe(_literal(v, path)))
            elif isinstance(v, dict) and dict_compat:
                oks.append(expr.eqNullSafe(_literal(v, path)))
        return _or_all(oks)

    # ------------------------------------------------------------- root
    def compile_root(self) -> CheckSuite:
        node = self.root
        declared = node.get("type", "object")
        if declared != "object" and declared != ["object"]:
            raise SpecError("$.type", "root spec must describe an object "
                                      "(one row = one document)")
        fields = ({f.name: f.dataType for f in self.schema.fields}
                  if self.schema is not None else {})

        for k in node.get("required", []):
            if self.schema is not None and k not in fields:
                raise SpecError(f"$.required.{k}",
                                f"required column '{k}' absent from the table "
                                f"schema {sorted(fields)}")
            self.suite.row_checks.append(Check(
                rule_id=f"required.{k}", severity=Severity.ERROR,
                violation=F.col(k).isNull(),
                message=F.lit(f"required column '{k}' is null "
                              f"(reference: canner.cc:378-398)"),
                order=self._next_order(), column=k))

        for k, sub in node.get("properties", {}).items():
            if self.schema is not None and k not in fields:
                self.warn(f"$.properties.{k}: column absent from table; "
                          f"checks skipped (open-world, canner.cc:741-756)")
                continue
            dtype = fields.get(k)
            col = F.col(k)
            for p in self.value_preds(sub, col, dtype, f"properties.{k}"):
                if p.ok is True:
                    self.suite.row_checks.append(Check(
                        rule_id=p.rule_id, severity=p.severity,
                        violation=F.lit(False), message=p.message,
                        order=self._next_order(), column=k, static_ok=True))
                    continue
                if p.ok is False:
                    violation = col.isNotNull()
                else:
                    violation = col.isNotNull() & ~p.ok
                self.suite.row_checks.append(Check(
                    rule_id=p.rule_id, severity=p.severity,
                    violation=violation, message=p.message,
                    order=self._next_order(), column=k))
            self._extensions(k, sub)

        root_pat_rxs = list(node.get("patternProperties", {}))
        if root_pat_rxs or "additionalProperties" in node:
            # Root patternProperties / additionalProperties: table
            # columns ARE the properties, and column names are static —
            # pattern matching happens at compile time, so the runtime
            # plan carries only the per-column value checks (no regex
            # over names, no schema introspection at runtime).
            if self.schema is None:
                raise SpecError("$", "root patternProperties/"
                                     "additionalProperties need a table "
                                     "schema")

        def _root_value_checks(k: str, sub: dict, rpath: str) -> None:
            col = F.col(k)
            for p in self.value_preds(sub, col, fields[k], rpath):
                if p.ok is True:
                    violation: Column = F.lit(False)
                elif p.ok is False:
                    violation = col.isNotNull()
                else:
                    violation = col.isNotNull() & ~p.ok
                self.suite.row_checks.append(Check(
                    rule_id=p.rule_id, severity=p.severity,
                    violation=violation, message=p.message,
                    order=self._next_order(), column=k,
                    static_ok=(p.ok is True)))

        for rx, sub in node.get("patternProperties", {}).items():
            hit = False
            for k in fields:
                if _re.search(rx, k):
                    hit = True
                    _root_value_checks(k, sub,
                                       f"patternProperties.{rx}.{k}")
            if not hit:
                self.warn(f"$.patternProperties.{rx}: no column matches; "
                          f"rule is dead at this schema")

        if "additionalProperties" in node:
            ap = node["additionalProperties"]
            declared = set(node.get("properties", {}))
            extras = [k for k in fields if k not in declared
                      and not any(_re.search(rx, k)
                                  for rx in root_pat_rxs)]
            for k in extras:
                if ap is False:
                    # the spec-standard closed world (ERROR), alongside
                    # the reference-parity x-closed-world WARN variant
                    # (text.cpp:178-181)
                    self.suite.row_checks.append(Check(
                        rule_id=f"additionalProperties.{k}",
                        severity=Severity.ERROR,
                        violation=F.col(k).isNotNull(),
                        message=F.lit(f"undeclared column '{k}' present "
                                      f"(additionalProperties: false)"),
                        order=self._next_order(), column=k))
                elif isinstance(ap, dict):
                    _root_value_checks(k, ap, f"additionalProperties.{k}")

        if any(kw in node for kw in ("allOf", "if", "not")):
            # Root-level applicators = CROSS-COLUMN rules ("if codec is
            # opus then sr_hz ≤ 24000"): evaluate the sub-schemas over a
            # whole-row struct, so their `properties` resolve to table
            # columns through the ordinary struct path (_object_preds).
            # Pure Column algebra — the conditional compiles into the
            # same single codegen span as every other row check. NULL
            # columns inside a branch validate (absent property passes,
            # draft-07); gate a branch on presence with `required`.
            if self.schema is None:
                raise SpecError("$", "root allOf/if/not need a table "
                                     "schema (cross-column rules)")
            row = F.struct(*[F.col(f.name) for f in self.schema.fields])
            sub = {k: node[k] for k in ("allOf", "if", "then", "else",
                                        "not") if k in node}
            for p in self.value_preds(sub, row, self.schema, "$"):
                if p.ok is True:
                    violation: Column = F.lit(False)
                elif p.ok is False:
                    violation = F.lit(True)
                else:
                    # residual NULL outcomes (e.g. an ungated duck check
                    # on a NULL) count as pass — only a definite False
                    # flags the row
                    violation = ~F.coalesce(p.ok, F.lit(True))
                self.suite.row_checks.append(Check(
                    rule_id=p.rule_id, severity=p.severity,
                    violation=violation, message=p.message,
                    order=self._next_order(), column=""))

        deps_node: dict = {}
        for dep_kw in ("dependencies", "dependentRequired",
                       "dependentSchemas"):   # 2020-12 schema half
            for col, dv in node.get(dep_kw, {}).items():
                deps_node[col] = (dep_kw, dv)
        for col, (dep_kw, deps) in deps_node.items():
            # draft-07 dependentRequired / dependencies: presence of one
            # column obliges others (column present ⇔ non-NULL, the
            # engine-wide convention). Array form compiles to one
            # located check per (col, dep) pair; the schema form is
            # sugar for a root conditional and reuses the struct lift.
            if self.schema is not None and col not in fields:
                self.warn(f"$.{dep_kw}.{col}: column absent from "
                          f"table; skipped (open-world)")
                continue
            if isinstance(deps, dict):
                if self.schema is None:
                    raise SpecError(f"$.{dep_kw}.{col}",
                                    f"schema-form {dep_kw} needs a table "
                                    f"schema (cross-column rule)")
                row = F.struct(*[F.col(f.name) for f in self.schema.fields])
                lifted = {"if": {"required": [col]}, "then": deps}
                for p in self.value_preds(lifted, row, self.schema,
                                          f"$.{dep_kw}.{col}"):
                    viol = (F.lit(not p.ok) if isinstance(p.ok, bool)
                            else ~F.coalesce(p.ok, F.lit(True)))
                    self.suite.row_checks.append(Check(
                        rule_id=p.rule_id, severity=p.severity,
                        violation=viol, message=p.message,
                        order=self._next_order(), column=""))
                continue
            missing = [d for d in deps
                       if self.schema is not None and d not in fields]
            if missing:
                raise SpecError(f"$.dependentRequired.{col}",
                                f"dependent columns {missing} absent from "
                                f"the table schema {sorted(fields)}")
            for dep in deps:
                self.suite.row_checks.append(Check(
                    rule_id=f"$.dependentRequired.{col}.{dep}",
                    severity=Severity.ERROR,
                    violation=F.col(col).isNotNull() & F.col(dep).isNull(),
                    message=F.lit(f"column '{dep}' is required when "
                                  f"'{col}' is present"),
                    order=self._next_order(), column=dep))

        if node.get("x-closed-world") and self.schema is not None:
            # The reference implements BOTH worlds: canner.cc:741-756
            # skips unknown keys (open), text.cpp:178-181 throws on them
            # (closed). Default is open; this switch emits the closed
            # variant as WARN-severity row checks — a row carries the
            # undeclared property iff the column is non-null there
            # ("one row = one document": NULL means the key is absent).
            declared = set(node.get("properties", {})) | \
                set(node.get("required", []))
            for k in sorted(set(fields) - declared):
                self.suite.row_checks.append(Check(
                    rule_id=f"closed-world.{k}", severity=Severity.WARN,
                    violation=F.col(k).isNotNull(),
                    message=F.lit(f"undeclared column '{k}' present "
                                  f"(closed world; reference: "
                                  f"text.cpp:178-181)"),
                    order=self._next_order(), column=k))

        if "x-drift" in node:
            xd = node["x-drift"]
            if (xd.get("w1_max") is not None
                    and float(xd["w1_max"]) <= 0):
                raise SpecError("$.x-drift.w1_max",
                                f"w1_max must be > 0, got {xd['w1_max']}")
            self.suite.drift_checks.append(DriftCheck(
                rule_id=f"x-drift.{xd['column']}", column=xd["column"],
                buckets=int(xd.get("buckets", 20)),
                lo=float(xd.get("lo", 0.0)), hi=float(xd.get("hi", 12000.0)),
                psi_max=float(xd.get("psi_max", 0.25)),
                ks_alpha=float(xd.get("ks_alpha", 0.01)),
                w1_max=(float(xd["w1_max"])
                        if xd.get("w1_max") is not None else None),
                severity=Severity[xd.get("severity", "WARN").upper()]))
        if "x-quantile" in node:
            xqs = node["x-quantile"]
            if isinstance(xqs, dict):
                xqs = [xqs]
            for i, xq in enumerate(xqs):
                path = f"$.x-quantile[{i}]"
                if "column" not in xq or "q" not in xq:
                    raise SpecError(path, "x-quantile needs 'column' "
                                          "and 'q'")
                q = float(xq["q"])
                if not 0.0 <= q <= 1.0:
                    raise SpecError(path, f"q must be in [0, 1], got {q}")
                lo = xq.get("minimum")
                hi = xq.get("maximum")
                if lo is None and hi is None:
                    raise SpecError(path, "x-quantile needs at least one "
                                          "of minimum/maximum")
                if lo is not None and hi is not None and float(lo) > float(hi):
                    raise SpecError(path, f"minimum {lo} > maximum {hi}")
                buckets = xq.get("buckets")
                if buckets is not None:
                    buckets = int(buckets)
                    if buckets <= 0:
                        raise SpecError(path, f"buckets must be positive, "
                                              f"got {buckets}")
                    if float(xq.get("lo", 0.0)) >= float(
                            xq.get("hi", 12000.0)):
                        raise SpecError(path, "bucketed x-quantile needs "
                                              "lo < hi")
                self.suite.quantile_checks.append(QuantileCheck(
                    rule_id=f"x-quantile.{xq['column']}"
                            f".p{int(round(q * 100)):02d}",
                    column=xq["column"], q=q,
                    minimum=None if lo is None else float(lo),
                    maximum=None if hi is None else float(hi),
                    severity=Severity[xq.get("severity", "WARN").upper()],
                    buckets=buckets,
                    lo=float(xq.get("lo", 0.0)),
                    hi=float(xq.get("hi", 12000.0))))
        if "x-anomaly" in node:
            xns = node["x-anomaly"]
            if isinstance(xns, dict):
                xns = [xns]
            for xn in xns:
                col = xn["column"]
                if self.schema is not None and col not in {
                        f.name for f in self.schema.fields}:
                    raise SpecError(f"$.x-anomaly.{col}",
                                    f"column '{col}' absent from table "
                                    f"schema")
                self.suite.anomaly_checks.append(AnomalyCheck(
                    rule_id=f"x-anomaly.{col}", column=col,
                    z_max=float(xn.get("z_max", 3.5)),
                    severity=Severity[xn.get("severity", "WARN").upper()]))
        if "x-chi2" in node:
            xcs = node["x-chi2"]
            if isinstance(xcs, dict):
                xcs = [xcs]
            for i, xc in enumerate(xcs):
                path = f"$.x-chi2[{i}]"
                if "column" not in xc or "expected" not in xc:
                    raise SpecError(path, "x-chi2 needs 'column' and "
                                          "'expected'")
                col = xc["column"]
                if self.schema is not None and col not in {
                        f.name for f in self.schema.fields}:
                    raise SpecError(path, f"column '{col}' absent from "
                                          f"table schema")
                exp = xc["expected"]
                if not isinstance(exp, dict) or not exp:
                    raise SpecError(f"{path}.expected",
                                    "expected must be a non-empty "
                                    "{category: fraction} map")
                pairs = []
                for cat, frac in exp.items():
                    frac = float(frac)
                    if frac <= 0.0:
                        raise SpecError(f"{path}.expected.{cat}",
                                        f"fraction must be > 0, got {frac}")
                    pairs.append((str(cat), frac))
                total = sum(f for _, f in pairs)
                if abs(total - 1.0) > 1e-6:
                    raise SpecError(f"{path}.expected",
                                    f"fractions must sum to 1, got {total}")
                chi2_max = float(xc.get("chi2_max", 11.34))
                if chi2_max <= 0.0:
                    raise SpecError(f"{path}.chi2_max",
                                    f"chi2_max must be > 0, got {chi2_max}")
                self.suite.cat_drift_checks.append(CatDriftCheck(
                    rule_id=f"x-chi2.{col}", column=col,
                    expected=tuple(pairs), chi2_max=chi2_max,
                    severity=Severity[xc.get("severity", "WARN").upper()]))
        if "x-unique-together" in node:
            # composite-key uniqueness: a list of column groups (or one
            # group as sugar). Same one-shuffle plan as x-unique, keyed
            # on the tuple.
            xut = node["x-unique-together"]
            if (isinstance(xut, list) and xut
                    and all(isinstance(c, str) for c in xut)):
                xut = [xut]
            if not (isinstance(xut, list) and xut
                    and all(isinstance(g, list) for g in xut)):
                raise SpecError("$.x-unique-together",
                                "expects a list of column-name lists "
                                "(or one list of column names)")
            for i, g in enumerate(xut):
                gpath = f"$.x-unique-together[{i}]"
                if len(g) < 2 or not all(isinstance(c, str) for c in g):
                    raise SpecError(gpath, "a composite key needs >= 2 "
                                           "column names")
                if len(set(g)) != len(g):
                    raise SpecError(gpath, f"repeated column in {g}")
                if self.schema is not None:
                    missing = [c for c in g if c not in fields]
                    if missing:
                        raise SpecError(gpath, f"columns absent from the "
                                               f"table schema: {missing}")
                self.suite.unique_checks.append(UniqueCheck(
                    rule_id=f"x-unique.({','.join(g)})",
                    column=tuple(g)))
        if "x-monotonic" in node:
            # ordering invariant: column non-decreasing (or strictly
            # increasing) within partition_by groups, ordered by
            # order_by — one shuffle + per-group window
            # (events.monotonic_violations)
            xms = node["x-monotonic"]
            if isinstance(xms, dict):
                xms = [xms]
            if not isinstance(xms, list):
                raise SpecError("$.x-monotonic",
                                "expects a rule dict or list of them")
            for i, xm in enumerate(xms):
                mpath = f"$.x-monotonic[{i}]"
                if (not isinstance(xm, dict)
                        or not all(k in xm for k in
                                   ("column", "partition_by",
                                    "order_by"))):
                    raise SpecError(mpath, "needs {column, partition_by,"
                                           " order_by, strict?}")
                for k in ("column", "partition_by", "order_by"):
                    col = xm[k]
                    if not isinstance(col, str):
                        raise SpecError(f"{mpath}.{k}",
                                        "must be a column name")
                    if self.schema is not None and col not in fields:
                        raise SpecError(f"{mpath}.{k}",
                                        f"column '{col}' absent from "
                                        f"the table schema")
                self.suite.monotonic_checks.append(MonotonicCheck(
                    rule_id=f"x-monotonic.{xm['column']}",
                    column=xm["column"],
                    partition_by=xm["partition_by"],
                    order_by=xm["order_by"],
                    strict=bool(xm.get("strict", False)),
                    severity=Severity[xm.get("severity",
                                             "ERROR").upper()]))
        if "x-ref-together" in node:
            # composite foreign key: (columns) must exist as a tuple in
            # dim (keys). Always the broadcast-anti plan (IN-inlining
            # is single-column).
            xrt = node["x-ref-together"]
            if isinstance(xrt, dict):
                xrt = [xrt]
            if not isinstance(xrt, list):
                raise SpecError("$.x-ref-together",
                                "expects a rule dict or list of them")
            for i, xr in enumerate(xrt):
                rpath = f"$.x-ref-together[{i}]"
                if (not isinstance(xr, dict)
                        or not all(k in xr
                                   for k in ("columns", "table", "keys"))):
                    raise SpecError(rpath,
                                    "needs {columns, table, keys}")
                g, ks = xr["columns"], xr["keys"]
                if (not isinstance(g, list) or not isinstance(ks, list)
                        or len(g) < 2 or len(g) != len(ks)
                        or not all(isinstance(c, str) for c in g + ks)):
                    raise SpecError(rpath, "columns/keys must be equal-"
                                           "length lists of >= 2 names")
                if self.schema is not None:
                    missing = [c for c in g if c not in fields]
                    if missing:
                        raise SpecError(rpath, f"columns absent from the "
                                               f"table schema: {missing}")
                self.suite.ref_checks.append(RefCheck(
                    rule_id=f"x-ref.({','.join(g)})",
                    column=tuple(g), table=xr["table"], key=tuple(ks),
                    severity=Severity[xr.get("severity",
                                             "ERROR").upper()]))
        if "x-assert" in node:
            xas = node["x-assert"]
            if isinstance(xas, dict):
                xas = [xas]
            for i, xa in enumerate(xas):
                self._compile_assert(xa, i)
        if "x-completeness" in node:
            xcs = node["x-completeness"]
            if isinstance(xcs, dict):
                xcs = [xcs]
            for xc in xcs:
                col = xc["column"]
                if self.schema is not None and col not in {
                        f.name for f in self.schema.fields}:
                    raise SpecError(f"$.x-completeness.{col}",
                                    f"column '{col}' absent from table "
                                    f"schema")
                self.suite.completeness_checks.append(CompletenessCheck(
                    rule_id=f"x-completeness.{col}", column=col,
                    max_null_frac=float(xc.get("max_null_frac", 0.0)),
                    severity=Severity[xc.get("severity", "WARN").upper()]))
        if "x-frequency" in node:
            xfs = node["x-frequency"]
            if isinstance(xfs, dict):
                xfs = [xfs]
            for xf in xfs:
                col = xf["column"]
                if self.schema is not None and col not in {
                        f.name for f in self.schema.fields}:
                    raise SpecError(f"$.x-frequency.{col}",
                                    f"column '{col}' absent from table "
                                    f"schema")
                ms = xf.get("max_share")
                md = xf.get("min_distinct")
                self.suite.frequency_checks.append(FrequencyCheck(
                    rule_id=f"x-frequency.{col}", column=col,
                    max_share=None if ms is None else float(ms),
                    min_distinct=None if md is None else int(md),
                    severity=Severity[xf.get("severity", "WARN").upper()]))
        if "x-embedding" in node:
            xes = node["x-embedding"]
            if isinstance(xes, dict):
                xes = [xes]
            if not isinstance(xes, list):
                raise SpecError("$.x-embedding",
                                "expects a rule dict or list of them")
            for i, xe in enumerate(xes):
                self._compile_embedding(xe, i, fields)
        return self.suite

    def _compile_assert(self, xa: dict, i: int) -> None:
        """x-assert: an arbitrary cross-field SQL boolean expression as
        a row rule — the escape hatch for constraints the keyword
        vocabulary can't express (e.g. 'transcript length must be
        consistent with dur_ms'). The expression compiles into the
        same single-scan violation array as every keyword check, so an
        x-assert adds ZERO plan cost beyond its own arithmetic.

        NULL convention: an assert that evaluates to NULL (some operand
        was missing) does NOT violate — only a definite FALSE does,
        matching the engine-wide rule that absent values only trip
        `required`-style checks. Parse AND analysis errors surface at
        compile time as located SpecErrors (the reference's generators
        fail at build time, not canning time — same posture)."""
        rid = xa.get("id", str(i))
        path = f"$.x-assert[{i}]"
        try:
            expr = F.expr(xa["expr"])
        except Exception as exc:  # eager ParseException (Spark < 4)
            raise SpecError(f"{path}.expr",
                            f"does not parse: {_first_line(exc)}") from exc
        if self.schema is not None:
            # Spark 4 parses F.expr lazily, so BOTH syntax and
            # resolution errors surface here, at the empty-frame
            # analysis probe — located like every other spec defect
            from pyspark.sql import SparkSession
            spark = (SparkSession.getActiveSession()
                     or SparkSession._instantiatedSession)
            try:
                dt = spark.createDataFrame([], self.schema) \
                          .select(expr).schema.fields[0].dataType
            except Exception as exc:
                raise SpecError(f"{path}.expr",
                                f"does not parse/resolve against the "
                                f"table schema: {_first_line(exc)}") from exc
            if not isinstance(dt, T.BooleanType):
                raise SpecError(f"{path}.expr",
                                f"must be a boolean expression, got "
                                f"{dt.simpleString()}")
        self.suite.row_checks.append(Check(
            rule_id=f"x-assert.{rid}",
            severity=Severity[xa.get("severity", "ERROR").upper()],
            violation=~F.coalesce(expr, F.lit(True)),
            message=F.lit(xa.get("message",
                                 f"assertion failed: {xa['expr']}")),
            order=self._next_order(), column=""))

    def _compile_embedding(self, xe: dict, i: int, fields: dict) -> None:
        """x-embedding: sanity invariants on a vector column — the
        validation vocabulary for the `array<float>` embedding modality
        (training corpora carry embeddings next to text/audio; a wrong
        dimension, NaN/Inf/NULL element, or off-scale norm silently
        poisons every downstream similarity join).

        All checks are pure Column algebra over the array (size /
        exists / aggregate higher-order functions) appended to the
        SAME single-scan row suite as every keyword check — zero
        exchanges, zero Python, one codegen span:

          dim     size(col) != dim
          finite  exists(col, x -> x IS NULL or isnan(x) or isinf(x))
          norm    sqnorm outside [min_norm², max_norm²] (squared domain
                  — no sqrt in the hot path; gated on finite, because
                  Spark orders NaN above every value so an unguarded
                  comparison would double-flag NaN rows)
          zero    sqnorm == 0 (forbid_zero — a zero vector is a valid
                  float array that no norm floor distinguishes from a
                  merely-small one at WARN time)

        NULL column passes everything (absence is `required`'s
        violation, the engine-wide convention)."""
        path = f"$.x-embedding[{i}]"
        if not isinstance(xe, dict) or "column" not in xe \
                or "dim" not in xe:
            raise SpecError(path, "needs {column, dim, min_norm?, "
                                  "max_norm?, forbid_zero?}")
        k = xe["column"]
        if not isinstance(k, str):
            raise SpecError(f"{path}.column", "must be a column name")
        if self.schema is not None:
            if k not in fields:
                raise SpecError(f"{path}.column",
                                f"column '{k}' absent from the table "
                                f"schema {sorted(fields)}")
            dt = fields[k]
            if not (isinstance(dt, T.ArrayType)
                    and isinstance(dt.elementType,
                                   (T.FloatType, T.DoubleType))):
                raise SpecError(f"{path}.column",
                                f"'{k}' must be array<float|double>, "
                                f"got {dt.simpleString()}")
        dim = xe["dim"]
        if not isinstance(dim, int) or isinstance(dim, bool) or dim <= 0:
            raise SpecError(f"{path}.dim",
                            f"dim must be a positive int, got {dim!r}")
        lo = xe.get("min_norm")
        hi = xe.get("max_norm")
        for name, v in (("min_norm", lo), ("max_norm", hi)):
            if v is not None and (not isinstance(v, (int, float))
                                  or isinstance(v, bool) or v < 0):
                raise SpecError(f"{path}.{name}",
                                f"must be a number >= 0, got {v!r}")
        if lo is not None and hi is not None and float(lo) > float(hi):
            raise SpecError(path, f"min_norm {lo} > max_norm {hi}")
        sev = Severity[xe.get("severity", "ERROR").upper()]
        col = F.col(k)

        def elem_bad(x: Column) -> Column:
            # total predicate (never NULL): isNull first, so exists()
            # yields a definite boolean for every row
            return (x.isNull() | F.isnan(x)
                    | (F.abs(x.cast("double")) == F.lit(float("inf"))))

        bad = F.exists(col, elem_bad)
        sq = F.aggregate(col, F.lit(0.0),
                         lambda a, x: a + x.cast("double")
                         * x.cast("double"))
        self.suite.row_checks.append(Check(
            rule_id=f"x-embedding.{k}.dim", severity=sev,
            violation=col.isNotNull() & (F.size(col) != F.lit(dim)),
            message=F.lit(f"embedding '{k}' is not {dim}-dimensional"),
            order=self._next_order(), column=k))
        self.suite.row_checks.append(Check(
            rule_id=f"x-embedding.{k}.finite", severity=sev,
            violation=col.isNotNull() & bad,
            message=F.lit(f"embedding '{k}' carries a NULL/NaN/Inf "
                          f"element"),
            order=self._next_order(), column=k))
        if lo is not None or hi is not None:
            breach = F.lit(False)
            if lo is not None:
                breach = breach | (sq < F.lit(float(lo) ** 2))
            if hi is not None:
                breach = breach | (sq > F.lit(float(hi) ** 2))
            self.suite.row_checks.append(Check(
                rule_id=f"x-embedding.{k}.norm", severity=sev,
                violation=col.isNotNull() & ~bad & breach,
                message=F.lit(f"embedding '{k}' L2 norm outside "
                              f"[{lo}, {hi}]"),
                order=self._next_order(), column=k))
        if xe.get("forbid_zero"):
            self.suite.row_checks.append(Check(
                rule_id=f"x-embedding.{k}.zero", severity=sev,
                violation=col.isNotNull() & ~bad & (sq == F.lit(0.0)),
                message=F.lit(f"embedding '{k}' is the zero vector"),
                order=self._next_order(), column=k))

    def _extensions(self, column: str, sub: dict) -> None:
        if sub.get("x-unique"):
            self.suite.unique_checks.append(UniqueCheck(
                rule_id=f"x-unique.{column}", column=column))
        if "x-ref" in sub:
            xr = sub["x-ref"]
            self.suite.ref_checks.append(RefCheck(
                rule_id=f"x-ref.{column}", column=column,
                table=xr["table"], key=xr["key"]))
        if "x-absent" in sub:
            # deny-list mirror of x-ref: the value must NOT exist in
            # the dimension (blocklists: known-bad hashes, revoked ids)
            xa = sub["x-absent"]
            if not isinstance(xa, dict) or not all(
                    k in xa for k in ("table", "key")):
                raise SpecError(f"$.properties.{column}.x-absent",
                                "needs {table, key}")
            self.suite.absent_checks.append(RefCheck(
                rule_id=f"x-absent.{column}", column=column,
                table=xa["table"], key=xa["key"],
                severity=Severity[xa.get("severity", "ERROR").upper()]))
        if "x-payload" in sub:
            xp = sub["x-payload"] if isinstance(sub["x-payload"], dict) else {}
            self.suite.payload_checks.append(PayloadCheck(
                rule_id=f"x-payload.{column}", column=column,
                snr_db_min=float(xp.get("snr_db_min", 30.0)),
                ref_table=xp.get("ref_table", "clips_ref"),
                allow_digest=bool(xp.get("digest_fast_path", True))))
        if "x-transcript" in sub:
            xt = sub["x-transcript"]
            path = f"$.properties.{column}.x-transcript"
            if not isinstance(xt, dict):
                raise SpecError(path, "x-transcript must be a mapping")
            max_dist = xt.get("max_dist")
            max_wer = xt.get("max_wer")
            if max_dist is None and max_wer is None:
                raise SpecError(path, "x-transcript needs at least one "
                                      "of max_dist/max_wer")
            if max_dist is not None:
                if not isinstance(max_dist, int) or max_dist < 0:
                    raise SpecError(f"{path}.max_dist",
                                    f"must be a non-negative integer, "
                                    f"got {max_dist!r}")
            if max_wer is not None:
                max_wer = float(max_wer)
                if max_wer < 0:
                    raise SpecError(f"{path}.max_wer",
                                    f"must be >= 0, got {max_wer}")
            normalize = xt.get("normalize", False)
            if not isinstance(normalize, bool):
                raise SpecError(f"{path}.normalize",
                                f"must be a boolean, got {normalize!r}")
            self.suite.transcript_checks.append(TranscriptCheck(
                rule_id=f"x-transcript.{column}", column=column,
                ref_table=xt.get("ref_table", "clips_ref"),
                ref_col=xt.get("ref_col", "transcript_ref"),
                max_dist=max_dist, max_wer=max_wer, normalize=normalize,
                severity=Severity[xt.get("severity", "ERROR").upper()]))
        if "x-media" in sub:
            xm = sub["x-media"]
            path = f"$.properties.{column}.x-media"
            if not isinstance(xm, dict):
                raise SpecError(path, "x-media must be a mapping")
            kinds = xm.get("kinds")
            if kinds is not None:
                if (not isinstance(kinds, list) or not kinds
                        or not all(isinstance(x, str) for x in kinds)):
                    raise SpecError(f"{path}.kinds",
                                    "must be a non-empty list of kind "
                                    "names (image/video/audio)")
                kinds = tuple(kinds)
            req = bool(xm.get("require_decodable", True))
            bounds = {}
            for b in ("min_width", "min_height", "min_frames"):
                v = xm.get(b)
                if v is not None:
                    if not isinstance(v, int) or v <= 0:
                        raise SpecError(f"{path}.{b}",
                                        f"must be a positive integer, "
                                        f"got {v!r}")
                bounds[b] = v
            if not req and all(v is None for v in bounds.values()):
                raise SpecError(path, "x-media checks nothing: enable "
                                      "require_decodable or set a bound")
            self.suite.media_checks.append(MediaCheck(
                rule_id=f"x-media.{column}", column=column,
                kinds=kinds, require_decodable=req,
                min_width=bounds["min_width"],
                min_height=bounds["min_height"],
                min_frames=bounds["min_frames"],
                severity=Severity[xm.get("severity", "WARN").upper()]))
        if "x-audio-stats" in sub:
            xa = sub["x-audio-stats"]
            opt = (lambda k: float(xa[k]) if k in xa else None)
            self.suite.audio_checks.append(AudioStatsCheck(
                rule_id=f"x-audio-stats.{column}", column=column,
                clip_thresh=int(xa.get("clip_thresh", 32000)),
                silence_thresh=int(xa.get("silence_thresh", 16)),
                max_clip_frac=opt("max_clip_frac"),
                max_silence_frac=opt("max_silence_frac"),
                min_rms_db=opt("min_rms_db"),
                severity=Severity[xa.get("severity", "WARN").upper()]))
        if "x-loudness" in sub:
            xl = sub["x-loudness"]
            path = f"$.properties.{column}.x-loudness"
            if not isinstance(xl, dict):
                raise SpecError(path, f"must be a map, got {xl!r}")
            bounds = {}
            for b in ("min_lufs", "max_lufs", "max_true_peak_dbtp",
                      "max_lra_lu"):
                v = xl.get(b)
                if v is not None and not isinstance(v, (int, float)):
                    raise SpecError(f"{path}.{b}",
                                    f"must be a number, got {v!r}")
                bounds[b] = None if v is None else float(v)
            if all(v is None for v in bounds.values()):
                raise SpecError(path, "x-loudness checks nothing: set "
                                      "min_lufs, max_lufs, "
                                      "max_true_peak_dbtp and/or "
                                      "max_lra_lu")
            if (bounds["min_lufs"] is not None
                    and bounds["max_lufs"] is not None
                    and bounds["min_lufs"] > bounds["max_lufs"]):
                raise SpecError(path, f"min_lufs {bounds['min_lufs']} > "
                                      f"max_lufs {bounds['max_lufs']}")
            self.suite.loudness_checks.append(LoudnessCheck(
                rule_id=f"x-loudness.{column}", column=column,
                sr_col=xl.get("sr_col", "sr_hz"),
                min_lufs=bounds["min_lufs"], max_lufs=bounds["max_lufs"],
                max_true_peak_dbtp=bounds["max_true_peak_dbtp"],
                max_lra_lu=bounds["max_lra_lu"],
                severity=Severity[xl.get("severity", "WARN").upper()]))
        if "x-spectral" in sub:
            xs = sub["x-spectral"]
            opt = (lambda k: float(xs[k]) if k in xs else None)
            self.suite.spectral_checks.append(SpectralCheck(
                rule_id=f"x-spectral.{column}", column=column,
                sr_col=xs.get("sr_col", "sr_hz"),
                min_rolloff95_hz=opt("min_rolloff95_hz"),
                max_flatness=opt("max_flatness"),
                severity=Severity[xs.get("severity", "WARN").upper()]))


def _literal(v: Any, path: str) -> Column:
    if isinstance(v, list):
        return F.array(*[_literal(x, path) for x in v])
    if isinstance(v, dict):
        return F.struct(*[_literal(x, path).alias(k) for k, x in v.items()])
    return F.lit(v)


def compile_spec(source: str | dict,
                 schema: T.StructType | None = None) -> CheckSuite:
    """Compile a YAML/JSON spec into a CheckSuite.

    ``schema`` is the target table's StructType; when provided, checks
    the table schema already guarantees are statically elided and
    required-column presence is verified at compile time.
    """
    root = load_spec(source)
    from pyspark.sql import SparkSession

    # getActiveSession() is thread-local; driver worker threads that
    # did not create the session see None even though one exists, so
    # also accept the process-global instantiated session.
    if (SparkSession.getActiveSession() is None
            and getattr(SparkSession, "_instantiatedSession", None) is None):
        from canned_yaml_spark.errors import EngineError
        raise EngineError(
            "compile_spec builds pyspark Column expressions and needs an "
            "active SparkSession — create one first (session.get_spark())")
    return _Compiler(root, schema).compile_root()
