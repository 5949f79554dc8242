"""Spec inference: profile a table and draft the spec that validates it.

The reference generates validators FROM specs (generator.py walks the
schema and emits C++). This module closes the loop in the other
direction — given a table, propose the spec a user would then review,
tighten, and commit. The Deequ "constraint suggestion" shape, done
Spark-first:

  pass 1 — ONE full scan, ALL-ALGEBRAIC aggregates (count, null
           counts, min/max, min/max length, approx_count_distinct):
           everything partial-combines map-side, the shuffle carries a
           single row. This is the only stage that touches every byte,
           so at 10^12 rows it costs one pass over the columns read.
  pass 2 — exact confirmation ONLY for candidates pass 1 nominated:
           enum value sets (approx distinct ≤ 2·enum_max), uniqueness
           (approx distinct ≥ unique_frac·non-null — HLL's ±2.3%
           cannot miss a truly-unique column at 0.9), and pattern
           templates (digit-run generalization of the lexicographic
           min value, validated with an rlike sum). One more agg; its
           width is bounded by the candidate count, never the table.

Driver materialization is bounded by construction: one stats row plus
the enum value sets (each ≤ enum_max after confirmation).

Decisions (all exact after pass 2, so an independent SQL engine
reproduces them bit-for-bit — the driver gate relies on this):
  - required          null_count == 0
  - x-completeness    null_count > 0 → budget = ceil(2·null_frac·1e4)/1e4
                      (headroom 2×, WARN — partition-local rates exceed
                      a global budget when nulls cluster; review)
  - minimum/maximum   observed exact bounds (numeric columns)
  - minLength/maxLength  observed exact bounds (string columns)
  - enum              exact distinct ≤ enum_max (string OR numeric —
                      sample rates ARE enum-like)
  - x-unique          exact distinct == non-null count
  - pattern           template from the lexicographic-min value with
                      digit runs generalized to \\d+; emitted only if
                      EVERY non-null value matches and the template is
                      non-trivial (contains a digit run) and the column
                      isn't already an enum

Round-trip guarantee (pinned in tests): the inferred spec compiled
over the profiled table itself yields ZERO ERROR violations — bounds
are observed, enums are the observed sets, required/x-unique only when
exactly confirmed. Inferred dataset budgets are WARN by design.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)

#: Spark type → the 7-type spec lexicon (spec.SCHEMA_TYPES)
_TYPE_NAME = [
    (T.BooleanType, "boolean"),
    ((T.ByteType, T.ShortType, T.IntegerType, T.LongType), "integer"),
    ((T.FloatType, T.DoubleType, T.DecimalType), "number"),
    (T.StringType, "string"),
    ((T.ArrayType,), "array"),
    ((T.StructType, T.MapType), "object"),
]


def _spec_type(dt: T.DataType) -> str | None:
    for classes, name in _TYPE_NAME:
        if isinstance(dt, classes):
            return name
    return None  # binary / exotic: type left unstated


def regex_template(value: str) -> str | None:
    """Generalize one value to an anchored regex: digit runs → \\d+,
    everything else literal-escaped. Returns None when trivial (no
    digit run — a pure literal would only match one value)."""
    if not value:
        return None
    parts = []
    generalized = False
    for run_is_digit, chunk in ((m.group().isdigit(), m.group())
                                for m in re.finditer(r"\d+|\D+", value)):
        if run_is_digit:
            parts.append(r"\d+")
            generalized = True
        else:
            parts.append(re.escape(chunk))
    return "^" + "".join(parts) + "$" if generalized else None


@dataclass(frozen=True)
class ColumnProfile:
    """Exact post-confirmation profile of one column."""

    column: str
    spec_type: str | None
    n: int
    n_null: int
    vmin: object = None          # numeric bounds
    vmax: object = None
    len_min: int | None = None   # string length bounds
    len_max: int | None = None
    enum_values: tuple | None = None   # exact set, ≤ enum_max
    unique: bool = False
    pattern: str | None = None


def profile(df: DataFrame, *, enum_max: int = 8,
            unique_frac: float = 0.9) -> list[ColumnProfile]:
    """Two-pass column profiles (see module docstring for the plan)."""
    cols = [(f.name, f.dataType) for f in df.schema.fields]

    # ---- pass 1: one scan, algebraic only
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, dt in cols:
        c = F.col(name)
        aggs.append(F.sum(c.isNull().cast("long")).alias(f"nn__{name}"))
        aggs.append(F.approx_count_distinct(name).alias(f"ad__{name}"))
        if isinstance(dt, _NUMERIC):
            aggs.append(F.min(c).alias(f"mn__{name}"))
            aggs.append(F.max(c).alias(f"mx__{name}"))
        elif isinstance(dt, T.StringType):
            aggs.append(F.min(F.length(c)).alias(f"ln__{name}"))
            aggs.append(F.max(F.length(c)).alias(f"lx__{name}"))
            aggs.append(F.min(c).alias(f"sm__{name}"))  # template source
    row = df.agg(*aggs).collect()[0].asDict()
    n = row["_n"]

    # ---- nominate candidates for exact confirmation
    enum_cand, uniq_cand, pat_cand = [], [], {}
    for name, dt in cols:
        nn = row[f"nn__{name}"]
        ad = row[f"ad__{name}"]
        if n - nn == 0:
            continue
        if (isinstance(dt, (T.StringType, *(_NUMERIC)))
                and ad <= 2 * enum_max):
            enum_cand.append(name)
        if ad >= unique_frac * (n - nn):
            uniq_cand.append(name)
        if isinstance(dt, T.StringType):
            tmpl = regex_template(row[f"sm__{name}"] or "")
            if tmpl is not None:
                pat_cand[name] = tmpl

    # ---- pass 2: one more agg, width bounded by the candidate count
    aggs2 = []
    for name in enum_cand:
        aggs2.append(F.array_sort(F.collect_set(name)).alias(f"ev__{name}"))
    for name in uniq_cand:
        aggs2.append(F.count_distinct(F.col(name)).alias(f"cd__{name}"))
    for name, tmpl in pat_cand.items():
        bad = (~F.col(name).rlike(tmpl)).cast("long")
        aggs2.append(F.sum(F.when(F.col(name).isNotNull(), bad)
                            .otherwise(F.lit(0))).alias(f"pb__{name}"))
    row2 = df.agg(*aggs2).collect()[0].asDict() if aggs2 else {}

    out = []
    for name, dt in cols:
        nn = row[f"nn__{name}"]
        evs = row2.get(f"ev__{name}")
        is_enum = evs is not None and 0 < len(evs) <= enum_max
        pattern = None
        if not is_enum and name in pat_cand and row2.get(f"pb__{name}") == 0:
            pattern = pat_cand[name]
        out.append(ColumnProfile(
            column=name, spec_type=_spec_type(dt), n=n, n_null=nn,
            vmin=row.get(f"mn__{name}"), vmax=row.get(f"mx__{name}"),
            len_min=row.get(f"ln__{name}"), len_max=row.get(f"lx__{name}"),
            enum_values=tuple(evs) if is_enum else None,
            unique=(row2.get(f"cd__{name}") == n - nn and n - nn > 0),
            pattern=pattern))
    return out


def completeness_budget(n_null: int, n: int) -> float:
    """2× observed null rate, rounded UP to 4 decimals (never below the
    observed rate; capped at 1). Pure integer ceil-division so an
    independent SQL engine reproduces the budget bit-for-bit — a float
    ceil can straddle an ulp."""
    if n <= 0:
        return 0.0
    bp = min(10_000, (2 * n_null * 10_000 + n - 1) // n)
    return bp / 10_000


def infer_spec(df: DataFrame, *, enum_max: int = 8,
               unique_frac: float = 0.9) -> dict:
    """Draft spec dict for ``df`` — compile_spec-ready. See module
    docstring for the decision table and the round-trip guarantee."""
    props: dict = {}
    required: list[str] = []
    completeness: list[dict] = []
    for p in profile(df, enum_max=enum_max, unique_frac=unique_frac):
        node: dict = {}
        if p.spec_type is not None:
            node["type"] = p.spec_type
        if p.enum_values is not None:
            node["enum"] = list(p.enum_values)
        if p.spec_type in ("integer", "number") and p.vmin is not None:
            node["minimum"] = p.vmin
            node["maximum"] = p.vmax
        if p.spec_type == "string" and p.len_min is not None:
            node["minLength"] = p.len_min
            node["maxLength"] = p.len_max
        if p.pattern is not None:
            node["pattern"] = p.pattern
        if p.unique:
            node["x-unique"] = True
        props[p.column] = node
        if p.n_null == 0 and p.n > 0:
            required.append(p.column)
        elif p.n_null > 0:
            completeness.append({
                "column": p.column,
                "max_null_frac": completeness_budget(p.n_null, p.n),
                "severity": "WARN"})
    spec: dict = {"type": "object", "properties": props}
    if required:
        spec["required"] = required
    if completeness:
        spec["x-completeness"] = completeness
    return spec


def to_yaml(spec: dict) -> str:
    """The draft spec as YAML text (keys in insertion order — the
    review surface the CLI's --infer prints). JSON fallback when
    pyyaml is absent (JSON is a YAML subset, so the output still
    loads)."""
    try:
        import yaml
        return yaml.safe_dump(spec, sort_keys=False)
    except ImportError:  # pragma: no cover
        import json
        return json.dumps(spec, indent=2)


def suggested_rules(df: DataFrame, *, enum_max: int = 8,
                    unique_frac: float = 0.9) -> list[tuple[str, str, str]]:
    """The inference decisions as (column, keyword, value-string) rows
    — the review surface (and the driver gate's comparable form; every
    value is exact, so an independent SQL engine reproduces the rows
    bit-for-bit). Value formatting: ints as decimal strings, budgets
    as '%.4f', enums as comma-joined sorted values, flags as 'true'."""
    rows = []
    for p in profile(df, enum_max=enum_max, unique_frac=unique_frac):
        c = p.column
        if p.n_null == 0 and p.n > 0:
            rows.append((c, "required", "true"))
        elif p.n_null > 0:
            rows.append((c, "x-completeness",
                         f"{completeness_budget(p.n_null, p.n):.4f}"))
        if p.spec_type in ("integer", "number") and p.vmin is not None:
            rows.append((c, "minimum", str(p.vmin)))
            rows.append((c, "maximum", str(p.vmax)))
        if p.spec_type == "string" and p.len_min is not None:
            rows.append((c, "minLength", str(p.len_min)))
            rows.append((c, "maxLength", str(p.len_max)))
        if p.enum_values is not None:
            rows.append((c, "enum",
                         ",".join(str(v) for v in p.enum_values)))
        if p.unique:
            rows.append((c, "x-unique", "true"))
        if p.pattern is not None:
            rows.append((c, "pattern", p.pattern))
    return sorted(rows)
