"""DuckDB oracle SQL for the driver's correctness gate.

The driver runs each Spark query from __spark_entry__.queries() AND the
matching SQL here against the same parquet (DuckDB views), then
compares row-count + schema + order-insensitive value hash. The Spark
side always runs the REAL engine (compiled spec → Column checks); the
SQL here is an independent re-statement of the spec's semantics, so
agreement genuinely cross-checks the engine rather than the engine
against itself.

Everything is built over the derived clips corpus (derive.py) —
identical in both engines by construction (tests/test_derive.py).
"""

from __future__ import annotations

from canned_yaml_spark.derive import (
    clips_duckdb_cte, clips_nested_duckdb_cte, codec_dim_duckdb_cte,
)
from canned_yaml_spark.fixtures import reference_hist

#: Independent SQL re-statement of specs/clips.spec.yaml, in the
#: engine's emission order. (rule_id, severity, violation predicate).
#: {RX}(col, pat) expands per dialect.
RULES = [
    ("required.clip_id", "clip_id IS NULL"),
    ("required.sr_hz", "sr_hz IS NULL"),
    ("required.dur_ms", "dur_ms IS NULL"),
    ("required.codec", "codec IS NULL"),
    ("required.transcript", "transcript IS NULL"),
    ("properties.clip_id.pattern",
     "clip_id IS NOT NULL AND NOT {rx_clip}"),
    ("properties.sr_hz.minimum", "sr_hz IS NOT NULL AND sr_hz < 8000"),
    ("properties.sr_hz.maximum", "sr_hz IS NOT NULL AND sr_hz > 48000"),
    ("properties.dur_ms.minimum", "dur_ms IS NOT NULL AND dur_ms < 1"),
    ("properties.dur_ms.maximum",
     "dur_ms IS NOT NULL AND dur_ms > 3600000"),
    ("properties.codec.enum",
     "codec IS NOT NULL AND codec NOT IN "
     "('pcm_s16le','flac','opus','mp3','vorbis')"),
    ("properties.transcript.minLength",
     "transcript IS NOT NULL AND length(transcript) < 1"),
    ("properties.transcript.maxLength",
     "transcript IS NOT NULL AND length(transcript) > 4096"),
]

CLIP_PATTERN = "^clip_[0-9]{10}$"


def _rules(dialect: str) -> list[tuple[str, str]]:
    if dialect == "duckdb":
        rx = f"regexp_matches(clip_id, '{CLIP_PATTERN}')"
    else:
        rx = f"clip_id RLIKE '{CLIP_PATTERN}'"
    return [(rid, cond.format(rx_clip=rx)) for rid, cond in RULES]


def violations_union(dialect: str = "duckdb") -> str:
    selects = [
        f"SELECT clip_id, part_id, '{rid}' AS rule_id, "
        f"CAST(2 AS INT) AS severity FROM clips WHERE {cond}"
        for rid, cond in _rules(dialect)
    ]
    return " UNION ALL ".join(selects)


def sql_row_violations() -> str:
    return (f"WITH {clips_duckdb_cte()} "
            f"SELECT * FROM ({violations_union('duckdb')})")


def sql_verdicts() -> str:
    return f"""
WITH {clips_duckdb_cte()},
viol AS ({violations_union('duckdb')}),
v AS (SELECT part_id, COUNT(*) AS n_violations,
             MAX(severity) AS max_severity
      FROM viol GROUP BY part_id)
SELECT c.part_id,
       COUNT(*) AS n_rows,
       COALESCE(MAX(v.n_violations), 0) AS n_violations,
       MAX(v.max_severity) AS max_severity,
       (COALESCE(MAX(v.max_severity), -1) < 2) AS pass
FROM clips c LEFT JOIN v ON c.part_id = v.part_id
GROUP BY c.part_id
""".strip()


def sql_duplicate_keys() -> str:
    return (f"WITH {clips_duckdb_cte()} "
            f"SELECT clip_id, COUNT(*) AS n_dup FROM clips "
            f"GROUP BY clip_id HAVING COUNT(*) > 1")


def sql_unique_violations() -> str:
    return f"""
WITH {clips_duckdb_cte()},
d AS (SELECT clip_id, COUNT(*) AS n_dup FROM clips
      GROUP BY clip_id HAVING COUNT(*) > 1)
SELECT c.clip_id, c.part_id, 'x-unique.clip_id' AS rule_id,
       CAST(2 AS INT) AS severity
FROM clips c JOIN d ON c.clip_id = d.clip_id
""".strip()


def sql_composite_unique() -> str:
    # restates the x-unique-together (clip_id, codec) gate: tuple
    # grouping + join-back, like sql_unique_violations with a 2-col key
    return f"""
WITH {clips_duckdb_cte()},
d AS (SELECT clip_id, codec FROM clips
      GROUP BY clip_id, codec HAVING COUNT(*) > 1)
SELECT c.clip_id, c.part_id, 'x-unique.(clip_id,codec)' AS rule_id,
       CAST(2 AS INT) AS severity
FROM clips c JOIN d ON c.clip_id = d.clip_id AND c.codec = d.codec
""".strip()


def sql_blocklist() -> str:
    # restates the x-absent gate: the same derived blocklist as a
    # subquery, EXISTS semi-join semantics, NULL excluded
    return f"""
WITH {clips_duckdb_cte()},
block AS (SELECT printf('clip_%010d', o_orderkey) AS bad_id
          FROM orders WHERE o_orderkey % 101 = 5)
SELECT clip_id, part_id, 'x-absent.clip_id' AS rule_id,
       CAST(2 AS INT) AS severity
FROM clips
WHERE clip_id IS NOT NULL
  AND EXISTS (SELECT 1 FROM block WHERE bad_id = clip_id)
""".strip()


def sql_composite_ref() -> str:
    # restates the x-ref-together (codec, sr_hz) gate: the same valid
    # codec×rate pair set as VALUES, NOT EXISTS anti-join semantics,
    # NULL parts excluded like the engine
    from canned_yaml_spark.derive import SAMPLE_RATES
    pairs = [(c, s) for c in ("pcm_s16le", "flac", "opus", "mp3")
             for s in SAMPLE_RATES
             if not (c == "mp3" and s == 8000)
             and not (c == "opus" and s == 22050)]
    values = ", ".join(f"('{c}', {s})" for c, s in pairs)
    return f"""
WITH {clips_duckdb_cte()},
caps(d_codec, d_sr) AS (VALUES {values})
SELECT clip_id, part_id, 'x-ref.(codec,sr_hz)' AS rule_id,
       CAST(2 AS INT) AS severity
FROM clips
WHERE codec IS NOT NULL AND sr_hz IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM caps
                  WHERE d_codec = codec AND d_sr = sr_hz)
""".strip()


def sql_referential_violations() -> str:
    return f"""
WITH {clips_duckdb_cte()}, {codec_dim_duckdb_cte()}
SELECT c.clip_id, c.part_id, 'x-ref.codec' AS rule_id,
       CAST(2 AS INT) AS severity
FROM clips c
WHERE c.codec IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM codec_dim d WHERE d.codec = c.codec)
""".strip()


def sql_column_stats() -> str:
    return f"""
WITH {clips_duckdb_cte()}
SELECT part_id,
       COUNT(*) AS n_rows,
       COUNT(sr_hz) AS sr_hz_n,
       MIN(sr_hz) AS sr_hz_min, MAX(sr_hz) AS sr_hz_max,
       ROUND(AVG(sr_hz), 4) AS sr_hz_avg,
       COUNT(DISTINCT sr_hz) AS sr_hz_distinct,
       MIN(dur_ms) AS dur_ms_min, MAX(dur_ms) AS dur_ms_max,
       ROUND(AVG(dur_ms), 4) AS dur_ms_avg,
       COUNT(DISTINCT dur_ms) AS dur_ms_distinct
FROM clips GROUP BY part_id
""".strip()


def _hist_values_cte() -> str:
    rows = reference_hist()
    # repr() round-trips the exact IEEE double — both engines must use
    # bit-identical expected fractions or the PSI sums drift
    vals = ", ".join(f"({int(b)}, {f!r})"
                     for b, f in rows.itertuples(index=False))
    return f"expected AS (SELECT * FROM (VALUES {vals}) t(bucket, expected_frac))"


def sql_drift_psi() -> str:
    # mirrors drift.psi_per_partition: clamped buckets, full grid,
    # eps-guarded log terms; rounded to 4 decimals so both engines'
    # float sums agree
    return f"""
WITH {clips_duckdb_cte()}, {_hist_values_cte()},
hist AS (
  SELECT part_id,
         CAST(LEAST(GREATEST(FLOOR(dur_ms / 600.0), 0), 19) AS INT) AS bucket,
         COUNT(*) AS cnt
  FROM clips WHERE dur_ms IS NOT NULL GROUP BY 1, 2),
parts AS (SELECT DISTINCT part_id FROM hist),
buckets AS (SELECT DISTINCT bucket FROM expected),
tot AS (SELECT part_id, SUM(cnt) AS part_n FROM hist GROUP BY part_id),
grid AS (SELECT p.part_id, b.bucket FROM parts p CROSS JOIN buckets b)
SELECT g.part_id,
       ROUND(SUM((COALESCE(h.cnt, 0) * 1.0 / t.part_n - e.expected_frac)
             * LN((COALESCE(h.cnt, 0) * 1.0 / t.part_n + 0.000001)
                  / (e.expected_frac + 0.000001))), 4) AS psi
FROM grid g
LEFT JOIN hist h ON g.part_id = h.part_id AND g.bucket = h.bucket
JOIN expected e ON g.bucket = e.bucket
JOIN tot t ON g.part_id = t.part_id
GROUP BY g.part_id
""".strip()


def sql_w1_drift() -> str:
    # mirrors drift.w1_per_partition: W1 over a shared bucket grid is
    # the L1 distance between CDFs × bucket width. The window running
    # sum adds (p−e) in the same bucket order as the Spark fold, so cum
    # values are bit-identical; the final Σ|cum| reorders at most a few
    # ulps, absorbed by the 4-decimal round.
    return f"""
WITH {clips_duckdb_cte()}, {_hist_values_cte()},
hist AS (
  SELECT part_id,
         CAST(LEAST(GREATEST(FLOOR(dur_ms / 600.0), 0), 19) AS INT) AS bucket,
         COUNT(*) AS cnt
  FROM clips WHERE dur_ms IS NOT NULL GROUP BY 1, 2),
parts AS (SELECT DISTINCT part_id FROM hist),
tot AS (SELECT part_id, SUM(cnt) AS part_n FROM hist GROUP BY part_id),
grid AS (SELECT p.part_id, e.bucket, e.expected_frac
         FROM parts p CROSS JOIN expected e),
cums AS (
  SELECT g.part_id,
         SUM(COALESCE(h.cnt, 0) * 1.0 / t.part_n - g.expected_frac)
           OVER (PARTITION BY g.part_id ORDER BY g.bucket) AS cum
  FROM grid g
  LEFT JOIN hist h ON g.part_id = h.part_id AND g.bucket = h.bucket
  JOIN tot t ON g.part_id = t.part_id)
SELECT part_id, ROUND(SUM(ABS(cum)) * 600.0, 4) AS w1
FROM cums GROUP BY part_id
""".strip()


def sql_snapshot_diff() -> str:
    # mirrors dataset.snapshot_diff over the derive.snapshot_select
    # pair: full-outer key join, null-safe per-column comparison,
    # changed_cols joined in sorted column order (codec, dur_ms,
    # sr_hz, transcript) exactly as the operator sorts compare_cols
    from canned_yaml_spark.derive import snapshot_select
    cells = "\n              ".join(
        f"CASE WHEN o.{c} IS DISTINCT FROM n.{c} THEN '{c}' END,"
        for c in ("codec", "dur_ms", "sr_hz", "transcript")).rstrip(",")
    return f"""
WITH oldsnap AS ({snapshot_select('duckdb', 'old')}),
newsnap AS ({snapshot_select('duckdb', 'new')})
SELECT COALESCE(o.clip_id, n.clip_id) AS clip_id,
       CASE WHEN o.clip_id IS NULL THEN 'added'
            WHEN n.clip_id IS NULL THEN 'removed'
            ELSE 'changed' END AS change,
       CASE WHEN o.clip_id IS NULL OR n.clip_id IS NULL THEN ''
            ELSE concat_ws(',',
              {cells})
       END AS changed_cols
FROM oldsnap o FULL OUTER JOIN newsnap n ON o.clip_id = n.clip_id
WHERE o.clip_id IS NULL OR n.clip_id IS NULL
   OR o.codec IS DISTINCT FROM n.codec
   OR o.dur_ms IS DISTINCT FROM n.dur_ms
   OR o.sr_hz IS DISTINCT FROM n.sr_hz
   OR o.transcript IS DISTINCT FROM n.transcript
""".strip()


def sql_conditional_rules() -> str:
    # restates the draft-07 applicator gate: root if/then cross-column
    # conditional + per-property allOf branches + not. NULL semantics
    # mirror the compiler: property checks inside branches pass on NULL
    # (absent property validates), value rules only fire on non-NULL.
    return f"""
WITH {clips_duckdb_cte()}
SELECT clip_id, part_id, '$.if' AS rule_id, CAST(2 AS INT) AS severity
FROM clips
WHERE codec IS NOT NULL AND codec IN ('opus', 'mp3')
  AND sr_hz IS NOT NULL AND sr_hz > 22050
UNION ALL
SELECT clip_id, part_id, 'properties.sr_hz.allOf[0]', 2 FROM clips
WHERE sr_hz IS NOT NULL AND sr_hz < 8000
UNION ALL
SELECT clip_id, part_id, 'properties.sr_hz.allOf[1]', 2 FROM clips
WHERE sr_hz IS NOT NULL AND sr_hz > 48000
UNION ALL
SELECT clip_id, part_id, 'properties.codec.not', 2 FROM clips
WHERE codec = 'vorbis'
""".strip()


def sql_draft07_completion() -> str:
    # restates the draft-07 completion-batch gate over the nested
    # corpus: uniqueItems / not-contains-const / contains-type on
    # arrays, min/maxProperties + propertyNames on the attrs map, and
    # a root if(const)→then(multipleOf) cross-column conditional.
    # Spark's array_distinct keeps ONE null (null==null is a dup);
    # DuckDB's list_distinct drops nulls entirely — the +has_null term
    # restates the engine's semantics exactly.
    int_rx = "^\\s*[+-]?[0-9]+\\s*$"
    return f"""
WITH {clips_nested_duckdb_cte()}
{_nested_select(
    "properties.tags.uniqueItems",
    "tags IS NOT NULL AND NOT (len(list_distinct(tags)) "
    "+ CASE WHEN len(list_filter(tags, x -> x IS NULL)) > 0 "
    "THEN 1 ELSE 0 END = len(tags))")}
UNION ALL
{_nested_select(
    "properties.tags.not",
    "tags IS NOT NULL AND len(list_filter(tags, x -> x = 'BAD42')) > 0")}
UNION ALL
{_nested_select(
    "properties.pair.contains",
    "pair IS NOT NULL AND NOT ("
    f"len(list_filter(pair, x -> x IS NOT NULL "
    f"AND regexp_matches(x, '{int_rx}'))) > 0 "
    "OR len(list_filter(pair, x -> x IS NULL)) > 0)")}
UNION ALL
{_nested_select("properties.attrs.minProperties",
                "attrs IS NOT NULL AND NOT (cardinality(attrs) >= 1)")}
UNION ALL
{_nested_select("properties.attrs.maxProperties",
                "attrs IS NOT NULL AND NOT (cardinality(attrs) <= 3)")}
UNION ALL
{_nested_select(
    "properties.attrs.propertyNames",
    "attrs IS NOT NULL AND len(list_filter(map_keys(attrs), "
    "k -> NOT regexp_matches(k, '^[a-z_]+$'))) > 0")}
UNION ALL
{_nested_select(
    "$.if",
    "val_bool IS NOT NULL AND val_bool = 'yes' "
    "AND NOT (TRY_CAST(val_num AS DOUBLE) % 7 = 0)")}
""".strip()


def sql_draft2020_arrays() -> str:
    # restates the 2020-12 array-applicator gate over the nested
    # corpus. prefixItems[0] = number duck on pair position 0 (DuckDB
    # lists are 1-based); `items` governs only the rest (pair[2:]),
    # here the boolean duck. min/maxContains restate the engine's
    # 3VL counting exactly: an unjudgeable (NULL-verdict) element
    # counts toward minContains (x IS NULL OR match — optimistic) but
    # not toward maxContains (definite matches only) — the rule-3
    # [word, NULL] injection is the row that tells the two counts
    # apart.
    tag_rx = "^[a-z]+$"
    return f"""
WITH {clips_nested_duckdb_cte()}
{_nested_select(
    "properties.pair.prefixItems[0]",
    "pair IS NOT NULL AND len(pair) >= 1 AND pair[1] IS NOT NULL "
    "AND TRY_CAST(pair[1] AS DOUBLE) IS NULL")}
UNION ALL
{_nested_select(
    "properties.pair.items",
    "pair IS NOT NULL AND len(list_filter(pair[2:], x -> x IS NOT NULL "
    "AND lower(trim(x)) NOT IN ('true', 'false'))) > 0")}
UNION ALL
{_nested_select(
    "properties.tags.minContains",
    f"tags IS NOT NULL AND len(list_filter(tags, x -> x IS NULL "
    f"OR regexp_matches(x, '{tag_rx}'))) < 2")}
UNION ALL
{_nested_select(
    "properties.tags.maxContains",
    f"tags IS NOT NULL AND len(list_filter(tags, x -> x IS NOT NULL "
    f"AND regexp_matches(x, '{tag_rx}'))) > 4")}
""".strip()


def sql_draft2020_unevaluated() -> str:
    # restates the unevaluated* gate's DYNAMIC annotation flow. b1/b2
    # are the anyOf branches' validity, restated exactly as the engine
    # compiles prefixItems (short arrays / NULL elements never violate
    # a positional schema); an element is claimed iff a VALID branch's
    # prefix covers its (1-based in DuckDB) index. attrs' claim for
    # b/c keys is gated on the if-branch (required b) holding. The
    # rule-4 'x123' rows are the discriminating case: claimed by
    # branch 2, they must NOT fire even though 'x123' fails the
    # unevaluatedItems schema.
    b1 = ("((len(pair) < 1 OR pair[1] IS NULL "
          "OR TRY_CAST(pair[1] AS DOUBLE) IS NOT NULL) "
          "AND (len(pair) < 2 OR pair[2] IS NULL "
          "OR lower(trim(pair[2])) IN ('true', 'false')))")
    b2 = ("(len(pair) < 1 OR pair[1] IS NULL "
          "OR regexp_matches(pair[1], '^x'))")
    return f"""
WITH {clips_nested_duckdb_cte()}
{_nested_select(
    "properties.pair.anyOf",
    f"pair IS NOT NULL AND NOT ({b1} OR {b2})")}
UNION ALL
{_nested_select(
    "properties.pair.unevaluatedItems",
    f"pair IS NOT NULL AND len(list_filter(pair, (x, i) -> "
    f"NOT (({b1} AND i <= 2) OR ({b2} AND i <= 1)) "
    f"AND x IS NOT NULL "
    f"AND NOT regexp_matches(x, '^[a-z ]+$'))) > 0")}
UNION ALL
{_nested_select(
    "properties.attrs.unevaluatedProperties",
    "attrs IS NOT NULL AND len(list_filter(map_keys(attrs), kk -> "
    "NOT (kk = 'a' OR (list_contains(map_keys(attrs), 'b') "
    "AND regexp_matches(kk, '^[bc]$'))))) > 0")}
""".strip()


def sql_violation_report() -> str:
    """Full restatement of runner.violation_report over the gate spec:
    per-rule counts by plain aggregation, example SELECTION by ranking
    on the same XXH64(seed 42, clip_id) the engine uses — restated in
    SQL via xxh64_stages (clip_ids are < 32 bytes, the pinned domain
    bound), signed like Spark's BIGINT so the order matches exactly.
    The never-firing part_id rule contributes the n=0 NULL-example
    row shape."""
    ctes, final = xxh64_stages("tbytes")
    return f"""
WITH {clips_duckdb_cte()},
viol AS (
  SELECT clip_id, 'required.transcript' AS rule_id FROM clips
  WHERE transcript IS NULL
  UNION ALL
  SELECT clip_id, 'properties.sr_hz.minimum' FROM clips
  WHERE sr_hz IS NOT NULL AND NOT (sr_hz >= 8000)
  UNION ALL
  SELECT clip_id, 'properties.dur_ms.minimum' FROM clips
  WHERE dur_ms IS NOT NULL AND NOT (dur_ms >= 1)
  UNION ALL
  SELECT clip_id, 'properties.clip_id.pattern' FROM clips
  WHERE clip_id IS NOT NULL
    AND NOT regexp_matches(clip_id, '^clip_[0-9]{{10}}$')
),
counts AS (SELECT rule_id, COUNT(*) AS n FROM viol GROUP BY 1),
dict AS (SELECT DISTINCT clip_id AS w FROM viol),
tb AS (SELECT w, hex(encode(w)) AS hx,
              CAST(octet_length(encode(w)) AS BIGINT) AS n FROM dict),
tbytes AS (
  SELECT w, n,
         list_transform(range(0, n), i ->
           ((strpos('0123456789ABCDEF',
                    substring(hx, CAST(2*i+1 AS INT), 1)) - 1) * 16
            + strpos('0123456789ABCDEF',
                     substring(hx, CAST(2*i+2 AS INT), 1)) - 1
           )::HUGEINT) AS bs
  FROM tb),
{ctes},
hashed AS (
  SELECT v.rule_id, v.clip_id,
         CAST(CASE WHEN h.h_final >= 9223372036854775808
                   THEN h.h_final - {_M64} ELSE h.h_final END
              AS BIGINT) AS h
  FROM viol v JOIN {final} h ON v.clip_id = h.w),
ranked AS (
  SELECT rule_id, clip_id,
         row_number() OVER (PARTITION BY rule_id
                            ORDER BY h, clip_id) AS rn
  FROM hashed),
decl(rule_id, severity) AS (VALUES
  ('required.transcript', 2),
  ('properties.sr_hz.minimum', 2),
  ('properties.dur_ms.minimum', 2),
  ('properties.clip_id.pattern', 2),
  ('properties.part_id.minimum', 2))
SELECT d.rule_id, CAST(d.severity AS INT) AS severity,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n_violations,
       CAST(r.rn AS INT) AS ex_rank, r.clip_id AS ex_clip_id
FROM decl d
LEFT JOIN counts c USING (rule_id)
LEFT JOIN (SELECT * FROM ranked WHERE rn <= 3) r USING (rule_id)
""".strip()


def sql_format_assert() -> str:
    """Restates the draft-07 format assertion gate: each of the six
    format predicates rendered by formats.format_ok_sql — the SAME
    regex text the Spark plan compiles, plus the same extra conjuncts
    (calendar validity, percent-encoding, non-empty duration) — over
    the shared formats corpus. The Feb-30 injection is regex-shaped on
    purpose: only the calendar-validity arithmetic catches it, so a
    regex-only reimplementation would hash-mismatch here."""
    from canned_yaml_spark.derive import clips_formats_duckdb_cte
    from canned_yaml_spark.formats import format_ok_sql
    arms = []
    for col, fmt in (("ip4", "ipv4"), ("ip6", "ipv6"),
                     ("uuid_s", "uuid"), ("date_s", "date"),
                     ("time_s", "time"), ("dt_s", "date-time"),
                     ("host_s", "hostname"), ("email_s", "email"),
                     ("uri_s", "uri"), ("ptr_s", "json-pointer"),
                     ("dur_s", "duration")):
        arms.append(
            f"SELECT clip_id, part_id,\n"
            f"       'properties.{col}.format' AS rule_id,\n"
            f"       CAST(2 AS INT) AS severity\n"
            f"FROM clips_formats\n"
            f"WHERE {col} IS NOT NULL AND NOT {format_ok_sql(fmt, col)}")
    return (f"WITH {clips_formats_duckdb_cte()}\n"
            + "\nUNION ALL\n".join(arms))


def sql_pattern_props() -> str:
    # restates the patternProperties / additionalProperties gate:
    # map-level runtime key matching on attrs (values under keys
    # matching ^[ad]$ must be lowercase words → the k%7 'd'→digits
    # slot fires; keys outside {a,b,c}∪/^[ad]$/ are banned → the k%5
    # 'Bad Key!' slot fires) and root compile-time column matching
    # (^n_ binds n_tags; the rule-1 zero fires).
    return f"""
WITH {clips_nested_duckdb_cte()}
{_nested_select(
    "properties.attrs.patternProperties.^[ad]$",
    "attrs IS NOT NULL AND len(list_filter(map_entries(attrs), "
    "e -> regexp_matches(e.key, '^[ad]$') AND e.value IS NOT NULL "
    "AND NOT regexp_matches(e.value, '^[a-z]+$'))) > 0")}
UNION ALL
{_nested_select(
    "properties.attrs.additionalProperties",
    "attrs IS NOT NULL AND len(list_filter(map_keys(attrs), "
    "k -> k NOT IN ('a', 'b', 'c') "
    "AND NOT regexp_matches(k, '^[ad]$'))) > 0")}
UNION ALL
{_nested_select("patternProperties.^n_.n_tags.minimum",
                "n_tags IS NOT NULL AND NOT (n_tags >= 1)")}
""".strip()


def sql_dependent_rules() -> str:
    # dependentRequired: presence of codec obliges transcript (fires on
    # the rule-6 NULL-transcript injection); schema-form dependencies
    # compile to a root conditional — transcript present ⇒ dur_ms ≥ 1
    # (fires on the rule-1 zero-duration injection).
    return f"""
WITH {clips_duckdb_cte()}
SELECT clip_id, part_id,
       '$.dependentRequired.codec.transcript' AS rule_id,
       CAST(2 AS INT) AS severity
FROM clips WHERE codec IS NOT NULL AND transcript IS NULL
UNION ALL
SELECT clip_id, part_id, '$.dependencies.transcript.if', 2
FROM clips WHERE transcript IS NOT NULL AND NOT (dur_ms >= 1)
""".strip()


def sql_oneof_violations() -> str:
    # three overlapping branches → exercises the 0-match and >1-match
    # outcomes (canner.cc:540-559)
    return f"""
WITH {clips_duckdb_cte()}
SELECT clip_id, part_id, 'properties.dur_ms.oneOf' AS rule_id,
       CAST(2 AS INT) AS severity
FROM clips
WHERE dur_ms IS NOT NULL
  AND (CAST(dur_ms BETWEEN 200 AND 5000 AS INT)
       + CAST(dur_ms BETWEEN 4000 AND 10000 AS INT)
       + CAST(dur_ms >= 15000 AS INT)) <> 1
""".strip()


def sql_anyof_violations() -> str:
    return f"""
WITH {clips_duckdb_cte()}
SELECT clip_id, part_id, 'properties.transcript.anyOf' AS rule_id,
       CAST(2 AS INT) AS severity
FROM clips
WHERE transcript IS NOT NULL
  AND NOT (regexp_matches(transcript, '^alpha') OR length(transcript) >= 10)
""".strip()


def sql_type_duck() -> str:
    # duck-typed integer check on a string staging column
    return f"""
WITH {clips_duckdb_cte()},
staged AS (
  SELECT clip_id, part_id,
         CASE CAST(substr(clip_id, 6) AS BIGINT) % 4
              WHEN 0 THEN '42' WHEN 1 THEN ' +7 '
              WHEN 2 THEN '3.14' ELSE 'abc' END AS val
  FROM clips WHERE regexp_matches(clip_id, '{CLIP_PATTERN}'))
SELECT clip_id, part_id, 'properties.val.type' AS rule_id,
       CAST(2 AS INT) AS severity
FROM staged
WHERE val IS NOT NULL
  AND NOT regexp_matches(val, '^\\s*[+-]?[0-9]+\\s*$')
""".strip()


def sql_salted_codec_counts() -> str:
    return (f"WITH {clips_duckdb_cte()} "
            f"SELECT codec, COUNT(*) AS n FROM clips GROUP BY codec")


def sql_closed_world() -> str:
    # transcript is the one undeclared column in the gate spec; WARN=1
    return (f"WITH {clips_duckdb_cte()} "
            f"SELECT clip_id, part_id, "
            f"'closed-world.transcript' AS rule_id, "
            f"CAST(1 AS INT) AS severity "
            f"FROM clips WHERE transcript IS NOT NULL")


def sql_codec_median() -> str:
    # interpolated exact median — the engine's redistribute-by-value
    # plan (dataset.grouped_exact_median) must reproduce SQL median()
    return (f"WITH {clips_duckdb_cte()} "
            f"SELECT codec, median(dur_ms) AS median "
            f"FROM clips WHERE dur_ms IS NOT NULL GROUP BY codec")


# ============== nested corpus: items / tuple / duck-type gates =======
# Independent DuckDB re-statements of the compiled semantics for the
# array/struct operators (engine: compile.py _items_preds/_type_ok).
# The engine's NULL gating is mirrored exactly: a NULL column never
# violates a value rule; a NULL array ELEMENT never violates the items
# schema; tuple position i is checked only when the array reaches it.

_INT_RX = "^\\s*[+-]?[0-9]+\\s*$"   # svtoi full-parse (canner.cc:1068-1079)
_TAG_RX = "^[a-z]+$"


def _nested_select(rule_id: str, cond: str) -> str:
    return (f"SELECT clip_id, part_id, '{rule_id}' AS rule_id, "
            f"CAST(2 AS INT) AS severity FROM clips_nested WHERE {cond}")


def sql_minmax_items() -> str:
    return f"""
WITH {clips_nested_duckdb_cte()}
{_nested_select("properties.tags.minItems",
                "tags IS NOT NULL AND NOT (len(tags) >= 1)")}
UNION ALL
{_nested_select("properties.tags.maxItems",
                "tags IS NOT NULL AND NOT (len(tags) <= 3)")}
""".strip()


def sql_items_uniform() -> str:
    # forall(tags, x -> x IS NULL OR x ~ tag) mirrored via list_filter
    return f"""
WITH {clips_nested_duckdb_cte()}
{_nested_select(
    "properties.tags.items",
    "tags IS NOT NULL AND len(list_filter(tags, x -> x IS NOT NULL "
    f"AND NOT regexp_matches(x, '{_TAG_RX}'))) > 0")}
""".strip()


def sql_items_tuple() -> str:
    # positional schemas; short arrays and NULL elements don't violate
    # (canner.cc:690-704). DuckDB lists are 1-based.
    return f"""
WITH {clips_nested_duckdb_cte()}
{_nested_select(
    "properties.pair.items[0]",
    "pair IS NOT NULL AND NOT (len(pair) <= 0 OR pair[1] IS NULL "
    f"OR regexp_matches(pair[1], '{_INT_RX}'))")}
UNION ALL
{_nested_select(
    "properties.pair.items[1]",
    "pair IS NOT NULL AND NOT (len(pair) <= 1 OR pair[2] IS NULL "
    "OR lower(trim(pair[2])) IN ('true', 'false'))")}
UNION ALL
{_nested_select("properties.pair.maxItems",
                "pair IS NOT NULL AND NOT (len(pair) <= 2)")}
""".strip()


def sql_ref_chain() -> str:
    # $ref chain posint → intbase resolves to {type: integer, minimum: 10};
    # rule_ids stay located at the call site (compile.py:140-150)
    return f"""
WITH {clips_nested_duckdb_cte()}
{_nested_select(
    "properties.val_num.type",
    f"val_num IS NOT NULL AND NOT regexp_matches(val_num, '{_INT_RX}')")}
UNION ALL
{_nested_select(
    "properties.val_num.minimum",
    "val_num IS NOT NULL AND NOT (TRY_CAST(val_num AS DOUBLE) >= 10)")}
""".strip()


def sql_duck_boolean() -> str:
    return f"""
WITH {clips_nested_duckdb_cte()}
{_nested_select(
    "properties.val_bool.type",
    "val_bool IS NOT NULL AND lower(trim(val_bool)) NOT IN ('true', 'false')")}
""".strip()


def sql_duck_number() -> str:
    return f"""
WITH {clips_nested_duckdb_cte()}
{_nested_select(
    "properties.val_num.type",
    "val_num IS NOT NULL AND TRY_CAST(val_num AS DOUBLE) IS NULL")}
""".strip()


def sql_type_kinds() -> str:
    # array-kind on tags and object-kind on meta fold statically TRUE
    # (zero rows — the oracle confirms no false positives); the
    # null/boolean type set on val_bool is the runtime arm.
    return f"""
WITH {clips_nested_duckdb_cte()}
{_nested_select(
    "properties.val_bool.type",
    "val_bool IS NOT NULL AND NOT (val_bool IS NULL "
    "OR lower(trim(val_bool)) IN ('true', 'false'))")}
""".strip()


def sql_type_scalar() -> str:
    # 'string' accepts any scalar (canner.cc:1081-1083) → static TRUE on
    # the int column; pattern applies through a string cast (runtime).
    return f"""
WITH {clips_nested_duckdb_cte()}
{_nested_select(
    "properties.n_tags.pattern",
    "n_tags IS NOT NULL "
    "AND NOT regexp_matches(CAST(n_tags AS VARCHAR), '^[1-3]$')")}
""".strip()


# =================== multimodal media corpus =========================
# The oracle recomputes every expected value ANALYTICALLY from the key
# (pixel i of image k is (i·7 + k·13) % 256 etc. — multimodal.py stub
# containers), so agreement exercises Spark's real byte-level decode.

_MEDIA_KEYED = """m AS (
  SELECT o_orderkey AS k,
         printf('media_%010d', o_orderkey) AS media_id,
         CAST(o_orderkey % 64 AS INT) AS part_id,
         (o_orderkey % 4 = 3) AS is_vid,
         (o_orderkey % 4 = 1) AS is_wav,
         (o_orderkey % 4 = 2) AS is_bmp,
         (o_orderkey % 8 = 4) AS is_png,
         (o_orderkey % 16 = 8) AS is_jpg,
         (o_orderkey % 32 = 16) AS is_gif,
         (o_orderkey % 64 = 32) AS is_mp4,
         (o_orderkey % 128 = 64) AS is_ogg,
         (o_orderkey % 10 = 0) AS corrupt
  FROM orders)"""


def sql_media_meta() -> str:
    # the WAV branch cross-checks Spark's REAL RIFF chunk walk + s16le
    # decode: sample i of clip k is (i*31 + k*7) % 2048 - 1024
    # (multimodal.wav_sample), restated here analytically
    # the BMP branch cross-checks Spark's REAL header/stride/row-order
    # parse: logical pixel byte i of image k is (i*5 + k*19) % 256
    # (multimodal.bmp_pixel) — the mean is storage-order-invariant, so
    # the bottom-up + padded file layout cancels out here while the
    # parser still has to honor it to find the bytes at all
    img_mean = ("list_avg(list_transform(generate_series(0, 191), "
                "i -> (i*7 + k*13) % 256))")
    bmp_mean = ("list_avg(list_transform(generate_series(0, 89), "
                "i -> (i*5 + k*19) % 256))")
    # the PNG branch cross-checks Spark's REAL chunk walk + CRC32
    # verification + zlib inflate + five-filter unfiltering: logical
    # pixel byte j of image k is (j*3 + k*23) % 256 (multimodal.
    # png_pixel); filtering is lossless, so the decoded mean equals the
    # analytic mean — but only if every filter type inverts correctly
    png_mean = ("list_avg(list_transform(generate_series(0, 74), "
                "j -> (j*3 + k*23) % 256))")
    # the Y4M branch cross-checks Spark's REAL stream-header + FRAME
    # walk: payload byte j of stream k is (j*11 + k*17) % 256
    # (multimodal.y4m_byte); mean_luma averages ONLY the Y plane —
    # within each 24-byte C420 frame that is offsets j % 24 < 16, so
    # the parser must slice planes correctly, not just find the bytes
    vid_mean = ("list_avg(list_transform(list_filter("
                "generate_series(0, 95), j -> j % 24 < 16), "
                "j -> (j*11 + k*17) % 256))")
    wav_mean = ("list_avg(list_transform(generate_series(0, 199), "
                "i -> (i*31 + k*7) % 2048 - 1024))")
    # the JPEG branch cross-checks Spark's REAL T.81 baseline decode
    # (marker parse, stream-defined Huffman tables, dequant, IDCT,
    # half-up clamp): block j of image k is constant at
    # (j*37 + k*29) % 256, so only the DC coefficient survives the
    # FDCT and the whole lossy path collapses to quantization
    # arithmetic with q₀ = 24 (quality 33) — decoded block value =
    # clip(3·round_half_away((v−128)/3) + 128, 0, 255)
    # (jpeg.block_constant_decoded; boundary-free by construction,
    # see multimodal.JPEG_Q). Restart-marker streams (k%3==0) must
    # decode to the same pixels.
    jpg_val = ("(CASE WHEN ((j*37 + k*29) % 256) >= 128 THEN "
               "floor((((j*37 + k*29) % 256) - 128)/3.0 + 0.5) ELSE "
               "-floor((128 - ((j*37 + k*29) % 256))/3.0 + 0.5) END)")
    jpg_mean = (f"list_avg(list_transform(generate_series(0, 5), "
                f"j -> greatest(least(3*{jpg_val} + 128, 255), 0)))")
    # the GIF branch cross-checks Spark's REAL LZW decode (variable-
    # width codes, sub-block reassembly, palette map, 4-frame
    # composition): frame f pixel i of stream k is
    # (i·13 + f·29 + k·7) % 256 through an identity grayscale palette
    # — LOSSLESS, so the decoded mean IS the generator mean
    # (multimodal.gif_pixel; j below flattens frames×pixels, 4×128)
    gif_mean = ("list_avg(list_transform(generate_series(0, 511), "
                "j -> ((j % 128)*13 + (j // 128)*29 + k*7) % 256))")
    return f"""
WITH {_MEDIA_KEYED}
SELECT media_id, part_id,
       CASE WHEN is_vid OR is_mp4 THEN 'video'
            WHEN is_wav OR is_ogg THEN 'audio'
            ELSE 'image' END AS kind,
       NOT corrupt AS ok,
       CASE WHEN corrupt OR is_ogg THEN NULL WHEN is_vid THEN 4
            WHEN is_wav THEN 2 WHEN is_bmp THEN 6
            WHEN is_png THEN 5 WHEN is_jpg THEN 24
            WHEN is_gif THEN 16 WHEN is_mp4 THEN 12 ELSE 8 END
           AS width,
       CASE WHEN corrupt OR is_wav OR is_ogg THEN NULL
            WHEN is_vid THEN 4 WHEN is_bmp THEN 5
            WHEN is_png THEN 5 WHEN is_jpg THEN 16
            WHEN is_gif THEN 8 WHEN is_mp4 THEN 10 ELSE 8 END
           AS height,
       CASE WHEN corrupt OR is_mp4 OR is_ogg THEN NULL
            WHEN is_vid THEN 3
            WHEN is_wav THEN 1 WHEN is_jpg THEN 1 ELSE 3 END AS channels,
       CASE WHEN corrupt THEN NULL WHEN is_vid THEN 4
            WHEN is_wav THEN 200 WHEN is_gif THEN 4
            WHEN is_mp4 THEN 5
            WHEN is_ogg THEN 960 + 480 * (1 + k % 5)
            ELSE 1 END AS n_frames,
       CASE WHEN corrupt OR is_mp4 OR is_ogg THEN NULL
            WHEN is_vid THEN round({vid_mean}, 4)
            WHEN is_wav THEN round({wav_mean}, 4)
            WHEN is_bmp THEN round({bmp_mean}, 4)
            WHEN is_png THEN round({png_mean}, 4)
            WHEN is_jpg THEN round({jpg_mean}, 4)
            WHEN is_gif THEN round({gif_mean}, 4)
            ELSE round({img_mean}, 4) END AS mean_luma
FROM m
""".strip()


def sql_transcript_distance() -> str:
    # both engines implement classic Levenshtein; the wrong-id
    # injection (rule 5) mis-joins to the previous key's reference and
    # always differs (word index steps by 7919 % 16 = 15 per key), the
    # junk-transcript injection (rule 7) differs trivially, NULLs drop
    from canned_yaml_spark.derive import (
        clips_duckdb_cte, transcript_ref_select,
    )
    return f"""
WITH {clips_duckdb_cte()},
tref AS ({transcript_ref_select('duckdb')})
SELECT * FROM (
  SELECT c.clip_id, c.part_id,
         CAST(levenshtein(c.transcript, t.transcript_ref) AS INT) AS dist
  FROM clips c JOIN tref t USING (clip_id))
WHERE dist > 0
""".strip()


def sql_audio_stats() -> str:
    # audio quality metrics over the REAL WAV rows: every metric is
    # restated analytically from wav_sample(k, i) = (i*31+k*7)%2048-1024
    # over i in [0, 200). Corrupt WAVs cannot occur (k%4=1 is odd,
    # corruption hits even keys), so every row has full metrics. The
    # double math (avg → sqrt → log10) runs in the same IEEE order in
    # both engines; round(4) absorbs any final-ulp drift.
    smp = ("list_transform(generate_series(0, 199), "
           "i -> (i*31 + k*7) % 2048 - 1024)")
    return f"""
WITH {_MEDIA_KEYED},
s AS (SELECT media_id, part_id, {smp} AS smp FROM m WHERE is_wav)
SELECT media_id, part_id,
       CAST(200 AS BIGINT) AS n_samples,
       CAST(list_max(list_transform(smp, v -> abs(v))) AS INT) AS peak,
       round(list_avg(smp), 4) AS dc_offset,
       round(20 * log10(sqrt(list_avg(list_transform(smp,
             v -> CAST(v AS DOUBLE) * v))) / 32768.0), 4) AS rms_db,
       round(len(list_filter(smp, v -> abs(v) >= 1000)) / 200.0, 4)
           AS clip_frac,
       round(len(list_filter(smp, v -> abs(v) <= 16)) / 200.0, 4)
           AS silence_frac
FROM s
""".strip()


def sql_frame_sample() -> str:
    # multi-frame payloads sampled every 2nd frame: real 4-frame 4x4
    # C420 Y4M streams (frame = one full planar YUV payload, 16 Y +
    # 4 U + 4 V = 24 bytes; corrupt video rows cannot occur —
    # corruption hits k % 10 = 0, even, while video is k % 4 = 3,
    # odd) and real 4-frame 16×8 animated GIFs (frame = the COMPOSED
    # RGB raster after LZW decode, 16·8·3 = 384 bytes; corrupt GIFs
    # ARE possible — k%32==16 is even — and contribute no rows)
    return f"""
WITH {_MEDIA_KEYED},
v AS (SELECT media_id FROM m WHERE is_vid),
g AS (SELECT media_id FROM m WHERE is_gif AND NOT corrupt),
p AS (SELECT media_id, k FROM m WHERE is_mp4 AND NOT corrupt),
idx AS (SELECT unnest([0, 2]) AS frame_idx)
SELECT v.media_id, CAST(idx.frame_idx AS INT) AS frame_idx,
       CAST(24 AS INT) AS frame_len
FROM v CROSS JOIN idx
UNION ALL
SELECT g.media_id, CAST(idx.frame_idx AS INT) AS frame_idx,
       CAST(384 AS INT) AS frame_len
FROM g CROSS JOIN idx
UNION ALL
-- MP4 demux: coded sample i has 60 + (k+i) % 40 bytes
-- (multimodal.encode_mp4), samples 0/2/4 of 5 at every=2
SELECT p.media_id, CAST(i.frame_idx AS INT) AS frame_idx,
       CAST(60 + (p.k + i.frame_idx) % 40 AS INT) AS frame_len
FROM p CROSS JOIN (SELECT unnest([0, 2, 4]) AS frame_idx) i
""".strip()


# ================== training-data ops over documents/embeddings ======
# Shared constants come from textops/dedup so both engines restate the
# same semantics.

def _from_textops():
    from canned_yaml_spark.textops import (
        EN_STOPWORDS, LANG_STOPWORDS, TOKEN_RE,
    )
    return EN_STOPWORDS, LANG_STOPWORDS, TOKEN_RE


_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

#: the dedup-injected corpus (dedup.with_dup_injection mirror)
_DOCS2 = """docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 1000000, text || ' tail' FROM documents
    WHERE doc_id % 5 = 0
  UNION ALL SELECT doc_id + 2000000, text FROM documents
    WHERE doc_id % 10 = 0)"""

_SHINGLES = f"""norm AS (SELECT doc_id, {_NORM} AS t FROM docs2),
sh AS (SELECT doc_id,
  CASE WHEN length(t) < 5 THEN [t]
       ELSE list_distinct(list_transform(generate_series(1, length(t)-4),
                                         i -> substr(t, i, 5))) END AS s
  FROM norm)"""


def sql_token_stats() -> str:
    _, _, token_re = _from_textops()
    return f"""
WITH norm AS (SELECT doc_id, text, {_NORM} AS t FROM documents)
SELECT doc_id,
       CASE WHEN length(t) = 0 THEN 0
            ELSE len(string_split(t, ' ')) END AS ws_tokens,
       len(regexp_extract_all(text, '{token_re}')) AS re_tokens,
       length(text) AS chars
FROM norm
""".strip()


def sql_repetition_stats() -> str:
    """Restates textops.repetition_stats: duplicate n-gram fractions
    (n = 1, 2, 3) over the same `_NORM` whitespace tokenization.
    DuckDB list_slice is inclusive-inclusive and range(a, b) is
    end-exclusive, so n-grams for n are list_slice(words, i, i+n-1)
    for i in range(1, len(words)-n+2). Integer-to-double division of
    identical integers is IEEE-identical in both engines."""
    def ng(n: int) -> str:
        if n == 1:
            return "words"
        return (f"CASE WHEN len(words) >= {n} THEN "
                f"list_transform(range(1, len(words) - {n - 2}), "
                f"i -> array_to_string(list_slice(words, i, i + {n - 1}),"
                f" ' ')) ELSE []::VARCHAR[] END")

    def dup(col: str, alias: str) -> str:
        return (f"CASE WHEN len({col}) > 0 THEN "
                f"(len({col}) - len(list_distinct({col}))) "
                f"/ CAST(len({col}) AS DOUBLE) ELSE 0.0 END AS {alias}")

    return f"""
WITH norm AS (SELECT doc_id, {_NORM} AS t FROM documents),
w AS (SELECT doc_id,
             CASE WHEN length(t) = 0 THEN []::VARCHAR[]
                  ELSE string_split(t, ' ') END AS words
      FROM norm),
g AS (SELECT doc_id, words, {ng(2)} AS ng2, {ng(3)} AS ng3 FROM w)
SELECT doc_id, len(words) AS n_words,
       {dup('words', 'dup_frac_1')},
       {dup('ng2', 'dup_frac_2')},
       {dup('ng3', 'dup_frac_3')}
FROM g
""".strip()


def sql_pack_plan() -> str:
    """Restates the packing plan as the straight global cumsum the
    distributed prefix sum must equal: one SUM() OVER (ORDER BY
    doc_id) window, exact integer arithmetic, bins by floor
    division."""
    return """
WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n FROM documents
           WHERE n_chars IS NOT NULL AND n_chars >= 0),
c AS (SELECT doc_id, n,
             COALESCE(SUM(n) OVER (ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS off
      FROM d)
SELECT doc_id, n AS n_tokens, CAST(off AS BIGINT) AS start_offset,
       CAST(CASE WHEN n > 0 THEN off // 4096 END AS BIGINT) AS first_bin,
       CAST(CASE WHEN n > 0 THEN (off + n - 1) // 4096 END AS BIGINT)
           AS last_bin,
       CAST(CASE WHEN n > 0
                 THEN (off + n - 1) // 4096 - off // 4096 + 1
                 ELSE 0 END AS BIGINT) AS n_bins
FROM c
""".strip()


def sql_repetition_rule() -> str:
    """Restates the x-repetition gate: duplicate-bigram fraction
    > 0.05 over documents.text — same tokenization, same list algebra
    as sql_repetition_stats, same NULL-excluded value-rule semantics
    (a NULL text is absent-not-validated, like pattern/minLength)."""
    return f"""
WITH norm AS (SELECT doc_id, source, text, {_NORM} AS t FROM documents),
w AS (SELECT doc_id, source, text,
             CASE WHEN length(t) = 0 THEN []::VARCHAR[]
                  ELSE string_split(t, ' ') END AS words
      FROM norm),
g AS (SELECT doc_id, source, text,
             CASE WHEN len(words) >= 2 THEN
               list_transform(range(1, len(words)),
                 i -> array_to_string(list_slice(words, i, i + 1), ' '))
             ELSE []::VARCHAR[] END AS ng2
      FROM w),
d AS (SELECT doc_id, source, text,
             CASE WHEN len(ng2) > 0 THEN
               (len(ng2) - len(list_distinct(ng2)))
               / CAST(len(ng2) AS DOUBLE) ELSE 0.0 END AS d2
      FROM g)
SELECT doc_id AS clip_id, source AS part_id,
       'properties.text.x-repetition' AS rule_id,
       CAST(2 AS INT) AS severity
FROM d WHERE text IS NOT NULL AND NOT (d2 <= 0.05)
""".strip()


def sql_quality_score() -> str:
    en, _, _ = _from_textops()
    stop_list = ", ".join(f"'{w}'" for w in en)
    return f"""
WITH norm AS (SELECT doc_id, text, {_NORM} AS t FROM documents),
w AS (SELECT doc_id, text, t,
             CASE WHEN length(t) = 0 THEN 0
                  ELSE len(string_split(t, ' ')) END AS n_words,
             len(list_intersect(string_split(t, ' '), [{stop_list}])) AS n_stop,
             length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS n_punct
      FROM norm)
SELECT doc_id, n_words, n_stop AS n_stopwords, n_punct,
       CASE WHEN n_words > 0
            THEN round((length(t) - (n_words - 1)) * 1.0 / n_words, 4)
            END AS mean_word_len,
       CASE WHEN n_words < 5 THEN 0.0
            ELSE round(least(1.0, n_words / 50.0) * 0.5
                 + CASE WHEN n_stop > 0 THEN 0.3 ELSE 0.0 END
                 + CASE WHEN n_punct * 1.0 / greatest(length(text), 1) < 0.2
                        THEN 0.2 ELSE 0.0 END, 4) END AS quality
FROM w
""".strip()


def sql_lang_id() -> str:
    _, langs, _ = _from_textops()
    hit_cols = ",\n       ".join(
        "len(list_intersect(string_split(t, ' '), [{}])) AS hits_{}".format(
            ", ".join(f"'{w}'" for w in ws), lang)
        for lang, ws in sorted(langs.items()))
    best = "greatest({})".format(
        ", ".join(f"hits_{lang}" for lang in sorted(langs)))
    # mirror textops.lang_id: alphabetical tie-break via reverse whens
    pick = "'und'"
    for lang in sorted(langs, reverse=True):
        pick = f"CASE WHEN hits_{lang} = best THEN '{lang}' ELSE {pick} END"
    return f"""
WITH norm AS (SELECT doc_id, {_NORM} AS t FROM documents),
h AS (SELECT doc_id,
       {hit_cols}
      FROM norm),
b AS (SELECT *, {best} AS best FROM h)
SELECT doc_id, {", ".join(f"hits_{lang}" for lang in sorted(langs))},
       CASE WHEN best > 0 THEN {pick} ELSE 'und' END AS lang_pred
FROM b
""".strip()


def sql_fingerprint() -> str:
    return (f"SELECT doc_id, md5({_NORM}) AS fp "
            f"FROM documents")


# --------------------------------------------------- XXH64 in DuckDB
# Spark's F.xxhash64(string) is canonical XXH64 (seed 42) over the
# UTF-8 bytes (verified value-for-value in
# tests/test_dedup.py::test_duckdb_xxh64_matches_spark). Restating the
# hash itself in SQL lets engine-hash-dependent operators (simhash)
# have a full value oracle instead of a rows-only check. Scope: inputs
# under 32 bytes (no 32-byte stripe loop — tail words/bytes only),
# which covers whitespace tokens of the documents corpus; the domain
# bound is pinned in pytest. 64-bit wraparound arithmetic runs on
# HUGEINT with 32-bit limb splits (a*b mod 2^64 stays < 2^65 < 2^127);
# each hash-state step is its own MATERIALIZED CTE stage because
# DuckDB expands lateral aliases textually (nesting them would blow up
# exponentially).
_M64 = "18446744073709551616"
_XXP = (11400714785074694791, 14029467366897019727,
        1609587929392839161, 9650029242287828579, 2870177450012600261)


def _mulmod64(a: str, b) -> str:
    return (f"((({a}) % 4294967296) * (({b}) % 4294967296) + "
            f"(((({a}) % 4294967296) * (({b}) // 4294967296) + "
            f"(({a}) // 4294967296) * (({b}) % 4294967296)) % 4294967296) "
            f"* 4294967296) % {_M64}")


def _rotl64(x: str, r: int) -> str:
    return (f"(({x}) * {1 << r} % {_M64} + ({x}) // {1 << (64 - r)}) "
            f"% {_M64}")


def xxh64_stages(src: str, prefix: str = "xh") -> tuple[str, str]:
    """CTE chain computing XXH64(seed=42) as `h_final` (HUGEINT in
    [0, 2^64)) from `src` rows carrying (bs HUGEINT[] — the UTF-8
    bytes, n BIGINT — octet length < 32). Returns (ctes, final_name)."""
    p1, p2, p3, p4, p5 = _XXP
    stages: list[str] = []
    prev = src

    def stage(cols: str) -> None:
        nonlocal prev
        name = f"{prefix}{len(stages)}"
        stages.append(
            f"{name} AS MATERIALIZED (SELECT *, {cols} FROM {prev})")
        prev = name

    stage(f"({p5 + 42} + n) % {_M64} AS h0")
    h = "h0"
    for w in range(3):                      # 8-byte tail words
        g = f"n >= {8 * (w + 1)}"
        word = " + ".join(
            f"coalesce(bs[{8 * w + j + 1}], 0) * {1 << (8 * j)}::HUGEINT"
            for j in range(8))
        stage(f"CASE WHEN {g} THEN {word} ELSE 0 END AS wv{w}")
        stage(f"{_mulmod64(_rotl64(_mulmod64(f'wv{w}', p2), 31), p1)} "
              f"AS rr{w}")
        stage(f"xor({h}::HUGEINT, rr{w}::HUGEINT) AS xx{w}")
        stage(f"CASE WHEN {g} THEN "
              f"({_mulmod64(_rotl64(f'xx{w}', 27), p1)} + {p4}) % {_M64} "
              f"ELSE {h} END AS h{w + 1}")
        h = f"h{w + 1}"
    word4 = " + ".join(
        f"coalesce(bs[8 * (n // 8) + {j + 1}], 0) * {1 << (8 * j)}::HUGEINT"
        for j in range(4))
    stage(f"CASE WHEN n % 8 >= 4 THEN {word4} ELSE 0 END AS u4")
    stage(f"xor({h}::HUGEINT, ({_mulmod64('u4', p1)})::HUGEINT) AS x4")
    stage(f"CASE WHEN n % 8 >= 4 THEN "
          f"({_mulmod64(_rotl64('x4', 23), p2)} + {p3}) % {_M64} "
          f"ELSE {h} END AS h4")
    h = "h4"
    stage("8 * (n // 8) + CASE WHEN n % 8 >= 4 THEN 4 ELSE 0 END AS ob")
    for j in range(3):                      # tail bytes
        g = f"n % 4 > {j}"
        stage(f"CASE WHEN {g} THEN coalesce(bs[ob + {j + 1}], 0) "
              f"ELSE 0 END AS bv{j}")
        stage(f"xor({h}::HUGEINT, ({_mulmod64(f'bv{j}', p5)})::HUGEINT) "
              f"AS bx{j}")
        stage(f"CASE WHEN {g} THEN {_mulmod64(_rotl64(f'bx{j}', 11), p1)} "
              f"ELSE {h} END AS hb{j}")
        h = f"hb{j}"
    stage(f"xor({h}::HUGEINT, ({h} // {1 << 33})::HUGEINT) AS av1")
    stage(f"{_mulmod64('av1', p2)} AS av2")
    stage("xor(av2::HUGEINT, (av2 // 536870912)::HUGEINT) AS av3")
    stage(f"{_mulmod64('av3', p3)} AS av4")
    stage("xor(av4::HUGEINT, (av4 // 4294967296)::HUGEINT) AS h_final")
    return ",\n".join(stages), prev


def sql_simhash_groups() -> str:
    """Full semantic restatement of dedup.simhash over the injected
    corpus: tokenize, XXH64(seed 42) each DISTINCT token (the SQL
    restatement above — hash the distinct-token dictionary once, join
    back), 64 sign-of-vote bits, group on the signature. Matches the
    engine's output INCLUDING the 64-bit simhash value itself."""
    ctes, final = xxh64_stages("tbytes")
    pow2 = ", ".join(f"({b}, {1 << b}::HUGEINT)" for b in range(64))
    return f"""
WITH {_DOCS2},
tok AS (
  SELECT DISTINCT doc_id, unnest(string_split({_NORM}, ' ')) AS w
  FROM docs2),
dict AS (SELECT DISTINCT w FROM tok),
tb AS (SELECT w, hex(encode(w)) AS hx,
              CAST(octet_length(encode(w)) AS BIGINT) AS n FROM dict),
tbytes AS (
  SELECT w, n,
         list_transform(range(0, n), i ->
           ((strpos('0123456789ABCDEF',
                    substring(hx, CAST(2*i+1 AS INT), 1)) - 1) * 16
            + strpos('0123456789ABCDEF',
                     substring(hx, CAST(2*i+2 AS INT), 1)) - 1
           )::HUGEINT) AS bs
  FROM tb),
{ctes},
bits AS (SELECT * FROM (VALUES {pow2}) t(b, p)),
votes AS (
  SELECT tok.doc_id, bits.b, bits.p,
         SUM(CASE WHEN (h.h_final // bits.p) % 2 = 1
                  THEN 1 ELSE -1 END) AS v
  FROM tok JOIN {final} h USING (w) CROSS JOIN bits
  GROUP BY 1, 2, 3),
sig AS (
  SELECT doc_id,
         SUM(CASE WHEN v > 0 THEN p ELSE 0::HUGEINT END) AS s
  FROM votes GROUP BY doc_id),
signed AS (
  SELECT doc_id,
         CAST(CASE WHEN s >= 9223372036854775808 THEN s - {_M64}
                   ELSE s END AS BIGINT) AS simhash
  FROM sig)
SELECT simhash,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
FROM signed GROUP BY simhash HAVING COUNT(*) > 1
""".strip()


def sql_exact_dup_groups() -> str:
    return f"""
WITH {_DOCS2},
f AS (SELECT doc_id, md5({_NORM}) AS fp FROM docs2)
SELECT fp, COUNT(*) AS n_docs,
       array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
FROM f GROUP BY fp HAVING COUNT(*) > 1
""".strip()


def sql_near_dup_pairs(threshold: float = 0.8) -> str:
    # exact shingle Jaccard via an inverted shingle index: pairwise
    # intersection sizes come from a self-join on the shingle (grouped),
    # |A∪B| = |A|+|B|-|A∩B|. Same result as the naive all-pairs
    # list_intersect form, orders of magnitude faster (list_intersect
    # is quadratic per pair). Pairs sharing no shingle can't reach any
    # positive threshold, so the index join loses nothing.
    return f"""
WITH {_DOCS2},
{_SHINGLES},
sizes AS (SELECT doc_id, len(s) AS n FROM sh),
ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
j AS (
  SELECT doc_a, doc_b,
         c * 1.0 / (sa.n + sb.n - c) AS j
  FROM common
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id)
SELECT doc_a, doc_b, round(j, 4) AS jaccard
FROM j WHERE j >= {threshold}
""".strip()


def sql_near_dup_delta(threshold: float = 0.8) -> str:
    # incremental dedup oracle: the SAME exact-Jaccard index join, but
    # only pairs touching the injected delta (doc_id >= 1000000 — the
    # with_dup_injection id offset) are in scope, mirroring
    # dedup.near_dup_pairs_incremental's contract
    return f"""
WITH {_DOCS2},
{_SHINGLES},
sizes AS (SELECT doc_id, len(s) AS n FROM sh),
ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
j AS (
  SELECT doc_a, doc_b,
         c * 1.0 / (sa.n + sb.n - c) AS j
  FROM common
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id)
SELECT doc_a, doc_b, round(j, 4) AS jaccard
FROM j WHERE j >= {threshold}
  AND (doc_a >= 1000000 OR doc_b >= 1000000)
""".strip()


def sql_cosine_topk(k: int = 10, n_queries: int = 5) -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < {n_queries}),
scored AS (
  SELECT q_id, vec_id,
         round(list_inner_product(v, q_vec)
               / (sqrt(list_inner_product(v, v))
                  * sqrt(list_inner_product(q_vec, q_vec))), 4) AS cosine
  FROM e CROSS JOIN q),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cosine DESC, vec_id) AS rank
  FROM scored)
SELECT q_id, vec_id, cosine, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
""".strip()


def sql_audio_near_dups() -> str:
    # ground truth by construction: the gate corpus injects exactly one
    # lossy re-encode per key ≡ 0 (mod 5) over the keys ≡ 0 (mod 37)
    # drawn from orders (audiofp.chirp_corpus_df). The fingerprint
    # operator's structural margins (dup BER ≤ 0.01 vs threshold 0.15,
    # ≥ 20/29 exact probe frames, cross-key BER ≥ 0.3) make its output
    # on this corpus exactly this set — recall AND precision 1.0,
    # pinned in tests/test_audiofp.py.
    return """
SELECT printf('clip_%010d', o_orderkey) AS clip_a,
       printf('clip_%010d_dup', o_orderkey) AS clip_b
FROM orders
WHERE o_orderkey % 37 = 0 AND o_orderkey % 5 = 0
""".strip()


def sql_audio_segments() -> str:
    # every boundary of the gate corpus is closed-form in the clip key
    # (segment.seg_pcm: n_seg = k%3+1, len(j) = 400 + ((k*7+j*13)%200),
    # 250-sample gaps before/between/after) — the oracle restates the
    # arithmetic, so the operator's mask/run detection is value-checked
    # end to end. n_seg ≤ 3 lets start(j) unroll exactly.
    ln = "(400 + ((k*7 + {j}*13) % 200))"
    return f"""
WITH ks AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 37 = 0),
js AS (SELECT k, unnest(range(0, k % 3 + 1)) AS j FROM ks)
SELECT printf('clip_%010d', k) AS clip_id,
       CAST(j AS INT) AS seg_idx,
       CAST(250*(j+1)
            + CASE WHEN j >= 1 THEN {ln.format(j=0)} ELSE 0 END
            + CASE WHEN j >= 2 THEN {ln.format(j=1)} ELSE 0 END
         AS BIGINT) AS seg_start,
       CAST(250*(j+1)
            + CASE WHEN j >= 1 THEN {ln.format(j=0)} ELSE 0 END
            + CASE WHEN j >= 2 THEN {ln.format(j=1)} ELSE 0 END
            + {ln.format(j='j')}
         AS BIGINT) AS seg_end
FROM js
""".strip()


def sql_resample() -> str:
    # value-checks the resampler sample-by-sample THROUGH aggregate
    # metrics: the gate corpus's sample i is the cross-engine-exact
    # modular form (i*31 + k*7) % 2048 - 1024 at 16 kHz, resampled to
    # 12 kHz (ratio 4/3). The oracle restates the exact interpolation
    # arithmetic — f = (j*16000)//12000, r = (j*16000)%12000, out =
    # round((s(f)*(12000-r) + s(f+1)*r)/12000.0) — then the same
    # stats math audio_stats proved cross-engine (sum/sumsq are exact
    # integers; one double division/sqrt/log in identical IEEE order;
    # round(4) absorbs final-ulp drift). Fractions here are thirds, so
    # the round-half tie between engines can never fire.
    s_of = "(({f})*31 + k*7) % 2048 - 1024"
    f = "((j*16000)//12000)"
    f2 = f"least({f} + 1, 3999)"
    r = "((j*16000)%12000)"    # parenthesized: `*` and `%` share
    #                            precedence, s*r must not re-associate
    out = (f"CAST(round((({s_of.format(f=f)}) * (12000 - {r}) "
           f"+ ({s_of.format(f=f2)}) * {r}) / 12000.0) AS BIGINT)")
    return f"""
WITH ks AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 37 = 0),
s AS (SELECT printf('clip_%010d', k) AS clip_id,
             list_transform(range(0, 3000), j -> {out}) AS smp
      FROM ks)
SELECT clip_id,
       CAST(3000 AS BIGINT) AS n_samples,
       CAST(list_max(list_transform(smp, v -> abs(v))) AS INT) AS peak,
       round(list_avg(smp), 4) AS dc_offset,
       round(20 * log10(sqrt(list_avg(list_transform(smp,
             v -> CAST(v AS DOUBLE) * v))) / 32768.0), 4) AS rms_db
FROM s
""".strip()


_STATS_TAIL = """
SELECT clip_id,
       CAST({n} AS BIGINT) AS n_samples,
       CAST(list_max(list_transform(smp, v -> abs(v))) AS INT) AS peak,
       round(list_avg(smp), 4) AS dc_offset,
       round(20 * log10(sqrt(list_avg(list_transform(smp,
             v -> CAST(v AS DOUBLE) * v))) / 32768.0), 4) AS rms_db
FROM s
""".strip()


_STATS_TAIL_INTDC = """
SELECT clip_id,
       CAST({n} AS BIGINT) AS n_samples,
       CAST(list_max(list_transform(smp, v -> abs(v))) AS INT) AS peak,
       CAST(list_sum(smp) AS BIGINT) AS dc_sum,
       round(20 * log10(sqrt(list_avg(list_transform(smp,
             v -> CAST(v AS DOUBLE) * v))) / 32768.0), 4) AS rms_db
FROM s
""".strip()


def sql_speed_perturb() -> str:
    # Exact restatement of the ×10/9 speed perturbation
    # (__spark_entry__._q_speed_perturb): output sample j interpolates
    # the modular input at position j·10/9, n_out = 3999·9//10 + 1 =
    # 3600. Denominator 9 is odd, so round() half-ties between numpy
    # rint and DuckDB round can never fire (the sql_resample
    # argument); the stats tail is the shared cross-engine-exact
    # peak/dc/rms math.
    s_of = "(({f})*31 + k*7) % 2048 - 1024"
    f = "((j*10)//9)"
    f2 = f"least({f} + 1, 3999)"
    r = "((j*10)%9)"
    out = (f"CAST(round((({s_of.format(f=f)}) * (9 - {r}) "
           f"+ ({s_of.format(f=f2)}) * {r}) / 9.0) AS BIGINT)")
    return f"""
WITH ks AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 53 = 0),
s AS (SELECT printf('clip_%010d', k) AS clip_id,
             list_transform(range(0, 3600), j -> {out}) AS smp
      FROM ks)
{_STATS_TAIL.format(n=3600)}
""".strip()


def sql_gain_perturb() -> str:
    # Exact restatement of the ×7/9 gain (__spark_entry__.
    # _q_gain_perturb): out = the round-half-up rational
    # floor((2·s·7 + 9) / 18) — floor() over a float division because
    # SQL integer `/` truncates toward zero on negatives while the
    # engine's numpy // floors (the sql_downmix trap); numerators
    # ≤ ~14k are exact doubles.
    s = "((i*31 + k*7) % 2048 - 1024)"
    out = f"CAST(floor((2*{s}*7 + 9) / 18.0) AS BIGINT)"
    return f"""
WITH ks AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 59 = 0),
s AS (SELECT printf('clip_%010d', k) AS clip_id,
             list_transform(range(0, 4000), i -> {out}) AS smp
      FROM ks)
{_STATS_TAIL_INTDC.format(n=4000)}
""".strip()


def sql_mix_noise() -> str:
    # Exact restatement of the 3:1 noise mix (__spark_entry__.
    # _q_mix_noise): clip k's sample i mixes the modular signal with
    # its assigned bank clip (nid = k % 4), the 300-sample triangle
    # noise TILED by i mod 300: out = floor((3·s(i) + t) / 4), where
    # t = |((i%300)·16 + nid·13) mod 16000 − 8000| − 4000
    # (resample.tri_pcm's closed form). 3·s + t ∈ [−7072, 7072] and
    # /4.0 is a power-of-two division — floor is exact both engines.
    s = "((i*31 + k*7) % 2048 - 1024)"
    t = "(abs(((i % 300)*16 + (k % 4)*13) % 16000 - 8000) - 4000)"
    out = f"CAST(floor((3*{s} + {t}) / 4.0) AS BIGINT)"
    return f"""
WITH ks AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 61 = 0),
s AS (SELECT printf('clip_%010d', k) AS clip_id,
             list_transform(range(0, 4000), i -> {out}) AS smp
      FROM ks)
{_STATS_TAIL_INTDC.format(n=4000)}
""".strip()


def sql_video_near_dups() -> str:
    # Ground truth by construction for the perceptual video near-dup
    # gate (__spark_entry__._q_video_near_dups): a dup partner exists
    # for every k % 5 == 0 key (k%10==0 chroma-only → identical Y
    # planes → hamming 0 on every frame; k%10==5 one Y pixel per frame
    # → ≤ 2 bits); cross-key content is avalanche-mixed, far above the
    # 4-bit threshold (margins pinned in tests/test_multimodal.py).
    return """
SELECT printf('vid_%010d', k) AS media_id_a,
       printf('vid_%010d_dup', k) AS media_id_b
FROM (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 73 = 0)
WHERE k % 5 = 0
""".strip()


def sql_media_rule() -> str:
    # Ground truth by construction for the x-media gate
    # (__spark_entry__._q_media_rule) over the derived media corpus
    # (_MEDIA_KEYED): image-kind keys are NOT is_vid AND NOT is_wav;
    # corrupt ones (every 10th key — container truncated but magic
    # intact) violate require_decodable, and the healthy 6-wide BMPs /
    # 5-wide PNGs violate the 7 px width floor (the 8×8 stub images
    # pass). Severity WARN = 1.
    return f"""
WITH {_MEDIA_KEYED}
SELECT media_id AS clip_id, part_id,
       'x-media.media' AS rule_id,
       CAST(1 AS INT) AS severity
FROM m
WHERE NOT is_vid AND NOT is_wav AND NOT is_mp4 AND NOT is_ogg
  AND (corrupt OR is_bmp OR is_png)
""".strip()


def sql_image_near_dups() -> str:
    # Ground truth by construction for the perceptual image near-dup
    # gate (__spark_entry__._q_image_near_dups): a dup partner exists
    # for every k % 5 == 0 key (k%10==0 → same pixels as PNG, hamming
    # 0; k%10==5 → one perturbed pixel, hamming ≤ 2 by block
    # locality) and for every k % 5 == 2 key (a real lossy baseline
    # JPEG paired with a BMP holding the JPEG's DECODED raster —
    # bit-identical pixels by decode determinism, hamming exactly 0);
    # NO cross-key pair can match — the avalanche mix keeps distinct
    # keys ≥ 17 bits apart (pinned) vs the threshold 4, and the _jb/
    # _jd family draws from an independent seed (k + 10^9).
    return """
SELECT printf('img_%010d', k) AS media_id_a,
       printf('img_%010d_dup', k) AS media_id_b
FROM (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 67 = 0)
WHERE k % 5 = 0
UNION ALL
SELECT printf('img_%010d_jb', k), printf('img_%010d_jd', k)
FROM (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 67 = 0)
WHERE k % 5 = 2
""".strip()


def sql_audio_near_dup_delta() -> str:
    # ground truth by construction: the delta holds one opus re-encode
    # '<id>_d' per corpus key ≡ 0 (mod 185); incremental dedup against
    # the fingerprint store must report exactly those pairs.
    return """
SELECT printf('clip_%010d', o_orderkey) AS clip_a,
       printf('clip_%010d_d', o_orderkey) AS clip_b
FROM orders
WHERE o_orderkey % 185 = 0
""".strip()


def fixture_clips_cte(n_rows: int = 2000) -> str:
    """DuckDB reconstruction of the FIXTURE corpus metadata columns
    (fixtures.make_row, fixtures.py:40-104): one row is a pure function
    of its index k, so the whole corpus — every injected defect
    included — restates as SQL arithmetic. The audio bytes are NOT
    reconstructed; byte-dependent families are stated as injected
    ground truth (sql_payload_snr, sql_resume_verdicts) with margins
    pinned in pytest. Ends with a CTE named `clips` that also carries
    (k, inject, ridx, r_codec) for those ground-truth subqueries."""
    from canned_yaml_spark.derive import (
        CODEC_CASE, DRIFT_PART, DUR_MULT, INJECT_EVERY, N_PARTS,
        SAMPLE_RATES, WORDS, _sr_case, _word_case,
    )
    assert SAMPLE_RATES and WORDS  # imported for the CASE expansions
    return f"""
fx AS (
  SELECT k,
         (k % {INJECT_EVERY} = 0) AS inject,
         (k // {INJECT_EVERY}) % 9 AS ridx,
         (k * 2654435761) % 1000 AS r_codec,
         (k * 40503 + 17) % 5    AS r_sr,
         (k * {DUR_MULT} + 1) % 9801 AS r_dur,
         (k * 7919) % {len(WORDS)} AS r_word,
         (k * 104729) % 40 + 1   AS r_nw
  FROM (SELECT unnest(range(0, {n_rows})) AS k)),
fbase AS (
  SELECT k, inject, ridx, r_codec,
         printf('clip_%010d', k) AS clip_id0,
         {_sr_case('r_sr')} AS sr_hz0,
         CASE WHEN k % {N_PARTS} = {DRIFT_PART}
              THEN 200 + r_dur + 5000 ELSE 200 + r_dur END AS dur_ms0,
         {CODEC_CASE} AS codec0,
         rtrim(repeat(concat({_word_case('r_word')}, ' '),
                      CAST(r_nw AS INT))) AS transcript0,
         CAST(k % {N_PARTS} AS INT) AS part_id
  FROM fx),
clips AS (
  SELECT k, inject, ridx, r_codec, part_id,
    CASE WHEN inject AND ridx = 4 THEN printf('CLIP-%d', k)
         WHEN inject AND ridx = 5 AND k > 0
              THEN printf('clip_%010d', k - 1)
         ELSE clip_id0 END AS clip_id,
    CAST(CASE WHEN inject AND ridx = 0
              THEN (CASE WHEN k % 20 = 0 THEN 3000 ELSE 96000 END)
              ELSE sr_hz0 END AS INT) AS sr_hz,
    CAST(CASE WHEN inject AND ridx = 1
              THEN (CASE WHEN k % 20 = 0 THEN 0 ELSE 86400000 END)
              ELSE dur_ms0 END AS INT) AS dur_ms,
    CASE WHEN inject AND ridx = 2 THEN 'wav'
         WHEN inject AND ridx = 3 THEN 'vorbis'
         ELSE codec0 END AS codec,
    CASE WHEN inject AND ridx = 6 THEN NULL
         WHEN inject AND ridx = 7
              THEN (CASE WHEN k % 20 = 0 THEN '' ELSE repeat('x', 5000) END)
         ELSE transcript0 END AS transcript
  FROM fbase)
""".strip()


def sql_resume_verdicts() -> str:
    """Full-suite per-partition verdicts over the fixture corpus,
    restated end to end in DuckDB — the oracle for the checkpoint/
    resume gate: after a simulated mid-run crash + resume, the
    verdicts table must equal what a from-scratch run produces, and
    THIS query states that from-scratch result independently.

    Families: the 13 row rules (predicates over the reconstructed
    columns — violations_union, same restatement the row_violations
    gate uses), x-unique (window count over reconstructed clip_ids),
    x-ref (codec ∉ codec_dim's literal rows, derive.CODEC_DIM_ROWS),
    x-payload + x-audio-stats (injected ground truth — byte-derived;
    margins pinned in tests/test_payload.py + test_checkpoint.py),
    x-drift PSI (full clamped-bucket/eps-log formula vs the analytic
    expected histogram) and KS (exact two-sample ECDF stat + the same
    Kolmogorov p approximation the engine evaluates, drift.py:265-277;
    decision margins are ~0.16 vs 0.42 around psi_max=0.25 and
    8e-9 vs 0.93 around alpha=0.01, so cross-engine float drift
    cannot flip a verdict). pass == no ERROR(2)-severity violation
    (canner.cc:1101 lifted to partitions)."""
    row_union = violations_union("duckdb")
    theta_w = "exp(-pi()*pi()/8.0/(t*t))"
    return f"""
WITH {fixture_clips_cte()}, {_hist_values_cte()},
hist AS (
  SELECT part_id,
         CAST(LEAST(GREATEST(FLOOR(dur_ms / 600.0), 0), 19) AS INT) AS bucket,
         COUNT(*) AS cnt
  FROM clips WHERE dur_ms IS NOT NULL GROUP BY 1, 2),
parts AS (SELECT DISTINCT part_id FROM hist),
buckets AS (SELECT DISTINCT bucket FROM expected),
tot AS (SELECT part_id, SUM(cnt) AS part_n FROM hist GROUP BY part_id),
grid AS (SELECT p.part_id, b.bucket FROM parts p CROSS JOIN buckets b),
psi AS (
  SELECT g.part_id,
         SUM((COALESCE(h.cnt, 0) * 1.0 / t.part_n - e.expected_frac)
             * LN((COALESCE(h.cnt, 0) * 1.0 / t.part_n + 0.000001)
                  / (e.expected_frac + 0.000001))) AS psi
  FROM grid g
  LEFT JOIN hist h ON g.part_id = h.part_id AND g.bucket = h.bucket
  JOIN expected e ON g.bucket = e.bucket
  JOIN tot t ON g.part_id = t.part_id
  GROUP BY g.part_id),
ka AS (
  SELECT part_id, CAST(dur_ms AS DOUBLE) AS v, COUNT(*) AS c
  FROM clips WHERE dur_ms IS NOT NULL GROUP BY 1, 2),
kan AS (SELECT part_id, SUM(c) AS n FROM ka GROUP BY 1),
kb AS (SELECT 200.0 + range AS v FROM range(0, 9801)),
ku AS (
  SELECT part_id, v, SUM(c) AS c FROM (
    SELECT part_id, v, c FROM ka
    UNION ALL
    SELECT kan.part_id, kb.v, 0 AS c FROM kan CROSS JOIN kb
  ) GROUP BY 1, 2),
ke AS (
  SELECT part_id, v,
         SUM(c) OVER (PARTITION BY part_id ORDER BY v) AS cum_a
  FROM ku),
kstat AS (
  SELECT ke.part_id,
         MAX(ABS(cum_a * 1.0 / kan.n
                 - LEAST(GREATEST(v - 199.0, 0), 9801) / 9801.0)) AS d,
         MAX(kan.n) AS n
  FROM ke JOIN kan USING (part_id) GROUP BY ke.part_id),
kt AS (
  SELECT part_id,
         (sqrt(n * 9801.0 / (n + 9801.0)) + 0.12
          + 0.11 / sqrt(n * 9801.0 / (n + 9801.0))) * d AS t
  FROM kstat),
kp AS (
  SELECT part_id,
         CASE WHEN t < 1e-9 THEN 1.0
              WHEN t < 1.18 THEN
                1.0 - sqrt(2 * pi()) / t
                * ({theta_w} + pow({theta_w}, 9) + pow({theta_w}, 25))
              ELSE 2.0 * list_sum(list_transform(range(1, 101),
                j -> pow(-1.0, j - 1) * exp(-2.0 * (j * t) * (j * t))))
         END AS p
  FROM kt),
viol AS (
  SELECT part_id, severity FROM ({row_union}) row_rules
  UNION ALL
  SELECT part_id, CAST(2 AS INT) FROM (
    SELECT part_id, COUNT(*) OVER (PARTITION BY clip_id) AS n_dup
    FROM clips) u WHERE n_dup > 1
  UNION ALL
  SELECT part_id, CAST(2 AS INT) FROM clips
  WHERE codec NOT IN ('pcm_s16le', 'flac', 'opus', 'mp3')
  UNION ALL
  SELECT part_id, CAST(2 AS INT)
  FROM clips, (SELECT unnest(range(0, 2)) AS copy) dup
  WHERE inject AND ((ridx IN (6, 7, 8) AND copy = 0)
                    OR (ridx = 5 AND k > 0))
  UNION ALL
  SELECT part_id, CAST(1 AS INT) FROM clips
  WHERE inject AND ridx = 8 AND r_codec >= 700
  UNION ALL
  SELECT part_id, CAST(1 AS INT) FROM psi WHERE psi > 0.25
  UNION ALL
  SELECT part_id, CAST(1 AS INT) FROM kp WHERE p < 0.01
),
nr AS (SELECT part_id, COUNT(*) AS n_rows FROM clips GROUP BY 1),
va AS (SELECT part_id, COUNT(*) AS n_violations, MAX(severity) AS mx
       FROM viol GROUP BY 1)
SELECT nr.part_id,
       CAST(nr.n_rows AS BIGINT) AS n_rows,
       CAST(COALESCE(va.n_violations, 0) AS BIGINT) AS n_violations,
       COALESCE(va.mx, -1) < 2 AS pass
FROM nr LEFT JOIN va USING (part_id)
""".strip()


def sql_payload_snr() -> str:
    # Ground truth by construction over the 2000-row fixture corpus
    # (fixtures.make_row — one row is a pure function of its index k;
    # every 10th index carries exactly one defect, rule (k//10) % 9).
    # The payload check (decode + SNR≥30dB + transcript equality,
    # specs/clips.spec.yaml x-payload) fails EXACTLY these rows:
    #   ridx 6 transcript_null  → 1 transcript-mismatch row on clip_k
    #   ridx 7 transcript_len   → 1 transcript-mismatch row on clip_k
    #   ridx 8 bytes_corrupt    → 1 decode/SNR row on clip_k
    #     (truncated payload: raw PCM halves its sample count → size
    #      mismatch → SNR -inf; framed codecs fail to decode)
    #   ridx 5 id_dup (k>0)     → 2 rows on clip_{k-1} at part k%64:
    #     the injected row carries k's audio+transcript under k-1's id,
    #     so it joins k-1's reference and fails BOTH branches (SNR of
    #     pcm_k vs pcm_{k-1} is far below 30 dB — margin pinned in
    #     tests/test_payload.py::test_payload_gate_closed_form)
    # Codec-label defects (ridx 2/3) are NOT payload violations: the
    # decode branch only runs codecs the engine knows (payload.py
    # _MAGIC filter); "wav"/"vorbis" rows are owned by the enum / x-ref
    # checks. The same set must come out of the eager (payload_snr) and
    # certified (payload_certified) plans — plan equivalence is also
    # pinned in pytest.
    return """
WITH inj AS (
  SELECT k, (k // 10) % 9 AS ridx
  FROM (SELECT unnest(range(0, 2000)) AS k)
  WHERE k % 10 = 0
)
SELECT printf('clip_%010d', CASE WHEN ridx = 5 THEN k - 1 ELSE k END)
         AS clip_id,
       CAST(k % 64 AS INT) AS part_id,
       'x-payload.bytes' AS rule_id,
       CAST(2 AS INT) AS severity
FROM inj, (SELECT unnest(range(0, 2)) AS copy) dup
WHERE (ridx IN (6, 7, 8) AND copy = 0)
   OR (ridx = 5 AND k > 0)
""".strip()


def sql_g711_snr() -> str:
    # Ground truth by construction for the G.711 gate corpus
    # (__spark_entry__._q_g711_snr): clips on orders keys k % 41 == 0,
    # REAL µ-law/A-law companded streams. Intact clips sit 35-38 dB
    # above reference (companding noise — margins pinned in
    # tests/test_payload.py), so the payload check fails EXACTLY the
    # injected rows: k%12==0 (truncated stream → length mismatch →
    # SNR -inf), k%12==4 (zeroed payload → SNR ≈ 0 dB),
    # k%12==8 (transcript tamper). One violation row each — the
    # injections are disjoint and each fails a single branch.
    return """
SELECT printf('clip_%010d', k) AS clip_id,
       CAST(k % 64 AS INT) AS part_id,
       'x-payload.bytes' AS rule_id,
       CAST(2 AS INT) AS severity
FROM (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 41 = 0)
WHERE k % 12 IN (0, 4, 8)
""".strip()


def sql_wer_report() -> str:
    # INDEPENDENT recomputation of the WER gate
    # (__spark_entry__._q_wer_report): rebuild both word-id lists by
    # the same closed form, apply the same k%8 edit, then encode each
    # list to a string (id → chr(65 + id); the out-of-vocab token 'z'
    # → id 50) and let DuckDB's OWN levenshtein do the word-level
    # alignment. Byte edits on the encoded strings are exactly word
    # edits because the encoding is a bijection from this corpus's
    # 51-word vocabulary into single-BYTE symbols (DuckDB levenshtein
    # is byte-oriented — multibyte codepoints would double every
    # cost). The ENGINE can't use this trick: real transcripts have
    # unbounded vocabularies, which is why payload.wer runs a general
    # Arrow DP instead.
    wid = "(k*7 + i*13) % 50"
    return f"""
WITH ks AS (SELECT o_orderkey AS k, 5 + o_orderkey % 23 AS n
            FROM orders WHERE o_orderkey % 31 = 0),
base AS (SELECT k, n,
                list_transform(range(0, n), i -> {wid}) AS ref_ids
         FROM ks),
probe AS (SELECT k, n, ref_ids,
  CASE k % 8
    WHEN 1 THEN list_transform(range(0, n),
                  i -> CASE WHEN i = k % n THEN 50 ELSE {wid} END)
    WHEN 3 THEN ref_ids[1:n-1]
    WHEN 5 THEN list_prepend(ref_ids[1], ref_ids)
    WHEN 7 THEN list_transform(range(0, n), i -> 50)
    ELSE ref_ids
  END AS t_ids
  FROM base),
enc AS (SELECT k, n,
  array_to_string(list_transform(t_ids, x -> chr(CAST(65 + x AS INTEGER))), '') AS et,
  array_to_string(list_transform(ref_ids, x -> chr(CAST(65 + x AS INTEGER))), '') AS er
  FROM probe)
SELECT printf('clip_%010d', k) AS clip_id,
       CAST(n AS BIGINT) AS n_ref_words,
       CAST(levenshtein(et, er) AS BIGINT) AS dist,
       round(levenshtein(et, er) / CAST(n AS DOUBLE), 4) AS wer
FROM enc
""".strip()


def sql_transcript_rule() -> str:
    # Ground truth by construction for the x-transcript gate
    # (__spark_entry__._q_transcript_rule): over the wer_report corpus
    # family, max_wer = 0.2 fails EXACTLY the k%8==7 rows (every word
    # replaced → WER 1.0). The single-edit branches have WER 1/n with
    # n = 5 + k % 23 ≥ 5, so 1/n ≤ 0.2 with equality at n = 5 — those
    # rows PASS, pinning the strict `>` bound semantics.
    return """
SELECT printf('clip_%010d', k) AS clip_id,
       CAST(0 AS INT) AS part_id,
       'x-transcript.transcript' AS rule_id,
       CAST(2 AS INT) AS severity
FROM (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 31 = 0)
WHERE k % 8 = 7
""".strip()


def sql_transcript_norm_rule() -> str:
    # INDEPENDENT recomputation of the normalized x-transcript gate
    # (__spark_entry__._q_transcript_norm_rule): rebuild both
    # transcripts by the same closed form, then apply DuckDB's OWN
    # lower/regexp_replace/trim (the documented restatement of
    # textops.normalize_transcript) and DuckDB's OWN levenshtein —
    # neither the normalization nor the alignment shares code with
    # the engine. Violations are the rows whose NORMALIZED distance
    # is positive, message carrying that distance.
    return """
WITH ks AS (SELECT o_orderkey AS k, 4 + o_orderkey % 7 AS n
            FROM orders WHERE o_orderkey % 89 = 0),
base AS (SELECT k, n,
    list_transform(range(0, n),
                   i -> 'w' || CAST((k + 3*i) % 20 AS VARCHAR)) AS ws
    FROM ks),
probe AS (SELECT k, array_to_string(ws, ' ') AS ref_t,
  CASE k % 6
    WHEN 0 THEN array_to_string(
                  list_transform(ws, w -> upper(w)), ', ') || '!'
    WHEN 2 THEN array_to_string(list_transform(range(0, n),
                  i -> CASE WHEN i = k % n THEN 'zz'
                       ELSE ws[i + 1] END), ' ')
    WHEN 4 THEN array_to_string(ws[1:n-1], ' ')
    ELSE array_to_string(ws, ' ')
  END AS t
  FROM base),
norm AS (SELECT k,
  trim(regexp_replace(lower(t), '[^a-z0-9'']+', ' ', 'g')) AS nt,
  trim(regexp_replace(lower(ref_t), '[^a-z0-9'']+', ' ', 'g')) AS nr
  FROM probe)
SELECT printf('clip_%010d', k) AS clip_id,
       CAST(k % 64 AS INT) AS part_id,
       'x-transcript.transcript' AS rule_id,
       CAST(2 AS INT) AS severity,
       printf('edit distance %d > 0', levenshtein(nt, nr)) AS message
FROM norm
WHERE levenshtein(nt, nr) > 0
""".strip()


def sql_adpcm_snr() -> str:
    # Ground truth by construction for the IMA ADPCM gate corpus
    # (__spark_entry__._q_adpcm_snr): triangle clips on orders keys
    # k % 47 == 0. Intact clips decode 60-66 dB above reference
    # (one-tap predictor on a smooth signal — band pinned in
    # tests/test_audio.py), so the payload check fails EXACTLY the
    # injected rows: k%12==0 (truncated container → decode None),
    # k%12==4 (zeroed payload → SNR exactly 0 dB), k%12==8
    # (transcript tamper). One violation row each.
    return """
SELECT printf('clip_%010d', k) AS clip_id,
       CAST(k % 64 AS INT) AS part_id,
       'x-payload.bytes' AS rule_id,
       CAST(2 AS INT) AS severity
FROM (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 47 = 0)
WHERE k % 12 IN (0, 4, 8)
""".strip()


def sql_flac_snr() -> str:
    # Ground truth by construction for the real-FLAC gate corpus
    # (__spark_entry__._q_flac_snr): mod/triangle clips on orders keys
    # k % 29 == 0, each encoded as a spec-conformant RFC 9639 FLAC
    # stream. FLAC is LOSSLESS, so intact clips decode bit-exactly
    # (SNR +inf) and the payload check fails EXACTLY the injected
    # rows: k%12==0 (truncated stream → decode None), k%12==4 (one
    # byte flipped inside the frame region → CRC-16/MD5 rejection →
    # decode None), k%12==8 (transcript tamper). One violation row
    # each — the injections are disjoint and each fails one branch.
    return """
SELECT printf('clip_%010d', k) AS clip_id,
       CAST(k % 64 AS INT) AS part_id,
       'x-payload.bytes' AS rule_id,
       CAST(2 AS INT) AS severity
FROM (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 29 = 0)
WHERE k % 12 IN (0, 4, 8)
""".strip()


def sql_loudness_rule() -> str:
    # Ground truth by construction for the x-loudness gate corpus
    # (__spark_entry__._q_loudness_rule): 997 Hz sines on orders keys
    # k % 71 == 0 with amplitude classed by k % 10. At 997 Hz the
    # K-filter gain and the standard's -0.691 offset cancel, so the
    # constructed levels are ≈ -4.6 / -25.6 / -57 LUFS against bounds
    # [-40, -10] — every class sits ≥ 5 dB from its bound (µ-law
    # granular noise moves the quiet class ≤ 0.3 LU; tests pin the
    # margins). The rule therefore fails EXACTLY the injected rows:
    # k%10==0 (hot, > max_lufs), k%10==3 (all-zero signal → every
    # block under the -70 LKFS absolute gate → loudness undefined →
    # floor breach), k%10==5 (quiet, < min_lufs), k%10==7 (3-byte pcm
    # stream, undecodable). One violation row each.
    return """
SELECT printf('clip_%010d', k) AS clip_id,
       CAST(k % 64 AS INT) AS part_id,
       'x-loudness.bytes' AS rule_id,
       CAST(2 AS INT) AS severity
FROM (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 71 = 0)
WHERE k % 10 IN (0, 3, 5, 7)
""".strip()


def sql_true_peak_rule() -> str:
    # Ground truth by construction for the true-peak gate corpus
    # (__spark_entry__._q_true_peak_rule): only the k%6==0 rows — the
    # amplitude-0.98 fs/4 phase-π/4 sines whose reconstructed waveform
    # peaks at -0.18 dBTP — breach the -1.0 dBTP ceiling. The
    # amplitude-0.85 twin (-1.41 dBTP) and the 1 kHz 0.5 tones
    # (-6.0 dBTP) pass; decision margins (0.41 / 0.82 dB) dwarf the
    # interpolator's measured ≤ 0.06 dB error (tests/test_loudness.py).
    return """
SELECT printf('clip_%010d', k) AS clip_id,
       CAST(k % 64 AS INT) AS part_id,
       'x-loudness.bytes' AS rule_id,
       CAST(2 AS INT) AS severity
FROM (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 79 = 0)
WHERE k % 6 = 0
""".strip()


def sql_lra_rule() -> str:
    # Ground truth by construction for the loudness-range gate corpus
    # (__spark_entry__._q_lra_rule): only the k%4==0 rows — two-level
    # tones whose halves sit 15 LU apart, measured LRA = 15.0 ± 0.05 —
    # breach the max_lra_lu=8 ceiling. The 6 LU twin (LRA 6.0), the
    # constant tone (LRA ≈ 0) and the 2 s clip (LRA undefined) pass;
    # decision margins (7 / 2 LU) dwarf the ≤ 0.05 LU measured error
    # (tests/test_loudness.py).
    return """
SELECT printf('clip_%010d', k) AS clip_id,
       CAST(k % 64 AS INT) AS part_id,
       'x-loudness.bytes' AS rule_id,
       CAST(2 AS INT) AS severity
FROM (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 83 = 0)
WHERE k % 4 = 0
""".strip()


def sql_train_windows() -> str:
    # Exact restatement of the fixed-window chunking gate
    # (__spark_entry__._q_train_windows): clips on orders keys
    # k % 43 == 0 hold n(k) = 600 + k % 997 samples of the modular
    # signal s(i) = (i*31 + k*7) % 2048 - 1024; windows of 256 samples
    # every 192, tail dropped (window j exists iff j*192 + 256 <= n).
    # Window content is checked through its peak and DC offset —
    # list_max / list_sum over the exact sample range; /256.0 is a
    # power-of-two division, so the double is exact before round().
    s = "((i*31 + k*7) % 2048 - 1024)"
    return f"""
WITH ks AS (SELECT o_orderkey AS k, 600 + o_orderkey % 997 AS n
            FROM orders WHERE o_orderkey % 43 = 0),
w AS (SELECT k, unnest(range(0, (n - 256) // 192 + 1)) AS j
      FROM ks WHERE n >= 256),
v AS (SELECT k, j, j * 192 AS st FROM w)
SELECT printf('clip_%010d', k) AS clip_id,
       CAST(j AS INT) AS win_idx,
       st AS win_start,
       st + 256 AS win_end,
       list_max(list_transform(range(st, st + 256),
                               i -> abs({s}))) AS peak,
       round(list_sum(list_transform(range(st, st + 256),
                                     i -> {s})) / 256.0, 4) AS dc_offset
FROM v
""".strip()


def sql_normalize_peak() -> str:
    # exact restatement of resample.normalize_peak over the gate
    # corpus: clip k holds n(k) = 700 + k % 997 samples of
    # s(i) = (i*31 + k*7) % 2048 - 1024; P = max|s|; the normalized
    # sample is the round-half-up rational (2·s·T + P) // (2·P),
    # written floor((2sT + P) / (2.0P)) because SQL's integer `/`
    # truncates toward zero on negatives while the engine's numpy //
    # floors (same trap sql_downmix documents). Stats tail = the
    # cross-engine-exact peak/dc/rms math of sql_resample.
    s = "((j*31 + k*7) % 2048 - 1024)"
    t = 30000
    out = f"CAST(floor((2*{s}*{t} + p) / (2.0*p)) AS BIGINT)"
    return f"""
WITH ks AS (SELECT o_orderkey AS k, 700 + o_orderkey % 997 AS n
            FROM orders WHERE o_orderkey % 37 = 0),
pk AS (SELECT k, n,
              list_max(list_transform(range(0, n),
                                      j -> abs({s}))) AS p
       FROM ks),
sm AS (SELECT k, n, p,
              list_transform(range(0, n), j -> {out}) AS smp
       FROM pk)
SELECT printf('clip_%010d', k) AS clip_id,
       CAST(n AS BIGINT) AS n_samples,
       CAST(p AS INT) AS peak_in,
       CAST(list_max(list_transform(smp, v -> abs(v))) AS INT) AS peak,
       round(list_avg(smp), 4) AS dc_offset,
       round(20 * log10(sqrt(list_avg(list_transform(smp,
             v -> CAST(v AS DOUBLE) * v))) / 32768.0), 4) AS rms_db
FROM sm
""".strip()


def sql_quantile_report() -> str:
    # x-quantile SLA rule: per-partition exact p99 + bound verdict;
    # independent quantile via DuckDB's built-in quantile_cont
    return (f"WITH {clips_duckdb_cte()} "
            f"SELECT part_id, "
            f"round(quantile_cont(dur_ms, 0.99), 4) AS qval, "
            f"quantile_cont(dur_ms, 0.99) > 12000 AS breach "
            f"FROM clips WHERE dur_ms IS NOT NULL GROUP BY part_id")


def sql_quantile_report_bucketed() -> str:
    # the bucketed x-quantile mode: clamp to [0, 16000], quantize to
    # 500 bucket midpoints (width 32), then the interpolated quantile
    # of the quantized distribution — restated with the same
    # quantization expression + DuckDB's built-in quantile_cont
    return (f"WITH {clips_duckdb_cte()}, "
            f"qz AS (SELECT part_id, "
            f"0 + (LEAST(GREATEST(FLOOR((dur_ms - 0) / 32.0), 0), 499) "
            f"+ 0.5) * 32.0 AS v "
            f"FROM clips WHERE dur_ms IS NOT NULL) "
            f"SELECT part_id, "
            f"round(quantile_cont(v, 0.99), 4) AS qval, "
            f"quantile_cont(v, 0.99) > 12000 AS breach "
            f"FROM qz GROUP BY part_id")


def sql_assert_rule() -> str:
    # x-assert cross-field rules restated as plain WHERE predicates.
    # NULL-pass convention falls out of SQL three-valued logic: a NULL
    # transcript makes `length(transcript) > dur_ms` NULL → row not
    # selected, exactly matching the engine's ~coalesce(expr, TRUE).
    return (f"WITH {clips_duckdb_cte()} "
            f"SELECT clip_id, part_id, "
            f"'x-assert.speech_rate' AS rule_id, "
            f"CAST(2 AS INT) AS severity "
            f"FROM clips WHERE length(transcript) > dur_ms "
            f"UNION ALL "
            f"SELECT clip_id, part_id, "
            f"'x-assert.flac_sr' AS rule_id, "
            f"CAST(1 AS INT) AS severity "
            f"FROM clips WHERE codec = 'flac' AND sr_hz < 16000")


def sql_completeness_report() -> str:
    # x-completeness: exact integer null-counts divided once (same
    # bit-deterministic formulation as the engine); breach compares
    # the RAW fraction against the budget, rounding is display-only
    return (f"WITH {clips_duckdb_cte()}, "
            f"r AS (SELECT part_id, "
            f"SUM(CASE WHEN transcript IS NULL THEN 1 ELSE 0 END) AS nt, "
            f"SUM(CASE WHEN codec IS NULL THEN 1 ELSE 0 END) AS nc, "
            f"COUNT(*) AS n FROM clips GROUP BY part_id) "
            f"SELECT part_id, col, round(null_frac, 6) AS null_frac, "
            f"breach FROM ("
            f"SELECT part_id, 'transcript' AS col, nt * 1.0 / n AS "
            f"null_frac, nt * 1.0 / n > 0.01 AS breach FROM r "
            f"UNION ALL "
            f"SELECT part_id, 'codec', nc * 1.0 / n, "
            f"nc * 1.0 / n > 0.0 FROM r)")


def sql_frequency_report() -> str:
    # x-frequency: per-partition dominant-codec share + distinct count,
    # with the engine's deterministic tie-break (max count, then max
    # value) restated as MAX(v) over the rows holding the top count
    return (f"WITH {clips_duckdb_cte()}, "
            f"pv AS (SELECT part_id, codec AS v, COUNT(*) AS c "
            f"FROM clips WHERE codec IS NOT NULL "
            f"GROUP BY part_id, codec), "
            f"agg AS (SELECT part_id, MAX(c) AS mc, SUM(c) AS tc, "
            f"COUNT(*) AS nd FROM pv GROUP BY part_id), "
            f"t AS (SELECT a.part_id, MAX(pv.v) AS top_value "
            f"FROM agg a JOIN pv ON pv.part_id = a.part_id "
            f"AND pv.c = a.mc GROUP BY a.part_id) "
            f"SELECT a.part_id, t.top_value, "
            f"round(a.mc * 1.0 / a.tc, 6) AS top_share, "
            f"a.nd AS n_distinct, "
            f"(a.mc * 1.0 / a.tc > 0.68 OR a.nd < 4) AS breach "
            f"FROM agg a JOIN t ON t.part_id = a.part_id")


#: clips columns with their inference type branch (numeric/string) —
#: the inferred_rules oracle walks exactly the derived corpus's schema
_INFER_COLS = (("clip_id", "s"), ("sr_hz", "n"), ("dur_ms", "n"),
               ("codec", "s"), ("transcript", "s"), ("part_id", "n"))


def sql_inferred_rules() -> str:
    # Independent DuckDB restatement of EVERY spec-inference decision
    # (infer.py's decision table): required / x-completeness budget
    # (integer ceil-division, bit-identical), exact min/max bounds,
    # length bounds, enum sets (distinct ≤ 8, sorted + comma-joined),
    # x-unique. Each decision is a HAVING-gated aggregate select, so a
    # rule row the engine wrongly emits OR drops hash-mismatches.
    # `pattern` rows are the one exception: the digit-run template
    # generation isn't SQL-restatable; for this corpus the correct
    # decision is NO pattern on every column (mixed-case injected ids
    # break clip_id's template; codec is an enum; transcript's
    # template is trivial), which this oracle pins by emitting none —
    # template mechanics are pytest-pinned on fixture corpora.
    pieces = []
    for c, kind in _INFER_COLS:
        pieces.append(
            f"SELECT '{c}' AS col, 'required' AS keyword, "
            f"'true' AS value FROM clips "
            f"HAVING COUNT(*) = COUNT({c}) AND COUNT(*) > 0")
        pieces.append(
            f"SELECT '{c}', 'x-completeness', printf('%.4f', "
            f"LEAST(10000, (2 * (COUNT(*) - COUNT({c})) * 10000 "
            f"+ COUNT(*) - 1) // COUNT(*)) / 10000.0) FROM clips "
            f"HAVING COUNT(*) - COUNT({c}) > 0")
        if kind == "n":
            pieces.append(
                f"SELECT '{c}', 'minimum', CAST(MIN({c}) AS VARCHAR) "
                f"FROM clips HAVING COUNT({c}) > 0")
            pieces.append(
                f"SELECT '{c}', 'maximum', CAST(MAX({c}) AS VARCHAR) "
                f"FROM clips HAVING COUNT({c}) > 0")
        else:
            pieces.append(
                f"SELECT '{c}', 'minLength', "
                f"CAST(MIN(length({c})) AS VARCHAR) FROM clips "
                f"HAVING COUNT({c}) > 0")
            pieces.append(
                f"SELECT '{c}', 'maxLength', "
                f"CAST(MAX(length({c})) AS VARCHAR) FROM clips "
                f"HAVING COUNT({c}) > 0")
        pieces.append(
            f"SELECT '{c}', 'enum', (SELECT string_agg("
            f"CAST(v AS VARCHAR), ',' ORDER BY v) FROM "
            f"(SELECT DISTINCT {c} AS v FROM clips "
            f"WHERE {c} IS NOT NULL) t) FROM clips "
            f"HAVING COUNT(DISTINCT {c}) BETWEEN 1 AND 8")
        pieces.append(
            f"SELECT '{c}', 'x-unique', 'true' FROM clips "
            f"HAVING COUNT(DISTINCT {c}) = COUNT({c}) "
            f"AND COUNT({c}) > 0")
    union = " UNION ALL ".join(pieces)
    return (f"WITH {clips_duckdb_cte()} "
            f"SELECT * FROM ({union}) ORDER BY col, keyword")


def sql_monotonic() -> str:
    """Restates the x-monotonic gate: the identical lag window —
    PARTITION BY user_id ORDER BY (event_id, value, event_id) — over
    NULL-filtered events; a row violates when value < its
    predecessor. Double comparisons of identical stored values are
    exact in both engines."""
    return """
WITH e AS (SELECT event_id, user_id, value FROM events
           WHERE value IS NOT NULL),
l AS (SELECT event_id, user_id, value,
             lag(value) OVER (PARTITION BY user_id
                              ORDER BY event_id, value, event_id) AS prev
      FROM e)
SELECT event_id AS clip_id, user_id AS part_id,
       'x-monotonic.value' AS rule_id, CAST(2 AS INT) AS severity
FROM l WHERE prev IS NOT NULL AND value < prev
""".strip()


def sql_sessions() -> str:
    # gap sessionization restated with DuckDB windows: identical
    # (time, event_id) ordering tie-break, identical 12 h gap test in
    # exact INTEGER microseconds (epoch_us ↔ the engine's
    # timestampdiff; the constant epoch offset cancels in every
    # difference), one double division at the very end — so every
    # value matches bit-for-bit.
    return """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
l AS (SELECT user_id, us, event_id,
             CASE WHEN lag(us) OVER w IS NULL
                    OR us - lag(us) OVER w > 43200000000
                  THEN 1 ELSE 0 END AS np
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
s AS (SELECT user_id, us,
             SUM(np) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM l)
SELECT user_id, session_idx, COUNT(*) AS n_events,
       round((MAX(us) - MIN(us)) / 1000000.0, 6) AS duration_s
FROM s GROUP BY user_id, session_idx
""".strip()


def sql_freshness_report() -> str:
    # x-freshness: per-group max integer-microseconds vs the global
    # max — exact int lag, divided once (timezone/epoch-free), 1500 s
    # budget
    return ("WITH g AS (SELECT event_type AS \"group\", "
            "MAX(epoch_us(ts)) AS gmax FROM events "
            "WHERE ts IS NOT NULL GROUP BY event_type), "
            "a AS (SELECT MAX(gmax) AS amax FROM g) "
            "SELECT g.\"group\", "
            "round((a.amax - g.gmax) / 1000000.0, 6) AS lag_s, "
            "(a.amax - g.gmax) > 1500000000 AS breach FROM g, a")


def sql_asof_join() -> str:
    # point-in-time join oracle: DuckDB's NATIVE ASOF LEFT JOIN — an
    # entirely independent implementation of <= as-of semantics (the
    # engine uses the union+window plan). Gap as exact integer-micros
    # difference / 1e6, like everything time-valued in events.py.
    return """
WITH l AS (SELECT * FROM events WHERE event_type = 'error'),
     r AS (SELECT * FROM events WHERE event_type = 'click')
SELECT l.event_id,
       r.event_id AS matched_id,
       round((epoch_us(l.ts) - epoch_us(r.ts)) / 1000000.0, 6) AS asof_gap_s
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
""".strip()


def sql_anomaly_report() -> str:
    # x-anomaly: per-partition mean (exact bigint sum / count — the
    # same bit-deterministic ratio as the engine), then interpolated
    # median + MAD over the 64 means via quantile_cont, then the
    # Iglewicz-Hoaglin modified z. Breach on the RAW z; rounding is
    # display-only. MAD = 0 degenerates to "any deviation breaches".
    return ("WITH " + clips_duckdb_cte() + ", "
            "pm AS (SELECT part_id, SUM(dur_ms) * 1.0 / COUNT(*) AS m "
            "FROM clips WHERE dur_ms IS NOT NULL GROUP BY part_id), "
            "md AS (SELECT quantile_cont(m, 0.5) AS med FROM pm), "
            "ma AS (SELECT quantile_cont(abs(m - med), 0.5) AS mad "
            "FROM pm, md) "
            "SELECT pm.part_id, round(pm.m, 6) AS mean, "
            "CASE WHEN mad = 0 THEN NULL "
            "ELSE round(0.6745 * (pm.m - med) / mad, 6) END AS z, "
            "CASE WHEN mad = 0 THEN pm.m != med "
            "ELSE abs(0.6745 * (pm.m - med) / mad) > 3.5 END AS breach "
            "FROM pm, md, ma")


def sql_codec_quantiles() -> str:
    # the engine's redistribute-by-value percentile_cont plan must
    # reproduce DuckDB's built-in interpolated quantiles
    return (f"WITH {clips_duckdb_cte()} "
            f"SELECT codec, "
            f"round(quantile_cont(dur_ms, 0.50), 4) AS q50, "
            f"round(quantile_cont(dur_ms, 0.95), 4) AS q95, "
            f"round(quantile_cont(dur_ms, 0.99), 4) AS q99 "
            f"FROM clips WHERE dur_ms IS NOT NULL GROUP BY codec")


def sql_spectral_verdicts() -> str:
    # ground truth by construction: every gate key ≡ 0 (mod 3) is
    # FFT-brickwalled at 1 kHz before encoding; the x-spectral
    # rolloff-95 floor at 2000 Hz flags exactly those clips. Valid
    # because the separation is structural, not marginal — measured
    # clean rolloff ≥ 3156 Hz vs band-limited ≤ 1000 Hz over a
    # superset of the gate key range (audiofp.bandlimit_probe_pcm,
    # margins pinned in tests/test_audiofp.py). The raw FFT features
    # stay pytest-pinned (spectral_stats is the rows-only gate).
    return """
SELECT printf('clip_%010d', o_orderkey) AS clip_id,
       'x-spectral.bytes' AS rule_id,
       CAST(1 AS INT) AS severity
FROM orders
WHERE o_orderkey % 37 = 0 AND o_orderkey % 3 = 0
""".strip()


def sql_downmix() -> str:
    # the gate corpus is REAL stereo RIFF/WAVE whose interleaved flat
    # sample i is wav_sample(k, i) = (i*31 + k*7) % 2048 - 1024; the
    # downmix contract is mono[f] = floor((s(2f) + s(2f+1)) / 2).
    # floor() (toward -inf) matches numpy's int // — NOT SQL integer
    # division, which truncates toward zero on negatives.
    s2f = "((2*j)*31 + k*7) % 2048 - 1024"
    s2f1 = "((2*j+1)*31 + k*7) % 2048 - 1024"
    mono = (f"CAST(floor((({s2f}) + ({s2f1})) / 2.0) AS BIGINT)")
    return f"""
WITH ks AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 37 = 0),
s AS (SELECT printf('clip_%010d', k) AS clip_id,
             list_transform(range(0, 200), j -> {mono}) AS smp
      FROM ks)
SELECT clip_id,
       CAST(200 AS BIGINT) AS n_samples,
       CAST(list_max(list_transform(smp, v -> abs(v))) AS INT) AS peak,
       round(list_avg(smp), 4) AS dc_offset,
       round(20 * log10(sqrt(list_avg(list_transform(smp,
             v -> CAST(v AS DOUBLE) * v))) / 32768.0), 4) AS rms_db
FROM s
""".strip()


def sql_embedding_near_dups(threshold: float = 0.95) -> str:
    # brute force over the injected corpus — a valid oracle for the
    # engine's LSH+exact-verify path because LSH only prunes (recall
    # ≈ 1 at this threshold; see dedup.embedding_near_dup_candidates)
    return f"""
WITH emb2 AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, list_transform(embedding, x -> x + 0.01)
  FROM embeddings WHERE vec_id % 5 = 0),
e AS (SELECT vec_id, emb2.embedding::DOUBLE[] AS v FROM emb2),
p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round(list_inner_product(a.v, b.v)
               / (sqrt(list_inner_product(a.v, a.v))
                  * sqrt(list_inner_product(b.v, b.v))), 4) AS cosine
  FROM e a JOIN e b ON a.vec_id < b.vec_id)
SELECT * FROM p WHERE cosine >= {threshold}
""".strip()


def sql_ks_drift() -> str:
    # Exact two-sample KS vs drift.ks_per_partition semantics
    # (drift.py:_ks_2samp_weighted): ECDF difference evaluated at every
    # sample point of either side, right-continuous. The reference
    # sample (fixtures.reference_dur_sample) is the full lattice
    # 200..10000, each value exactly once, so its ECDF at an integer
    # point v is analytic: clamp(v-199, 0, 9801)/9801. The corpus ECDF
    # is a per-partition cumulative sum over (value, count) — the same
    # pre-aggregation the engine shuffles.
    return f"""
WITH {clips_duckdb_cte()},
a AS (
  SELECT part_id, CAST(dur_ms AS DOUBLE) AS v, COUNT(*) AS c
  FROM clips WHERE dur_ms IS NOT NULL GROUP BY 1, 2),
an AS (SELECT part_id, SUM(c) AS n FROM a GROUP BY 1),
b AS (SELECT 200.0 + range AS v FROM range(0, 9801)),
u AS (
  SELECT part_id, v, SUM(c) AS c FROM (
    SELECT part_id, v, c FROM a
    UNION ALL
    SELECT an.part_id, b.v, 0 AS c FROM an CROSS JOIN b
  ) GROUP BY 1, 2),
e AS (
  SELECT part_id, v,
         SUM(c) OVER (PARTITION BY part_id ORDER BY v) AS cum_a
  FROM u)
SELECT e.part_id,
       ROUND(MAX(ABS(cum_a * 1.0 / an.n
                     - LEAST(GREATEST(v - 199.0, 0), 9801) / 9801.0)),
             4) AS ks_stat,
       CAST(an.n AS BIGINT) AS n
FROM e JOIN an USING (part_id)
GROUP BY e.part_id, an.n
""".strip()


def sql_dup_components(threshold: float = 0.8) -> str:
    """Oracle for dedup.dup_components over the near-dup pairs: an
    INDEPENDENT algorithm — recursive-CTE reachability (min reachable
    doc_id per node) instead of alternating star rounds — over the
    same exact-Jaccard pair set (sql_near_dup_pairs)."""
    return f"""
WITH RECURSIVE {_DOCS2},
{_SHINGLES},
sizes AS (SELECT doc_id, len(s) AS n FROM sh),
ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b
  FROM common
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE c * 1.0 / (sa.n + sb.n - c) >= {threshold}),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
walk(u, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, w.r FROM edges e JOIN walk w ON e.v = w.u)
SELECT u AS doc_id, MIN(r) AS component_id
FROM walk GROUP BY u
""".strip()


def sql_dedup_kept(threshold: float = 0.8) -> str:
    """Oracle for dedup.dedup_keep (min-id representative): corpus ids
    minus every component member that is not the component minimum."""
    comp = sql_dup_components(threshold)
    return f"""
WITH comp AS ({comp}),
d2 AS (
  SELECT doc_id FROM documents
  UNION ALL SELECT doc_id + 1000000 FROM documents WHERE doc_id % 5 = 0
  UNION ALL SELECT doc_id + 2000000 FROM documents WHERE doc_id % 10 = 0)
SELECT d2.doc_id FROM d2
LEFT JOIN comp ON d2.doc_id = comp.doc_id
WHERE comp.doc_id IS NULL OR comp.doc_id = comp.component_id
""".strip()


# ------------------------------ deterministic sampling (sampling.py) --

def sql_stratified_sample(k: int = 40, seed: int = 42) -> str:
    """Exact k-per-stratum sample in seeded-md5 order — the one-window
    ANSI restatement of sampling.stratified_sample's two-phase plan."""
    return f"""
WITH s AS (SELECT doc_id, doc_id % 7 AS stratum,
                  md5('{seed}:' || doc_id) AS h FROM documents)
SELECT doc_id, stratum FROM s
QUALIFY row_number() OVER (PARTITION BY stratum ORDER BY h, doc_id) <= {k}
""".strip()


def sql_sample_fraction(frac: float = 0.25, seed: int = 42) -> str:
    threshold = format(int(frac * 16 ** 15), "015x")
    return f"""
SELECT doc_id FROM documents
WHERE substr(md5('{seed}:' || doc_id), 1, 15) < '{threshold}'
""".strip()


def sql_budget_sample(budget: int = 20_000, seed: int = 42) -> str:
    """Greedy hash-order prefix under a per-stratum weight budget —
    the one-window restatement of the boundary-bucket plan."""
    return f"""
WITH s AS (SELECT doc_id, doc_id % 5 AS stratum, length(text) AS w,
                  md5('{seed}:' || doc_id) AS h FROM documents),
c AS (SELECT doc_id, stratum, w,
             SUM(w) OVER (PARTITION BY stratum ORDER BY h, doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum FROM s)
SELECT doc_id, stratum, w FROM c WHERE cum <= {budget}
""".strip()


def sql_contamination(min_hits: int = 1, n: int = 30) -> str:
    """Oracle for dedup.contamination_report (probes = every 50th raw
    doc, corpus = the dup-injected docs2): the same long-shingle
    derivation restated, matched via an inverted-index join instead of
    a broadcast probe."""
    return f"""
WITH {_DOCS2},
norm AS (SELECT doc_id, {_NORM} AS t FROM docs2),
shd AS (SELECT doc_id,
  CASE WHEN length(t) < {n} THEN [t]
       ELSE list_distinct(list_transform(
                generate_series(1, length(t)-{n - 1}),
                i -> substr(t, i, {n}))) END AS s
  FROM norm),
probe AS (SELECT DISTINCT unnest(s) AS g FROM shd
          WHERE doc_id % 50 = 0 AND doc_id < 1000000),
ex AS (SELECT doc_id, len(s) AS n_shingles, unnest(s) AS g FROM shd),
hits AS (
  SELECT doc_id, n_shingles, COUNT(*) AS n_hits
  FROM ex JOIN probe USING (g) GROUP BY 1, 2)
SELECT doc_id, n_hits, n_shingles,
       round(n_hits * 1.0 / n_shingles, 4) AS hit_share
FROM hits WHERE n_hits >= {min_hits}
""".strip()


def sql_split_leak_free(frac_test: float = 0.2, seed: int = 42,
                        threshold: float = 0.8) -> str:
    """Oracle for dedup.split_leak_free over docs2: recursive-CTE
    components (independent algorithm) + the same seeded-md5 split."""
    comp = sql_dup_components(threshold)
    t = format(int(frac_test * 16 ** 15), "015x")
    return f"""
WITH comp AS ({comp}),
d2 AS (
  SELECT doc_id FROM documents
  UNION ALL SELECT doc_id + 1000000 FROM documents WHERE doc_id % 5 = 0
  UNION ALL SELECT doc_id + 2000000 FROM documents WHERE doc_id % 10 = 0),
lab AS (
  SELECT d2.doc_id,
         COALESCE(comp.component_id, d2.doc_id) AS component_id
  FROM d2 LEFT JOIN comp ON d2.doc_id = comp.doc_id)
SELECT doc_id, component_id,
       CASE WHEN substr(md5('{seed}:' || component_id), 1, 15) < '{t}'
            THEN 'test' ELSE 'train' END AS split
FROM lab
""".strip()


def sql_chi2_drift() -> str:
    # Independent restatement of drift.chi2_per_partition over the
    # derived corpus: Pearson chi2 per partition against the literal
    # expected codec fractions, grid = expected ∪ observed categories,
    # observed-but-unexpected categories at the 1e-6 floor fraction
    # (identical _EPS). n_cats = |expected ∪ observed| per partition.
    # Rounded to 2 decimals (exploded unexpected-category terms are
    # ~1e6; 1e-2 absolute absorbs sum-order float noise).
    return f"""
WITH {clips_duckdb_cte()},
expected AS (SELECT * FROM (VALUES
  ('pcm_s16le', 0.70), ('flac', 0.15), ('opus', 0.10), ('mp3', 0.05))
  t(cat, frac)),
obs AS (
  SELECT part_id, codec AS cat, COUNT(*) AS cnt
  FROM clips WHERE codec IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT part_id, SUM(cnt) AS part_n FROM obs GROUP BY part_id),
grid AS (
  SELECT t.part_id, e.cat FROM tot t CROSS JOIN expected e
  UNION
  SELECT part_id, cat FROM obs)
SELECT g.part_id,
       ROUND(SUM(POW(COALESCE(o.cnt, 0) - t.part_n * COALESCE(e.frac, 0.000001), 2)
                 / (t.part_n * COALESCE(e.frac, 0.000001))), 2) AS chi2,
       CAST(COUNT(*) AS INT) AS n_cats
FROM grid g
LEFT JOIN obs o ON g.part_id = o.part_id AND g.cat = o.cat
LEFT JOIN expected e ON g.cat = e.cat
JOIN tot t ON g.part_id = t.part_id
GROUP BY g.part_id
""".strip()


def sql_rule_coverage() -> str:
    """Dead-rule / alien-rule report restated end to end: the declared
    inventory of specs/clips.spec.yaml on the derived schema (18 row
    rules incl. the 5 statically-elided `type` rules, x-unique, x-ref,
    x-drift .psi/.ks) FULL-JOINed to per-rule violation counts from an
    independent restatement of EVERY family the job runs on the
    derived corpus: the 13-rule row union, uniqueness rows, referential
    rows, the clamped-bucket/eps-log PSI breach, and the exact
    two-sample KS stat + Kolmogorov p breach (same formulas as
    sql_drift_psi / sql_resume_verdicts; decision margins around
    psi_max=0.25 / alpha=0.01 are orders of magnitude, so float drift
    cannot flip `fired`)."""
    decl_rows = ", ".join(
        f"('{rid}', {str(static).upper()})" for rid, static in [
            ("required.clip_id", False), ("required.sr_hz", False),
            ("required.dur_ms", False), ("required.codec", False),
            ("required.transcript", False),
            ("properties.clip_id.type", True),
            ("properties.clip_id.pattern", False),
            ("properties.sr_hz.type", True),
            ("properties.sr_hz.minimum", False),
            ("properties.sr_hz.maximum", False),
            ("properties.dur_ms.type", True),
            ("properties.dur_ms.minimum", False),
            ("properties.dur_ms.maximum", False),
            ("properties.codec.type", True),
            ("properties.codec.enum", False),
            ("properties.transcript.type", True),
            ("properties.transcript.minLength", False),
            ("properties.transcript.maxLength", False),
            ("x-unique.clip_id", False), ("x-ref.codec", False),
            ("x-drift.dur_ms.psi", False), ("x-drift.dur_ms.ks", False),
        ])
    theta_w = "exp(-pi()*pi()/8.0/(t*t))"
    return f"""
WITH {clips_duckdb_cte()}, {codec_dim_duckdb_cte()}, {_hist_values_cte()},
decl AS (SELECT * FROM (VALUES {decl_rows}) t(rule_id, static_ok)),
hist AS (
  SELECT part_id,
         CAST(LEAST(GREATEST(FLOOR(dur_ms / 600.0), 0), 19) AS INT) AS bucket,
         COUNT(*) AS cnt
  FROM clips WHERE dur_ms IS NOT NULL GROUP BY 1, 2),
parts AS (SELECT DISTINCT part_id FROM hist),
buckets AS (SELECT DISTINCT bucket FROM expected),
tot AS (SELECT part_id, SUM(cnt) AS part_n FROM hist GROUP BY part_id),
grid AS (SELECT p.part_id, b.bucket FROM parts p CROSS JOIN buckets b),
psi AS (
  SELECT g.part_id,
         SUM((COALESCE(h.cnt, 0) * 1.0 / t.part_n - e.expected_frac)
             * LN((COALESCE(h.cnt, 0) * 1.0 / t.part_n + 0.000001)
                  / (e.expected_frac + 0.000001))) AS psi
  FROM grid g
  LEFT JOIN hist h ON g.part_id = h.part_id AND g.bucket = h.bucket
  JOIN expected e ON g.bucket = e.bucket
  JOIN tot t ON g.part_id = t.part_id
  GROUP BY g.part_id),
ka AS (
  SELECT part_id, CAST(dur_ms AS DOUBLE) AS v, COUNT(*) AS c
  FROM clips WHERE dur_ms IS NOT NULL GROUP BY 1, 2),
kan AS (SELECT part_id, SUM(c) AS n FROM ka GROUP BY 1),
kb AS (SELECT 200.0 + range AS v FROM range(0, 9801)),
ku AS (
  SELECT part_id, v, SUM(c) AS c FROM (
    SELECT part_id, v, c FROM ka
    UNION ALL
    SELECT kan.part_id, kb.v, 0 AS c FROM kan CROSS JOIN kb
  ) GROUP BY 1, 2),
ke AS (
  SELECT part_id, v,
         SUM(c) OVER (PARTITION BY part_id ORDER BY v) AS cum_a
  FROM ku),
kstat AS (
  SELECT ke.part_id,
         MAX(ABS(cum_a * 1.0 / kan.n
                 - LEAST(GREATEST(v - 199.0, 0), 9801) / 9801.0)) AS d,
         MAX(kan.n) AS n
  FROM ke JOIN kan USING (part_id) GROUP BY ke.part_id),
kt AS (
  SELECT part_id,
         (sqrt(n * 9801.0 / (n + 9801.0)) + 0.12
          + 0.11 / sqrt(n * 9801.0 / (n + 9801.0))) * d AS t
  FROM kstat),
kp AS (
  SELECT part_id,
         CASE WHEN t < 1e-9 THEN 1.0
              WHEN t < 1.18 THEN
                1.0 - sqrt(2 * pi()) / t
                * ({theta_w} + pow({theta_w}, 9) + pow({theta_w}, 25))
              ELSE 2.0 * list_sum(list_transform(range(1, 101),
                j -> pow(-1.0, j - 1) * exp(-2.0 * (j * t) * (j * t))))
         END AS p
  FROM kt),
dup AS (SELECT clip_id FROM clips GROUP BY clip_id HAVING COUNT(*) > 1),
allv AS (
  SELECT rule_id, part_id FROM ({violations_union('duckdb')}) rowv
  UNION ALL
  SELECT 'x-unique.clip_id' AS rule_id, c.part_id
  FROM clips c JOIN dup ON c.clip_id = dup.clip_id
  UNION ALL
  SELECT 'x-ref.codec' AS rule_id, c.part_id
  FROM clips c
  WHERE c.codec IS NOT NULL
    AND NOT EXISTS (SELECT 1 FROM codec_dim d WHERE d.codec = c.codec)
  UNION ALL
  SELECT 'x-drift.dur_ms.psi' AS rule_id, part_id FROM psi WHERE psi > 0.25
  UNION ALL
  SELECT 'x-drift.dur_ms.ks' AS rule_id, part_id FROM kp WHERE p < 0.01),
agg AS (
  SELECT rule_id, COUNT(*) AS n_violations,
         COUNT(DISTINCT part_id) AS n_parts
  FROM allv GROUP BY rule_id)
SELECT COALESCE(d.rule_id, a.rule_id) AS rule_id,
       CAST(COALESCE(a.n_violations, 0) AS BIGINT) AS n_violations,
       CAST(COALESCE(a.n_parts, 0) AS BIGINT) AS n_parts,
       COALESCE(a.n_violations, 0) > 0 AS fired,
       COALESCE(d.static_ok, FALSE) AS static_ok,
       d.rule_id IS NOT NULL AS declared
FROM decl d FULL JOIN agg a ON d.rule_id = a.rule_id
""".strip()


def sql_embedding_rule() -> str:
    """Restates the x-embedding gate over the derived embedding corpus
    (derive.emb_corpus_select — same injection arithmetic in both
    engines): dim = len() mismatch, finite = any NULL/NaN/Inf element,
    norm = squared L2 outside [0.5², 2.0²] gated on finite, zero =
    squared L2 exactly 0. Decision margins are ~7 orders above any
    float-summation-order difference (base norms 1 ± 1e-7, injected
    ×100 and all-zero classes), and no float value is emitted — the
    compared rows carry only ids + rule ids."""
    from canned_yaml_spark.derive import emb_corpus_duckdb_cte
    return f"""
WITH {emb_corpus_duckdb_cte()},
chk AS (
  SELECT vec_id, part_id,
         len(embedding) AS n,
         len(list_filter(embedding,
             x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 AS bad,
         COALESCE(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0.0) AS sq
  FROM emb WHERE embedding IS NOT NULL)
SELECT vec_id AS clip_id, part_id,
       'x-embedding.embedding.dim' AS rule_id, CAST(2 AS INT) AS severity
FROM chk WHERE n != 64
UNION ALL
SELECT vec_id, part_id, 'x-embedding.embedding.finite', CAST(2 AS INT)
FROM chk WHERE bad
UNION ALL
SELECT vec_id, part_id, 'x-embedding.embedding.norm', CAST(2 AS INT)
FROM chk WHERE NOT bad AND (sq < 0.25 OR sq > 4.0)
UNION ALL
SELECT vec_id, part_id, 'x-embedding.embedding.zero', CAST(2 AS INT)
FROM chk WHERE NOT bad AND sq = 0.0
""".strip()


def sql_mel_band() -> str:
    # ground truth by construction: gate key k is synthesized as a
    # pure tone at the PEAK of mel filter k % 26, where the filter's
    # weight is exactly 1 and both neighbors' are exactly 0 — so the
    # engine's FFT → filterbank → argmax must return k % 26 for every
    # clip, and n_frames is the closed-form sliding-window count
    # (4000 samples, frame 1024, hop 512 → 6). The raw log-mel/MFCC
    # vectors stay pytest-pinned (DuckDB has no FFT); this gate
    # value-checks the pipeline's decision on all 26 bands.
    return """
SELECT printf('clip_%010d', o_orderkey) AS clip_id,
       CAST(6 AS INT) AS n_frames,
       CAST(o_orderkey % 26 AS INT) AS dominant_band
FROM orders
WHERE o_orderkey % 23 = 1
""".strip()
