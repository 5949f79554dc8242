"""Deterministic clips table derived from the driver's `orders` parquet.

The reference's test corpus is "valid documents + documents with known
injected defects" (/root/reference/config.yaml is the valid fixture;
SURVEY.md §5). At table scale we need the same corpus in TWO engines —
Spark (the system under test) and DuckDB (the driver's oracle) — so the
derivation is pure integer arithmetic on the contiguous ``o_orderkey``
of the pre-generated orders table: no engine hash functions, no RNG,
no floats. The same SELECT (modulo tiny dialect spelling) produces
bit-identical rows in both engines.

Injection plan (mirrors FIXTURES.md table 2): every 10th key carries
exactly one defect, cycling through 8 rules; partition 7 additionally
gets a +5000 ms duration shift (distribution drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: 16-word vocabulary for synthetic transcripts (deterministic).
WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa",
]

SAMPLE_RATES = [8000, 16000, 22050, 44100, 48000]

#: codec frequency weights per FIXTURES.md (0.70 hot key → skew).
CODEC_CASE = (
    "CASE WHEN r_codec < 700 THEN 'pcm_s16le' "
    "WHEN r_codec < 850 THEN 'flac' "
    "WHEN r_codec < 950 THEN 'opus' ELSE 'mp3' END"
)

#: duration multiplier: coprime to 9801 (full-range lattice) and chosen
#: so the per-partition walk (step 64·M mod 9801 = 6058 ≈ 0.618·9801)
#: is low-discrepancy — partitions sample the whole [200, 10001) range
#: evenly even with ~30 rows each (otherwise KS/PSI false-fires at
#: small scale).
DUR_MULT = 5914

N_PARTS = 64          # part_id granularity (verdicts / drift / resume)
DRIFT_PART = 7        # partition with injected +5000ms duration shift
INJECT_EVERY = 10     # every 10th key carries one defect
N_RULES = 8


def _word_case(idx_expr: str) -> str:
    whens = " ".join(
        f"WHEN {i} THEN '{w}'" for i, w in enumerate(WORDS)
    )
    return f"CASE {idx_expr} {whens} END"


def _sr_case(idx_expr: str) -> str:
    whens = " ".join(f"WHEN {i} THEN {sr}" for i, sr in enumerate(SAMPLE_RATES))
    return f"CASE {idx_expr} {whens} END"


def clips_select(dialect: str, orders_rel: str = "orders") -> str:
    """The clips derivation as a SELECT over ``orders_rel``.

    dialect: 'spark' or 'duckdb'. The only differences are the
    printf/format_string spelling and integer division.
    """
    if dialect == "spark":
        fmt = "format_string"
        idiv = "div"
    elif dialect == "duckdb":
        fmt = "printf"
        idiv = "//"
    else:  # pragma: no cover
        raise ValueError(dialect)

    # Spark's format_string goes through java.util.Formatter (~3x the
    # cost of concat+lpad, measured 0.67s vs 0.31s per 6M rows,
    # OPTIMIZATION_r06.md). Spell the two printf shapes with cheap
    # string ops on the Spark side only; lpad TRUNCATES past the pad
    # width, so the zero-padded form keeps a guarded format_string
    # branch for keys outside [0, 10^10) (bit-identical everywhere —
    # parity-tested against the unchanged DuckDB spelling).
    if dialect == "spark":
        def pad10(x: str) -> str:
            return (f"CASE WHEN {x} BETWEEN 0 AND 9999999999 "
                    f"THEN concat('clip_', lpad(CAST({x} AS STRING), 10, '0')) "
                    f"ELSE format_string('clip_%010d', {x}) END")
        clip_plain = pad10("k")
        clip_prev = pad10("(k - 1)")
        clip_bad = "concat('CLIP-', CAST(k AS STRING))"
    else:
        clip_plain = f"{fmt}('clip_%010d', k)"
        clip_prev = f"{fmt}('clip_%010d', k - 1)"
        clip_bad = f"{fmt}('CLIP-%d', k)"

    return f"""
WITH keyed AS (
  SELECT o_orderkey AS k,
         (o_orderkey * 2654435761) % 1000 AS r_codec,
         (o_orderkey * 40503 + 17) % 5    AS r_sr,
         (o_orderkey * {DUR_MULT} + 1) % 9801 AS r_dur,
         (o_orderkey * 7919) % {len(WORDS)} AS r_word,
         (o_orderkey * 104729) % 40 + 1   AS r_nw,
         (o_orderkey % {INJECT_EVERY} = 0) AS inject,
         (o_orderkey {idiv} {INJECT_EVERY}) % {N_RULES} AS rule_k
  FROM {orders_rel}
),
base AS (
  SELECT k, inject, rule_k,
         {clip_plain} AS clip_id0,
         {_sr_case('r_sr')} AS sr_hz0,
         CASE WHEN k % {N_PARTS} = {DRIFT_PART}
              THEN 200 + r_dur + 5000 ELSE 200 + r_dur END AS dur_ms0,
         {CODEC_CASE} AS codec0,
         rtrim(repeat(concat({_word_case('r_word')}, ' '), CAST(r_nw AS INT))) AS transcript0,
         CAST(k % {N_PARTS} AS INT) AS part_id
  FROM keyed
)
SELECT
  CASE WHEN inject AND rule_k = 4 THEN {clip_bad}
       WHEN inject AND rule_k = 5 AND k > 0 THEN {clip_prev}
       ELSE clip_id0 END AS clip_id,
  CAST(CASE WHEN inject AND rule_k = 0 THEN 3000 ELSE sr_hz0 END AS INT) AS sr_hz,
  CAST(CASE WHEN inject AND rule_k = 1 THEN 0 ELSE dur_ms0 END AS INT) AS dur_ms,
  CASE WHEN inject AND rule_k = 2 THEN 'wav'
       WHEN inject AND rule_k = 3 THEN 'vorbis'
       ELSE codec0 END AS codec,
  CASE WHEN inject AND rule_k = 6 THEN NULL
       WHEN inject AND rule_k = 7 THEN repeat('x', 5000)
       ELSE transcript0 END AS transcript,
  part_id
FROM base
""".strip()


def clips_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived clips DataFrame for a testdata sf dir (Spark side).

    The parquet scan reads exactly one column (o_orderkey) — column
    pruning reaches the source; all derived columns are Catalyst
    expressions inside one whole-stage-codegen span.
    """
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.createOrReplaceTempView("orders")
    return spark.sql(clips_select("spark"))


def clips_duckdb_cte() -> str:
    """`clips AS (...)` CTE fragment for DuckDB oracle SQL (the driver
    pre-registers `orders` as a view over the same parquet)."""
    return f"clips AS ({clips_select('duckdb')})"


def transcript_ref_select(dialect: str, orders_rel: str = "orders") -> str:
    """Ground-truth transcript table (clip_id, transcript_ref): the
    PRE-injection transcript for every key — what an ASR reference
    table would hold. Same two-engine discipline as clips_select."""
    if dialect == "spark":
        fmt = "format_string"
    elif dialect == "duckdb":
        fmt = "printf"
    else:  # pragma: no cover
        raise ValueError(dialect)
    word = _word_case(f"(o_orderkey * 7919) % {len(WORDS)}")
    return f"""
SELECT {fmt}('clip_%010d', o_orderkey) AS clip_id,
       rtrim(repeat(concat({word}, ' '),
             CAST((o_orderkey * 104729) % 40 + 1 AS INT))) AS transcript_ref
FROM {orders_rel}
""".strip()


# ------------------------------------------------------------ nested corpus
#: injection cycle for the nested corpus (every 10th key, 8 rules):
#: 0 tags too long (maxItems)      1 tags empty (minItems)
#: 2 invalid tag element (items)   3 NULL tag element (gated — no violation)
#: 4 pair[0] not integer (tuple)   5 pair[1] not boolean (tuple)
#: 6 val_num not a number (duck)   7 val_bool not a boolean (duck)
NESTED_RULES = 8


def clips_nested_select(dialect: str, orders_rel: str = "orders") -> str:
    """Array/struct-bearing corpus for the items / tuple-items / duck-type
    gate queries (reference corpus analogs:
    /root/reference/schema/ip_allow.schema.json:14-18 uniform items,
    /root/reference/schema/replay.schema.json:136-147 tuple items).

    Same bit-identical-two-engines discipline as clips_select: pure
    integer arithmetic on o_orderkey; arrays are built by explicit CASE
    over the element count so both dialects produce identical lists.
    """
    if dialect == "spark":
        fmt, idiv, arr = "format_string", "div", "array"
        flt = "filter"
        meta = "named_struct('lang', t0, 'n', n_tags)"
        mapfn = "map_from_arrays"
    elif dialect == "duckdb":
        fmt, idiv, arr = "printf", "//", "list_value"
        flt = "list_filter"
        meta = "struct_pack(lang := t0, n := n_tags)"
        mapfn = "map"
    else:  # pragma: no cover
        raise ValueError(dialect)

    return f"""
WITH keyed AS (
  SELECT o_orderkey AS k,
         (o_orderkey % {INJECT_EVERY} = 0) AS inject,
         (o_orderkey {idiv} {INJECT_EVERY}) % {NESTED_RULES} AS rule_k,
         (o_orderkey * 7919) % {len(WORDS)}      AS w0,
         (o_orderkey * 7919 + 13) % {len(WORDS)} AS w1,
         (o_orderkey * 7919 + 26) % {len(WORDS)} AS w2,
         o_orderkey % 1000 AS num0
  FROM {orders_rel}
),
elems AS (
  SELECT k, inject, rule_k, num0,
         {_word_case('w0')} AS t0,
         {_word_case('w1')} AS t1,
         {_word_case('w2')} AS t2,
         {fmt}('%d', num0) AS num_s,
         CASE WHEN k % 2 = 0 THEN 'true' ELSE ' FALSE ' END AS bool_s,
         CASE WHEN inject AND rule_k = 0 THEN 5
              WHEN inject AND rule_k = 1 THEN 0
              ELSE 1 + (k % 3) END AS n_tags0,
         {fmt}('clip_%010d', k) AS clip_id,
         CAST(k % {N_PARTS} AS INT) AS part_id
  FROM keyed
)
SELECT clip_id, part_id,
  CASE
    WHEN inject AND rule_k = 0 THEN {arr}(t0, t1, t2, t0, t1)
    WHEN inject AND rule_k = 1 THEN {flt}({arr}(t0), x -> 1 = 0)
    WHEN inject AND rule_k = 2 THEN {arr}(t0, 'BAD42')
    WHEN inject AND rule_k = 3 THEN {arr}(t0, CASE WHEN 1 = 0 THEN t1 END)
    WHEN n_tags0 = 1 THEN {arr}(t0)
    WHEN n_tags0 = 2 THEN {arr}(t0, t1)
    ELSE {arr}(t0, t1, t2)
  END AS tags,
  CASE
    WHEN inject AND rule_k = 4 THEN {arr}(concat('x', num_s), bool_s)
    WHEN inject AND rule_k = 5 THEN {arr}(num_s, 'maybe')
    ELSE {arr}(num_s, bool_s)
  END AS pair,
  CASE WHEN inject AND rule_k = 6 THEN 'abc' ELSE num_s END AS val_num,
  CASE WHEN inject AND rule_k = 7 THEN 'yes' ELSE bool_s END AS val_bool,
  CAST(n_tags0 AS INT) AS n_tags,
  {meta} AS meta,
  CASE
    WHEN k % 11 = 0 THEN {mapfn}({flt}({arr}('a'), x -> 1 = 0),
                                 {flt}({arr}(t0), x -> 1 = 0))
    WHEN k % 7 = 0 THEN {mapfn}({arr}('a', 'b', 'c', 'd'),
                                {arr}(t0, t1, t2, num_s))
    WHEN k % 5 = 0 THEN {mapfn}({arr}('a', 'Bad Key!'), {arr}(t0, t1))
    ELSE {mapfn}({arr}('a', 'b'), {arr}(t0, t1))
  END AS attrs
FROM elems
""".strip()


def clips_nested_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived nested-corpus DataFrame (Spark side). One codegen span
    over a single-column parquet scan, same as clips_df."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.createOrReplaceTempView("orders")
    return spark.sql(clips_nested_select("spark"))


def clips_nested_duckdb_cte() -> str:
    return f"clips_nested AS ({clips_nested_select('duckdb')})"


def clips_formats_select(dialect: str, orders_rel: str = "orders") -> str:
    """Formats corpus for the draft-07 `format` assertion profile: one
    string column per registry format (all 11), derived (like every
    gate corpus) by pure integer arithmetic + printf from
    ``o_orderkey`` so Spark and DuckDB build bit-identical rows. Every
    7th key carries exactly one defect, cycling through the columns:
    an out-of-range ipv4 octet, a triple-colon ipv6, a 'g' in the uuid
    hex, Feb 30th (regex-shaped but calendar-invalid — the date_valid
    conjunct, not the regex, must catch it), minute 61, hour 24 in the
    date-time, a leading-hyphen hostname label, a dot-less email
    domain, a '%zz' bad percent-encoding in an otherwise-legal uri, a
    '~2' escape in the json-pointer, and the empty duration 'P'."""
    if dialect == "spark":
        fmt = "format_string"
        idiv = "div"
    elif dialect == "duckdb":
        fmt = "printf"
        idiv = "//"
    else:  # pragma: no cover
        raise ValueError(dialect)
    return f"""
WITH keyed AS (
  SELECT o_orderkey AS k,
         (o_orderkey % 7 = 0) AS inject,
         (o_orderkey {idiv} 7) % 11 AS rule_k
  FROM {orders_rel}
)
SELECT
  {fmt}('clip_%010d', k) AS clip_id,
  CAST(k % {N_PARTS} AS INT) AS part_id,
  CASE WHEN inject AND rule_k = 0
       THEN {fmt}('%d.%d.%d.300', k % 224, (k * 7) % 256, (k * 13) % 256)
       ELSE {fmt}('%d.%d.%d.%d', k % 224, (k * 7) % 256, (k * 13) % 256,
                  (k * 31) % 250 + 1) END AS ip4,
  CASE WHEN inject AND rule_k = 1
       THEN {fmt}('2001:db8:%x:::%x', k % 65536, (k * 7) % 65536)
       ELSE {fmt}('2001:db8:%x:%x::%x', k % 65536, (k * 3) % 65536,
                  (k * 7) % 65536) END AS ip6,
  CASE WHEN inject AND rule_k = 2
       THEN {fmt}('%08x-%04x-%04x-%04x-%011xg', k % 4294967296,
                  k % 65536, (k * 3) % 65536, (k * 5) % 65536,
                  (k * 2654435761) % 17592186044416)
       ELSE {fmt}('%08x-%04x-%04x-%04x-%012x', k % 4294967296,
                  k % 65536, (k * 3) % 65536, (k * 5) % 65536,
                  (k * 2654435761) % 281474976710656) END AS uuid_s,
  CASE WHEN inject AND rule_k = 3
       THEN {fmt}('%04d-02-30', 1970 + k % 100)
       ELSE {fmt}('%04d-%02d-%02d', 1970 + k % 100, 1 + k % 12,
                  1 + (k * 5) % 28) END AS date_s,
  CASE WHEN inject AND rule_k = 4
       THEN {fmt}('%02d:61:00Z', k % 24)
       ELSE {fmt}('%02d:%02d:%02d+%02d:%02d', k % 24, (k * 7) % 60,
                  (k * 13) % 60, k % 14, (k * 3) % 60) END AS time_s,
  CASE WHEN inject AND rule_k = 5
       THEN {fmt}('%04d-%02d-%02dT24:00:00Z', 1970 + k % 100,
                  1 + k % 12, 1 + (k * 5) % 28)
       ELSE {fmt}('%04d-%02d-%02dT%02d:%02d:%02dZ', 1970 + k % 100,
                  1 + k % 12, 1 + (k * 5) % 28, k % 24, (k * 7) % 60,
                  (k * 13) % 60) END AS dt_s,
  CASE WHEN inject AND rule_k = 6
       THEN {fmt}('-host%d.example.org', k % 1000)
       ELSE {fmt}('host-%d.example%d.org', k % 1000, k % 50) END AS host_s,
  CASE WHEN inject AND rule_k = 7
       THEN {fmt}('user%d@example', k)
       ELSE {fmt}('user%d@example%d.com', k, k % 100) END AS email_s,
  CASE WHEN inject AND rule_k = 8
       THEN {fmt}('https://example.com/%%zz/%d', k)
       ELSE {fmt}('https://example.com/p/%d?x=%d', k, k % 997) END AS uri_s,
  CASE WHEN inject AND rule_k = 9
       THEN {fmt}('/clips/%d/~2', k)
       ELSE {fmt}('/clips/%d/meta~0x', k) END AS ptr_s,
  CASE WHEN inject AND rule_k = 10
       THEN 'P'
       ELSE {fmt}('P%dDT%dH%dM', k % 30 + 1, k % 24, k % 60) END AS dur_s
FROM keyed
""".strip()


def clips_formats_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side of clips_formats_select (scan prunes to o_orderkey;
    all six format columns are one codegen span)."""
    spark.read.parquet(f"{sf_dir}/orders.parquet") \
         .createOrReplaceTempView("orders")
    return spark.sql(clips_formats_select("spark"))


def clips_formats_duckdb_cte() -> str:
    return f"clips_formats AS ({clips_formats_select('duckdb')})"


# ---------------------------------------------------------------- codec dim
CODEC_DIM_ROWS = [
    ("pcm_s16le", False, 48000),
    ("flac", False, 48000),
    ("opus", True, 48000),
    ("mp3", True, 44100),
]


def codec_dim_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(CODEC_DIM_ROWS,
                                 "codec string, lossy boolean, max_sr_hz int")


def codec_dim_duckdb_cte() -> str:
    vals = ", ".join(f"('{c}', {str(l).lower()}, {m})"
                     for c, l, m in CODEC_DIM_ROWS)
    return f"codec_dim AS (SELECT * FROM (VALUES {vals}) t(codec, lossy, max_sr_hz))"


def snapshot_select(dialect: str, which: str,
                    orders_rel: str = "orders") -> str:
    """Deterministic two-snapshot pair for the reconciliation gate
    (dataset.snapshot_diff): 'old' and 'new' are versions of one keyed
    table derived from the SAME orders keys with pinned churn —

      added   (new only):  k % 89 = 3
      removed (old only):  k % 97 = 11
      changed sr_hz:       k % 101 = 5   (doubled)
      changed transcript:  k % 103 = 7   ('_edited' suffix)
      changed codec:       k % 107 = 9   ('opus_v2', never a base value)

    moduli pairwise coprime, so every overlap class (e.g. a key both
    added AND changed) occurs at large enough sf. Same two-dialect
    discipline as clips_select: identical arithmetic in Spark and
    DuckDB."""
    if dialect == "spark":
        fmt = "format_string"
    elif dialect == "duckdb":
        fmt = "printf"
    else:  # pragma: no cover
        raise ValueError(dialect)
    if which not in ("old", "new"):  # pragma: no cover
        raise ValueError(which)
    sr = "CAST(8000 + 100 * ((k * 40503 + 17) % 5) AS INT)"
    tr = f"{fmt}('t_%d', (k * 104729) % 997)"
    codec = ("CASE (k * 7919) % 4 WHEN 0 THEN 'pcm_s16le' "
             "WHEN 1 THEN 'flac' WHEN 2 THEN 'opus' ELSE 'mp3' END")
    if which == "new":
        sr = f"CASE WHEN k % 101 = 5 THEN 2 * {sr} ELSE {sr} END"
        tr = (f"CASE WHEN k % 103 = 7 THEN concat({tr}, '_edited') "
              f"ELSE {tr} END")
        codec = f"CASE WHEN k % 107 = 9 THEN 'opus_v2' ELSE {codec} END"
        keep = "k % 97 <> 11"
    else:
        keep = "k % 89 <> 3"
    return f"""
SELECT {fmt}('snap_%010d', k) AS clip_id,
       {sr} AS sr_hz,
       CAST(200 + (k * 2654435761 + 1) % 9801 AS INT) AS dur_ms,
       {codec} AS codec,
       {tr} AS transcript
FROM (SELECT o_orderkey AS k FROM {orders_rel})
WHERE {keep}
""".strip()


def snapshot_df(spark: SparkSession, sf_dir: str, which: str) -> DataFrame:
    """Spark side of snapshot_select (scan prunes to o_orderkey)."""
    spark.read.parquet(f"{sf_dir}/orders.parquet") \
         .createOrReplaceTempView("orders")
    return spark.sql(snapshot_select("spark", which))


def emb_corpus_select(dialect: str, emb_rel: str = "embeddings") -> str:
    """Derived embedding-validation corpus for the x-embedding gate:
    the real embeddings table (unit-norm FLOAT[64] vectors) with
    pinned per-class defects keyed on vec_id % 13 —

      0: truncated to 32 dims          (dim violation)
      1: NaN in the last slot          (finite violation)
      2: NULL element in the last slot (finite violation)
      3: +Infinity in the last slot    (finite violation)
      4: every element ×100            (norm ~100 ≫ max_norm 2)
      5: all-zero vector               (zero + norm < min_norm 0.5)
      6: NULL column                   (passes — absence is
                                        `required`'s violation)
      else: unchanged (base norms are 1 ± 1e-7 — decision margins vs
      the [0.5, 2.0] gate bounds are ~7 orders above any cross-engine
      float-summation-order noise)

    Same two-dialect discipline as clips_select: identical arithmetic
    in Spark and DuckDB. The ×100 scale is exact in both engines (a
    float32 times 100 is exactly representable before the final
    rounding, whether the intermediate is float or double)."""
    if dialect == "spark":
        sl = "slice(embedding, 1, {n})"
        app = ("concat(slice(embedding, 1, 63), "
               "array(CAST('{v}' AS FLOAT)))")
        app_null = ("concat(slice(embedding, 1, 63), "
                    "array(CAST(NULL AS FLOAT)))")
        scale = "transform(embedding, x -> x * CAST(100.0 AS FLOAT))"
        zeros = "transform(embedding, x -> CAST(0.0 AS FLOAT))"
        null_col = "CAST(NULL AS ARRAY<FLOAT>)"
    elif dialect == "duckdb":
        sl = "list_slice(embedding, 1, {n})"
        app = "list_append(list_slice(embedding, 1, 63), '{v}'::FLOAT)"
        app_null = "list_append(list_slice(embedding, 1, 63), NULL::FLOAT)"
        scale = "list_transform(embedding, x -> CAST(x * 100.0 AS FLOAT))"
        zeros = "list_transform(embedding, x -> 0.0::FLOAT)"
        null_col = "NULL::FLOAT[]"
    else:  # pragma: no cover
        raise ValueError(dialect)
    return f"""
SELECT vec_id,
       CAST(vec_id % {N_PARTS} AS INT) AS part_id,
       CASE WHEN vec_id % 13 = 0 THEN {sl.format(n=32)}
            WHEN vec_id % 13 = 1 THEN {app.format(v='NaN')}
            WHEN vec_id % 13 = 2 THEN {app_null}
            WHEN vec_id % 13 = 3 THEN {app.format(v='Infinity')}
            WHEN vec_id % 13 = 4 THEN {scale}
            WHEN vec_id % 13 = 5 THEN {zeros}
            WHEN vec_id % 13 = 6 THEN {null_col}
            ELSE embedding END AS embedding
FROM {emb_rel}
""".strip()


def emb_corpus_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side of emb_corpus_select (scan reads vec_id+embedding)."""
    spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
         .createOrReplaceTempView("embeddings")
    return spark.sql(emb_corpus_select("spark"))


def emb_corpus_duckdb_cte() -> str:
    """`emb AS (...)` CTE fragment for the DuckDB oracle (the driver
    pre-registers `embeddings` as a view over the same parquet)."""
    return f"emb AS ({emb_corpus_select('duckdb')})"
