"""x-assert / x-completeness / x-frequency / x-anomaly / x-embedding — the
round-5
rule-vocabulary extensions (cross-field SQL asserts, null-budget
completeness, frequency-shape gates, reference-free drift). Spec-error
location, NULL conventions, deterministic tie-breaks, and
all_violations wiring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from canned_yaml_spark import dataset, job
from canned_yaml_spark.checks import Severity
from canned_yaml_spark.compile import compile_spec
from canned_yaml_spark.errors import SpecError


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        # (clip_id, dur_ms, codec, transcript, part_id)
        ("c0", 100, "flac", "short", 0),
        ("c1", 3, "opus", "too long for 3ms", 0),   # speech-rate viol
        ("c2", 100, "flac", None, 0),                # NULL → assert passes
        ("c3", 100, "mp3", "x", 1),
        ("c4", 100, "mp3", None, 1),
        ("c5", 100, None, "y", 1),
        ("c6", 0, "mp3", "", 1),                     # len 0 <= 0 → ok
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, dur_ms int, codec string, "
              "transcript string, part_id int")
    df = df.cache()
    df.count()
    return df


# ----------------------------------------------------------- x-assert
def test_assert_violations_and_null_pass(tiny):
    suite = compile_spec(
        {"type": "object",
         "x-assert": [{"id": "rate",
                       "expr": "length(transcript) <= dur_ms"}]},
        tiny.schema)
    [chk] = suite.row_checks
    assert chk.rule_id == "x-assert.rate"
    assert chk.severity == Severity.ERROR
    bad = (tiny.filter(chk.violation)
               .select("clip_id").toPandas()["clip_id"].tolist())
    # c1 violates; c2/c4 have NULL transcript → expr NULL → pass
    assert bad == ["c1"]


def test_assert_defaults_and_severity(tiny):
    suite = compile_spec(
        {"type": "object",
         "x-assert": {"expr": "dur_ms >= 0", "severity": "WARN"}},
        tiny.schema)
    [chk] = suite.row_checks
    assert chk.rule_id == "x-assert.0"       # id defaults to the index
    assert chk.severity == Severity.WARN
    assert tiny.filter(chk.violation).count() == 0


@pytest.mark.parametrize("spec_frag, loc_frag", [
    ({"x-assert": {"expr": "length(transcript"}}, "x-assert[0].expr"),
    ({"x-assert": {"expr": "no_such_col > 1"}}, "x-assert[0].expr"),
    ({"x-assert": {"expr": "dur_ms + 1"}}, "boolean"),
    ({"x-assert": {}}, "x-assert[0]"),
    ({"x-assert": []}, "x-assert"),
    ({"x-assert": {"expr": "  "}}, "expr"),
])
def test_assert_spec_errors(tiny, spec_frag, loc_frag):
    with pytest.raises(SpecError) as ei:
        compile_spec({"type": "object", **spec_frag}, tiny.schema)
    assert loc_frag in str(ei.value)


# ----------------------------------------------------- x-completeness
def test_completeness_exact_fractions(tiny):
    suite = compile_spec(
        {"type": "object",
         "x-completeness": [
             {"column": "transcript", "max_null_frac": 0.3},
             {"column": "codec"},
         ]}, tiny.schema)
    rep = dataset.partition_completeness(
        tiny, suite.completeness_checks).toPandas()
    rep = rep.set_index(["part_id", "column"]).sort_index()
    # part 0: 1 of 3 transcripts NULL; part 1: 1 of 4
    assert rep.loc[(0, "transcript"), "null_frac"] == pytest.approx(1 / 3)
    assert rep.loc[(1, "transcript"), "null_frac"] == pytest.approx(0.25)
    assert bool(rep.loc[(0, "transcript"), "breach"]) is True   # > 0.3
    assert bool(rep.loc[(1, "transcript"), "breach"]) is False
    # codec budget 0: part 1 has one NULL codec → breach
    assert bool(rep.loc[(0, "codec"), "breach"]) is False
    assert bool(rep.loc[(1, "codec"), "breach"]) is True


def test_completeness_spec_errors(tiny):
    with pytest.raises(SpecError, match="max_null_frac"):
        compile_spec({"type": "object",
                      "x-completeness": {"column": "codec",
                                         "max_null_frac": 1.5}},
                     tiny.schema)
    with pytest.raises(SpecError, match="absent"):
        compile_spec({"type": "object",
                      "x-completeness": {"column": "nope"}}, tiny.schema)


# -------------------------------------------------------- x-frequency
def test_frequency_report_and_tiebreak(spark):
    rows = [("a", 0), ("a", 0), ("b", 0), ("c", 0),
            # part 1: 'x' and 'y' tie at 2 — max value 'y' must win
            ("x", 1), ("x", 1), ("y", 1), ("y", 1),
            (None, 1)]
    df = spark.createDataFrame(rows, "codec string, part_id int")
    suite = compile_spec(
        {"type": "object",
         "x-frequency": {"column": "codec", "max_share": 0.45,
                         "min_distinct": 3}},
        df.schema)
    [fc] = suite.frequency_checks
    rep = (dataset.partition_frequency(df, fc)
                  .toPandas().set_index("part_id").sort_index())
    assert rep.loc[0, "top_value"] == "a"
    assert rep.loc[0, "top_share"] == pytest.approx(0.5)
    assert rep.loc[0, "n_distinct"] == 3
    assert bool(rep.loc[0, "breach"]) is True          # share 0.5 > 0.45
    assert rep.loc[1, "top_value"] == "y"              # deterministic tie
    assert rep.loc[1, "top_share"] == pytest.approx(0.5)  # NULL excluded
    assert rep.loc[1, "n_distinct"] == 2
    assert bool(rep.loc[1, "breach"]) is True          # distinct 2 < 3


def test_frequency_all_null_partition_absent(spark):
    df = spark.createDataFrame([(None, 0), (None, 0), ("a", 1)],
                               "codec string, part_id int")
    suite = compile_spec(
        {"type": "object",
         "x-frequency": {"column": "codec", "max_share": 0.9}},
        df.schema)
    rep = dataset.partition_frequency(df, suite.frequency_checks[0])
    assert [r.part_id for r in rep.collect()] == [1]


def test_frequency_spec_errors(tiny):
    with pytest.raises(SpecError, match="threshold"):
        compile_spec({"type": "object",
                      "x-frequency": {"column": "codec"}}, tiny.schema)
    with pytest.raises(SpecError, match="max_share"):
        compile_spec({"type": "object",
                      "x-frequency": {"column": "codec", "max_share": 0}},
                     tiny.schema)
    with pytest.raises(SpecError, match="min_distinct"):
        compile_spec({"type": "object",
                      "x-frequency": {"column": "codec",
                                      "min_distinct": 0}}, tiny.schema)


# ------------------------------------------------------------- wiring
def test_all_violations_carries_new_families(tiny):
    suite = compile_spec(
        {"type": "object",
         "x-assert": {"id": "rate", "expr": "length(transcript) <= dur_ms"},
         "x-completeness": {"column": "codec"},
         "x-frequency": {"column": "codec", "min_distinct": 4}},
        tiny.schema)
    v = job.all_violations(tiny, suite)
    got = {r.rule_id for r in v.select("rule_id").distinct().collect()}
    assert {"x-assert.rate", "x-completeness.codec",
            "x-frequency.codec"} <= got
    # partition-scoped rows carry NULL clip_id, row-scoped carry the id
    part_scoped = v.filter(F.col("rule_id") != "x-assert.rate")
    assert part_scoped.filter(F.col("clip_id").isNotNull()).count() == 0
    assert (v.filter(F.col("rule_id") == "x-assert.rate")
             .filter(F.col("clip_id").isNull()).count() == 0)


# ---------------------------------------------------------- x-anomaly
def test_anomaly_flags_outlier_partition(spark):
    # 9 partitions with mean 10, one with mean 1000; MAD over means is
    # 0 is avoided by spreading means slightly
    rows = []
    for p in range(9):
        rows += [(10 + p, p), (10 - p, p)]     # mean exactly 10
    rows += [(1000, 9), (1000, 9)]
    df = spark.createDataFrame(rows, "v int, part_id int")
    suite = compile_spec(
        {"type": "object", "x-anomaly": {"column": "v", "z_max": 3.5}},
        df.schema)
    rep = (dataset.partition_anomaly(df, suite.anomaly_checks[0])
                  .toPandas().set_index("part_id").sort_index())
    # every clean partition has mean 10 → median 10, MAD 0 →
    # degenerate rule: only the deviating partition breaches
    assert bool(rep.loc[9, "breach"]) is True
    assert rep.loc[9, "z"] is None or str(rep.loc[9, "z"]) == "nan"
    assert not rep.drop(index=9)["breach"].any()


def test_anomaly_modified_z_values(spark):
    # means 0..8 for parts 0..8, then an outlier mean 100:
    # median of [0..8,100] = 4.5; deviations sorted
    # [.5,.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,95.5] → MAD = 2.5
    # z(100) = 0.6745*(100-4.5)/2.5 = 25.76590
    rows = [(m, p) for p, m in enumerate(range(9))] + [(100, 9)]
    df = spark.createDataFrame(rows, "v int, part_id int")
    suite = compile_spec(
        {"type": "object", "x-anomaly": {"column": "v"}}, df.schema)
    rep = (dataset.partition_anomaly(df, suite.anomaly_checks[0])
                  .toPandas().set_index("part_id").sort_index())
    assert rep.loc[9, "z"] == pytest.approx(0.6745 * 95.5 / 2.5, abs=1e-4)
    assert bool(rep.loc[9, "breach"]) is True
    assert bool(rep.loc[4, "breach"]) is False


def test_anomaly_spec_errors(tiny):
    with pytest.raises(SpecError, match="z_max"):
        compile_spec({"type": "object",
                      "x-anomaly": {"column": "dur_ms", "z_max": -1}},
                     tiny.schema)
    with pytest.raises(SpecError, match="absent"):
        compile_spec({"type": "object",
                      "x-anomaly": {"column": "nope"}}, tiny.schema)


def test_anomaly_job_wiring(tiny):
    suite = compile_spec(
        {"type": "object",
         "x-anomaly": {"column": "dur_ms", "z_max": 0.1,
                       "severity": "ERROR"}}, tiny.schema)
    v = job.all_violations(tiny, suite)
    got = v.filter("rule_id = 'x-anomaly.dur_ms'")
    # part 0 mean ≈ 67.7, part 1 mean 75 → with z_max 0.1 both breach
    assert got.count() >= 1
    assert got.filter("severity = 2").count() == got.count()
    assert got.filter("clip_id is not null").count() == 0


# ------------------------------------------------------- x-transcript
@pytest.fixture(scope="module")
def tref(spark):
    rows = [("c0", "short"), ("c1", "too long for 3ms"),
            ("c2", "exists"), ("c3", "a b c d"), ("c4", "w"),
            ("c5", "u v w x"), ("c6", "")]
    df = spark.createDataFrame(rows,
                               "clip_id string, transcript_ref string")
    df = df.cache()
    df.count()
    return df


def _tspec(**kw):
    return {"type": "object", "properties": {
        "transcript": {"x-transcript": kw}}}


def test_transcript_dist_bound_strict_and_null_pass(tiny, tref):
    # c3 'x' vs 'a b c d' dist 7 > 3 → violation; c5 'y' vs 'u v w x'
    # dist 7 → violation; c0/c1 equal (dist 0); c2/c4 NULL transcript
    # → pass; c6 '' vs '' equal. Bound is STRICT: max_dist 7 → none.
    from canned_yaml_spark import payload
    suite = compile_spec(_tspec(max_dist=3), tiny.schema)
    [tc] = suite.transcript_checks
    v = payload.transcript_violations(tiny, tref, tc)
    got = sorted((r.clip_id, r.message) for r in v.collect())
    assert [c for c, _ in got] == ["c3", "c5"]
    assert got[0][1] == "edit distance 7 > 3"
    assert payload.transcript_violations(
        tiny, tref, compile_spec(_tspec(max_dist=7),
                                 tiny.schema).transcript_checks[0]) \
        .count() == 0


def test_transcript_dist_branch_is_pure_jvm(tiny, tref):
    from canned_yaml_spark import payload
    suite = compile_spec(_tspec(max_dist=3), tiny.schema)
    plan = payload.transcript_violations(tiny, tref,
                                         suite.transcript_checks[0]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_transcript_wer_bound(tiny, tref):
    # word-level: c3 'x' vs 'a b c d' → dist 4 (no shared words),
    # WER 1.0; c5 'y' vs 'u v w x' → 1.0; c1 equal → fast-path skips
    # Python; c6 ref '' → WER undefined → pass even though '' == ''
    from canned_yaml_spark import payload
    suite = compile_spec(_tspec(max_wer=0.5), tiny.schema)
    [tc] = suite.transcript_checks
    assert tc.max_dist is None and tc.max_wer == 0.5
    v = payload.transcript_violations(tiny, tref, tc)
    got = sorted((r.clip_id, r.message) for r in v.collect())
    assert got == [("c3", "WER 1.0 > 0.5"), ("c5", "WER 1.0 > 0.5")]


def test_transcript_both_bounds_two_rule_rows(tiny, tref):
    from canned_yaml_spark import payload
    suite = compile_spec(_tspec(max_dist=3, max_wer=0.5, severity="WARN"),
                         tiny.schema)
    [tc] = suite.transcript_checks
    assert int(tc.severity) == int(Severity.WARN)
    v = payload.transcript_violations(tiny, tref, tc)
    assert v.count() == 4                    # c3 and c5 fail BOTH bounds


def test_transcript_job_wiring(tiny, tref):
    suite = compile_spec(_tspec(max_wer=0.5), tiny.schema)
    v = job.all_violations(tiny, suite, clips_ref=tref)
    assert sorted(r.clip_id for r in v.collect()) == ["c3", "c5"]
    # without a ref table the check is skipped, not an error
    assert job.all_violations(tiny, suite).count() == 0


@pytest.fixture(scope="module")
def norm_pairs(spark):
    # cosmetic (case/punct-only) vs real word differences
    clips = spark.createDataFrame(
        [("n0", "Don't stop.", 0),          # cosmetic vs ref
         ("n1", "hello world", 0),          # real word change
         ("n2", "A, B; C!", 1)],            # cosmetic (punct+case)
        "clip_id string, transcript string, part_id int")
    ref = spark.createDataFrame(
        [("n0", "don't stop"), ("n1", "goodbye world"), ("n2", "a b c")],
        "clip_id string, transcript_ref string")
    return clips, ref


def test_transcript_normalize_dist(norm_pairs):
    # raw: every pair differs byte-wise → 3 violations at max_dist=0;
    # normalized: only the real word change survives
    from canned_yaml_spark import payload
    clips, ref = norm_pairs
    raw = compile_spec(_tspec(max_dist=0), clips.schema) \
        .transcript_checks[0]
    assert raw.normalize is False            # default off
    got = sorted(r.clip_id for r in
                 payload.transcript_violations(clips, ref, raw).collect())
    assert got == ["n0", "n1", "n2"]
    norm = compile_spec(_tspec(max_dist=0, normalize=True),
                        clips.schema).transcript_checks[0]
    assert norm.normalize is True
    got = sorted(r.clip_id for r in
                 payload.transcript_violations(clips, ref, norm).collect())
    assert got == ["n1"]


def test_transcript_normalize_wer_and_stays_jvm(norm_pairs):
    # WER over normalized words: n1 'hello world' vs 'goodbye world'
    # → 1 word edit / 2 ref words = 0.5; cosmetic rows collapse to
    # equality and never reach the Arrow branch
    from canned_yaml_spark import payload
    clips, ref = norm_pairs
    norm = compile_spec(_tspec(max_wer=0.0, normalize=True),
                        clips.schema).transcript_checks[0]
    v = payload.transcript_violations(clips, ref, norm)
    assert sorted((r.clip_id, r.message) for r in v.collect()) == \
        [("n1", "WER 0.5 > 0.0")]
    # the dist branch stays pure JVM with normalization applied — the
    # regexp/lower/trim pipeline is Column-side, inside codegen
    d = compile_spec(_tspec(max_dist=0, normalize=True),
                     clips.schema).transcript_checks[0]
    plan = payload.transcript_violations(clips, ref, d) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


@pytest.mark.parametrize("frag, loc", [
    ({"max_dist": -1}, "max_dist"),
    ({"max_dist": 1.5}, "max_dist"),
    ({"max_wer": -0.1}, "max_wer"),
    ({"max_dist": 1, "normalize": "yes"}, "normalize"),
    ({}, "x-transcript"),
])
def test_transcript_spec_errors(tiny, frag, loc):
    with pytest.raises(SpecError) as ei:
        compile_spec(_tspec(**frag), tiny.schema)
    assert loc in str(ei.value)


def test_deep_spec_carries_x_transcript(tiny):
    # schema-less compile (the deep spec requires columns tiny lacks)
    suite = compile_spec(open("specs/clips_deep.spec.yaml").read())
    [tc] = suite.transcript_checks
    assert tc.max_wer == 0.2 and tc.max_dist is None
    assert int(tc.severity) == int(Severity.WARN)


def test_deep_spec_carries_x_loudness():
    suite = compile_spec(open("specs/clips_deep.spec.yaml").read())
    [lc] = suite.loudness_checks
    assert lc.min_lufs == -50.0 and lc.max_lufs == -5.0
    assert lc.max_true_peak_dbtp == -1.0
    assert lc.max_lra_lu == 20.0
    assert lc.sr_col == "sr_hz"
    assert int(lc.severity) == int(Severity.WARN)


def test_deep_spec_carries_x_repetition():
    suite = compile_spec(open("specs/clips_deep.spec.yaml").read())
    [rc] = [c for c in suite.row_checks
            if c.rule_id == "properties.transcript.x-repetition"]
    assert int(rc.severity) == int(Severity.WARN)


# -------------------------------------------------------- x-embedding
@pytest.fixture(scope="module")
def embtiny(spark):
    nan, inf = float("nan"), float("inf")
    rows = [
        ("e0", [0.6, 0.8], 0),            # norm 1.0 → pass
        ("e1", [0.6, 0.8, 0.0], 0),       # 3 dims → dim violation
        ("e2", [nan, 0.8], 0),            # NaN → finite (norm gated off)
        ("e3", [inf, 0.8], 0),            # +Inf → finite
        ("e4", [-inf, 0.8], 1),           # -Inf → finite
        ("e5", [None, 0.8], 1),           # NULL element → finite
        ("e6", [60.0, 80.0], 1),          # norm 100 → above max
        ("e7", [0.0, 0.0], 1),            # zero vector → zero + norm<min
        ("e8", None, 1),                  # NULL column → passes all
        ("e9", [0.06, 0.08], 1),          # norm 0.1 → below min only
    ]
    df = spark.createDataFrame(
        rows, "vec_id string, emb array<float>, part_id int")
    df = df.cache()
    df.count()
    return df


def _emb_suite(schema, **over):
    xe = {"column": "emb", "dim": 2, "min_norm": 0.5, "max_norm": 2.0,
          "forbid_zero": True, **over}
    return compile_spec({"type": "object", "x-embedding": xe}, schema)


def test_embedding_rule_semantics(embtiny):
    suite = _emb_suite(embtiny.schema)
    assert [c.rule_id for c in suite.row_checks] == [
        "x-embedding.emb.dim", "x-embedding.emb.finite",
        "x-embedding.emb.norm", "x-embedding.emb.zero"]
    fired = {c.rule_id: sorted(
        r.vec_id for r in embtiny.filter(c.violation)
                                 .select("vec_id").collect())
        for c in suite.row_checks}
    assert fired["x-embedding.emb.dim"] == ["e1"]
    assert fired["x-embedding.emb.finite"] == ["e2", "e3", "e4", "e5"]
    # norm gated on finite: the NaN/Inf/NULL rows never double-flag
    # (Spark orders NaN above every value — ungated they would);
    # zero vector breaches BOTH the floor and forbid_zero
    assert fired["x-embedding.emb.norm"] == ["e6", "e7", "e9"]
    assert fired["x-embedding.emb.zero"] == ["e7"]


def test_embedding_one_sided_bounds(embtiny):
    suite = _emb_suite(embtiny.schema, min_norm=None, forbid_zero=False)
    [norm] = [c for c in suite.row_checks if c.rule_id.endswith(".norm")]
    got = sorted(r.vec_id for r in
                 embtiny.filter(norm.violation).select("vec_id").collect())
    assert got == ["e6"]          # only the ceiling is checked
    suite = _emb_suite(embtiny.schema, max_norm=None, forbid_zero=False)
    [norm] = [c for c in suite.row_checks if c.rule_id.endswith(".norm")]
    got = sorted(r.vec_id for r in
                 embtiny.filter(norm.violation).select("vec_id").collect())
    assert got == ["e7", "e9"]    # only the floor
    # no bounds at all → no norm rule compiled
    suite = _emb_suite(embtiny.schema, min_norm=None, max_norm=None,
                       forbid_zero=False)
    assert [c.rule_id for c in suite.row_checks] == [
        "x-embedding.emb.dim", "x-embedding.emb.finite"]


def test_embedding_single_scan_no_python(embtiny):
    from canned_yaml_spark import runner
    suite = _emb_suite(embtiny.schema)
    plan = runner.row_violations(
        embtiny, suite, id_col="vec_id")._jdf \
        .queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan     # row suite stays exchange-free


@pytest.mark.parametrize("xe,frag", [
    ({"column": "emb"}, "needs {column, dim"),
    ({"column": "nope", "dim": 2}, "absent from the table"),
    ({"column": "vec_id", "dim": 2}, "must be array<float|double>"),
    ({"column": "emb", "dim": 0}, "positive int"),
    ({"column": "emb", "dim": 2, "min_norm": -1}, "number >= 0"),
    ({"column": "emb", "dim": 2, "min_norm": 3, "max_norm": 1},
     "min_norm 3 > max_norm 1"),
])
def test_embedding_spec_errors(embtiny, xe, frag):
    with pytest.raises(SpecError) as ei:
        compile_spec({"type": "object", "x-embedding": xe},
                     embtiny.schema)
    assert frag in str(ei.value)
