"""Text-analysis operators (token stats, quality, lang-id, fingerprint)."""

import pyspark.sql.functions as F
import pytest

from canned_yaml_spark import textops


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (1, "The cat and the dog, in a house."),
        (2, "der und die das ist ein test text hier"),
        (3, "le chat et la maison est dans les champs pour"),
        (4, ""),
        (5, "x"),
        (6, "word " * 60),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_stats(spark, tiny_docs):
    out = {r.doc_id: r for r in textops.token_stats(tiny_docs).collect()}
    assert out[1].ws_tokens == 8
    assert out[4].ws_tokens == 0
    assert out[5].ws_tokens == 1
    # regex tokens: words + punctuation marks
    assert out[1].re_tokens == 10  # 8 words + ',' + '.'
    assert out[1].chars == len("The cat and the dog, in a house.")


def test_quality_score(spark, tiny_docs):
    out = {r.doc_id: r for r in textops.quality_score(tiny_docs).collect()}
    assert out[1].n_stopwords >= 3          # the, and, in, a
    assert out[4].quality == 0.0            # empty → too short
    assert out[5].quality == 0.0            # 1 word → too short
    assert out[6].quality > 0.5             # long, clean text
    assert out[1].mean_word_len == pytest.approx(
        (len("the cat and the dog, in a house.") - 7) / 8, abs=1e-3)


def test_lang_id(spark, tiny_docs):
    out = {r.doc_id: r.lang_pred for r in textops.lang_id(tiny_docs).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "fr"
    assert out[4] == "und"


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, " HELLO\tWORLD ")],
        "doc_id long, text string")
    fps = {r.doc_id: r.fp for r in textops.fingerprint(df).collect()}
    assert fps[1] == fps[2] == fps[3]


def test_normalize_transcript_duckdb_parity(spark):
    # the docstring claims an exact DuckDB restatement — hold it to
    # that: Spark Column pipeline == DuckDB SQL over an adversarial
    # value set (case, punct runs, tabs, apostrophes, non-ASCII,
    # empty, punct-only)
    import duckdb

    from canned_yaml_spark.textops import normalize_transcript
    vals = ["Don't stop.", "  A,,B  c!! ", "", "x  y\tz w",
            "UPPER lower 123 ''quoted''", "...", "Ünïcode façade"]
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    got = [r.n for r in
           df.select(normalize_transcript("t").alias("n")).collect()]
    con = duckdb.connect()
    want = [con.execute(
        "SELECT trim(regexp_replace(lower(?), '[^a-z0-9'']+', ' ', 'g'))",
        [v]).fetchone()[0] for v in vals]
    assert got == want
    assert got[0] == "don't stop" and got[1] == "a b c" and got[5] == ""


# ------------------------------------------------ repetition_stats (r5)
def test_repetition_stats_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b a"),        # 5 words, 2 distinct
         (2, "x"),                # 1 word: bigrams/trigrams empty
         (3, ""),                 # empty: everything 0
         (4, "Hello,  hello\nHELLO hello"),  # norm: 4 x "hello,"? no —
         (5, "one two three four")],         # all distinct
        "doc_id long, text string")
    r = {row.doc_id: row for row in
         textops.repetition_stats(docs).collect()}

    # doc 1: unigrams (5-2)/5; bigrams [ab,ba,ab,ba] (4-2)/4;
    # trigrams [aba,bab,aba] (3-2)/3
    assert r[1].n_words == 5
    assert abs(r[1].dup_frac_1 - 3 / 5) < 1e-12
    assert abs(r[1].dup_frac_2 - 2 / 4) < 1e-12
    assert abs(r[1].dup_frac_3 - 1 / 3) < 1e-12

    # doc 2: single word -> no n>=2 grams, fractions 0 by convention
    assert (r[2].n_words, r[2].dup_frac_1,
            r[2].dup_frac_2, r[2].dup_frac_3) == (1, 0.0, 0.0, 0.0)

    # doc 3: empty text tokenizes to zero words
    assert (r[3].n_words, r[3].dup_frac_1) == (0, 0.0)

    # doc 4: _norm lowercases + collapses whitespace but keeps
    # punctuation, so tokens are [hello,, hello, hello, hello] ->
    # 2 distinct of 4
    assert r[4].n_words == 4
    assert abs(r[4].dup_frac_1 - 2 / 4) < 1e-12

    # doc 5: clean prose, no repetition at any n
    assert (r[5].dup_frac_1, r[5].dup_frac_2, r[5].dup_frac_3) \
        == (0.0, 0.0, 0.0)


def test_repetition_stats_plan_is_one_projection(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = textops.repetition_stats(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "Generate" not in plan          # no explode
    assert "Python" not in plan            # no UDF


def test_x_repetition_spec_rule(spark):
    from canned_yaml_spark.compile import compile_spec
    from canned_yaml_spark.errors import SpecError
    import pytest as _pytest
    docs = spark.createDataFrame(
        [(1, "stop stop stop stop"),     # bigrams 3, distinct 1 -> 2/3
         (2, "one two three four"),      # 0
         (3, None)],                     # NULL: absent-not-validated
        "doc_id long, text string")
    spec = {"type": "object",
            "properties": {"text": {"x-repetition":
                                    {"n": 2, "max_frac": 0.5}}}}
    suite = compile_spec(spec, docs.schema)
    (check,) = suite.row_checks
    assert check.rule_id == "properties.text.x-repetition"
    bad = docs.filter(check.violation).collect()
    assert [r.doc_id for r in bad] == [1]

    # located SpecErrors for malformed rules
    for bad_spec in (
        {"properties": {"text": {"x-repetition": {"n": 2}}}},
        {"properties": {"text": {"x-repetition": {"max_frac": 1.5}}}},
        {"properties": {"text": {"x-repetition":
                                 {"n": 0, "max_frac": 0.5}}}},
    ):
        with _pytest.raises(SpecError):
            compile_spec({"type": "object", **bad_spec}, docs.schema)

    # non-string column: statically passes with a warning
    suite2 = compile_spec(
        {"type": "object",
         "properties": {"doc_id": {"x-repetition": {"max_frac": 0.5}}}},
        docs.schema)
    assert not suite2.row_checks
    assert any("non-string" in w for w in suite2.warnings)
