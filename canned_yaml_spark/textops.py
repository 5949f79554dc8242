"""Text-analysis operators for training-data pipelines.

These extend the validation engine with the document-quality checks a
100 TB text-corpus pipeline needs (task brief): token counting,
quality scoring, language-ID heuristic, document fingerprinting. All
pure Column expressions — JVM-side, whole-stage codegen, no UDFs —
so they run at scan speed and their semantics are independently
restatable in the DuckDB oracle (oracle.py builds the mirror SQL from
the same constants in this module).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: BPE-ish token regex: words / numbers / single punctuation marks.
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

#: small stopword lists for the language-ID heuristic (deterministic,
#: shared verbatim with the oracle SQL)
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit", "im"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "para", "en", "que"],
}

EN_STOPWORDS = LANG_STOPWORDS["en"]


def _norm(col):
    """Normalized text: lowercase, whitespace collapsed to single
    spaces, trimmed. The shared preprocessing for fingerprints,
    shingles and token ops."""
    return F.trim(F.regexp_replace(F.lower(col), "\\s+", " "))


def normalize_transcript(col):
    """ASR-style transcript normalization, pure Column (codegen):
    lowercase, then every run of characters outside [a-z0-9'] becomes
    one space (punctuation dies, word boundaries survive, apostrophes
    stay so contractions keep their identity), then trim. This is the
    standard pre-WER normalization — "Don't stop." and "don't stop"
    are the same utterance to an ASR metric. Non-ASCII letters are
    treated as separators (documented choice; the corpus this engine
    gates is ASCII-transcribed).

    DuckDB-equivalent (the oracle's restatement):
    ``trim(regexp_replace(lower(x), '[^a-z0-9'']+', ' ', 'g'))``.
    """
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9']+", " "))


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-document token counts: whitespace tokens + regex (BPE-ish)
    tokens + char length."""
    t = _norm(F.col("text"))
    return docs.select(
        "doc_id",
        F.when(F.length(t) == 0, F.lit(0))
         .otherwise(F.size(F.split(t, " "))).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), F.lit(0))
               ).alias("re_tokens"),
        F.length("text").alias("chars"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality profile: length, punctuation density, stopword
    ratio, mean word length — the standard cheap filters a pretraining
    pipeline applies before expensive stages."""
    t = _norm(F.col("text"))
    words = F.split(t, " ")
    n_words = F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(words))
    n_stop = F.size(F.array_intersect(
        words, F.array(*[F.lit(w) for w in EN_STOPWORDS])))
    n_punct = F.length(F.regexp_replace(F.col("text"), "[^!-/:-@\\[-`{-~]", ""))
    mean_wlen = F.when(n_words > 0,
                       F.round((F.length(t) - (n_words - 1)) / n_words, 4))
    score = (
        F.when(n_words < 5, F.lit(0.0))
        .otherwise(F.round(
            F.least(F.lit(1.0), n_words / F.lit(50.0)) * 0.5
            + F.when(n_stop > 0, F.lit(0.3)).otherwise(F.lit(0.0))
            + F.when(n_punct / F.greatest(F.length("text"), F.lit(1))
                     < 0.2, F.lit(0.2)).otherwise(F.lit(0.0)), 4))
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_stop.alias("n_stopwords"),
        n_punct.alias("n_punct"),
        mean_wlen.alias("mean_word_len"),
        score.alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-hit language-ID heuristic: distinct-stopword hits per
    language, argmax with deterministic tie-break (alphabetical), 'und'
    when nothing hits."""
    words = F.split(_norm(F.col("text")), " ")
    hits = {
        lang: F.size(F.array_intersect(
            words, F.array(*[F.lit(w) for w in ws])))
        for lang, ws in sorted(LANG_STOPWORDS.items())
    }
    best = F.greatest(*hits.values())
    pick = F.lit("und")
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        pick = F.when(hits[lang] == best, F.lit(lang)).otherwise(pick)
    out = [F.col("doc_id")]
    out += [hits[lang].alias(f"hits_{lang}") for lang in sorted(LANG_STOPWORDS)]
    out.append(F.when(best > 0, pick).otherwise(F.lit("und")).alias("lang_pred"))
    return docs.select(*out)


def _ngrams(words, nw, n: int):
    """n-gram string array from a token array, built so that every HOF
    lambda captures ONLY its element arguments. Spark evaluates
    higher-order functions interpreted (CodegenFallback), and an
    interpreted lambda re-evaluates any CAPTURED subtree once PER
    ELEMENT — the original `transform(sequence(...), i ->
    concat_ws(' ', slice(words, i, n)))` re-ran the whole
    regex-normalize+split per token and made a 50-word doc cost ~1 ms
    (repetition_stats: 44 s for 5k docs, OPTIMIZATION_r06.md). The
    shifted-slice zip_with fold below evaluates `words` n times per
    row instead of once per token, and each lambda touches only
    (acc, x): 44 s → sub-second, identical strings (concat of
    never-null tokens == concat_ws)."""
    if n == 1:
        return words
    shifted = [F.slice(words, k + 1, nw - (n - 1)) for k in range(n)]
    ng = shifted[0]
    for k in range(1, n):
        ng = F.zip_with(ng, shifted[k],
                        lambda acc, x: F.concat(acc, F.lit(" "), x))
    return F.when(nw >= n, ng).otherwise(F.array().cast("array<string>"))


def _dup_frac_of(ng):
    """(total − distinct)/total over a materialized n-gram array; 0.0
    for empty/NULL arrays (docs shorter than n tokens)."""
    total = F.size(ng)
    return F.when(total > 0,
                  (total - F.size(F.array_distinct(ng)))
                  / total.cast("double")).otherwise(F.lit(0.0))


def dup_ngram_frac(col, n: int):
    """Duplicate n-gram fraction of ONE string Column — the building
    block behind repetition_stats and the `x-repetition` spec rule.
    0.0 for docs shorter than n tokens; pure Column algebra (no
    explode, no UDF), so it composes into the row suite's span like
    any other value predicate (see _ngrams for why the lambdas must
    not capture the tokenization)."""
    t = _norm(col)
    words = F.when(F.length(t) == 0, F.array().cast("array<string>")) \
             .otherwise(F.split(t, " "))
    return _dup_frac_of(_ngrams(words, F.size(words), n))


def repetition_stats(docs: DataFrame, ns: tuple[int, ...] = (1, 2, 3)
                     ) -> DataFrame:
    """Gopher-style repetition signals: the fraction of duplicate
    n-grams per document, for each n in ``ns`` — the standard
    training-data quality measure for boilerplate / degenerate
    repetition (a doc that is one sentence pasted 50 times scores
    dup_frac_2 ≈ 1; clean prose scores near 0 beyond unigrams).

    ``dup_frac_n = 1 − distinct(n-grams)/count(n-grams)`` over the
    shared whitespace tokenization (`_norm`); 0.0 when the doc has
    fewer than n tokens. No explode, no shuffle, no UDF: at 10^12
    docs this is pure scan bandwidth, and the n-gram arrays live only
    inside projections (never materialized to a shuffle).

    The tokenization and each n-gram array are materialized as their
    OWN projection step: interpreted expression eval (which the HOF
    subtrees force) has no common-subexpression elimination, so
    leaving them inline re-evaluates the regex+split once per
    REFERENCE — and Catalyst's CollapseProject keeps the split
    because the producers are non-cheap and multiply referenced.
    Measured 44 s → sub-second on the 5k-doc sf0.1 corpus at
    identical output (oracle gate green).
    """
    t = _norm(F.col("text"))
    words = F.when(F.length(t) == 0, F.array().cast("array<string>")) \
             .otherwise(F.split(t, " "))
    step1 = docs.select("doc_id", words.alias("_w"))
    w, nw = F.col("_w"), F.size(F.col("_w"))
    step2 = step1.select(
        "doc_id", nw.alias("n_words"),
        *[_ngrams(w, nw, n).alias(f"_ng{n}") for n in ns])
    return step2.select(
        "doc_id", "n_words",
        *[_dup_frac_of(F.col(f"_ng{n}")).alias(f"dup_frac_{n}")
          for n in ns])


def fingerprint(docs: DataFrame) -> DataFrame:
    """Deterministic document fingerprint: md5 of normalized text.
    (md5 rather than xxhash64 so the oracle computes the identical
    value; at production scale swap for xxhash64 — one line.)"""
    return docs.select(
        "doc_id", F.md5(_norm(F.col("text"))).alias("fp"))
