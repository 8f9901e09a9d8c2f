"""Text-analysis operators over the ``documents`` table.

Large-scale training-data-pipeline surface (no reference precedent — the
reference's workload is SURVEY.md §2-D; these are the north-star extensions):
language ID, quality scoring, token counting, document fingerprinting.

All hot-path logic is built-in ``pyspark.sql.functions`` (JVM, whole-stage
codegen) — no Python UDFs.  Every operator is a narrow projection +
map-side-combinable aggregation, so it scales linearly with input splits: at
100 TB these are embarrassingly parallel scans with no shuffle except the
final small aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hands_on_iceberg_compression_spark.operators import Query
from hands_on_iceberg_compression_spark.sources.fixtures import load_table

# deterministic marker-word profiles for the language-ID heuristic
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "los", "que"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "les", "et", "une"),
}

_STOPWORDS = ("the", "a", "of", "and", "to", "in")


def _tokens(col):
    return F.split(col, " ")


def _any_eq(w, values: tuple[str, ...]):
    cond = w == values[0]
    for v in values[1:]:
        cond = cond | (w == v)
    return cond


def q_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting: whitespace tokens + average token length per doc."""
    docs = load_table(spark, sf, "documents")
    toks = _tokens(F.col("text"))
    n = F.size(toks)
    # total non-space chars / token count == average token length
    nonspace = F.length(F.regexp_replace(F.col("text"), " ", ""))
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(nonspace.cast("double") / n, 4).alias("avg_token_len"),
    )


# BPE-ish pre-tokenizer: letter runs, digit runs, punctuation runs, each with
# optional leading space (GPT-2 style, minus the RE2-incompatible lookahead —
# the oracle runs on DuckDB's RE2)
_BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def q_token_count_bpe(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting with the BPE-ish regex pre-tokenizer (the whitespace
    tokenizer's twin in text_token_stats)."""
    docs = load_table(spark, sf, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), 0)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_bpe"),
    )


def q_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    """Quality scoring: length, stopword ratio, digit ratio, distinct-token
    ratio — the standard cheap pre-training filters."""
    docs = load_table(spark, sf, "documents")
    toks = _tokens(F.col("text"))
    n = F.size(toks)
    stop_n = F.size(F.filter(toks, lambda w: _any_eq(w, _STOPWORDS)))
    digit_n = F.length(F.regexp_replace(F.col("text"), "[^0-9]", ""))
    uniq_n = F.size(F.array_distinct(toks))
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_obs"),
        n.alias("n_tokens"),
        F.round(stop_n.cast("double") / n, 4).alias("stopword_ratio"),
        F.round(digit_n.cast("double") / F.length("text"), 4).alias("digit_ratio"),
        F.round(uniq_n.cast("double") / n, 4).alias("distinct_ratio"),
    )


def q_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """Language-ID heuristic: marker-word scores, argmax with a fixed
    tie-break order (en > es > de > fr > und)."""
    docs = load_table(spark, sf, "documents")
    toks = _tokens(F.col("text"))
    def _marker_pred(markers: tuple[str, ...]):
        # NB: F.filter lambdas taking 2 params get (element, index) — keep the
        # marker tuple in a closure, never as a default arg.
        return lambda w: _any_eq(w, markers)

    scores = {
        lang: F.size(F.filter(toks, _marker_pred(markers)))
        for lang, markers in _LANG_MARKERS.items()
    }
    s = {k: F.col(f"score_{k}") for k in _LANG_MARKERS}
    pred = (
        F.when((s["en"] > 0) & (s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]), "en")
        .when((s["es"] > 0) & (s["es"] >= s["de"]) & (s["es"] >= s["fr"]), "es")
        .when((s["de"] > 0) & (s["de"] >= s["fr"]), "de")
        .when(s["fr"] > 0, "fr")
        .otherwise("und")
    )
    return (
        docs.select(
            "doc_id",
            "lang",
            *[scores[k].alias(f"score_{k}") for k in _LANG_MARKERS],
        )
        .withColumn("pred_lang", pred)
        .select("doc_id", "lang", "pred_lang", "score_en", "score_es", "score_de", "score_fr")
    )


def q_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercased text.
    (The content-addressable id used by exact dedup at scale.)"""
    docs = load_table(spark, sf, "documents")
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), "\\s+", " ")))
    return docs.select("doc_id", F.md5(norm.cast("binary")).alias("fingerprint"))


def q_word_freq_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-level token frequency, top 20 (explode -> partial-agg count)."""
    docs = load_table(spark, sf, "documents")
    return (
        docs.select(F.explode(_tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(20)
    )


def _lang_sql() -> str:
    def marker_filter(markers: tuple[str, ...]) -> str:
        cond = " OR ".join(f"x = '{m}'" for m in markers)
        return f"len(list_filter(string_split(text, ' '), x -> {cond}))"

    scores = ", ".join(
        f"{marker_filter(m)} AS score_{lang}" for lang, m in _LANG_MARKERS.items()
    )
    return (
        f"WITH scored AS (SELECT doc_id, lang, {scores} FROM documents) "
        "SELECT doc_id, lang, CASE "
        "WHEN score_en > 0 AND score_en >= score_es AND score_en >= score_de "
        "AND score_en >= score_fr THEN 'en' "
        "WHEN score_es > 0 AND score_es >= score_de AND score_es >= score_fr THEN 'es' "
        "WHEN score_de > 0 AND score_de >= score_fr THEN 'de' "
        "WHEN score_fr > 0 THEN 'fr' ELSE 'und' END AS pred_lang, "
        "score_en, score_es, score_de, score_fr FROM scored"
    )


_STOP_COND = " OR ".join(f"x = '{w}'" for w in _STOPWORDS)

QUERIES: dict[str, Query] = {
    "text_token_stats": Query(
        q_token_stats,
        "SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, "
        "round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / "
        "len(string_split(text, ' ')), 4) AS avg_token_len FROM documents",
        "token counting (whitespace tokenizer)",
    ),
    "text_token_count_bpe": Query(
        q_token_count_bpe,
        f"SELECT doc_id, len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+', 0)) "
        "AS n_bpe_tokens, "
        f"len(list_distinct(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+', 0))) "
        "AS n_distinct_bpe FROM documents",
        "BPE-ish regex token counting",
    ),
    "text_quality_score": Query(
        q_quality_score,
        "SELECT doc_id, length(text) AS n_chars_obs, "
        "len(string_split(text, ' ')) AS n_tokens, "
        f"round(CAST(len(list_filter(string_split(text, ' '), x -> {_STOP_COND})) "
        "AS DOUBLE) / len(string_split(text, ' ')), 4) AS stopword_ratio, "
        "round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / "
        "length(text), 4) AS digit_ratio, "
        "round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / "
        "len(string_split(text, ' ')), 4) AS distinct_ratio FROM documents",
        "quality scoring (stopword/digit/distinct ratios)",
    ),
    "text_lang_id": Query(
        q_lang_id,
        _lang_sql(),
        "language-ID heuristic (deterministic marker-word argmax)",
    ),
    "text_fingerprint": Query(
        q_fingerprint,
        "SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) "
        "AS fingerprint FROM documents",
        "document fingerprinting (normalized md5)",
    ),
    "text_word_freq_topk": Query(
        q_word_freq_topk,
        "SELECT token, count(*) AS cnt FROM (SELECT unnest(string_split(text, ' ')) "
        "AS token FROM documents) GROUP BY token ORDER BY cnt DESC, token LIMIT 20",
        "corpus token frequency top-k",
    ),
}
