"""Text-analysis operators over the ``documents`` table (extended surface).

Language-ID (marker-word heuristic), quality scoring, token counting,
and document fingerprinting — the text side of a training-data pipeline,
all as native Column expressions (JVM-side, whole-stage codegen; no
Python in the hot path).

Scale note: everything here is embarrassingly parallel per-document —
no shuffle except the final small aggregation.  At 100 TB the scan
dominates; these expressions ride the parquet reader's vectorized batches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from acled_spark.registry import query
from acled_spark.tables import load

# Stopword-ish markers (shared constant for Spark + oracle generation).
_STOPWORDS = ("the", "a", "of", "and", "to", "in")

# marker word -> language guess, checked in order (deterministic heuristic).
_LANG_MARKERS = (
    ("der", "de"),
    ("el", "es"),
    ("le", "fr"),
    ("the", "en"),
)


def _tokens_spark(text: Column) -> Column:
    """Whitespace tokenization; empty/blank text -> empty array."""
    return F.when(F.length(F.trim(text)) == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.trim(text), r"\s+")
    )


_TOKENS_SQL = (
    "CASE WHEN length(trim(text)) = 0 THEN [] "
    "ELSE string_split_regex(trim(text), '\\s+') END"
)


# --- token counting ---------------------------------------------------------
@query(
    "text_token_stats",
    oracle=f"""
    WITH t AS (SELECT lang, len({_TOKENS_SQL}) AS n_tokens FROM documents)
    SELECT lang,
           COUNT(*) AS docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(AVG(n_tokens), 4) AS avg_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
    FROM t GROUP BY lang ORDER BY lang
    """,
    tags=("text", "extended"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counts per language (training-data token budget)."""
    docs = load(spark, sf_dir, "documents")
    n_tokens = F.size(_tokens_spark(F.col("text")))
    return (
        docs.select("lang", n_tokens.alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
        )
        .orderBy("lang")
    )


# --- quality scoring --------------------------------------------------------
# Length / punctuation / stopword-ratio heuristics; the score formula is a
# weighted blend — deterministic, shared between engines.
def _stopword_filter_sql() -> str:
    ors = " OR ".join(f"t = '{w}'" for w in _STOPWORDS)
    return f"len(list_filter({_TOKENS_SQL}, t -> {ors}))"


@query(
    "text_quality_scores",
    oracle=f"""
    WITH q AS (
      SELECT source,
             len({_TOKENS_SQL}) AS n_tokens,
             length(text) AS n_chars,
             {_stopword_filter_sql()} AS n_stop,
             length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS n_punct
      FROM documents
    ),
    s AS (
      SELECT source, n_tokens, n_chars,
             CASE WHEN n_tokens  > 0 THEN CAST(n_stop  AS DOUBLE) / n_tokens ELSE 0 END AS stop_ratio,
             CASE WHEN n_chars   > 0 THEN CAST(n_punct AS DOUBLE) / n_chars  ELSE 0 END AS punct_ratio
      FROM q
    )
    SELECT source,
           COUNT(*) AS docs,
           ROUND(AVG(n_tokens), 4) AS avg_tokens,
           ROUND(AVG(stop_ratio), 4) AS avg_stop_ratio,
           ROUND(AVG(punct_ratio), 4) AS avg_punct_ratio,
           ROUND(AVG(0.5 * LEAST(n_tokens / 100.0, 1.0)
                   + 0.3 * (1.0 - stop_ratio)
                   + 0.2 * (1.0 - punct_ratio)), 4) AS avg_quality
    FROM s GROUP BY source ORDER BY source
    """,
    tags=("text", "quality", "extended"),
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality heuristics: length/stopword/punct blend."""
    docs = load(spark, sf_dir, "documents")
    toks = _tokens_spark(F.col("text"))
    n_stop = F.size(F.filter(toks, lambda t: _any_eq(t, _STOPWORDS)))
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    n_punct = F.length(F.regexp_replace("text", r"[^.,!?;:]", ""))
    stop_ratio = F.when(
        n_tokens > 0, n_stop.cast("double") / n_tokens
    ).otherwise(0.0)
    punct_ratio = F.when(
        n_chars > 0, n_punct.cast("double") / n_chars
    ).otherwise(0.0)
    quality = (
        0.5 * F.least(n_tokens / 100.0, F.lit(1.0))
        + 0.3 * (1.0 - stop_ratio)
        + 0.2 * (1.0 - punct_ratio)
    )
    return (
        docs.select(
            "source",
            n_tokens.alias("n_tokens"),
            stop_ratio.alias("stop_ratio"),
            punct_ratio.alias("punct_ratio"),
            quality.alias("quality"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
            F.round(F.avg("stop_ratio"), 4).alias("avg_stop_ratio"),
            F.round(F.avg("punct_ratio"), 4).alias("avg_punct_ratio"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
        )
        .orderBy("source")
    )


def _any_eq(t: Column, words: tuple[str, ...]) -> Column:
    out = t == words[0]
    for w in words[1:]:
        out = out | (t == w)
    return out


# --- language identification (marker-word heuristic) ------------------------
@query(
    "text_langid_confusion",
    oracle=f"""
    WITH toks AS (SELECT lang, {_TOKENS_SQL} AS t FROM documents),
    pred AS (
      SELECT lang,
             CASE
               {" ".join(f"WHEN len(list_filter(t, x -> x = '{m}')) > 0 THEN '{lg}'" for m, lg in _LANG_MARKERS)}
               ELSE 'unknown' END AS predicted
      FROM toks
    )
    SELECT lang, predicted, COUNT(*) AS cnt
    FROM pred GROUP BY lang, predicted ORDER BY lang, predicted
    """,
    tags=("text", "extended"),
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic -> confusion counts vs labels."""
    docs = load(spark, sf_dir, "documents")
    toks = _tokens_spark(F.col("text"))
    def has_marker(marker: str) -> Column:
        # NB: the HOF lambda must take exactly one parameter — PySpark
        # binds a second parameter to the element *index*.
        return F.size(F.filter(toks, lambda t: t == F.lit(marker))) > 0

    pred = None
    for marker, lg in _LANG_MARKERS:
        has = has_marker(marker)
        pred = F.when(has, lg) if pred is None else pred.when(has, lg)
    pred = pred.otherwise("unknown")
    return (
        docs.select("lang", pred.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("cnt"))
        .orderBy("lang", "predicted")
    )


# --- document fingerprinting ------------------------------------------------
# Normalized md5 fingerprint — the exact-dedup key and provenance id.
FINGERPRINT_SQL = "md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))"


def fingerprint_spark(text: Column) -> Column:
    """Whitespace-normalized lowercase md5 fingerprint of a document."""
    return F.md5(F.lower(F.trim(F.regexp_replace(text, r"\s+", " "))))


@query(
    "text_fingerprints",
    oracle=f"""
    SELECT doc_id, {FINGERPRINT_SQL} AS fingerprint
    FROM documents ORDER BY doc_id LIMIT 100
    """,
    tags=("text", "dedup", "extended"),
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document normalized fingerprint (dedup key), value-parity checked."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", fingerprint_spark(F.col("text")).alias("fingerprint"))
        .orderBy("doc_id")
        .limit(100)
    )
