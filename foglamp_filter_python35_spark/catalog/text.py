"""X4 text-analysis queries over the ``documents`` table, oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from foglamp_filter_python35_spark.catalog import QuerySpec, load
from foglamp_filter_python35_spark.functions import text as T

_STOP_SQL = ", ".join(f"'{w}'" for w in T.STOPWORDS)


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_calc"),
        T.token_count("text").alias("n_tokens"),
        T.distinct_token_count("text").alias("n_distinct_tokens"),
        T.avg_token_length("text").alias("avg_token_len"),
    )


O_TEXT_STATS = """
SELECT doc_id,
       LENGTH(text) AS n_chars_calc,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
         AS n_distinct_tokens,
       CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
         / len(string_split(text, ' ')) AS avg_token_len
FROM documents
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.stopword_ratio("text").alias("stop_ratio"),
        T.quality_score("text").alias("quality"),
    )


O_QUALITY_SCORE = f"""
SELECT doc_id,
       CAST(len(list_filter(string_split(text, ' '),
                            t -> t IN ({_STOP_SQL}))) AS DOUBLE)
         / len(string_split(text, ' ')) AS stop_ratio,
       CAST(len(list_filter(string_split(text, ' '),
                            t -> t IN ({_STOP_SQL}))) AS DOUBLE)
         / len(string_split(text, ' ')) * 0.5
       + LEAST(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) * 0.5
         AS quality
FROM documents
"""


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        T.language_id("text").alias("lang_pred"),
    )


O_LANGUAGE_ID = """
SELECT doc_id, lang AS lang_label,
       CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
            WHEN regexp_matches(text, '[äöüß]') THEN 'de'
            WHEN regexp_matches(text, '[ñ¿¡]') THEN 'es'
            WHEN regexp_matches(text, '[àâçèêëîïôùûœ]') THEN 'fr'
            ELSE 'en' END AS lang_pred
FROM documents
"""


def q_token_count_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(T.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(20)
    )


O_TOKEN_COUNT_TOTAL = """
SELECT token, COUNT(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
ORDER BY cnt DESC, token
LIMIT 20
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.fingerprint("text").alias("fingerprint"),
        F.size(T.regex_tokens("text")).cast("bigint").alias("n_alpha_tokens"),
    )


O_DOC_FINGERPRINT = """
SELECT doc_id,
       md5(array_to_string(
             list_filter(string_split_regex(lower(text), '\\s+'),
                         t -> t <> ''), ' '))
         AS fingerprint,
       CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT)
         AS n_alpha_tokens
FROM documents
"""

# --- corpus bigram frequencies: explode 2-grams, count, top 20.  The
# n-gram language-model building block (explode is map-side; the count is
# one partial+final hash agg; top-k is TakeOrdered).


def q_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from foglamp_filter_python35_spark.functions.dedup import word_ngrams

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.split("text", " ").alias("_ts"))
    grams = toks.select(
        F.explode(word_ngrams(F.col("_ts"), 2)).alias("bigram")
    )
    return (
        grams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("bigram"))
        .limit(20)
    )


O_BIGRAM_TOPK = """
WITH toks AS (SELECT string_split(text, ' ') AS ts FROM documents),
grams AS (
  SELECT unnest(list_distinct(list_transform(range(1, len(ts)),
               i -> ts[i] || ' ' || ts[i+1]))) AS bigram
  FROM toks WHERE len(ts) >= 2
)
SELECT bigram, COUNT(*) AS cnt
FROM grams
GROUP BY bigram
ORDER BY cnt DESC, bigram
LIMIT 20
"""

# --- tf-idf top terms: two hash aggregates + windowed top-k.  Ranking is
# (tf desc, df asc, term asc) on exact integers — the ordering float idf
# induces, minus the float (see functions.text.top_terms docstring).


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return T.top_terms(docs, k=3).orderBy("doc_id", "rank")


O_TFIDF_TOP_TERMS = """
WITH tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents)
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
ranked AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tf DESC, df ASC, tf.term ASC) AS rank
  FROM tf JOIN dfreq ON tf.term = dfreq.term
)
SELECT doc_id, term, tf, df, rank
FROM ranked WHERE rank <= 3
ORDER BY doc_id, rank
"""

# --- deterministic train/val/test split: md5-bucket of doc_id, counted
# per (source, split).  The split is a pure function of the id — stable
# across runs, partitionings, and engines; at 100 TB this is the standard
# leakage-free dataset split (no sampling, no shuffle beyond the count).


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("source", T.hash_split("doc_id").alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source", "split")
    )


O_TRAIN_TEST_SPLIT = """
SELECT source,
       CASE WHEN b < 80 THEN 'train'
            WHEN b < 90 THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM (
  SELECT source,
         CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
              AS BIGINT) % 100 AS b
  FROM documents
)
GROUP BY source, split
ORDER BY source, split
"""

# --- overlapping token-window chunking (LLM context prep): one row per
# (doc, chunk), chunk k covering tokens [k*40, k*40+50).  Explode is
# map-side; no shuffle, no Python.

_CHUNK_W, _CHUNK_S = 50, 40


def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return T.chunk_tokens(
        docs, "doc_id", "text", window=_CHUNK_W, stride=_CHUNK_S
    ).orderBy("doc_id", "chunk_idx")


O_DOC_CHUNKING = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id, toks,
         unnest(range(0,
           CASE WHEN len(toks) > {_CHUNK_W}
                THEN (len(toks) - {_CHUNK_W} + {_CHUNK_S} - 1)
                     // {_CHUNK_S} + 1
                ELSE 1 END)) AS chunk_idx
  FROM t
)
SELECT doc_id, chunk_idx,
       CAST(len(toks[chunk_idx * {_CHUNK_S} + 1 :
                     chunk_idx * {_CHUNK_S} + {_CHUNK_W}]) AS BIGINT)
         AS n_chunk_tokens,
       array_to_string(toks[chunk_idx * {_CHUNK_S} + 1 :
                            chunk_idx * {_CHUNK_S} + {_CHUNK_W}], ' ')
         AS chunk_text
FROM s
ORDER BY doc_id, chunk_idx
"""

# --- metadata validation: predicted language vs labeled language.  The
# confusion-matrix shape of corpus QA — a derived column grouped against
# a stored label, mismatches only.


def q_lang_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("lang_label"),
            T.language_id("text").alias("lang_pred"),
        )
        .filter(F.col("lang_label") != F.col("lang_pred"))
        .groupBy("lang_label", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang_label", "lang_pred")
    )


O_LANG_MISMATCH = """
SELECT lang AS lang_label,
       CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
            WHEN regexp_matches(text, '[äöüß]') THEN 'de'
            WHEN regexp_matches(text, '[ñ¿¡]') THEN 'es'
            WHEN regexp_matches(text, '[àâçèêëîïôùûœ]') THEN 'fr'
            ELSE 'en' END AS lang_pred,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents
WHERE lang <> (CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
                    WHEN regexp_matches(text, '[äöüß]') THEN 'de'
                    WHEN regexp_matches(text, '[ñ¿¡]') THEN 'es'
                    WHEN regexp_matches(text, '[àâçèêëîïôùûœ]') THEN 'fr'
                    ELSE 'en' END)
GROUP BY lang_label, lang_pred
ORDER BY lang_label, lang_pred
"""

SPECS = [
    QuerySpec("text_stats", q_text_stats, O_TEXT_STATS, headline=True),
    QuerySpec("quality_score", q_quality_score, O_QUALITY_SCORE),
    QuerySpec("language_id", q_language_id, O_LANGUAGE_ID),
    QuerySpec("token_count_total", q_token_count_total, O_TOKEN_COUNT_TOTAL, headline=True),
    QuerySpec("doc_fingerprint", q_doc_fingerprint, O_DOC_FINGERPRINT),
    QuerySpec("tfidf_top_terms", q_tfidf_top_terms, O_TFIDF_TOP_TERMS),
    QuerySpec("bigram_topk", q_bigram_topk, O_BIGRAM_TOPK),
    QuerySpec("train_test_split", q_train_test_split, O_TRAIN_TEST_SPLIT),
    QuerySpec("doc_chunking", q_doc_chunking, O_DOC_CHUNKING),
    QuerySpec("lang_mismatch", q_lang_mismatch, O_LANG_MISMATCH),
]
