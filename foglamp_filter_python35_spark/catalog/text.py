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


#: The ONE DuckDB twin of functions.text.language_id — every oracle
#: that needs the predicted language interpolates this, so the rule
#: chain can never drift between oracles.
_LANGPRED_SQL = """CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
            WHEN regexp_matches(text, '[äöüß]') THEN 'de'
            WHEN regexp_matches(text, '[ñ¿¡]') THEN 'es'
            WHEN regexp_matches(text, '[àâçèêëîïôùûœ]') THEN 'fr'
            ELSE 'en' END"""


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        T.language_id("text").alias("lang_pred"),
    )


O_LANGUAGE_ID = f"""
SELECT doc_id, lang AS lang_label,
       {_LANGPRED_SQL} AS lang_pred
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
        F.explode(word_ngrams("_ts", 2)).alias("bigram")
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


O_LANG_MISMATCH = f"""
SELECT lang AS lang_label,
       {_LANGPRED_SQL} AS lang_pred,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents
WHERE lang <> ({_LANGPRED_SQL})
GROUP BY lang_label, lang_pred
ORDER BY lang_label, lang_pred
"""

# --- composite corpus quality gate: dedup-canonical + language QA +
# length bounds + quality threshold in one pass, each doc reporting the
# FIRST gate it fails.  The only shuffle is the fingerprint window (the
# exact-dedup key, so at scale this piggybacks on that partitioning).


def q_corpus_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return T.corpus_prefilter(docs).orderBy("doc_id")


O_CORPUS_PREFILTER = f"""
WITH feats AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
         CAST(len(list_filter(string_split(text, ' '),
                              t -> t IN ({_STOP_SQL}))) AS DOUBLE)
           / len(string_split(text, ' ')) * 0.5
         + LEAST(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0,
                 1.0) * 0.5 AS q,
         {_LANGPRED_SQL} AS lp,
         md5(array_to_string(
               list_filter(string_split_regex(lower(text), '\\s+'),
                           t -> t <> ''), ' ')) AS fp
  FROM documents
),
canon AS (
  SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS canon_id FROM feats
),
gated AS (
  SELECT doc_id,
         CASE WHEN doc_id <> canon_id THEN 'duplicate'
              WHEN lp <> lang THEN 'lang_mismatch'
              WHEN nt < {T.PREFILTER_MIN_TOKENS} THEN 'too_short'
              WHEN nt > {T.PREFILTER_MAX_TOKENS} THEN 'too_long'
              WHEN q < {T.PREFILTER_MIN_QUALITY} THEN 'low_quality'
              ELSE 'keep' END AS reason
  FROM canon
)
SELECT doc_id, reason, reason = 'keep' AS keep
FROM gated
ORDER BY doc_id
"""

# --- deterministic stratified downsampling: rebalance the corpus by
# keeping a per-language percentage, membership a pure function of the
# doc id (md5 bucket) — a map-side scan predicate, stable across runs,
# engines, and partitionings.  The classic "downsample the dominant
# language" step before training-mix assembly.

_SAMPLE_RATES = {"en": 15}
_SAMPLE_DEFAULT = 100


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        T.stratified_sample_pct(
            docs, "lang", "doc_id", _SAMPLE_RATES, _SAMPLE_DEFAULT
        )
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


O_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang, source
FROM (
  SELECT doc_id, lang, source,
         CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
              AS BIGINT) % 100 AS b
  FROM documents
)
WHERE b < (CASE WHEN lang = 'en' THEN {_SAMPLE_RATES["en"]}
                ELSE {_SAMPLE_DEFAULT} END)
ORDER BY doc_id
"""

# --- PII-style redaction: digit runs collapse to a placeholder, with an
# audit count of redactions.  customer names carry the digit runs in
# this corpus; the same operator applies to any text column.  DuckDB's
# regexp_replace needs the 'g' flag for replace-all (Spark's default).


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    return (
        cust.select(
            "c_custkey",
            T.mask_digits("c_name").alias("masked_name"),
            T.digit_run_count("c_name").alias("n_digit_runs"),
        )
        .filter(F.col("n_digit_runs") > 0)
        .orderBy("c_custkey")
    )


O_PII_REDACT = """
SELECT c_custkey,
       regexp_replace(c_name, '[0-9]+', '<NUM>', 'g') AS masked_name,
       CAST(len(regexp_extract_all(c_name, '[0-9]+')) AS BIGINT)
         AS n_digit_runs
FROM customer
WHERE len(regexp_extract_all(c_name, '[0-9]+')) > 0
ORDER BY c_custkey
"""

# --- eval-set contamination detection: count each training doc's
# distinct 5-gram collisions with a benchmark set (docs 0-9 stand in for
# the held-out eval corpus).  The benchmark shingle set is tiny ->
# broadcast; the corpus side is a map-side shingle explode + one
# doc-keyed agg — never a corpus self-join.  At 100 TB the benchmark set
# is the real eval suite loaded as a side table.

_CONTAM_N = 5
_BENCH_MAX_ID = 10


def q_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from foglamp_filter_python35_spark.functions.dedup import (  # noqa: PLC0415
        shingles,
    )

    docs = load(spark, sf_dir, "documents")
    sh = shingles(docs, "doc_id", "text", n=_CONTAM_N)
    bench = (
        sh.filter(F.col("doc_id") < _BENCH_MAX_ID)
        .select("shingle")
        .distinct()
    )
    corpus = sh.filter(F.col("doc_id") >= _BENCH_MAX_ID)
    totals = corpus.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_doc_shingles")
    )
    hits = (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_contaminated"))
    )
    return (
        hits.join(totals, "doc_id")
        .select(
            "doc_id",
            "n_contaminated",
            "n_doc_shingles",
            (
                F.col("n_contaminated").cast("double")
                / F.col("n_doc_shingles")
            ).alias("contamination_ratio"),
        )
        .orderBy("doc_id")
    )


# shingle concat generated from _CONTAM_N — a hard-coded token list
# would silently desynchronize the oracle if the constant changes (the
# same rule _minhash_pairs_sql follows for its band selects)
_CONTAM_CONCAT = " || ' ' || ".join(
    f"ts[i+{j}]" if j else "ts[i]" for j in range(_CONTAM_N)
)

O_BENCHMARK_CONTAMINATION = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(ts) - {_CONTAM_N - 2}),
                i -> {_CONTAM_CONCAT}))) AS shingle
  FROM toks WHERE len(ts) >= {_CONTAM_N}
),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < {_BENCH_MAX_ID}),
corpus AS (SELECT * FROM sh WHERE doc_id >= {_BENCH_MAX_ID}),
totals AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_doc_shingles
  FROM corpus GROUP BY doc_id
),
hits AS (
  SELECT c.doc_id, CAST(COUNT(DISTINCT c.shingle) AS BIGINT)
           AS n_contaminated
  FROM corpus c JOIN bench USING (shingle)
  GROUP BY c.doc_id
)
SELECT h.doc_id, n_contaminated, n_doc_shingles,
       CAST(n_contaminated AS DOUBLE) / n_doc_shingles
         AS contamination_ratio
FROM hits h JOIN totals t ON h.doc_id = t.doc_id
ORDER BY h.doc_id
"""

# --- intra-document repetition score (Gopher-style quality signal):
# 1 - distinct_bigrams / total_bigrams.  Pure array expressions —
# map-side, shuffle-free; integer counts divide once in double, so the
# score is bit-deterministic.


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from foglamp_filter_python35_spark.functions.dedup import (  # noqa: PLC0415
        word_ngrams,
    )

    docs = load(spark, sf_dir, "documents")
    # tokens MUST be a projected column, not an inline split(): Spark
    # does not CSE inside higher-order-function lambdas, so an inlined
    # split re-executes per array element (measured ~3x faster here)
    toks = docs.select("doc_id", F.split("text", " ").alias("_ts"))
    base = toks.select(
        "doc_id",
        (F.size("_ts") - 1).cast("bigint").alias("n_bigrams"),
        F.size(word_ngrams("_ts", 2)).cast("bigint").alias(
            "n_distinct_bigrams"
        ),
    ).filter(F.col("n_bigrams") >= 1)
    return base.select(
        "doc_id",
        "n_bigrams",
        "n_distinct_bigrams",
        (
            F.lit(1.0)
            - F.col("n_distinct_bigrams").cast("double")
            / F.col("n_bigrams")
        ).alias("rep_ratio"),
    ).orderBy("doc_id")


O_DOC_REPETITION = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
SELECT doc_id,
       CAST(len(ts) - 1 AS BIGINT) AS n_bigrams,
       CAST(len(list_distinct(list_transform(range(1, len(ts)),
              i -> ts[i] || ' ' || ts[i+1]))) AS BIGINT)
         AS n_distinct_bigrams,
       1.0 - CAST(len(list_distinct(list_transform(range(1, len(ts)),
              i -> ts[i] || ' ' || ts[i+1]))) AS DOUBLE) / (len(ts) - 1)
         AS rep_ratio
FROM t
WHERE len(ts) - 1 >= 1
ORDER BY doc_id
"""

# --- X4b: BPE-style pre-tokenization counts — the GPT-2 pre-tokenizer
# split classes (letter runs | digit runs | single non-alphanumeric) as
# a portable regex evaluated identically by Java regex and RE2, giving
# the token-budget accounting a real tokenizer would produce (letter
# runs then subword-merge; the run count is the lower bound and the
# budget planners' standard proxy).  Pure map + one aggregate row.

_PRETOK = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def q_pretokenize_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    low = F.lower("text")
    return (
        docs.select(
            "doc_id",
            F.size(F.expr(f"regexp_extract_all(lower(text), '{_PRETOK}', 0)"))
            .cast("bigint")
            .alias("n_pretokens"),
            F.size(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            )
            .cast("bigint")
            .alias("n_alpha_runs"),
            F.size(
                F.expr("regexp_extract_all(lower(text), '[0-9]+', 0)")
            )
            .cast("bigint")
            .alias("n_digit_runs"),
            F.octet_length(low).cast("bigint").alias("n_bytes"),
        )
        .orderBy("doc_id")
    )


O_PRETOKENIZE_COUNTS = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '{_PRETOK}')) AS BIGINT)
         AS n_pretokens,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT)
         AS n_alpha_runs,
       CAST(len(regexp_extract_all(lower(text), '[0-9]+')) AS BIGINT)
         AS n_digit_runs,
       CAST(octet_length(encode(lower(text))) AS BIGINT) AS n_bytes
FROM documents
ORDER BY doc_id
"""


# --- G70b: top-bigram dominance (the Gopher repetition rule family's
# "fraction of characters in the most common n-gram" sibling, counted
# over bigram occurrences).  A doc whose single most frequent bigram
# covers > threshold of all its bigrams is boilerplate/template text
# that G47's distinct-ratio can miss (one dominant phrase, many unique
# fillers).  Plan: explode bigrams -> (doc, bigram) partial+final count
# -> per-doc max/sum agg.  Two shuffles, both with map-side combine;
# integer counts are exact, the final division is one IEEE op.

_TOP_BIGRAM_THRESHOLD = 0.2


def q_top_bigram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("_ts"))
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(_ts, 1, size(_ts) - 1), "
                "(x, i) -> concat(x, ' ', _ts[i + 1]))"
            )
        ).alias("bigram"),
    )
    counts = bigrams.groupBy("doc_id", "bigram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_bigrams"),
            F.max("cnt").cast("bigint").alias("top_count"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "top_count",
            (
                F.col("top_count").cast("double") / F.col("n_bigrams")
            ).alias("top_fraction"),
            (
                F.col("top_count").cast("double") / F.col("n_bigrams")
                > F.lit(_TOP_BIGRAM_THRESHOLD)
            ).alias("repetitive"),
        )
        .orderBy("doc_id")
    )


O_TOP_BIGRAM_FRACTION = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ts)),
                               i -> ts[i] || ' ' || ts[i+1])) AS bigram
  FROM t),
counts AS (
  SELECT doc_id, bigram, COUNT(*) AS cnt FROM bg GROUP BY doc_id, bigram)
SELECT doc_id,
       CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
       CAST(MAX(cnt) AS BIGINT) AS top_count,
       CAST(MAX(cnt) AS DOUBLE) / SUM(cnt) AS top_fraction,
       CAST(MAX(cnt) AS DOUBLE) / SUM(cnt) > {_TOP_BIGRAM_THRESHOLD}
         AS repetitive
FROM counts
GROUP BY doc_id
ORDER BY doc_id
"""


# --- G88: log2-bucketed document-length histogram -------------------------
# Sequence-length distribution for packing/curriculum planning: documents
# bucketed by floor(log2(token_count)) — the bucket boundaries a packing
# planner (G73) and a context-length budget actually care about.  Pure
# integer arithmetic end-to-end (bucket = digits of bin(n), counts and
# sums are BIGINT), so the oracle is bit-trivial; one map-side bucket
# column + one tiny hash agg — scan-bound at any corpus size.


def q_doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(T.token_count("text").alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
        # digits of the binary representation == floor(log2(n)) + 1:
        # integer-exact log bucketing with no transcendental functions
        # (the repo's no-ln cross-engine policy)
        .withColumn("bucket", F.length(F.bin("n_tokens")).cast("bigint"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("bucket")
    )


O_DOC_LENGTH_HISTOGRAM = """
WITH t AS (
  SELECT CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents)
SELECT CAST(length(bin(n_tokens)) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
       CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
FROM t
WHERE n_tokens > 0
GROUP BY bucket
ORDER BY bucket
"""


# --- G102: tokenizer fertility / vocabulary economy per language ---------
# The tokenizer-QA table every multilingual training run consults:
# characters per token (fertility — how many chars one token "buys",
# the cost driver for context-window budgeting) and type-token ratio
# (vocabulary economy) per language.  All ratios are single divisions
# of exact integer totals, so they are engine-deterministic without
# quantization.  Scale: the totals agg is map-side partial; the
# distinct-token count is one (lang, token) shuffle — the classic
# two-stage distinct whose key space is the vocabulary, not the corpus.


def q_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    totals = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(T.token_count("text")).alias("n_tokens"),
        F.sum(F.length("text")).alias("n_chars"),
    )
    vocab = (
        docs.select("lang", F.explode(T.tokens("text")).alias("tok"))
        .groupBy("lang")
        .agg(F.countDistinct("tok").alias("n_distinct"))
    )
    return (
        totals.join(F.broadcast(vocab), "lang")
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "n_chars",
            "n_distinct",
            (
                F.col("n_chars").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("chars_per_token"),
            (
                F.col("n_distinct").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("type_token_ratio"),
        )
        .orderBy("lang")
    )


O_TOKEN_FERTILITY = """
WITH totals AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         CAST(SUM(length(text)) AS BIGINT) AS n_chars
  FROM documents GROUP BY lang),
vocab AS (
  SELECT lang, CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY lang)
SELECT lang, n_docs, n_tokens, n_chars, n_distinct,
       CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS chars_per_token,
       CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)
         AS type_token_ratio
FROM totals JOIN vocab USING (lang)
ORDER BY lang
"""


SPECS = [
    QuerySpec("text_stats", q_text_stats, O_TEXT_STATS, headline=True),
    QuerySpec("token_fertility", q_token_fertility, O_TOKEN_FERTILITY),
    QuerySpec("quality_score", q_quality_score, O_QUALITY_SCORE),
    QuerySpec("language_id", q_language_id, O_LANGUAGE_ID),
    QuerySpec("token_count_total", q_token_count_total, O_TOKEN_COUNT_TOTAL, headline=True),
    QuerySpec("doc_fingerprint", q_doc_fingerprint, O_DOC_FINGERPRINT),
    QuerySpec("tfidf_top_terms", q_tfidf_top_terms, O_TFIDF_TOP_TERMS),
    QuerySpec("bigram_topk", q_bigram_topk, O_BIGRAM_TOPK),
    QuerySpec("train_test_split", q_train_test_split, O_TRAIN_TEST_SPLIT),
    QuerySpec("doc_chunking", q_doc_chunking, O_DOC_CHUNKING),
    QuerySpec("lang_mismatch", q_lang_mismatch, O_LANG_MISMATCH),
    QuerySpec("corpus_prefilter", q_corpus_prefilter, O_CORPUS_PREFILTER),
    QuerySpec("stratified_sample", q_stratified_sample, O_STRATIFIED_SAMPLE),
    QuerySpec("pii_redact", q_pii_redact, O_PII_REDACT),
    QuerySpec(
        "benchmark_contamination",
        q_benchmark_contamination,
        O_BENCHMARK_CONTAMINATION,
    ),
    QuerySpec("doc_repetition", q_doc_repetition, O_DOC_REPETITION),
    QuerySpec(
        "top_bigram_fraction", q_top_bigram_fraction, O_TOP_BIGRAM_FRACTION
    ),
    QuerySpec(
        "pretokenize_counts", q_pretokenize_counts, O_PRETOKENIZE_COUNTS
    ),
    QuerySpec(
        "doc_length_histogram", q_doc_length_histogram, O_DOC_LENGTH_HISTOGRAM
    ),
]
