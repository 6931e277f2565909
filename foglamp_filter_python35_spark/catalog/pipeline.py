"""LLM-corpus pipeline operators, round 2 additions (SURVEY.md §2.6 G49+).

Seven training-data-preparation shapes a 100 TB corpus run needs beyond the
dedup/similarity core: per-domain quota sampling, incremental (new-batch vs
corpus) dedup, hopping-window rates, BM25-style keyword retrieval, bigram
association mining (PMI lift), text normalization, and conversion-latency
quantiles.  All Catalyst-native — no Python workers anywhere in this module.

Cross-engine float policy: BM25 and PMI deliberately use *rational* weights
(no ``ln``) because transcendental functions are not bit-reproducible
between the JVM and DuckDB's libm, while +,-,*,/ are IEEE-754
exact-rounded and deterministic.  Rational idf ``(N-df+.5)/(df+.5)`` and
PMI lift ``P(ab)/(P(a)P(b))`` are strictly monotone in the textbook
``ln``-scores, so rankings are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from foglamp_filter_python35_spark.catalog import (
    QuerySpec,
    dsum,
    load,
    o_dsum,
    o_dsum_expr,
    o_ordstat_quantile,
    ordstat_quantile,
)
from foglamp_filter_python35_spark.functions import cache
from foglamp_filter_python35_spark.functions import text as T

# DuckDB twin of functions.text.fingerprint — kept in ONE place here so the
# incremental-dedup oracle cannot drift from the Spark fingerprint.
_FP_SQL = (
    "md5(array_to_string(list_filter("
    "string_split_regex(lower(text), '\\s+'), t -> t <> ''), ' '))"
)


# --- G49: per-domain quota sampling -------------------------------------
# Cap the number of documents any one source/domain contributes, picked
# deterministically by md5(doc_id) so reruns select the same rows.
#
# Exact two-phase trim so a pathologically hot domain never funnels its
# full row set through one reducer (the salted-aggregation idea applied
# to a windowed rank): phase 1 ranks within (source, salt) subgroups —
# a row kept by the global trim has global rank <= quota, and its rank
# inside any subgroup can only be smaller, so subgroup-rank <= quota is
# a provable superset of the final keep set — then phase 2 runs the
# exact per-source trim over at most SALT x quota survivors per domain.
# Phase 1 spreads a hot domain over SALT tasks; phase 2's per-task input
# is bounded by SALT x quota rows per source regardless of skew.  Ranks
# are unchanged: every row ordered before a keeper is itself a keeper,
# so the survivor set preserves each keeper's global rank.

_DOMAIN_QUOTA = 10
_QUOTA_SALT = 32


def q_domain_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return quota_sample(docs, _DOMAIN_QUOTA)


def quota_sample(docs: DataFrame, quota: int, salt: int = _QUOTA_SALT) -> DataFrame:
    w1 = Window.partitionBy("source", "salt").orderBy("pick_key", "doc_id")
    w2 = Window.partitionBy("source").orderBy("pick_key", "doc_id")
    return (
        docs.select(
            "doc_id",
            "source",
            F.md5(F.col("doc_id").cast("string")).alias("pick_key"),
            F.pmod(F.hash("doc_id"), F.lit(salt)).alias("salt"),
        )
        .withColumn("salt_rank", F.row_number().over(w1))
        .filter(F.col("salt_rank") <= quota)
        .withColumn("pick_rank", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("pick_rank") <= quota)
        .select("doc_id", "source", "pick_rank")
    )


O_DOMAIN_QUOTA_SAMPLE = f"""
SELECT doc_id, source, pick_rank FROM (
  SELECT doc_id, source,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
           AS pick_rank
  FROM documents)
WHERE pick_rank <= {_DOMAIN_QUOTA}
"""


# --- G50: incremental dedup (new batch vs existing corpus) ---------------
# The steady-state ingest shape: only documents whose fingerprint is NOT
# already in the corpus survive.  Modeled here by a deterministic 80/20
# doc_id split standing in for corpus/incoming.  At scale this is a
# shuffle hash ANTI join on the 16-byte fingerprint; bucketing the stored
# corpus fingerprints by fp makes the recurring join shuffle-free on the
# corpus side (only the small incoming batch moves).


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", T.fingerprint("text").alias("fingerprint")
    )
    corpus = (
        docs.filter(F.col("doc_id") % 10 < 8).select("fingerprint").distinct()
    )
    incoming = docs.filter(F.col("doc_id") % 10 >= 8)
    return incoming.join(corpus, "fingerprint", "left_anti").select(
        "doc_id", "fingerprint"
    )


O_INCREMENTAL_DEDUP = f"""
WITH fps AS (SELECT doc_id, {_FP_SQL} AS fingerprint FROM documents)
SELECT i.doc_id, i.fingerprint
FROM fps i
WHERE i.doc_id % 10 >= 8
  AND NOT EXISTS (SELECT 1 FROM fps c
                  WHERE c.doc_id % 10 < 8
                    AND c.fingerprint = i.fingerprint)
"""


# --- G51: hopping-window rates (2 h window, 1 h slide) -------------------
# Structured Streaming's hopping window in its batch twin: every event
# lands in exactly two windows (width/slide = 2), so the oracle unnests
# the two window starts per event.  Spark aligns hop windows to the epoch,
# i.e. starts are exactly date_trunc('hour', ts) and that minus 1 h.
# Map-side partial aggregation halves the shuffle; the shuffle key is
# (window, event_type).


def q_sliding_window_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "total_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


O_SLIDING_WINDOW_RATE = f"""
WITH hits AS (
  SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                 date_trunc('hour', ts)]) AS w_start,
         event_type, value
  FROM events)
SELECT w_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {o_dsum("value", "total_value")}
FROM hits
GROUP BY w_start, event_type
"""


# --- G51b: hopping-window distinct users --------------------------------
# The distinct-count twin of the hopping-window rates: unique users per
# 2 h window sliding 1 h.  COUNT(DISTINCT) inside a window aggregate is
# the expensive exact form (two-phase distinct shuffle); the documented
# 100 TB swap is approx_count_distinct (HLL, one pass, mergeable
# sketches) at the cost of oracle exactness.


def q_sliding_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from foglamp_filter_python35_spark.catalog import (  # noqa: PLC0415
        approx_enabled,
    )

    ev = load(spark, sf_dir, "events")
    distinct = (
        F.approx_count_distinct("user_id")
        if approx_enabled()
        else F.countDistinct("user_id")
    )
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(distinct.alias("n_users"))
        .select(F.col("w.start").alias("w_start"), "n_users")
    )


O_SLIDING_UNIQUE_USERS = """
WITH hits AS (
  SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                 date_trunc('hour', ts)]) AS w_start,
         user_id
  FROM events)
SELECT w_start, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM hits
GROUP BY w_start
"""


# --- G52: BM25-style keyword retrieval ----------------------------------
# Top-k documents for a fixed keyword query.  Corpus stats (N, avgdl, per-
# term df) are ONE aggregate row broadcast to every scorer task, so the
# whole query is scan + one tiny agg + map-side scoring + TakeOrdered:
# no per-term shuffle, 100 TB-safe.  k1 = 1.2, b = 0.75; idf is the
# rational (N-df+0.5)/(df+0.5) — see module docstring for why no ln.

_BM25_TERMS = ("table", "scan", "merge")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20


def q_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", T.tokens("text").alias("toks")
    )
    docs = docs.withColumn("dl", F.size("toks").cast("double"))
    stats = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        # integer lengths sum exactly as BIGINT -> deterministic avgdl
        F.sum(F.size("toks").cast("bigint"))
        .cast("double")
        .alias("sum_dl"),
        *[
            F.sum(
                F.when(F.array_contains("toks", t), 1).otherwise(0)
            )
            .cast("double")
            .alias(f"df_{i}")
            for i, t in enumerate(_BM25_TERMS)
        ],
    )
    scored = docs.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl") / F.col("n_docs")
    k1, b = _BM25_K1, _BM25_B
    score = F.lit(0.0)
    for i, t in enumerate(_BM25_TERMS):
        tf = F.size(F.filter("toks", lambda x: x == F.lit(t))).cast("double")  # noqa: B023
        idf = (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (
            F.col(f"df_{i}") + 0.5
        )
        denom = tf + k1 * ((1.0 - b) + b * (F.col("dl") / avgdl))
        score = score + idf * ((tf * (k1 + 1.0)) / denom)
    return (
        scored.select("doc_id", score.alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id"))
        .limit(_BM25_TOPK)
    )


def _o_bm25_term(i: int, t: str) -> str:
    k1, b = _BM25_K1, _BM25_B
    tf = f"CAST(len(list_filter(toks, x -> x = '{t}')) AS DOUBLE)"
    idf = f"((n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
    denom = f"({tf} + {k1} * (({1.0 - b}) + {b} * (dl / (sum_dl / n_docs))))"
    return f"({idf} * (({tf} * {k1 + 1.0}) / {denom}))"


O_BM25_RETRIEVAL = f"""
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
  FROM documents),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         CAST(SUM(CAST(len(toks) AS BIGINT)) AS DOUBLE) AS sum_dl,
         {", ".join(
             f"CAST(SUM(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 "
             f"END) AS DOUBLE) AS df_{i}"
             for i, t in enumerate(_BM25_TERMS)
         )}
  FROM docs)
SELECT doc_id,
       (0.0 + {" + ".join(_o_bm25_term(i, t) for i, t in enumerate(_BM25_TERMS))})
         AS bm25
FROM docs CROSS JOIN stats
ORDER BY bm25 DESC, doc_id
LIMIT {_BM25_TOPK}
"""


# --- G53: bigram association mining (PMI lift) ---------------------------
# Which token pairs co-occur far above chance — collocation discovery for
# tokenizer/quality audits.  lift = P(ab) / (P(a) P(b)), the exact
# exponential of textbook PMI, computed with the identical parenthesization
# on both engines.  Two hash aggs (unigrams, bigrams) + two joins on token;
# at 100 TB the unigram side is vocabulary-sized and AQE broadcasts it.

_PMI_MIN_COUNT = 5
_PMI_TOPK = 20


def q_token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.split("text", " ").alias("_ts")).filter(
        F.size("_ts") >= 2
    )
    # raw (non-distinct) adjacent pairs — PMI needs occurrence counts
    pairs = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("_ts") - 1),
                lambda i: F.struct(
                    F.element_at("_ts", i).alias("w1"),
                    F.element_at("_ts", i + 1).alias("w2"),
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    uni = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c_u"))
    )
    bi = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= _PMI_MIN_COUNT)
    )
    totals = pairs.agg(
        F.count(F.lit(1)).cast("double").alias("t_b")
    ).crossJoin(
        F.broadcast(uni.agg(F.sum("c_u").cast("double").alias("t_u")))
    )
    u1 = uni.select(
        F.col("token").alias("w1"), F.col("c_u").alias("c_a")
    )
    u2 = uni.select(
        F.col("token").alias("w2"), F.col("c_u").alias("c_b")
    )
    lift = (F.col("c_ab").cast("double") / F.col("t_b")) / (
        (F.col("c_a").cast("double") / F.col("t_u"))
        * (F.col("c_b").cast("double") / F.col("t_u"))
    )
    return (
        bi.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            F.col("c_ab").alias("pair_count"),
            lift.alias("lift"),
        )
        .orderBy(F.col("lift").desc(), F.col("bigram"))
        .limit(_PMI_TOPK)
    )


O_TOKEN_PMI = f"""
WITH toks AS (
  SELECT string_split(text, ' ') AS ts FROM documents
  WHERE len(string_split(text, ' ')) >= 2),
pairs AS (
  SELECT unnest(list_transform(range(1, len(ts)),
                i -> {{'w1': ts[i], 'w2': ts[i+1]}})) AS p
  FROM toks),
flat AS (SELECT p.w1 AS w1, p.w2 AS w2 FROM pairs),
uni AS (
  SELECT token, COUNT(*) AS c_u
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token),
bi AS (
  SELECT w1, w2, COUNT(*) AS c_ab FROM flat GROUP BY w1, w2
  HAVING COUNT(*) >= {_PMI_MIN_COUNT}),
totals AS (
  SELECT CAST((SELECT COUNT(*) FROM flat) AS DOUBLE) AS t_b,
         CAST((SELECT SUM(c_u) FROM uni) AS DOUBLE) AS t_u)
SELECT bi.w1 || ' ' || bi.w2 AS bigram,
       bi.c_ab AS pair_count,
       ((CAST(bi.c_ab AS DOUBLE) / t_b)
        / ((CAST(u1.c_u AS DOUBLE) / t_u)
           * (CAST(u2.c_u AS DOUBLE) / t_u))) AS lift
FROM bi
JOIN uni u1 ON u1.token = bi.w1
JOIN uni u2 ON u2.token = bi.w2
CROSS JOIN totals
ORDER BY lift DESC, bigram
LIMIT {_PMI_TOPK}
"""


# --- G54: text normalization --------------------------------------------
# Canonical form for downstream dedup/tokenization: lowercase, collapse
# whitespace runs, trim.  Pure map — scan-bound, shuffle-free, pushdown
# keeps it a two-column read.


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower("text"), "\\s+", " "))
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.when(norm != F.col("text"), 1).otherwise(0)
        .cast("bigint")
        .alias("changed"),
        (F.length("text") - F.length(norm)).cast("bigint").alias("chars_saved"),
    )


O_TEXT_NORMALIZE = r"""
WITH n AS (
  SELECT doc_id, text,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm_text
  FROM documents)
SELECT doc_id, norm_text,
       CAST(CASE WHEN norm_text <> text THEN 1 ELSE 0 END AS BIGINT)
         AS changed,
       CAST(LENGTH(text) - LENGTH(norm_text) AS BIGINT) AS chars_saved
FROM n
"""


# --- G55: conversion-latency quantiles ----------------------------------
# How long after first signup does the first (post-signup) purchase land.
# Complements event_funnel (which counts conversions) with the latency
# distribution.  One user-keyed shuffle, then a single-row quantile agg;
# at 100 TB swap the exact quantiles for approx_percentile and keep the
# identical plan shape.  Quantiles use rank-selected order statistics
# (`ordstat_quantile`) so p50/p90 are bit-identical across engines
# (r3 ADVICE: percentile()/quantile_cont() interpolation is not
# contractually the same parenthesization).


def q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per_user = (
        ev.filter(F.col("event_type").isin("signup", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "signup", F.col("ts"))
            ).alias("first_signup"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("first_purchase"),
        )
    )
    lat = per_user.filter(
        F.col("first_signup").isNotNull()
        & (F.col("first_purchase") >= F.col("first_signup"))
    ).select(
        (
            F.unix_micros("first_purchase") - F.unix_micros("first_signup")
        ).alias("lat_us")
    )
    from foglamp_filter_python35_spark.catalog import (  # noqa: PLC0415
        approx_enabled,
    )

    if approx_enabled():
        return lat.agg(
            F.count(F.lit(1)).alias("n_converted"),
            F.approx_percentile("lat_us", 0.5, 10_000)
            .cast("double")
            .alias("p50_us"),
            F.approx_percentile("lat_us", 0.9, 10_000)
            .cast("double")
            .alias("p90_us"),
        )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.sort_array(F.collect_list("lat_us")).alias("s"),
    ).select(
        "n_converted",
        ordstat_quantile("s", "n_converted", 0.5).alias("p50_us"),
        ordstat_quantile("s", "n_converted", 0.9).alias("p90_us"),
    )


O_CONVERSION_LATENCY = f"""
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events
  WHERE event_type IN ('signup', 'purchase')
  GROUP BY user_id),
lat AS (
  SELECT CAST(epoch_us(first_purchase) - epoch_us(first_signup) AS BIGINT)
           AS lat_us
  FROM per_user
  WHERE first_signup IS NOT NULL AND first_purchase >= first_signup),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
         list_sort(list(lat_us)) AS s
  FROM lat)
SELECT n_converted,
       {o_ordstat_quantile('s', 'n_converted', 0.5)} AS p50_us,
       {o_ordstat_quantile('s', 'n_converted', 0.9)} AS p90_us
FROM agg
"""


# --- G59: weighted deterministic sampling --------------------------------
# Sample documents with probability proportional to a per-row weight
# (here: length saturating at 400 chars), as a PURE map-side predicate:
# md5 of the id gives a uniform u in [0,1), keep iff u < weight.  No
# sampling state, no shuffle, reproducible across runs and engines —
# rebalancing a 100 TB corpus is a filter.

_WSAMPLE_MOD = 1_000_000


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    u = T.md5_bucket("doc_id", _WSAMPLE_MOD).cast("double") / _WSAMPLE_MOD
    weight = F.least(F.col("n_chars").cast("double") / 400.0, F.lit(1.0))
    return docs.filter(u < weight).select(
        "doc_id", "source", weight.alias("weight")
    )


O_WEIGHTED_SAMPLE = f"""
SELECT doc_id, source,
       LEAST(CAST(n_chars AS DOUBLE) / 400.0, 1.0) AS weight
FROM (
  SELECT *,
         CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
              AS BIGINT) % {_WSAMPLE_MOD} AS DOUBLE) / {_WSAMPLE_MOD} AS u
  FROM documents)
WHERE u < LEAST(CAST(n_chars AS DOUBLE) / 400.0, 1.0)
"""


# --- G60: per-source language-mix impurity (Gini) ------------------------
# Corpus-composition QA: how language-pure each source is.  Gini impurity
# 1 - sum(p^2) instead of entropy because ln() is not bit-reproducible
# across engines while +,*,/ are; shares are exact integer ratios and the
# sum over languages uses the decimal trick for order-independence.


def q_lang_mix_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("source").agg(F.sum("n").alias("tot"))
    p2 = (
        counts.join(totals, "source")
        .select(
            "source",
            "tot",
            (
                (F.col("n").cast("double") / F.col("tot"))
                * (F.col("n").cast("double") / F.col("tot"))
            ).alias("p2"),
        )
    )
    return (
        p2.groupBy("source")
        .agg(
            F.max("tot").cast("bigint").alias("n_docs"),
            (1.0 - F.sum(F.col("p2").cast("decimal(38,12)")).cast("double"))
            .alias("gini"),
        )
        .orderBy("source")
    )


O_LANG_MIX_GINI = """
WITH counts AS (
  SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY source, lang),
tot AS (SELECT source, SUM(n) AS tot FROM counts GROUP BY source)
SELECT c.source,
       CAST(MAX(t.tot) AS BIGINT) AS n_docs,
       1.0 - CAST(SUM(CAST(
           (CAST(n AS DOUBLE) / t.tot) * (CAST(n AS DOUBLE) / t.tot)
         AS DECIMAL(38,12))) AS DOUBLE) AS gini
FROM counts c JOIN tot t ON c.source = t.source
GROUP BY c.source
ORDER BY c.source
"""


# --- G61: duplicate rate by source ---------------------------------------
# Which domains ship copy-paste: share of each source's docs whose exact
# fingerprint occurs more than once corpus-wide.  One shuffle on the
# fingerprint for the counts, one on source for the report.


def q_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", T.fingerprint("text").alias("fp")
    )
    fp_counts = docs.groupBy("fp").agg(F.count(F.lit(1)).alias("n_fp"))
    return (
        docs.join(fp_counts, "fp")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("n_fp") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_docs"),
            (
                F.sum(F.when(F.col("n_fp") > 1, 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


O_DUP_RATE_BY_SOURCE = f"""
WITH fps AS (SELECT doc_id, source, {_FP_SQL} AS fp FROM documents),
fc AS (SELECT fp, COUNT(*) AS n_fp FROM fps GROUP BY fp)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_fp > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_docs,
       CAST(SUM(CASE WHEN n_fp > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS dup_rate
FROM fps JOIN fc USING (fp)
GROUP BY source
ORDER BY source
"""


# --- G62: train/test split-leakage audit ---------------------------------
# Split hygiene: exact-duplicate content that lands on both sides of the
# md5 train/test split leaks evaluation data into training.  Composes the
# deterministic hash split with content fingerprints; one fingerprint
# shuffle (semi-join of test fps against train fps).


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        T.fingerprint("text").alias("fp"),
        T.hash_split("doc_id").alias("split"),
    )
    train_fps = docs.filter(F.col("split") == "train").select("fp").distinct()
    test_docs = docs.filter(F.col("split") == "test")
    leaked = test_docs.join(train_fps, "fp", "left_semi")
    return leaked.agg(
        F.countDistinct("fp").alias("n_leaked_fingerprints"),
        F.count(F.lit(1)).alias("n_test_docs_leaked"),
    )


O_SPLIT_LEAKAGE = f"""
WITH fps AS (
  SELECT doc_id, {_FP_SQL} AS fp,
         CASE WHEN b < 80 THEN 'train'
              WHEN b < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT *,
               CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                    AS BIGINT) % 100 AS b
        FROM documents)),
leaked AS (
  SELECT t.fp
  FROM fps t
  WHERE t.split = 'test'
    AND EXISTS (SELECT 1 FROM fps tr
                WHERE tr.split = 'train' AND tr.fp = t.fp))
SELECT CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_leaked_fingerprints,
       CAST(COUNT(*) AS BIGINT) AS n_test_docs_leaked
FROM leaked
"""


# --- G63: top-K vocabulary coverage --------------------------------------
# Tokenizer planning: what fraction of all token OCCURRENCES the K most
# frequent types cover.  Two hash aggs; the top-K vocab is a broadcast
# semi-join against token counts.  All-integer arithmetic until the one
# final division.

_VOCAB_K = 100


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(F.explode(T.tokens("text")).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    topk = counts.orderBy(
        F.col("c").desc(), F.col("token")
    ).limit(_VOCAB_K)
    covered = topk.agg(F.sum("c").alias("cov"))
    total = counts.agg(F.sum("c").alias("tot"))
    return covered.crossJoin(F.broadcast(total)).select(
        F.lit(_VOCAB_K).cast("bigint").alias("k"),
        F.col("cov").cast("bigint").alias("covered_occurrences"),
        F.col("tot").cast("bigint").alias("total_occurrences"),
        (F.col("cov").cast("double") / F.col("tot")).alias("coverage"),
    )


O_VOCAB_COVERAGE = f"""
WITH counts AS (
  SELECT token, COUNT(*) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token),
topk AS (SELECT c FROM counts ORDER BY c DESC, token LIMIT {_VOCAB_K})
SELECT CAST({_VOCAB_K} AS BIGINT) AS k,
       CAST((SELECT SUM(c) FROM topk) AS BIGINT) AS covered_occurrences,
       CAST((SELECT SUM(c) FROM counts) AS BIGINT) AS total_occurrences,
       CAST((SELECT SUM(c) FROM topk) AS DOUBLE)
         / (SELECT SUM(c) FROM counts) AS coverage
"""


# --- G64: per-doc n-gram novelty -----------------------------------------
# Boilerplate detector's twin: the share of a document's distinct
# shingles that appear NOWHERE else in the corpus (df == 1).  Low novelty
# = templated/boilerplate content.  Reuses the shingle DF aggregate; the
# per-doc report joins shingles to their df on the same key the count
# shuffled on.


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from foglamp_filter_python35_spark.functions.dedup import (  # noqa: PLC0415
        shingles,
    )

    from pyspark.sql import Window  # noqa: PLC0415

    docs = load(spark, sf_dir, "documents")
    sh = shingles(docs, "doc_id", "text", 3)
    # per-shingle document frequency as ONE window over ONE shingle
    # exchange instead of groupBy + join-back (r18, the same
    # restructure _df_pruned_and_stats got in r17): the join re-shuffled
    # the full shingle stream a second time, and the skew probe
    # (SCALE.md r18) measured the join-back shape degrading
    # superlinearly under a hot shingle while the window stays linear.
    # _df per row is identical, so the aggregates are bit-identical.
    shdf = sh.withColumn(
        "_df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    )
    return (
        shdf.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("_df") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_unique"),
            (
                F.sum(F.when(F.col("_df") == 1, 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


O_NGRAM_NOVELTY = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(ts) - 1),
                i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS shingle
  FROM toks WHERE len(ts) >= 3),
dfc AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS novelty
FROM sh JOIN dfc USING (shingle)
GROUP BY doc_id
ORDER BY doc_id
"""


# --- G65: end-to-end corpus pipeline (composition) -----------------------
# The operators composed as one plan, the way a real pre-training run
# chains them: normalize -> fingerprint on the NORMALIZED text ->
# keep-canonical exact dedup (min doc_id per fingerprint) -> length gate
# -> deterministic split -> per-split accounting.  One fingerprint
# shuffle (the dedup window) + one split agg; everything else is
# map-side.  Composability is the point: each stage is the same
# expression the standalone operator uses, so Catalyst fuses the chain
# into scan -> window -> agg.

_E2E_MIN_TOKENS = 20


def q_corpus_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower("text"), "\\s+", " "))
    staged = docs.select(
        "doc_id", "source", norm.alias("norm_text")
    ).withColumn("fp", F.md5("norm_text"))
    w = Window.partitionBy("fp")
    canonical = (
        staged.withColumn("keeper", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("keeper"))
    )
    gated = canonical.filter(
        F.size(F.split("norm_text", " ")) >= _E2E_MIN_TOKENS
    )
    return (
        gated.select(
            T.hash_split("doc_id").alias("split"),
            "source",
            F.length("norm_text").alias("n_chars"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("split")
    )


O_CORPUS_PIPELINE_E2E = f"""
WITH staged AS (
  SELECT doc_id, source,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm_text,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
  FROM documents),
canonical AS (
  SELECT * FROM (
    SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS keeper FROM staged)
  WHERE doc_id = keeper),
gated AS (
  SELECT * FROM canonical
  WHERE len(string_split(norm_text, ' ')) >= {_E2E_MIN_TOKENS}),
labeled AS (
  SELECT CASE WHEN b < 80 THEN 'train'
              WHEN b < 90 THEN 'val'
              ELSE 'test' END AS split,
         source, LENGTH(norm_text) AS n_chars
  FROM (SELECT *,
               CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                    AS BIGINT) % 100 AS b
        FROM gated))
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM labeled
GROUP BY split
ORDER BY split
"""


# --- G66: full-outer reconciliation --------------------------------------
# The audit join shape: two per-user aggregates FULL OUTER joined so
# presence on either side alone is visible (clicks without views and
# vice versa).  Both inputs pre-aggregate before the join — one row per
# user enters it — and the join key is the shared user shuffle key.


def q_click_view_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_views"))
    )
    j = clicks.join(views, "user_id", "full_outer")
    return j.select(
        "user_id",
        F.coalesce("n_clicks", F.lit(0)).cast("bigint").alias("n_clicks"),
        F.coalesce("n_views", F.lit(0)).cast("bigint").alias("n_views"),
        F.when(F.col("n_clicks").isNull(), F.lit("view_only"))
        .when(F.col("n_views").isNull(), F.lit("click_only"))
        .otherwise(F.lit("both"))
        .alias("status"),
    ).orderBy("user_id")


O_CLICK_VIEW_RECONCILIATION = """
WITH clicks AS (
  SELECT user_id, COUNT(*) AS n_clicks FROM events
  WHERE event_type = 'click' GROUP BY user_id),
views AS (
  SELECT user_id, COUNT(*) AS n_views FROM events
  WHERE event_type = 'view' GROUP BY user_id)
SELECT COALESCE(c.user_id, v.user_id) AS user_id,
       CAST(COALESCE(n_clicks, 0) AS BIGINT) AS n_clicks,
       CAST(COALESCE(n_views, 0) AS BIGINT) AS n_views,
       CASE WHEN n_clicks IS NULL THEN 'view_only'
            WHEN n_views IS NULL THEN 'click_only'
            ELSE 'both' END AS status
FROM clicks c FULL OUTER JOIN views v ON c.user_id = v.user_id
ORDER BY user_id
"""


# --- G58: interval overlap join via bucketed equi-join -------------------
# Spark has no native range join; the scale pattern is to explode each
# interval into the fixed-width time buckets it covers and equi-join
# events on THEIR single bucket, then apply the exact range predicate.
# An event belongs to exactly one bucket, so a (event, interval) pair can
# only meet once — no post-join dedup.
#
# The gaps-and-islands burst detection is chunk-parallel (the
# deadband_chunked decomposition applied to islands): raw error events
# shuffle by a coarse time chunk and each chunk finds its local islands
# under a PARTITIONED window, so no task ever sorts the full error
# stream — an incident storm spreads over chunks instead of one reducer.
# Only the per-chunk island summaries (min/max ts per local island,
# O(bursts + chunks) rows) pass through the single-partition stitch
# window, which re-applies the identical gap rule to merge islands that
# touch across a chunk boundary.  Chunks tile time disjointly, so
# per-chunk islands restricted to a chunk equal the global scan's, and
# consecutive-island merging is exactly start - lag(end) <= gap: the
# stitched result is bit-identical to a global scan.

_BURST_GAP_S = 600
_BUCKET_S = 3600
_ISLAND_CHUNK_S = 86_400


def q_error_burst_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        "ts",
        "event_id",
        F.floor(F.unix_timestamp("ts") / _ISLAND_CHUNK_S).alias("chunk"),
    )
    # pass 1 — parallel: local islands inside each time chunk
    wc = Window.partitionBy("chunk").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(wc))
    new_b = F.when(gap > _BURST_GAP_S, 1).otherwise(0)
    l_isl = F.sum(new_b).over(wc.rowsBetween(Window.unboundedPreceding, 0))
    local = (
        err.withColumn("l_isl", l_isl)
        .groupBy("chunk", "l_isl")
        .agg(F.min("ts").alias("l_start"), F.max("ts").alias("l_end"))
    )
    # pass 2 — stitch: same gap rule over one summary row per local
    # island (islands are disjoint and time-ordered, so ordering by
    # l_start is the event order)
    ws = Window.orderBy("l_start", "l_end")
    sgap = F.unix_timestamp("l_start") - F.unix_timestamp(
        F.lag("l_end").over(ws)
    )
    s_new = F.when(sgap > _BURST_GAP_S, 1).otherwise(0)
    island = F.sum(s_new).over(ws.rowsBetween(Window.unboundedPreceding, 0))
    bursts = (
        local.withColumn("island", island)
        .groupBy("island")
        .agg(F.min("l_start").alias("b_start"), F.max("l_end").alias("b_end"))
    )
    ib = bursts.select(
        "b_start",
        "b_end",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp("b_start") / _BUCKET_S),
                F.floor(F.unix_timestamp("b_end") / _BUCKET_S),
            )
        ).alias("bkt"),
    )
    evb = ev.select(
        "ts",
        "user_id",
        F.floor(F.unix_timestamp("ts") / _BUCKET_S).alias("bkt"),
    )
    return (
        evb.join(ib, "bkt")
        .filter(
            (F.col("ts") >= F.col("b_start")) & (F.col("ts") <= F.col("b_end"))
        )
        .groupBy("b_start", "b_end")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("b_start")
    )


O_ERROR_BURST_JOIN = f"""
WITH err AS (
  SELECT ts, event_id FROM events WHERE event_type = 'error'),
g AS (
  SELECT ts,
         CASE WHEN date_diff('second',
                             LAG(ts) OVER (ORDER BY ts, event_id),
                             ts) > {_BURST_GAP_S}
              THEN 1 ELSE 0 END AS new_b,
         event_id
  FROM err),
isl AS (
  SELECT ts,
         SUM(new_b) OVER (ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS island
  FROM g),
bursts AS (
  SELECT island, MIN(ts) AS b_start, MAX(ts) AS b_end
  FROM isl GROUP BY island)
SELECT b_start, b_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM bursts b
JOIN events e ON e.ts >= b.b_start AND e.ts <= b.b_end
GROUP BY b_start, b_end
ORDER BY b_start
"""


# --- G73: sequence packing (concat-and-chunk context windows) ------------
# LLM pretraining packs documents back-to-back per source and slices the
# stream every CAPACITY tokens; each doc needs its running token offset.
# A naive per-source cumulative window is a serial scan of the whole
# source — the classic prefix-sum bottleneck — so this is the two-level
# parallel prefix sum: (1) block-local cumsum under a (source, block)
# window, (2) per-block token totals, whose per-source running sum is a
# window over ONE ROW PER BLOCK, (3) equi-join the block offsets back
# (co-partitioned with the block window's shuffle).  Raw rows never
# cross a per-source serial window; only block summaries do.  All
# integer arithmetic — bit-exact vs the oracle's flat global cumsum.

_PACK_CAPACITY = 512
_PACK_BLOCK = 1000  # docs per prefix-sum block


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.expr(f"doc_id div {_PACK_BLOCK}").alias("blk"),
    )
    wb = (
        Window.partitionBy("source", "blk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_start = F.coalesce(F.sum("n_tokens").over(wb), F.lit(0))
    blk_tot = toks.groupBy("source", "blk").agg(
        F.sum("n_tokens").alias("blk_tokens")
    )
    wo = (
        Window.partitionBy("source")
        .orderBy("blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = blk_tot.select(
        "source",
        "blk",
        F.coalesce(F.sum("blk_tokens").over(wo), F.lit(0)).alias("blk_start"),
    )
    packed = (
        toks.withColumn("local_start", local_start)
        .join(offsets, ["source", "blk"])
        .withColumn(
            "tok_start",
            (F.col("blk_start") + F.col("local_start")).cast("bigint"),
        )
    )
    return packed.select(
        "doc_id",
        "source",
        "n_tokens",
        "tok_start",
        F.expr(f"tok_start div {_PACK_CAPACITY}").alias("chunk_first"),
        F.expr(
            f"(tok_start + n_tokens - 1) div {_PACK_CAPACITY}"
        ).alias("chunk_last"),
    ).orderBy("source", "doc_id")


O_SEQUENCE_PACKING = f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT *,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_start
  FROM t)
SELECT doc_id, source, n_tokens,
       CAST(tok_start AS BIGINT) AS tok_start,
       CAST(tok_start // {_PACK_CAPACITY} AS BIGINT) AS chunk_first,
       CAST((tok_start + n_tokens - 1) // {_PACK_CAPACITY} AS BIGINT)
         AS chunk_last
FROM c
ORDER BY source, doc_id
"""


# --- G97: user-journey transition matrix --------------------------------
# First-order Markov transitions between consecutive event types per
# user — the sequence-analysis complement to sessionization (G22) and
# the funnel (G24): which step follows which, and with what
# probability.  One lag window over the user-partitioned shuffle, then
# a (types x types)-sized count agg; the out-degree normalizer is a
# broadcast of at most |types| rows, and the probability is a single
# double division (rational, no ``ln`` — this module's policy).


def q_event_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    trans = steps.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    outdeg = trans.groupBy("prev_type").agg(
        F.sum("n_transitions").alias("n_from")
    )
    return (
        trans.join(F.broadcast(outdeg), "prev_type")
        .select(
            "prev_type",
            "event_type",
            "n_transitions",
            (
                F.col("n_transitions").cast("double")
                / F.col("n_from").cast("double")
            ).alias("prob"),
        )
        .orderBy("prev_type", "event_type")
    )


O_EVENT_PATH_TRANSITIONS = """
WITH steps AS (
  SELECT event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events),
trans AS (
  SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
  FROM steps WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type),
outdeg AS (
  SELECT prev_type, CAST(SUM(n_transitions) AS BIGINT) AS n_from
  FROM trans GROUP BY prev_type)
SELECT t.prev_type, t.event_type, t.n_transitions,
       CAST(t.n_transitions AS DOUBLE) / CAST(o.n_from AS DOUBLE) AS prob
FROM trans t JOIN outdeg o USING (prev_type)
ORDER BY prev_type, event_type
"""


# --- G96: temperature-scaled corpus rebalance --------------------------
# The multilingual data-mixing step (the alpha-temperature sampling of
# mBERT/XLM-R): shrink the head language's share by drawing target
# counts proportional to (n_lang)^alpha instead of n_lang.  alpha = 0.5
# keeps the pipeline transcendental-free — x^0.5 IS sqrt, an
# exactly-rounded IEEE op — per this module's no-``ln`` policy; the
# 5-row weight normalization uses a quantized-integer sum so the share
# denominator is association-order-free.  Selection inside each
# language is the md5(doc_id) rank used by every sampler here, so
# reruns (and engines) pick identical rows.  Scale: one count agg, a
# broadcast of per-language targets, one rank window partitioned by
# language — the skew-prone head language is bounded by its target, and
# the salted two-phase trim of G49 applies unchanged if a single
# language still overwhelms one reducer.

_REBALANCE_FRAC = 0.5  # total kept = floor(N * frac)


def q_corpus_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    weights = counts.select(
        "lang", "n_lang", F.sqrt(F.col("n_lang").cast("double")).alias("wt")
    )
    tot = weights.agg(
        dsum("wt", "wt_total"),
        F.sum("n_lang").alias("n_total"),
    )
    targets = weights.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.least(
            F.col("n_lang"),
            F.floor(
                F.floor(
                    F.col("n_total").cast("double") * F.lit(_REBALANCE_FRAC)
                )
                * (F.col("wt") / F.col("wt_total"))
            ),
        ).alias("target_n"),
    )
    w = Window.partitionBy("lang").orderBy("pick_key", "doc_id")
    return (
        docs.select(
            "doc_id",
            "lang",
            F.md5(F.col("doc_id").cast("string")).alias("pick_key"),
        )
        .withColumn("lang_rank", F.row_number().over(w).cast("bigint"))
        .join(F.broadcast(targets), "lang")
        .filter(F.col("lang_rank") <= F.col("target_n"))
        .select("doc_id", "lang", "lang_rank", "target_n")
    )


O_CORPUS_REBALANCE = f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang),
weights AS (
  SELECT lang, n_lang, SQRT(CAST(n_lang AS DOUBLE)) AS wt FROM counts),
tot AS (
  SELECT {o_dsum('wt', 'wt_total')}, SUM(n_lang) AS n_total FROM weights),
targets AS (
  SELECT lang,
         CAST(LEAST(n_lang,
                    FLOOR(FLOOR(CAST(n_total AS DOUBLE) * {_REBALANCE_FRAC})
                          * (wt / wt_total))) AS BIGINT) AS target_n
  FROM weights CROSS JOIN tot),
ranked AS (
  SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS pick_key,
         CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                 ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                          doc_id) AS BIGINT) AS lang_rank
  FROM documents)
SELECT r.doc_id, r.lang, r.lang_rank, t.target_n
FROM ranked r JOIN targets t USING (lang)
WHERE r.lang_rank <= t.target_n
"""


# --- G99: span-level exact dedup (C4-style) -----------------------------
# Doc-level dedup (X1) misses the dominant duplication mode in web
# corpora: REPEATED PASSAGES inside otherwise-distinct documents
# (boilerplate, quoted headers, licence blocks).  C4/RefinedWeb drop
# duplicate three-sentence spans corpus-wide, keeping one occurrence;
# here the unit is a non-overlapping _SPAN_TOKENS-token window (the
# corpus has no sentence boundaries).  The first occurrence — minimal
# (doc_id, span_idx) — survives; every other copy is cut and the doc is
# reassembled from its surviving windows.
#
# Scale shape: the global winner election shuffles (md5, doc_id, idx)
# — 16-byte keys, never span text; the per-doc reassembly groups
# (doc_id, idx) ints; the only wide row is the final join back to the
# doc's own token array, an equi-join on doc_id that co-partitions with
# the corpus layout.  No all-pairs anything: cost is O(total spans) at
# any corpus size.

_SPAN_TOKENS = 8


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", T.tokens("text").alias("toks"))
        # sequence(0, ceil(0/k)-1) = sequence(0, -1) DESCENDS and would
        # emit two phantom md5('') spans for an empty token array; the
        # whitespace tokenizer never yields one today (split('',' ') is
        # ['']) but a regex tokenizer does — guard like trigram_lm
        .filter(F.size("toks") >= 1)
    )
    k = _SPAN_TOKENS
    occ = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, int(ceil(size(toks) / {k}.0)) - 1),"
                f" i -> md5(array_join(slice(toks, i * {k} + 1, {k}), ' ')))"
            )
        ).alias("span_idx", "span_md5"),
    )
    winners = occ.groupBy("span_md5").agg(
        F.min(F.struct("doc_id", "span_idx")).alias("w")
    )
    kept = winners.select(
        F.col("w.doc_id").alias("doc_id"), F.col("w.span_idx").alias("span_idx")
    )
    per_doc = kept.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("span_idx")).alias("kept_idx")
    )
    return (
        docs.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.expr(f"int(ceil(size(toks) / {k}.0))").alias("n_spans"),
            F.coalesce(F.size("kept_idx"), F.lit(0)).alias("n_kept"),
            F.coalesce(
                F.array_join(
                    F.flatten(
                        F.expr(
                            f"transform(kept_idx,"
                            f" i -> slice(toks, i * {k} + 1, {k}))"
                        )
                    ),
                    " ",
                ),
                F.lit(""),
            ).alias("clean_text"),
        )
        .orderBy("doc_id")
    )


O_SPAN_DEDUP = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
occ AS (
  SELECT doc_id, CAST(u.i AS INT) AS span_idx,
         md5(array_to_string(
           list_slice(t, u.i * {_SPAN_TOKENS} + 1,
                      u.i * {_SPAN_TOKENS} + {_SPAN_TOKENS}), ' ')) AS h
  FROM toks,
       UNNEST(range(CAST(CEIL(len(t) / {_SPAN_TOKENS}.0) AS BIGINT))) AS u(i)),
winners AS (
  SELECT doc_id, span_idx FROM (
    SELECT doc_id, span_idx,
           ROW_NUMBER() OVER (PARTITION BY h
                              ORDER BY doc_id, span_idx) AS rn
    FROM occ) WHERE rn = 1),
per_doc AS (
  SELECT doc_id, list(span_idx ORDER BY span_idx) AS kept_idx
  FROM winners GROUP BY doc_id)
SELECT d.doc_id,
       CAST(CEIL(len(d.t) / {_SPAN_TOKENS}.0) AS INT) AS n_spans,
       COALESCE(CAST(len(p.kept_idx) AS INT), 0) AS n_kept,
       COALESCE(array_to_string(
         flatten(list_transform(p.kept_idx,
           i -> list_slice(d.t, i * {_SPAN_TOKENS} + 1,
                           i * {_SPAN_TOKENS} + {_SPAN_TOKENS}))), ' '),
         '') AS clean_text
FROM toks d LEFT JOIN per_doc p USING (doc_id)
ORDER BY doc_id
"""


# --- G100: distribution drift between time windows (chi-square) ----------
# The data-quality monitor a production ingest runs per batch: has the
# value distribution of each event type shifted between a reference
# window and the current one?  PSI is the textbook score but needs
# ``ln``; the chi-square distance sum((pa-pb)^2/(pa+pb)) is the
# rational-arithmetic equivalent (module no-``ln`` policy) and ranks
# drift identically for small shifts.  Bin fences are exact per-type
# MIN/MAX (no interpolated quantiles — the order-statistic ULP trap),
# and the per-bin terms are summed with the quantized-integer ``dsum``
# so association order cannot change the score.  Scale: two scans
# collapse to (types x 10) cells immediately — the fence frame is a
# |types|-row broadcast and everything after the first partial agg is
# O(types * bins).

_DRIFT_SPLIT = "2024-01-16"
_DRIFT_BINS = 10


def q_value_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    fences = ev.groupBy("event_type").agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )
    b = _DRIFT_BINS
    binned = (
        ev.join(F.broadcast(fences), "event_type")
        .select(
            "event_type",
            (F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp")).alias("ref"),
            # constant-valued type (vmax == vmin) degenerates to one bin
            # instead of a divide-by-zero under ANSI mode
            F.when(
                F.col("vmax") > F.col("vmin"),
                F.least(
                    F.lit(b - 1),
                    F.floor(
                        (F.col("value") - F.col("vmin"))
                        / (F.col("vmax") - F.col("vmin"))
                        * F.lit(float(b))
                    ).cast("int"),
                ),
            )
            .otherwise(F.lit(0))
            .alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("ref"), 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(F.col("ref"), 0).otherwise(1)).alias("n_b"),
        )
    )
    totals = binned.groupBy("event_type").agg(
        F.sum("n_a").alias("tot_a"), F.sum("n_b").alias("tot_b")
    )
    # (pa-pb)^2 spelled as d*d — Math.pow vs libm pow is not contractually
    # exact-rounded for integer exponents; *,/ are (IEEE 754)
    pa = F.col("n_a") / F.col("tot_a")
    pb = F.col("n_b") / F.col("tot_b")
    # one-sided types (all events in one window, tot = 0) have undefined
    # drift: the guard yields NULL terms -> chi2 NULL, instead of an
    # ANSI 0/0 error (or, non-ANSI, NaN quantizing to a silent 0.0)
    terms = binned.join(F.broadcast(totals), "event_type").select(
        "event_type",
        "tot_a",
        "tot_b",
        F.when(
            (F.col("tot_a") > 0) & (F.col("tot_b") > 0),
            (pa - pb) * (pa - pb) / (pa + pb),
        ).alias("term"),
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.max("tot_a").alias("n_ref"),
            F.max("tot_b").alias("n_cur"),
            dsum("term", "chi2", scale=9),
        )
        .orderBy("event_type")
    )


O_VALUE_DRIFT_CHI2 = f"""
WITH fences AS (
  SELECT event_type, MIN(value) AS vmin, MAX(value) AS vmax
  FROM events GROUP BY event_type),
binned AS (
  SELECT e.event_type,
         SUM(CASE WHEN e.ts < TIMESTAMP '{_DRIFT_SPLIT}' THEN 1 ELSE 0 END)
           AS n_a,
         SUM(CASE WHEN e.ts < TIMESTAMP '{_DRIFT_SPLIT}' THEN 0 ELSE 1 END)
           AS n_b
  FROM events e JOIN fences f USING (event_type)
  GROUP BY e.event_type,
           CASE WHEN f.vmax > f.vmin
                THEN LEAST({_DRIFT_BINS - 1},
                           CAST(FLOOR((e.value - f.vmin)
                                      / (f.vmax - f.vmin)
                                      * {_DRIFT_BINS}.0) AS INT))
                ELSE 0 END),
totals AS (
  SELECT event_type, SUM(n_a) AS tot_a, SUM(n_b) AS tot_b
  FROM binned GROUP BY event_type),
terms AS (
  SELECT b.event_type, t.tot_a, t.tot_b,
         CASE WHEN t.tot_a > 0 AND t.tot_b > 0
              THEN (b.n_a / t.tot_a - b.n_b / t.tot_b)
                   * (b.n_a / t.tot_a - b.n_b / t.tot_b)
                   / (b.n_a / t.tot_a + b.n_b / t.tot_b)
              ELSE NULL END AS term
  FROM binned b JOIN totals t USING (event_type))
SELECT event_type,
       CAST(MAX(tot_a) AS BIGINT) AS n_ref,
       CAST(MAX(tot_b) AS BIGINT) AS n_cur,
       {o_dsum('term', 'chi2', scale=9)}
FROM terms GROUP BY event_type ORDER BY event_type
"""


# --- G101: top session paths (sequential pattern mining) -----------------
# The order-SENSITIVE complement to the transition matrix (G97): entire
# session journeys ranked by frequency — the query behind "what are the
# top user flows" product dashboards and behavioral-cloning dataset
# curation.  Sessions use the G22 convention (30-min inactivity gap);
# a path is the first _PATH_MAX_STEPS event types of the session joined
# with '>'.  Scale: one user-partitioned window pass assigns session
# ids, the per-session collect is bounded by _PATH_MAX_STEPS after the
# slice (collect_list buffers the session — sessions are human-scale;
# a pathological unbounded session would cap collection with a
# row_number <= k pre-filter), and the final count agg is O(distinct
# paths).  LIMIT is deterministic: (n_sessions DESC, path) totally
# orders because path is the GROUP BY key.

_PATH_MAX_STEPS = 8
_PATH_TOP_K = 20


def q_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(gap > 1800, 1).otherwise(0).alias("new_sess"),
    )
    sess = flagged.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum("new_sess").over(w).alias("sess_id"),
    )
    paths = sess.groupBy("user_id", "sess_id").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda e: e["event_type"],
                ),
                1,
                _PATH_MAX_STEPS,
            ),
            ">",
        ).alias("path"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(_PATH_TOP_K)
    )


O_TOP_SESSION_PATHS = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN date_diff('second',
                             LAG(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id),
                             ts) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_sess) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS sess_id
  FROM flagged),
paths AS (
  SELECT user_id, sess_id,
         array_to_string(
           list_slice(list(event_type ORDER BY ts, event_id),
                      1, {_PATH_MAX_STEPS}), '>') AS path,
         COUNT(*) AS n_events
  FROM sess GROUP BY user_id, sess_id)
SELECT path,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT {_PATH_TOP_K}
"""


# --- G106: HyperLogLog distinct-count audit (mergeable-sketch QA) --------
# `approx_count_distinct` is the right operator at 100 TB, but its HLL++
# internals are engine-private, so it can never sit under this catalog's
# cross-engine hash gate.  This query hand-rolls the HLL it approximates
# — md5-bucketed registers, max rho per bucket, harmonic-mean estimate —
# deterministically enough that DuckDB reproduces it BIT-FOR-BIT, and
# audits it against the exact distinct count per event type.  The
# registers are a (types x 64)-row mergeable state built by one
# map-side-combinable MAX agg: exactly the sketch-merge shape that makes
# HLL free at scale (registers from different partitions/days/tables
# union by max).  Determinism tricks: rho via digits-of-bin (integer
# log2), the harmonic sum as SCALED INTEGERS — each term 2^(55-rho) is
# exact in BIGINT, so the only float ops are one division and one
# multiply by a literal.  No ln: the small-range linear-counting
# correction is deliberately omitted (documented estimator choice; the
# audit column shows exactly what that costs on this corpus).

_HLL_BUCKETS = 64  # m = 2^6
_HLL_W_DIV = 1 << 54  # 60-bit hash -> 6-bit bucket + 54-bit remainder
_HLL_SCALE = float(1 << 55)  # rho <= 55, so 2^(55-rho) is integral
_HLL_ALPHA_M2 = 0.7213 / (1.0 + 1.079 / _HLL_BUCKETS) * _HLL_BUCKETS**2


def q_hll_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    h = ev.select(
        "event_type",
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
        )
        .cast("long")
        .alias("h60"),
    )
    b = h.select(
        "event_type",
        F.expr(f"h60 div {_HLL_W_DIV}").alias("bucket"),
        F.expr(f"h60 % {_HLL_W_DIV}").alias("w"),
    )
    rho = (
        F.when(F.col("w") == 0, F.lit(55))
        .otherwise(F.lit(55) - F.length(F.bin("w")))
        .alias("rho")
    )
    regs = (
        b.select("event_type", "bucket", rho)
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    sums = regs.groupBy("event_type").agg(
        F.sum(F.expr("shiftleft(1L, cast(55 - m_j as int))")).alias(
            "present_scaled"
        ),
        F.count(F.lit(1)).alias("n_present"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    est = F.lit(_HLL_ALPHA_M2) / (
        (
            F.col("present_scaled")
            + (F.lit(_HLL_BUCKETS) - F.col("n_present"))
            * F.lit(1 << 55)
        ).cast("double")
        / F.lit(_HLL_SCALE)
    )
    return (
        sums.join(F.broadcast(exact), "event_type")
        .select("event_type", "n_exact", est.alias("hll_estimate"))
        .select(
            "event_type",
            "n_exact",
            "hll_estimate",
            (
                F.abs(F.col("hll_estimate") - F.col("n_exact").cast("double"))
                / F.col("n_exact").cast("double")
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


O_HLL_DISTINCT_AUDIT = f"""
WITH h AS (
  SELECT event_type,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)
              AS BIGINT) AS h60
  FROM events),
b AS (
  SELECT event_type, h60 // {_HLL_W_DIV} AS bucket,
         h60 % {_HLL_W_DIV} AS w
  FROM h),
regs AS (
  SELECT event_type, bucket,
         MAX(CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END) AS m_j
  FROM b GROUP BY event_type, bucket),
sums AS (
  SELECT event_type,
         SUM((1::BIGINT) << CAST(55 - m_j AS INT)) AS present_scaled,
         COUNT(*) AS n_present
  FROM regs GROUP BY event_type),
exact AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type),
est AS (
  SELECT s.event_type, x.n_exact,
         {_HLL_ALPHA_M2!r} / (
           CAST(s.present_scaled
                + ({_HLL_BUCKETS} - s.n_present) * {1 << 55} AS DOUBLE)
           / {_HLL_SCALE!r}) AS hll_estimate
  FROM sums s JOIN exact x USING (event_type))
SELECT event_type, n_exact, hll_estimate,
       ABS(hll_estimate - CAST(n_exact AS DOUBLE))
         / CAST(n_exact AS DOUBLE) AS rel_err
FROM est ORDER BY event_type
"""


# --- G107: per-source vocabulary divergence (domain outlier scan) --------
# The curation question G100 asks over TIME, asked over SOURCES: which
# domains' unigram distributions diverge from the corpus — boilerplate
# farms, machine-generated text, off-topic crawls.  Cells are the
# corpus top-_VOCAB_DIV_V tokens plus an <other> bucket; the score is
# the symmetric chi-square distance against the corpus distribution.
# Absent cells have a closed form — (0-pc)^2/(0+pc) = pc — so the score
# is (present terms) + (1 - sum of pc over present cells): everything
# stays rational and O(sources x V) after the token agg, with no dense
# cell matrix materialized.  Scale: one (source, token) count shuffle
# dominated by vocabulary size; the vocab and corpus-share frames are
# broadcasts.

_VOCAB_DIV_V = 200


def q_source_vocab_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # tokenization feeds both the vocab election and the cell counts —
    # persist (lazy, registered for spec-level release) so the corpus
    # explodes once, not per branch
    toks = cache.register(
        docs.select("source", F.explode(T.tokens("text")).alias("tok"))
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    # top-V via TakeOrdered (per-partition partial top-K), NOT a global
    # row_number window — a single-task sort over the whole vocabulary
    # is the classic billion-token scale hazard
    vocab = (
        counts.orderBy(F.col("n_tok").desc(), "tok")
        .limit(_VOCAB_DIV_V)
        .select("tok")
    )
    cells = (
        toks.join(F.broadcast(vocab.withColumn("in_v", F.lit(1))), "tok", "left")
        .select(
            "source",
            F.when(F.col("in_v").isNotNull(), F.col("tok"))
            .otherwise(F.lit("<other>"))
            .alias("cell"),
        )
        .groupBy("source", "cell")
        .agg(F.count(F.lit(1)).alias("n_sc"))
    )
    corpus = cells.groupBy("cell").agg(F.sum("n_sc").alias("n_c"))
    total = corpus.agg(F.sum("n_c").alias("n_total"))
    src_tot = cells.groupBy("source").agg(F.sum("n_sc").alias("n_s"))
    ps = F.col("n_sc").cast("double") / F.col("n_s").cast("double")
    pc = F.col("n_c").cast("double") / F.col("n_total").cast("double")
    terms = (
        cells.join(F.broadcast(corpus), "cell")
        .join(F.broadcast(src_tot), "source")
        .crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_s",
            ((ps - pc) * (ps - pc) / (ps + pc)).alias("term"),
            pc.alias("pc_present"),
        )
    )
    return (
        terms.groupBy("source")
        .agg(
            F.max("n_s").alias("n_tokens"),
            dsum("term", "chi2_present", scale=9),
            dsum("pc_present", "pc_sum", scale=9),
        )
        .select(
            "source",
            "n_tokens",
            (
                F.col("chi2_present") + (F.lit(1.0) - F.col("pc_sum"))
            ).alias("chi2"),
        )
        .orderBy("source")
    )


O_SOURCE_VOCAB_DIVERGENCE = f"""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
counts AS (
  SELECT tok, COUNT(*) AS n_tok FROM toks GROUP BY tok),
vocab AS (
  SELECT tok FROM (
    SELECT tok, ROW_NUMBER() OVER (ORDER BY n_tok DESC, tok) AS rn
    FROM counts) WHERE rn <= {_VOCAB_DIV_V}),
cells AS (
  SELECT t.source,
         CASE WHEN v.tok IS NOT NULL THEN t.tok ELSE '<other>' END AS cell,
         COUNT(*) AS n_sc
  FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
  GROUP BY 1, 2),
corpus AS (SELECT cell, SUM(n_sc) AS n_c FROM cells GROUP BY cell),
total AS (SELECT SUM(n_c) AS n_total FROM corpus),
src_tot AS (SELECT source, SUM(n_sc) AS n_s FROM cells GROUP BY source),
terms AS (
  SELECT c.source, s.n_s,
         (CAST(c.n_sc AS DOUBLE) / CAST(s.n_s AS DOUBLE)
          - CAST(k.n_c AS DOUBLE) / CAST(t.n_total AS DOUBLE))
         * (CAST(c.n_sc AS DOUBLE) / CAST(s.n_s AS DOUBLE)
            - CAST(k.n_c AS DOUBLE) / CAST(t.n_total AS DOUBLE))
         / (CAST(c.n_sc AS DOUBLE) / CAST(s.n_s AS DOUBLE)
            + CAST(k.n_c AS DOUBLE) / CAST(t.n_total AS DOUBLE)) AS term,
         CAST(k.n_c AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS pc_present
  FROM cells c
  JOIN corpus k USING (cell)
  JOIN src_tot s USING (source)
  CROSS JOIN total t)
SELECT source,
       CAST(MAX(n_s) AS BIGINT) AS n_tokens,
       ({o_dsum_expr('term', 9)} + (1.0 - {o_dsum_expr('pc_present', 9)}))
         AS chi2
FROM terms GROUP BY source ORDER BY source
"""


# --- G108: Bloom-filter membership audit (join-pruning QA) ---------------
# The runtime-filter building block, hand-rolled and audited: build a
# fixed-size Bloom filter over the stored corpus' fingerprints, probe it
# with an incoming batch, and measure the false-positive rate against
# ground truth.  This is the pre-join filter that turns G50's
# incremental-dedup ANTI join into a mostly-local operation at 100 TB:
# the bit set is CONSTANT-SIZED (m = 2^16 here), so it broadcasts to
# every executor no matter how large the corpus grows, and only probes
# the filter cannot rule out touch the shuffle.  k = 4 positions come
# from Kirsch-Mitzenmacher combinations of one md5 (the repo's standard
# trick), so DuckDB rebuilds the identical filter bit-for-bit.  The
# 80/20 doc_id split models stored-corpus vs incoming batch (G50's
# convention).

_BLOOM_M = 1 << 16
_BLOOM_K = 4


def _bloom_positions(h1, h2):
    return F.array(
        *[
            (h1 + F.lit(j) * h2) % F.lit(_BLOOM_M)
            for j in range(_BLOOM_K)
        ]
    )


def q_bloom_filter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", T.fingerprint("text").alias("fp")
    )
    # five consumers (bits, probe positions, both truth sides, the probe
    # census) hang off this frame — persist it (lazily; no job at plan
    # build; registered for spec-level release) so the fingerprint + md5
    # pipeline runs once, not per subtree
    hashed = cache.register(
        docs.select(
            "doc_id",
            "fp",
            F.conv(F.substring(F.md5("fp"), 1, 15), 16, 10)
            .cast("long")
            .alias("h1"),
            F.conv(F.substring(F.md5("fp"), 17, 15), 16, 10)
            .cast("long")
            .alias("h2"),
        )
    )
    members = hashed.filter(F.col("doc_id") % 10 < 8)
    probes = hashed.filter(F.col("doc_id") % 10 >= 8)
    bits = (
        members.select(
            F.explode(_bloom_positions(F.col("h1"), F.col("h2"))).alias("pos")
        )
        .distinct()
    )
    probe_pos = probes.select(
        "doc_id",
        "fp",
        F.posexplode(_bloom_positions(F.col("h1"), F.col("h2"))).alias(
            "j", "pos"
        ),
    )
    matched = (
        probe_pos.join(F.broadcast(bits), "pos")
        .groupBy("doc_id", "fp")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .filter(F.col("n_hit") == _BLOOM_K)
        .select("doc_id", "fp")
    )
    truth = probes.join(
        members.select(F.col("fp").alias("fp")).distinct(), "fp", "left_semi"
    ).select("doc_id")
    n_bits = bits.agg(F.count(F.lit(1)).alias("n_bits_set"))
    stats = (
        probes.select("doc_id")
        .join(matched.select("doc_id", F.lit(1).alias("maybe")), "doc_id", "left")
        .join(truth.select("doc_id", F.lit(1).alias("present")), "doc_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n_probes"),
            F.sum(F.coalesce(F.col("maybe"), F.lit(0))).alias("n_maybe"),
            F.sum(F.coalesce(F.col("present"), F.lit(0))).alias("n_present"),
            F.sum(
                F.coalesce(F.col("maybe"), F.lit(0))
                * (F.lit(1) - F.coalesce(F.col("present"), F.lit(0)))
            ).alias("n_false_pos"),
        )
    )
    return stats.crossJoin(F.broadcast(n_bits)).select(
        "n_probes",
        "n_maybe",
        "n_present",
        "n_false_pos",
        "n_bits_set",
        # all-probes-present corpora have no negatives to false-positive
        # on; report NULL instead of an ANSI divide-by-zero
        F.when(
            F.col("n_probes") > F.col("n_present"),
            F.col("n_false_pos").cast("double")
            / (F.col("n_probes") - F.col("n_present")).cast("double"),
        ).alias("fp_rate"),
    )


def _bloom_pos_sql(h1: str, h2: str) -> str:
    return (
        "["
        + ", ".join(
            f"({h1} + {j} * {h2}) % {_BLOOM_M}" for j in range(_BLOOM_K)
        )
        + "]"
    )


O_BLOOM_FILTER_AUDIT = f"""
WITH fps AS (
  SELECT doc_id, {_FP_SQL} AS fp FROM documents),
hashed AS (
  SELECT doc_id, fp,
         CAST('0x' || substring(md5(fp), 1, 15) AS BIGINT) AS h1,
         CAST('0x' || substring(md5(fp), 17, 15) AS BIGINT) AS h2
  FROM fps),
members AS (SELECT * FROM hashed WHERE doc_id % 10 < 8),
probes AS (SELECT * FROM hashed WHERE doc_id % 10 >= 8),
bits AS (
  SELECT DISTINCT unnest({_bloom_pos_sql('h1', 'h2')}) AS pos FROM members),
probe_pos AS (
  SELECT doc_id, fp, unnest({_bloom_pos_sql('h1', 'h2')}) AS pos
  FROM probes),
matched AS (
  SELECT doc_id FROM (
    SELECT p.doc_id, COUNT(*) AS n_hit
    FROM probe_pos p JOIN bits b USING (pos)
    GROUP BY p.doc_id) WHERE n_hit = {_BLOOM_K}),
truth AS (
  SELECT DISTINCT p.doc_id FROM probes p
  JOIN (SELECT DISTINCT fp FROM members) m USING (fp)),
flags AS (
  SELECT p.doc_id,
         CASE WHEN ma.doc_id IS NOT NULL THEN 1 ELSE 0 END AS maybe,
         CASE WHEN t.doc_id IS NOT NULL THEN 1 ELSE 0 END AS present
  FROM probes p
  LEFT JOIN matched ma ON ma.doc_id = p.doc_id
  LEFT JOIN truth t ON t.doc_id = p.doc_id),
n_bits AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bits_set FROM bits)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(maybe) AS BIGINT) AS n_maybe,
       CAST(SUM(present) AS BIGINT) AS n_present,
       CAST(SUM(maybe * (1 - present)) AS BIGINT) AS n_false_pos,
       (SELECT n_bits_set FROM n_bits) AS n_bits_set,
       CASE WHEN COUNT(*) > SUM(present)
            THEN CAST(SUM(maybe * (1 - present)) AS DOUBLE)
                 / CAST(COUNT(*) - SUM(present) AS DOUBLE)
            ELSE NULL END AS fp_rate
FROM flags
"""


# --- G109: A/B experiment readout (Welch z on per-user spend) ------------
# The experimentation readout a product-analytics deployment runs per
# flag: users deterministically bucketed by md5 parity (the same
# hash-split family as G28 — assignment is reproducible across engines
# and reruns), metric = per-user total purchase value, and the Welch
# z-score on the group means.  A continuous metric, not a conversion
# proportion: on this corpus every user converts, so a two-proportion z
# degenerates (pooled p = 1, se = 0) — the continuous form never does.
# Per-user sums are quantized-integer (association-order-free), group
# moments are quantized sums of those exact values, and the z itself is
# +,-,*,/ and one SQRT — all exactly rounded, so the statistic sits
# under the bit-equality gate.  Scale: one user-grouped agg (map-side
# partial), a 2-row group reduction, a 1-row join.


def q_ab_test_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per_user = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(dsum("value", "spend"))
    )
    grp = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10
        ).cast("long")
        % 2
    )
    q1 = F.floor(F.col("spend") * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    q2 = F.floor(
        F.col("spend") * F.col("spend") * F.lit(1e3) + F.lit(0.5)
    ).cast("bigint")
    # ONE pass: conditional (pivoted) aggregation — the two-filter +
    # crossJoin form scanned events twice and silently vanished when a
    # tiny corpus hashed every user to one parity
    stats = per_user.select(grp.alias("grp"), "spend").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("n_b"),
        (
            F.sum(F.when(F.col("grp") == 0, q1).otherwise(F.lit(0))).cast(
                "double"
            )
            / F.lit(1e6)
        ).alias("s1_a"),
        (
            F.sum(F.when(F.col("grp") == 1, q1).otherwise(F.lit(0))).cast(
                "double"
            )
            / F.lit(1e6)
        ).alias("s1_b"),
        (
            F.sum(F.when(F.col("grp") == 0, q2).otherwise(F.lit(0))).cast(
                "double"
            )
            / F.lit(1e3)
        ).alias("s2_a"),
        (
            F.sum(F.when(F.col("grp") == 1, q2).otherwise(F.lit(0))).cast(
                "double"
            )
            / F.lit(1e3)
        ).alias("s2_b"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    # every division sits under its group's n > 0 guard (an empty
    # parity bucket on a tiny corpus must report NULLs, not an ANSI
    # divide-by-zero); GREATEST(.., 0) clamps the E[x^2]-mean^2
    # cancellation, which can go slightly negative on near-constant
    # spends — Spark sqrt(neg) is NaN but DuckDB ERRORS
    mean_a = F.when(F.col("n_a") > 0, F.col("s1_a") / na)
    mean_b = F.when(F.col("n_b") > 0, F.col("s1_b") / nb)
    var_a = F.when(
        F.col("n_a") > 0,
        F.greatest(
            F.col("s2_a") / na
            - (F.col("s1_a") / na) * (F.col("s1_a") / na),
            F.lit(0.0),
        ),
    )
    var_b = F.when(
        F.col("n_b") > 0,
        F.greatest(
            F.col("s2_b") / nb
            - (F.col("s1_b") / nb) * (F.col("s1_b") / nb),
            F.lit(0.0),
        ),
    )
    se = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.sqrt(var_a / na + var_b / nb),
    )
    return stats.select(
        "n_a",
        "n_b",
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        (mean_b - mean_a).alias("lift"),
        # degenerate zero-variance groups report NULL instead of a
        # divide-by-zero under ANSI mode
        F.when(se > 0, (mean_b - mean_a) / se).alias("zscore"),
    )


O_AB_TEST_READOUT = """
WITH per_user AS (
  SELECT user_id,
         (CAST(SUM(CAST(FLOOR((value) * 1e6 + 0.5) AS BIGINT))
               AS DOUBLE) / 1e6) AS spend
  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
tagged AS (
  SELECT CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
              AS BIGINT) % 2 AS grp,
         spend
  FROM per_user),
stats AS (
  SELECT CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN grp = 0
                       THEN CAST(FLOOR(spend * 1e6 + 0.5) AS BIGINT)
                       ELSE 0 END) AS DOUBLE) / 1e6 AS s1_a,
         CAST(SUM(CASE WHEN grp = 1
                       THEN CAST(FLOOR(spend * 1e6 + 0.5) AS BIGINT)
                       ELSE 0 END) AS DOUBLE) / 1e6 AS s1_b,
         CAST(SUM(CASE WHEN grp = 0
                       THEN CAST(FLOOR(spend * spend * 1e3 + 0.5) AS BIGINT)
                       ELSE 0 END) AS DOUBLE) / 1e3 AS s2_a,
         CAST(SUM(CASE WHEN grp = 1
                       THEN CAST(FLOOR(spend * spend * 1e3 + 0.5) AS BIGINT)
                       ELSE 0 END) AS DOUBLE) / 1e3 AS s2_b
  FROM tagged),
derived AS (
  SELECT n_a, n_b,
         CASE WHEN n_a > 0 THEN s1_a / CAST(n_a AS DOUBLE) END AS mean_a,
         CASE WHEN n_b > 0 THEN s1_b / CAST(n_b AS DOUBLE) END AS mean_b,
         CASE WHEN n_a > 0
              THEN GREATEST(s2_a / CAST(n_a AS DOUBLE)
                            - (s1_a / CAST(n_a AS DOUBLE))
                              * (s1_a / CAST(n_a AS DOUBLE)), 0.0)
              END AS var_a,
         CASE WHEN n_b > 0
              THEN GREATEST(s2_b / CAST(n_b AS DOUBLE)
                            - (s1_b / CAST(n_b AS DOUBLE))
                              * (s1_b / CAST(n_b AS DOUBLE)), 0.0)
              END AS var_b
  FROM stats),
with_se AS (
  SELECT n_a, n_b, mean_a, mean_b,
         CASE WHEN n_a > 0 AND n_b > 0
              THEN SQRT(var_a / CAST(n_a AS DOUBLE)
                        + var_b / CAST(n_b AS DOUBLE))
              END AS se
  FROM derived)
SELECT n_a, n_b, mean_a, mean_b,
       mean_b - mean_a AS lift,
       CASE WHEN se > 0 THEN (mean_b - mean_a) / se END AS zscore
FROM with_se
"""


# --- G110: count-based trigram LM (top continuations per context) --------
# The n-gram language model as a catalog operator: conditional
# next-token distributions P(w3 | w1 w2) from corpus counts — the
# KenLM-style artifact data teams still build for contamination scans,
# boilerplate detection, and cheap generation QA.  Rational
# probabilities (count ratios, module no-``ln`` policy).  Scale: one
# trigram count shuffle keyed by (context, next) — vocabulary-bounded;
# context election is TakeOrdered; continuations rank inside
# |top contexts| * |continuations| rows after a broadcast semi-join.

_LM_TOP_CONTEXTS = 20
_LM_TOP_NEXT = 3


def q_trigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    docs = (
        load(spark, sf_dir, "documents")
        .select(T.tokens("text").alias("toks"))
        # sequence(0, size-3) DESCENDS for size < 3 and would index out
        # of range (an ANSI error); the oracle guards len >= 3 too
        .filter(F.size("toks") >= 3)
    )
    tri = docs.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks) - 3),"
                " i -> struct(concat(toks[i], ' ', toks[i+1]) as ctx,"
                "             toks[i+2] as nxt))"
            )
        ).alias("t")
    ).select("t.ctx", "t.nxt")
    tri_counts = tri.groupBy("ctx", "nxt").agg(
        F.count(F.lit(1)).alias("n")
    )
    ctx_counts = tri_counts.groupBy("ctx").agg(
        F.sum("n").alias("n_ctx")
    )
    top_ctx = (
        ctx_counts.orderBy(F.col("n_ctx").desc(), "ctx")
        .limit(_LM_TOP_CONTEXTS)
    )
    wr = Window.partitionBy("ctx").orderBy(F.col("n").desc(), "nxt")
    return (
        tri_counts.join(F.broadcast(top_ctx), "ctx")
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= _LM_TOP_NEXT)
        .select(
            "ctx",
            "n_ctx",
            "nxt",
            "n",
            (F.col("n").cast("double") / F.col("n_ctx").cast("double")).alias(
                "prob"
            ),
            "rank",
        )
        .orderBy("ctx", "rank")
    )


O_TRIGRAM_LM = f"""
WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
tri AS (
  SELECT unnest(list_transform(range(1, len(t) - 1),
                i -> {{'ctx': t[i] || ' ' || t[i+1], 'nxt': t[i+2]}})) AS s
  FROM toks WHERE len(t) >= 3),
tc AS (
  SELECT s.ctx AS ctx, s.nxt AS nxt, CAST(COUNT(*) AS BIGINT) AS n
  FROM tri GROUP BY 1, 2),
cc AS (SELECT ctx, CAST(SUM(n) AS BIGINT) AS n_ctx FROM tc GROUP BY ctx),
top_ctx AS (
  SELECT ctx, n_ctx FROM cc ORDER BY n_ctx DESC, ctx
  LIMIT {_LM_TOP_CONTEXTS}),
ranked AS (
  SELECT t.ctx, k.n_ctx, t.nxt, t.n,
         CAST(t.n AS DOUBLE) / CAST(k.n_ctx AS DOUBLE) AS prob,
         ROW_NUMBER() OVER (PARTITION BY t.ctx
                            ORDER BY t.n DESC, t.nxt) AS rank
  FROM tc t JOIN top_ctx k USING (ctx))
SELECT ctx, n_ctx, nxt, n, prob, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {_LM_TOP_NEXT}
ORDER BY ctx, rank
"""


# --- G111: event-time disorder audit (watermark sizing) ------------------
# THE number a streaming deployment needs before choosing
# ``withWatermark``: how out-of-order is this stream, per type?  An
# event is late if its event time precedes the running maximum of
# earlier arrivals (arrival order = event_id, the ingest sequence); the
# max disorder in seconds is the watermark delay that would have
# captured every late event — computed as a CEILING on exact
# microsecond arithmetic (truncation would understate a 90.9 s
# straggler as 90, and a 90-second watermark then drops exactly the
# event the audit was sized to capture).  Pure window + integer math.
# Scale: one user-partitioned window pass, then a |types|-row agg.


def q_event_disorder_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = ev.select(
        "event_type",
        "ts",
        F.max("ts").over(w).alias("prev_max"),
    ).select(
        "event_type",
        (F.col("ts") < F.col("prev_max")).alias("late"),
        # ceil(micros / 1e6) via integer div — exact in both engines
        F.expr(
            "(unix_micros(prev_max) - unix_micros(ts) + 999999)"
            " div 1000000"
        ).alias("disorder_s"),
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("late"), 1).otherwise(0)).alias("n_late"),
            F.coalesce(
                F.max(F.when(F.col("late"), F.col("disorder_s"))),
                F.lit(0).cast("bigint"),
            ).alias("max_disorder_s"),
        )
        .select(
            "event_type",
            "n_events",
            "n_late",
            (
                F.col("n_late").cast("double")
                / F.col("n_events").cast("double")
            ).alias("late_rate"),
            "max_disorder_s",
        )
        .orderBy("event_type")
    )


O_EVENT_DISORDER_AUDIT = """
WITH flagged AS (
  SELECT event_type,
         ts < MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS late,
         (epoch_us(MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING))
          - epoch_us(ts) + 999999) // 1000000 AS disorder_s
  FROM events)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS late_rate,
       COALESCE(MAX(CASE WHEN late THEN disorder_s END),
                CAST(0 AS BIGINT)) AS max_disorder_s
FROM flagged GROUP BY event_type ORDER BY event_type
"""


SPECS = [
    QuerySpec("span_dedup", q_span_dedup, O_SPAN_DEDUP),
    QuerySpec("trigram_lm", q_trigram_lm, O_TRIGRAM_LM),
    QuerySpec(
        "event_disorder_audit",
        q_event_disorder_audit,
        O_EVENT_DISORDER_AUDIT,
    ),
    QuerySpec(
        "bloom_filter_audit", q_bloom_filter_audit, O_BLOOM_FILTER_AUDIT
    ),
    QuerySpec("ab_test_readout", q_ab_test_readout, O_AB_TEST_READOUT),
    QuerySpec(
        "hll_distinct_audit", q_hll_distinct_audit, O_HLL_DISTINCT_AUDIT
    ),
    QuerySpec(
        "source_vocab_divergence",
        q_source_vocab_divergence,
        O_SOURCE_VOCAB_DIVERGENCE,
    ),
    QuerySpec("value_drift_chi2", q_value_drift_chi2, O_VALUE_DRIFT_CHI2),
    QuerySpec("top_session_paths", q_top_session_paths, O_TOP_SESSION_PATHS),
    QuerySpec("domain_quota_sample", q_domain_quota_sample, O_DOMAIN_QUOTA_SAMPLE),
    QuerySpec("incremental_dedup", q_incremental_dedup, O_INCREMENTAL_DEDUP),
    QuerySpec(
        "sliding_window_rate", q_sliding_window_rate, O_SLIDING_WINDOW_RATE
    ),
    QuerySpec("bm25_retrieval", q_bm25_retrieval, O_BM25_RETRIEVAL, headline=True),
    QuerySpec("token_pmi", q_token_pmi, O_TOKEN_PMI),
    QuerySpec("text_normalize", q_text_normalize, O_TEXT_NORMALIZE),
    QuerySpec("conversion_latency", q_conversion_latency, O_CONVERSION_LATENCY),
    QuerySpec("error_burst_join", q_error_burst_join, O_ERROR_BURST_JOIN),
    QuerySpec("weighted_sample", q_weighted_sample, O_WEIGHTED_SAMPLE),
    QuerySpec("lang_mix_gini", q_lang_mix_gini, O_LANG_MIX_GINI),
    QuerySpec("dup_rate_by_source", q_dup_rate_by_source, O_DUP_RATE_BY_SOURCE),
    QuerySpec("split_leakage", q_split_leakage, O_SPLIT_LEAKAGE),
    QuerySpec("vocab_coverage", q_vocab_coverage, O_VOCAB_COVERAGE),
    QuerySpec("ngram_novelty", q_ngram_novelty, O_NGRAM_NOVELTY),
    QuerySpec(
        "corpus_pipeline_e2e", q_corpus_pipeline_e2e, O_CORPUS_PIPELINE_E2E
    ),
    QuerySpec(
        "click_view_reconciliation",
        q_click_view_reconciliation,
        O_CLICK_VIEW_RECONCILIATION,
    ),
    QuerySpec("sequence_packing", q_sequence_packing, O_SEQUENCE_PACKING),
    QuerySpec(
        "sliding_unique_users", q_sliding_unique_users, O_SLIDING_UNIQUE_USERS
    ),
    QuerySpec("corpus_rebalance", q_corpus_rebalance, O_CORPUS_REBALANCE),
    QuerySpec(
        "event_path_transitions",
        q_event_path_transitions,
        O_EVENT_PATH_TRANSITIONS,
    ),
]
