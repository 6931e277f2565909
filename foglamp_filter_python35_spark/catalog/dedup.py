"""X1/X2 dedup queries over ``documents``, oracle-checked.

The MinHash oracle re-states the exact same algorithm in SQL — the hash
function is md5 (identical hex in Spark and DuckDB) with string-prefix
seeds, so signatures, bands, candidate sets, and verified pairs agree
bit-for-bit across engines.  No tolerance, no sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from foglamp_filter_python35_spark.catalog import QuerySpec, load
from foglamp_filter_python35_spark.functions import cache
from foglamp_filter_python35_spark.functions import dedup as D

# --- X1: exact dedup by content fingerprint (hash-groupBy, one shuffle) ---


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("fingerprint"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .orderBy("keep_doc_id")
    )


O_DEDUP_EXACT = """
SELECT md5(text) AS fingerprint,
       MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY md5(text)
ORDER BY keep_doc_id
"""

# --- X2a: MinHash + LSH near-dup detection ---

_NUM_HASHES = 12
_ROWS_PER_BAND = 2
_THRESHOLD = 0.8


def q_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.minhash_lsh_near_dups(
        docs,
        num_hashes=_NUM_HASHES,
        rows_per_band=_ROWS_PER_BAND,
        threshold=_THRESHOLD,
    ).orderBy("id_a", "id_b")


def _minhash_oracle() -> str:
    return _minhash_pairs_sql() + "\nORDER BY id_a, id_b"


def _minhash_pairs_sql() -> str:
    return (
        _minhash_cte_sql()
        + f"""
SELECT c.id_a, c.id_b,
       CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
FROM common c
JOIN sz sa ON sa.doc_id = c.id_a
JOIN sz sb ON sb.doc_id = c.id_b
WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= {_THRESHOLD}
"""
    )


def _minhash_cte_sql() -> str:
    from foglamp_filter_python35_spark.functions.dedup import MINHASH_PRIME

    p = MINHASH_PRIME
    sig_cols = ",\n         ".join(
        f"min((h1 + {i} * h2) % {p}) AS s{i}" for i in range(_NUM_HASHES)
    )
    n_bands = _NUM_HASHES // _ROWS_PER_BAND
    # concat ALL rows_per_band signature columns per band, generated from
    # the same constant as the Spark side (a hard-coded pair would
    # silently desynchronize the oracle if _ROWS_PER_BAND changes)
    band_selects = "\n  UNION ALL ".join(
        "SELECT doc_id, {b} AS band_id, md5({concat}) AS band_sig FROM sigs".format(
            b=b,
            concat=" || '|' || ".join(
                f"CAST(s{b * _ROWS_PER_BAND + r} AS VARCHAR)"
                for r in range(_ROWS_PER_BAND)
            ),
        )
        for b in range(n_bands)
    )
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(ts) - 1),
                i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS shingle
  FROM toks WHERE len(ts) >= 3
),
hashed AS (
  SELECT doc_id,
         CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT) % {p} AS h1,
         CAST('0x' || substring(md5(shingle), 17, 15) AS BIGINT) % {p} AS h2
  FROM sh
),
sigs AS (
  SELECT doc_id,
         {sig_cols}
  FROM hashed GROUP BY doc_id
),
bands AS (
  {band_selects}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_sig = b.band_sig
   AND a.doc_id < b.doc_id
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_common
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
"""


# --- G103: MinHash estimator accuracy audit ------------------------------
# Sketch QA: before trusting a 12-hash signature to gate dedup at 100 TB,
# measure how far the estimate strays from truth ON THIS CORPUS.  For
# every LSH candidate pair (threshold-free — the full range the bands
# surface), emit the exact Jaccard next to the signature estimate
# (matching-component fraction) and the absolute error.  Reuses the
# production candidate pipeline unchanged; the only additions are two
# candidate-bounded broadcast joins that carry (sset, s0..s11) together,
# so the md5 pipeline is not re-run per side beyond the near-dup query's
# own cost.  est = n_eq/12 and the error are single exact-rounded IEEE
# ops — engine-deterministic without quantization.


def q_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # the doc-set frame feeds THREE consumers here (banding + both audit
    # sides), so persist it — lazily, no job at plan build — emulating
    # the stored doc-set table the 100 TB pipeline reads (see
    # minhash_lsh_near_dups docstring); without it the md5 pipeline
    # would run once per consumer.  Registered for spec-level release
    # (functions.cache) so long sessions don't accumulate storage.
    ds = cache.register(D.minhash_doc_sets(docs, num_hashes=_NUM_HASHES))
    sigs = ds.select("doc_id", *[f"s{i}" for i in range(_NUM_HASHES)])
    bands = D.lsh_bands(sigs, "doc_id", _NUM_HASHES, _ROWS_PER_BAND)
    cands = D.candidate_pairs(bands, "doc_id")
    a = ds.select(
        F.col("doc_id").alias("id_a"),
        F.col("sset").alias("set_a"),
        *[F.col(f"s{i}").alias(f"a{i}") for i in range(_NUM_HASHES)],
    )
    b = ds.select(
        F.col("doc_id").alias("id_b"),
        F.col("sset").alias("set_b"),
        *[F.col(f"s{i}").alias(f"b{i}") for i in range(_NUM_HASHES)],
    )
    with_a = a.join(F.broadcast(cands), "id_a")
    both = b.join(F.broadcast(with_a), "id_b")
    n_common = F.size(F.array_intersect("set_a", "set_b"))
    jac = n_common.cast("double") / (
        F.size("set_a") + F.size("set_b") - n_common
    )
    n_eq = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(_NUM_HASHES)
    )
    est = n_eq.cast("double") / F.lit(float(_NUM_HASHES))
    return both.select(
        "id_a",
        "id_b",
        jac.alias("jaccard"),
        est.alias("est_jaccard"),
        F.abs(est - jac).alias("abs_err"),
    ).orderBy("id_a", "id_b")


def _minhash_accuracy_oracle() -> str:
    n_eq = " + ".join(
        f"CASE WHEN a.s{i} = b.s{i} THEN 1 ELSE 0 END"
        for i in range(_NUM_HASHES)
    )
    jac = (
        "CAST(COALESCE(cm.n_common, 0) AS DOUBLE)"
        " / (sa.n + sb.n - COALESCE(cm.n_common, 0))"
    )
    est = f"CAST(e.n_eq AS DOUBLE) / {_NUM_HASHES}.0"
    return (
        _minhash_cte_sql()
        + f""", est AS (
  SELECT c.id_a, c.id_b, ({n_eq}) AS n_eq
  FROM cand c
  JOIN sigs a ON a.doc_id = c.id_a
  JOIN sigs b ON b.doc_id = c.id_b)
SELECT e.id_a, e.id_b,
       {jac} AS jaccard,
       {est} AS est_jaccard,
       ABS({est} - {jac}) AS abs_err
FROM est e
LEFT JOIN common cm ON cm.id_a = e.id_a AND cm.id_b = e.id_b
JOIN sz sa ON sa.doc_id = e.id_a
JOIN sz sb ON sb.doc_id = e.id_b
ORDER BY e.id_a, e.id_b
"""
    )


# --- X2c: asymmetric containment dedup (snippet-in-document) ---

_CONTAIN_THRESHOLD = 0.9


def q_doc_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.ngram_containment_pairs(
        docs, threshold=_CONTAIN_THRESHOLD
    ).orderBy("id_a", "id_b")


O_DOC_CONTAINMENT = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(ts) - 1),
                i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS shingle
  FROM toks WHERE len(ts) >= 3
),
rare AS (
  SELECT sh.doc_id, sh.shingle
  FROM sh
  JOIN (SELECT shingle FROM sh GROUP BY shingle
        HAVING COUNT(*) <= {{max_df}}) dfreq USING (shingle)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_common
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT c.id_a, c.id_b,
       CAST(n_common AS DOUBLE) / LEAST(sa.n, sb.n) AS containment
FROM common c
JOIN sz sa ON sa.doc_id = c.id_a
JOIN sz sb ON sb.doc_id = c.id_b
WHERE CAST(n_common AS DOUBLE) / LEAST(sa.n, sb.n) >= {_CONTAIN_THRESHOLD}
ORDER BY id_a, id_b
""".replace("{max_df}", str(D.NGRAM_MAX_DF))


# --- X2b: exact n-gram Jaccard with prefix filtering (the non-probabilistic
# twin; same verify, candidates from shared-shingle join) ---


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, threshold=_THRESHOLD).orderBy(
        "id_a", "id_b"
    )


O_NGRAM_JACCARD = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(ts) - 1),
                i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS shingle
  FROM toks WHERE len(ts) >= 3
),
rare AS (
  SELECT sh.doc_id, sh.shingle
  FROM sh
  JOIN (SELECT shingle FROM sh GROUP BY shingle
        HAVING COUNT(*) <= {D.NGRAM_MAX_DF}) dfreq USING (shingle)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_common
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT c.id_a, c.id_b,
       CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
FROM common c
JOIN sz sa ON sa.doc_id = c.id_a
JOIN sz sb ON sb.doc_id = c.id_b
WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= {_THRESHOLD}
ORDER BY id_a, id_b
"""

# --- X2c: SimHash near-dups, oracle-checked.  The full bit pipeline has
# DuckDB twins: hex->bigint via CAST('0x'||...), shifts/masks, xor +
# bit_count for hamming — so signatures, bands, candidates, and distances
# agree exactly. ---


def q_simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.simhash_near_dups(docs).orderBy("id_a", "id_b")


def _simhash_oracle() -> str:
    bits = D.SIMHASH_BITS
    n_bands = 4
    bpb = bits // n_bands
    max_hamming = 3
    bit_sums = ",\n         ".join(
        f"SUM(((h >> {j}) & 1) * 2 - 1) AS b{j}" for j in range(bits)
    )
    sig_terms = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN CAST(1 AS BIGINT) ELSE 0 END << {j})"
        for j in range(bits)
    )
    band_selects = "\n  UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band_id, "
        f"(simhash >> {b * bpb}) & {(1 << bpb) - 1} AS band_val FROM sigs"
        for b in range(n_bands)
    )
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(ts) - 1),
                i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS shingle
  FROM toks WHERE len(ts) >= 3
),
hashed AS (
  SELECT doc_id,
         CAST('0x' || substring(md5(shingle), 1, 8) AS BIGINT) AS h
  FROM sh
),
bitsums AS (
  SELECT doc_id,
         {bit_sums}
  FROM hashed GROUP BY doc_id
),
sigs AS (
  SELECT doc_id, {sig_terms} AS simhash FROM bitsums
),
bands AS (
  {band_selects}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS sim_a, b.simhash AS sim_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(sim_a, sim_b)) <= {max_hamming}
ORDER BY id_a, id_b
"""


# --- X2f: ensemble near-dup detection — a pair is a duplicate only when
# >= 2 of the 3 independent signals (MinHash-Jaccard, SimHash-Hamming,
# asymmetric containment) agree.  The production pattern for cutting
# single-signal false positives before an expensive human/LLM review
# queue.  Each signal emits a pair at most once (their candidate sets
# are DISTINCT), so the vote count is exact; the oracle nests the three
# signals' full SQL as independent CTE scopes and re-aggregates.  The
# three signals share ONE tokenize+shingle scan: the (id, sset) frame is
# persisted (registered for spec-level release) and MinHash folds over
# it while SimHash/containment explode it — exactly the stored shingle
# table a 100 TB pipeline computes once and reads per signal.

_ENSEMBLE_MIN_VOTES = 2


def q_dedup_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    sets = cache.register(D.doc_shingle_sets(docs))
    sh = sets.select("doc_id", F.explode("sset").alias("shingle"))

    ds = D.minhash_sets_signatures(sets, num_hashes=_NUM_HASHES)
    sigs = ds.select("doc_id", *[f"s{i}" for i in range(_NUM_HASHES)])
    bands = D.lsh_bands(sigs, "doc_id", _NUM_HASHES, _ROWS_PER_BAND)
    cands = D.candidate_pairs(bands, "doc_id")
    mh = (
        D.pair_jaccard_from_sets(cands, sets, "doc_id")
        .filter(F.col("jaccard") >= _THRESHOLD)
        .select("id_a", "id_b")
    )
    sim = D.simhash_from_shingles(sh).select("id_a", "id_b")
    # persist_tags: the DF-tagged shingle stream feeds four consumers in
    # the containment branch; persisting it here (measured 3.12s ->
    # 1.97s for the branch, r18) composes with the sets persist above —
    # standalone doc_containment measured the same persist flat-to-worse
    # and keeps the default (see _df_pruned_and_stats)
    cont = D.containment_from_shingles(
        sh, sets, threshold=_CONTAIN_THRESHOLD, persist_tags=True
    ).select("id_a", "id_b")
    votes = (
        mh.withColumn("src", F.lit("minhash"))
        .unionByName(sim.withColumn("src", F.lit("simhash")))
        .unionByName(cont.withColumn("src", F.lit("containment")))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_votes"),
            F.concat_ws(",", F.sort_array(F.collect_list("src"))).alias(
                "sources"
            ),
        )
    )
    return votes.filter(
        F.col("n_votes") >= _ENSEMBLE_MIN_VOTES
    ).orderBy("id_a", "id_b")


def _dedup_ensemble_oracle() -> str:
    mh = _minhash_pairs_sql()
    sim = _simhash_oracle().rpartition("ORDER BY")[0]
    cont = O_DOC_CONTAINMENT.rpartition("ORDER BY")[0]
    return f"""
WITH mh AS ({mh}),
sim AS ({sim}),
cont AS ({cont}),
allv AS (
  SELECT id_a, id_b, 'minhash' AS src FROM mh
  UNION ALL SELECT id_a, id_b, 'simhash' FROM sim
  UNION ALL SELECT id_a, id_b, 'containment' FROM cont)
SELECT id_a, id_b,
       CAST(COUNT(*) AS BIGINT) AS n_votes,
       array_to_string(list_sort(list(src)), ',') AS sources
FROM allv
GROUP BY id_a, id_b
HAVING COUNT(*) >= {_ENSEMBLE_MIN_VOTES}
ORDER BY id_a, id_b
"""


# --- X2d: duplicate-cluster labeling — connected components over the
# MinHash near-dup pairs via alternating large-star/small-star
# contraction, which converges in O(log^2 n) rounds independent of
# component diameter (a billion-node dup chain is ~30 rounds, where
# fixed-round HashMin would need a round per hop).  The oracle computes
# TRUE components by transitive closure, so parity proves convergence
# was exact; labels are component minima either way, so the output is
# identical to the HashMin path (tested). ---


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_near_dups(
        docs,
        num_hashes=_NUM_HASHES,
        rows_per_band=_ROWS_PER_BAND,
        threshold=_THRESHOLD,
    )
    return (
        D.connected_components_star(pairs)
        .select(F.col("node").alias("doc_id"), F.col("comp").alias("component"))
        .orderBy("doc_id")
    )


def _clusters_cte() -> str:
    """Shared CTE chain: transitive-closure components over the MinHash
    near-dup pairs, ending in a ``comp(doc_id, component)`` CTE."""
    return f"""
WITH RECURSIVE pairs AS MATERIALIZED (
  SELECT id_a, id_b FROM ({_minhash_pairs_sql()}) p
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u
),
comp AS (
  SELECT n.u AS doc_id, LEAST(n.u, MIN(r.v)) AS component
  FROM (SELECT DISTINCT u FROM edges) n
  JOIN reach r ON r.u = n.u
  GROUP BY n.u
)"""


def _clusters_oracle() -> str:
    return f"""
{_clusters_cte()}
SELECT doc_id, component FROM comp
ORDER BY doc_id
"""


# --- X2d-b (G98): duplicate-cluster size histogram — the QA readout for
# the clustering step (the CC twin of G87's IVF cell-balance audit): a
# heavy tail of giant clusters means the near-dup threshold is too
# loose, thousands of singleton pairs mean it is too tight.  Cluster
# sizes come from one count agg over the CC labels; log2 bucketing is
# the integer-exact digits-of-bin trick (no transcendentals).  Scale:
# everything after the CC step is O(clusters) rows. ---


def q_dedup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_near_dups(
        docs,
        num_hashes=_NUM_HASHES,
        rows_per_band=_ROWS_PER_BAND,
        threshold=_THRESHOLD,
    )
    sizes = (
        D.connected_components_star(pairs)
        .groupBy("comp")
        .agg(F.count(F.lit(1)).alias("csize"))
    )
    return (
        sizes.withColumn("bucket", F.length(F.bin("csize")).cast("bigint"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("csize").alias("n_docs"),
            F.max("csize").alias("max_size"),
        )
        .orderBy("bucket")
    )


def _cluster_histogram_oracle() -> str:
    return f"""
{_clusters_cte()},
sizes AS (
  SELECT component, CAST(COUNT(*) AS BIGINT) AS csize
  FROM comp GROUP BY component)
SELECT CAST(length(bin(csize)) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(csize) AS BIGINT) AS n_docs,
       CAST(MAX(csize) AS BIGINT) AS max_size
FROM sizes
GROUP BY bucket
ORDER BY bucket
"""


# --- X2e: dedup APPLY — the materialization step closing the arc
# detect -> cluster -> keep one canonical doc per cluster.  Losers
# (cluster members that are not their component's minimum id) are
# flagged by a LEFT join against the corpus scan, then ONE per-source
# audit rollup (the oracle's exact shape — an inner join of separate
# total/kept aggregates would silently drop a source whose docs are ALL
# losers).  No broadcast hint: the loser list is O(duplicate docs) —
# unbounded at corpus scale — so AQE picks broadcast only when it fits.
# At 100 TB this is the pass that writes the deduplicated corpus back
# to storage.


def q_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_near_dups(
        docs,
        num_hashes=_NUM_HASHES,
        rows_per_band=_ROWS_PER_BAND,
        threshold=_THRESHOLD,
    )
    comp = D.connected_components_star(pairs)
    losers = comp.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias("doc_id"), F.lit(1).alias("_loser")
    )
    flagged = docs.select("doc_id", "source").join(
        losers, "doc_id", "left"
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(
                F.when(F.col("_loser").isNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_kept"),
            F.sum(
                F.when(F.col("_loser").isNull(), 0).otherwise(1)
            ).cast("bigint").alias("n_removed"),
        )
        .orderBy("source")
    )


def _dedup_apply_oracle() -> str:
    return f"""
{_clusters_cte()},
losers AS (SELECT doc_id FROM comp WHERE component <> doc_id)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN l.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN l.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS n_removed
FROM documents d LEFT JOIN losers l ON d.doc_id = l.doc_id
GROUP BY source
ORDER BY source
"""


SPECS = [
    QuerySpec("dedup_exact", q_dedup_exact, O_DEDUP_EXACT),
    QuerySpec(
        "minhash_lsh_dedup", q_minhash_lsh_dedup, _minhash_oracle(),
        headline=True,
    ),
    QuerySpec(
        "minhash_accuracy", q_minhash_accuracy, _minhash_accuracy_oracle()
    ),
    QuerySpec("ngram_jaccard_pairs", q_ngram_jaccard_pairs, O_NGRAM_JACCARD),
    QuerySpec("doc_containment", q_doc_containment, O_DOC_CONTAINMENT),
    QuerySpec("simhash_dedup", q_simhash_dedup, _simhash_oracle()),
    QuerySpec("dedup_clusters", q_dedup_clusters, _clusters_oracle()),
    QuerySpec(
        "dedup_cluster_histogram",
        q_dedup_cluster_histogram,
        _cluster_histogram_oracle(),
    ),
    QuerySpec("dedup_apply", q_dedup_apply, _dedup_apply_oracle()),
    QuerySpec("dedup_ensemble", q_dedup_ensemble, _dedup_ensemble_oracle()),
]
