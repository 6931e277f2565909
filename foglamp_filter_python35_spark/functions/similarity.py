"""X3 — similarity search over embedding columns (array<float>).

All vector math is Catalyst higher-order functions (``zip_with`` +
``aggregate``) — a strict left-fold in doubles, which is bit-identical to
DuckDB's ``list_inner_product`` over DOUBLE[], making every query here
oracle-exact with zero tolerance.

Scale design:

* brute-force top-k: the query vector is a broadcast one-row dim; the
  scan is embarrassingly parallel; top-k is a TakeOrdered (no global
  sort).  This is the *baseline* and also the correct plan for one query
  vector at any corpus size.
* all-pairs near-dup at 100 TB must prune candidates: ``ivf_assign``
  gives a coarse quantizer (cluster on centroid id -> equi-join within
  cells), the same pattern as the LSH banding in ``dedup``.  The
  brute-force pair query exists as the correctness oracle at test scale.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd  # noqa: TC002 — must be module-global: pandas_udf
# resolves the (future-annotations-stringified) pd.Series hints through
# this module's globals at decoration time
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from foglamp_filter_python35_spark.functions import cache

# ---------------------------------------------------------------------------
# Fast vector mode (same toggle pattern as catalog.approx_mode): the exact
# path computes dots as Catalyst higher-order functions — a strict
# left-fold in doubles, bit-identical to DuckDB's list arithmetic, which
# the oracle gate requires.  But higher-order functions are INTERPRETED
# per element (never whole-stage-codegen'd), and the round-6 scale probe
# measured them dominating the tuned pair-verify at 200k vectors.  Fast
# mode swaps dot/norm for ONE Arrow-batched numpy kernel (SIMD pairwise
# summation) — last-bit rounding differs, so exact stays the default and
# fast mode is the documented 100 TB hot path.
# ---------------------------------------------------------------------------

_FAST = os.environ.get("SPARK_GRAFT_FAST_VECTOR", "") == "1"


def fast_vector_enabled() -> bool:
    return _FAST


def set_fast_vector_mode(on: bool) -> None:
    global _FAST  # noqa: PLW0603
    _FAST = bool(on)


class fast_vector_mode:  # noqa: N801 — context-manager, used as a function
    def __init__(self, on: bool = True) -> None:
        self._on = on

    def __enter__(self) -> None:
        self._old = _FAST
        set_fast_vector_mode(self._on)

    def __exit__(self, *exc) -> None:
        set_fast_vector_mode(self._old)


def _np_dot_udf() -> object:
    """Arrow-batched numpy dot: one stacked einsum per batch when dims
    are uniform (the corpus contract), per-row fallback handling NULLs
    and ragged dims with the exact path's NULL-propagation semantics.

    Corrupt-vector contract (measured, pinned by
    tests/test_fast_vector.py): Arrow delivers a NULL *element* inside a
    correctly-dimensioned float vector as NaN — indistinguishable from a
    genuine NaN element — so the kernel canonicalizes every NaN dot to
    NULL explicitly (nullable Float64 return, not the serializer's
    nan-as-null default).  Downstream ``score >= threshold`` filters
    therefore DROP corrupt rows in fast mode.  The exact fold yields
    NULL for a NULL element but NaN for a NaN element, and Spark orders
    NaN above all doubles, so the exact path *accepts* NaN-element rows
    — fast mode's NULL is the safe side of that divergence."""

    @F.pandas_udf("double")
    def np_dot(a: pd.Series, b: pd.Series) -> pd.Series:
        try:
            av = np.stack(a.to_numpy()).astype(np.float64)
            bv = np.stack(b.to_numpy()).astype(np.float64)
            if av.shape != bv.shape:
                raise ValueError
            res = np.einsum("ij,ij->i", av, bv)
        except (ValueError, TypeError):
            res = [
                float(
                    np.asarray(x, dtype=np.float64)
                    @ np.asarray(y, dtype=np.float64)
                )
                if x is not None and y is not None and len(x) == len(y)
                else None
                for x, y in zip(a, b)
            ]
        # canonicalize: None (fallback) -> NaN -> explicit <NA> mask ->
        # Spark NULL.  An explicit nullable mask, not the serializer's
        # nan-as-null default, so the contract survives Arrow upgrades.
        resf = np.asarray(res, dtype=np.float64)
        out = pd.array(resf, dtype="Float64")
        out[np.isnan(resf)] = pd.NA
        return pd.Series(out)

    return np_dot


def _dot_sql(a: str, b: str) -> str:
    """The exact-mode dot as SQL text — the same Catalyst tree the
    Column form builds (zip_with cast-to-double multiply, strict
    left-fold from 0.0), for callers passing COLUMN NAMES: one parsed
    expression is ~0.5ms of driver time where the Column form pays
    ~70ms of py4j lambda plumbing per call (r18 build-time profile)."""
    return (
        f"aggregate(zip_with({a}, {b},"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " 0.0D, (acc, v) -> acc + v)"
    )


def dot(a: Column | str, b: Column | str) -> Column:
    """Double dot product.  Exact mode (default): left-fold over
    ``zip_with`` — bit-compatible with DuckDB, required by the oracle
    gate.  Fast mode: Arrow-batched numpy (see ``fast_vector_mode``).

    Mismatched dimensions propagate as NULL in both modes (zip_with pads
    the shorter side) — downstream score filters drop such rows rather
    than crash; audit with a ``size(a) != size(b)`` check when corpus
    hygiene is in question (e.g. mixed embedding-model versions).

    Corrupt elements: a NULL element yields NULL in both modes; a NaN
    element yields NULL in fast mode (the kernel canonicalizes NaN dots
    to NULL — Arrow can't distinguish the two) but NaN in exact mode,
    which Spark orders ABOVE all doubles, so exact-mode ``score >=
    threshold`` filters accept such rows.  Audit NaN elements with
    ``exists(v, x -> isnan(x))`` when corpus hygiene is in question;
    see ``_np_dot_udf`` and tests/test_fast_vector.py."""
    if _FAST:
        ac = F.col(a) if isinstance(a, str) else a
        bc = F.col(b) if isinstance(b, str) else b
        return _np_dot_udf()(ac, bc)
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_dot_sql(f"`{a}`", f"`{b}`"))
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    if isinstance(a, str) and not _FAST:
        q = f"`{a}`"
        return F.expr(f"sqrt({_dot_sql(q, q)})")
    if isinstance(a, str):
        a = F.col(a)
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL (excluded downstream, never a crash) for
    zero-norm vectors — under Spark 4's default ANSI mode a bare division
    would abort the whole job on one degenerate row."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def brute_force_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of ``emb`` against a ONE-ROW ``query`` DataFrame
    holding column ``qv``.  Broadcast + project + TakeOrdered.

    The query norm is computed ONCE inside the broadcast side (r17):
    inlined ``cosine`` would re-fold ``norm(qv)`` per corpus row, and the
    interpreted higher-order fold is the per-row cost here.  The factored
    ``dot/(norm_a*_qn)`` is the same IEEE expression, bit-identical."""
    q = query.select(F.col("qv"), norm("qv").alias("_qn"))
    scored = emb.crossJoin(F.broadcast(q)).select(
        F.col(id_col),
        F.try_divide(
            dot(vec_col, "qv"),
            norm(vec_col) * F.col("_qn"),
        ).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def knn_join(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    query_vec_col: str = "qv",
) -> DataFrame:
    """Batch top-k: cosine k nearest corpus vectors for EVERY query
    vector.  The query set is broadcast (it's the small side by
    construction); scoring is a map-side projection over the corpus scan;
    the per-query top-k is a window ranked on (score desc, id) — at scale
    that shuffles only on qid, and candidate rows per task are bounded by
    the rank filter pushed into the sort."""
    from pyspark.sql import Window  # noqa: PLC0415

    # norms factored out of the multiplying join (r17): corpus norms are
    # computed once per corpus row BELOW the join (not once per
    # (row x query) pair) and query norms once per query inside the
    # broadcast.  dot/(_vn*_qn) is the identical IEEE expression to the
    # inline cosine — bit-identical scores, ~3x less interpreted fold
    # work per scored pair.
    embn = emb.select(
        F.col(id_col),
        F.col(vec_col),
        norm(vec_col).alias("_vn"),
    )
    qn = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col),
        norm(query_vec_col).alias("_qn"),
    )
    scored = embn.crossJoin(F.broadcast(qn)).select(
        F.col(query_id_col),
        F.col(id_col),
        F.try_divide(
            dot(vec_col, query_vec_col),
            F.col("_vn") * F.col("_qn"),
        ).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )


# ---------------------------------------------------------------------------
# Measured sketch-sizing rules (round-6 scale probe, SCALE.md "Round-6
# measured scale probe") promoted to API defaults.  At a FIXED sketch
# keyspace, candidate pairs grow O(n^2 / keyspace) — the probe measured
# the catalog's pinned constants going quadratic at 10x data, while the
# same operators with keyspace grown alongside n stayed flat-to-5x at
# 100x.  The rules: sign-LSH keeps 4 bands and grows bits so the
# expected band-bucket volume stays ~constant (2^bits ∝ n); IVF grows
# the cell count so the expected cell volume stays ~constant
# (cells ∝ n), with the assignment stored at ingest.  target volume 125
# reproduces the probe's measured schedule exactly:
# n=2k -> (16 planes, 4 bits) / 16 cells;  n=20k -> (32, 8) / 160;
# n=200k -> (44, 11) / 1600.
# ---------------------------------------------------------------------------

_SKETCH_BANDS = 4
_SKETCH_TARGET_VOLUME = 125


def lsh_config(
    n: int,
    bands: int = _SKETCH_BANDS,
    target_bucket: int = _SKETCH_TARGET_VOLUME,
) -> tuple[int, int]:
    """Size-derived sign-LSH config for a corpus of ``n`` vectors:
    ``(n_planes, bits_per_band)`` with ``bands`` bands and the expected
    band-bucket volume held at ``target_bucket`` (``2^bits ∝ n``).
    Floor of 4 bits keeps tiny corpora on the catalog's oracle-pinned
    constants.  This is ``rp_lsh_near_dups``'s default when no explicit
    sketch parameters are passed."""
    import math  # noqa: PLC0415

    bits = max(4, math.ceil(math.log2(max(1.0, n / target_bucket))))
    return bands * bits, bits


def ivf_cell_count(
    n: int, target_cell: int = _SKETCH_TARGET_VOLUME
) -> int:
    """Size-derived IVF cell count: ``cells ∝ n`` with the expected cell
    volume held at ``target_cell`` — the stored-assignment deployment
    shape (the in-cell pair join stays linear in n; the one-off O(n*k)
    assignment is paid at ingest and persisted partitioned by cid).
    Floor of 16 cells keeps tiny corpora on the catalog's oracle-pinned
    constant."""
    import math  # noqa: PLC0415

    return max(16, math.ceil(n / target_cell))


def seed_centroids(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse-quantizer seed: the ``k`` lowest-id vectors
    as (cid, cv) — the same seeding the catalog's k-means trainer and
    the scale probe use.  Coarse quantization only needs an even-ish
    partition of the corpus for candidate pruning (precision is exact —
    recall is the tunable); swap in k-means-trained centroids
    (``ivf_train_kmeans``) when cell balance matters.

    Not a global sort: ``orderBy(id).limit(k)`` compiles to
    ``TakeOrderedAndProject`` — per-partition top-k merged on the
    driver, O(n) scan + O(k log k) merge, verified in the physical
    plan — so seeding stays cheap at corpus scale."""
    return (
        emb.orderBy(F.col(id_col))
        .limit(k)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
    )


def random_hyperplanes(n_planes: int, dim: int, seed: int = 42):
    """Deterministic random hyperplanes for sign-LSH, as plain Python
    lists — embedded as literals into BOTH the Spark plan and the DuckDB
    oracle so the bucketing is engine-identical.  (A fixed seed, not
    runtime randomness: reproducibility is part of the operator
    contract.)"""
    import random  # noqa: PLC0415

    rng = random.Random(seed)
    return [
        [rng.uniform(-1.0, 1.0) for _ in range(dim)]
        for _ in range(n_planes)
    ]


def _np_bands_udf(planes: list[list[float]], bits_per_band: int) -> object:
    """Fast-mode sketch kernel: ALL plane dots as ONE matmul per Arrow
    batch.  The naive fast path (one numpy dot per plane) marshals the
    vector column through Arrow once per plane — at 44 planes the
    round-6 probe measured it 3x SLOWER than the interpreted exact
    fold; a single (batch x dim) @ (dim x planes) matmul is the shape
    that wins.  Sign agreement with the exact fold differs only for
    dots within rounding error of 0 — measure-zero for real-valued
    random hyperplanes, and fast mode is tolerance-bearing by
    contract.

    Degenerate rows mirror the exact fold EXACTLY: a NULL or
    dimension-mismatched vector has NULL plane dots there, and
    ``when(d >= 0, 1).otherwise(0)`` turns a NULL dot into bit 0 — so
    such rows surface ALL-ZERO band values (bucketing with genuine
    all-negative-dot rows), never a NULL array and never a task crash.
    Remainder planes (``len(planes) % bits_per_band``) are dropped in
    both modes.

    NaN-element caveat (same root as the ``dot`` contract): a NaN
    element makes every plane dot NaN — numpy's ``nan >= 0`` is False
    (all bits 0, the degenerate-row bucket), while Spark's
    NaN-is-largest ordering makes the exact fold's ``d >= 0`` true
    (all bits 1).  Either way the corrupt row lands in ONE constant
    bucket; in fast mode its candidate pairs are then dropped by the
    cosine verify (NaN scores canonicalize to NULL), while in exact
    mode a NaN score passes ``>= threshold`` — the same documented
    exact-mode acceptance as in ``dot``."""
    n_bands = len(planes) // bits_per_band
    plane_mat = np.asarray(
        planes[: n_bands * bits_per_band], dtype=np.float64
    ).T  # (dim, used planes)
    weights = 1 << np.arange(bits_per_band, dtype=np.int32)
    zero_row = np.zeros(n_bands, dtype=np.int32)

    @F.pandas_udf("array<int>")
    def np_bands(vec: pd.Series) -> pd.Series:
        def row_fallback(x):
            if x is None or len(x) != plane_mat.shape[0]:
                return zero_row  # exact path: NULL dots -> all bits 0
            d = np.asarray(x, dtype=np.float64) @ plane_mat
            bits = (d >= 0).astype(np.int32)
            return bits.reshape(n_bands, bits_per_band) @ weights

        try:
            v = np.stack(vec.to_numpy()).astype(np.float64)
            # an all-NULL batch stacks to a 1-D object array — ndim
            # check routes it to the row fallback like any ragged batch
            if v.ndim != 2 or v.shape[1] != plane_mat.shape[0]:
                raise ValueError
            bits = (v @ plane_mat >= 0).astype(np.int32)
            vals = bits.reshape(len(v), n_bands, bits_per_band) @ weights
            return pd.Series(list(vals))
        except (ValueError, TypeError):
            return pd.Series([row_fallback(x) for x in vec])

    return np_bands


def rp_lsh_sketch(
    vec: Column | str, planes: list[list[float]], bits_per_band: int
) -> Column:
    """Sign-LSH band values: one integer per band, bit i = sign of the
    dot product with plane (band*bits+i).  All JVM-side arithmetic in
    exact mode; one Arrow-batched matmul kernel in fast mode.  Pass the
    vector column as a NAME (string) on hot paths — see the expr branch
    below."""
    if _FAST:
        vc = F.col(vec) if isinstance(vec, str) else vec
        return _np_bands_udf(planes, bits_per_band)(vc)
    # Kept as n_planes separate scalar folds DELIBERATELY (r17 probe):
    # a single-pass matrix fold (one aggregate with an n_planes-wide
    # accumulator over a transposed plane literal) was prototyped and
    # measured SLOWER (0.40s vs 0.25s at sf0.1, 16x64) — the per-step
    # array allocation outweighs the saved passes — and Spark 4.1's
    # ``aggregate`` with an array-typed accumulator additionally resets
    # NULL slots to the init value (measured: [[1.0,2.0],[NULL,3.0]]
    # zip_with-add folds to [0.0,5.0], not [NULL,5.0]), which forces an
    # input-sanitizing guard on that shape.  Scalar-accumulator folds
    # have none of these problems.
    n_bands = len(planes) // bits_per_band
    if isinstance(vec, str):
        # ONE parsed SQL expression for the whole sketch instead of
        # ~1100 Column-API py4j round trips (16 planes x 64 F.lit each
        # measured ~1.2s of pure driver latency per plan build, r18).
        # repr() is Python's shortest round-trip float form and Spark
        # parses double literals via Java parseDouble — the same IEEE
        # value bit-for-bit — so the parsed tree equals the Column-built
        # tree and band values are identical (pinned by the LSH oracle
        # parity and test_sketch_sizing).
        v = f"`{vec}`"

        def plane_dot(plane: list[float]) -> str:
            arr = ", ".join(f"{x!r}D" for x in plane)
            return (
                f"aggregate(zip_with({v}, array({arr}),"
                " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
                " 0.0D, (acc, v) -> acc + v)"
            )

        band_exprs = []
        for b in range(n_bands):
            terms = " + ".join(
                f"(CASE WHEN {plane_dot(planes[b * bits_per_band + i])}"
                f" >= 0 THEN 1 ELSE 0 END) * {1 << i}"
                for i in range(bits_per_band)
            )
            band_exprs.append(terms)
        return F.expr(f"array({', '.join(band_exprs)})")
    bands = []
    for b in range(n_bands):
        val: Column | None = None
        for i in range(bits_per_band):
            plane = planes[b * bits_per_band + i]
            d = dot(vec, F.array(*[F.lit(x) for x in plane]))
            bit = F.when(d >= 0, F.lit(1)).otherwise(F.lit(0))
            term = bit * F.lit(1 << i)
            val = term if val is None else val + term
        bands.append(val.alias(f"band{b}"))
    return F.array(*bands)


def rp_lsh_near_dups(
    emb: DataFrame,
    threshold: float,
    n_planes: int | None = None,
    bits_per_band: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
    n: int | None = None,
) -> DataFrame:
    """Near-duplicate vectors by random-hyperplane LSH + exact cosine
    verify — the LSH-bucketed alternative to IVF pruning.

    Vectors agreeing on ANY band (bits_per_band sign bits) become
    candidates via a band-bucket equi-join (linear in bucket volume, the
    same shape as MinHash banding); exact cosine then filters to
    >= threshold.  Precision is exact; recall is tuned by
    n_planes/bits_per_band.  The all-pairs product is never formed.

    Sketch sizing defaults to the measured scale rule ``lsh_config(n)``
    (``2^bits ∝ n``, 4 bands — SCALE.md round-6 probe: flat at 10x,
    5.0x wall at 100x, where a fixed keyspace is quadratic).  Pass BOTH
    ``n_planes`` and ``bits_per_band`` to pin an explicit sketch, or
    neither to size from the corpus — since r9 the catalog's
    ``embedding_lsh_dup`` takes the defaults path too (at gate scales
    ``lsh_config`` reproduces the oracle's pinned constants exactly, so
    the driver gates the production path).

    Pass ``dim`` (the embedding dimensionality) and ``n`` (the corpus
    row count) — both config, known to any real corpus — so plan
    construction launches no Spark job; omitting them falls back to a
    probe row / a count job, a convenience for interactive use.
    """
    if (n_planes is None) != (bits_per_band is None):
        raise ValueError(
            "pass both n_planes and bits_per_band (explicit sketch) or"
            " neither (size-derived via lsh_config)"
        )
    if n_planes is None:
        if n is None:
            n = emb.count()
        n_planes, bits_per_band = lsh_config(n)
    if dim is None:
        dim = emb.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    planes = random_hyperplanes(n_planes, dim, seed)
    n_bands = n_planes // bits_per_band
    sk = emb.select(
        F.col(id_col),
        F.col(vec_col),
        rp_lsh_sketch(vec_col, planes, bits_per_band).alias("bands"),
    )
    # ids-only banding: the band self-join multiplies rows by bucket
    # volume, so shipping the vectors through it would shuffle
    # O(candidates x dim) floats.  Join narrow (id, band) rows instead,
    # dedupe the id pairs, then fetch each side's vector once via an
    # id-keyed join (AQE broadcasts the vector side at small scale; at
    # corpus scale it is a shuffle join on the 8-byte id — either way the
    # wide arrays never ride the multiplied join).
    banded = sk.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.col("bands")[b].alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_id", "band.band_val")
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        # the exact-verify fold is CPU-bound (~5us/pair interpreted),
        # but the candidate stream is BYTE-tiny (16 B/row), so AQE's
        # size-based coalescing collapses the band-join output to one
        # post-shuffle partition and the whole verify runs serially
        # (measured at sf0.1: 515k candidates -> 1 partition, fold
        # verify 3.36s on one core vs 0.51s spread; an Arrow-batched
        # dot kernel only reached 1.69s — tools/r18_lsh_verify_isolate
        # .py).  Hash-repartitioning the slim id pairs to the session's
        # core count is the cheapest possible exchange (ids only, the
        # wide vectors are fetched after), spreads the fold evenly, and
        # removes the hot-band straggler at any scale; values are
        # untouched so results are bit-identical.
        .repartition(
            emb.sparkSession.sparkContext.defaultParallelism,
            "id_a",
            "id_b",
        )
    )
    # per-vector norms are computed ONCE before the pair join (sqrt is
    # IEEE-exact, so dot/(norm_a*norm_b) is bit-identical to the inline
    # cosine) — each candidate pair then costs one dot product, not three
    va = emb.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        norm(vec_col).alias("norm_a"),
    )
    vb = emb.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        norm(vec_col).alias("norm_b"),
    )
    scored = (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.try_divide(
                dot("va", "vb"),
                F.col("norm_a") * F.col("norm_b"),
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )
    # a pair agreeing on k bands surfaces k times; dedup AFTER the
    # threshold filter so the heavy shuffle dedups O(results), not
    # O(candidates) — duplicate rows carry identical scores
    return scored.dropDuplicates(["id_a", "id_b"])


def cosine_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine >= threshold — exact, O(n^2) BY CONSTRUCTION.

    TEST-SCALE ORACLE ONLY: this is the ground-truth twin that pruned
    variants (``ivf_cell_pairs``, ``rp_lsh_near_dups``) are validated
    against in tests.  It is deliberately NOT exposed as a catalog query;
    at corpus scale the pair join is quadratic and must never run."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a",
            "id_b",
            cosine("va", "vb").alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def ivf_cell_pairs(
    emb: DataFrame,
    centroids: DataFrame | None,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: DataFrame | None = None,
    n: int | None = None,
) -> DataFrame:
    """Near-duplicate vector pairs with IVF coarse-quantizer pruning +
    exact cosine verify — the scale path for all-pairs similarity.

    Vectors are assigned to their max-cosine centroid; candidate pairs
    come from an EQUI-JOIN on the cell id (never an all-pairs theta
    join), then exact cosine filters to >= threshold.  Precision is
    exact; recall contract: a pair straddling a cell boundary is missed
    — recall is tuned by the number of centroids (fewer cells = higher
    recall, bigger buckets).  At 100 TB the assignment is a precomputed
    stored column and the corpus is partitioned by cid, so the pair join
    is partition-local; a jumbo cell is handled by salting the verify or
    splitting the centroid, not by widening the join.

    ``assign`` is that stored-column path made explicit: pass a
    precomputed ``(id_col, cid)`` assignment (e.g. persisted at ingest)
    and the coarse quantization is skipped entirely — ``centroids`` may
    then be None.  The recurring dedup pass pays only the cell-local
    pair join + exact verify (measured in SCALE.md's round-6 probe:
    100x vectors in 22.8x wall).

    With BOTH ``centroids`` and ``assign`` omitted, the cell count is
    sized from the corpus by the measured scale rule ``ivf_cell_count``
    (``cells ∝ n`` — constant expected cell volume, so the pair join
    stays linear in n) and centroids are the deterministic
    ``seed_centroids`` pick; pass ``n`` (corpus row count — config at
    any real deployment) to skip the sizing count job."""
    if assign is None:
        if centroids is None:
            if n is None:
                n = emb.count()
            centroids = seed_centroids(
                emb, ivf_cell_count(n), id_col, vec_col
            )
        assign = ivf_assign(emb, centroids, id_col, vec_col)
    # the cell join multiplies rows by cell volume — keep it ids-only and
    # fetch vectors + precomputed norms per side afterwards (one dot
    # product per pair instead of three; sqrt is IEEE-exact so the score
    # is bit-identical to the inline cosine)
    a = assign.select(F.col(id_col).alias("id_a"), "cid")
    b = assign.select(F.col(id_col).alias("id_b"), "cid")
    # same serial-verify hazard as rp_lsh_near_dups: the assign frame is
    # tiny post-aggregation, AQE coalesces it to ~1 partition, and the
    # cell join then emits EVERY candidate pair in that one task, so the
    # exact-verify fold (~5us/pair interpreted) runs serially.  Spread
    # the slim (id_a, id_b) pairs across the session's cores before
    # fetching the wide vectors — values untouched, bit-identical.
    pairs = (
        a.join(b, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .repartition(
            emb.sparkSession.sparkContext.defaultParallelism,
            "id_a",
            "id_b",
        )
    )
    va = emb.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        norm(vec_col).alias("norm_a"),
    )
    vb = emb.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        norm(vec_col).alias("norm_b"),
    )
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.try_divide(
                dot("va", "vb"),
                F.col("norm_a") * F.col("norm_b"),
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Coarse quantization: assign every vector to its max-cosine centroid
    (broadcast centroids; deterministic tie-break on the LOWEST cid).

    ``centroids`` must have columns (cid, cv).  Returns (id, cid).
    At 100 TB this is the partitioner: downstream searches touch one cell
    (or a probe list) instead of the whole corpus.

    Numeric cids take the hash-aggregate argmax (partial-aggregatable —
    the scale path); any other orderable cid type (string labels, ...)
    falls back to the window form, which is semantically identical but
    shuffle-sorts the n x k scored rows (ADVICE r6: the negated-cid
    trick in the aggregate is numeric-only, and Spark 4 ANSI mode makes
    that a hard error rather than a silent wrong tie-break).
    """
    from pyspark.sql.types import NumericType  # noqa: PLC0415

    # norms factored out of the k-way multiply (r17): the inline cosine
    # re-folds norm(v) once per (vector x centroid) row — k times per
    # vector — and the interpreted fold is the dominant per-row cost.
    # Computing each side's norm once below the join and dividing by
    # (_vn * _cn) is the identical IEEE expression: bit-identical
    # cscores, measured 0.80s -> 0.48s at sf0.1 (k=16).
    embn = emb.select(
        F.col(id_col), F.col(vec_col), norm(vec_col).alias("_vn")
    )
    centn = centroids.select(
        F.col("cid"), F.col("cv"), norm("cv").alias("_cn")
    )
    scored = embn.crossJoin(F.broadcast(centn)).select(
        F.col(id_col),
        F.col("cid"),
        F.try_divide(
            dot(vec_col, "cv"),
            F.col("_vn") * F.col("_cn"),
        ).alias("cscore"),
    )
    if isinstance(centroids.schema["cid"].dataType, NumericType):
        # argmax as a hash aggregate, not a window: max_by over
        # (cscore, -cid) picks the max-cosine centroid with ties broken
        # on the LOWEST cid — bit-identical to ordering by
        # (cscore DESC, cid) and taking row 1, but partial-aggregatable:
        # map-side combine collapses the n x k scored rows to n rows
        # BEFORE the shuffle, where the window form shuffle-sorts all
        # n x k rows.  At n=200k, k=1600 (the scale-probe's
        # cells-proportional-to-n point) this is the difference between
        # shuffling 320M rows and 200k.  NULL cscores (zero-norm
        # vectors) lose to any non-null score in struct ordering, and an
        # all-NULL group still tie-breaks to the lowest cid.
        return scored.groupBy(id_col).agg(
            F.max_by(
                F.col("cid"), F.struct(F.col("cscore"), -F.col("cid"))
            ).alias("cid")
        )
    from pyspark.sql import Window  # noqa: PLC0415

    # type-agnostic fallback: desc is nulls-last, so NULL cscores lose
    # and an all-NULL group falls to the lowest cid — same contract as
    # the aggregate path above
    w = Window.partitionBy(id_col).orderBy(
        F.col("cscore").desc(), F.col("cid")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "cid")
    )


def ivf_topk(
    emb: DataFrame,
    centroids: DataFrame | None,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: DataFrame | None = None,
) -> DataFrame:
    """IVF search: quantize corpus + query, then brute-force only the
    query's cell.  Approximate (single-probe) by design; see
    ``ivf_topk_multiprobe`` for the recall/latency dial.

    ``assign`` is the stored-column deployment path (same contract as
    ``ivf_cell_pairs``): pass the precomputed ``(id_col, cid)``
    assignment and no quantization job runs per query — ``centroids``
    may then be None."""
    if assign is None:
        if centroids is None:
            raise ValueError("ivf_topk needs centroids or assign")
        # assign feeds two consumers (cell join + query-cell lookup);
        # persist or the corpus x centroids quantization runs twice.  At
        # 100 TB the assignment is a precomputed stored column, not a
        # per-query job — the registry gives interactive sessions an
        # explicit release hook (cache.release()) so repeated ivf_topk
        # calls don't accumulate.
        assign = cache.register(
            ivf_assign(emb, centroids, id_col, vec_col)
        )
    emb_cells = emb.join(assign, id_col)
    query_cell = assign.filter(F.col(id_col) == query_id).select("cid")
    query_vec = emb.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("qv")
    )
    cell = emb_cells.join(F.broadcast(query_cell), "cid")
    return brute_force_topk(
        cell.select(id_col, vec_col), query_vec, k, id_col, vec_col
    )


def ivf_topk_multiprobe(
    emb: DataFrame,
    centroids: DataFrame,
    query_id: int,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: DataFrame | None = None,
) -> DataFrame:
    """Multi-probe IVF: search the ``nprobe`` cells whose centroids are
    closest to the QUERY VECTOR (not just the query's own cell) — the
    standard recall dial.  nprobe == n_centroids degrades gracefully to
    exact brute force; cost scales ~linearly with nprobe because only
    probed cells are scanned (broadcast semi-join on cid prunes the
    rest; with the corpus stored partitioned-by-cell that pruning is
    partition pruning at the scan).

    ``assign`` is the stored-column deployment path: pass the
    precomputed ``(id_col, cid)`` assignment and only the tiny
    centroid-probe scoring runs per query (``centroids`` is still
    required — it ranks the probe cells)."""
    from pyspark.sql import Window  # noqa: PLC0415

    if assign is None:
        # single consumer chains below, but the probe scoring and the
        # final brute force both hang off query_vec/assign — persist the
        # assignment (precomputed stored column at scale, see ivf_topk;
        # released via cache.release())
        assign = cache.register(
            ivf_assign(emb, centroids, id_col, vec_col)
        )
    query_vec = emb.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("qv")
    )
    probe_scored = centroids.crossJoin(F.broadcast(query_vec)).select(
        "cid", cosine("cv", "qv").alias("cscore")
    )
    w = Window.orderBy(F.col("cscore").desc(), F.col("cid"))
    probes = (
        probe_scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select("cid")
    )
    cell = emb.join(assign, id_col).join(F.broadcast(probes), "cid")
    return brute_force_topk(
        cell.select(id_col, vec_col), query_vec, k, id_col, vec_col
    )
