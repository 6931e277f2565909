"""Skew mitigation: salted joins and two-phase salted aggregation.

A readings workload is intrinsically skewed — a handful of chatty assets
produce most rows (the reference's asset_code; the events table's 5
event_types).  A hash shuffle on such a key sends a hot key's entire
volume to one task.  Two standard remedies, both exposed as engine
operators:

* ``salted_join`` — fan the hot side's key out over N salts, replicate
  the small side N ways, join on (key, salt).  Each hot key's rows now
  spread over N tasks.  Complements (not replaces) AQE skew-join
  splitting, which handles skew discovered at runtime; salting is for
  skew you know about at plan time.
* ``salted_agg`` — two-phase aggregation for algebraic aggregates:
  partial aggregate on (key, salt), final aggregate on key.  The first
  shuffle spreads each hot key over N reducers; the second moves only
  N pre-aggregated rows per key.

Both are algebraic rewrites — results are bit-identical to the unsalted
plan (oracle-checked by the ``skewed_asset_rollup`` catalog query).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def with_salt(df: DataFrame, n_salts: int, entropy_cols: Sequence[str]) -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): hash of row-identity
    columns (NOT the join key — salting by the hot key would put every
    hot row back in one bucket)."""
    return df.withColumn(
        _SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in entropy_cols]), F.lit(n_salts)),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    n_salts: int = 8,
    entropy_cols: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the big side's hot keys are spread over
    ``n_salts`` buckets and the small side is replicated once per salt.

    Use when the small side is too big to broadcast but the big side's
    key distribution is skewed.  The replicated small side costs
    n_salts x |small| shuffle volume — pick n_salts around the ratio of
    hottest-key volume to average-task volume, not higher.
    """
    keys = [on] if isinstance(on, str) else list(on)
    # right/full outer joins are WRONG under salting: every unmatched
    # (key, salt) replica of the small side would surface as its own
    # outer row (n_salts copies).  Only big-side-preserving joins are
    # algebraically invisible.
    allowed = {"inner", "left", "left_outer", "leftouter", "semi",
               "left_semi", "leftsemi", "anti", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; '{how}' would "
            "duplicate unmatched small-side replicas per salt"
        )
    entropy = list(entropy_cols) if entropy_cols else [
        c for c in big.columns if c not in keys
    ]
    if not entropy:
        raise ValueError(
            "no entropy columns: salting by the join key alone puts every "
            "hot-key row back in one bucket; pass entropy_cols explicitly"
        )
    big_s = with_salt(big, n_salts, entropy)
    small_s = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_s.join(small_s, [*keys, _SALT], how)
    return out.drop(_SALT)


#: partial-phase builder and final-phase recombiner per algebraic op
_ALGEBRAIC = {
    "count": (lambda c: F.count(c), lambda p: F.sum(p)),
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column | str]],
    n_salts: int = 8,
    entropy_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation for algebraic aggregates, declared as
    ``{out_name: (op, column)}`` with op in count/sum/min/max.

    Example::

        salted_agg(events, ["event_type"],
                   {"n": ("count", F.lit(1)), "total": ("sum", "value")})

    Phase 1 aggregates on (keys, salt); phase 2 recombines the partials
    on keys alone (count -> sum of partial counts, sum -> sum,
    min -> min, max -> max).  Algebraically identical to a direct
    ``groupBy(keys).agg(...)`` — oracle-checked by ``skewed_asset_rollup``.
    """
    entropy = list(entropy_cols) if entropy_cols else [
        c for c in df.columns if c not in keys
    ]
    if not entropy:
        raise ValueError(
            "no entropy columns: salting by the group key alone is a "
            "no-op; pass entropy_cols explicitly"
        )
    salted = with_salt(df, n_salts, entropy)
    partials, finals = [], []
    for name, (op, col) in aggs.items():
        if op not in _ALGEBRAIC:
            raise ValueError(f"unsupported salted agg op: {op}")
        build, combine = _ALGEBRAIC[op]
        c = F.col(col) if isinstance(col, str) else col
        partials.append(build(c).alias(f"__p_{name}"))
        finals.append(combine(F.col(f"__p_{name}")).alias(name))
    partial = salted.groupBy(*keys, _SALT).agg(*partials)
    return partial.groupBy(*keys).agg(*finals)
