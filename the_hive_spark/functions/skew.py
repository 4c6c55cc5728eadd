"""Skew mitigation primitives — salting for hot keys at 100 TB.

AQE's skew-join splitting (enabled in session.py) handles most cases
at runtime; these helpers are for the pathological ones you know in
advance (a tenant with 100× the traffic, a null-heavy join key):

- ``salted_agg``: two-phase aggregation — partial agg on
  (keys + salt), final agg on keys. The hot key's rows spread over
  ``n_salts`` reducers instead of one; exact for the decomposable
  aggregates supported (sum/count/min/max).
- ``salted_join``: the fact side salts each row deterministically
  (hash of all columns, NOT rand() — retries/replays must route rows
  identically); the dimension side explodes ×n_salts; the join key
  becomes (key, salt) so one hot key spreads over n_salts tasks.

Both transforms are algebraic rewrites: results equal the unsalted
plan by construction, asserted in tests/test_skew.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_SALTS = 16

_AGG_FNS = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}

# final-phase recombination for each partial aggregate
_FINAL_FNS = {
    "sum": F.sum,
    "count": F.sum,  # counts add up
    "min": F.min,
    "max": F.max,
}


def _salt_col(df: DataFrame, n_salts: int):
    """Deterministic per-row salt: hash of every column. rand() would
    break task-retry determinism (a replayed task must produce the
    same rows)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs``: output_name -> (column, fn) with fn in sum|count|min|max.
    Example::

        salted_agg(events, ["user_id"],
                   {"n": ("event_id", "count"), "m": ("amount", "sum")})
    """
    unknown = {fn for _, fn in aggs.values()} - _AGG_FNS.keys()
    if unknown:
        raise ValueError(f"unsupported salted aggregate(s): {unknown}")
    partial = (
        df.withColumn("_salt", _salt_col(df, n_salts))
        .groupBy(*keys, "_salt")
        .agg(
            *[
                _AGG_FNS[fn](F.col(col)).alias(f"_p_{name}")
                for name, (col, fn) in aggs.items()
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            _FINAL_FNS[fn](F.col(f"_p_{name}")).alias(name)
            for name, (_, fn) in aggs.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: fact rows salt deterministically,
    dim rows replicate across all salts, join on (key, salt).

    Use when one join key dominates (a hot tenant / null bucket) and
    the dim side is too big to broadcast outright but small enough to
    replicate ×n_salts. Column set of the result matches
    ``fact.join(dim, on, how)``.
    """
    salted_fact = fact.withColumn("_salt", _salt_col(fact, n_salts))
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return (
        salted_fact.join(salted_dim, [on, "_salt"], how)
        .drop("_salt")
    )
