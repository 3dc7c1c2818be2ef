"""Skew-mitigation join: salting for large-large equi-joins.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions. Salting is the explicit
fallback for the cases AQE can't fix — e.g. one key holding 30% of both
sides, or a non-AQE engine path:

- LEFT (large, skewed): gets a deterministic per-row salt in
  [0, n_salts) derived from a high-cardinality column.
- RIGHT (the smaller-but-too-big-to-broadcast side): replicated
  n_salts times via explode of a literal salt array.
- Join on (keys..., salt): each hot key's rows spread over n_salts
  reducers instead of one.

Cost: right side inflates ×n_salts — choose n_salts ≈ (hot-key rows /
target partition rows), not "as big as possible". Semantics are
exactly the plain join's (asserted in tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join left⋈right on ``on`` with key salting.

    salt_source: a left column with high cardinality used to derive the
    deterministic salt (defaults to the whole key tuple plus
    monotonically varying input — any left column works; prefer a
    unique id). Supported how: inner / left.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    salt_col = (
        F.pmod(F.hash(F.col(salt_source)), F.lit(n_salts))
        if salt_source
        else F.pmod(F.hash(*[F.col(c) for c in on], F.monotonically_increasing_id()), F.lit(n_salts))
    )
    salted_left = left.withColumn("_salt", salt_col)
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    replicated_right = right.withColumn("_salt", F.explode(salts))
    out = salted_left.join(replicated_right, [*on, "_salt"], how)
    return out.drop("_salt")
