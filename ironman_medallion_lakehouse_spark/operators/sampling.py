"""Deterministic stratified sampling — training-data mixture control.

Beyond-reference extension (BASELINE.json north star). A 100 TB
pretraining pipeline rarely takes data as-is: it downsamples dominant
strata (language, source, quality band) and keeps rare ones, by quota.
Two variants, both deterministic and replayable:

- ``stratified_sample``: per-stratum RATE sampling by key hash —
  zero shuffles, a map-only filter. The hash is md5-based (not
  Spark's ``rand()``/``sample()``), so the decision for a given key is
  stable across runs, engines, partitionings, and cluster sizes:
  re-running the pipeline samples the SAME rows (the property that
  makes sampled datasets diffable and the DuckDB oracle possible),
  and downstream incremental runs never flip membership.
- ``stratified_fixed_n``: exactly-n-per-stratum via a window rank over
  the same hash order — one shuffle on the stratum key. The hash
  order makes it a uniform random draw that is still deterministic;
  rank ties are impossible (the tiebreak includes the unique key).

Skew note: the window variant partitions by stratum, so one giant
stratum is one window partition — for rate sampling at scale always
prefer ``stratified_sample`` (no shuffle at all); use fixed-n only
for small-cardinality strata quotas (its use case), where the
per-stratum sort is the point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DENOM = 1_000_000


def _uhash(key: Column, salt: str) -> Column:
    """Uniform [0, 1M) integer from md5(key:salt) — engine-portable
    (DuckDB replay: ``('0x' || substr(md5(...), 1, 8))::UBIGINT %
    1000000``)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", key.cast("string"), F.lit(salt))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % _DENOM
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Keep each row with its stratum's probability, decided by a
    deterministic hash of ``key_col``. Strata absent from ``rates``
    use ``default_rate`` (0.0 = drop unknown strata — the safe default
    for a curated mixture)."""
    m = F.create_map(*[F.lit(x) for kv in rates.items() for x in kv])
    rate = F.coalesce(m[F.col(strata_col)], F.lit(float(default_rate)))
    return df.filter(_uhash(F.col(key_col), salt) < (rate * _DENOM).cast("bigint"))


def stratified_fixed_n(
    df: DataFrame,
    strata_col: str,
    n: int,
    key_col: str,
    salt: str = "strat",
) -> DataFrame:
    """Exactly min(n, stratum size) rows per stratum, drawn uniformly
    by hash order (deterministic tiebreak on the key itself)."""
    w = Window.partitionBy(strata_col).orderBy(
        _uhash(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )
