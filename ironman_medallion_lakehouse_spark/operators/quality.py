"""Data-quality expectations — the reference's inline audits as an API.

The reference enforces correctness with ad-hoc notebook checks
(SURVEY §5.1): duplicate-key counts (02_bronze.ipynb:254), non-empty
layer asserts (03_silver.ipynb:346), null audits (03:367-447),
derived-value reconciliation (03:524-528), and a quarantine flag
instead of row deletion (has_data_issue, 03:469-486). This module
makes those patterns first-class and composable:

- each Expectation evaluates to (name, violation_count, total) in ONE
  pass — expectations over the same DataFrame are fused into a single
  aggregate job, not one action per check;
- ``quarantine`` splits pass/fail rows by a predicate (flag-don't-drop
  generalized to physically routing rows);
- ``enforce`` raises on violations for pipeline gating.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    name: str
    violation: Column  # boolean Column: True = row violates

    @staticmethod
    def non_null(col: str) -> "Expectation":
        return Expectation(f"non_null({col})", F.col(col).isNull())

    @staticmethod
    def in_range(col: str, lo, hi) -> "Expectation":
        c = F.col(col)
        return Expectation(
            f"in_range({col},{lo},{hi})", c.isNotNull() & ((c < lo) | (c > hi))
        )

    @staticmethod
    def in_set(col: str, values: list) -> "Expectation":
        c = F.col(col)
        return Expectation(
            f"in_set({col})", c.isNotNull() & ~c.isin(values)
        )

    @staticmethod
    def matches(col: str, pattern: str) -> "Expectation":
        c = F.col(col)
        return Expectation(
            f"matches({col})", c.isNotNull() & ~c.rlike(pattern)
        )

    @staticmethod
    def satisfies(name: str, predicate: Column) -> "Expectation":
        """Custom rule: predicate True = row OK."""
        return Expectation(name, ~predicate)


@dataclass
class QualityReport:
    total_rows: int
    violations: dict[str, int]

    @property
    def passed(self) -> bool:
        return all(v == 0 for v in self.violations.values())


def check(df: DataFrame, expectations: list[Expectation]) -> QualityReport:
    """Evaluate all expectations in ONE aggregate pass (the reference
    runs one count() action per audit — at 100 TB that's one full scan
    per check; fusing them is the difference)."""
    aggs = [F.count(F.lit(1)).alias("__total")] + [
        F.sum(F.when(e.violation, 1).otherwise(0)).alias(f"__v{i}")
        for i, e in enumerate(expectations)
    ]
    row = df.agg(*aggs).collect()[0]
    return QualityReport(
        total_rows=row["__total"],
        violations={e.name: (row[f"__v{i}"] or 0) for i, e in enumerate(expectations)},
    )


def check_unique(df: DataFrame, keys: list[str]) -> int:
    """Duplicate-key audit (02_bronze.ipynb:254): number of key tuples
    occurring more than once."""
    return (
        df.groupBy(*keys).count().filter(F.col("count") > 1).count()
    )


def quarantine(
    df: DataFrame, expectations: list[Expectation], flag_col: str = "has_data_issue"
) -> tuple[DataFrame, DataFrame]:
    """Route rows violating ANY expectation to a quarantine frame
    (reference keeps them flagged in place, 03_silver.ipynb:469-486;
    this generalizes to physical routing). Returns (clean, quarantined);
    quarantined rows carry the flag column for lineage."""
    any_violation = None
    for e in expectations:
        any_violation = e.violation if any_violation is None else (any_violation | e.violation)
    flagged = df.withColumn(flag_col, F.coalesce(any_violation, F.lit(False)))
    return (
        flagged.filter(~F.col(flag_col)).drop(flag_col),
        flagged.filter(F.col(flag_col)),
    )


def enforce(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Raise ValueError if any expectation is violated (the reference's
    raise-on-bad-layer gate, 03_silver.ipynb:346); returns df untouched
    when clean so it chains inside a pipeline."""
    report = check(df, expectations)
    if not report.passed:
        bad = {k: v for k, v in report.violations.items() if v}
        raise ValueError(f"quality violations: {bad}")
    return df
