"""Deferred error ledger (V6 at scale; SURVEY §7.3 "error accumulation").

Strict-mode strategies each trigger an eager validation action — one extra
bounded scan per strategy.  At 100 TB a pipeline with six strict strategies
pays six scans.  The ledger batches them: every check registers a *small*
DataFrame of offending examples (already limited at registration), the
checks union into ONE job, and ``validate()`` raises a single combined
report listing every failing check.

Usage::

    ledger = ErrorLedger(limit_per_check=20)
    ledger.add_check("sex_unmapped", bad_rows_df)      # lazy, no action
    ledger.add_check("dob_conflicts", conflict_df)
    ledger.validate()                                   # ONE Spark action

Each registered DataFrame must be cheap per-row (already filtered to
offenders); the ledger adds the limit, a check-name tag, and the union.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PipelineValidationError(ValueError):
    def __init__(self, failures: dict[str, list[str]]):
        self.failures = failures
        lines = "; ".join(f"{name}: {vals}" for name, vals in failures.items())
        super().__init__(f"{len(failures)} validation check(s) failed — {lines}")


@dataclass
class ErrorLedger:
    limit_per_check: int = 20
    _checks: list[tuple[str, DataFrame]] = field(default_factory=list)

    def add_check(self, name: str, offenders: DataFrame, value_col: str | None = None) -> "ErrorLedger":
        """Register a lazy DataFrame of offending rows.  ``value_col``
        selects the column to report (default: first column)."""
        col = value_col or offenders.columns[0]
        tagged = (
            offenders.select(F.col(col).cast("string").alias("offender"))
            .limit(self.limit_per_check)
            .select(F.lit(name).alias("check"), "offender")
        )
        self._checks.append((name, tagged))
        return self

    def validate(self) -> None:
        """Run every registered check in ONE action; raise a combined report
        if any offenders exist.  No-op when nothing registered."""
        if not self._checks:
            return
        unioned = self._checks[0][1]
        for _, df in self._checks[1:]:
            unioned = unioned.unionByName(df)
        rows = unioned.collect()
        self._checks.clear()
        if not rows:
            return
        failures: dict[str, list[str]] = {}
        for r in rows:
            failures.setdefault(r["check"], []).append(r["offender"])
        raise PipelineValidationError(failures)
