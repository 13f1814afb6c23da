"""Write-time data-quality expectations for keyed tables.

The ingest-validation layer a training-data pipeline needs in front of
a keyed sink (the role Delta constraints / DLT expectations play):
declare named boolean conditions over the incoming batch and pick what
a violation does —

- ``fail``       reject the whole batch (atomic: nothing is written)
- ``drop``       silently exclude violating rows
- ``quarantine`` divert violating rows (tagged with which expectations
                 they broke) to a side parquet dir for triage

Everything is one map-side pass: each condition is a Catalyst boolean
column, the violation tag is an array filter over a literal name
array, and the split is two filters over the same tagged relation —
no shuffle is added to the write path.  ``fail`` is the only action
that runs a driver action (one boolean ``isEmpty`` probe), because
rejecting the batch must happen before the sink commits.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from cascading_hbase_spark.keyed.table import SinkMode, write_keyed

__all__ = [
    "Expectation",
    "ExpectationError",
    "apply_expectations",
    "write_keyed_validated",
    "reprocess_quarantine",
]

_TAG = "_violated"


class ExpectationError(ValueError):
    """A ``fail``-action expectation was violated (batch rejected)."""


@dataclass(frozen=True)
class Expectation:
    """A named row-level contract: ``condition`` (SQL string or Column)
    must hold; ``action`` is 'fail', 'drop', or 'quarantine'."""

    name: str
    condition: str | Column
    action: str = "quarantine"

    def __post_init__(self):
        if self.action not in ("fail", "drop", "quarantine"):
            raise ValueError(
                f"action must be fail|drop|quarantine, got {self.action!r}"
            )
        if _TAG == self.name:
            raise ValueError(f"{_TAG!r} is reserved")

    def col(self) -> Column:
        c = F.expr(self.condition) if isinstance(self.condition, str) else self.condition
        # NULL condition results count as violations (same rule as SQL
        # CHECK constraints would be too lenient for ML ingest: a NULL
        # quality score should not sail through a score threshold).
        return F.coalesce(c.cast("boolean"), F.lit(False))


def apply_expectations(
    df: DataFrame, expectations: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (passed, violations).  ``violations`` carries
    every original column plus ``_violated``: the sorted array of
    expectation names the row broke.  Lazy; one map-side pass."""
    if not expectations:
        return df, df.limit(0).withColumn(
            _TAG, F.array().cast("array<string>")
        )
    names = [e.name for e in expectations]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate expectation names: {names}")
    pairs = F.array(
        *[
            F.struct(F.lit(e.name).alias("n"), e.col().alias("ok"))
            for e in expectations
        ]
    )
    violated = F.array_sort(
        F.transform(
            F.filter(pairs, lambda p: ~p["ok"]), lambda p: p["n"]
        )
    )
    tagged = df.withColumn(_TAG, violated)
    passed = tagged.filter(F.size(_TAG) == 0).drop(_TAG)
    violations = tagged.filter(F.size(_TAG) > 0)
    return passed, violations


def write_keyed_validated(
    df: DataFrame,
    path: str,
    key: str,
    expectations: list[Expectation],
    quarantine_path: str | None = None,
    mode: SinkMode = SinkMode.APPEND,
    **write_kwargs,
) -> None:
    """``write_keyed`` with an expectations gate in front of the sink.

    Order of operations: ``fail`` expectations are probed FIRST (one
    scalar isEmpty action; any hit raises ``ExpectationError`` and
    nothing is written — the batch either fully passes the hard gates
    or is fully rejected).  Then drop/quarantine rows are split out;
    quarantined rows (with their ``_violated`` tags) append to
    ``quarantine_path`` as plain parquet BEFORE the keyed commit, so a
    crash between the two writes can duplicate quarantine rows but can
    never lose them (at-least-once on the triage side, exactly-once on
    the table side via the manifest flip)."""
    hard = [e for e in expectations if e.action == "fail"]
    soft = [e for e in expectations if e.action != "fail"]
    quarantining = [e.name for e in soft if e.action == "quarantine"]
    if quarantine_path is None and quarantining:
        raise ValueError(
            f"quarantine-action expectations {quarantining} need a "
            f"quarantine_path"
        )
    if hard or quarantining:
        # Pin the batch ONCE: the hard-gate probe, the quarantine
        # write and the keyed write are separate actions — a
        # non-deterministic input plan (rand/sample/a source changing
        # mid-call) re-evaluated between them could pass the fail-gate
        # yet commit violating rows, or land a row in both quarantine
        # and the table.  Drop-only (or no-op) validation is a single
        # plan whose one action write_keyed already pins internally,
        # so it skips this extra full-batch materialization (the
        # checkpoint is of the BATCH, bounded by batch size at any
        # scale).
        df = df.localCheckpoint(eager=True)
    if hard:
        hard_violations = apply_expectations(df, hard)[1]
        sample = hard_violations.select(_TAG).limit(1).collect()
        if sample:
            raise ExpectationError(
                f"fail-action expectation(s) violated: "
                f"{sorted(set(sample[0][0]))} — batch rejected"
            )
    passed, violations = apply_expectations(df, soft)
    if quarantining:
        qnames = F.array(*[F.lit(n) for n in quarantining])
        q = violations.filter(
            F.size(F.array_intersect(_TAG, qnames)) > 0
        )
        q.write.mode("append").parquet(quarantine_path)
    write_keyed(passed, path, key, mode=mode, **write_kwargs)


def reprocess_quarantine(
    spark,
    quarantine_path: str,
    path: str,
    key: str,
    expectations: list[Expectation],
    fixer=None,
    mode: SinkMode = SinkMode.APPEND,
    **write_kwargs,
) -> DataFrame:
    """Drain the triage loop: re-validate quarantined rows (optionally
    after ``fixer``, a DataFrame -> DataFrame repair transform), upsert
    the now-passing rows into the keyed table, and RETURN the still-
    failing remainder (tagged) for the next triage pass.

    The quarantine dir itself is append-only and is not rewritten —
    rows that pass re-validation are upserted by key, so replaying the
    same quarantine twice is idempotent on the table (LWW merge), and
    the returned remainder is what a fresh quarantine should contain.
    Callers who want to compact the dir write the returned DataFrame to
    a new path and swap directories themselves."""
    q = spark.read.parquet(quarantine_path).drop(_TAG)
    if fixer is not None:
        fixed = fixer(q)
        missing = set(q.columns) - set(fixed.columns)
        if missing:
            raise ValueError(f"fixer dropped required columns: {sorted(missing)}")
        q = fixed
    passed, still_failing = apply_expectations(q, expectations)
    write_keyed(passed, path, key, mode=mode, **write_kwargs)
    return still_failing
