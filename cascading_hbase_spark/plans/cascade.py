"""Flow and Cascade: the engine's dataflow execution layer.

A ``Flow`` binds source taps to a pipe assembly's head pipes and writes
the tail's DataFrame to a sink tap — one Spark write action; planning
inside the flow is entirely Catalyst (SURVEY.md §3.1-3.2).

A ``Cascade`` topologically orders flows by tap identity — the test
connects flows in *reversed* order on purpose and relies on the
scheduler (MultiFamilyCascadeHBaseTest.java:83,97 'reversed order
intentionally').  Freshness: a flow is skipped when its sink is newer
than all its sources, EXCEPT keyed sinks, which always report
modified-now and therefore always re-run
(HBaseTap.java:65-67,103-105).
"""

from __future__ import annotations

import graphlib

from pyspark.sql import DataFrame, SparkSession

from cascading_hbase_spark.operators.pipe import Pipe
from cascading_hbase_spark.operators.taps import SinkMode, Tap

__all__ = ["Flow", "MaintenanceFlow", "Cascade", "FlowConnector", "CascadeConnector"]


class Flow:
    def __init__(
        self,
        sources: dict[str, Tap] | Tap,
        sink: Tap,
        tail: Pipe,
        sink_mode: SinkMode | None = None,
        name: str | None = None,
    ):
        if isinstance(sources, Tap):
            sources = {tail.head_names().pop(): sources}
        missing = tail.head_names() - set(sources)
        if missing:
            raise ValueError(f"unbound head pipes: {sorted(missing)}")
        self.sources = sources
        self.sink = sink
        self.tail = tail
        self.sink_mode = sink_mode
        self.name = name or f"flow-{tail.name}"

    # --- planning ----------------------------------------------------------
    def dataframe(self, spark: SparkSession) -> DataFrame:
        bindings = {name: tap.read(spark) for name, tap in self.sources.items()}
        return self.tail.resolve(bindings)

    def is_stale(self) -> bool:
        """Sink needs (re)computation?  Mirrors Cascading's
        modified-time protocol; keyed sinks are always stale."""
        if self.sink.always_stale_sink or not self.sink.exists():
            return True
        sink_time = self.sink.modified_time()
        src_time = max(t.modified_time() for t in self.sources.values())
        return sink_time <= src_time

    # --- execution ----------------------------------------------------------
    def complete(self, spark: SparkSession) -> None:
        df = self.dataframe(spark)
        if self.sink_mode is not None:
            self.sink.write(df, self.sink_mode)
        else:
            self.sink.write(df)


class MaintenanceFlow:
    """A cascade node wrapping a table-MAINTENANCE action (replica
    sync, matview refresh, compaction) instead of a tap->pipe->tap
    dataflow.  The reference's cascades only chained data flows — the
    maintenance its HBase cluster did implicitly (replication, view
    upkeep) becomes an explicit, schedulable node here.

    Declares source/sink taps purely for dependency ordering and the
    freshness protocol (keyed sinks: always stale, so maintenance
    re-runs whenever its cascade runs — matching the incremental
    no-op-when-current semantics of sync/refresh themselves)."""

    def __init__(self, sources, sink, fn, name: str | None = None):
        if isinstance(sources, Tap):
            sources = {"src": sources}
        self.sources = sources
        self.sink = sink
        self._fn = fn
        self.name = name or "maintenance"

    is_stale = Flow.is_stale

    def complete(self, spark: SparkSession) -> None:
        self._fn(spark)


class Cascade:
    """``atomic_tables`` (r10) runs the whole cascade pass inside
    ``keyed.txn.multi_commit`` over those keyed-table paths: every
    member flow's commits to them stage, and ONE transaction decides
    the pass — the maintenance-chain atomicity the reference's HBase
    deployments never had (crash mid-cascade = nothing visible, or
    recovery completes the flips).  Only meaningful for serial
    execution: ``parallel=True`` with ``atomic_tables`` is refused —
    the staging proxy serializes manifest state, so concurrent member
    flows would race it for no wall-clock gain on maintenance nodes."""

    def __init__(
        self,
        flows: list[Flow],
        atomic_tables: list[str] | None = None,
        txn_log: str | None = None,
    ):
        self.flows = flows
        self.atomic_tables = atomic_tables
        self.txn_log = txn_log

    def _sorter(self) -> "graphlib.TopologicalSorter":
        """Dependency graph on tap URIs: a flow reading another flow's
        sink depends on it, regardless of the argument order
        (MultiFamilyCascadeHBaseTest.java:83-87)."""
        producers: dict[str, Flow] = {}
        for f in self.flows:
            producers[f.sink.uri()] = f
        ts: graphlib.TopologicalSorter = graphlib.TopologicalSorter()
        for f in self.flows:
            deps = [
                producers[t.uri()]
                for t in f.sources.values()
                if t.uri() in producers and producers[t.uri()] is not f
            ]
            ts.add(f, *deps)
        return ts

    def _ordered(self) -> list[Flow]:
        return list(self._sorter().static_order())

    def complete(
        self,
        spark: SparkSession,
        force: bool = False,
        parallel: bool = False,
        max_workers: int = 4,
    ) -> list[str]:
        """Run stale flows in dependency order; returns the names of the
        flows that actually ran.

        ``parallel=True`` runs independent flows concurrently (Spark's
        scheduler accepts actions from multiple threads and shares the
        cluster across them — Cascading's parallel flow execution).
        Dependency order still holds: a flow is only submitted once all
        flows producing its sources have finished."""
        ran: list[str] = []
        if self.atomic_tables:
            if parallel:
                raise ValueError(
                    "atomic_tables requires serial execution (the "
                    "transaction stages manifest state; see Cascade "
                    "docstring)"
                )
            from cascading_hbase_spark.keyed.txn import multi_commit

            with multi_commit(self.atomic_tables, self.txn_log):
                for f in self._ordered():
                    if force or f.is_stale():
                        f.complete(spark)
                        ran.append(f.name)
            return ran
        if not parallel:
            for f in self._ordered():
                if force or f.is_stale():
                    f.complete(spark)
                    ran.append(f.name)
            return ran

        import threading
        from concurrent.futures import ThreadPoolExecutor, wait

        ts = self._sorter()
        ts.prepare()
        lock = threading.Lock()

        def _run(f: Flow) -> Flow:
            # staleness is evaluated AFTER upstream flows finished, so a
            # just-rewritten source correctly marks the consumer stale
            if force or f.is_stale():
                f.complete(spark)
                with lock:
                    ran.append(f.name)
            return f

        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            pending = set()
            while ts.is_active() or pending:
                for f in ts.get_ready():
                    pending.add(pool.submit(_run, f))
                if not pending:
                    break
                done, pending = wait(pending, return_when="FIRST_COMPLETED")
                for fut in done:
                    ts.done(fut.result())  # re-raises a failed flow
        return ran

    def delete_sinks(self) -> None:
        """deleteSinks() before re-running
        (MultiFamilyCascadeHBaseTest.java:85)."""
        for f in self.flows:
            f.sink.delete()


class FlowConnector:
    """API-compatibility shim: ``FlowConnector().connect(src, sink,
    pipe)`` (MultiFamilyHBaseTest.java:79-82)."""

    def __init__(self, properties: dict | None = None):
        self.properties = properties or {}

    def connect(self, sources, sink, tail, **kw) -> Flow:
        return Flow(sources, sink, tail, **kw)


class CascadeConnector:
    def connect(self, *flows: Flow) -> Cascade:
        return Cascade(list(flows))
