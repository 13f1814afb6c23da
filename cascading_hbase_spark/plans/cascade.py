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

__all__ = ["Flow", "Cascade", "FlowConnector", "CascadeConnector"]


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


class Cascade:
    def __init__(self, flows: list[Flow]):
        self.flows = flows

    def _ordered(self) -> list[Flow]:
        """Topological order on tap URIs: a flow reading another flow's
        sink runs after it, regardless of the argument order
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
        return list(ts.static_order())

    def complete(self, spark: SparkSession, force: bool = False) -> list[str]:
        """Run stale flows in dependency order; returns the names of the
        flows that actually ran."""
        ran: list[str] = []
        for f in self._ordered():
            if force or f.is_stale():
                f.complete(spark)
                ran.append(f.name)
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
