"""Pipe assembly DAG: the engine's re-expression of Cascading 1.x
pipes (Pipe/Each/Every/GroupBy/CoGroup/Merge/Unique — the dataflow
surface the reference connector exists to feed, SURVEY.md §2).

A ``Pipe`` is a lazy DAG node; ``Flow`` binds head pipes to source taps
by name and executes the whole assembly as ONE DataFrame plan — the
planner is Catalyst, not a hand-rolled job scheduler (the reference
delegated to Cascading's MapReduce planner the same way,
README.txt:18-23).

Field selector semantics follow Cascading: ``Each(pipe, args, fn,
out)`` with out one of ALL (input + declared), RESULTS (declared only),
REPLACE (declared overwrite the argument fields), SWAP (input minus
args plus declared) — the prepend/append algebra of
HBaseScheme.java:157-162 falls out of ALL.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cascading_hbase_spark.operators.functions import Aggregator, Filter, Function

__all__ = [
    "ALL", "RESULTS", "REPLACE", "SWAP",
    "Pipe", "Each", "EachFilter", "GroupBy", "Every", "Buffer", "CoGroup",
    "CoGroupBuffer",
    "Merge", "Unique", "Limit", "Rename", "Retain", "Discard", "Debug",
    "InnerJoin", "LeftJoin", "RightJoin", "OuterJoin",
]

ALL, RESULTS, REPLACE, SWAP = "ALL", "RESULTS", "REPLACE", "SWAP"

InnerJoin, LeftJoin, RightJoin, OuterJoin = "inner", "left", "right", "full"


class Pipe:
    """DAG node.  A head pipe (no parents) is bound to a source tap by
    name at Flow time."""

    def __init__(self, name: str | None = None, parents: tuple["Pipe", ...] = ()):
        self.name = name
        self.parents = parents

    # -- execution ---------------------------------------------------------
    def _compute(self, inputs: list[DataFrame]) -> DataFrame:
        raise NotImplementedError

    def resolve(self, bindings: dict[str, DataFrame],
                _memo: dict[int, DataFrame] | None = None) -> DataFrame:
        memo = _memo if _memo is not None else {}
        if id(self) in memo:
            return memo[id(self)]
        if not self.parents:
            if self.name not in bindings:
                raise KeyError(
                    f"head pipe {self.name!r} has no bound source; "
                    f"available: {sorted(bindings)}"
                )
            out = bindings[self.name]
        else:
            out = self._compute([p.resolve(bindings, memo) for p in self.parents])
        memo[id(self)] = out
        return out

    def head_names(self) -> set[str]:
        if not self.parents:
            return {self.name}
        return set().union(*(p.head_names() for p in self.parents))


class _Unary(Pipe):
    def __init__(self, prev: Pipe, name: str | None = None):
        super().__init__(name or prev.name, (prev,))


class Each(_Unary):
    """Apply a row-wise Function (MultiFamilyHBaseTest.java:54-55)."""

    def __init__(self, prev: Pipe, args: list[str] | None, operation: Function | Filter,
                 out: str = ALL):
        super().__init__(prev)
        self.args = args
        self.operation = operation
        self.out = out

    def _compute(self, inputs):
        df = inputs[0]
        args = self.args if self.args is not None else df.columns
        if isinstance(self.operation, Filter):
            return df.filter(self.operation.condition(df, args))
        cols = self.operation.columns(df, args)
        # Resolved output names via the public schema (no _jc internals;
        # works under Spark Connect too).
        declared = list(self.operation.declared) or df.select(*cols).columns
        if self.out == RESULTS:
            return df.select(*cols)
        if self.out == ALL:
            keep = [c for c in df.columns if c not in declared]
            return df.select(*[F.col(c) for c in keep], *cols)
        if self.out == REPLACE:
            # Cascading Fields.REPLACE: results substitute the argument
            # fields IN PLACE — column order is the input's, with each
            # argument position carrying its result (Fields algebra the
            # reference's field-prepend relies on, HBaseScheme.java:157-162).
            if len(cols) != len(args):
                raise ValueError(
                    f"REPLACE needs one result per argument field "
                    f"(args={list(args)}, declared={declared})"
                )
            out_names = [
                declared[args.index(c)] if c in args else c for c in df.columns
            ]
            if len(set(out_names)) != len(out_names):
                raise ValueError(
                    f"REPLACE would produce duplicate column names "
                    f"{out_names}; rename the declared fields or use SWAP"
                )
            sub = {a: c for a, c in zip(args, cols)}
            return df.select(*[sub.get(c, F.col(c)) for c in df.columns])
        if self.out == SWAP:
            # input minus argument fields, declared appended.
            keep = [c for c in df.columns if c not in args and c not in declared]
            return df.select(*[F.col(c) for c in keep], *cols)
        raise ValueError(f"unknown output selector {self.out!r}")


# Filters ride through Each too; EachFilter is an explicit alias.
EachFilter = Each


class GroupBy(Pipe):
    """Grouping (+ optional secondary sort) — also the stream-merge
    construct when given several pipes (Cascading 1.x GroupBy(Pipe[])).
    Must be followed by Every/Buffer to aggregate; a bare GroupBy with
    sort_fields yields the rows sorted within groups."""

    def __init__(self, *pipes: Pipe, group_fields: list[str],
                 sort_fields: list[str] | None = None, reverse: bool = False):
        super().__init__(pipes[0].name, tuple(pipes))
        self.group_fields = group_fields
        self.sort_fields = sort_fields
        self.reverse = reverse

    def _compute(self, inputs):
        df = inputs[0]
        for other in inputs[1:]:
            df = df.unionByName(other)
        if self.sort_fields:
            cols = [F.col(c).desc() if self.reverse else F.col(c) for c in self.sort_fields]
            df = df.repartition(*[F.col(g) for g in self.group_fields]).sortWithinPartitions(
                *[F.col(g) for g in self.group_fields], *cols
            )
        return df

    def _sort_key(self):
        if not self.sort_fields:
            return None
        key = F.struct(*[F.col(c) for c in self.sort_fields])
        return key


class Every(_Unary):
    """Aggregator application after GroupBy.  Chained Every calls fold
    into ONE hash aggregate over the same grouping (Spark computes
    partial+final automatically; Cascading 1.x had no map-side combine).
    The node's parent is always the GroupBy itself, so chaining never
    re-aggregates an aggregate."""

    def __init__(self, prev: Pipe, aggregators: list[Aggregator]):
        if isinstance(prev, Every):
            group = prev.parents[0]
            all_aggs = [*prev.aggregators, *aggregators]
        elif isinstance(prev, GroupBy):
            group = prev
            all_aggs = list(aggregators)
        else:
            raise TypeError("Every must follow GroupBy (or another Every)")
        super().__init__(group)
        self.aggregators = all_aggs

    def _compute(self, inputs):
        grp: GroupBy = self.parents[0]  # type: ignore[assignment]
        df = inputs[0]
        key = grp._sort_key()
        cols = [a.column(key, reverse=grp.reverse) for a in self.aggregators]
        return df.groupBy(*[F.col(g) for g in grp.group_fields]).agg(*cols)


class Buffer(_Unary):
    """Per-group iterator UDF (cascading.operation.Buffer) as
    Arrow-batched applyInPandas — the escape hatch for group logic the
    built-ins can't express."""

    def __init__(self, prev: GroupBy, func, schema: str):
        super().__init__(prev)
        if not isinstance(prev, GroupBy):
            raise TypeError("Buffer must follow GroupBy")
        self.func = func
        self.schema = schema

    def _compute(self, inputs):
        grp: GroupBy = self.parents[0]  # type: ignore[assignment]
        return inputs[0].groupBy(*grp.group_fields).applyInPandas(self.func, self.schema)


class CoGroupBuffer(Pipe):
    """Two-sided per-key iterator UDF: Cascading's CoGroup feeding a
    Buffer, as ``groupBy().cogroup().applyInPandas`` — each key's rows
    from BOTH pipes arrive as two aligned Arrow pandas frames.  The
    escape hatch for per-key two-stream logic no built-in join
    expresses (custom merge-asof variants, per-key reconciliation);
    one co-partitioning shuffle per side, Python sees one key group at
    a time."""

    def __init__(self, lhs: Pipe, lhs_fields: list[str], rhs: Pipe,
                 rhs_fields: list[str], func, schema: str,
                 name: str | None = None):
        super().__init__(name or lhs.name, (lhs, rhs))
        self.lhs_fields, self.rhs_fields = lhs_fields, rhs_fields
        self.func = func
        self.schema = schema

    def _compute(self, inputs):
        left, right = inputs
        return (
            left.groupBy(*self.lhs_fields)
            .cogroup(right.groupBy(*self.rhs_fields))
            .applyInPandas(self.func, self.schema)
        )


class CoGroup(Pipe):
    """Join two pipes on key fields (Cascading's only join primitive).
    Catalyst picks broadcast/hash/sort-merge — never hand-scheduled."""

    def __init__(self, lhs: Pipe, lhs_fields: list[str], rhs: Pipe,
                 rhs_fields: list[str], joiner: str = InnerJoin,
                 name: str | None = None):
        super().__init__(name or lhs.name, (lhs, rhs))
        self.lhs_fields, self.rhs_fields = lhs_fields, rhs_fields
        self.joiner = joiner

    def _compute(self, inputs):
        left, right = inputs
        overlap = set(left.columns) & set(right.columns)
        if overlap:
            raise ValueError(
                f"CoGroup requires disjoint field names (Cascading semantics); "
                f"rename first: {sorted(overlap)}"
            )
        cond = None
        for lf, rf in zip(self.lhs_fields, self.rhs_fields):
            c = left[lf] == right[rf]
            cond = c if cond is None else (cond & c)
        return left.join(right, cond, self.joiner)


class Merge(Pipe):
    """Union of pipes (APPEND-style merge, HBaseTap.java:33)."""

    def __init__(self, *pipes: Pipe, name: str | None = None):
        super().__init__(name or pipes[0].name, tuple(pipes))

    def _compute(self, inputs):
        df = inputs[0]
        for other in inputs[1:]:
            df = df.unionByName(other)
        return df


class Unique(_Unary):
    def __init__(self, prev: Pipe, fields: list[str] | None = None):
        super().__init__(prev)
        self.fields = fields

    def _compute(self, inputs):
        df = inputs[0]
        return df.dropDuplicates(self.fields) if self.fields else df.distinct()


class Limit(_Unary):
    def __init__(self, prev: Pipe, n: int):
        super().__init__(prev)
        self.n = n

    def _compute(self, inputs):
        return inputs[0].limit(self.n)


class Rename(_Unary):
    def __init__(self, prev: Pipe, mapping: dict[str, str]):
        super().__init__(prev)
        self.mapping = mapping

    def _compute(self, inputs):
        df = inputs[0]
        for old, new in self.mapping.items():
            df = df.withColumnRenamed(old, new)
        return df


class Retain(_Unary):
    def __init__(self, prev: Pipe, fields: list[str]):
        super().__init__(prev)
        self.fields = fields

    def _compute(self, inputs):
        return inputs[0].select(*self.fields)


class Discard(_Unary):
    def __init__(self, prev: Pipe, fields: list[str]):
        super().__init__(prev)
        self.fields = fields

    def _compute(self, inputs):
        return inputs[0].drop(*self.fields)


class Debug(_Unary):
    """Side-effect tuple print, pass-through otherwise (the commented
    Debug of MultiFamilyCascadeHBaseTest.java:63).  ``n=0`` makes it a
    pure no-op marker in the assembly."""

    def __init__(self, prev: Pipe, n: int = 20):
        super().__init__(prev)
        self.n = n

    def _compute(self, inputs):
        if self.n:
            inputs[0].show(self.n, truncate=False)
        return inputs[0]
