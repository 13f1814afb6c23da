"""Row-wise operations and aggregators for the pipe API — the engine's
re-expression of Cascading 1.x ``cascading.operation.*`` (the operator
surface the reference's tests exercise, SURVEY.md §2.2/§2.4).

Every operation compiles to Catalyst expressions (never a Python UDF),
so pipes assembled from these run entirely inside whole-stage codegen.
Reference touchpoints: RegexSplitter + Identity
(MultiFamilyHBaseTest.java:54-55,77), ExpressionFunction
(MultiFamilyCascadeHBaseTest.java:62).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = [
    "Function", "Identity", "Insert", "RegexSplitter", "RegexParser",
    "RegexReplace", "RegexGenerator", "ExpressionFunction", "DateParser",
    "DateFormatter", "FieldJoiner", "FieldFormatter", "Coerce",
    "Filter", "ExpressionFilter", "RegexFilter", "FilterNull", "Not",
    "And", "Or", "Debug",
    "Aggregator", "Count", "Sum", "Average", "Min", "Max", "First", "Last",
    "CountDistinct",
]


# ---------------------------------------------------------------------------
# Functions: declare output fields; produce columns from argument fields.
# ---------------------------------------------------------------------------


class Function:
    """Base row-wise function: given argument fields, emit declared
    output columns (Cascading ``Function`` with declared Fields)."""

    declared: tuple[str, ...] = ()

    def columns(self, df: DataFrame, args: list[str]) -> list[Column]:
        raise NotImplementedError

    #: set by 1->N generators (explode semantics)
    generates_rows = False


class Identity(Function):
    """Pass-through / rename (MultiFamilyHBaseTest.java:77)."""

    def __init__(self, *declared: str):
        self.declared = declared

    def columns(self, df, args):
        names = self.declared or tuple(args)
        return [F.col(a).alias(n) for a, n in zip(args, names)]


class Insert(Function):
    """Constant column(s) (cascading.operation.Insert)."""

    def __init__(self, fields: dict[str, object]):
        self.fields = fields
        self.declared = tuple(fields)

    def columns(self, df, args):
        return [F.lit(v).alias(k) for k, v in self.fields.items()]


class RegexSplitter(Function):
    """Split one string field into N declared fields
    (MultiFamilyHBaseTest.java:54-55)."""

    def __init__(self, declared: tuple[str, ...], pattern: str = " "):
        self.declared = tuple(declared)
        self.pattern = pattern

    def columns(self, df, args):
        split = F.split(F.col(args[0]), self.pattern)
        return [split.getItem(i).alias(n) for i, n in enumerate(self.declared)]


class RegexParser(Function):
    """Extract regex capture groups into declared fields."""

    def __init__(self, declared: tuple[str, ...], pattern: str,
                 groups: tuple[int, ...] | None = None):
        self.declared = tuple(declared)
        self.pattern = pattern
        self.groups = groups or tuple(range(1, len(self.declared) + 1))

    def columns(self, df, args):
        return [
            F.regexp_extract(F.col(args[0]), self.pattern, g).alias(n)
            for g, n in zip(self.groups, self.declared)
        ]


class RegexReplace(Function):
    def __init__(self, declared: str, pattern: str, replacement: str):
        self.declared = (declared,)
        self.pattern, self.replacement = pattern, replacement

    def columns(self, df, args):
        return [
            F.regexp_replace(F.col(args[0]), self.pattern, self.replacement).alias(
                self.declared[0]
            )
        ]


class RegexGenerator(Function):
    """1 row -> N rows of matches (explode)."""

    generates_rows = True

    def __init__(self, declared: str, pattern: str):
        self.declared = (declared,)
        self.pattern = pattern

    def columns(self, df, args):
        return [
            F.explode(
                F.regexp_extract_all(F.col(args[0]), F.lit(self.pattern), F.lit(0))
            ).alias(self.declared[0])
        ]


class ExpressionFunction(Function):
    """Computed column from a SQL expression — SQL replaces Janino
    (MultiFamilyCascadeHBaseTest.java:62)."""

    def __init__(self, declared: str, expr: str):
        self.declared = (declared,)
        self.expr = expr

    def columns(self, df, args):
        return [F.expr(self.expr).alias(self.declared[0])]


class DateParser(Function):
    def __init__(self, declared: str, fmt: str):
        self.declared = (declared,)
        self.fmt = fmt

    def columns(self, df, args):
        return [F.to_timestamp(F.col(args[0]), self.fmt).alias(self.declared[0])]


class DateFormatter(Function):
    def __init__(self, declared: str, fmt: str):
        self.declared = (declared,)
        self.fmt = fmt

    def columns(self, df, args):
        return [F.date_format(F.col(args[0]), self.fmt).alias(self.declared[0])]


class FieldJoiner(Function):
    def __init__(self, declared: str, delimiter: str):
        self.declared = (declared,)
        self.delimiter = delimiter

    def columns(self, df, args):
        return [F.concat_ws(self.delimiter, *args).alias(self.declared[0])]


class FieldFormatter(Function):
    def __init__(self, declared: str, fmt: str):
        self.declared = (declared,)
        self.fmt = fmt

    def columns(self, df, args):
        return [F.format_string(self.fmt, *[F.col(a) for a in args]).alias(self.declared[0])]


class Coerce(Function):
    """Type coercion of fields (cascading Coerce sub-assembly)."""

    def __init__(self, types: dict[str, str]):
        self.types = types
        self.declared = tuple(types)

    def columns(self, df, args):
        return [F.col(c).cast(t).alias(c) for c, t in self.types.items()]


# ---------------------------------------------------------------------------
# Filters: row -> keep?
# ---------------------------------------------------------------------------


class Filter:
    def condition(self, df: DataFrame, args: list[str]) -> Column:
        raise NotImplementedError


class ExpressionFilter(Filter):
    """SQL predicate; NOTE Cascading's ExpressionFilter *removes*
    matching rows — we keep rows where the expression is False to
    preserve that semantic."""

    def __init__(self, expr: str, remove_matches: bool = True):
        self.expr = expr
        self.remove_matches = remove_matches

    def condition(self, df, args):
        c = F.expr(self.expr)
        return ~c if self.remove_matches else c


class RegexFilter(Filter):
    """Keep rows whose field matches (removeMatch=False default)."""

    def __init__(self, pattern: str, remove_match: bool = False):
        self.pattern = pattern
        self.remove_match = remove_match

    def condition(self, df, args):
        c = F.col(args[0]).rlike(self.pattern)
        return ~c if self.remove_match else c


class FilterNull(Filter):
    def condition(self, df, args):
        cond = F.lit(True)
        for a in args:
            cond = cond & F.col(a).isNotNull()
        return cond


class Not(Filter):
    def __init__(self, inner: Filter):
        self.inner = inner

    def condition(self, df, args):
        return ~self.inner.condition(df, args)


class And(Filter):
    def __init__(self, *inner: Filter):
        self.inner = inner

    def condition(self, df, args):
        cond = F.lit(True)
        for f in self.inner:
            cond = cond & f.condition(df, args)
        return cond


class Or(Filter):
    def __init__(self, *inner: Filter):
        self.inner = inner

    def condition(self, df, args):
        cond = F.lit(False)
        for f in self.inner:
            cond = cond | f.condition(df, args)
        return cond


class Debug(Filter):
    """Side-effect print, passes everything (commented use in
    MultiFamilyCascadeHBaseTest.java:63)."""

    def __init__(self, n: int = 20):
        self.n = n

    def condition(self, df, args):
        df.show(self.n)
        return F.lit(True)


# ---------------------------------------------------------------------------
# Aggregators (GroupBy + Every)
# ---------------------------------------------------------------------------


class Aggregator:
    def __init__(self, field: str | None = None, declared: str | None = None):
        self.field = field
        self.declared = declared

    def column(self, sort_key: Column | None, reverse: bool = False) -> Column:
        raise NotImplementedError

    def _name(self, default: str) -> str:
        return self.declared or default


class Count(Aggregator):
    def column(self, sort_key, reverse=False):
        return F.count("*").alias(self._name("count"))


class Sum(Aggregator):
    def column(self, sort_key, reverse=False):
        return F.sum(self.field).alias(self._name(f"sum_{self.field}"))


class Average(Aggregator):
    def column(self, sort_key, reverse=False):
        return F.avg(self.field).alias(self._name(f"avg_{self.field}"))


class Min(Aggregator):
    def column(self, sort_key, reverse=False):
        return F.min(self.field).alias(self._name(f"min_{self.field}"))


class Max(Aggregator):
    def column(self, sort_key, reverse=False):
        return F.max(self.field).alias(self._name(f"max_{self.field}"))


class CountDistinct(Aggregator):
    def column(self, sort_key, reverse=False):
        return F.countDistinct(self.field).alias(self._name(f"n_{self.field}"))


class First(Aggregator):
    """Order-sensitive first — requires the GroupBy's sort key
    (GroupBy secondary sort, SURVEY.md §2.4/§2.5)."""

    def column(self, sort_key, reverse=False):
        if sort_key is None:
            raise ValueError("First requires GroupBy(sort_fields=...)")
        agg = F.max_by if reverse else F.min_by
        return agg(self.field, sort_key).alias(self._name(f"first_{self.field}"))


class Last(Aggregator):
    def column(self, sort_key, reverse=False):
        if sort_key is None:
            raise ValueError("Last requires GroupBy(sort_fields=...)")
        agg = F.min_by if reverse else F.max_by
        return agg(self.field, sort_key).alias(self._name(f"last_{self.field}"))
