"""Flow/Cascade/pipe-API tests mirroring the reference's end-to-end
tests (SURVEY.md §3, §5):

- parse flow: text lines -> RegexSplitter -> keyed sink, 13 lines / 5
  keys -> 5 rows (MultiFamilyHBaseTest.java:50-71)
- copy flow: keyed table -> Identity -> text sink, 5 lines out
  (MultiFamilyHBaseTest.java:74-85)
- cascade: flows connected in reversed order run in dependency order;
  APPEND accumulation 13 -> 26 (MultiFamilyCascadeHBaseTest.java:56-105)
- pipe operator DAG: GroupBy/Every, CoGroup, Merge, Unique, Buffer.
"""

from __future__ import annotations

import pandas as pd
import pytest

from cascading_hbase_spark.operators.functions import (
    Average,
    Count,
    ExpressionFilter,
    ExpressionFunction,
    First,
    Identity,
    Insert,
    Last,
    Max,
    RegexFilter,
    RegexSplitter,
    Sum,
)
from cascading_hbase_spark.operators.pipe import (
    ALL,
    RESULTS,
    Buffer,
    CoGroup,
    Each,
    Every,
    GroupBy,
    Merge,
    Pipe,
    Rename,
    Unique,
)
from cascading_hbase_spark.operators.taps import (
    KeyedTableTap,
    SinkMode,
    TextLineTap,
)
from cascading_hbase_spark.plans.cascade import Cascade, CascadeConnector, Flow, FlowConnector

# src/test/data/small.txt:1-13 — reproduced per FIXTURES.md §A1.
SMALL_LINES = [
    "1 a A", "2 b B", "3 c C", "4 d D", "5 e E", "1 f F", "2 g G",
    "4 h H", "5 i I", "1 j J", "2 k K", "4 l L", "5 m M",
]


@pytest.fixture
def small_txt(tmp_path):
    p = tmp_path / "small.txt"
    p.write_text("\n".join(SMALL_LINES) + "\n")
    return str(p)


def _parse_flow(small_txt, table_path, mode=SinkMode.APPEND):
    """file -> parse -> keyed table (MultiFamilyHBaseTest.java:50-69)."""
    pipe = Pipe("source")
    pipe = Each(pipe, ["line"], RegexSplitter(("num", "lower", "upper"), " "), RESULTS)
    return Flow(
        {"source": TextLineTap(small_txt)},
        KeyedTableTap(table_path, key="num"),
        pipe,
        sink_mode=mode,
        name="parse",
    )


def test_parse_flow_upserts_13_to_5(spark, small_txt, tmp_path):
    table = str(tmp_path / "multitable")
    flow = _parse_flow(small_txt, table)
    flow.complete(spark)
    out = KeyedTableTap(table, key="num").read(spark)
    assert out.count() == 5  # MultiFamilyHBaseTest.java:71
    assert out.columns == ["num", "lower", "upper"]


def test_copy_flow_roundtrip(spark, small_txt, tmp_path):
    """keyed table -> Identity -> text file; verifySink(flow, 5)
    (MultiFamilyHBaseTest.java:74-85)."""
    table = str(tmp_path / "multitable")
    _parse_flow(small_txt, table).complete(spark)

    copy = Each(Pipe("hbase"), None, Identity(), RESULTS)
    sink = TextLineTap(str(tmp_path / "multifamily"))
    flow = FlowConnector().connect({"hbase": KeyedTableTap(table, key="num")}, sink, copy)
    flow.complete(spark)
    assert sink.read(spark).count() == 5


def test_cascade_reversed_order(spark, small_txt, tmp_path):
    """Connect (copy, parse) in reversed order; scheduler must run parse
    first (MultiFamilyCascadeHBaseTest.java:83-87,97-99)."""
    table = str(tmp_path / "multitable")
    parse = _parse_flow(small_txt, table)
    copy = Flow(
        {"hbase": KeyedTableTap(table, key="num")},
        TextLineTap(str(tmp_path / "out")),
        Each(Pipe("hbase"), None, Identity(), RESULTS),
        name="copy",
    )
    cascade = CascadeConnector().connect(copy, parse)  # reversed intentionally
    ran = cascade.complete(spark)
    assert ran == ["parse", "copy"]
    assert TextLineTap(str(tmp_path / "out")).read(spark).count() == 5


def test_cascade_append_accumulates(spark, small_txt, tmp_path):
    """Random keys + APPEND: two cascade runs, 13 -> 26 rows
    (MultiFamilyCascadeHBaseTest.java:89-104)."""
    table = str(tmp_path / "randomtable")
    pipe = Pipe("source")
    pipe = Each(pipe, ["line"], RegexSplitter(("num", "lower", "upper"), " "), RESULTS)
    # nondeterministic key, as in the reference's Janino expression
    # (int)(Math.random()*Integer.MAX_VALUE) — test shape, not values.
    pipe = Each(pipe, None, ExpressionFunction("rand_key", "cast(rand() * 2147483647 as int)"), ALL)
    flow = Flow(
        {"source": TextLineTap(small_txt)},
        KeyedTableTap(table, key="rand_key"),
        pipe,
        name="randparse",
    )
    cascade = Cascade([flow])
    cascade.complete(spark)
    assert KeyedTableTap(table, key="rand_key").read(spark).count() == 13
    cascade.complete(spark)  # keyed sink is always stale -> re-runs
    assert KeyedTableTap(table, key="rand_key").read(spark).count() == 26
    cascade.delete_sinks()
    assert not KeyedTableTap(table, key="rand_key").exists()


def test_groupby_every_aggregates(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("b", 3, 30.0)], "k string, seq int, v double"
    )
    df.createOrReplaceTempView("t")
    pipe = GroupBy(Pipe("t"), group_fields=["k"], sort_fields=["seq"])
    pipe = Every(pipe, [Count(declared="n"), Sum("v", declared="total")])
    pipe = Every(pipe, [First("v", declared="first_v"), Last("v", declared="last_v"),
                        Average("v", declared="avg_v"), Max("seq", declared="max_seq")])
    out = {r["k"]: r for r in pipe.resolve({"t": df}).collect()}
    assert out["a"]["n"] == 2 and out["a"]["total"] == 30.0
    assert out["a"]["first_v"] == 10.0 and out["a"]["last_v"] == 20.0
    assert out["b"]["avg_v"] == 30.0 and out["b"]["max_seq"] == 3


def test_groupby_reverse_flips_first_last(spark):
    df = spark.createDataFrame([("a", 1, "x"), ("a", 2, "y")], "k string, seq int, v string")
    pipe = GroupBy(Pipe("t"), group_fields=["k"], sort_fields=["seq"], reverse=True)
    pipe = Every(pipe, [First("v", declared="f"), Last("v", declared="l")])
    row = pipe.resolve({"t": df}).collect()[0]
    assert (row["f"], row["l"]) == ("y", "x")


def test_cogroup_join_and_selectors(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], "id int, lv string")
    right = spark.createDataFrame([(1, "x"), (3, "z")], "rid int, rv string")
    j = CoGroup(Pipe("l"), ["id"], Pipe("r"), ["rid"])
    rows = j.resolve({"l": left, "r": right}).collect()
    assert len(rows) == 1 and rows[0]["lv"] == "a" and rows[0]["rv"] == "x"

    jl = CoGroup(Pipe("l"), ["id"], Pipe("r"), ["rid"], joiner="left")
    assert jl.resolve({"l": left, "r": right}).count() == 2


def test_cogroup_rejects_overlapping_fields(spark):
    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(ValueError, match="disjoint"):
        CoGroup(Pipe("a"), ["id"], Pipe("b"), ["id"]).resolve({"a": df, "b": df})


def test_merge_unique_filters(spark):
    a = spark.createDataFrame([("x",), ("y",)], "v string")
    b = spark.createDataFrame([("y",), ("z",)], "v string")
    merged = Merge(Pipe("a"), Pipe("b"))
    assert merged.resolve({"a": a, "b": b}).count() == 4
    uniq = Unique(merged)
    assert uniq.resolve({"a": a, "b": b}).count() == 3

    f = Each(Pipe("a"), ["v"], RegexFilter("x"))
    assert f.resolve({"a": a}).count() == 1
    # ExpressionFilter removes matching rows (Cascading semantics)
    ef = Each(Pipe("a"), None, ExpressionFilter("v = 'x'"))
    assert {r["v"] for r in ef.resolve({"a": a}).collect()} == {"y"}


def test_each_selectors_and_insert(spark):
    df = spark.createDataFrame([(1, 2)], "a int, b int")
    e_all = Each(Pipe("t"), ["a"], ExpressionFunction("c", "a + 10"), ALL)
    assert e_all.resolve({"t": df}).columns == ["a", "b", "c"]
    e_res = Each(Pipe("t"), ["a"], ExpressionFunction("c", "a + 10"), RESULTS)
    assert e_res.resolve({"t": df}).columns == ["c"]
    ins = Each(Pipe("t"), None, Insert({"tag": "z"}), ALL)
    assert ins.resolve({"t": df}).collect()[0]["tag"] == "z"
    ren = Rename(Pipe("t"), {"a": "alpha"})
    assert ren.resolve({"t": df}).columns == ["alpha", "b"]
    # bare Identity (no declared) with ALL: output names resolve via the
    # public schema, no duplicate columns appended
    e_id = Each(Pipe("t"), ["a"], Identity(), ALL)
    assert e_id.resolve({"t": df}).columns == ["b", "a"]


def test_replace_and_swap_selectors(spark):
    """Fields.REPLACE substitutes results IN the argument positions
    (Cascading Fields algebra, HBaseScheme.java:157-162); SWAP drops the
    args and appends the declared fields."""
    from cascading_hbase_spark.operators.pipe import REPLACE, SWAP

    df = spark.createDataFrame([(1, 2, 3)], "a int, b int, c int")
    rep = Each(Pipe("t"), ["b"], ExpressionFunction("b2", "b * 10"), REPLACE)
    out = rep.resolve({"t": df})
    # column ORDER preserved, result sits where the argument was
    assert out.columns == ["a", "b2", "c"]
    assert out.collect()[0] == (1, 20, 3)
    # arity mismatch is an error under REPLACE
    two = Each(Pipe("t"), ["b", "c"], ExpressionFunction("x", "b + c"), REPLACE)
    with pytest.raises(ValueError, match="REPLACE"):
        two.resolve({"t": df})
    swp = Each(Pipe("t"), ["b", "c"], ExpressionFunction("s", "b + c"), SWAP)
    out2 = swp.resolve({"t": df})
    assert out2.columns == ["a", "s"]
    assert out2.collect()[0] == (1, 5)


def test_buffer_apply_in_pandas(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], "k string, v double"
    )

    def spread(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [pdf["k"].iloc[0]], "spread": [pdf["v"].max() - pdf["v"].min()]})

    g = GroupBy(Pipe("t"), group_fields=["k"])
    buf = Buffer(g, spread, "k string, spread double")
    out = {r["k"]: r["spread"] for r in buf.resolve({"t": df}).collect()}
    assert out == {"a": 1.0, "b": 0.0}


def test_flow_unbound_head_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="unbound"):
        Flow(
            {"wrong": TextLineTap(str(tmp_path / "x"))},
            TextLineTap(str(tmp_path / "y")),
            Pipe("source"),
        )


def test_debug_passthrough(spark, capsys):
    """Debug prints and passes tuples through unchanged
    (MultiFamilyCascadeHBaseTest.java:63)."""
    from cascading_hbase_spark.operators.pipe import Debug, Pipe

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    p = Debug(Pipe("src"), n=2)
    out = p.resolve({"src": df})
    assert sorted(map(tuple, out.collect())) == [(1, "a"), (2, "b")]
    assert "a" in capsys.readouterr().out


def test_csv_and_json_tap_roundtrip(spark, tmp_path):
    """Csv/Json taps round-trip a frame with schema intact."""
    from cascading_hbase_spark.operators.taps import CsvTap, JsonTap

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id int, name string, score double"
    )
    csv = CsvTap(str(tmp_path / "c"), schema="id int, name string, score double")
    csv.write(df)
    assert sorted(map(tuple, csv.read(spark).collect())) == sorted(map(tuple, df.collect()))

    js = JsonTap(str(tmp_path / "j"))
    js.write(df)
    got = js.read(spark).select("id", "name", "score")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, df.collect()))


def test_orc_tap_roundtrip_and_pushdown(spark, tmp_path):
    """Orc tap round-trips with schema intact and, like parquet, gets
    predicate pushdown at the scan."""
    from cascading_hbase_spark.operators.taps import OrcTap

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id int, name string, score double"
    )
    tap = OrcTap(str(tmp_path / "o"))
    tap.write(df)
    back = tap.read(spark)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    import pyspark.sql.functions as F

    plan = (
        back.filter(F.col("id") > 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "GreaterThan" in plan


def test_partitioned_tap_routes_and_prunes(spark, tmp_path):
    """TemplateTap analogue: tuples fan out into value-derived
    directories; a filter on the partition column reads only its
    directory (partition pruning)."""
    import os

    from cascading_hbase_spark.operators.taps import PartitionedParquetTap

    path = str(tmp_path / "bysrc")
    tap = PartitionedParquetTap(path, ["source"])
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "a", 30)], "id long, source string, v long"
    )
    tap.write(df)
    assert sorted(
        d for d in os.listdir(path) if d.startswith("source=")
    ) == ["source=a", "source=b"]
    back = tap.read(spark)
    assert back.count() == 3
    pruned = back.filter("source = 'a'")
    assert pruned.count() == 2
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "source" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    with pytest.raises(ValueError):
        tap.write(df.drop("source"))


def test_multi_source_tap_unions_members(spark, tmp_path):
    from cascading_hbase_spark.operators.taps import MultiSourceTap, ParquetTap

    a, b = ParquetTap(str(tmp_path / "a")), ParquetTap(str(tmp_path / "b"))
    a.write(spark.createDataFrame([(1, "x")], "id long, s string"))
    b.write(spark.createDataFrame([(2, "y")], "id long, s string"))
    multi = MultiSourceTap([a, b])
    assert multi.exists()
    got = {tuple(r) for r in multi.read(spark).collect()}
    assert got == {(1, "x"), (2, "y")}
    assert multi.uri().startswith("multi:[")
    with pytest.raises(NotImplementedError):
        multi.write(a.read(spark))


def test_curation_pipeline_cascade(spark, tmp_path):
    """End-to-end LLM-curation assembly through the cascade scheduler:
    (A) documents -> length gate -> exact dedup -> partitioned curated
    store, (B) curated -> token count -> keyed sink.  Flows are
    connected in REVERSED order (the reference test's trick,
    MultiFamilyCascadeHBaseTest.java:83,97) and the scheduler must
    still run A before B."""
    from cascading_hbase_spark.operators.functions import (
        ExpressionFilter,
        ExpressionFunction,
    )
    from cascading_hbase_spark.operators.pipe import Each, Pipe, Unique
    from cascading_hbase_spark.operators.taps import (
        KeyedTableTap,
        ParquetTap,
        PartitionedParquetTap,
    )

    docs = ParquetTap("/root/testdata/sf0.001/documents.parquet")
    curated_tap = PartitionedParquetTap(str(tmp_path / "curated"), ["source"])
    sink_tap = KeyedTableTap(str(tmp_path / "packed"), key="doc_id")

    clean = Pipe("docs")
    clean = Each(clean, None, ExpressionFilter("n_chars < 50"))  # remove short
    clean = Unique(clean, ["text"])
    flow_a = Flow({"docs": docs}, curated_tap, clean, name="curate")

    pack = Pipe("curated")
    pack = Each(pack, None, ExpressionFunction(
        "n_tokens", "size(split(text, ' '))"))
    flow_b = Flow({"curated": curated_tap}, sink_tap, pack, name="pack")

    ran = CascadeConnector().connect(flow_b, flow_a).complete(spark)  # reversed
    assert ran.index("curate") < ran.index("pack")

    out = sink_tap.read(spark)
    src = docs.read(spark)
    expected = (
        src.filter("n_chars >= 50").dropDuplicates(["text"]).count()
    )
    assert out.count() == expected
    assert "n_tokens" in out.columns


def test_sequencefile_tap_roundtrip_and_append(spark, tmp_path):
    """SequenceFile scheme analogue: key + JSON-tuple payload, declared
    read schema, APPEND adds a batch directory (13->26 accumulation,
    MultiFamilyCascadeHBaseTest.java:94-104's shape on a file tap)."""
    from cascading_hbase_spark.operators.taps import SequenceFileTap, SinkMode

    df = spark.createDataFrame(
        [(1, "one", 1.5), (2, "two", 2.5), (3, "three", 3.5)],
        "num long, word string, score double",
    )
    tap = SequenceFileTap(
        str(tmp_path / "seq"), key_field="num long", schema="word string, score double"
    )
    tap.write(df)
    back = tap.read(spark)
    # declared key dtype round-trips (the key is a Text writable on
    # disk but casts back on read, like the payload columns)
    assert dict(back.dtypes)["num"] == "bigint"
    assert sorted((r.num, r.word, r.score) for r in back.collect()) == [
        (1, "one", 1.5), (2, "two", 2.5), (3, "three", 3.5)
    ]
    # legacy bare-name contract: key stays string
    legacy = SequenceFileTap(
        str(tmp_path / "seq"), key_field="num", schema="word string, score double"
    ).read(spark)
    assert dict(legacy.dtypes)["num"] == "string"
    tap.write(df, mode=SinkMode.APPEND)
    assert tap.read(spark).count() == 6
    import pytest as _pytest
    with _pytest.raises(FileExistsError):
        tap.write(df, mode=SinkMode.KEEP)


def test_cascade_parallel_respects_dependencies(spark, tmp_path):
    """parallel=True runs independent flows concurrently but a consumer
    flow only after ALL its producers: two independent source flows
    feed a third that joins their sinks (connected in reversed order on
    purpose, MultiFamilyCascadeHBaseTest.java:83-87)."""
    import pyspark.sql.functions as F

    from cascading_hbase_spark.operators.pipe import CoGroup
    from cascading_hbase_spark.operators.taps import ParquetTap

    src_a = ParquetTap(str(tmp_path / "a"))
    src_b = ParquetTap(str(tmp_path / "b"))
    spark.createDataFrame(
        [(i, i * 2) for i in range(50)], "k long, va long"
    ).write.parquet(src_a.path)
    spark.createDataFrame(
        [(i, i * 3) for i in range(50)], "kb long, vb long"
    ).write.parquet(src_b.path)

    t1, t2, t3 = (ParquetTap(str(tmp_path / n)) for n in ("t1", "t2", "t3"))
    fa = Flow(src_a, t1, Each(Pipe("pa"), None, Identity(), RESULTS), name="fa")
    fb = Flow(src_b, t2, Each(Pipe("pb"), None, Identity(), RESULTS), name="fb")
    fj = Flow(
        {"left": t1, "right": t2},
        t3,
        CoGroup(Pipe("left"), ["k"], Pipe("right"), ["kb"]),
        name="fj",
    )

    # reversed order on purpose: consumer first
    ran = Cascade([fj, fa, fb]).complete(spark, force=True, parallel=True)
    assert set(ran) == {"fa", "fb", "fj"}
    assert ran[-1] == "fj", ran  # consumer strictly after both producers
    out = spark.read.parquet(t3.path)
    assert out.count() == 50
    assert out.filter(F.col("va") * 3 == F.col("vb") * 2).count() == 50


def test_cogroup_buffer_two_sided_pandas(spark):
    """CoGroup + Buffer (two-sided per-key iterator): each key's rows
    from both pipes arrive as aligned pandas frames.  Per-user
    reconciliation (purchase total minus click total) must equal the
    plain join-aggregate formulation."""
    import pyspark.sql.functions as F

    from cascading_hbase_spark.operators.pipe import CoGroupBuffer

    e = spark.createDataFrame(
        [(u, t, float(v)) for u in range(20)
         for t, v in (("click", u), ("click", 2 * u), ("purchase", 10 * u))],
        "user_id long, event_type string, value double",
    )
    clicks = e.filter(F.col("event_type") == "click")
    purchases = e.filter(F.col("event_type") == "purchase")

    def reconcile(left_pdf, right_pdf):
        import pandas as pd

        uid = (left_pdf["user_id"].iloc[0] if len(left_pdf)
               else right_pdf["user_id"].iloc[0])
        return pd.DataFrame(
            {"user_id": [uid],
             "net": [right_pdf["value"].sum() - left_pdf["value"].sum()]}
        )

    left, right = Pipe("clicks"), Pipe("purchases")
    pipe = CoGroupBuffer(
        left, ["user_id"], right, ["user_id"], reconcile,
        "user_id long, net double",
    )
    got = {r.user_id: r.net
           for r in pipe.resolve({"clicks": clicks, "purchases": purchases}).collect()}
    expect = {u: 10.0 * u - (u + 2.0 * u) for u in range(20)}
    assert got == expect


def test_cascade_schedules_maintenance_nodes(spark, small_txt, tmp_path):
    """Replica sync and matview refresh as first-class cascade nodes:
    connected in reversed order, the scheduler still runs ingest ->
    sync -> (view refresh after sync's sink); after the cascade the
    replica equals the primary and the view equals the aggregate."""
    from cascading_hbase_spark.keyed.matview import (
        create_aggregate_view,
        read_aggregate_view,
        refresh_aggregate_view,
    )
    from cascading_hbase_spark.keyed.replica import create_replica, sync_replica
    from cascading_hbase_spark.keyed.table import read_keyed
    from cascading_hbase_spark.plans.cascade import CascadeConnector, MaintenanceFlow

    primary = str(tmp_path / "primary")
    replica = str(tmp_path / "replica")
    vpath = str(tmp_path / "view")

    ingest = _parse_flow(small_txt, primary)
    ingest.complete(spark)  # seed so replica/view can be created
    create_replica(spark, primary, replica)
    create_aggregate_view(spark, primary, vpath, "lower")

    ptap = KeyedTableTap(primary, key="num")
    sync = MaintenanceFlow(
        ptap, KeyedTableTap(replica, key="num"),
        lambda s: sync_replica(s, primary, replica), name="sync",
    )
    refresh = MaintenanceFlow(
        KeyedTableTap(replica, key="num"),  # depends on sync's sink
        KeyedTableTap(vpath, key="lower"),
        lambda s: refresh_aggregate_view(s, primary, vpath), name="refresh",
    )
    cascade = CascadeConnector().connect(refresh, sync, ingest)  # reversed
    ran = cascade.complete(spark)
    assert ran[0] == ingest.name and ran.index("sync") < ran.index("refresh")

    want = sorted(tuple(r) for r in read_keyed(spark, primary).collect())
    got = sorted(tuple(r) for r in read_keyed(spark, replica).collect())
    assert got == want and len(got) > 0
    view_groups = {r[0] for r in read_aggregate_view(spark, vpath).collect()}
    assert view_groups == {r[1] for r in want}


def test_cascade_vacuum_and_compact_maintenance_nodes(spark, tmp_path):
    """Space maintenance as cascade nodes: repeated upserts fragment a
    table into many generations; a cascade chains compact -> vacuum
    after the writes and the table ends with one generation dir per
    bucket, contents intact — the nightly maintenance-window shape."""
    import os

    from cascading_hbase_spark.keyed.table import (
        compact_keyed, read_keyed, vacuum_keyed, write_keyed,
    )
    from cascading_hbase_spark.operators.taps import KeyedTableTap
    from cascading_hbase_spark.plans.cascade import (
        CascadeConnector, MaintenanceFlow,
    )

    path = str(tmp_path / "frag")
    write_keyed(
        spark.createDataFrame([(1, 1.0)], "k long, v double"),
        path, "k", n_buckets=1, retain=10,
    )
    for i in range(2, 7):
        write_keyed(
            spark.createDataFrame([(i, float(i))], "k long, v double"),
            path, "k",
        )
    tap = KeyedTableTap(path, key="k")
    compact = MaintenanceFlow(
        tap, tap, lambda s: compact_keyed(s, path), name="compact"
    )
    vacuum = MaintenanceFlow(
        tap, tap, lambda s: vacuum_keyed(path, retain=1), name="vacuum"
    )
    # same-sink nodes: the LAST-registered producer of a tap URI wins,
    # so connect(vacuum, compact) makes vacuum depend on compact —
    # compact runs first (asserted by the 1-generation end state)
    ran = CascadeConnector().connect(vacuum, compact).complete(spark)
    assert set(ran) == {"compact", "vacuum"}

    base = os.path.join(path, "_kt_bucket=0")
    gens = [d for d in os.listdir(base) if d.startswith("_kt_gen=")]
    assert len(gens) == 1  # fully reclaimed
    got = sorted((r.k, r.v) for r in read_keyed(spark, path).collect())
    assert got == [(i, float(i)) for i in range(1, 7)]


def test_atomic_cascade_all_or_nothing(spark, tmp_path):
    """A maintenance cascade with ``atomic_tables`` commits its whole
    pass as ONE transaction (keyed/txn.py): a member flow failing
    mid-pass leaves every table at its pre-pass version, and a clean
    pass flips them together (r10, VERDICT r09 item 5b's cascade
    integration)."""
    import pytest as _pytest

    from cascading_hbase_spark.keyed.controlplane import get_control_plane
    from cascading_hbase_spark.keyed.matview import (
        create_aggregate_view, read_aggregate_view, refresh_aggregate_view,
    )
    from cascading_hbase_spark.keyed.replica import (
        create_replica, sync_replica,
    )
    from cascading_hbase_spark.keyed.table import (
        SinkMode, read_keyed, write_keyed,
    )
    from cascading_hbase_spark.operators.taps import KeyedTableTap
    from cascading_hbase_spark.plans.cascade import Cascade, MaintenanceFlow

    primary = str(tmp_path / "p")
    replica = str(tmp_path / "r")
    vpath = str(tmp_path / "v")
    df = lambda rows: spark.createDataFrame(rows, "k long, g string, v double")  # noqa: E731
    write_keyed(df([(1, "a", 1.0), (2, "b", 2.0)]), primary, "k", retain=10)
    create_replica(spark, primary, replica)
    create_aggregate_view(spark, replica, vpath, "g", {"total": "v"})

    def versions():
        cp = get_control_plane()
        return [
            cp.read_json(p + "/_kt_meta.json")["version"]
            for p in (primary, replica, vpath)
        ]

    ptap = KeyedTableTap(primary, key="k")
    rtap = KeyedTableTap(replica, key="k")
    ingest = MaintenanceFlow(
        ptap, ptap,
        lambda s: write_keyed(
            df([(3, "a", 10.0)]), primary, "k", mode=SinkMode.APPEND
        ),
        name="ingest",
    )
    sync = MaintenanceFlow(
        ptap, rtap, lambda s: sync_replica(s, primary, replica), name="sync"
    )
    boom = MaintenanceFlow(
        rtap, KeyedTableTap(vpath, key="g"),
        lambda s: (_ for _ in ()).throw(RuntimeError("refresh exploded")),
        name="boom",
    )
    with _pytest.raises(RuntimeError, match="refresh exploded"):
        Cascade(
            [ingest, sync, boom], atomic_tables=[primary, replica, vpath]
        ).complete(spark)
    # nothing flipped: the pass aborted as a unit
    assert versions() == [1, 1, 1]
    assert read_keyed(spark, primary).count() == 2

    refresh = MaintenanceFlow(
        rtap, KeyedTableTap(vpath, key="g"),
        lambda s: refresh_aggregate_view(s, replica, vpath), name="refresh",
    )
    ran = Cascade(
        [refresh, sync, ingest],  # reversed on purpose; topo-sort orders
        atomic_tables=[primary, replica, vpath],
    ).complete(spark)
    assert ran.index("ingest") < ran.index("sync") < ran.index("refresh")
    assert versions() == [2, 2, 2]
    totals = {
        r.g: r.total for r in read_aggregate_view(spark, vpath).collect()
    }
    assert totals == {"a": 11.0, "b": 2.0}
    # parallel + atomic is an explicit refusal
    with _pytest.raises(ValueError, match="serial"):
        Cascade([ingest], atomic_tables=[primary]).complete(
            spark, parallel=True
        )


def test_cascade_drives_streaming_cdc_maintenance(spark, tmp_path):
    """The STREAMING maintenance twins are cascade-schedulable through
    the same MaintenanceFlow node as their scheduled counterparts: a
    cascade chains ingest -> stream-follower drain -> stream-view
    drain (over the follower), each node one checkpointed availableNow
    run; after the cascade the follower equals the primary and the
    view equals the aggregate — the nightly-window shape, but each
    node is incremental CDC instead of a rebuild."""
    from cascading_hbase_spark import streaming as S
    from cascading_hbase_spark.keyed.matview import read_aggregate_view
    from cascading_hbase_spark.keyed.table import (
        SinkMode, read_keyed, write_keyed,
    )
    from cascading_hbase_spark.plans.cascade import (
        CascadeConnector, MaintenanceFlow,
    )

    primary = str(tmp_path / "p")
    follower = str(tmp_path / "f")
    view = str(tmp_path / "v")
    c1, c2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    df0 = spark.createDataFrame(
        [(1, "g1", 10), (2, "g2", 20)], "key long, grp string, cents long"
    )
    write_keyed(df0, primary, "key", retain=10)
    # seed both streaming targets (first drains)
    S.stream_replica(spark, primary, follower, c1).awaitTermination()
    S.stream_matview(spark, follower, view, c2, "grp",
                     {"cents_total": "cents"}).awaitTermination()

    df1 = spark.createDataFrame(
        [(2, "g1", 25), (3, "g2", 30)], "key long, grp string, cents long"
    )
    ingest = MaintenanceFlow(
        KeyedTableTap(primary, key="key"), KeyedTableTap(primary, key="key"),
        lambda s: write_keyed(df1, primary, "key", mode=SinkMode.APPEND),
        name="ingest",
    )
    drain_follower = MaintenanceFlow(
        KeyedTableTap(primary, key="key"),
        KeyedTableTap(follower, key="key"),
        lambda s: S.stream_replica(s, primary, follower, c1).awaitTermination(),
        name="drain_follower",
    )
    drain_view = MaintenanceFlow(
        KeyedTableTap(follower, key="key"),
        KeyedTableTap(view, key="grp"),
        lambda s: S.stream_matview(s, follower, view, c2).awaitTermination(),
        name="drain_view",
    )
    ran = CascadeConnector().connect(drain_view, drain_follower, ingest)\
        .complete(spark)
    assert ran.index("ingest") < ran.index("drain_follower") < ran.index("drain_view")
    assert sorted(tuple(r) for r in read_keyed(spark, follower).collect()) == \
        sorted(tuple(r) for r in read_keyed(spark, primary).collect())
    got = sorted(
        tuple(r)
        for r in read_aggregate_view(spark, view)
        .select("grp", "n_rows", "cents_total").collect()
    )
    assert got == [("g1", 2, 35), ("g2", 1, 30)]


def test_cascade_keeps_stats_fresh(spark, small_txt, tmp_path):
    """Statistics upkeep as a scheduled maintenance node (r13): an
    ``analyze_keyed`` MaintenanceFlow rides the same cascade as the
    ingest it follows, so the stats every stats-driven planner
    consults (salt factors, broadcast advice, access paths) refresh
    whenever the data does — and analyze_keyed's fingerprint no-op
    means a pass over unchanged data commits nothing, exactly the
    incremental no-op-when-current semantics the other maintenance
    nodes already have."""
    from cascading_hbase_spark.keyed.stats import analyze_keyed, table_stats
    from cascading_hbase_spark.keyed.table import table_version
    from cascading_hbase_spark.plans.cascade import (
        CascadeConnector,
        MaintenanceFlow,
    )

    primary = str(tmp_path / "primary")
    ingest = _parse_flow(small_txt, primary)
    ptap = KeyedTableTap(primary, key="num")
    analyze = MaintenanceFlow(
        ptap, ptap,
        lambda s: analyze_keyed(s, primary, heavy_hitters=3),
        name="analyze",
    )
    cascade = CascadeConnector().connect(analyze, ingest)  # reversed
    ran = cascade.complete(spark)
    assert ran.index(ingest.name) < ran.index("analyze")
    st = table_stats(primary)
    assert st["data_changed"] is False and st["row_count"] > 0

    # a second pass over unchanged data: the analyze node no-ops
    v1 = table_version(primary)
    analyze.complete(spark)
    assert table_version(primary) == v1
