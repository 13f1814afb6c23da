"""Write-time expectations: split semantics, fail atomicity,
quarantine round-trip, and interaction with the keyed LWW sink."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cascading_hbase_spark.keyed.expectations import (
    Expectation,
    ExpectationError,
    apply_expectations,
    write_keyed_validated,
)
from cascading_hbase_spark.keyed.table import read_keyed



from tests.conftest import _examples  # noqa: E402  (shared budget helper)

@pytest.fixture()
def batch(spark):
    return spark.createDataFrame(
        [
            (1, "good text", 0.9),
            (2, None, 0.8),          # null text
            (3, "x", 0.2),           # low score
            (4, "also fine", 0.7),
            (5, None, 0.1),          # breaks both
        ],
        "k long, text string, score double",
    )


E_TEXT = Expectation("text_not_null", "text IS NOT NULL")
E_SCORE = Expectation("score_ok", "score >= 0.5")


def test_split_tags_every_broken_expectation(batch):
    passed, violations = apply_expectations(batch, [E_TEXT, E_SCORE])
    assert sorted(r.k for r in passed.collect()) == [1, 4]
    got = {r.k: list(r._violated) for r in violations.collect()}
    assert got == {
        2: ["text_not_null"],
        3: ["score_ok"],
        5: ["score_ok", "text_not_null"],
    }


def test_null_condition_counts_as_violation(spark):
    df = spark.createDataFrame([(1, None)], "k long, score double")
    # score >= 0.5 is NULL for a NULL score -> must NOT pass
    passed, violations = apply_expectations(
        df, [Expectation("s", "score >= 0.5")]
    )
    assert passed.count() == 0
    assert violations.count() == 1


def test_fail_rejects_whole_batch_atomically(batch, tmp_path):
    tbl = str(tmp_path / "t")
    with pytest.raises(ExpectationError, match="text_not_null"):
        write_keyed_validated(
            batch, tbl, "k",
            [Expectation("text_not_null", "text IS NOT NULL", "fail")],
        )
    import os

    from cascading_hbase_spark.keyed.table import META_FILE

    assert not os.path.exists(os.path.join(tbl, META_FILE))
    assert not os.path.exists(tbl)  # nothing at all was written


def test_quarantine_roundtrip_and_clean_table(spark, batch, tmp_path):
    tbl, qdir = str(tmp_path / "t"), str(tmp_path / "q")
    write_keyed_validated(
        batch, tbl, "k", [E_TEXT, E_SCORE], quarantine_path=qdir
    )
    assert sorted(r.k for r in read_keyed(spark, tbl).collect()) == [1, 4]
    q = spark.read.parquet(qdir)
    assert sorted(r.k for r in q.collect()) == [2, 3, 5]
    tags = {r.k: list(r._violated) for r in q.collect()}
    assert tags[5] == ["score_ok", "text_not_null"]


def test_drop_excludes_without_quarantine_dir(spark, batch, tmp_path):
    tbl = str(tmp_path / "t")
    write_keyed_validated(
        batch, tbl, "k",
        [Expectation("text_not_null", "text IS NOT NULL", "drop"),
         Expectation("score_ok", F.col("score") >= 0.5, "drop")],
    )
    assert sorted(r.k for r in read_keyed(spark, tbl).collect()) == [1, 4]


def test_quarantine_action_requires_path(batch, tmp_path):
    with pytest.raises(ValueError, match="quarantine_path"):
        write_keyed_validated(batch, str(tmp_path / "t"), "k", [E_TEXT])


def test_mixed_actions_route_correctly(spark, batch, tmp_path):
    tbl, qdir = str(tmp_path / "t"), str(tmp_path / "q")
    write_keyed_validated(
        batch, tbl, "k",
        [Expectation("text_not_null", "text IS NOT NULL", "drop"),
         Expectation("score_ok", F.col("score") >= 0.5, "quarantine")],
        quarantine_path=qdir,
    )
    assert sorted(r.k for r in read_keyed(spark, tbl).collect()) == [1, 4]
    # only score_ok violations reach quarantine; row 2 (drop-only) does not
    q = {r.k for r in spark.read.parquet(qdir).collect()}
    assert q == {3, 5}


def test_bad_action_rejected():
    with pytest.raises(ValueError, match="fail|drop|quarantine"):
        Expectation("x", "1=1", "explode")


def test_duplicate_names_rejected(batch):
    with pytest.raises(ValueError, match="duplicate"):
        apply_expectations(batch, [E_TEXT, Expectation("text_not_null", "1=1")])


def test_drop_only_gate_writes_no_quarantine_files(spark, batch, tmp_path):
    """A drop/fail-only gate must not touch the quarantine dir at all
    (review finding: the unconditional write appended empty parquet
    datasets every call — every micro-batch under streaming)."""
    import os

    tbl, qdir = str(tmp_path / "t"), str(tmp_path / "q")
    write_keyed_validated(
        batch, tbl, "k",
        [Expectation("text_not_null", "text IS NOT NULL", "drop")],
        quarantine_path=qdir,
    )
    assert not os.path.exists(qdir)


def test_reprocess_quarantine_roundtrip(spark, batch, tmp_path):
    """Fix-and-replay: a repair transform rescues some quarantined
    rows; they upsert into the table and the unfixable remainder comes
    back tagged.  Replaying is idempotent on the table (LWW)."""
    from cascading_hbase_spark.keyed.expectations import reprocess_quarantine

    tbl, qdir = str(tmp_path / "t"), str(tmp_path / "q")
    write_keyed_validated(
        batch, tbl, "k", [E_TEXT, E_SCORE], quarantine_path=qdir
    )
    # fixer backfills missing text but cannot repair low scores
    def fixer(df):
        return df.withColumn("text", F.coalesce(F.col("text"), F.lit("backfilled")))

    rest = reprocess_quarantine(
        spark, qdir, tbl, "k", [E_TEXT, E_SCORE], fixer=fixer
    )
    assert sorted(r.k for r in read_keyed(spark, tbl).collect()) == [1, 2, 4]
    got = {r.k: sorted(r._violated) for r in rest.collect()}
    assert got == {3: ["score_ok"], 5: ["score_ok"]}
    # replay: same quarantine, same fixer — table unchanged (LWW upsert)
    reprocess_quarantine(spark, qdir, tbl, "k", [E_TEXT, E_SCORE], fixer=fixer)
    assert sorted(r.k for r in read_keyed(spark, tbl).collect()) == [1, 2, 4]


def test_reprocess_rejects_column_dropping_fixer(spark, batch, tmp_path):
    from cascading_hbase_spark.keyed.expectations import reprocess_quarantine

    tbl, qdir = str(tmp_path / "t"), str(tmp_path / "q")
    write_keyed_validated(batch, tbl, "k", [E_TEXT], quarantine_path=qdir)
    with pytest.raises(ValueError, match="dropped required columns"):
        reprocess_quarantine(
            spark, qdir, tbl, "k", [E_TEXT], fixer=lambda df: df.drop("text")
        )


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=_examples(8),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),       # key
            st.integers(min_value=-100, max_value=100),   # val
        ),
        min_size=1,
        max_size=12,
    ),
    threshold=st.integers(min_value=-50, max_value=50),
)
def test_quarantine_partition_is_exact(spark, tmp_path_factory, rows, threshold):
    """Property: for a random batch and a random rule threshold, the
    table receives exactly the LWW collapse of the passing rows, the
    quarantine receives exactly the failing rows (each tagged with the
    broken rule), and no row is lost or duplicated across the split."""
    import uuid as _uuid

    from cascading_hbase_spark.keyed.table import read_keyed

    base = tmp_path_factory.mktemp("exp")
    path = str(base / f"t{_uuid.uuid4().hex[:8]}")
    qdir = str(base / f"q{_uuid.uuid4().hex[:8]}")
    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)],
        "key long, val long, seq long",
    )
    write_keyed_validated(
        df, path, "key",
        [Expectation("val_ge_thr", f"val >= {threshold}")],
        quarantine_path=qdir,
        seq_col="seq",  # batch-order LWW, matching the model below
    )
    passing = [(k, v) for k, v in rows if v >= threshold]
    model = {}
    for k, v in passing:
        model[k] = v
    stored = {
        r["key"]: r["val"] for r in read_keyed(spark, path).collect()
    } if passing else {}
    assert stored == model
    failing = [(k, v) for k, v in rows if v < threshold]
    import os

    if failing:
        q = spark.read.parquet(qdir)
        got_q = sorted((r["key"], r["val"]) for r in q.collect())
        assert got_q == sorted(failing)
        assert all(r["_violated"] == ["val_ge_thr"] for r in q.collect())
    elif os.path.isdir(qdir):
        # an all-clean batch still writes an (empty) quarantine dir —
        # harmless and parquet-readable; it must contain zero rows
        assert spark.read.parquet(qdir).count() == 0
