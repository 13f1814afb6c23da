"""Value-level equivalence of the array-form dedup rewrites vs the
exploded formulations they replaced (ADVICE r03: the refactors shipped
oracle-unvalidated because the driver budget cut those queries).

The exploded forms (`minhash_signatures` over `shingle_rows`) are still
in the library — `dedup_audit_minhash` uses them — so the test computes
BOTH forms on real testdata plus hand-built edge cases and asserts
identical outputs.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from cascading_hbase_spark.catalog import load_table
from cascading_hbase_spark.functions.dedup import (
    _array_signatures,
    hash64,
    minhash_signatures,
    shingle_arrays,
    shingle_rows,
    simhash,
)
from cascading_hbase_spark.functions.text import tokens

SF = "/root/testdata/sf0.001"

EDGE_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "short doc"),          # < shingle_n tokens: no shingles
    (4, ""),                   # empty text
    (5, None),                 # null text
    (6, "a a a a a a"),        # all-duplicate tokens
    (7, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
]



from tests.conftest import _examples  # noqa: E402  (shared budget helper)

def _edge_df(spark):
    return spark.createDataFrame(EDGE_DOCS, "doc_id long, text string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_minhash_array_form_matches_exploded_form_edge_cases(spark):
    df = _edge_df(spark)
    exploded = minhash_signatures(shingle_rows(df, "doc_id", "text"), "doc_id", 8)
    arrayed = _array_signatures(shingle_arrays(df, "doc_id", "text"), "doc_id", 8)
    assert _rows(exploded) == _rows(arrayed)
    # docs 3/4/5 produce no shingles and must be absent from BOTH
    present = {r[0] for r in exploded.collect()}
    assert present == {1, 2, 6, 7}


def test_minhash_array_form_matches_exploded_form_testdata(spark):
    df = load_table(spark, SF, "documents").select("doc_id", "text")
    exploded = minhash_signatures(shingle_rows(df, "doc_id", "text"), "doc_id", 8)
    arrayed = _array_signatures(shingle_arrays(df, "doc_id", "text"), "doc_id", 8)
    e, a = _rows(exploded), _rows(arrayed)
    assert len(e) > 0 and e == a


def _simhash_exploded(df, bits=32):
    """The pre-rewrite formulation: explode distinct tokens, per-bit
    majority vote as a grouped aggregate (one row per doc emitted only
    when the doc has tokens — matches the DuckDB oracle's unnest)."""
    tok = df.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("t")
    ).withColumn("h", hash64(F.col("t")))
    votes = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    g = tok.groupBy("doc_id").agg(*votes)
    total = F.lit(0).cast("bigint")
    for b in range(bits):
        total = total + F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return g.select("doc_id", total.cast("bigint").alias("simhash"))


def test_simhash_array_form_matches_exploded_form_edge_cases(spark):
    df = _edge_df(spark)
    got, want = _rows(simhash(df, "doc_id", "text")), _rows(_simhash_exploded(df))
    assert got == want
    # null-text docs emit NO row (not a NULL fingerprint); empty text
    # tokenizes to [''] in both forms, so doc 4 legitimately stays
    assert {r[0] for r in got} == {1, 2, 3, 4, 6, 7}


def test_simhash_array_form_matches_exploded_form_testdata(spark):
    df = load_table(spark, SF, "documents").select("doc_id", "text")
    got, want = _rows(simhash(df, "doc_id", "text")), _rows(_simhash_exploded(df))
    assert len(got) > 0 and got == want


def test_minhash_and_simhash_forms_agree_on_random_docs(spark):
    """Hypothesis fuzz: the array-form and exploded-form signature
    pipelines must agree on arbitrary token soup (unicode, repeats,
    whitespace runs produce empty tokens, sub-shingle docs)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    token = st.text(
        alphabet=st.characters(codec="utf-8", exclude_characters=" \n\r"),
        min_size=0, max_size=6,
    )
    doc = st.lists(token, min_size=0, max_size=12).map(" ".join)

    @settings(
        max_examples=_examples(10), deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(docs=st.lists(doc, min_size=1, max_size=8))
    def check(docs):
        df = spark.createDataFrame(
            list(enumerate(docs)), "doc_id long, text string"
        )
        me = _rows(minhash_signatures(shingle_rows(df, "doc_id", "text"), "doc_id", 4))
        ma = _rows(_array_signatures(shingle_arrays(df, "doc_id", "text"), "doc_id", 4))
        assert me == ma
        se = _rows(_simhash_exploded(df, bits=16))
        sa = _rows(simhash(df, "doc_id", "text", bits=16))
        assert se == sa

    check()


def test_minhash_max_bucket_subset_and_bites(spark):
    """The mega-bucket guard's contract: capped pairs are a SUBSET of
    the uncapped pairs (no false positives introduced), and at sf0.01
    the cap=2 actually drops something (buckets reach width 3), so the
    guard path is exercised, not a no-op."""
    from cascading_hbase_spark.functions.dedup import minhash_neardup_pairs

    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    kw = dict(n_hashes=8, band_size=2, threshold=0.5)
    full = {
        (r.doc_a, r.doc_b)
        for r in minhash_neardup_pairs(d, "doc_id", "text", **kw).collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in minhash_neardup_pairs(
            d, "doc_id", "text", max_bucket=2, **kw
        ).collect()
    }
    assert capped <= full
    assert len(capped) < len(full)
