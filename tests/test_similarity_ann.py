"""ANN quality contracts: IVF probing all cells must equal exact brute
force, and partial probing must keep usable recall."""

from __future__ import annotations

import pyspark.sql.functions as F

from cascading_hbase_spark.catalog import load_table
from cascading_hbase_spark.functions import similarity as S

SF = "/root/testdata/sf0.001"


def _dim(e) -> int:
    return len(e.select("embedding").first()[0])


def _topk_sets(df):
    return {(r.q_id, r.vec_id) for r in df.collect()}


def test_ivf_full_probe_is_exact(spark):
    e = load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    exact = S.cosine_topk(e, q, "vec_id", "embedding", k=10)
    ivf = S.ivf_ann_topk(e, q, "vec_id", "embedding", k=10, n_cells=8, n_probe=8)
    assert sorted(map(tuple, ivf.collect())) == sorted(map(tuple, exact.collect()))


def test_ivf_partial_probe_recall(spark):
    e = load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    exact = _topk_sets(S.cosine_topk(e, q, "vec_id", "embedding", k=10))
    approx = _topk_sets(S.ivf_ann_topk(e, q, "vec_id", "embedding", k=10, n_cells=8, n_probe=3))
    assert len(exact & approx) / len(exact) >= 0.3


def test_kmeans_centroids_improve_objective(spark):
    """Lloyd's rounds never worsen the spherical-k-means objective
    (mean max cosine to a centroid), so trained cells are at least as
    tight as the hash-sample init."""
    e = load_table(spark, SF, "embeddings")
    init = S.ivf_centroids(e, "vec_id", "embedding", n_cells=8)
    trained = S.ivf_centroids_kmeans(e, "vec_id", "embedding", n_cells=8, max_iter=4)
    assert trained.count() == 8
    obj_init = S.ivf_quantization_objective(e, init)
    obj_trained = S.ivf_quantization_objective(e, trained)
    assert obj_trained >= obj_init - 1e-9


def test_ivf_full_probe_exact_with_kmeans_centroids(spark):
    """Full probing stays exact regardless of the quantizer."""
    e = load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    cents = S.ivf_centroids_kmeans(e, "vec_id", "embedding", n_cells=8, max_iter=2)
    exact = S.cosine_topk(e, q, "vec_id", "embedding", k=10)
    ivf = S.ivf_ann_topk(
        e, q, "vec_id", "embedding", k=10, n_cells=8, n_probe=8, centroids=cents
    )
    assert sorted(map(tuple, ivf.collect())) == sorted(map(tuple, exact.collect()))


def test_lsh_ann_recall(spark):
    e = load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    exact = _topk_sets(S.cosine_topk(e, q, "vec_id", "embedding", k=10))
    approx = _topk_sets(S.lsh_ann_topk(e, q, "vec_id", "embedding", dim=64, k=10))
    assert len(exact & approx) / len(exact) >= 0.3


def test_wide_vector_numpy_dot_agrees_with_hof(spark):
    """The Arrow/numpy wide-vector scoring path must produce the same
    rounded top-k as the HOF path (the 6-decimal rounding every query
    emits absorbs pairwise-vs-sequential summation ulps)."""
    import pyspark.sql.functions as F

    from cascading_hbase_spark.functions import similarity as S

    # deterministic 512-dim synthetic embeddings, pure Catalyst
    dim = 512
    e = (
        spark.range(60)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.sin(F.col("id") * 7 + i * 13).cast("float"),
            ).alias("embedding"),
        )
    )
    q = e.filter(F.col("vec_id") < 3)
    hof = S.cosine_topk(e, q, "vec_id", "embedding", k=5)                   # HOF path
    wide = S.cosine_topk(e, q, "vec_id", "embedding", k=5, use_numpy=True)  # numpy path
    rows = lambda df: sorted(  # noqa: E731
        (r["q_id"], r["vec_id"], r["cos_sim"], r["rnk"]) for r in df.collect()
    )
    assert rows(hof) == rows(wide)


def test_semantic_dedup_keeps_one_per_cluster(spark):
    """End-to-end semantic dedup on the real embeddings: exactly one
    survivor per cluster, singletons keep themselves, and the kept set
    contains no near-dup pair at the operating threshold (self-check
    via the exact pairwise verifier)."""
    e = load_table(spark, SF, "embeddings")
    out = S.semantic_dedup(e, "vec_id", "embedding", dim=_dim(e), threshold=0.92)
    rows = out.collect()
    assert len(rows) == e.count()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        assert sum(1 for m in members if m.kept) == 1, cid
    kept_ids = {r.vec_id for r in rows if r.kept}
    kept = e.join(
        spark.createDataFrame([(i,) for i in kept_ids], "vec_id long"),
        "vec_id",
    )
    leftover = S.embedding_neardup_pairs(
        kept, "vec_id", "embedding", dim=_dim(e), threshold=0.92
    ).count()
    assert leftover == 0


def test_semantic_dedup_keep_by_score(spark):
    """The survivor is the highest-scored member when scores are given."""
    e = load_table(spark, SF, "embeddings")
    scores = e.select("vec_id", (F.col("vec_id") % 97).cast("double").alias("score"))
    out = S.semantic_dedup(
        e, "vec_id", "embedding", dim=_dim(e), threshold=0.92,
        keep_by=scores, score_col="score",
    )
    sc = {r.vec_id: float(r.vec_id % 97) for r in e.select("vec_id").collect()}
    by_cluster = {}
    for r in out.collect():
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for members in by_cluster.values():
        kept = [m for m in members if m.kept]
        assert len(kept) == 1
        best = max(members, key=lambda m: (sc[m.vec_id], -m.vec_id))
        assert kept[0].vec_id == best.vec_id


def test_semantic_dedup_keep_by_duplicate_ids(spark):
    """Duplicate ids in keep_by must not fan out the labeled relation:
    still exactly one row per input vector and one survivor per
    cluster, scored by the per-id MAX."""
    e = load_table(spark, SF, "embeddings")
    scores = e.select(
        "vec_id", (F.col("vec_id") % 97).cast("double").alias("score")
    )
    dup_scores = scores.unionByName(
        scores.withColumn("score", F.col("score") - 1000.0)
    )
    out = S.semantic_dedup(
        e, "vec_id", "embedding", dim=_dim(e), threshold=0.92,
        keep_by=dup_scores, score_col="score",
    )
    rows = out.collect()
    assert len(rows) == e.count()
    assert len({r.vec_id for r in rows}) == len(rows)
    sc = {r.vec_id: float(r.vec_id % 97) for r in e.select("vec_id").collect()}
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for members in by_cluster.values():
        kept = [m for m in members if m.kept]
        assert len(kept) == 1
        best = max(members, key=lambda m: (sc[m.vec_id], -m.vec_id))
        assert kept[0].vec_id == best.vec_id
