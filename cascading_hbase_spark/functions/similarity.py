"""Similarity search over an embedding column (SURVEY.md §2.11).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  The query side is broadcast, so the candidate scan is a single
  map-side pass (no shuffle of the 100 TB side) followed by a per-query
  top-k window on the tiny scored set.
- ``lsh_ann_topk``: random-hyperplane LSH bucketing — the scale path.
  Candidates only meet when they share a signature band, so the join is
  blocked; hyperplanes are hash-derived (deterministic, no fitted
  state).
- ``embedding_neardup_pairs``: cosine near-duplicate detection via the
  same LSH blocking.

Dot products run as Catalyst higher-order functions over array<float>
cast to double — JVM-side, no Python.  An Arrow-batched numpy variant
(``np_dot``) exists as an explicit opt-in, but measurement says the
HOF form is the right default at every width tried: on local[32],
20k vectors x 8 queries, min-of-3 — 64d HOF 0.88s / np 0.63s, 256d
HOF 0.71s / np 0.80s, 512d HOF 0.81s / np 2.90s.  In the pair-join
shape the numpy path must ship both pair-expanded vectors through
Arrow (transfer grows as pairs x dim and dominates the ~1 FLOP/byte
dot), while the HOF never leaves the JVM."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from cascading_hbase_spark.functions.hashing import hash64

__all__ = ["dot", "norm2", "cosine", "np_dot", "cosine_topk", "hard_negative_topk",
           "lsh_signature",
           "lsh_ann_topk", "ivf_centroids", "ivf_centroids_kmeans",
           "ivf_quantization_objective", "ivf_ann_topk",
           "embedding_neardup_pairs", "semantic_dedup"]


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right double dot product (bit-reproducible)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def np_dot(a: Column, b: Column) -> Column:
    """Arrow-batched numpy dot product (explicit opt-in; see module
    docstring for why the HOF ``dot`` stays the default — Arrow
    transfer of pair-expanded vectors dominates at every width tried).

    Vectorized ``einsum`` over the whole Arrow batch (no per-row Python
    loop).  numpy's pairwise summation is not bit-identical to the
    sequential HOF ``dot`` for general inputs, but agrees far beyond
    the 6-decimal rounding every query emits (pytest asserts top-k
    equality across both paths)."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def _dot(x, y):
        import numpy as np
        import pandas as pd

        A = np.asarray(x.tolist(), dtype=np.float64)
        B = np.asarray(y.tolist(), dtype=np.float64)
        return pd.Series(np.einsum("ij,ij->i", A, B))

    return _dot(a, b)


def norm2(a: Column) -> Column:
    return dot(a, a)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(norm2(a) * norm2(b))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    use_numpy: bool = False,
) -> DataFrame:
    """Exact brute-force cosine top-k: for every query row, the k nearest
    candidate rows (self excluded).  Ranking key is (rounded cosine,
    candidate id) so ties resolve identically everywhere.

    ``use_numpy=True`` scores pairs with the Arrow/numpy ``np_dot``
    instead of the JVM HOF — same rounded results, but measured SLOWER
    in this pair-join shape at 64-512 dims (module docstring numbers);
    it exists for workloads where per-pair compute, not transfer,
    dominates."""
    pair_dot = np_dot if use_numpy else dot
    # Hoist each side's norm out of the join: one pass per side instead
    # of recomputing both norms for every (query, candidate) pair
    # (cuts the higher-order-function work in the pair loop to the
    # cross dot product alone; values are bit-identical).
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        norm2(F.col(vec_col)).alias("q_n2"),
    )
    c = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("c_vec"),
        norm2(F.col(vec_col)).alias("c_n2"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(
                pair_dot(F.col("q_vec"), F.col("c_vec"))
                / F.sqrt(F.col("q_n2") * F.col("c_n2")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "vec_id", "cos_sim", F.col("rn").cast("int").alias("rnk"))
    )


def hard_negative_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query,
    the k most-similar candidates with a DIFFERENT label — the
    negatives that actually teach a metric model something (random
    negatives are trivially far; the near-but-wrong ones define the
    decision boundary).

    Same plan shape as ``cosine_topk`` (broadcast queries, candidate
    side never shuffles, per-side norms hoisted out of the pair loop);
    the label inequality rides the join condition, so same-label pairs
    are dropped before any scoring work."""
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(label_col).alias("q_label"),
        norm2(F.col(vec_col)).alias("q_n2"),
    )
    c = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("c_vec"),
        F.col(label_col).alias("c_label"),
        norm2(F.col(vec_col)).alias("c_n2"),
    )
    scored = c.join(
        F.broadcast(q),
        (F.col("vec_id") != F.col("q_id")) & (F.col("c_label") != F.col("q_label")),
    ).select(
        "q_id",
        "vec_id",
        F.col("c_label").alias("neg_label"),
        F.round(
            dot(F.col("q_vec"), F.col("c_vec")) / F.sqrt(F.col("q_n2") * F.col("c_n2")),
            6,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "q_id", "vec_id", "neg_label", "cos_sim",
            F.col("rn").cast("int").alias("rnk"),
        )
    )


def _hyperplane(j: Column, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane j: component i is a
    hash-derived value in [-1, 1]."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            (hash64(F.concat_ws("_", j.cast("string"), i.cast("string"))) % 2001).cast("double")
            - 1000.0
        )
        / 1000.0,
    )


def lsh_signature(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """Random-hyperplane signature: bit j = sign(vec . plane_j)."""
    def bit(j: Column) -> Column:
        plane = _hyperplane(j, dim)
        d = F.aggregate(
            F.zip_with(vec, plane, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(d >= 0, F.lit(1)).otherwise(F.lit(0))

    bits = F.transform(F.sequence(F.lit(0), F.lit(n_planes - 1)), bit)
    # sig = sum(bit_j * 2^j); pow(2, j) is exact in double for j < 53.
    return F.aggregate(
        F.zip_with(
            bits,
            F.sequence(F.lit(0), F.lit(n_planes - 1)),
            lambda b, j: b.cast("bigint") * F.pow(F.lit(2.0), j.cast("double")).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _banded(df: DataFrame, sig_col: str, n_bands: int, band_bits: int) -> DataFrame:
    """Explode a signature into (band, band_val) rows, keeping all other
    columns."""
    return df.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).withColumn(
        "band_val",
        F.expr(f"({sig_col} >> (band * {band_bits})) & {(1 << band_bits) - 1}"),
    )


def lsh_ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
    n_planes: int = 16,
    n_bands: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates = rows sharing >= 1 signature band
    with the query, then exact cosine + top-k on that bucket-blocked
    candidate set.  At scale the candidate join shuffles on
    (band, band_val) — never a cartesian."""
    band_bits = n_planes // n_bands
    sig = emb.select(
        F.col(id_col), F.col(vec_col), lsh_signature(F.col(vec_col), dim, n_planes).alias("sig")
    )
    qsig = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_signature(F.col(vec_col), dim, n_planes).alias("q_sig"),
    )
    cb = _banded(
        sig.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"), "sig"),
        "sig", n_bands, band_bits,
    )
    qb = (
        _banded(
            qsig.select("q_id", "q_vec", F.col("q_sig").alias("sig")),
            "sig", n_bands, band_bits,
        )
        .withColumnRenamed("band_val", "q_band_val")
        .withColumnRenamed("band", "q_band")
        .drop("sig")
    )
    cand = (
        cb.join(
            F.broadcast(qb),
            (F.col("band") == F.col("q_band"))
            & (F.col("band_val") == F.col("q_band_val"))
            & (F.col("vec_id") != F.col("q_id")),
        )
        .select("q_id", "q_vec", "vec_id", "c_vec")
        .dropDuplicates(["q_id", "vec_id"])
    )
    scored = cand.select(
        "q_id",
        "vec_id",
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "vec_id", "cos_sim", F.col("rn").cast("int").alias("rnk"))
    )


def ivf_centroids(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
) -> DataFrame:
    """Deterministic IVF 'coarse quantizer': the ``n_cells`` vectors
    with the smallest hash64(id) serve as cell centroids — a stable
    hash-random sample with no fitted state (at scale, substitute
    k-means-trained centroids; the query plan is identical).
    ``orderBy().limit()`` executes as a distributed take-ordered, not a
    full sort."""
    return (
        emb.select(
            F.col(id_col).alias("cell_id"),
            F.col(vec_col).alias("cell_vec"),
            hash64(F.col(id_col).cast("string")).alias("_h"),
        )
        .orderBy("_h", "cell_id")
        .limit(n_cells)
        .drop("_h")
    )


def _unit(df: DataFrame, vec_col: str) -> DataFrame:
    """Append ``uvec`` = L2-normalized double copy of ``vec_col``."""
    n = F.sqrt(norm2(F.col(vec_col)))
    return df.withColumn(
        "uvec", F.transform(F.col(vec_col), lambda x: x.cast("double") / n)
    )


def ivf_centroids_kmeans(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    max_iter: int = 5,
    sample_fraction: float | None = None,
    seed: int = 42,
    tol: float = 0.0,
) -> DataFrame:
    """Spherical k-means IVF coarse quantizer (Lloyd's iterations):
    hash-sampled init (``ivf_centroids``), then assign-by-dot /
    mean-and-renormalize rounds.  The per-round objective (mean max
    cosine to a centroid) is non-decreasing, so recall improves over
    the hash-sample init with the query plan unchanged.

    Scale shape: training runs on a bounded ``sample_fraction`` (the
    faiss convention — centroid quality needs a sample, not the corpus);
    each round is one broadcast-join assignment pass plus one
    map-side-combinable (cell, pos) sum — the shuffle carries
    n_cells x dim partial sums per task, never the vectors.  Rounds are
    driver-coordinated (O(max_iter) round trips), but each round's
    lineage is flattened with an executor-side ``localCheckpoint`` —
    the centroid ROWS never reach the driver; the only per-round
    driver value is the 1-scalar convergence probe (min old/new
    centroid cosine), which also allows early stop via ``tol``."""
    v = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    if sample_fraction is not None:
        v = v.sample(False, sample_fraction, seed=seed)
    nv = _unit(v, "vec").select("vec_id", "uvec").persist()
    cents = _unit(
        ivf_centroids(nv, "vec_id", "uvec", n_cells), "cell_vec"
    ).select("cell_id", F.col("uvec").alias("cell_vec"))
    for _ in range(max_iter):
        # Assignment: argmax dot against the broadcast centroids (unit
        # vectors, so dot == cosine).
        sim = dot(F.col("uvec"), F.col("cell_vec"))
        assigned = (
            nv.join(F.broadcast(cents))
            .select("vec_id", "uvec", "cell_id", sim.alias("sim"))
            .groupBy("vec_id")
            .agg(
                F.first("uvec").alias("uvec"),
                F.max_by("cell_id", F.struct(F.col("sim"), F.col("cell_id").cast("double") * -1)).alias("cell"),
            )
        )
        # Update: element-wise sum per cell (posexplode -> partial-agg
        # shuffle), then renormalize (mean-then-normalize == normalize-sum).
        sums = (
            assigned.select("cell", F.posexplode("uvec").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.sum("val").alias("s"))
        )
        newc = (
            sums.groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "s"))),
                    lambda st: st["s"],
                ).alias("sumvec")
            )
            .select(
                F.col("cell").alias("cell_id"),
                F.transform(
                    F.col("sumvec"),
                    lambda x: x / F.sqrt(norm2(F.col("sumvec"))),
                ).alias("cell_vec"),
            )
        )
        # Keep the previous centroid for any cell that emptied.
        merged = (
            cents.alias("old")
            .join(newc.alias("new"), "cell_id", "left")
            .select(
                "cell_id",
                F.coalesce(F.col("new.cell_vec"), F.col("old.cell_vec")).alias("cell_vec"),
            )
        )
        # Executor-side lineage cut: the centroid rows stay in block
        # storage; no driver materialization between rounds.
        new_cents = merged.localCheckpoint(eager=True)
        if tol > 0.0:
            # 1-scalar convergence probe: min cosine between a cell's
            # old and new (unit) centroid; 1.0 means nothing moved.
            # Skipped entirely at tol=0.0 — it would be a wasted job.
            moved = (
                cents.alias("o")
                .join(new_cents.alias("n"), "cell_id")
                .select(dot(F.col("o.cell_vec"), F.col("n.cell_vec")).alias("d"))
                .agg(F.min("d"))
                .collect()[0][0]
            )
            if moved is not None and moved >= 1.0 - tol:
                cents = new_cents
                break
        cents = new_cents
    nv.unpersist()
    return cents


def ivf_quantization_objective(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Mean max-cosine-to-a-centroid — the spherical k-means objective
    (higher is a tighter quantizer)."""
    nv = _unit(
        emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")), "vec"
    )
    nc = _unit(centroids, "cell_vec").select("cell_id", F.col("uvec").alias("cu"))
    best = (
        nv.join(F.broadcast(nc))
        .select("vec_id", dot(F.col("uvec"), F.col("cu")).alias("sim"))
        .groupBy("vec_id")
        .agg(F.max("sim").alias("best"))
    )
    return best.agg(F.avg("best")).collect()[0][0]


def ivf_ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k — the inverted-file scale path:

    1. assign every candidate vector to its nearest centroid cell (one
       broadcast pass over the big side; the only full scan);
    2. each query probes its ``n_probe`` nearest cells;
    3. exact cosine + top-k only against candidates in probed cells —
       the candidate join shuffles on ``cell``, touching ~n_probe/
       n_cells of the data per query, never a cartesian.

    ``centroids`` (cell_id, cell_vec) overrides the default
    deterministic hash-sample quantizer — pass
    ``ivf_centroids_kmeans(...)`` for trained cells (better recall,
    identical plan shape).
    """
    cells = centroids if centroids is not None else ivf_centroids(emb, id_col, vec_col, n_cells)
    c = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("c_vec"),
        norm2(F.col(vec_col)).alias("c_n2"),
    )
    # 1. cell assignment: argmax cosine against the broadcast centroids.
    sim_to_cell = dot(F.col("c_vec"), F.col("cell_vec")) / F.sqrt(
        F.col("c_n2") * norm2(F.col("cell_vec"))
    )
    assign = (
        c.join(F.broadcast(cells))
        .groupBy("vec_id")
        .agg(F.max_by("cell_id", sim_to_cell).alias("cell"))
    )
    inverted = c.join(assign, "vec_id")  # (cell -> vectors) inverted file
    # 2. query probes: n_probe nearest cells per query.
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        norm2(F.col(vec_col)).alias("q_n2"),
    )
    q_cell_sim = dot(F.col("q_vec"), F.col("cell_vec")) / F.sqrt(
        F.col("q_n2") * norm2(F.col("cell_vec"))
    )
    wq = Window.partitionBy("q_id").orderBy(F.col("cell_sim").desc(), F.col("cell"))
    probes = (
        q.join(F.broadcast(cells))
        .select("q_id", "q_vec", "q_n2", F.col("cell_id").alias("cell"),
                q_cell_sim.alias("cell_sim"))
        .withColumn("pn", F.row_number().over(wq))
        .filter(F.col("pn") <= n_probe)
        .select("q_id", "q_vec", "q_n2", "cell")
    )
    # 3. exact cosine inside probed cells only.
    cand = inverted.join(F.broadcast(probes), "cell").filter(
        F.col("vec_id") != F.col("q_id")
    )
    scored = cand.select(
        "q_id",
        "vec_id",
        F.round(
            dot(F.col("q_vec"), F.col("c_vec")) / F.sqrt(F.col("q_n2") * F.col("c_n2")),
            6,
        ).alias("cos_sim"),
    ).dropDuplicates(["q_id", "vec_id"])
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "vec_id", "cos_sim", F.col("rn").cast("int").alias("rnk"))
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.95,
    n_planes: int = 16,
    n_bands: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH blocking + exact
    cosine verify."""
    band_bits = n_planes // n_bands
    sig = emb.select(
        F.col(id_col), F.col(vec_col), lsh_signature(F.col(vec_col), dim, n_planes).alias("sig")
    )
    banded = _banded(
        sig.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"), "sig"),
        "sig", n_bands, band_bits,
    )
    a = banded.select(F.col("vid").alias("doc_a"), F.col("vec").alias("vec_a"), "band", "band_val")
    b = banded.select(
        F.col("vid").alias("doc_b"),
        F.col("vec").alias("vec_b"),
        F.col("band").alias("band_b"),
        F.col("band_val").alias("band_val_b"),
    )
    cand = (
        a.join(
            b,
            (F.col("band") == F.col("band_b"))
            & (F.col("band_val") == F.col("band_val_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b", "vec_a", "vec_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6).alias("cos_sim"),
    ).filter(F.col("cos_sim") >= threshold)


def semantic_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.95,
    keep_by: DataFrame | None = None,
    score_col: str = "score",
) -> DataFrame:
    """Semantic (embedding-space) deduplication end-to-end: LSH-blocked
    cosine near-dup pairs -> connected components -> one survivor per
    cluster.  Returns (id, cluster_id, kept) for EVERY input vector —
    singletons keep themselves with their own id as cluster.

    Survivor choice: highest ``score_col`` from ``keep_by`` (an
    (id, score) relation — e.g. a quality score), ties and the default
    (no scores) resolved by lowest id; deterministic either way.
    This is the composition a curation pipeline actually runs (the
    pieces — ``embedding_neardup_pairs``, ``connected_components``,
    keep-best — each have their own oracle-checked queries); packaged
    so the decision logic is not re-derived per pipeline.

    Scale shape: inherits the pieces' — pairs only inside LSH bands,
    CC is O(diameter) keyed joins, keep-best one window per cluster."""
    from cascading_hbase_spark.functions.dedup import connected_components

    pairs = embedding_neardup_pairs(
        emb, id_col, vec_col, dim=dim, threshold=threshold
    )
    comp = connected_components(pairs)  # only ids appearing in a pair
    ids = emb.select(F.col(id_col).alias("doc_id"))
    labeled = ids.join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
    )
    if keep_by is not None:
        # one score per id: duplicate ids in keep_by would otherwise fan
        # out the labeled relation and break the one-row-per-input
        # contract (a kept=True row plus kept=False twins)
        sc = (
            keep_by.select(
                F.col(id_col).alias("doc_id"),
                F.col(score_col).alias("_score"),
            )
            .groupBy("doc_id")
            .agg(F.max("_score").alias("_score"))
        )
        labeled = labeled.join(sc, "doc_id", "left").withColumn(
            "_score", F.coalesce("_score", F.lit(float("-inf")))
        )
    else:
        labeled = labeled.withColumn("_score", F.lit(0.0))
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("_score").desc(), F.col("doc_id").asc()
    )
    return (
        labeled.withColumn("_rn", F.row_number().over(w))
        .select(
            F.col("doc_id").alias(id_col),
            "cluster_id",
            (F.col("_rn") == 1).alias("kept"),
        )
    )
