"""Similarity search over embedding columns (array<float>).

  * ``cosine_topk`` — brute-force cosine top-k per query vector: the
    correctness baseline. Dot products via F.aggregate/zip_with stay
    JVM-side; the query side is broadcast so the big side never shuffles.
  * ``lsh_bucket_topk`` — the scale path: random-hyperplane (SimHash-style)
    bucketing; candidates only meet within a bucket (and its query-side
    multiprobe neighbors), turning O(N*Q) into O(N + candidates).

At 100 TB the brute-force form is still the right INNER loop — but only
after a bucket/IVF prefilter bounds candidates per query; both pieces are
here and compose.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm2(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                vec_col: str = "embedding") -> DataFrame:
    """For each row of ``queries`` (query_id, qvec) return the k most
    cosine-similar embeddings (ties -> lower vec_id). Query side broadcast;
    one window per query_id partition."""
    e = embeddings.select(
        "vec_id",
        F.col(vec_col).cast("array<double>").alias("vec"))
    q = queries.select(
        "query_id", F.col("qvec").cast("array<double>").alias("qvec"))
    sim = (e.crossJoin(F.broadcast(q))
           .withColumn("cos_sim",
                       _dot(F.col("vec"), F.col("qvec")) /
                       (_norm2(F.col("vec")) * _norm2(F.col("qvec")))))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(),
                                               F.col("vec_id").asc())
    return (sim.withColumn("sim_rank", F.row_number().over(w))
            .where(F.col("sim_rank") <= k)
            .select(F.col("query_id").cast("bigint").alias("query_id"),
                    F.col("sim_rank").cast("int").alias("sim_rank"),
                    F.col("vec_id").cast("bigint").alias("vec_id")))


def embedding_near_dup(embeddings: DataFrame, threshold_micro: int = 950000,
                       vec_col: str = "embedding",
                       block_col: str | None = "label") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine >=
    threshold). Similarity is quantized to integer micro-units (floored)
    so the threshold predicate is exact and oracle-checkable.

    Blocking: candidates meet only within ``block_col`` buckets (a label,
    an LSH bucket, an IVF centroid id) — the O(N^2) cross stays bounded by
    the largest bucket, and buckets shuffle-join on their key. Pass
    block_col=None for the brute-force baseline."""
    e = embeddings.select(
        "vec_id",
        *([block_col] if block_col else []),
        F.col(vec_col).cast("array<double>").alias("vec"))
    a = e.alias("a")
    b = e.alias("b")
    on = [F.col("a.vec_id") < F.col("b.vec_id")]
    if block_col:
        on.insert(0, F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    joined = a.join(b, on[0] if len(on) == 1 else (on[0] & on[1]))
    sim = (_dot(F.col("a.vec"), F.col("b.vec")) /
           (_norm2(F.col("a.vec")) * _norm2(F.col("b.vec"))))
    return (joined
            .withColumn("sim_micro",
                        F.floor(sim * F.lit(1000000)).cast("bigint"))
            .where(F.col("sim_micro") >= threshold_micro)
            .select(F.col("a.vec_id").cast("bigint").alias("vec_a"),
                    F.col("b.vec_id").cast("bigint").alias("vec_b"),
                    "sim_micro"))


def simhash_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-of-projection bucket id for a fixed set of hyperplanes
    (deterministic, plan-time constants)."""
    bits = [
        F.when(_dot(vec, F.array(*[F.lit(float(x)) for x in p])) >= 0, 1 << i)
         .otherwise(0)
        for i, p in enumerate(planes)
    ]
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out.cast("int")


def ivf_assign(vectors: DataFrame, centroids: DataFrame,
               vec_col: str = "vec", id_col: str = "vec_id",
               nprobe: int = 1) -> DataFrame:
    """IVF coarse quantization: each vector gets its ``nprobe`` most
    cosine-similar centroid ids (ties -> lower cent_id). The centroid
    table is broadcast (K is small by construction); the assignment is
    the standard O(N*K) scan that every IVF index pays once at build.

    nprobe=1 (the BUILD side — billions of vectors) is an aggregation,
    not a window: max_by over (sim, -cent_id) partial-combines the K
    candidate rows map-side (they are colocated — the broadcast join
    emitted them from one input row), so the shuffle carries ONE row per
    vector instead of all N*K. The window form is kept for nprobe>1,
    which only the small query side uses."""
    sim = (vectors.join(F.broadcast(centroids))
           .withColumn("cent_sim",
                       _dot(F.col(vec_col), F.col("cvec")) /
                       (_norm2(F.col(vec_col)) * _norm2(F.col("cvec")))))
    if nprobe == 1:
        others = [c for c in vectors.columns if c != id_col]
        ord_key = F.struct(F.col("cent_sim"),
                           (-F.col("cent_id")).alias("_inv"))
        agg = sim.groupBy(id_col).agg(
            F.max_by(F.struct(F.col("cent_id"),
                              *[F.col(c) for c in others]), ord_key)
            .alias("_best"))
        return agg.select(
            id_col, F.col("_best.cent_id").alias("cent_id"),
            *[F.col(f"_best.{c}").alias(c) for c in others])
    w = Window.partitionBy(id_col).orderBy(F.col("cent_sim").desc(),
                                           F.col("cent_id").asc())
    return (sim.withColumn("cent_rank", F.row_number().over(w))
            .where(F.col("cent_rank") <= nprobe)
            .drop("cvec", "cent_sim", "cent_rank"))


def ivf_topk(embeddings: DataFrame, queries: DataFrame,
             centroids: DataFrame, k: int = 5, nprobe: int = 2,
             vec_col: str = "embedding") -> DataFrame:
    """IVF-bucketed ANN (the inverted-file scale path next to the
    SimHash one): vectors live in their single nearest centroid's list;
    each query probes its ``nprobe`` nearest centroids; candidates meet
    by an equi-join on cent_id and the exact top-k ranks within.

    At 100 TB: the big side shuffles once on cent_id (or is written
    bucketed by it), queries are broadcast, and recall is tuned by
    nprobe without touching the stored lists."""
    c = centroids.select("cent_id",
                         F.col("cvec").cast("array<double>").alias("cvec"))
    e = ivf_assign(
        embeddings.select("vec_id",
                          F.col(vec_col).cast("array<double>")
                          .alias("vec")),
        c, nprobe=1)
    q = ivf_assign(
        queries.select("query_id",
                       F.col("qvec").cast("array<double>").alias("qvec")),
        c, vec_col="qvec", id_col="query_id", nprobe=nprobe)
    cand = (e.join(F.broadcast(q), "cent_id")
            .withColumn("cos_sim",
                        _dot(F.col("vec"), F.col("qvec")) /
                        (_norm2(F.col("vec")) * _norm2(F.col("qvec")))))
    # vectors hold ONE centroid (nprobe=1 on the build side), so
    # (query, vec) candidate pairs are unique — no dedup needed
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(),
                                               F.col("vec_id").asc())
    return (cand.withColumn("sim_rank", F.row_number().over(w))
            .where(F.col("sim_rank") <= k)
            .select(F.col("query_id").cast("bigint").alias("query_id"),
                    F.col("sim_rank").cast("int").alias("sim_rank"),
                    F.col("vec_id").cast("bigint").alias("vec_id")))


def lsh_bucket_topk(embeddings: DataFrame, queries: DataFrame,
                    planes: list[list[float]], k: int = 5,
                    vec_col: str = "embedding") -> DataFrame:
    """ANN: bucket both sides by hyperplane signs, join on bucket, rank
    within. Recall < 1 by construction (single-probe); callers add probes
    by unioning neighbor buckets on the (small) query side."""
    e = embeddings.select(
        "vec_id", F.col(vec_col).cast("array<double>").alias("vec")
    ).withColumn("bucket", simhash_bucket(F.col("vec"), planes))
    q = queries.select(
        "query_id", F.col("qvec").cast("array<double>").alias("qvec")
    ).withColumn("bucket", simhash_bucket(F.col("qvec"), planes))
    sim = (e.join(F.broadcast(q), "bucket")
           .withColumn("cos_sim",
                       _dot(F.col("vec"), F.col("qvec")) /
                       (_norm2(F.col("vec")) * _norm2(F.col("qvec")))))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(),
                                               F.col("vec_id").asc())
    return (sim.withColumn("sim_rank", F.row_number().over(w))
            .where(F.col("sim_rank") <= k)
            .select(F.col("query_id").cast("bigint").alias("query_id"),
                    F.col("sim_rank").cast("int").alias("sim_rank"),
                    F.col("vec_id").cast("bigint").alias("vec_id")))
