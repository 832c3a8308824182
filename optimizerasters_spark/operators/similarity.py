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

import numpy as np
import pandas as pd
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


def _collect_centroids(cents: DataFrame, id_col: str, vec_col: str,
                       dtype):
    """Collect a small (id, vector) table to the driver sorted by id
    ascending. The SAME bytes F.broadcast() would haul through the
    driver — but as a NumPy matrix a vectorized kernel can consume
    (guide §4.2). Ascending ids make first-occurrence argmin/argmax
    the exact 'ties -> lower id' rule."""
    rows = cents.select(id_col, vec_col).collect()
    rows.sort(key=lambda r: r[0])
    ids = np.asarray([r[0] for r in rows], dtype=np.int64)
    mat = np.asarray([list(r[1]) for r in rows], dtype=dtype)
    return ids, mat


def _np_dist2(X, C, c_norm2):
    """Squared-L2 distance matrix |x-c|^2 = |x|^2 + |c|^2 - 2<x,c> via
    one BLAS matmul. EXACT for the micro-int domain: every component is
    an integer with |v| <= ~4.2e6, so each partial sum over <= 64 dims
    is an integer < 2^53 and float64 arithmetic never rounds."""
    G = X @ C.T
    return (X * X).sum(axis=1)[:, None] + c_norm2[None, :] - 2.0 * G


def ivf_assign(vectors: DataFrame, centroids: DataFrame,
               vec_col: str = "vec", id_col: str = "vec_id",
               nprobe: int = 1) -> DataFrame:
    """IVF coarse quantization: each vector gets its ``nprobe`` most
    cosine-similar centroid ids (ties -> lower cent_id). The centroid
    table is small by construction; the assignment is the standard
    O(N*K) scan that every IVF index pays once at build.

    nprobe=1 (the BUILD side — billions of vectors) runs the argmax as
    ONE NumPy matrix product per Arrow batch inside a pandas UDF
    (guide §4.2): K centroids are collected once (the same driver hop
    a broadcast pays) and the N*K candidate rows never materialize —
    the stage stays a shuffle-free projection instead of a broadcast
    nested-loop join + re-aggregation, and the per-pair cost is a BLAS
    row, not an interpreted zip_with/aggregate lambda chain. The
    window form is kept for nprobe>1, which only the small query side
    uses."""
    if nprobe == 1:
        ids, C = _collect_centroids(centroids, "cent_id", "cvec",
                                    np.float64)
        others = [c for c in vectors.columns if c != id_col]
        if len(ids) == 0:
            # no centroids: the old inner-join shape yields no rows
            return (vectors.join(F.broadcast(centroids))
                    .select(id_col, "cent_id", *others).limit(0))
        c_norm = np.sqrt((C * C).sum(axis=1))
        cent_dtype = dict(centroids.dtypes)["cent_id"]

        @F.pandas_udf("bigint")
        def _best_list(v: pd.Series) -> pd.Series:
            X = np.asarray(v.tolist(), dtype=np.float64)
            x_norm = np.sqrt((X * X).sum(axis=1))
            sims = (X @ C.T) / (x_norm[:, None] * c_norm[None, :])
            # argmax takes the FIRST max -> lowest cent_id on ties,
            # exactly max_by(struct(sim, -cent_id))
            return pd.Series(ids[np.argmax(sims, axis=1)])

        return vectors.select(
            id_col,
            _best_list(F.col(vec_col)).cast(cent_dtype).alias("cent_id"),
            *others)
    sim = (vectors.join(F.broadcast(centroids))
           .withColumn("cent_sim",
                       _dot(F.col(vec_col), F.col("cvec")) /
                       (_norm2(F.col(vec_col)) * _norm2(F.col("cvec")))))
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


# ---------------------------------------------------------------------------
# IVF index BUILD: distributed k-means over quantized integer vectors.
#
# The missing half of the IVF story (round-2 consumed given centroids).
# Everything is INTEGER-exact so training is deterministic and
# cross-engine oracle-checkable:
#   * components quantize to micro-units with a +offset shift into the
#     non-negative domain (squared-L2 distances are translation-
#     invariant, and non-negative integer division truncates identically
#     everywhere, so the centroid means match any engine bit-for-bit);
#   * init is a hash-ordered sample (the K vectors with the smallest
#     md5(vec_id)) — uniform-but-reproducible, TakeOrderedAndProject on
#     the big side;
#   * each Lloyd iteration is (a) assignment: broadcast centroids +
#     min_by aggregation (ONE row per vector through the shuffle — same
#     plan shape as ivf_assign), and (b) update: posexplode to
#     (cent_id, dim) and re-aggregate — map-side partial combine
#     collapses each task to K*dim rows, so the update shuffle is
#     O(#tasks * K * dim), independent of N. Centroids (K*dim ints)
#     hop through the driver between iterations exactly like MLlib's
#     Lloyd loop — the one legitimate collect.
# ---------------------------------------------------------------------------

QUANT_OFFSET = 1_000_000  # valid for unit-scale embeddings (|x| < 1)


def quantize_micro(vec: Column, offset: int = QUANT_OFFSET) -> Column:
    """array<float> -> array<bigint> micro-units, shifted non-negative."""
    return F.transform(
        vec.cast("array<double>"),
        lambda x: F.floor(x * 1000000).cast("bigint") + F.lit(offset))


def _dist2_int(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0).cast("bigint"), lambda acc, v: acc + v)


def kmeans_seeds(vectors: DataFrame, k: int, id_col: str = "vec_id",
                 vec_col: str = "v") -> DataFrame:
    """Deterministic sampled init: the k vectors with the smallest
    md5(id). orderBy+limit compiles to per-partition heaps + driver
    merge (TakeOrderedAndProject) — no global sort."""
    key = F.md5(F.col(id_col).cast("string"))
    seeds = vectors.orderBy(key, F.col(id_col)).limit(k)
    w = Window.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
    return seeds.select(
        (F.row_number().over(w) - 1).cast("int").alias("cent_id"),
        F.col(vec_col).alias("cvec"))


def kmeans_assign(vectors: DataFrame, cents: DataFrame,
                  id_col: str = "vec_id", vec_col: str = "v") -> DataFrame:
    """Nearest centroid by integer squared L2 (ties -> lower cent_id).

    The argmin runs as ONE NumPy matrix product per Arrow batch inside
    a pandas UDF (guide §4.2): the K centroids are collected once (the
    same driver hop F.broadcast pays), |x-c|^2 expands to
    |x|^2+|c|^2-2<x,c> — exact in float64 for the micro-int domain (see
    _np_dist2) — and the N*K candidate rows never materialize. The
    stage is a shuffle-free projection; the old broadcast-join + min_by
    shape shuffled one row per vector and paid an interpreted
    zip_with/aggregate lambda chain per candidate pair."""
    ids, C = _collect_centroids(cents, "cent_id", "cvec", np.float64)
    if len(ids) == 0:
        return (vectors.join(F.broadcast(cents))
                .select(id_col, "cent_id",
                        F.lit(0).cast("bigint").alias("dist2"),
                        vec_col).limit(0))
    c_norm2 = (C * C).sum(axis=1)
    cent_dtype = dict(cents.dtypes)["cent_id"]

    @F.pandas_udf("struct<cent_id:bigint,dist2:bigint>")
    def _nearest(v: pd.Series) -> pd.DataFrame:
        X = np.asarray(v.tolist(), dtype=np.float64)
        D = _np_dist2(X, C, c_norm2)
        # argmin takes the FIRST min -> lowest cent_id on ties,
        # exactly min_by(struct(dist2, cent_id))
        idx = np.argmin(D, axis=1)
        return pd.DataFrame(
            {"cent_id": ids[idx],
             "dist2": D[np.arange(len(idx)), idx].astype(np.int64)})

    best = vectors.withColumn("_b", _nearest(F.col(vec_col)))
    return best.select(
        id_col,
        F.col("_b.cent_id").cast(cent_dtype).alias("cent_id"),
        F.col("_b.dist2").alias("dist2"),
        F.col(vec_col))


def kmeans_update(assigned: DataFrame, cents: DataFrame,
                  vec_col: str = "v") -> DataFrame:
    """Component-wise integer mean per cluster: posexplode to
    (cent_id, dim, comp), partial-aggregated sum/count (K*dim rows per
    task through the shuffle), re-assembled with array_sort + transform.
    Empty clusters keep their previous centroid."""
    ex = assigned.select(
        "cent_id", F.posexplode(F.col(vec_col)).alias("d", "comp"))
    sums = ex.groupBy("cent_id", "d").agg(
        F.sum("comp").alias("s"), F.count(F.lit(1)).alias("n"))
    upd = (sums.groupBy("cent_id")
           .agg(F.array_sort(
                F.collect_list(F.struct("d", "s", "n"))).alias("_c"))
           .select("cent_id",
                   # non-negative domain: div (truncation) == floor
                   F.expr("transform(_c, t -> t.s div t.n)").alias("_new"),
                   F.expr("_c[0].n").alias("_n")))
    return (cents.join(upd, "cent_id", "left")
            .select("cent_id",
                    F.coalesce(F.col("_new"), F.col("cvec")).alias("cvec"),
                    F.coalesce(F.col("_n"), F.lit(0)).cast("bigint")
                     .alias("cluster_n")))


def kmeans_train(vectors: DataFrame, k: int = 8, iters: int = 2,
                 id_col: str = "vec_id", vec_col: str = "v") -> DataFrame:
    """k-means over quantized vectors -> (cent_id, cvec, cluster_n),
    where cluster_n is the membership count observed at the FINAL
    update step (assignment under the previous iteration's centroids).
    Centroids round-trip through the driver between iterations (K*dim
    integers), keeping every iteration's job independent and the final
    plan shallow."""
    spark = vectors.sparkSession
    cents = kmeans_seeds(vectors, k, id_col, vec_col)
    rows = []
    for _ in range(iters):
        assigned = kmeans_assign(vectors, cents, id_col, vec_col)
        rows = sorted(kmeans_update(assigned, cents, vec_col).collect(),
                      key=lambda r: r["cent_id"])
        cents = spark.createDataFrame(
            [(r["cent_id"], r["cvec"]) for r in rows],
            "cent_id INT, cvec ARRAY<BIGINT>")
    return spark.createDataFrame(
        [(r["cent_id"], r["cvec"], int(r["cluster_n"])) for r in rows],
        "cent_id INT, cvec ARRAY<BIGINT>, cluster_n BIGINT")


def sq_train(vectors: DataFrame, vec_col: str = "v"
             ) -> tuple[list[int], list[int]]:
    """Scalar-quantization bounds: per-dimension (lo, span) over the
    corpus — ONE posexplode + partial-aggregated min/max pass (K*dim
    rows per task through the shuffle), bounds hop the driver like
    k-means centroids (dim integers). Returns (lo[], span[]) with
    span >= 1."""
    ex = vectors.select(F.posexplode(F.col(vec_col)).alias("d", "comp"))
    rows = sorted(ex.groupBy("d")
                  .agg(F.min("comp").alias("lo"), F.max("comp").alias("hi"))
                  .collect(), key=lambda r: r["d"])
    lo = [int(r["lo"]) for r in rows]
    span = [max(int(r["hi"]) - int(r["lo"]), 1) for r in rows]
    return lo, span


def sq_encode_col(lo: list[int], span: list[int],
                  vec_col: str = "v") -> Column:
    """8-bit scalar quantization: code_d = (v_d - lo_d) * 255 div
    span_d, an int in [0, 255] — 4x smaller than float32 embeddings and
    8x smaller than the micro-int form, the standard memory lever for
    billion-vector ANN. Integer division on a non-negative numerator ->
    exact on any engine. Plan-time constant bound arrays; whole-stage
    codegen."""
    los = ", ".join(str(x) for x in lo)
    spans = ", ".join(str(x) for x in span)
    return F.expr(
        f"transform(sequence(0, {len(lo) - 1}), i -> CAST("
        f"(element_at({vec_col}, i + 1) - element_at(array({los}), i + 1))"
        f" * 255 div element_at(array({spans}), i + 1) AS INT))")


def sq_decode_col(lo: list[int], span: list[int],
                  code_col: str = "codes") -> Column:
    """Reconstruct micro-int vectors from SQ codes (midpoint-free floor
    form, the exact inverse scale of sq_encode_col)."""
    los = ", ".join(str(x) for x in lo)
    spans = ", ".join(str(x) for x in span)
    return F.expr(
        f"transform(sequence(0, {len(lo) - 1}), i -> "
        f"element_at(array({los}), i + 1) + "
        f"element_at({code_col}, i + 1) * "
        f"element_at(array({spans}), i + 1) div 255)")


def dequantize_micro(cvec: Column, offset: int = QUANT_OFFSET) -> Column:
    """Trained integer centroids -> double arrays for the cosine-space
    IVF probe path (ivf_topk)."""
    return F.transform(
        cvec, lambda x: (x - F.lit(offset)).cast("double") / 1000000.0)


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


# --------------------------------------------------------------------------
# Product quantization (PQ): the codebook-compression layer between SQ
# and IVF in the billion-vector stack — vectors become M small codes and
# search runs decode-free against per-query lookup tables (ADC).
# --------------------------------------------------------------------------

def pq_codebooks_stride(vectors: DataFrame, m: int, dim: int,
                        stride: int = 97, id_col: str = "vec_id",
                        vec_col: str = "v") -> DataFrame:
    """Deterministic stride-sampled PQ codebooks -> (m, cent_id, cvec):
    subspace ``mm``'s codebook is the mm-th slice of every stride-th
    vector. The fixture/bootstrap form (exactly q_ivf_topk's fixed-
    centroid trick, so the encode/ADC stages are SQL-oracle-checkable);
    pq_train swaps in Lloyd-refined codebooks behind the same shape."""
    dsub = dim // m
    base = vectors.where(F.col(id_col) % stride == 0).select(
        (F.col(id_col) / stride).cast("int").alias("cent_id"),
        F.col(vec_col))
    out = None
    for mm in range(m):
        sub = base.select(
            F.lit(mm).cast("int").alias("m"), "cent_id",
            F.slice(F.col(vec_col), mm * dsub + 1, dsub).alias("cvec"))
        out = sub if out is None else out.unionByName(sub)
    return out


def pq_train(vectors: DataFrame, m: int, dim: int, k: int = 8,
             iters: int = 2, id_col: str = "vec_id",
             vec_col: str = "v") -> DataFrame:
    """Lloyd-refined PQ codebooks: M INDEPENDENT integer k-means runs
    (kmeans_train — hash-seeded, broadcast assign, posexplode update)
    over the subvector slices. Each subspace trains on the full corpus
    but only dim/M components; the driver round-trip per iteration stays
    K*dim/M integers. Returns (m, cent_id, cvec)."""
    dsub = dim // m
    out = None
    for mm in range(m):
        sub = vectors.select(
            F.col(id_col),
            F.slice(F.col(vec_col), mm * dsub + 1, dsub).alias(vec_col))
        cb = (kmeans_train(sub, k=k, iters=iters, id_col=id_col,
                           vec_col=vec_col)
              .select(F.lit(mm).cast("int").alias("m"), "cent_id",
                      "cvec"))
        out = cb if out is None else out.unionByName(cb)
    return out


def pq_encode(vectors: DataFrame, codebooks: DataFrame, m: int, dim: int,
              id_col: str = "vec_id", vec_col: str = "v") -> DataFrame:
    """vector -> array<int> of M codes: nearest codebook entry per
    subspace (integer squared L2, ties -> lower cent_id). The M*K
    codebook rows are collected once (the driver hop a broadcast pays)
    and each Arrow batch computes all M argmins as NumPy matrix
    products (guide §4.2) — a shuffle-free projection; the N*M*K
    candidate rows and the two re-aggregations of the old broadcast-
    join shape never happen. Distances are exact in float64 for the
    micro-int domain (see _np_dist2). 64 micro-int dims at M=8 become
    8 ints: the 8x memory lever on top of SQ's 4x."""
    dsub = dim // m
    cb_rows = codebooks.select("m", "cent_id", "cvec").collect()
    if not cb_rows:
        return (vectors.join(F.broadcast(codebooks))
                .select(id_col,
                        F.expr("cast(array() as array<int>)")
                        .alias("codes"))
                .limit(0))
    books = []
    for mm in range(m):
        sub = sorted([(r["cent_id"], list(r["cvec"])) for r in cb_rows
                      if r["m"] == mm])
        ids_m = np.asarray([c for c, _ in sub], dtype=np.int64)
        C_m = np.asarray([v for _, v in sub], dtype=np.float64)
        books.append((ids_m, C_m, (C_m * C_m).sum(axis=1)))

    @F.pandas_udf("array<int>")
    def _codes(v: pd.Series) -> pd.Series:
        X = np.asarray(v.tolist(), dtype=np.float64)
        out = np.empty((len(X), m), dtype=np.int32)
        for mm, (ids_m, C_m, n_m) in enumerate(books):
            D = _np_dist2(X[:, mm * dsub:(mm + 1) * dsub], C_m, n_m)
            # first-min argmin == min_by(struct(dist2, cent_id))
            out[:, mm] = ids_m[np.argmin(D, axis=1)]
        return pd.Series(list(out))

    return vectors.select(id_col, _codes(F.col(vec_col)).alias("codes"))


def pq_adc_topk(queries: DataFrame, codes: DataFrame,
                codebooks: DataFrame, m: int, dim: int, k: int = 5,
                q_id: str = "query_id", q_vec: str = "qvec",
                id_col: str = "vec_id") -> DataFrame:
    """Asymmetric distance computation: build the per-query lookup
    table (Q*M*K partial distances — tiny, broadcast), equi-join the
    code table on (subspace, code), sum the M partial distances per
    (query, vector), take top-k. The compressed corpus is never
    decoded; only the LUT touches full precision — the IVF probe's
    inner loop at billion scale (ADC runs per posting list there; here
    it scans the whole code table, which IS the nprobe=all case)."""
    dsub = dim // m
    lut = (queries.join(F.broadcast(codebooks))
           .select(q_id, F.col("m").alias("lm"), "cent_id",
                   _dist2_int(
                       F.slice(F.col(q_vec), F.col("m") * dsub + 1, dsub),
                       F.col("cvec")).alias("pdist")))
    ex = codes.select(id_col, F.posexplode("codes").alias("m", "code"))
    j = ex.join(F.broadcast(lut),
                (F.col("m") == F.col("lm")) &
                (F.col("code") == F.col("cent_id")))
    agg = j.groupBy(q_id, id_col).agg(
        F.sum("pdist").cast("bigint").alias("adc2"))
    w = Window.partitionBy(q_id).orderBy(F.col("adc2").asc(),
                                         F.col(id_col).asc())
    return (agg.withColumn("pq_rank", F.row_number().over(w))
            .where(F.col("pq_rank") <= k))


def residual_vectors(vectors: DataFrame, coarse: DataFrame,
                     id_col: str = "vec_id",
                     vec_col: str = "v") -> DataFrame:
    """(id, list_id, rvec = v − coarse_centroid[list_id]) — the input
    to RESIDUAL product quantization (what FAISS IVFPQ encodes):
    after coarse assignment, only the residual to the list centroid is
    quantized, so the codebooks spend their entries on the small
    within-list displacement instead of the whole embedding space.
    One kmeans_assign (broadcast centroids, min_by) + one broadcast
    rejoin for the centroid vector; a single corpus-proportional
    shuffle keyed on vec_id."""
    assigned = kmeans_assign(vectors, coarse, id_col, vec_col)
    withc = assigned.join(
        F.broadcast(coarse.select("cent_id",
                                  F.col("cvec").alias("_lv"))),
        "cent_id")
    return withc.select(
        id_col, F.col("cent_id").alias("list_id"),
        F.zip_with(F.col(vec_col), F.col("_lv"),
                   lambda a, b: a - b).alias("rvec"))


def pq_quantization_error(vectors: DataFrame, codebooks: DataFrame,
                          m: int, dim: int, id_col: str = "vec_id",
                          vec_col: str = "v") -> DataFrame:
    """Total squared PQ quantization error: sum over (vector,
    subspace) of the winning codebook entry's squared distance — the
    FAISS-style diagnostic that justifies residual encoding (for
    residual PQ the coarse centroid cancels, so the residual table's
    error IS the reconstruction error of centroid + codeword).
    Returns a single (err2) row."""
    dsub = dim // m
    cand = (vectors.join(F.broadcast(codebooks))
            .withColumn("dist2", _dist2_int(
                F.slice(F.col(vec_col), F.col("m") * dsub + 1, dsub),
                F.col("cvec"))))
    best = cand.groupBy(id_col, "m").agg(F.min("dist2").alias("d2"))
    return best.agg(F.sum("d2").cast("bigint").alias("err2"))


def ivf_pq_residual_topk(queries: DataFrame, residuals: DataFrame,
                         coarse: DataFrame, codebooks: DataFrame,
                         m: int, dim: int, nprobe: int = 2, k: int = 5,
                         q_id: str = "query_id", q_vec: str = "qvec",
                         id_col: str = "vec_id",
                         res_col: str = "rvec") -> DataFrame:
    """IVF + RESIDUAL PQ — FAISS-IVFPQ semantics: vectors are stored
    as PQ codes of their residual to the list centroid, and a query's
    LUT is built from ITS residual to each probed list's centroid
    (one LUT per (query, probed list), still Q·nprobe·M·K rows —
    tiny, broadcast). ADC then estimates ‖q − v‖² within a list as
    ‖(q − c) − (v − c)‖², so the coarse term cancels exactly and the
    codebooks only carry within-list displacement — finer codes at
    identical plan shape to :func:`ivf_pq_topk`: candidates are
    bounded to probed lists by the broadcast LUT join, and the only
    corpus-proportional shuffles key on vec_id and the candidate
    (query, vector) pairs."""
    dsub = dim // m
    codes = pq_encode(residuals, codebooks, m, dim, id_col, res_col)
    qc = (queries.join(F.broadcast(
            coarse.select(F.col("cent_id").alias("list_id"),
                          F.col("cvec").alias("list_vec"))))
          .withColumn("qd2", _dist2_int(F.col(q_vec),
                                        F.col("list_vec"))))
    wq = Window.partitionBy(q_id).orderBy(F.col("qd2").asc(),
                                          F.col("list_id").asc())
    probed = (qc.withColumn("pr", F.row_number().over(wq))
              .where(F.col("pr") <= nprobe)
              .select(q_id, "list_id",
                      F.zip_with(F.col(q_vec), F.col("list_vec"),
                                 lambda a, b: a - b).alias("qr")))
    lut = (probed.join(F.broadcast(codebooks))
           .select(F.col(q_id).alias("lq"),
                   F.col("list_id").alias("ll"),
                   F.col("m").alias("lm"), "cent_id",
                   _dist2_int(
                       F.slice(F.col("qr"), F.col("m") * dsub + 1,
                               dsub),
                       F.col("cvec")).alias("pdist")))
    ex = (codes.join(residuals.select(id_col, "list_id"), id_col)
          .select(id_col, "list_id",
                  F.posexplode("codes").alias("m", "code")))
    # the LUT carries only probed (query, list) pairs, so this join IS
    # the candidate restriction — unprobed lists never match
    j = ex.join(F.broadcast(lut),
                (F.col("list_id") == F.col("ll")) &
                (F.col("m") == F.col("lm")) &
                (F.col("code") == F.col("cent_id")))
    agg = j.groupBy(F.col("lq").alias(q_id), id_col).agg(
        F.sum("pdist").cast("bigint").alias("adc2"))
    w = Window.partitionBy(q_id).orderBy(F.col("adc2").asc(),
                                         F.col(id_col).asc())
    return (agg.withColumn("pq_rank", F.row_number().over(w))
            .where(F.col("pq_rank") <= k))


def ivf_pq_topk(queries: DataFrame, vectors: DataFrame,
                coarse: DataFrame, codebooks: DataFrame, m: int,
                dim: int, nprobe: int = 2, k: int = 5,
                q_id: str = "query_id", q_vec: str = "qvec",
                id_col: str = "vec_id", vec_col: str = "v") -> DataFrame:
    """IVF + PQ composed — the billion-scale search shape: every vector
    lives in the posting list of its nearest coarse centroid and is
    stored as M PQ codes; a query probes its ``nprobe`` nearest lists
    and ranks ONLY those lists' members by decode-free ADC distance.

    Plan: one kmeans_assign for list membership (broadcast coarse,
    min_by), one pq_encode (broadcast codebooks, min_by per subspace),
    the probed (query, list) pairs and the per-query LUT both broadcast
    — the only page-proportional shuffles key on vec_id and
    (query, vec) within probed lists, i.e. the candidate set, never
    the corpus times queries. :func:`ivf_pq_residual_topk` is the
    residual-encoded variant (FAISS-IVFPQ semantics) behind the same
    shape — finer codes."""
    assigned = kmeans_assign(vectors, coarse, id_col, vec_col) \
        .select(id_col, F.col("cent_id").alias("list_id"))
    codes = pq_encode(vectors, codebooks, m, dim, id_col, vec_col)
    qc = (queries.join(F.broadcast(
            coarse.select(F.col("cent_id").alias("list_id"),
                          F.col("cvec").alias("list_vec"))))
          .withColumn("qd2", _dist2_int(F.col(q_vec),
                                        F.col("list_vec"))))
    wq = Window.partitionBy(q_id).orderBy(F.col("qd2").asc(),
                                          F.col("list_id").asc())
    probed = (qc.withColumn("pr", F.row_number().over(wq))
              .where(F.col("pr") <= nprobe).select(q_id, "list_id"))
    dsub = dim // m
    lut = (queries.join(F.broadcast(codebooks))
           .select(F.col(q_id).alias("lq"), F.col("m").alias("lm"),
                   "cent_id",
                   _dist2_int(
                       F.slice(F.col(q_vec), F.col("m") * dsub + 1,
                               dsub),
                       F.col("cvec")).alias("pdist")))
    ex = (codes.join(assigned, id_col)
          .select(id_col, "list_id",
                  F.posexplode("codes").alias("m", "code")))
    cand = ex.join(F.broadcast(probed), "list_id")
    j = cand.join(F.broadcast(lut),
                  (F.col(q_id) == F.col("lq")) &
                  (F.col("m") == F.col("lm")) &
                  (F.col("code") == F.col("cent_id")))
    agg = j.groupBy(q_id, id_col).agg(
        F.sum("pdist").cast("bigint").alias("adc2"))
    w = Window.partitionBy(q_id).orderBy(F.col("adc2").asc(),
                                         F.col(id_col).asc())
    return (agg.withColumn("pq_rank", F.row_number().over(w))
            .where(F.col("pq_rank") <= k))
