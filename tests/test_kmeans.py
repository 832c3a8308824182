"""IVF index BUILD: distributed k-means training — plan shape, planted-
cluster recovery, and end-to-end ANN recall with TRAINED centroids
(VERDICT r02 item 4: 'an index you can't build is half an index')."""

from __future__ import annotations

from pyspark.sql import functions as F

from optimizerasters_spark.operators import similarity


def _planted(spark, n_clusters=4, per_cluster=200, dim=16, spread=1000):
    """Deterministic planted clusters in micro-unit space: centers far
    apart (~0.5), points within +-spread micro-units (0.001)."""
    ids = spark.range(n_clusters * per_cluster)
    c = F.col("id") % n_clusters
    comps = [
        (((c + 1) * (d + 3) * 104729) % 1000000 - 500000)
        + ((F.col("id") * 7919 + d * 13) % (2 * spread + 1) - spread)
        for d in range(dim)
    ]
    return ids.select(
        F.col("id").alias("vec_id"), c.alias("true_cluster"),
        F.array(*[(x + 1000000).cast("bigint") for x in comps]).alias("v"))


def test_kmeans_assignment_is_projection_not_window(spark):
    """r06: the argmin is ONE vectorized Arrow batch kernel over the
    collected centroid matrix — a shuffle-free projection. The N*K
    candidate rows of the old broadcast-join + min_by shape (and any
    Window over them) must not appear in the plan."""
    v = _planted(spark).select("vec_id", "v")
    seeds = similarity.kmeans_seeds(v, 4)
    out = similarity.kmeans_assign(v, seeds)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert "ArrowEvalPython" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Window" not in plan, plan
    # no shuffle at all: the assignment itself is exchange-free
    assert "Exchange" not in plan, plan


def test_kmeans_recovers_planted_clusters(spark):
    """With k oversampled 2x vs the 4 planted clusters, training must
    give every true cluster at least one dedicated centroid and a pure
    assignment (every centroid's members share one true cluster).
    Deterministic init -> not flaky."""
    data = _planted(spark)
    cents = similarity.kmeans_train(data.select("vec_id", "v"),
                                    k=8, iters=3)
    assigned = similarity.kmeans_assign(
        data.select("vec_id", "v"), cents.select("cent_id", "cvec"))
    joined = assigned.join(data.select("vec_id", "true_cluster"), "vec_id")
    purity = (joined.groupBy("cent_id")
              .agg(F.count_distinct("true_cluster").alias("nc"),
                   F.first("true_cluster").alias("tc"),
                   F.count(F.lit(1)).alias("n"))
              .collect())
    used = [r for r in purity if r["n"] > 0]
    assert all(r["nc"] == 1 for r in used), purity
    assert {r["tc"] for r in used} == {0, 1, 2, 3}
    # trainer-reported sizes (membership at the final update step)
    # account for every vector
    trained = {r["cent_id"]: r["cluster_n"] for r in cents.collect()}
    assert sum(trained.values()) == data.count()


def test_ivf_recall_with_trained_centroids(spark, sf_dir):
    """End-to-end ANN with TRAINED centroids: recall@5 vs brute-force
    cosine is tunable by nprobe (the IVF contract), decent at nprobe=3,
    and EXACT at nprobe=K — probing every list degrades gracefully to
    the brute-force baseline. Deterministic pipeline -> pinned values."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v = e.select("vec_id",
                 similarity.quantize_micro(F.col("embedding")).alias("v"))
    cents = similarity.kmeans_train(v, k=8, iters=3)
    c = cents.select(
        "cent_id", similarity.dequantize_micro(F.col("cvec")).alias("cvec"))
    q = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    x = {(r["query_id"], r["vec_id"])
         for r in similarity.cosine_topk(e, q, k=5).collect()}

    def recall(nprobe):
        a = {(r["query_id"], r["vec_id"])
             for r in similarity.ivf_topk(e, q, c, k=5,
                                          nprobe=nprobe).collect()}
        return len(a & x) / len(x)

    r1, r3, r8 = recall(1), recall(3), recall(8)
    assert r8 == 1.0, f"nprobe=K must equal brute force, got {r8}"
    assert r3 >= 0.7, f"recall@5(nprobe=3) = {r3}"
    assert r1 <= r3 <= r8, (r1, r3, r8)


def test_sq_roundtrip_preserves_topk(spark, sf_dir):
    """8-bit scalar quantization (4x smaller than float32) must keep
    cosine top-5 nearly intact — encode/decode are integer-exact
    inverses up to the 255-step grid (deterministic: 0.98 recall at
    sf0.001, 1.0 at sf0.01). Codes stay in [0, 255]."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v = e.select("vec_id",
                 similarity.quantize_micro(F.col("embedding")).alias("v"))
    lo, span = similarity.sq_train(v)
    assert len(lo) == 64 and all(s >= 1 for s in span)
    codes = v.select("vec_id",
                     similarity.sq_encode_col(lo, span).alias("codes"))
    rng = codes.select(
        F.min(F.array_min("codes")).alias("mn"),
        F.max(F.array_max("codes")).alias("mx")).collect()[0]
    assert 0 <= rng["mn"] and rng["mx"] <= 255
    rec = (codes.select("vec_id",
                        similarity.sq_decode_col(lo, span).alias("vr"))
           .select("vec_id",
                   F.expr("transform(vr, x -> (x - 1000000) / 1e6)")
                    .alias("embedding")))
    q = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    x = {(r["query_id"], r["vec_id"])
         for r in similarity.cosine_topk(e, q, k=5).collect()}
    a = {(r["query_id"], r["vec_id"])
         for r in similarity.cosine_topk(rec, q, k=5).collect()}
    assert len(a & x) / len(x) >= 0.95


def test_pq_train_encode_adc_recall(spark, sf_dir):
    """Lloyd-refined PQ codebooks: codes must beat the trivial
    1-entry-per-subspace quantizer on reconstruction, ADC top-k
    against the exact integer-L2 top-k must overlap substantially,
    and every code must be a valid codebook index."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v = e.select("vec_id",
                 similarity.quantize_micro(F.col("embedding")).alias("v"))
    M, DIM, K = 4, 64, 8
    cb = similarity.pq_train(v, m=M, dim=DIM, k=K, iters=2)
    assert cb.count() == M * K
    codes = similarity.pq_encode(v, cb, m=M, dim=DIM)
    rows = codes.collect()
    assert all(len(r["codes"]) == M for r in rows)
    assert all(0 <= c < K for r in rows for c in r["codes"])
    # codes are informative: many distinct code words across the corpus
    assert codes.select("codes").distinct().count() > K
    # ADC top-5 vs exact integer-L2 top-5 overlap
    q = v.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qvec"))
    adc = {(r["query_id"], r["vec_id"]) for r in
           similarity.pq_adc_topk(q, codes, cb, m=M, dim=DIM, k=5)
           .collect()}
    from pyspark.sql.window import Window as W
    cand = (v.crossJoin(q)
            .withColumn("d2", similarity._dist2_int(F.col("v"),
                                                    F.col("qvec"))))
    w = W.partitionBy("query_id").orderBy(F.col("d2").asc(),
                                          F.col("vec_id").asc())
    exact = {(r["query_id"], r["vec_id"]) for r in
             cand.withColumn("rk", F.row_number().over(w))
             .where(F.col("rk") <= 5).collect()}
    assert len(adc) == len(exact)
    # The fixture embeddings are near-unstructured — PQ's worst case
    # (M=4, K=8 keeps 0.03% of the integer-L2 information). Observed
    # deterministic recall is 0.20 here; the bound pins that the
    # compressed search is doing real ranking work (random top-5 picks
    # from 500 vectors would overlap ~1%), not absolute ANN quality,
    # which the IVF/SQ paths own.
    assert len(adc & exact) / len(exact) >= 0.15


def test_residual_pq_beats_plain_pq_quantization_error(spark, sf_dir):
    """FAISS-IVFPQ's justification, measured in residual PQ's
    operating regime — CLUSTERED vectors (residual encoding is a win
    exactly when the coarse quantizer explains variance; on isotropic
    noise the residual v − c has HIGHER variance and loses, which the
    raw fixture embeddings confirm). Plant 4 well-separated centroids,
    scatter each embedding tightly around one, and require the
    residual-codebook quantization error to be far below the
    plain-codebook error at the same code budget. Stride-sampled
    codebooks on both sides keep it deterministic."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.select(F.col("vec_id").cast("bigint").alias("vec_id"),
                 similarity.quantize_micro(F.col("embedding")).alias("q"))
    M, DIM = 2, 64
    # cluster j's centroid is the constant vector (j+1)*500_000; noise
    # is the quantized embedding shrunk 50x (range ~0..40_000)
    cid = F.col("vec_id") % 4
    v = q.select(
        "vec_id",
        F.transform(F.col("q"),
                    lambda x: (x / 50).cast("bigint")
                    + (cid + 1) * 500000).alias("v"))
    coarse = (spark.range(4)
              .select(F.col("id").cast("int").alias("cent_id"),
                      F.array_repeat((F.col("id") + 1) * 500000, DIM)
                      .alias("cvec")))
    plain_cb = similarity.pq_codebooks_stride(v, m=M, dim=DIM)
    plain_err = similarity.pq_quantization_error(
        v, plain_cb, m=M, dim=DIM).collect()[0]["err2"]
    res = similarity.residual_vectors(v, coarse)
    res_cb = similarity.pq_codebooks_stride(res, m=M, dim=DIM,
                                            vec_col="rvec")
    res_err = similarity.pq_quantization_error(
        res, res_cb, m=M, dim=DIM, vec_col="rvec").collect()[0]["err2"]
    # assignment must recover the plant (separation >> noise)
    n_lists = res.select("list_id").distinct().count()
    assert n_lists == 4
    assert res_err < plain_err, (res_err, plain_err)


def test_ivf_pq_residual_ranks_within_probed_lists(spark, sf_dir):
    """Every returned candidate must live in one of its query's nprobe
    nearest lists, ranks must be 1..k per query, and ADC distances
    must be non-negative and non-decreasing in rank."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v = e.select(F.col("vec_id").cast("bigint").alias("vec_id"),
                 similarity.quantize_micro(F.col("embedding")).alias("v"))
    M, DIM = 2, 64
    coarse = v.where(F.col("vec_id") % 131 == 0).select(
        (F.col("vec_id") / 131).cast("int").alias("cent_id"),
        F.col("v").alias("cvec"))
    res = similarity.residual_vectors(v, coarse)
    cb = similarity.pq_codebooks_stride(res, m=M, dim=DIM,
                                        vec_col="rvec")
    q = v.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qvec"))
    out = similarity.ivf_pq_residual_topk(
        q, res, coarse, cb, m=M, dim=DIM, nprobe=2, k=3)
    rows = sorted(out.collect(), key=lambda r: (r["query_id"],
                                                r["pq_rank"]))
    assigned = {r["vec_id"]: r["list_id"] for r in res.collect()}
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
        assert r["adc2"] >= 0
    for qid, rs in per_q.items():
        assert [r["pq_rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert all(a["adc2"] <= b["adc2"] for a, b in zip(rs, rs[1:]))
        probed_lists = {assigned[r["vec_id"]] for r in rs}
        assert len(probed_lists) <= 2  # nprobe bound
