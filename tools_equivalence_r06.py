"""r06 equivalence evidence: compare the round-start ANN implementations
against the vectorized rewrites row-for-row at sf0.1 and sf1.0.

Usage:
    git show 20ce874:optimizerasters_spark/operators/similarity.py \
        > /tmp/similarity_old.py
    python tools_equivalence_r06.py          # prints MATCH per (sf, op)

Recorded run (2026-08-22): all ten (sf, op) combinations MATCH —
ivf_topk, pq_encode, pq_adc_topk, ivf_pq_residual, kmeans_train at both
scale factors.
"""
import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pyspark.sql import functions as F
from optimizerasters_spark.session import get_spark
from optimizerasters_spark.operators import similarity as new
spec = importlib.util.spec_from_file_location(
    "similarity_old",
    os.environ.get("SIMILARITY_OLD", "/tmp/similarity_old.py"))
old = importlib.util.module_from_spec(spec); spec.loader.exec_module(old)

spark = get_spark("cmp-ann", master="local[32]", shuffle_partitions="64")
spark.sparkContext.setLogLevel("ERROR")

def rows(df):
    return sorted([tuple(r) for r in df.collect()])

def parts(sf_dir, mod):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v = e.select(F.col("vec_id").cast("bigint").alias("vec_id"),
                 mod.quantize_micro(F.col("embedding")).alias("v"))
    cb = mod.pq_codebooks_stride(v, m=2, dim=64)
    return e, v, cb

for sf in ["/root/testdata/sf0.1", "/root/testdata/sf1.0"]:
    e_raw = spark.read.parquet(f"{sf}/embeddings.parquet")
    cents = e_raw.where(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec"))
    q = e_raw.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    a = rows(old.ivf_topk(e_raw, q, cents, k=5, nprobe=2))
    b = rows(new.ivf_topk(e_raw, q, cents, k=5, nprobe=2))
    print(sf, "ivf_topk", "MATCH" if a == b else "MISMATCH", len(a), len(b))

    for mod, tag in [(old, "old"), (new, "new")]: pass
    e, v, cb = parts(sf, old)
    codes_o = rows(old.pq_encode(v, cb, m=2, dim=64).select("vec_id", F.col("codes").cast("array<int>")))
    e, v2, cb2 = parts(sf, new)
    codes_n = rows(new.pq_encode(v2, cb2, m=2, dim=64).select("vec_id", F.col("codes").cast("array<int>")))
    codes_o = [(i, tuple(c)) for i, c in codes_o]; codes_n = [(i, tuple(c)) for i, c in codes_n]
    print(sf, "pq_encode", "MATCH" if codes_o == codes_n else "MISMATCH", len(codes_o), len(codes_n))

    queries = v.where(F.col("vec_id") < 4).select(F.col("vec_id").alias("query_id"), F.col("v").alias("qvec"))
    a = rows(old.pq_adc_topk(queries, old.pq_encode(v, cb, m=2, dim=64), cb, m=2, dim=64, k=3))
    b = rows(new.pq_adc_topk(queries, new.pq_encode(v2, cb2, m=2, dim=64), cb2, m=2, dim=64, k=3))
    print(sf, "pq_adc_topk", "MATCH" if a == b else "MISMATCH", len(a), len(b))

    coarse = v.where(F.col("vec_id") % 131 == 0).select(
        (F.col("vec_id") / 131).cast("int").alias("cent_id"), F.col("v").alias("cvec"))
    res_o = old.residual_vectors(v, coarse); cbr_o = old.pq_codebooks_stride(res_o, m=2, dim=64, vec_col="rvec")
    res_n = new.residual_vectors(v2, coarse); cbr_n = new.pq_codebooks_stride(res_n, m=2, dim=64, vec_col="rvec")
    a = rows(old.ivf_pq_residual_topk(queries, res_o, coarse, cbr_o, m=2, dim=64, nprobe=2, k=3))
    b = rows(new.ivf_pq_residual_topk(queries, res_n, coarse, cbr_n, m=2, dim=64, nprobe=2, k=3))
    print(sf, "ivf_pq_residual", "MATCH" if a == b else "MISMATCH", len(a), len(b))

    a = rows(old.kmeans_train(v, k=8, iters=2))
    b = rows(new.kmeans_train(v2, k=8, iters=2))
    a = [(c, tuple(x), n) for c, x, n in a]; b = [(c, tuple(x), n) for c, x, n in b]
    print(sf, "kmeans_train", "MATCH" if a == b else "MISMATCH", len(a), len(b))
spark.stop()
