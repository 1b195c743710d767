"""A/B/C probe for the float dot kernel (round 13, VERDICT item #1).

Round 12 shipped `dot(a, b, d)` as a flat 64-term expansion so whole-stage
codegen would compile it; the judge measured the opposite — a single
expanded cosine generates a >15 KB whole-stage method, HotSpot refuses to
JIT methods over 8,000 bytecode bytes (-XX:DontCompileHugeMethods), and the
whole stage (scan included) runs interpreted: 2.3-2.6x SLOWER than the
zip_with+aggregate fold it replaced.

This probe measures, at $SPARK_GRAFT_SF_DIR (default sf0.1), median of N:

  knn shape (cosine per pair, TakeOrdered):
    fold          cosine via HOF fold (d=None)
    flat-mono     round-12 form: cosine expanded in ONE projection (3 dots)
    flat-hoist    norms precomputed as columns on each join INPUT (their own
                  operator -> own codegen method), one flat dot post-join
  kmeans-assign shape (c_sq - 2*dot per pair, argmin agg):
    fold / flat (the score is already a single dot; c_sq hoisted both ways)

and extracts maxMethodCodeSize from explain("codegen") for each plan, so
the "does it JIT" question is answered by the artifact, not by theory.

Run:  python tools/dot_kernel_ab.py [reps]   -> prints a table + JSON line
"""
from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from langchain_callback_parquet_logger_spark.plans.session import get_spark, load_table, spread
from langchain_callback_parquet_logger_spark.operators.similarity import (
    EMB_DIM,
    QUERY_VEC_ID,
    TOP_K,
    _as_double,
    dot,
)


def fold_dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def flat_dot(a, b, d=EMB_DIM):
    out = F.lit(0.0)
    for i in range(d):
        out = out + a[i] * b[i]
    return out


def max_method_size(df: DataFrame) -> list[int]:
    """maxMethodCodeSize per WholeStageCodegen subtree of the FINAL
    (post-AQE) plan. The plan must have been executed first — with AQE on,
    codegen explain against the un-executed AdaptiveSparkPlanExec reports
    "0 subtrees" and would hide exactly the defect this probe exists to
    catch. Any value >= 8000 means HotSpot refuses to JIT that method
    (-XX:DontCompileHugeMethods) and the whole stage runs interpreted."""
    jvm = df._sc._jvm
    dbg = getattr(getattr(jvm.org.apache.spark.sql.execution.debug, "package$"), "MODULE$")
    plan = df._jdf.queryExecution().executedPlan()
    if plan.getClass().getName().endswith("AdaptiveSparkPlanExec"):
        plan = plan.finalPhysicalPlan()
    txt = dbg.codegenString(plan)
    return [int(m) for m in re.findall(r"maxMethodCodeSize:(\d+)", txt)]


def load_emb(spark, sf_dir: str, replicate: int) -> DataFrame:
    """The embeddings scan, optionally replicated x`replicate` with distinct
    vec_ids to emulate a larger SF (the sandbox has no sf1 embeddings
    parquet big enough to separate kernel variants; per-row float work
    scales linearly so a x20 union is a faithful stand-in)."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    if replicate <= 1:
        return emb
    n = 1_000_000_000
    parts = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * n)) for i in range(replicate)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.repartition(out.sparkSession.sparkContext.defaultParallelism)


def knn_variant(spark, sf_dir: str, kernel: str, replicate: int = 1) -> DataFrame:
    emb = load_emb(spark, sf_dir, replicate)
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID)
    others = emb.filter(F.col("vec_id") != QUERY_VEC_ID)
    if kernel.endswith("-hoist"):
        d = fold_dot if kernel.startswith("fold") else flat_dot
        qq = q.select(_as_double(F.col("embedding")).alias("q_emb")).withColumn(
            "q_nrm", F.sqrt(d(F.col("q_emb"), F.col("q_emb")))
        )
        oo = others.select(
            "vec_id", _as_double(F.col("embedding")).alias("emb")
        ).withColumn("nrm", F.sqrt(d(F.col("emb"), F.col("emb"))))
        sim = d(F.col("emb"), F.col("q_emb")) / (F.col("nrm") * F.col("q_nrm"))
        joined = oo.crossJoin(F.broadcast(qq))
    else:
        d = fold_dot if kernel == "fold" else flat_dot
        a = _as_double(F.col("embedding"))
        b = F.col("q_emb")
        sim = d(a, b) / (F.sqrt(d(a, a)) * F.sqrt(d(b, b)))
        joined = others.crossJoin(
            F.broadcast(q.select(_as_double(F.col("embedding")).alias("q_emb")))
        )
    return (
        joined.select("vec_id", F.round(sim, 6).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(TOP_K)
    )


def kmeans_assign_variant(spark, sf_dir: str, kernel: str, replicate: int = 1) -> DataFrame:
    d = fold_dot if kernel == "fold" else flat_dot
    emb = load_emb(spark, sf_dir, replicate).select(
        "vec_id", _as_double(F.col("embedding")).alias("emb")
    )
    centroids = (
        emb.orderBy("vec_id")
        .limit(4)
        .select(F.col("vec_id").alias("cid"), F.col("emb").alias("c_emb"))
    )
    cents = F.broadcast(centroids.withColumn("c_sq", d(F.col("c_emb"), F.col("c_emb"))))
    scored = emb.crossJoin(cents).select(
        "vec_id",
        "cid",
        (F.col("c_sq") - 2.0 * d(F.col("emb"), F.col("c_emb"))).alias("score"),
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct("score", "cid")).alias("best"))
        .select("vec_id", F.col("best.cid").alias("cid"))
        .groupBy("cid")
        .count()
        .orderBy("cid")
    )


def run(df: DataFrame) -> float:
    t = time.monotonic()
    n = df.count()
    assert n >= 0
    return time.monotonic() - t


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dot-kernel-ab")
    out = {"sf_dir": sf_dir, "reps": reps, "replicate": replicate, "shapes": {}}
    shapes = {
        "knn": (knn_variant, ["fold", "flat-mono", "flat-hoist", "fold-hoist"]),
        "kmeans_assign": (kmeans_assign_variant, ["fold", "flat-mono"]),
    }
    for shape, (builder, kernels) in shapes.items():
        out["shapes"][shape] = {}
        for kernel in kernels:
            df = builder(spark, sf_dir, kernel, replicate)
            run(df)  # warm (file listing, broadcast) + makes AQE final plan real
            sizes = max_method_size(df)
            times = [run(builder(spark, sf_dir, kernel, replicate)) for _ in range(reps)]
            med = statistics.median(times)
            out["shapes"][shape][kernel] = {
                "median_s": round(med, 3),
                "times": [round(t, 3) for t in times],
                "maxMethodCodeSize": sizes,
                "jit_ok": all(s < 8000 for s in sizes),
            }
            print(
                f"{shape:14s} {kernel:10s} median {med:7.3f}s  "
                f"maxMethodCodeSize={sizes} jit_ok={all(s < 8000 for s in sizes)}",
                flush=True,
            )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
