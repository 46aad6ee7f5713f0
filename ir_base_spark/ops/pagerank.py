"""PageRank instance weighting over per-group similarity graphs.

Deterministic Spark analog of the reference's influence weighting
(/root/reference/src/influence/PageRank.java:25,68-185): documents are
grouped (per item/product in the reference; any group column here),
each large-enough group gets a k-NN similarity digraph whose edge
weights are a softmax over each node's top-k dot-product neighbors
(constructSparseGraph :69-97), and the power iteration

    r_i' = α/N + (1-α) · Σ_{j→i} T[j,i] · r_j,   then L2-normalize r'

runs from the uniform 1/√N start (calcPageRank :129-166). The final
instance weight is 1 + 10·r (:168).

Deviations, documented: fixed iteration count instead of the
maxIter/delta test; neighbor ties break by (sim desc, id asc) (the
Java bounded queue leaves equal-similarity order unspecified); a
single ``min_group_size`` threshold instead of the reference's
streaming quirk (>10 for every group except >5 for the last one in
file order — an artifact of its sequential reader, not a semantic);
dot products round to 6 dp before ranking/softmax so the SQL oracle
ranks and weighs identically.

Scale shape: groups are bounded (per-item review sets), so pairwise
similarity within a group is the oracle-exact baseline; at 100 TB
swap candidate generation for the ANN path and keep everything
downstream. Each iteration is one join of the edge list against the
rank vector plus one per-group aggregate — codegen columns, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _dot


def pagerank_instance_weights(
    vectors: DataFrame,
    top_k: int = 5,
    alpha: float = 0.15,
    iterations: int = 3,
    min_group_size: int = 10,
    group_col: str = "grp",
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """vectors(group, id, vec) → (group, id, rank6, weight6)."""
    V = vectors.select(
        F.col(group_col).alias("g"),
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
    )
    sizes = V.groupBy("g").agg(F.count(F.lit(1)).alias("N")).filter(
        F.col("N") > min_group_size
    )
    # cached: read by both sides of the pair join, the node table and
    # the edge build — without it the pair self-join re-derives the
    # grouped/filtered vector table once per consumer
    V = V.join(F.broadcast(sizes), "g").cache()

    pairs = (
        V.alias("a")
        .join(
            V.select(
                F.col("g"), F.col("id").alias("dst"), F.col("vec").alias("bv")
            ).alias("b"),
            "g",
        )
        .filter(F.col("id") != F.col("dst"))
        .select(
            "g",
            F.col("id").alias("src"),
            "dst",
            F.round(_dot(F.col("vec"), F.col("bv")), 6).alias("s"),
        )
    )
    w = Window.partitionBy("g", "src").orderBy(
        F.col("s").desc(), F.col("dst").asc()
    )
    top = pairs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= top_k
    )
    # softmax over each node's top-k (constructSparseGraph :83-94)
    edges = (
        top.withColumn("e", F.exp(F.col("s")))
        .withColumn(
            "w",
            F.col("e")
            / F.sum("e").over(Window.partitionBy("g", "src")),
        )
        .select("g", "src", "dst", "w")
        .cache()
    )

    nodes = V.select("g", "id", "N")
    r = nodes.withColumn("r", F.lit(1.0) / F.sqrt(F.col("N")))
    for _ in range(iterations):
        inc = (
            edges.join(
                r.select(
                    "g", F.col("id").alias("src"), F.col("r").alias("rs")
                ),
                ["g", "src"],
            )
            .groupBy("g", "dst")
            .agg(F.sum(F.col("w") * F.col("rs")).alias("infl"))
        )
        upd = (
            nodes.join(
                inc.select("g", F.col("dst").alias("id"), "infl"),
                ["g", "id"],
                "left",
            )
            .withColumn(
                "r",
                F.lit(alpha) / F.col("N")
                + F.lit(1.0 - alpha) * F.coalesce(F.col("infl"), F.lit(0.0)),
            )
            # read twice per iteration (L2 norm + the normalized rank):
            # cached, or the pre-norm subtree doubles per iteration
            # (2^iterations plan blowup — 206 Exchange / 2731 lines
            # for the 3-iteration entry before; 19 after)
            .cache()
        )
        norm = upd.groupBy("g").agg(
            F.sqrt(F.sum(F.col("r") * F.col("r"))).alias("nrm")
        )
        r = (
            upd.join(F.broadcast(norm), "g")
            .withColumn("r", F.col("r") / F.col("nrm"))
            .select("g", "id", "N", "r")
        )

    return r.select(
        F.col("g").alias(group_col),
        F.col("id").alias(id_col),
        F.round(F.col("r"), 6).alias("rank6"),
        F.round(F.lit(1.0) + F.lit(10.0) * F.col("r"), 6).alias("weight6"),
    )
