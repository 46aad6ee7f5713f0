"""KMeans with cosine distance — deterministic Lloyd iterations.

Spark analog of the reference's clustering stage
(/root/reference/src/clustering/KMeansAlg.java:29,56-68 — mallet
KMeans with the custom CosineDistance metric, CosineDistance.java:
1 − a·b/|a|/|b|). Deviations, documented: mallet's random centroid
seeding is replaced by the K smallest-id vectors (deterministic,
SQL-restatable); fixed iteration count; assignment ties break to the
smaller cluster index (the reference's sequential argmin scan keeps
the first minimum — same rule); a cluster that loses all members
keeps its previous centroid.

Plan shape: vectors live POSITIONALLY exploded (id, pos, val) so the
distance computation is a join + SUM per (id, cluster) and the
centroid update is an avg per (cluster, pos) — plain codegen
aggregations, no UDFs, and the same formulation the SQL oracle uses.
The centroid table is K×dim (tiny) and broadcasts; each Lloyd
iteration is one broadcast join + two aggregations over the exploded
corpus. Distances round to 9 dp before the argmin so both engines
rank identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kmeans_cosine(
    vectors: DataFrame,
    k: int = 4,
    iterations: int = 2,
    id_col: str = "id",
    vec_col: str = "vec",
    return_centroids: bool = False,
) -> DataFrame:
    """vectors(id, vec array) → (id, cluster, dist9).

    ``return_centroids=True``: returns (assignment, centroids) where
    centroids is the positional (c, pos, cval) table AFTER the final
    update — the coarse quantizer an IVF index probes against
    (ops/similarity.ann_ivf_topk)."""
    X = vectors.select(
        F.col(id_col).alias("id"), F.posexplode(F.col(vec_col))
    ).select("id", F.col("pos"), F.col("col").alias("val"))
    xn = X.groupBy("id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("xn")
    )

    # deterministic seeding: the K smallest-id vectors
    wid = Window.orderBy(F.col("id").asc())
    seed_ids = (
        vectors.select(F.col(id_col).alias("id"))
        .withColumn("c", F.row_number().over(wid) - 1)
        .filter(F.col("c") < k)
    )
    cent = X.join(seed_ids, "id").select(
        "c", "pos", F.col("val").alias("cval")
    )

    def assign_to(cent_df):
        cn = cent_df.groupBy("c").agg(
            F.sqrt(F.sum(F.col("cval") * F.col("cval"))).alias("cn")
        )
        dot = (
            X.join(F.broadcast(cent_df), "pos")
            .groupBy("id", "c")
            .agg(F.sum(F.col("val") * F.col("cval")).alias("dot"))
        )
        dist = (
            dot.join(F.broadcast(cn), "c")
            .join(xn, "id")
            .select(
                "id",
                "c",
                F.round(
                    F.lit(1.0) - F.col("dot") / F.col("xn") / F.col("cn"), 9
                ).alias("dist"),
            )
        )
        wa = Window.partitionBy("id").orderBy(
            F.col("dist").asc(), F.col("c").asc()
        )
        return (
            dist.withColumn("rn", F.row_number().over(wa))
            .filter(F.col("rn") == 1)
            .select("id", "c", "dist")
        )

    for _ in range(iterations):
        assign = assign_to(cent)
        new_cent = (
            X.join(assign.select("id", "c"), "id")
            .groupBy("c", "pos")
            .agg(F.avg("val").alias("cval"))
        )
        # empty clusters keep their previous centroid
        cent = (
            cent.select("c", "pos", F.col("cval").alias("old"))
            .join(new_cent, ["c", "pos"], "left")
            .select(
                "c", "pos", F.coalesce(F.col("cval"), F.col("old")).alias("cval")
            )
        )

    # predict(): the assignment under the FINAL centroids
    assign = assign_to(cent)
    out = assign.select(
        F.col("id").alias(id_col),
        F.col("c").alias("cluster"),
        F.col("dist").alias("dist9"),
    )
    if return_centroids:
        return out, cent
    return out
