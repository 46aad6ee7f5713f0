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

Plan shape (rebuilt in the optimization round): the K×dim centroid
table is driver state, collected after every Lloyd update and folded
back into the next iteration's plan as LITERAL arrays — the
bounded-scalar trainer shape of the LambdaRank/RankNet ops (K·dim
doubles per round, never corpus-sized). With literal centroids the
assignment step is pure narrow column algebra — one zip_with/aggregate
dot per cluster, argmin via least() over (dist, c) structs — so it
needs ZERO shuffles; the centroid update is ONE posexplode + one
(c, pos) aggregation. The previous formulation kept centroids as an
uncollected lineage of per-iteration join pyramids: the entry query's
final plan re-executed every earlier iteration once per reference
(measured 242 Exchange / 4098-line plan; ~3 Exchange after). Distances
still round to 9 dp before the argmin, and collected doubles
round-trip exactly through the driver, so both engines rank
identically (oracle-verified at sf0.001/0.01/0.1).

At 100 TB the same shape holds: K·dim literals ride the closure to
every task, the assignment pass is map-only over the (bucketable)
vector table, and the one shuffle per iteration carries K·dim partial
sums per map task — the MLlib KMeans aggregation layout.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fold_dot(vec_col, lit_vals: list[float]):
    """Σ_p vec[p]·lit[p] as a sequential left-to-right fold (codegen)."""
    return F.aggregate(
        F.zip_with(
            vec_col,
            F.array(*[F.lit(x) for x in lit_vals]),
            lambda a, b: a.cast("double") * b,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _vec_norm(vec_col):
    return F.sqrt(
        F.aggregate(
            vec_col,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def kmeans_assign_expr(vec_col, cents: list[list[float]]):
    """First-minimum argmin over literal centroids as ONE narrow struct
    column (dist, c) — the map-only assignment step."""
    xn = _vec_norm(vec_col)
    alts = []
    for c, cv in enumerate(cents):
        cn = math.sqrt(sum(x * x for x in cv))
        d = F.round(F.lit(1.0) - _fold_dot(vec_col, cv) / xn / F.lit(cn), 9)
        alts.append(F.struct(d.alias("dist"), F.lit(c).alias("c")))
    return F.least(*alts) if len(alts) > 1 else alts[0]


def kmeans_train_cents(
    vectors: DataFrame,
    k: int = 4,
    iterations: int = 2,
    id_col: str = "id",
    vec_col: str = "vec",
) -> list[list[float]]:
    """Run the Lloyd iterations; returns the final centroids as plain
    driver floats (K·dim — bounded trainer state, LambdaRank shape)."""
    V = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))

    # deterministic seeding: the K smallest-id vectors (c = rank by id)
    seed_rows = V.orderBy(F.col("id").asc()).limit(k).collect()
    cents: list[list[float]] = [
        [float(x) for x in row["vec"]] for row in seed_rows
    ]

    for _ in range(iterations):
        new_rows = (
            V.withColumn("m", kmeans_assign_expr(F.col("vec"), cents))
            .select(F.col("m.c").alias("c"), F.posexplode(F.col("vec")))
            .groupBy("c", "pos")
            .agg(F.avg(F.col("col").cast("double")).alias("cval"))
            .collect()
        )
        # empty clusters keep their previous centroid
        for r in new_rows:
            cents[r["c"]][r["pos"]] = r["cval"]
    return cents


def kmeans_cosine(
    vectors: DataFrame,
    k: int = 4,
    iterations: int = 2,
    id_col: str = "id",
    vec_col: str = "vec",
    return_centroids: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """vectors(id, vec array) → (id, cluster, dist9).

    ``return_centroids=True``: returns (assignment, centroids) where
    centroids is the positional (c, pos, cval) table AFTER the final
    update — the coarse quantizer an IVF index probes against
    (ops/similarity.ann_ivf_topk)."""
    spark = vectors.sparkSession
    cents = kmeans_train_cents(
        vectors, k=k, iterations=iterations, id_col=id_col, vec_col=vec_col
    )

    # predict(): the assignment under the FINAL centroids (map-only)
    out = (
        vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .withColumn("m", kmeans_assign_expr(F.col("vec"), cents))
        .select(
            F.col("id").alias(id_col),
            F.col("m.c").alias("cluster"),
            F.col("m.dist").alias("dist9"),
        )
    )
    if return_centroids:
        cent = spark.createDataFrame(
            [
                (c, p, v)
                for c, cv in enumerate(cents)
                for p, v in enumerate(cv)
            ],
            "c int, pos int, cval double",
        )
        return out, cent
    return out
