"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the oracle-checkable baseline (SQL:
list_cosine_similarity); the LSH-bucketed variant is the 100 TB path —
random-hyperplane signatures shrink the candidate set so the shuffle
carries (bucket, id, vec) only within matching buckets. All vector math
stays JVM-side (zip_with / aggregate — codegen, no Python).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    # cast BEFORE multiplying: float32 products would diverge from the
    # double-precision SQL oracle (and lose precision at scale)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_topk(
    embeddings: DataFrame, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """(rank, vec_id, sim6): brute-force cosine top-k against the vector
    with id ``query_vec_id``; the query row itself is excluded. Rounded
    to 6 dp before ranking so ties break identically to the SQL oracle.
    """
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv")
    )
    cand = embeddings.filter(F.col("vec_id") != query_vec_id).crossJoin(
        F.broadcast(q)
    )
    sim = cand.select(
        "vec_id",
        F.round(
            _dot(F.col("embedding"), F.col("qv"))
            / (_norm(F.col("embedding")) * _norm(F.col("qv"))),
            6,
        ).alias("sim6"),
    )
    # distributed bounded-heap top-k (TakeOrderedAndProject), then rank
    # the k survivors
    top = sim.orderBy(F.col("sim6").desc(), F.col("vec_id").asc()).limit(k)
    w = Window.orderBy(F.col("sim6").desc(), F.col("vec_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "vec_id", "sim6"
    )


def random_hyperplane_buckets(
    embeddings: DataFrame, n_planes: int = 12, dim: int = 32, seed: int = 7
) -> DataFrame:
    """(vec_id, bucket): sign-of-projection LSH bucket id.

    Hyperplanes are a deterministic seeded constant folded into the plan
    (broadcast literal); the projection is zip_with/aggregate codegen.
    """
    rnd = random.Random(seed)
    planes = [
        [rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]
    bucket = None
    for i, pl in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.array(*[F.lit(x) for x in pl]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return embeddings.select("vec_id", bucket.alias("bucket"))


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 32,
) -> DataFrame:
    """Approximate cosine top-k: candidates share the query's hyperplane
    bucket (plus Hamming-1 neighbor buckets), then exact re-rank.

    At scale this replaces the full scan with a bucket-pruned scan; the
    bucket table can be precomputed/bucketed-by on write.
    """
    buckets = random_hyperplane_buckets(embeddings, n_planes=n_planes, dim=dim)
    qb = buckets.filter(F.col("vec_id") == query_vec_id).select(
        F.col("bucket").alias("qbucket")
    )
    neighbor_buckets = qb.select(
        F.explode(
            F.array(
                F.col("qbucket"),
                *[
                    F.col("qbucket").bitwiseXOR(F.lit(1 << i))
                    for i in range(n_planes)
                ],
            )
        ).alias("bucket")
    ).distinct()
    cand_ids = buckets.join(F.broadcast(neighbor_buckets), "bucket").select("vec_id")
    cand = embeddings.join(cand_ids, "vec_id")
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv")
    )
    sim = (
        cand.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.col("qv"))
                / (_norm(F.col("embedding")) * _norm(F.col("qv"))),
                6,
            ).alias("sim6"),
        )
    )
    w = Window.orderBy(F.col("sim6").desc(), F.col("vec_id").asc())
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", "vec_id", "sim6")
    )
