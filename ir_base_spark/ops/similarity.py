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
    from ..functions.ranking import rank_bounded

    return rank_bounded(
        sim, [F.col("sim6").desc(), F.col("vec_id").asc()], k
    ).select("rank", "vec_id", "sim6")


def hyperplanes(n_planes: int = 8, dim: int = 32, seed: int = 7) -> list[list[float]]:
    """Deterministic seeded gaussian hyperplanes — shared by the Spark
    plan, the SQL oracle generator, and tests."""
    rnd = random.Random(seed)
    return [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _bucket_expr(col, planes):
    """Sign-of-projection LSH bucket id as a codegen'd column expression.

    The projection folds left-to-right (F.aggregate is a sequential
    fold), matching the SQL oracle's left-associated unrolled sum — the
    sign comparison is therefore bit-identical across engines.

    The vector is sliced to the plane dimension first: zip_with would
    null-pad a longer embedding (null products → null sum → every bit 0
    → one giant bucket, i.e. silent non-pruning).
    """
    bucket = None
    dim = len(planes[0])
    sliced = F.slice(col, 1, dim)
    for i, pl in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                sliced,
                F.array(*[F.lit(x) for x in pl]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket


def random_hyperplane_buckets(
    embeddings: DataFrame, n_planes: int = 12, dim: int = 32, seed: int = 7
) -> DataFrame:
    """(vec_id, bucket): sign-of-projection LSH bucket id.

    Hyperplanes are a deterministic seeded constant folded into the plan
    (broadcast literal); the projection is zip_with/aggregate codegen.
    """
    planes = hyperplanes(n_planes=n_planes, dim=dim, seed=seed)
    return embeddings.select("vec_id", _bucket_expr(F.col("embedding"), planes).alias("bucket"))


def ann_bucket_table(
    embeddings: DataFrame, n_planes: int = 8, dim: int = 32, seed: int = 7
) -> DataFrame:
    """(vec_id, bucket, embedding): the precomputed ANN index table.

    At scale this is computed ONCE per snapshot and persisted
    ``.write.bucketBy(B, "bucket")`` (or Iceberg-partitioned by bucket),
    so query time never rescans/rehashes the corpus — queries join their
    (few) probe buckets against a bucket-pruned scan.
    """
    planes = hyperplanes(n_planes=n_planes, dim=dim, seed=seed)
    return embeddings.select(
        "vec_id",
        _bucket_expr(F.col("embedding"), planes).alias("bucket"),
        "embedding",
    )


def _neighbor_bucket_col(n_planes: int):
    """qbucket + its Hamming-1 probes as an array column."""
    return F.array(
        F.col("qbucket"),
        *[F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
    )


def ann_lsh_topk_batch(
    embeddings: DataFrame,
    query_vec_ids: list[int],
    k: int = 10,
    n_planes: int = 8,
    dim: int = 32,
    bucket_table: DataFrame | None = None,
) -> DataFrame:
    """(query_id, rank, vec_id, sim6): multi-probe LSH ANN for a BATCH of
    queries against the precomputed bucket table.

    Plan shape at 100 TB: queries (tiny) broadcast with their probe
    buckets; ONE bucket-pruned join against the persisted bucket table
    yields candidates; exact cosine re-rank; per-query bounded top-k via
    a window PARTITIONED by query_id (never a global no-partition
    window). A vector has exactly one bucket and probe lists are
    distinct, so no candidate dedup pass is needed.
    """
    bt = bucket_table if bucket_table is not None else ann_bucket_table(
        embeddings, n_planes=n_planes, dim=dim
    )
    ids = list(query_vec_ids)
    qv = bt.filter(F.col("vec_id").isin(ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    probes = qv.select(
        "query_id",
        "qv",
        F.explode(_neighbor_bucket_col(n_planes)).alias("bucket"),
    )
    cand = bt.join(F.broadcast(probes), "bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    sim = cand.select(
        "query_id",
        "vec_id",
        F.round(
            _dot(F.col("embedding"), F.col("qv"))
            / (_norm(F.col("embedding")) * _norm(F.col("qv"))),
            6,
        ).alias("sim6"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim6").desc(), F.col("vec_id").asc()
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "sim6")
    )


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 32,
    bucket_table: DataFrame | None = None,
) -> DataFrame:
    """Single-query multi-probe LSH ANN: bucket-pruned candidates, exact
    cosine re-rank, distributed bounded-heap top-k
    (``orderBy().limit(k)`` → TakeOrderedAndProject) and THEN the rank
    window over only k rows."""
    out = ann_lsh_topk_batch(
        embeddings,
        [query_vec_id],
        k=k,
        n_planes=n_planes,
        dim=dim,
        bucket_table=bucket_table,
    )
    return out.select("rank", "vec_id", "sim6")
