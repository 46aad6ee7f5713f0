"""Sub-step timing probe for the block-build phase.

    python tools/block_probe.py <cores> <index_root>

Requires a finished resumable_build at <index_root> with weights/terms
parquet written (tools/prep_probe_root.py).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    cores = int(sys.argv[1])
    root = sys.argv[2]
    from pyspark.sql import functions as F

    from ir_base_spark.index.blocks import (
        _make_stream_block_builder,
        BLOCK_SCHEMA,
        choose_bucket_bits,
    )
    from ir_base_spark.index.dictionary import assign_doc_ids, conv_doc_base
    from ir_base_spark.session import get_spark

    local_dir = f"/dev/shm/sg-bprobe-{cores}"
    os.makedirs(local_dir, exist_ok=True)
    spark = get_spark(
        app_name=f"bprobe{cores}", cores=cores, shuffle_partitions=cores * 4,
        extra_conf={"spark.local.dir": local_dir},
    )
    res = {"cores": cores}
    with open(os.path.join(root, "stats.json")) as fh:
        st = json.load(fh)
    n_docs = st["n_docs"]
    bucket_bits = choose_bucket_bits(n_docs)

    doc_lens = (
        spark.read.parquet(os.path.join(root, "postings"))
        .filter(F.col("is_doc_head") == 1)
        .select("conv_id", "turn_idx", "doc_len")
    )

    t0 = time.time()
    base = conv_doc_base(doc_lens)
    base_c = base.cache()
    base_c.count()
    res["conv_base"] = round(time.time() - t0, 2)

    t0 = time.time()
    docs = assign_doc_ids(doc_lens, base=base_c)
    docs.write.mode("overwrite").parquet(os.path.join(root, "docs"))
    res["docs_write"] = round(time.time() - t0, 2)

    weights = spark.read.parquet(os.path.join(root, "weights"))
    t0 = time.time()
    w = (
        weights.join(F.broadcast(base_c), "conv_id")
        .withColumn("doc_id", (F.col("base") + F.col("turn_idx")).cast("long"))
        .withColumn("bucket", F.shiftright(F.col("doc_id"), bucket_bits).cast("int"))
        .select("term_id", "bucket", "doc_id", "weight")
    )
    w.write.format("noop").mode("overwrite").save()
    res["join_scan_noop"] = round(time.time() - t0, 2)

    t0 = time.time()
    n_parts = max(cores * 4, spark.sparkContext.defaultParallelism * 4)
    shuffled = w.repartition(n_parts, "term_id", "bucket").sortWithinPartitions(
        "term_id", "bucket", "doc_id"
    )
    shuffled.write.format("noop").mode("overwrite").save()
    res["shuffle_sort_noop"] = round(time.time() - t0, 2)

    t0 = time.time()
    blocks = shuffled.mapInPandas(
        _make_stream_block_builder(128), schema=BLOCK_SCHEMA
    )
    blocks.write.format("noop").mode("overwrite").save()
    res["encode_noop"] = round(time.time() - t0, 2)

    t0 = time.time()
    blocks.write.mode("overwrite").parquet(os.path.join(root, "blocks"))
    res["encode_parquet"] = round(time.time() - t0, 2)

    print("BPROBE", json.dumps(res))
    spark.stop()


main()
