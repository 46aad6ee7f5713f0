"""Per-phase scaling probe on a prebuilt postings root."""
import json, os, shutil, sys, tempfile, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

def main():
    cores = int(sys.argv[1])
    root = sys.argv[2]
    phase = sys.argv[3]
    from ir_base_spark.session import get_spark
    local_dir = f"/dev/shm/sg-probe-{cores}"
    os.makedirs(local_dir, exist_ok=True)
    spark = get_spark(app_name=f"probe{cores}", cores=cores,
                      shuffle_partitions=int(os.environ.get("PROBE_SHUF", cores * 4)),
                      extra_conf={"spark.local.dir": local_dir,
                                  "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM","64g")})
    from ir_base_spark.index.manifest import finalize_index
    from ir_base_spark.index.dictionary import assign_doc_ids
    from ir_base_spark.index.blocks import build_block_index
    from ir_base_spark.fixtures import make_queries, make_transcripts
    from ir_base_spark.query.dataframe_bm25 import analyze_query_terms
    from ir_base_spark.query.wand import wand_topk

    res = {}
    t0 = time.time()
    idx = finalize_index(spark, root)
    idx.weights.count()
    res["finalize_nocache_count"] = round(time.time() - t0, 2)

    t0 = time.time()
    idx.weights.cache().count()
    res["weights_cache"] = round(time.time() - t0, 2)

    t0 = time.time()
    docs = assign_doc_ids(idx.doc_lens).cache()
    docs.count()
    res["doc_ids"] = round(time.time() - t0, 2)

    t0 = time.time()
    bidx = build_block_index(idx, docs, bucket_bits=13)
    bidx.blocks.cache().count()
    res["blocks"] = round(time.time() - t0, 2)

    if phase == "all":
        qpdf = make_queries(make_transcripts(n_conversations=200), n_queries=100)
        qt = analyze_query_terms(spark, qpdf).cache(); qt.count()
        t0 = time.time()
        wand_topk(bidx, qt).write.format("noop").mode("overwrite").save()
        res["wand"] = round(time.time() - t0, 2)
    print("PROBE", cores, json.dumps(res))
    spark.stop()
    shutil.rmtree(local_dir, ignore_errors=True)

main()
