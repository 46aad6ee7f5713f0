"""Resumable index build with per-partition checkpoint manifests.

North rule (BASELINE.json:6,14): a killed build restarts WITHOUT
recomputing completed partitions; each manifest row carries lineage
(input snapshot id, partition range) and metrics (postings written,
bytes compressed, terms/sec). Spark's own commit protocol only makes a
whole JOB atomic, so the expensive phase — tokenize + posting
extraction — is committed per partition here:

  index_root/
    input_parts/partition_id=<p>/   deterministic conv-hash split of the
                                    input (stage 0, one shuffle)
    postings/partition_id=<p>/      tokenized postings, written per
                                    partition via tmp-dir + atomic rename
    manifest/p<p>.json              one row per COMPLETED partition
                                    (written after the rename, also
                                    tmp + atomic rename)
    stats.json                      pinned corpus constants
                                    (n_docs, avg_doc_len — SURVEY §7.3)

Partition assignment is a deterministic conv-id RANGE split balanced by
raw turn count (conv_partition_map; persisted as conv_parts/) —
reproducible under restart, independent of input row order, a
conversation never splits across partitions, and every partition owns a
CONTIGUOUS doc-id range, so the doc shard doubles as the posting-block
bucket (zero posting-level shuffle downstream, blocks.encode_shards).
At Iceberg scale, stage 0 is replaced by the table's own
partitioning/manifest metadata (enumerate data files per partition
range instead of rewriting); the per-partition commit protocol is
unchanged. Missing partitions process in WAVES — one Spark job per wave
over exactly the missing partitions' files — so restart cost is
proportional to MISSING work, all cores stay busy regardless of
partition count, and commit granularity stays bounded (a killed wave
promotes nothing; completed waves stay done).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tokenize import tokenize_turns

MANIFEST_VERSION = 1


@dataclass
class PartitionManifest:
    """Per-partition build lineage + metrics.

    Lineage fields (snapshot_id, conv_id_min/max, status) are exact
    and idempotent under task retries. Since the r5 term-partials
    change, cmin/cmax come from the split-time conversation map (the
    conversations ASSIGNED to the partition), not from observed
    postings: a partition whose edge conversations were fully pruned
    (min_distinct_terms, empty turns) reports a range WIDER than its
    postings actually cover. That is a safe superset for conv-range
    pruning — readers must not treat cmin/cmax as tight postings
    bounds. Count/rate fields (turns, postings_written,
    terms_per_sec, turns_per_sec) are collected via the Observation
    API on the write job and are APPROXIMATE under task retries or
    speculative execution — treat them as operational reporting, not
    lineage. bytes_compressed is derived from the written files and
    is exact."""

    partition_id: int
    snapshot_id: str
    conv_id_min: str
    conv_id_max: str
    turns: int
    postings_written: int
    bytes_compressed: int
    wall_sec: float
    terms_per_sec: float
    turns_per_sec: float
    status: str  # only "done" rows are ever written
    version: int = MANIFEST_VERSION


@dataclass
class BuildReport:
    snapshot_id: str
    partitions_total: int
    partitions_built: int
    partitions_skipped: int
    turns_built: int
    postings_built: int
    wall_sec: float
    turns_per_sec: float


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _atomic_write_json(path: str, payload: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
    os.replace(tmp, path)


def input_snapshot_id(transcripts: DataFrame) -> str:
    """Deterministic lineage id, the stand-in for an Iceberg snapshot id.

    File-backed inputs: sha1 over the sorted file list + per-file size
    AND mtime, so a same-size content rewrite changes the snapshot and
    can never silently resume against stale partitions. In-memory inputs
    (no file lineage): digest the CONTENT — row count + order-independent
    xor + sum of per-row xxhash64 — schema alone is not identity.
    """
    h = hashlib.sha1()
    files = sorted(transcripts.inputFiles())
    if files:
        for f in files:
            h.update(f.encode())
            local = f.removeprefix("file:")
            if os.path.exists(local):
                st = os.stat(local)
                h.update(str(st.st_size).encode())
                h.update(str(st.st_mtime_ns).encode())
    else:
        # per-row hash via the column API (identifier-quoting-safe for
        # any column name), aggregated under a fixed safe alias
        row_h = F.xxhash64(*[F.col(c) for c in transcripts.columns])
        row = (
            transcripts.select(row_h.alias("_row_h"))
            .select(
                F.count(F.lit(1)).alias("n"),
                F.expr("bit_xor(_row_h)").alias("hxor"),
                F.sum(F.col("_row_h").cast("decimal(38,0)")).alias("hsum"),
            )
            .collect()[0]
        )
        h.update(f"{row['n']}|{row['hxor']}|{row['hsum']}".encode())
    h.update(transcripts.schema.json().encode())
    return h.hexdigest()[:16]


def _manifest_dir(root: str) -> str:
    return os.path.join(root, "manifest")


def read_manifest(index_root: str) -> dict[int, PartitionManifest]:
    out: dict[int, PartitionManifest] = {}
    mdir = _manifest_dir(index_root)
    if not os.path.isdir(mdir):
        return out
    for name in os.listdir(mdir):
        if name.startswith("p") and name.endswith(".json"):
            with open(os.path.join(mdir, name)) as fh:
                row = json.load(fh)
            m = PartitionManifest(**row)
            if m.status == "done":
                out[m.partition_id] = m
    return out


def conv_partition_map(
    transcripts: DataFrame, num_partitions: int
) -> DataFrame:
    """(conv_id, partition_id): deterministic conv-RANGE split balanced
    by raw text bytes.

    Conversations are ordered by conv_id and packed into ``num_partitions``
    contiguous ranges of ~equal total TEXT BYTES (two-phase distributed
    prefix sum — no sampling, so the assignment is reproducible under
    restart, unlike repartitionByRange). Bytes, not turns: tokenize cost
    and postings volume follow text length, and under a Zipf turn-length
    distribution turn-balanced ranges left one straggler task per build
    wave — the last finisher's solo tail was the dominant non-scaling
    term of the build at high core counts (each turn also carries a
    small constant so metadata-ish empty turns still weigh). Because
    doc ids ascend in (conv_id, turn_idx), each partition owns a
    CONTIGUOUS doc-id range: the doc shard IS the posting-block bucket,
    which is what lets the block build run with zero posting-level
    shuffle (blocks.encode_shards).
    """
    from .dictionary import two_phase_cumsum

    ext = transcripts.groupBy("conv_id").agg(
        F.sum(
            F.octet_length(F.coalesce(F.col("text"), F.lit(""))) + F.lit(16)
        ).cast("long").alias("_n")
    )
    cum = two_phase_cumsum(ext, "conv_id", "_n", "cum_before")
    pid = F.least(
        F.lit(num_partitions - 1),
        F.floor(F.col("cum_before") * num_partitions / F.col("_total")),
    ).cast("int")
    return cum.select("conv_id", pid.alias("partition_id"))


def _split_input(
    spark: SparkSession,
    transcripts: DataFrame,
    index_root: str,
    num_partitions: int,
) -> str:
    """Stage 0: deterministic conv-range split, written once, atomically.

    The conv→partition map is persisted under the index root (it is part
    of the snapshot: doc-shard boundaries must survive restarts)."""
    parts_dir = os.path.join(index_root, "input_parts")
    marker = os.path.join(index_root, "input_parts.done.json")
    snap = input_snapshot_id(transcripts)
    if os.path.exists(marker):
        with open(marker) as fh:
            meta = json.load(fh)
        if meta.get("snapshot_id") == snap and meta.get("num_partitions") == num_partitions:
            return snap
        raise ValueError(
            f"index_root {index_root} was split for snapshot "
            f"{meta.get('snapshot_id')}/{meta.get('num_partitions')} parts; "
            f"got {snap}/{num_partitions}. Use a fresh index_root."
        )
    cmap_dir = os.path.join(index_root, "conv_parts")
    tmp_cmap = cmap_dir + "._tmp"
    if os.path.isdir(tmp_cmap):
        shutil.rmtree(tmp_cmap)
    conv_partition_map(transcripts, num_partitions).write.mode(
        "overwrite"
    ).parquet(tmp_cmap)
    if os.path.isdir(cmap_dir):
        shutil.rmtree(cmap_dir)
    os.replace(tmp_cmap, cmap_dir)
    cmap = spark.read.parquet(cmap_dir)

    tmp = parts_dir + "._tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    (
        transcripts.join(F.broadcast(cmap), "conv_id")
        .repartition(num_partitions, "partition_id")
        .write.partitionBy("partition_id")
        .mode("overwrite")
        .parquet(tmp)
    )
    if os.path.isdir(parts_dir):
        shutil.rmtree(parts_dir)
    os.replace(tmp, parts_dir)
    # per-partition conv ranges, computed ONCE at split time from the
    # conv-level map (tiny agg): cmin/cmax are a property of the split,
    # not of the tokenize pass, so the build waves don't have to
    # observe conv_id at all (the old per-wave CollectMetrics over
    # every posting row was a measured ~45% write-job overhead)
    ranges = {
        int(r["partition_id"]): [r["cmin"], r["cmax"]]
        for r in cmap.groupBy("partition_id")
        .agg(F.min("conv_id").alias("cmin"), F.max("conv_id").alias("cmax"))
        .collect()
    }
    _atomic_write_json(
        marker,
        {
            "snapshot_id": snap,
            "num_partitions": num_partitions,
            "conv_ranges": ranges,
        },
    )
    return snap


def _conv_ranges(spark: SparkSession, index_root: str) -> dict:
    """{partition_id: [conv_min, conv_max]} from the split marker;
    recomputed from conv_parts/ for roots split before the marker
    carried ranges (and re-persisted so the agg runs at most once)."""
    marker = os.path.join(index_root, "input_parts.done.json")
    with open(marker) as fh:
        meta = json.load(fh)
    if "conv_ranges" in meta:
        return {int(k): v for k, v in meta["conv_ranges"].items()}
    cmap = spark.read.parquet(os.path.join(index_root, "conv_parts"))
    ranges = {
        int(r["partition_id"]): [r["cmin"], r["cmax"]]
        for r in cmap.groupBy("partition_id")
        .agg(F.min("conv_id").alias("cmin"), F.max("conv_id").alias("cmax"))
        .collect()
    }
    meta["conv_ranges"] = ranges
    _atomic_write_json(marker, meta)
    return ranges


def _empty_partition_manifest(snap: str, pid: int) -> PartitionManifest:
    return PartitionManifest(
        partition_id=pid, snapshot_id=snap, conv_id_min="", conv_id_max="",
        turns=0, postings_written=0, bytes_compressed=0, wall_sec=0.0,
        terms_per_sec=0.0, turns_per_sec=0.0, status="done",
    )


def _build_wave(
    spark: SparkSession,
    index_root: str,
    snap: str,
    wave: list[int],
    num_partitions: int,
    ngrams: int,
    analyzer: str,
    min_distinct_terms: int,
) -> list[PartitionManifest]:
    """Tokenize + commit one wave of partitions with ONE Spark job pair.

    A single job writes every wave partition's postings (partitionBy on
    the re-derived conv-hash — no shuffle: each input task holds exactly
    one partition), one agg job computes per-partition metrics, then the
    driver promotes each partition directory atomically and writes its
    manifest row. Commit granularity = the wave; within a killed wave
    nothing is promoted, completed waves stay done. This replaces the
    old one-Spark-job-per-partition driver loop, whose per-job driver
    orchestration (GIL + py4j from dozens of threads) throttled large
    core counts.
    """
    parts_root = os.path.join(index_root, "input_parts")
    post_root = os.path.join(index_root, "postings")
    existing = [
        pid for pid in wave
        if os.path.isdir(os.path.join(parts_root, f"partition_id={pid}"))
    ]
    out: list[PartitionManifest] = []
    empty = [pid for pid in wave if pid not in set(existing)]
    for pid in empty:  # hash buckets with no conversations (tiny inputs)
        m = _empty_partition_manifest(snap, pid)
        _atomic_write_json(
            os.path.join(_manifest_dir(index_root), f"p{pid}.json"), asdict(m)
        )
        out.append(m)
    if not existing:
        return out

    t0 = time.time()
    paths = [os.path.join(parts_root, f"partition_id={pid}") for pid in existing]
    part_df = spark.read.option("basePath", parts_root).parquet(*paths)
    cmap = spark.read.parquet(os.path.join(index_root, "conv_parts"))
    postings = tokenize_turns(
        part_df.drop("partition_id"),
        ngrams=ngrams,
        min_distinct_terms=min_distinct_terms,
        analyzer=analyzer,
    ).join(F.broadcast(cmap), "conv_id")
    tmp_dir = os.path.join(post_root, "._tmp_wave")
    if os.path.isdir(tmp_dir):
        shutil.rmtree(tmp_dir)
    _dbg = os.environ.get("SPARK_GRAFT_PHASE_DEBUG")
    _tw = time.time()
    # the write job is PURE tokenize+write: conv ranges were computed
    # once at split time (the split owns partition boundaries), and the
    # count metrics ride the term-partials pass below — the old
    # CollectMetrics observation evaluated #wave x 5 conditional
    # aggregates per posting row inside the write job, a measured ~45%
    # overhead of the build wave at 16 cores
    postings.write.partitionBy("partition_id").mode("overwrite").parquet(tmp_dir)
    if _dbg:
        print(f"    wave write: {time.time()-_tw:.2f}s", flush=True)
        _tw = time.time()

    # per-partition PARTIAL term stats, aggregated while the wave's
    # postings are page-hot: finalize's dictionary agg then reads
    # ~|local vocab| x #partitions rows instead of every posting row —
    # the full-postings term scan was the measured critical path of
    # finalize at high core counts. Written wave-atomically and
    # promoted per-partition alongside postings/ (below); finalize
    # falls back to the raw postings agg whenever the partials set
    # does not exactly match the postings set (old roots, partial
    # promotes), so the artifact is an optimization, never a
    # correctness dependency. dh (doc-head count) rides along so the
    # manifest turn counts come from the same pass.
    partials_root = os.path.join(index_root, "term_partials")
    os.makedirs(partials_root, exist_ok=True)
    ptmp = os.path.join(partials_root, "._tmp_wave")
    if os.path.isdir(ptmp):
        shutil.rmtree(ptmp)
    (
        spark.read.parquet(tmp_dir)
        .groupBy("partition_id", "term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").cast("long").alias("ttf"),
            F.sum("is_doc_head").cast("long").alias("dh"),
        )
        # one file per partition dir: without this, every shuffle
        # partition writes a sliver into every hive dir (#shuffle x
        # #partitions tiny files) and the finalize-side read pays the
        # listing + per-task floor that this artifact exists to remove
        .repartition(len(existing), F.col("partition_id"))
        .write.partitionBy("partition_id")
        .mode("overwrite")
        .parquet(ptmp)
    )
    if _dbg:
        print(f"    wave term partials: {time.time()-_tw:.2f}s", flush=True)
        _tw = time.time()
    # manifest count metrics: a tiny rollup of the partials output
    # (conv-level ranges come from the split marker). postings = Σdf,
    # terms = Σttf, turns = Σdh — exact, same source of truth as the
    # dictionary itself.
    rollup = {
        int(r["partition_id"]): r
        for r in spark.read.parquet(ptmp)
        .groupBy("partition_id")
        .agg(
            F.sum("df").alias("postings"),
            F.sum("ttf").alias("terms"),
            F.sum("dh").alias("turns"),
        )
        .collect()
    }
    ranges = _conv_ranges(spark, index_root)
    stats = {
        pid: {
            "postings": rollup[pid]["postings"],
            "cmin": ranges.get(pid, ["", ""])[0],
            "cmax": ranges.get(pid, ["", ""])[1],
            "turns": rollup[pid]["turns"],
            "terms": rollup[pid]["terms"],
        }
        for pid in existing
        if pid in rollup and rollup[pid]["postings"]
    }
    wall = time.time() - t0
    for pid in existing:
        src = os.path.join(tmp_dir, f"partition_id={pid}")
        dst = os.path.join(post_root, f"partition_id={pid}")
        if pid not in stats:
            m = _empty_partition_manifest(snap, pid)
            _atomic_write_json(
                os.path.join(_manifest_dir(index_root), f"p{pid}.json"), asdict(m)
            )
            out.append(m)
            continue
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        os.replace(src, dst)
        psrc = os.path.join(ptmp, f"partition_id={pid}")
        pdst = os.path.join(partials_root, f"partition_id={pid}")
        if os.path.isdir(pdst):
            shutil.rmtree(pdst)
        if os.path.isdir(psrc):
            os.replace(psrc, pdst)
        agg = stats[pid]
        nbytes = _dir_bytes(dst)
        share = wall / max(1, len(existing))
        m = PartitionManifest(
            partition_id=pid,
            snapshot_id=snap,
            conv_id_min=str(agg["cmin"] or ""),
            conv_id_max=str(agg["cmax"] or ""),
            turns=int(agg["turns"] or 0),
            postings_written=int(agg["postings"] or 0),
            bytes_compressed=nbytes,
            wall_sec=share,
            terms_per_sec=float(agg["terms"] or 0.0) / share if share > 0 else 0.0,
            turns_per_sec=int(agg["turns"] or 0) / share if share > 0 else 0.0,
            status="done",
        )
        _atomic_write_json(
            os.path.join(_manifest_dir(index_root), f"p{pid}.json"), asdict(m)
        )
        out.append(m)
    if _dbg:
        print(f"    wave promote: {time.time()-_tw:.2f}s", flush=True)
    shutil.rmtree(tmp_dir, ignore_errors=True)
    shutil.rmtree(ptmp, ignore_errors=True)
    return out


def resumable_build(
    spark: SparkSession,
    transcripts: DataFrame,
    index_root: str,
    num_partitions: int = 64,
    ngrams: int = 1,
    analyzer: str = "reference",
    min_distinct_terms: int = 0,
    wave_size: int | None = None,
    max_concurrent_jobs: int | None = None,  # kept for API compat; unused
) -> BuildReport:
    """Build (or resume) the tokenize/postings phase under ``index_root``.

    Idempotent: rerunning after a kill skips every partition with a
    'done' manifest row; their outputs are untouched (asserted
    byte-identical in tests/test_resume.py). Missing partitions process
    in waves (default: 4 waves) — each wave is one Spark job over many
    input splits, so all cores stay busy regardless of partition count,
    and the per-partition commit protocol runs driver-side only at wave
    boundaries.
    """
    os.makedirs(index_root, exist_ok=True)
    os.makedirs(_manifest_dir(index_root), exist_ok=True)
    t0 = time.time()
    snap = _split_input(spark, transcripts, index_root, num_partitions)

    done = read_manifest(index_root)
    stale = [p for p, m in done.items() if m.snapshot_id != snap]
    if stale:
        raise ValueError(
            f"manifest rows for snapshot(s) != {snap} present: {stale}; "
            "use a fresh index_root"
        )

    # Tokenizer-params guard: the snapshot id covers the INPUT only, so
    # resuming the same root with different build params would otherwise
    # mix postings (and term partials) produced under two tokenizers —
    # the one staleness path input_snapshot_id cannot see.
    params = {
        "ngrams": ngrams,
        "analyzer": analyzer,
        "min_distinct_terms": min_distinct_terms,
    }
    pfile = os.path.join(_manifest_dir(index_root), "build_params.json")
    if os.path.exists(pfile):
        with open(pfile) as fh:
            prev = json.load(fh)
        if prev != params:
            raise ValueError(
                f"index_root {index_root} was built with params {prev}, "
                f"resume requested with {params}; use a fresh index_root"
            )
    else:
        _atomic_write_json(pfile, params)

    os.makedirs(os.path.join(index_root, "postings"), exist_ok=True)
    todo = [pid for pid in range(num_partitions) if pid not in done]
    skipped = num_partitions - len(todo)
    if wave_size is None:
        wave_size = max(1, (num_partitions + 3) // 4)

    built = turns_total = postings_total = 0
    for i in range(0, len(todo), wave_size):
        wave = todo[i : i + wave_size]
        for m in _build_wave(
            spark, index_root, snap, wave, num_partitions,
            ngrams, analyzer, min_distinct_terms,
        ):
            built += 1
            turns_total += m.turns
            postings_total += m.postings_written

    wall = time.time() - t0
    return BuildReport(
        snapshot_id=snap,
        partitions_total=num_partitions,
        partitions_built=built,
        partitions_skipped=skipped,
        turns_built=turns_total,
        postings_built=postings_total,
        wall_sec=wall,
        turns_per_sec=turns_total / wall if wall > 0 else 0.0,
    )


def load_postings(spark: SparkSession, index_root: str) -> DataFrame:
    return spark.read.parquet(os.path.join(index_root, "postings"))


def load_term_partials(
    spark: SparkSession, index_root: str
) -> DataFrame | None:
    """Build-time per-partition (term, df, ttf) partials, or None when
    they don't exactly cover the postings set (old roots, interrupted
    promotes) — callers must then aggregate from raw postings. Exact
    coverage check: the hive partition dirs under term_partials/ must
    equal those under postings/ (both are promoted per-partition by
    the same wave loop, postings first)."""
    proot = os.path.join(index_root, "term_partials")
    post = os.path.join(index_root, "postings")
    if not (os.path.isdir(proot) and os.path.isdir(post)):
        return None
    pp = {d for d in os.listdir(proot) if d.startswith("partition_id=")}
    qq = {d for d in os.listdir(post) if d.startswith("partition_id=")}
    if not pp or pp != qq:
        return None
    return spark.read.parquet(proot)


def term_partials_row_count(index_root: str) -> int:
    """Total term-partial rows (an upper bound on |vocabulary|), read
    from parquet FOOTER metadata driver-side — no Spark job. Lets
    finalize choose the single-job dictionary rank when the vocabulary
    is small without paying a count() barrier to find out."""
    import pyarrow.parquet as pq

    proot = os.path.join(index_root, "term_partials")
    n = 0
    for d in os.listdir(proot):
        if not d.startswith("partition_id="):
            continue
        for f in os.listdir(os.path.join(proot, d)):
            if f.endswith(".parquet"):
                n += pq.ParquetFile(
                    os.path.join(proot, d, f)
                ).metadata.num_rows
    return n


def finalize_lite(
    spark: SparkSession,
    index_root: str,
    scheme: str = "BM25",
    min_df: int = 1,
    max_df: int | None = None,
    write_docs: bool = True,
):
    """Metadata-only finalize for the direct postings→blocks path
    (blocks.encode_shards_from_postings): writes terms/, docs/, base/
    and stats.json but NO weights artifact — the posting stream is
    materialized exactly once (the tokenize output); weights are
    computed vectorized inside the shard encoder from (tf, doc_len,
    df, N, avgdl). Supports per-posting schemes (norm=0); per-doc
    norms use finalize_sharded + encode_shards instead.

    Returns (InvertedIndex, base DataFrame).
    """
    return _finalize_artifacts(
        spark, index_root, scheme=scheme, norm=0, min_df=min_df,
        max_df=max_df, write_docs=write_docs,
    )


def _finalize_artifacts(
    spark: SparkSession,
    index_root: str,
    scheme: str,
    norm: int,
    min_df: int = 1,
    max_df: int | None = None,
    write_docs: bool = True,
):
    """Fused finalize core shared by finalize_lite / finalize_sharded:
    computes the dictionary, doc lengths, conversation bases and corpus
    constants and writes terms/ base/ docs/ + stats.json.

    Scaling shape (this phase was the binding flat term of the pipeline
    at small core counts — fixed driver/job barriers, not data volume):
    - TWO composite chains run as concurrent driver-thread jobs, each
      ENDING IN ITS OWN ARTIFACT WRITES, so no write waits on an
      unrelated chain's barrier: [dictionary agg → dense ids → terms/]
      ∥ [doc_lens → conv base cumsum + corpus stats → base/ ∥ docs/].
    - corpus stats ride the conversation-level aggregate
      (conv_doc_base_with_stats) instead of a second full doc_lens
      pass.
    - no separate base.count pin: two_phase_cumsum's eager
      localCheckpoint already froze the range boundaries.

    Returns (InvertedIndex, base DataFrame).
    """
    from .build import InvertedIndex
    from .dictionary import (
        assign_doc_ids,
        build_dictionary,
        conv_doc_base,
        conv_doc_base_with_stats_ranged,
        term_stats_from_partials,
    )
    from .weights import set_feature_values

    pruning = min_df > 1 or max_df is not None
    if pruning:
        # rare path: the doc projection depends on the pruned
        # dictionary, so the chains are sequential by data dependency
        idx = finalize_index(
            spark, index_root, scheme=scheme, norm=norm,
            min_df=min_df, max_df=max_df,
        )
        base = conv_doc_base(idx.doc_lens).cache()
        base.count()
        docs = assign_doc_ids(idx.doc_lens, base=base)
        _parallel_jobs(
            lambda: idx.terms.write.mode("overwrite").parquet(
                os.path.join(index_root, "terms")
            ),
            lambda: base.write.mode("overwrite").parquet(
                os.path.join(index_root, "base")
            ),
            lambda: docs.write.mode("overwrite").parquet(
                os.path.join(index_root, "docs")
            ),
        )
        return idx, base

    # raw postings deliberately NOT cached — page-cached parquet
    # re-reads are cheaper than JVM cache materialization (measured)
    raw_p = load_postings(spark, index_root)
    raw = raw_p.drop("partition_id")
    # doc_lens KEEPS partition_id: the build's conv-range partitioning
    # (conv_partition_map: contiguous conv ranges ascending in
    # partition_id) lets the base cumsum run shuffle-sample-free and
    # checkpoint-free (conv_doc_base_with_stats_ranged)
    doc_lens = raw_p.filter(F.col("is_doc_head") == 1).select(
        "partition_id", "conv_id", "turn_idx", "doc_len"
    )
    if write_docs:
        # two consumers (conv aggregate + the docs export join) — pin it;
        # with write_docs=False the conv aggregate is the only consumer
        # (and it is itself cached inside conv_doc_base_with_stats), so
        # the cache materialization pass would be pure overhead
        doc_lens = doc_lens.cache()
    box: dict = {}

    # build-time per-partition term partials (when complete) replace
    # the full-postings dictionary aggregation — the measured critical
    # path of finalize at high core counts; identical (term, df, ttf)
    # values by the partial+final aggregation identity
    partials = load_term_partials(spark, index_root)
    pre_stats = (
        term_stats_from_partials(partials) if partials is not None else None
    )
    # single-job rank whenever the vocabulary provably fits one task
    # (footer row count is an upper bound on |vocab|, read without a
    # Spark job). On this harness every Spark job pays a fixed
    # ~0.3-0.5s scheduling latency, so the 4-job distributed rank only
    # earns its barriers for vocabularies that genuinely need it.
    small = (
        pre_stats is not None
        and term_partials_row_count(index_root) <= 8_000_000
    )

    def terms_chain():
        # the write IS the materializing action (and populates the
        # cache); a count() first would be one more barrier + pass
        t = build_dictionary(
            raw, min_df=min_df, max_df=max_df, stats=pre_stats,
            small_rank=small,
        ).cache()
        t.write.mode("overwrite").parquet(os.path.join(index_root, "terms"))
        box["terms"] = t

    def docs_chain():
        base, n_docs, avg_doc_len, release = conv_doc_base_with_stats_ranged(
            doc_lens
        )
        box["base"] = base
        box["stats"] = (n_docs, avg_doc_len)
        writes = [
            lambda: base.write.mode("overwrite").parquet(
                os.path.join(index_root, "base")
            )
        ]
        if write_docs:
            # the turn-level docs export is a CONVENIENCE table: the
            # queryable index needs only terms/ base/ stats + blocks
            # (doc_id = base[conv] + turn_idx by construction, labels
            # resolve from base/ in-kernel). At 10^12 turns callers
            # skip this redundant full-corpus write.
            docs = assign_doc_ids(
                doc_lens.drop("partition_id"), base=base
            )
            writes.append(
                lambda: docs.write.mode("overwrite").parquet(
                    os.path.join(index_root, "docs")
                )
            )
        _parallel_jobs(*writes)
        release()

    _parallel_jobs(terms_chain, docs_chain)
    n_docs, avg_doc_len = box["stats"]
    _atomic_write_json(
        os.path.join(index_root, "stats.json"),
        {"n_docs": n_docs, "avg_doc_len": avg_doc_len,
         "scheme": scheme, "norm": norm},
    )
    terms = box["terms"]
    weights = set_feature_values(
        raw, terms, n_docs, avg_doc_len, scheme=scheme, norm=norm
    )
    idx = InvertedIndex(
        terms=terms, weights=weights,
        doc_lens=doc_lens.drop("partition_id"),
        n_docs=n_docs, avg_doc_len=avg_doc_len,
        ngrams=1, scheme=scheme, norm=norm,
    )
    return idx, box["base"]


def _parallel_jobs(*thunks) -> None:
    """Run independent Spark actions concurrently from driver threads
    (supported: one SparkSession, many jobs; the scheduler interleaves
    their tasks so no job's barrier leaves cores idle). Re-raises the
    first failure."""
    import threading

    errors: list[BaseException] = []

    def runner(fn):
        try:
            fn()
        except BaseException as e:  # noqa: BLE001 - reraised below
            errors.append(e)

    threads = [threading.Thread(target=runner, args=(t,)) for t in thunks]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    if errors:
        raise errors[0]


def finalize_sharded(
    spark: SparkSession,
    index_root: str,
    scheme: str = "BM25",
    norm: int = 0,
    min_df: int = 1,
    max_df: int | None = None,
):
    """finalize_index + persisted shard-aligned artifacts.

    Writes under ``index_root``:
      terms/    (term, term_id, df, ttf)
      docs/     (conv_id, turn_idx, doc_len, doc_id)
      weights/partition_id=<p>/  (term_id, doc_id, weight)

    The weights write is SHUFFLE-FREE: postings are read from their
    doc-shard partition files, every derivation (dictionary join, doc-id
    base, shard id) is a broadcast hash join or column arithmetic, and
    partitionBy(partition_id) just routes each task's rows back to its
    own shard directory. This is the doc-sharded build phase of SURVEY
    §7.1 taken to its limit: the ONLY turn-level shuffle in the whole
    index pipeline is gone; what remains keyed-by-term is the (small,
    pre-aggregated) dictionary statistics aggregation.

    Returns (InvertedIndex, conv-base DataFrame).
    """
    # terms/ base/ docs/ + stats.json via the fused concurrent-chain
    # core (base/ is the conversation sidecar the query path labels doc
    # ids from in-kernel); only the weights artifact is sharded-specific
    idx, base = _finalize_artifacts(
        spark, index_root, scheme=scheme, norm=norm,
        min_df=min_df, max_df=max_df,
    )
    cmap = spark.read.parquet(os.path.join(index_root, "conv_parts"))

    w = (
        idx.weights.join(F.broadcast(base), "conv_id")
        .join(F.broadcast(cmap), "conv_id")
        .select(
            "partition_id",
            "term_id",
            (F.col("base") + F.col("turn_idx")).cast("long").alias("doc_id"),
            "weight",
        )
    )
    # partition-LOCAL Tungsten sort (no shuffle): the block encoder wants
    # (term_id, doc_id) order, and sorting here (JVM, scales with tasks)
    # beats a numpy lexsort in every encode kernel (memory-bus-contended
    # when many kernels run); sorted term_id also RLEs well in parquet.
    # One READ TASK per postings file for this job: the default 128MB
    # split would break a shard across two tasks → two sorted-but-
    # overlapping weights files → the encoder's presort fast path can't
    # engage. (At cluster scale: write the weights as one file per
    # shard via the table format's file-size target instead.)
    w = w.sortWithinPartitions("partition_id", "term_id", "doc_id")
    conf = spark.conf
    prev = conf.get("spark.sql.files.maxPartitionBytes")
    conf.set("spark.sql.files.maxPartitionBytes", str(4 << 30))
    try:
        w.write.partitionBy("partition_id").mode("overwrite").parquet(
            os.path.join(index_root, "weights")
        )
    finally:
        conf.set("spark.sql.files.maxPartitionBytes", prev)
    return idx, base


def finalize_index(
    spark: SparkSession,
    index_root: str,
    scheme: str = "BM25",
    norm: int = 0,
    min_df: int = 1,
    max_df: int | None = None,
):
    """Derived phase: dictionary + corpus stats + weighted postings from
    the checkpointed raw postings (cheap relative to tokenize; reruns
    wholesale on resume). Returns an InvertedIndex and pins stats.json.
    """
    from .build import InvertedIndex
    from .dictionary import build_dictionary, corpus_stats
    from .weights import set_feature_values

    # raw postings feed three consumers (dictionary agg, doc lengths,
    # weighting join); deliberately NOT cached — page-cached parquet
    # re-reads are cheaper and scale better than JVM cache
    # materialization (measured: ~25% faster at 8 and 32 cores)
    raw = load_postings(spark, index_root).drop("partition_id")
    pruning = min_df > 1 or max_df is not None
    if not pruning:
        # dictionary aggregation and the doc-length/corpus-stat chain
        # are independent subgraphs — materialize them as CONCURRENT
        # Spark jobs so neither chain's driver barriers idle the cores
        terms = build_dictionary(raw, min_df=min_df, max_df=max_df).cache()
        doc_lens = (
            raw.filter(F.col("is_doc_head") == 1)
            .select("conv_id", "turn_idx", "doc_len")
            .cache()
        )
        stats_box: dict = {}

        def _stats():
            stats_box["ns"] = corpus_stats(doc_lens)

        _parallel_jobs(terms.count, _stats)
        n_docs, avg_doc_len = stats_box["ns"]
        _atomic_write_json(
            os.path.join(index_root, "stats.json"),
            {"n_docs": n_docs, "avg_doc_len": avg_doc_len,
             "scheme": scheme, "norm": norm},
        )
        weights = set_feature_values(
            raw, terms, n_docs, avg_doc_len, scheme=scheme, norm=norm
        )
        return InvertedIndex(
            terms=terms, weights=weights, doc_lens=doc_lens,
            n_docs=n_docs, avg_doc_len=avg_doc_len,
            ngrams=1, scheme=scheme, norm=norm,
        )
    # pruning path: the doc projection depends on the pruned dictionary,
    # so the chains are sequential by data dependency
    terms = build_dictionary(raw, min_df=min_df, max_df=max_df).cache()
    # re-project doc vectors onto the pruned dictionary: doc_len,
    # n_docs and avg_doc_len must reflect retained terms only —
    # identical semantics to build_index's pruning branch (the
    # reference's pass-2 with frozen CV, SURVEY §3.2)
    kept = raw.drop("doc_len").join(
        F.broadcast(terms.select("term")), "term", "left_semi"
    )
    doc_lens = kept.groupBy("conv_id", "turn_idx").agg(
        F.sum("tf").alias("doc_len")
    ).cache()
    raw = kept.join(doc_lens, ["conv_id", "turn_idx"])
    n_docs, avg_doc_len = corpus_stats(doc_lens)
    _atomic_write_json(
        os.path.join(index_root, "stats.json"),
        {"n_docs": n_docs, "avg_doc_len": avg_doc_len, "scheme": scheme, "norm": norm},
    )
    weights = set_feature_values(raw, terms, n_docs, avg_doc_len, scheme=scheme, norm=norm)
    return InvertedIndex(
        terms=terms, weights=weights, doc_lens=doc_lens,
        n_docs=n_docs, avg_doc_len=avg_doc_len,
        ngrams=1, scheme=scheme, norm=norm,
    )
