"""Multimodal columns: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with a ``kind`` tag and a
``map<string,string>`` metadata column. The Spark-side plumbing (schema,
Arrow batch shape, partitioning) is real and tested; the actual
image/audio decode is STUBBED — the decode libraries are not in this
container — behind ``decoder="fake"`` (deterministic bytes-derived
features) vs ``decoder="real"`` (raises NotImplementedError at the first
batch, marking exactly where PIL/ffmpeg/torchaudio would plug in).

All UDFs are Arrow-batched ``mapInPandas`` — one Python round trip per
batch of assets, never per row; payload bytes stream through Arrow
buffers without per-row pickling.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_DDL = (
    "asset_id long, kind string, payload binary, meta map<string,string>"
)

FEATURE_DIM = 16


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a decode→embed pipeline: features are a
    seeded hash expansion of the payload (stable across workers)."""
    h = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(h[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32).tolist()


def featurize_assets(
    assets: DataFrame, decoder: str = "fake", batch_note: str = ""
) -> DataFrame:
    """assets(ASSET_DDL) → (asset_id, kind, n_bytes, sha1, features).

    Real decode point: replace the ``decoder == "fake"`` branch with the
    modality library call; everything else (schema, batching, plan
    shape) is production-shaped.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "image/audio decode libraries are not available in "
                    "this environment; plug PIL/ffmpeg here"
                )
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in payloads],
                    "sha1": [hashlib.sha1(p).hexdigest() for p in payloads],
                    "features": [_fake_features(p) for p in payloads],
                }
            )

    return assets.mapInPandas(
        run,
        schema=(
            "asset_id long, kind string, n_bytes long, sha1 string, "
            f"features array<float>"
        ),
    )


def frame_sample(
    assets: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """Video-ish frame sampling stub: slices the payload every N bytes
    (the plumbing for keyframe extraction). Output one row per frame —
    the UDTF/explode shape a real frame sampler needs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"asset_id": [], "frame_idx": [], "frame": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                p = bytes(payload) if payload is not None else b""
                for i in range(min(max_frames, max(1, len(p) // every_n_bytes))):
                    rows["asset_id"].append(int(aid))
                    rows["frame_idx"].append(i)
                    rows["frame"].append(p[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame(rows)

    return assets.filter(F.col("kind") == "video").mapInPandas(
        run, schema="asset_id long, frame_idx int, frame binary"
    )
