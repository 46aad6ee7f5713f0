"""Multimodal plumbing stubs + ranking evaluators."""

from __future__ import annotations

import pytest

from ir_base_spark.evaluate import mean_average_precision, ndcg_at_k
from ir_base_spark.ops.multimodal import (
    ASSET_DDL,
    FEATURE_DIM,
    featurize_assets,
    frame_sample,
)


def _assets_df(spark):
    rows = [
        (1, "image", b"\x89PNG" + b"x" * 5000, {"w": "640", "h": "480"}),
        (2, "audio", b"RIFF" + b"y" * 3000, {"sr": "16000"}),
        (3, "video", b"\x00\x00ftyp" + b"z" * 9000, {"fps": "30"}),
        (4, "image", None, {}),
    ]
    return spark.createDataFrame(rows, schema=ASSET_DDL)


def test_featurize_fake_deterministic(spark):
    df = _assets_df(spark)
    out1 = {r["asset_id"]: r for r in featurize_assets(df).collect()}
    out2 = {r["asset_id"]: r for r in featurize_assets(df).collect()}
    assert set(out1) == {1, 2, 3, 4}
    for aid in out1:
        assert len(out1[aid]["features"]) == FEATURE_DIM
        assert out1[aid]["features"] == out2[aid]["features"]  # deterministic
        assert out1[aid]["sha1"] == out2[aid]["sha1"]
    assert out1[4]["n_bytes"] == 0


def test_featurize_real_decoder_is_stubbed(spark):
    df = _assets_df(spark)
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        featurize_assets(df, decoder="real").collect()


def test_frame_sample_shapes(spark):
    df = _assets_df(spark)
    frames = frame_sample(df, every_n_bytes=1024, max_frames=4).collect()
    assert {r["asset_id"] for r in frames} == {3}  # only video assets
    assert [r["frame_idx"] for r in sorted(frames, key=lambda r: r["frame_idx"])] == [
        0, 1, 2, 3,
    ]
    assert all(len(r["frame"]) == 1024 for r in frames)


def test_map_evaluator(spark):
    # query A: rel at ranks 1,3 -> AP = (1/1 + 2/3)/2 = 5/6
    # query B: rel at rank 2    -> AP = 1/2
    rows = [
        ("A", 1, 1), ("A", 2, 0), ("A", 3, 1),
        ("B", 1, 0), ("B", 2, 1), ("B", 3, 0),
    ]
    df = spark.createDataFrame(rows, "query_id string, rank int, label int")
    got = mean_average_precision(df)
    assert abs(got - ((5 / 6) + 0.5) / 2) < 1e-12


def test_ndcg_evaluator(spark):
    # perfect ranking -> ndcg 1; reversed graded ranking < 1
    rows = [("A", 1, 3), ("A", 2, 2), ("A", 3, 0), ("B", 1, 0), ("B", 2, 3)]
    df = spark.createDataFrame(rows, "query_id string, rank int, label int")
    got = {r["query_id"]: r["ndcg"] for r in ndcg_at_k(df, k=10).collect()}
    assert abs(got["A"] - 1.0) < 1e-12
    import math

    dcg_b = (2**0 - 1) / math.log(2) + (2**3 - 1) / math.log(3)
    idcg_b = (2**3 - 1) / math.log(2) + (2**0 - 1) / math.log(3)
    assert abs(got["B"] - dcg_b / idcg_b) < 1e-12


def test_decode_headers_real_formats():
    """Header parse of genuine container bytes, including robustness on
    truncated/garbage payloads."""
    from ir_base_spark.ops.multimodal import decode_headers, make_asset_fixture

    for i, kind, payload, _meta in make_asset_fixture(24):
        r = decode_headers(payload)
        m = i % 4
        if m == 0:
            assert (r["format"], r["width"], r["height"], r["channels"]) == (
                "png", 64 + i, 32 + 2 * i, 4
            )
        elif m == 1:
            assert (r["format"], r["width"], r["height"], r["channels"]) == (
                "jpeg", 100 + i, 50 + i, 3
            )
        elif m == 2:
            assert (r["format"], r["channels"], r["sample_rate"]) == (
                "wav", 1 + (i % 2), 8000 + 1000 * i
            )
            assert r["duration_ms"] == 250 * (i % 3 + 1)
        else:
            assert (r["format"], r["width"], r["height"]) == (
                "gif", 30 + i, 20 + i
            )
    # robustness: unknown magic, empty, truncated PNG header
    for junk in (b"", b"not-a-container", b"\x89PNG\r\n\x1a\nIH"):
        assert decode_headers(junk)["format"] == "unknown"


def test_asset_header_features_spark(spark):
    from ir_base_spark.ops.multimodal import (
        asset_header_features,
        make_asset_fixture,
    )

    df = spark.createDataFrame(make_asset_fixture(8), schema=ASSET_DDL)
    rows = {r["asset_id"]: r for r in asset_header_features(df).collect()}
    assert len(rows) == 8
    assert rows[0]["format"] == "png" and rows[0]["width"] == 64
    assert rows[2]["format"] == "wav" and rows[2]["duration_ms"] == 750
    assert rows[3]["format"] == "gif" and rows[3]["height"] == 23
