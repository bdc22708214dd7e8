"""Multimodal binary columns: schema, decode plumbing, features, resize."""

import pytest

from paperslicer_spark.operators.multimodal import (
    decode_fake_image,
    encode_fake_image,
    extract_features,
    resize_assets,
    synth_assets,
)


def test_fake_codec_roundtrip():
    payload = encode_fake_image(7, 64, 32, "jpeg")
    w, h, fmt, px = decode_fake_image(payload)
    assert (w, h, fmt) == (64, 32, "jpeg")
    assert px.size == 64 * 32
    # determinism
    assert payload == encode_fake_image(7, 64, 32, "jpeg")


def test_strict_decode_raises():
    with pytest.raises(NotImplementedError):
        decode_fake_image(b"\x89PNG not really", strict=True)
    assert decode_fake_image(b"\x89PNG not really") is None


def test_assets_schema_and_features(spark):
    assets = synth_assets(spark, 24, seed=42).cache()
    rows = assets.collect()
    assert len(rows) == 24
    r = rows[0]
    assert isinstance(r["payload"], (bytes, bytearray))
    assert r["meta"]["n_bytes"] == len(r["payload"])
    assert r["meta"]["width"] * r["meta"]["height"] + 12 == len(r["payload"])

    feats = extract_features(assets, n_bins=8).collect()
    assert len(feats) == 24
    for f in feats:
        assert len(f["features"]) == 8
        assert abs(sum(f["features"]) - 1.0) < 1e-5  # normalized histogram

    small = resize_assets(assets, max_side=16).collect()
    assert len(small) == 24
    for s in small:
        assert max(s["meta"]["width"], s["meta"]["height"]) <= 16
        w, h, _, px = decode_fake_image(bytes(s["payload"]))
        assert px.size == w * h
    assets.unpersist()


def test_generation_is_deterministic(spark):
    a = {r["asset_id"]: bytes(r["payload"])
         for r in synth_assets(spark, 8, seed=42).collect()}
    b = {r["asset_id"]: bytes(r["payload"])
         for r in synth_assets(spark, 8, seed=42, partitions=3).collect()}
    assert a == b
