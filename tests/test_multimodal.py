from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deduplicate_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    frame_sample_plan,
    image_features,
    media_exact_dup_clusters,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("m1", "image", bytes(range(256)) * 8, ("image/png", 16, 16, None)),
        ("m2", "image", bytes(range(256)) * 8, ("image/png", 16, 16, None)),  # dup of m1
        ("m3", "image", bytes(reversed(range(256))) * 4, ("image/png", 8, 8, None)),
        ("v1", "video", b"\x00" * 64, ("video/mp4", 640, 480, 3500)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).cache()


def test_image_features_shape(media):
    feats = image_features(media.filter(F.col("kind") == "image"), feat_dim=8).collect()
    assert len(feats) == 3
    for r in feats:
        assert len(r["feat"]) == 8
        assert r["n_bytes"] > 0


def test_image_features_deterministic_for_same_bytes(media):
    feats = {
        r["media_id"]: r["feat"]
        for r in image_features(media.filter(F.col("kind") == "image")).collect()
    }
    assert feats["m1"] == feats["m2"]
    assert feats["m1"] != feats["m3"]


def test_media_exact_dup_clusters(media):
    rows = media_exact_dup_clusters(media).collect()
    got = sorted((r["media_id"], r["cluster_id"]) for r in rows)
    assert got == [("m1", "m1"), ("m2", "m1")]


def test_frame_sample_plan(media):
    frames = frame_sample_plan(media, every_ms=1000).collect()
    ts = sorted(r["frame_ts_ms"] for r in frames)
    assert ts == [0, 1000, 2000, 3000]


def test_payload_sha_stable_across_runs(media):
    """VERDICT r3 #4: the payload fingerprint must be a stable digest, not
    builtin hash() (randomized per process via PYTHONHASHSEED) — identical
    payloads must produce identical payload_sha on every executor and run."""
    import hashlib

    run = lambda: {  # noqa: E731
        r["media_id"]: r["payload_sha"]
        for r in image_features(media.filter(F.col("kind") == "image")).collect()
    }
    first, second = run(), run()
    assert first == second
    assert first["m1"] == first["m2"]  # same bytes -> same digest
    expected = int.from_bytes(
        hashlib.blake2b(bytes(range(256)) * 8, digest_size=8).digest(), "big"
    )
    assert first["m1"] == expected - (1 << 64) * (expected >= 1 << 63)


def test_media_dup_clusters_skew_safe_plan(media):
    plan = (
        media_exact_dup_clusters(media, salt_buckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "BroadcastHashJoin" not in plan


def test_image_resize_plumbing(media):
    from deduplicate_spark.functions.multimodal import image_resize

    out = {
        r["media_id"]: r
        for r in image_resize(
            media.filter(F.col("kind") == "image"), width=4, height=4
        ).collect()
    }
    assert set(out) == {"m1", "m2", "m3"}
    for r in out.values():
        assert (r["width"], r["height"]) == (4, 4)
        assert len(r["payload"]) == 16  # 4x4 uint8
    # identical input bytes -> identical resized bytes (dedup-after-resize)
    assert bytes(out["m1"]["payload"]) == bytes(out["m2"]["payload"])
    assert bytes(out["m1"]["payload"]) != bytes(out["m3"]["payload"])
