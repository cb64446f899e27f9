"""Multimodal stage tests: synthetic media table, decode/feature/resize/
frame-sample stages (codec boundary stubbed, Ray plumbing real)."""

import pyarrow as pa
import pytest

from html_parser_ray.stages.multimodal import (
    AudioFeatureStage, ImageFeatureStage, ImageResizeStage,
    VideoFrameSampleStage, MEDIA_SCHEMA, make_audio_payload,
    make_image_payload, make_video_payload, media_pool, media_table,
    _decode_image,
)


def test_media_table_schema_and_determinism():
    t1 = media_table(30)
    t2 = media_table(30)
    assert t1.schema == MEDIA_SCHEMA
    assert t1.equals(t2)
    assert set(t1.column("kind").to_pylist()) == {"image", "audio", "video"}


def test_image_features_batch():
    tbl = media_table(30).filter(
        pa.compute.equal(pa.compute.field("kind"), "image"))
    out = ImageFeatureStage()(tbl)
    assert out.num_rows == tbl.num_rows
    assert set(out.column("status").to_pylist()) == {"ok"}
    for mid, w, h in zip(out.column("media_id").to_pylist(),
                         out.column("width").to_pylist(),
                         out.column("height").to_pylist()):
        assert w == 16 + (mid * 7) % 48
        assert h == 16 + (mid * 13) % 48
    lumas = out.column("mean_luma_bp").to_pylist()
    assert all(0 <= v <= 10_000 for v in lumas)


def test_image_features_determinism_and_phash_stability():
    tbl = media_table(9).filter(
        pa.compute.equal(pa.compute.field("kind"), "image"))
    out1 = ImageFeatureStage()(tbl)
    out2 = ImageFeatureStage()(tbl)
    assert out1.equals(out2)


def test_image_resize_roundtrip():
    tbl = media_table(9).filter(
        pa.compute.equal(pa.compute.field("kind"), "image"))
    out = ImageResizeStage(target_width=8, target_height=8)(tbl)
    assert set(out.column("status").to_pylist()) == {"ok"}
    for payload in out.column("payload").to_pylist():
        w, h, c, arr = _decode_image(payload)
        assert (w, h) == (8, 8) and arr.shape == (8, 8, c)


def test_unknown_codec_quarantined_not_raised():
    tbl = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "kind": pa.array(["image"], pa.string()),
        "payload": pa.array([b"\x89PNG\r\n\x1a\nnotreally"], pa.binary()),
        "source_url": pa.array(["x"], pa.string()),
    })
    out = ImageFeatureStage()(tbl)
    assert out.column("status").to_pylist() == ["codec_unavailable"]


def test_audio_features_batch():
    tbl = media_table(30).filter(
        pa.compute.equal(pa.compute.field("kind"), "audio"))
    out = AudioFeatureStage()(tbl)
    assert set(out.column("status").to_pylist()) == {"ok"}
    for mid, n in zip(out.column("media_id").to_pylist(),
                      out.column("n_samples").to_pylist()):
        assert n == 1024 + (mid * 31) % 2048
    assert all(v > 0 for v in out.column("rms_bp").to_pylist())


def test_video_frame_sample_explodes():
    tbl = media_table(30).filter(
        pa.compute.equal(pa.compute.field("kind"), "video"))
    out = VideoFrameSampleStage(stride=4)(tbl)
    by_id: dict[int, list[int]] = {}
    for mid, idx in zip(out.column("media_id").to_pylist(),
                        out.column("frame_index").to_pylist()):
        by_id.setdefault(mid, []).append(idx)
    for mid, idxs in by_id.items():
        n_frames = 8 + (mid * 3) % 24
        assert idxs == list(range(0, n_frames, 4))
    for payload in out.column("frame_payload").to_pylist():
        w, h, c, arr = _decode_image(payload)  # frames are FAKEIMG1
        assert (w, h, c) == (32, 24, 1)


def test_media_pool_dataset(ray_session):
    import ray
    tbl = media_table(60).filter(
        pa.compute.equal(pa.compute.field("kind"), "image"))
    ds = ray.data.from_arrow(tbl)
    out = pa.Table.from_pylist(
        media_pool(ds, ImageFeatureStage, batch_size=8).take_all())
    assert out.num_rows == tbl.num_rows
    assert set(out.column("status").to_pylist()) == {"ok"}
