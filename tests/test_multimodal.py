"""Multimodal plumbing: real schema/batch-shape/partitioning, stubbed codecs."""

from __future__ import annotations

import pytest

from datafusion_distributed_experiment_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (i, "image" if i % 3 else "video", bytes([i % 256] * (10 + i)), (64, 48, None, 3000 if i % 3 == 0 else None))
        for i in range(40)
    ]
    return spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA).repartition(4)


def test_extract_features_schema_and_determinism(media):
    out = mm.extract_features(media)
    assert out.schema == mm.FEATURES_SCHEMA
    a = {r.media_id: r.feature for r in out.collect()}
    b = {r.media_id: r.feature for r in out.collect()}
    assert a == b  # deterministic across runs
    assert len(a) == 40
    assert all(len(f) == mm.FEATURE_DIM for f in a.values())


def test_extract_features_preserves_partitioning(media):
    assert mm.extract_features(media).rdd.getNumPartitions() == 4  # map-only


def test_resize_rewrites_meta(media):
    out = mm.resize_images(media, 224, 224).collect()
    assert all(r.meta.width == 224 and r.meta.height == 224 for r in out)
    assert len(out) == 40


def test_sample_frames_fans_out(media):
    frames = mm.sample_frames(media, every_ms=1000)
    n_videos = media.filter("modality = 'video'").count()
    assert frames.count() == n_videos * 3  # 3000ms / 1000ms
    assert frames.schema == mm.MEDIA_SCHEMA


def test_injected_decoder_reaches_executors(media):
    """The real-codec escape hatch end-to-end: a custom decoder installed via
    set_decoder must be serialized into the pandas UDF and produce the
    features on executors (a deployment with PIL/ffmpeg plugs in exactly
    like this fake)."""

    def length_embed(content):
        n = float(len(content)) if content is not None else -1.0
        return [n] * mm.FEATURE_DIM

    prev = mm.set_decoder(length_embed)
    try:
        out = {r.media_id: r.feature for r in mm.extract_features(media).collect()}
    finally:
        mm.set_decoder(prev)
    assert out[0] == [10.0] * mm.FEATURE_DIM  # row 0 content is 10 bytes
    assert all(f == [float(10 + i)] * mm.FEATURE_DIM for i, f in out.items())
    # and the hook is cleanly restored: default path is the fake again
    restored = {r.media_id: r.feature for r in mm.extract_features(media).collect()}
    assert restored[0] == mm.fake_embed(bytes([0] * 10))


def test_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG...")


def test_decode_branches_on_codec_availability(monkeypatch):
    """Both arms of the codec escape hatch: without a codec the error points
    at the fake_embed fallback; with one (simulated — the container has no
    PIL) the real-decode arm is reached instead of the fallback message."""
    monkeypatch.setattr(mm, "_codec_available", lambda: False)
    with pytest.raises(NotImplementedError, match="fake_embed"):
        mm.decode_image(b"x")
    monkeypatch.setattr(mm, "_codec_available", lambda: True)
    with pytest.raises(NotImplementedError, match="intentionally unimplemented"):
        mm.decode_image(b"x")


def test_read_media_files_ingests_binary_dir(spark, tmp_path):
    """binaryFile ingestion: extension->modality mapping, stable path-hash
    ids, payload fidelity, and a metadata-only projection that never loads
    content. Feeds straight into the feature/dedup stages."""
    payloads = {
        "a.jpg": b"\xff\xd8fakejpeg",
        "b.JPG": b"\xff\xd8fakejpeg2",  # extension case-insensitive
        "c.wav": b"RIFFfakewav",
        "d.mp4": b"\x00\x00fakemp4",
        "e.bin": b"stray",  # unknown extension survives as 'unknown'
    }
    for name, blob in payloads.items():
        (tmp_path / name).write_bytes(blob)

    media = mm.read_media_files(spark, str(tmp_path))
    rows = {r.path.rsplit("/", 1)[-1]: r for r in media.collect()}
    assert set(rows) == set(payloads)
    assert rows["a.jpg"].modality == "image"
    assert rows["b.JPG"].modality == "image"
    assert rows["c.wav"].modality == "audio"
    assert rows["d.mp4"].modality == "video"
    assert rows["e.bin"].modality == "unknown"
    assert all(bytes(rows[n].content) == payloads[n] for n in payloads)
    assert all(r.n_bytes == len(payloads[n]) for n, r in rows.items())
    # ids are distinct and stable across a re-read (path-hash, not zipWithIndex)
    again = {r.path.rsplit("/", 1)[-1]: r.media_id for r in mm.read_media_files(spark, str(tmp_path)).collect()}
    assert len(set(again.values())) == len(payloads)
    assert all(rows[n].media_id == again[n] for n in payloads)

    # glob narrows the listing; downstream feature extraction runs unchanged
    imgs = mm.read_media_files(spark, str(tmp_path), glob="*.jpg")
    feats = mm.extract_features(imgs.select("media_id", "modality", "content")).collect()
    assert len(feats) == 1 and len(feats[0].feature) == mm.FEATURE_DIM
