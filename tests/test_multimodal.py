"""Multimodal column plumbing: binary payloads through mapInPandas
stages — schema, batching, row expansion, and decoder pluggability."""

from __future__ import annotations

import numpy as np
import pytest

from market_analyze_data_stream_processing_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    encode_fake_image,
    encode_fake_video,
    extract_features,
    media_embedding,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", bytearray(encode_fake_image(8, 6, seed=1)), 8, 6, 1, None, "synm"),
        (2, "image", bytearray(encode_fake_image(16, 16, seed=2)), 16, 16, 1, None, "synm"),
        (3, "video", bytearray(encode_fake_video(8, 8, 6, seed=3)), 8, 8, 6, None, "synm"),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(2)


def test_extract_features_shapes_and_determinism(media):
    out = extract_features(media).collect()
    by_id = {r["media_id"]: r for r in out}
    assert set(by_id) == {1, 2, 3}
    assert by_id[3]["n_frames"] == 6 and by_id[1]["n_frames"] == 1
    for r in out:
        assert len(r["histogram"]) == 16
        assert abs(sum(r["histogram"]) - 1.0) < 1e-5  # normalized density
        assert 0.0 <= r["mean_intensity"] <= 255.0
    # deterministic across runs
    again = {r["media_id"]: r for r in extract_features(media).collect()}
    assert again[1]["mean_intensity"] == by_id[1]["mean_intensity"]


def test_resize_round_trips_through_container(media, spark):
    resized = resize_images(media.where("kind = 'image'"), 4, 4)
    rows = resized.collect()
    assert all((r["width"], r["height"]) == (4, 4) for r in rows)
    # resized payload decodes again through the same stage chain
    refeat = extract_features(
        spark.createDataFrame(
            [(r["media_id"], "image", bytearray(r["payload"]), 4, 4, 1, None, "synm") for r in rows],
            MEDIA_SCHEMA,
        )
    ).collect()
    assert {r["media_id"] for r in refeat} == {1, 2}


def test_sample_frames_expands_rows(media):
    out = sample_frames(media.where("kind = 'video'"), every_n=2).collect()
    assert sorted(r["frame_idx"] for r in out) == [0, 2, 4]
    assert all(len(r["frame"]) == 8 * 8 for r in out)


def test_media_embedding_contract(media):
    out = media_embedding(media, dim=32).collect()
    assert {r["media_id"] for r in out} == {1, 2, 3}
    for r in out:
        assert len(r["embedding"]) == 32
        assert abs(sum(x * x for x in r["embedding"]) - 1.0) < 1e-3


def test_real_decoder_rejects_unknown_container(media):
    """decoder='real' on the synthetic container must fail loudly,
    naming the missing dependency — not mis-decode."""
    with pytest.raises(Exception) as ei:
        extract_features(media, decoder="real").collect()
    assert "NotImplementedError" in str(ei.value) or "PyAV" in str(ei.value)


def test_real_decoder_decodes_wav_audio(spark):
    """The real-codec path is EXECUTED in this container for audio:
    stdlib-wave 16-bit PCM WAV payloads flow through the same
    extract_features stage as synthetic media, and the intensity stats
    match a direct numpy computation on the (s >> 8) + 128 u8 mapping."""
    from market_analyze_data_stream_processing_spark.operators.multimodal import (
        encode_wav,
    )

    rng = np.random.default_rng(7)
    clips = {
        10: (rng.integers(-32768, 32767, size=400)).astype(np.int16),
        11: (np.sin(np.linspace(0, 40 * np.pi, 800)) * 20000).astype(np.int16),
    }
    rows = [
        (mid, "audio", bytearray(encode_wav(s, 16000)), None, None, 1, 16000, "wav")
        for mid, s in clips.items()
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(2)
    out = {r["media_id"]: r for r in extract_features(df, decoder="real").collect()}
    assert set(out) == set(clips)
    for mid, s in clips.items():
        u8 = ((s.astype(np.int64) >> 8) + 128).astype(np.float64)
        assert out[mid]["n_frames"] == 1
        assert out[mid]["mean_intensity"] == pytest.approx(u8.mean())
        assert out[mid]["std_intensity"] == pytest.approx(u8.std())


def test_real_decoder_decodes_png_when_pillow_exists(spark):
    """PNG branch of the real decoder — runs only where Pillow is
    installed (absent in this container; the WAV branch above keeps the
    real path executed here regardless)."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    buf = io.BytesIO()
    PIL.fromarray(arr, mode="L").save(buf, format="PNG")
    rows = [(20, "image", bytearray(buf.getvalue()), 8, 8, 1, None, "png")]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    r = extract_features(df, decoder="real").collect()[0]
    assert r["mean_intensity"] == pytest.approx(arr.astype(np.float64).mean())
