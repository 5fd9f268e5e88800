"""Multimodal plumbing: schema/batch-shape of decode, feature-extract,
resize, frame-sample over binary payload columns (deterministic fake codec;
real codecs stubbed per environment constraints)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_cdc_postgres_to_clickhouse_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (i, "image/fake", bytearray(MM.encode_fake_image(i, 32 + i, 24 + i)), 32 + i, 24 + i)
        for i in range(20)
    ]
    return spark.createDataFrame(rows, schema=MM.MEDIA_SCHEMA)


def test_feature_extract_shapes(spark, media):
    feats = MM.extract_features(media, feature_dim=16).collect()
    assert len(feats) == 20
    for r in feats:
        assert len(r["feature"]) == 16
        assert abs(sum(r["feature"]) - 1.0) < 1e-3  # normalized histogram
        assert 0 <= r["mean_intensity"] <= 255
        assert r["width"] == 32 + r["media_id"]


def test_resize_caps_max_side_and_keeps_schema(spark, media):
    out = MM.resize(media, max_side=16)
    assert out.schema == media.schema
    rows = out.collect()
    for r in rows:
        assert max(r["meta_width"], r["meta_height"]) <= 16
        # payload header must agree with metadata after resize
        w, h, c = MM._decode_header(bytes(r["payload"]))
        assert (w, h) == (r["meta_width"], r["meta_height"])


def test_frame_sample(spark):
    frames = b"".join(MM.encode_fake_image(7, 8, 6) for _ in range(25))
    df = spark.createDataFrame(
        [(7, "video/fake", bytearray(frames), 8, 6)], schema=MM.MEDIA_SCHEMA
    )
    out = MM.frame_sample(df, every_n=10).collect()
    assert [r["frame_idx"] for r in out] == [0, 10, 20]


def test_real_codec_raises_without_pillow():
    if MM.pil_available():
        pytest.skip("Pillow present: real codec active, stub path untestable")
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\x00" * 32, fake=False)


def test_content_routing_picks_fake_codec_by_magic():
    payload = MM.encode_fake_image(3, 8, 6)
    arr = MM.decode_image(payload)  # default: route by MMF0 magic
    assert arr.shape == (6, 8, 3)


@pytest.mark.skipif(not MM.pil_available(), reason="Pillow not installed")
def test_real_codec_roundtrip_with_pillow():
    """Self-activating real path: a PNG encoded by Pillow decodes through
    the same decode_image entry point, HxWxC uint8."""
    import io

    import numpy as np
    from PIL import Image

    rng = np.random.RandomState(0)
    src = rng.randint(0, 256, size=(24, 32, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(src).save(buf, format="PNG")
    arr = MM.decode_image(buf.getvalue())  # no MMF0 magic → real codec
    assert arr.shape == (24, 32, 3)
    assert np.array_equal(arr, src)  # PNG is lossless


def test_metadata_query_prunes_payload(spark, media, tmp_path):
    """Byte-free metadata stats must not read the binary column: check the
    parquet scan's ReadSchema."""
    path = str(tmp_path / "media.parquet")
    media.write.parquet(path)
    stats = MM.metadata_only_stats(spark.read.parquet(path))
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan, "payload column must be pruned from the scan"
    assert stats.count() == 1


# ---------------------------------------------------------------------------
# Audio modality
# ---------------------------------------------------------------------------

import numpy as np


@pytest.fixture(scope="module")
def audio(spark):
    rows = [
        (
            i,
            "audio/fake",
            bytearray(MM.encode_fake_audio(i, 16_000, 1600 + 10 * i)),
            16_000,
            1600 + 10 * i,
        )
        for i in range(12)
    ]
    return spark.createDataFrame(rows, schema=MM.AUDIO_SCHEMA)


def test_fake_audio_roundtrip():
    payload = MM.encode_fake_audio(7, 22_050, 500, channels=2)
    pcm, rate = MM.decode_audio(payload)
    assert rate == 22_050
    assert pcm.shape == (500, 2)
    assert pcm.dtype == np.int16
    # Deterministic: same id → same bytes.
    assert MM.encode_fake_audio(7, 22_050, 500, channels=2) == payload


def test_real_wav_codec_roundtrip():
    """The WAV codec is stdlib-only — the REAL audio path runs here, unlike
    images (no Pillow in the container)."""
    t = np.arange(800)
    samples = (10_000 * np.sin(2 * np.pi * 440 * t / 16_000)).astype(np.int16)
    payload = MM.encode_wav(samples, sample_rate=16_000, channels=1)
    pcm, rate = MM.decode_audio(payload)  # content-routed: no MMA0 magic → WAV
    assert rate == 16_000
    assert pcm.shape == (800, 1)
    np.testing.assert_array_equal(pcm[:, 0], samples)


def test_audio_features(spark, audio):
    feats = {r["media_id"]: r for r in MM.audio_features(audio).collect()}
    assert len(feats) == 12
    for i, r in feats.items():
        assert r["sample_rate"] == 16_000
        assert r["n_samples"] == 1600 + 10 * i
        assert r["duration_sec"] == pytest.approx((1600 + 10 * i) / 16_000)
        assert 0.0 <= r["zero_crossing_rate"] <= 1.0
        assert r["rms"] > 0 and r["peak"] > 0


def test_audio_features_on_real_wav(spark):
    silent = MM.encode_wav(np.zeros(1000, dtype=np.int16))
    loud = MM.encode_wav(np.full(1000, 20_000, dtype=np.int16))
    df = spark.createDataFrame(
        [(1, "audio/wav", bytearray(silent), 16_000, 1000),
         (2, "audio/wav", bytearray(loud), 16_000, 1000)],
        schema=MM.AUDIO_SCHEMA,
    )
    feats = {r["media_id"]: r for r in MM.audio_features(df).collect()}
    assert feats[1]["rms"] == 0.0 and feats[1]["peak"] == 0
    assert feats[2]["rms"] == pytest.approx(20_000.0) and feats[2]["peak"] == 20_000


def test_resample_audio_halves_rate(spark, audio):
    out = {r["media_id"]: r for r in MM.resample_audio(audio, 8_000).collect()}
    assert len(out) == 12
    for i, r in out.items():
        assert r["meta_sample_rate"] == 8_000
        want = int(round((1600 + 10 * i) * 8_000 / 16_000))
        assert r["meta_n_samples"] == want
        pcm, rate = MM.decode_audio(bytes(r["payload"]))
        assert rate == 8_000 and pcm.shape[0] == want
    # Schema is unchanged — resample composes with any downstream op.
    assert MM.resample_audio(audio, 8_000).schema == audio.schema


def test_audio_metadata_prunes_payload(spark, audio, tmp_path):
    path = str(tmp_path / "audio.parquet")
    audio.write.parquet(path)
    stats = MM.audio_metadata_stats(spark.read.parquet(path))
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan, "payload column must be pruned from the scan"
    row = stats.collect()[0]
    assert row["n"] == 12 and row["avg_duration_sec"] > 0


# -- video: scene cuts ------------------------------------------------------

def test_scene_cuts_find_planted_shot_boundaries(spark):
    from python_cdc_postgres_to_clickhouse_spark.operators.multimodal import (
        encode_fake_video,
        scene_cuts,
        shot_boundaries,
    )

    videos = [
        (1, encode_fake_video(1, n_frames=12, cuts=(4, 9))),
        (2, encode_fake_video(2, n_frames=6, cuts=())),
        (3, encode_fake_video(3, n_frames=8, cuts=(1, 2, 7))),
    ]
    df = spark.createDataFrame(videos, "media_id: long, payload: binary").repartition(3)

    cuts = {
        (r["media_id"], r["frame_idx"])
        for r in scene_cuts(df).collect()
        if r["is_cut"]
    }
    assert cuts == {(1, 4), (1, 9), (3, 1), (3, 2), (3, 7)}

    shots = {r["media_id"]: (r["n_shots"], r["cut_frames"]) for r in shot_boundaries(df).collect()}
    assert shots == {1: (3, [4, 9]), 2: (1, []), 3: (4, [1, 2, 7])}


def test_scene_cuts_transition_rows_per_video(spark):
    """n_frames-1 transition rows per video, diffs deterministic across runs."""
    from python_cdc_postgres_to_clickhouse_spark.operators.multimodal import (
        encode_fake_video,
        scene_cuts,
    )

    df = spark.createDataFrame(
        [(7, encode_fake_video(7, n_frames=10, cuts=(5,)))],
        "media_id: long, payload: binary",
    )
    rows1 = sorted((r["frame_idx"], r["mean_abs_diff"]) for r in scene_cuts(df).collect())
    rows2 = sorted((r["frame_idx"], r["mean_abs_diff"]) for r in scene_cuts(df).collect())
    assert rows1 == rows2
    assert len(rows1) == 9
    assert [i for i, _ in rows1] == list(range(1, 10))
    # Within-shot diffs are jitter-sized; the planted cut dwarfs them.
    within = [d for i, d in rows1 if i != 5]
    assert max(within) < 4.0 and rows1[4][1] > 16.0


# ---------------------------------------------------------------------------
# Round-11 stdlib image codecs: PNG / BMP / PPM decode with zero external
# dependencies (the WAV precedent) — the image leg now runs un-skipped in
# every environment.
# ---------------------------------------------------------------------------

def _rand_img(seed: int, h: int, w: int, c: int):
    import numpy as np

    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)
    return a if c > 1 else a[:, :, 0]


def test_png_roundtrip_all_filters_and_channels():
    """encode_png(filter_type=f) emits genuinely filtered scanlines, so
    decoding exercises every RFC 2083 unfilter path; all four 8-bit color
    types round-trip bit-exactly."""
    import numpy as np

    for c in (1, 2, 3, 4):
        for f in range(5):
            a = _rand_img(31 * c + f, 13, 17, c)
            out = MM.decode_image(MM.encode_png(a, filter_type=f))
            ref = a if a.ndim == 3 else a[:, :, np.newaxis]
            assert out.shape == ref.shape, (c, f)
            assert np.array_equal(out, ref), (c, f)


def test_bmp_roundtrip_and_padding():
    """24-bit BI_RGB bottom-up BMP round-trips, including widths whose
    rows need 4-byte padding."""
    import numpy as np

    for w in (16, 17, 18, 19):  # strides 48,51->52,54->56,57->60
        a = _rand_img(w, 9, w, 3)
        out = MM.decode_image(MM.encode_bmp(a))
        assert np.array_equal(out, a), w


def test_ppm_pgm_roundtrip_with_comments():
    import numpy as np

    a3 = _rand_img(5, 8, 6, 3)
    assert np.array_equal(MM.decode_image(MM.encode_ppm(a3)), a3)
    a1 = _rand_img(6, 8, 6, 1)
    out = MM.decode_image(MM.encode_ppm(a1))
    assert np.array_equal(out[:, :, 0], a1)
    # header comments are legal PPM
    p = MM.encode_ppm(a3)
    commented = p[:2] + b"\n# a comment\n" + p[3:]
    assert np.array_equal(MM.decode_image(commented), a3)


def test_stdlib_codec_feature_extraction_end_to_end(spark):
    """extract_features over REAL (stdlib-encoded) PNG payloads — the
    full mapInPandas pipeline with no Pillow and no fake codec."""
    import numpy as np

    rows = [
        (i, "image/png",
         bytearray(MM.encode_png(_rand_img(i, 24, 32, 3), filter_type=i % 5)),
         32, 24)
        for i in range(8)
    ]
    media = spark.createDataFrame(rows, schema=MM.MEDIA_SCHEMA)
    out = {r.media_id: r for r in MM.extract_features(media).collect()}
    assert len(out) == 8
    for i in range(8):
        a = _rand_img(i, 24, 32, 3)
        assert (out[i].width, out[i].height, out[i].channels) == (32, 24, 3)
        assert out[i].mean_intensity == pytest.approx(float(a.mean()))


@pytest.mark.skipif(not MM.pil_available(), reason="Pillow not installed")
def test_stdlib_png_matches_pillow():
    """When Pillow IS present, the stdlib PNG decoder must agree with it
    byte-for-byte on the same payload."""
    import io

    import numpy as np
    from PIL import Image

    a = _rand_img(99, 21, 33, 3)
    buf = io.BytesIO()
    Image.fromarray(a).save(buf, format="PNG")
    assert np.array_equal(MM._decode_png(buf.getvalue()), a)


def test_unknown_format_still_routes_to_pillow_stub():
    """Non-stdlib formats (e.g. JPEG magic) still reach the Pillow route,
    which raises the documented NotImplementedError when absent."""
    if MM.pil_available():
        pytest.skip("Pillow present: stub path untestable")
    with pytest.raises(NotImplementedError, match="Pillow"):
        MM.decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 64)
