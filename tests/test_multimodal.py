"""Multimodal plumbing tests: the decode step is a deterministic fake
(no media libs in this container — multimodal.py documents the swap-in
point), but the schema evolution, batch shapes, explode factors and
determinism ARE the contract being tested."""

import pytest


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    for i in range(6):
        (d / f"img_{i}.bin").write_bytes(bytes([i]) * 100 + b"PAYLOAD" * i)
    return str(d)


def test_stream_binary_source(ctx, media_dir):
    s = ctx.stream_binary(media_dir, glob="*.bin")
    rows = s.collect_vec()
    assert len(rows) == 6
    cols = set(s.df.columns)
    assert {"path", "length", "content"} <= cols
    assert all(r.length == len(r.content) for r in rows)


def test_decode_image_schema_and_determinism(ctx, media_dir):
    s = ctx.stream_binary(media_dir, glob="*.bin").decode_image()
    assert {"image_width", "image_height", "image_channels",
            "image_format", "image_features"} <= set(s.df.columns)
    rows = {r.path: r for r in s.collect_vec()}
    rows2 = {r.path: r for r in s.collect_vec()}
    for p, r in rows.items():
        assert len(r.image_features) == 8
        assert all(0.0 <= f <= 1.0 for f in r.image_features)
        assert rows2[p].image_features == r.image_features  # deterministic
    # different content → different features
    feats = {tuple(r.image_features) for r in rows.values()}
    assert len(feats) == 6


def test_decode_audio_schema(ctx, media_dir):
    rows = ctx.stream_binary(media_dir, glob="*.bin").decode_audio().collect_vec()
    for r in rows:
        assert r.audio_sample_rate > 0
        assert abs(r.audio_duration_s - r.audio_n_samples / r.audio_sample_rate) < 1e-3
        assert len(r.audio_features) == 8


def test_resize_image_rewrites_metadata(ctx, media_dir):
    s = ctx.stream_binary(media_dir, glob="*.bin").decode_image()
    r = s.resize_image(width=32, height=32).collect_vec()[0]
    assert (r.image_width, r.image_height) == (32, 32)
    assert len(r.image_features) == 8


def test_sample_frames_explode_factor(ctx, media_dir):
    s = ctx.stream_binary(media_dir, glob="*.bin")
    frames = s.sample_frames(num_frames=3).collect_vec()
    assert len(frames) == 6 * 3
    by_path = {}
    for r in frames:
        by_path.setdefault(r.path, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 1, 2] for v in by_path.values())
    # frame features differ by index but are deterministic per (file, idx)
    f0 = [r.frame_features for r in frames if r.frame_idx == 0]
    f1 = [r.frame_features for r in frames if r.frame_idx == 1]
    assert f0 != f1


def test_pack_binary_projection(ctx, media_dir):
    from renoir_spark.multimodal import pack_binary

    s = pack_binary(ctx.stream_binary(media_dir, glob="*.bin"))
    assert s.df.columns == ["path", "content", "length"]
    assert s.collect_count() == 6


def test_decode_media_fused_equals_chained(ctx):
    """decode_media (one Arrow pass) must produce exactly the columns and
    values of decode_image().decode_audio() chained."""
    rows = [(1, b"abc"), (2, b"defgh")]
    s = ctx.stream_iter(rows, "id long, content binary")
    fused = s.decode_media().df
    chained = s.decode_image().decode_audio().df
    assert fused.columns == chained.columns
    f = sorted(tuple(r) for r in fused.drop("content", "image_features", "audio_features").collect())
    c = sorted(tuple(r) for r in chained.drop("content", "image_features", "audio_features").collect())
    assert f == c
    ff = {r.id: (r.image_features, r.audio_features) for r in fused.collect()}
    cc = {r.id: (r.image_features, r.audio_features) for r in chained.collect()}
    assert ff == cc


def test_codec_registry_swap_in_contract(ctx, media_dir):
    """The production swap-in seam: register_codec installs a real
    decoder as a config call — stages built afterwards use it on the
    executors, reset_codecs restores the deterministic fakes, and a
    codec violating the schema contract fails loudly at the Arrow
    boundary rather than corrupting output."""
    import pytest

    from renoir_spark import multimodal

    def fixed_image(data: bytes) -> dict:
        return {
            "width": 640, "height": 480, "channels": 3,
            "format": "real", "features": [float(len(data))] * 8,
        }

    s = ctx.stream_binary(media_dir)
    try:
        multimodal.register_codec("image", fixed_image)
        rows = s.decode_image().collect_vec()
        assert all(
            r.image_width == 640
            and r.image_format == "real"
            and r.image_features[0] == float(r.length)
            for r in rows
        )
    finally:
        multimodal.reset_codecs()
    # back to the default deterministic fake
    rows = s.decode_image().collect_vec()
    assert all(r.image_format == "fake" for r in rows)
    # registry surface guards
    with pytest.raises(ValueError):
        multimodal.register_codec("video", fixed_image)
    with pytest.raises(TypeError):
        multimodal.register_codec("image", 42)


def test_codec_registry_frame_codec(ctx, media_dir):
    from renoir_spark import multimodal

    try:
        multimodal.register_codec(
            "frame", lambda data, idx: [float(idx)] * 4
        )
        rows = (
            ctx.stream_binary(media_dir)
            .sample_frames(num_frames=2)
            .collect_vec()
        )
        assert {tuple(r.frame_features) for r in rows} == {
            (0.0,) * 4, (1.0,) * 4,
        }
    finally:
        multimodal.reset_codecs()
