"""Audio/video multimodal plumbing: frame sampling fan-out and vectorized
audio features over Arrow batches, against local numpy oracles."""

import numpy as np

from osm2garmin_spark.operators.av import (
    synth_videos, synth_audio, sample_frames, audio_features, _split_frames)


def test_sample_frames_every_k(spark):
    vids = synth_videos(spark, 10, n_frames=12, w=8, h=8, partitions=2)
    frames = sample_frames(vids, every=4).collect()
    by_vid = {}
    for r in frames:
        by_vid.setdefault(r["video_id"], []).append(r["frame_idx"])
    assert len(by_vid) == 10
    for idxs in by_vid.values():
        assert sorted(idxs) == [0, 4, 8]
    # frame bytes match the deterministic generator
    r0 = next(r for r in frames if r["video_id"] == "vid3" and r["frame_idx"] == 4)
    x = np.arange(8)[None, :]
    y = np.arange(8)[:, None]
    want = ((x * (3 % 7 + 1) + y * (3 % 11 + 3) + 3 + 4) % 256).astype(np.uint8)
    got = np.frombuffer(r0["frame"], dtype=np.uint8).reshape(8, 8)
    assert np.array_equal(got, want)


def test_sampled_frames_flow_into_image_kernels(spark):
    """The per-frame payload is a valid raster for the image path."""
    from pyspark.sql import functions as F
    from osm2garmin_spark.operators.raster import decode_stats

    vids = synth_videos(spark, 6, n_frames=8, w=16, h=16, partitions=2)
    frames = sample_frames(vids, every=2)
    imgs = frames.select(
        F.concat_ws("_", "video_id", "frame_idx").alias("image_id"),
        F.col("frame").alias("bytes"), "w", "h", F.lit("raw").alias("fmt"))
    stats = decode_stats(imgs).collect()
    assert len(stats) == 6 * 4
    assert all(0 <= r["p_min"] <= r["p_max"] <= 255 for r in stats)


def test_audio_features_match_numpy(spark):
    auds = synth_audio(spark, 8, n_samples=4096, partitions=2)
    feats = {(r["audio_id"], r["win_idx"]): (r["rms"], r["zcr"], r["peak"])
             for r in audio_features(auds, window=1024).collect()}
    assert len(feats) == 8 * 4
    # local oracle for one clip
    row = auds.filter("audio_id = 'aud5'").collect()[0]
    pcm = np.frombuffer(row["bytes"], dtype="<i2")
    wv = pcm[:4096].reshape(4, 1024)
    f = wv.astype(np.float64)
    want_rms = np.sqrt((f * f).mean(axis=1))
    signs = np.signbit(wv)
    want_zcr = (signs[:, 1:] != signs[:, :-1]).mean(axis=1)
    want_peak = np.abs(wv.astype(np.int32)).max(axis=1)
    for i in range(4):
        rms, zcr, peak = feats[("aud5", i)]
        assert abs(rms - want_rms[i]) < 1e-9
        assert abs(zcr - want_zcr[i]) < 1e-12
        assert peak == want_peak[i]


def test_video_payload_length_checked():
    import pytest
    with pytest.raises(ValueError, match="length"):
        _split_frames(b"\x00" * 100, 2, 16, 16)
