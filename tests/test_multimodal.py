"""Multimodal binary-column operators: real image resize/features, stubbed
audio/video decode with real Spark plumbing (schemas, batch fan-out,
stride logic, lineage)."""

import numpy as np

from xcrawl3r_spark.functions.imagecodec import decode_image, synth_pixels
from xcrawl3r_spark.operators import multimodal as M


def test_resize_area_exact_downscale():
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[:4, :, 0] = 100  # top half red=100
    out = M.resize_area(px, 4, 4)
    assert out.shape == (4, 4, 3)
    assert (out[:2, :, 0] == 100).all() and (out[2:, :, 0] == 0).all()


def test_audio_roundtrip_and_stub_gate():
    wave, rate = M.decode_audio(M.synth_audio("a1", 4000, 8000))
    assert len(wave) == 4000 and rate == 8000
    assert abs(float(np.sqrt((wave ** 2).mean())) - 0.3535) < 0.01  # sine rms
    try:
        M.decode_audio(b"RIFF....")  # a real wav would need soundfile
        raise AssertionError("stub must refuse non-fixture payloads")
    except NotImplementedError:
        pass


def test_video_container_and_stub_gate():
    data = M.synth_video("v1", n_frames=6, w=12, h=10)
    frames = list(M._iter_video_frames(data))
    assert len(frames) == 6
    px = decode_image(frames[0], "jpeg")
    assert px.shape == (10, 12, 3)
    try:
        list(M._iter_video_frames(b"\x00\x00\x01\xba"))  # MPEG-PS magic
        raise AssertionError("stub must refuse non-fixture payloads")
    except NotImplementedError:
        pass


def test_image_features_and_resize_spark(spark):
    from xcrawl3r_spark.sources import datagen as G

    imgs = G.images_df(spark, G.GraphParams(hosts=2, pages_per_host=6),
                       distributed=False)
    feats = M.image_features(imgs).collect()
    assert len(feats) == 12
    assert all(0 <= r["mean_r"] <= 255 and r["part_id"] >= 0 for r in feats)

    small = M.resize_images(imgs, 8, 8)
    rows = small.collect()
    assert len(rows) == 12
    assert all(r["w"] == 8 and r["h"] == 8 for r in rows)
    px = decode_image(rows[0]["bytes"], rows[0]["fmt"])
    assert px.shape == (8, 8, 3)


def test_audio_video_spark(spark):
    audio = spark.createDataFrame(
        [(f"a{i}", M.synth_audio(f"a{i}", 2000)) for i in range(5)],
        "audio_id string, bytes binary")
    af = M.audio_features(audio).collect()
    assert len(af) == 5
    assert all(r["rate"] == 8000 and r["rms"] > 0.3 for r in af)

    videos = spark.createDataFrame(
        [(f"v{i}", M.synth_video(f"v{i}", n_frames=8)) for i in range(3)],
        "video_id string, bytes binary")
    fs = M.sample_frames(videos, stride=3).collect()
    # frames 0,3,6 per video
    assert len(fs) == 9
    assert sorted({r["frame_idx"] for r in fs}) == [0, 3, 6]
    # frame payloads decode and phash is reproducible
    r0 = [r for r in fs if r["video_id"] == "v0" and r["frame_idx"] == 0][0]
    px = decode_image(r0["bytes"], "jpeg")
    assert (px.shape[0], px.shape[1]) == (r0["h"], r0["w"])
    ref = synth_pixels("v0:0", 16, 16)
    assert bin(M.phash64(ref) ^ r0["phash"]).count("1") <= 4
