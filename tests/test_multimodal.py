"""Unit tests for the multimodal decode stubs and fake decoders.

The distributed (mapInPandas) paths are exercised end-to-end by
``tools/check_queries.py`` (mm_* queries vs DuckDB oracles); these tests
pin the local decoder contracts: determinism, honest NotImplementedError
gates, and the 1→N frame-sampling shape.
"""

import hashlib

import pytest

from flink_connector_http_spark.operators.multimodal import (
    FRAME_SAMPLE_EVERY,
    decode_audio,
    decode_image,
    decode_video_frames,
    fake_decode_audio,
    fake_decode_image,
    fake_decode_video_frames,
)


def test_real_decoders_are_honest_stubs():
    for fn in (decode_image, decode_audio):
        with pytest.raises(NotImplementedError):
            fn(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        decode_video_frames(b"\x00\x00\x00\x18ftyp", 5)


def test_fake_image_decoder_deterministic_and_bounded():
    a = fake_decode_image(b"payload")
    assert a == fake_decode_image(b"payload")
    assert 16 <= a["width"] < 80 and 16 <= a["height"] < 80
    assert all(0.0 <= a[k] <= 1.0 for k in ("mean_r", "mean_g", "mean_b"))
    assert a != fake_decode_image(b"payload2")


def test_fake_audio_decoder_deterministic_and_bounded():
    a = fake_decode_audio(b"wavbytes")
    assert a == fake_decode_audio(b"wavbytes")
    assert a["sample_rate"] in {8000 * k for k in range(1, 7)}
    assert 1000 <= a["n_samples"] < 1000 + 256 * 256
    # duration is the tie-proof 6dp rounding of n_samples / sample_rate
    assert abs(a["duration_s"] - a["n_samples"] / a["sample_rate"]) < 1e-6
    assert 0.0 <= a["rms"] <= 1.0


def test_fake_video_sampler_one_to_many_shape():
    frames = fake_decode_video_frames(b"mp4bytes", FRAME_SAMPLE_EVERY)
    digest = hashlib.md5(b"mp4bytes").digest()
    n_frames = 10 + digest[0] % 30
    assert len(frames) == len(range(0, n_frames, FRAME_SAMPLE_EVERY))
    idxs = [f["frame_idx"] for f in frames]
    assert idxs == sorted(idxs) and idxs[0] == 0
    assert all(i % FRAME_SAMPLE_EVERY == 0 for i in idxs)
    # timestamps monotone, fingerprints unique per frame
    tss = [f["ts_s"] for f in frames]
    assert tss == sorted(tss)
    assert len({f["frame_md5"] for f in frames}) == len(frames)
    # fingerprint binds to both the container bytes and the frame index
    assert frames[0]["frame_md5"] == hashlib.md5(b"mp4bytes:0").hexdigest()
