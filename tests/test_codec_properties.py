"""Property-based codec tests (hypothesis): the stdlib PNG/JPEG decoders
against randomized images, dimensions, filter choices, and byte-level
corruption. Three invariant classes:

1. PNG roundtrips are EXACT for every color type / depth / interlace mode.
2. Progressive JPEG decodes BIT-IDENTICAL to the baseline encoding of the
   same image (the successive-approximation bits must reassemble the same
   quantized coefficients); baseline roundtrip error is bounded by DCT
   rounding at unit quantization.
3. The sniffers NEVER raise — arbitrary bytes and corrupted real files
   always produce a provenance-tagged feature row.
"""

import numpy as np
import pytest
from hypothesis import example, given, settings
from hypothesis import strategies as st

from jpeg_ref import make_jpeg, make_progressive_jpeg
from test_multimodal import make_png

from flink_connector_http_spark.operators.multimodal import (
    decode_jpeg,
    decode_png,
    sniff_decode_audio,
    sniff_decode_image,
    sniff_decode_video_frames,
    sniff_resize_image,
)


def _rand_img(draw, max_dim=25, channels=3, dtype=np.uint8):
    h = draw(st.integers(1, max_dim))
    w = draw(st.integers(1, max_dim))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    hi = 65536 if dtype == np.uint16 else 256
    shape = (h, w, channels) if channels else (h, w)
    return rng.integers(0, hi, size=shape, dtype=dtype)


@st.composite
def rgb8(draw):
    return _rand_img(draw)


@st.composite
def png_case(draw):
    """(pixels, colortype, bitdepth, interlace, filters) across the full
    supported matrix."""
    colortype = draw(st.sampled_from([0, 2, 4, 6]))
    bitdepth = draw(st.sampled_from([8, 16]))
    interlace = draw(st.sampled_from([0, 1]))
    channels = {0: 0, 2: 3, 4: 2, 6: 4}[colortype]
    dtype = np.uint16 if bitdepth == 16 else np.uint8
    px = _rand_img(draw, channels=channels, dtype=dtype)
    filters = draw(st.lists(st.integers(0, 4), min_size=1, max_size=5))
    return px, colortype, bitdepth, interlace, filters


@settings(max_examples=30, deadline=None)
@given(png_case())
def test_png_roundtrip_exact_all_modes(case):
    px, colortype, bitdepth, interlace, filters = case
    blob = make_png(px, colortype=colortype, bitdepth=bitdepth,
                    interlace=interlace, filters=filters)
    out = decode_png(blob)
    ref = (px >> 8).astype(np.uint8) if bitdepth == 16 else px
    if colortype == 0:  # grayscale replicates across channels
        assert (out[:, :, 0] == ref).all()
        assert (out[:, :, 1] == ref).all()
    elif colortype == 4:  # gray+alpha: gray replicated, alpha dropped
        assert (out[:, :, 0] == ref[:, :, 0]).all()
        assert (out[:, :, 2] == ref[:, :, 0]).all()
    else:  # RGB / RGBA: alpha dropped
        assert (out == ref[:, :, :3]).all()


@settings(max_examples=20, deadline=None)
@given(rgb8(), st.sampled_from(["444", "420"]), st.booleans())
def test_jpeg_progressive_matches_baseline(rgb, subsampling, grayscale):
    base = decode_jpeg(
        make_jpeg(rgb, subsampling=subsampling, grayscale=grayscale)
    )
    prog = decode_jpeg(
        make_progressive_jpeg(
            rgb, subsampling=subsampling, grayscale=grayscale
        )
    )
    assert (base == prog).all()


@settings(max_examples=20, deadline=None)
@given(rgb8(), st.integers(0, 3))
def test_jpeg_baseline_roundtrip_bounded_error(rgb, restart):
    out = decode_jpeg(make_jpeg(rgb, restart_interval=restart))
    # unit luma quantization: error is DCT coefficient rounding only,
    # which cannot move any pixel more than a few levels
    assert out.shape == rgb.shape
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 8


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_sniffers_never_raise_on_arbitrary_bytes(blob):
    assert sniff_decode_image(blob)["decode_mode"] in ("real", "fake")
    assert sniff_resize_image(blob, 8)["decode_mode"] in ("real", "fake")
    assert sniff_decode_audio(blob)["decode_mode"] in ("real", "fake")
    frames = sniff_decode_video_frames(blob, 3)
    assert all(f["decode_mode"] in ("real", "fake") for f in frames)


@st.composite
def corrupted_real_file(draw):
    """A valid PNG/JPEG/GIF/WAV with a byte flipped or a truncation."""
    from test_multimodal import make_gif, make_wav

    rgb = _rand_img(draw, max_dim=12)
    kind = draw(st.sampled_from(["png", "jpeg", "prog", "gif", "wav"]))
    if kind == "png":
        blob = bytearray(make_png(rgb))
    elif kind == "jpeg":
        blob = bytearray(make_jpeg(rgb))
    elif kind == "prog":
        blob = bytearray(make_progressive_jpeg(rgb))
    elif kind == "gif":
        blob = bytearray(make_gif(
            [[0, 1, 2, 3, 3, 2, 1, 0]],
            palette=[(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)],
            size=(4, 2),
        ))
    else:
        blob = bytearray(make_wav(n_samples=200))
    if draw(st.booleans()) and len(blob) > 12:
        cut = draw(st.integers(9, len(blob) - 1))
        return kind, bytes(blob[:cut])
    pos = draw(st.integers(8, len(blob) - 1))
    blob[pos] ^= draw(st.integers(1, 255))
    return kind, bytes(blob)


# Pinned counterexamples — both escaped a sniffer with a bare RuntimeError
# (stdlib chunk.py/wave.py seek past EOF) before RuntimeError entered
# _DECODE_ERRORS. Fresh hypothesis draws do NOT reliably re-find either
# input (a 560-green run once shipped with the bug live), so they are
# pinned here permanently.
#: round-5 falsifying example: odd fmt-chunk size (0x11) + data chunk
#: declaring 0x190 bytes over a truncated payload → chunk.seek RuntimeError
WAV_CRASHER_R5 = (
    b"RIFF\xb4\x01\x00\x00WAVEfmt \x11\x00\x00\x00\x01\x00\x01\x00"
    b"\x80>\x00\x00\x00}\x00\x00\x02\x00\x10\x00data\x90\x01\x00\x00"
    + bytes(range(48))
)
#: round-6 crafted escape: fmt chunk size 0x07000010 seeks past EOF
WAV_CRASHER_R6 = bytes.fromhex(
    "52494646a400000057415645666d74201000000701000100401f0000803e"
)


def test_pinned_wav_crashers_degrade_to_fake():
    """Regression: the two known RuntimeError-escaping WAV blobs must
    degrade to the fake path in every audio sniffer, never raise."""
    from flink_connector_http_spark.operators.multimodal import (
        sniff_audio_spectrum,
    )

    for blob in (WAV_CRASHER_R5, WAV_CRASHER_R6):
        assert sniff_decode_audio(blob)["decode_mode"] == "fake"
        assert sniff_audio_spectrum(blob)["decode_mode"] == "fake"


def test_r5_crasher_still_exercises_bare_runtimeerror_path():
    """The r5 blob must keep raising bare RuntimeError out of stdlib wave —
    if this stops holding, the pin above no longer guards the
    RuntimeError entry in _DECODE_ERRORS and needs a new counterexample."""
    import io
    import wave

    with pytest.raises(RuntimeError) as exc:
        wave.open(io.BytesIO(WAV_CRASHER_R5))
    assert type(exc.value) is RuntimeError  # bare, not a subclass


@settings(max_examples=100, deadline=None)
@given(corrupted_real_file())
@example(case=("wav", WAV_CRASHER_R5))
@example(case=("wav", WAV_CRASHER_R6))
def test_sniffers_never_raise_on_corrupted_real_files(case):
    kind, blob = case
    out = sniff_decode_image(blob)
    assert out["decode_mode"] in ("real", "fake")
    rz = sniff_resize_image(blob, 8)
    assert rz["decode_mode"] in ("real", "fake")
    assert sniff_decode_audio(blob)["decode_mode"] in ("real", "fake")
    frames = sniff_decode_video_frames(blob, 2)
    assert all(f["decode_mode"] in ("real", "fake") for f in frames)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
