"""Property-based fuzz (hypothesis) for the bundled compressed-format
codecs: arbitrary shapes/contents must round-trip losslessly (PNG, GIF)
or within DCT rounding (JPEG at quality 100), across every filter type,
subsampling mode, and interlace flag. No Spark session — pure NumPy."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from week5_datingnlp_big_data_spark.functions import gifcodec as gc
from week5_datingnlp_big_data_spark.functions import jpegcodec as jc
from week5_datingnlp_big_data_spark.functions import pngcodec as pc


def _img(seed: int, h: int, w: int, ch: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    return rng.integers(0, 256, shape).astype(np.uint8)


@given(
    st.integers(0, 2**31 - 1),
    st.integers(1, 40),
    st.integers(1, 40),
    st.sampled_from([1, 2, 3, 4]),
    st.integers(0, 4),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_lossless(seed, h, w, ch, ftype):
    img = _img(seed, h, w, ch)
    assert np.array_equal(pc.decode_png(pc.encode_png(img, filter_type=ftype)), img)


@given(
    st.integers(0, 2**31 - 1),
    st.integers(1, 40),
    st.integers(1, 40),
    st.integers(2, 256),
    st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_gif_roundtrip_lossless(seed, h, w, n_colors, interlace):
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (n_colors, 3)).astype(np.uint8)
    # unique-ify rows: duplicate palette colors would round-trip to the
    # canonical index's color, which is a palette property, not a codec bug
    palette = np.unique(palette, axis=0)
    img = palette[rng.integers(0, len(palette), (h, w))]
    enc = gc.encode_gif(img, interlace=interlace)
    assert np.array_equal(gc.decode_gif(enc), img)
    assert gc.gif_frame_count(enc) == 1


@given(st.integers(0, 2**31 - 1), st.integers(1, 40), st.integers(1, 40))
@settings(max_examples=30, deadline=None)
def test_jpeg_gray_q100_roundtrip_within_rounding(seed, h, w):
    img = _img(seed, h, w, 1)
    dec = jc.decode_jpeg(jc.encode_jpeg_gray(img, quality=100))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


@given(
    st.integers(0, 2**31 - 1),
    st.integers(1, 33),
    st.integers(1, 33),
    st.sampled_from(["4:4:4", "4:2:2", "4:2:0"]),
    st.integers(0, 3),
)
@settings(max_examples=30, deadline=None)
def test_jpeg_color_q100_gray_content_within_rounding(
    seed, h, w, sub, restart
):
    # R=G=B content: chroma planes are flat 128, so subsampling is exact
    # and the color round-trip error is luma rounding only
    gray = _img(seed, h, w, 1)
    img = np.repeat(gray[..., None], 3, axis=-1)
    dec = jc.decode_jpeg(
        jc.encode_jpeg_color(img, 100, sub, restart_interval=restart)
    )
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2
