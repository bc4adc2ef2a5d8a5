"""Bundled GIF codec (functions/gifcodec): lossless LZW round-trips
(including dictionary-reset streams and the KwKwK code path), 4-pass
interlace, palette handling, frame counting, and the register_codec
seam end to end through decode_media."""

from __future__ import annotations

import numpy as np
import pytest

from week5_datingnlp_big_data_spark.functions import gifcodec as gc


def _paletted(h, w, n_colors=7, seed=3):
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (n_colors, 3)).astype(np.uint8)
    idx = rng.integers(0, n_colors, (h, w))
    return palette[idx]


def test_roundtrip_color_and_gray():
    imgs = {
        "small": _paletted(9, 13),
        "wide": _paletted(4, 200, n_colors=250),
        "gray": (np.add.outer(np.arange(16) * 9, np.arange(16) * 5) % 256)
        .astype(np.uint8),
        "solid": np.full((8, 8, 3), 99, dtype=np.uint8),
    }
    for name, img in imgs.items():
        enc = gc.encode_gif(img)
        assert gc.sniff_gif(enc)
        dec = gc.decode_gif(enc)
        want = img if img.ndim == 3 else np.repeat(img[..., None], 3, -1)
        assert np.array_equal(dec, want), name
        assert gc.gif_frame_count(enc) == 1


def test_roundtrip_exercises_width_growth_and_dict_reset():
    # long high-entropy image: the LZW dictionary fills past every
    # width boundary and hits the 4096 reset at least once
    rng = np.random.default_rng(17)
    img = _paletted(120, 200, n_colors=256, seed=17)
    enc = gc.encode_gif(img)
    assert np.array_equal(gc.decode_gif(enc), img)
    # KwKwK path: long runs of one symbol force code == next_code
    runs = np.zeros((4, 300), dtype=np.uint8)
    assert np.array_equal(
        gc.decode_gif(gc.encode_gif(runs)),
        np.repeat(runs[..., None], 3, -1),
    )


def test_interlaced_roundtrip():
    img = _paletted(37, 23, n_colors=11)
    enc = gc.encode_gif(img, interlace=True)
    assert np.array_equal(gc.decode_gif(enc), img)


def test_too_many_colors_rejected_and_corrupt_raises():
    rng = np.random.default_rng(5)
    rich = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    with pytest.raises(ValueError, match="256"):
        gc.encode_gif(rich)
    enc = gc.encode_gif(_paletted(16, 16))
    with pytest.raises(ValueError):
        gc.decode_gif(enc[: len(enc) // 2] + b"\x3b")
    with pytest.raises(ValueError, match="not a GIF"):
        gc.decode_gif(b"\x89PNG\r\n\x1a\n")


def test_seam_end_to_end_through_decode_media(spark):
    from week5_datingnlp_big_data_spark.operators import multimodal as mm

    img = _paletted(12, 20)
    media = spark.createDataFrame(
        [(0, "image", gc.encode_gif(img))],
        "media_id long, kind string, payload binary",
    )
    mm.register_bundled_gif_codec()
    try:
        row = mm.decode_media(media, use_real_codec=True).first()
    finally:
        mm.unregister_codec("gif")
    assert row["width"] == 20 and row["height"] == 12
    assert row["mean_byte"] == pytest.approx(float(img.mean()))
    with pytest.raises(Exception, match="register"):
        mm.decode_media(media, use_real_codec=True).collect()
