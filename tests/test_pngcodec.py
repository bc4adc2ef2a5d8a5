"""Bundled PNG codec (functions/pngcodec): lossless encode → decode
round-trips across every color type and filter type, palette expansion,
honest gates for unsupported PNG features, and the register_codec seam
end to end through decode_media."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from week5_datingnlp_big_data_spark.functions import pngcodec as pc


def _gradient(h, w, ch=None):
    base = (np.add.outer(np.arange(h) * 7, np.arange(w) * 3) % 256).astype(
        np.uint8
    )
    if ch is None:
        return base
    return np.stack([(base + 31 * i) % 256 for i in range(ch)], axis=-1).astype(
        np.uint8
    )


def test_roundtrip_all_color_types_and_filters():
    rng = np.random.default_rng(11)
    imgs = {
        "gray": _gradient(13, 21),
        "gray_alpha": _gradient(8, 8, 2),
        "rgb": _gradient(24, 17, 3),
        "rgba": _gradient(9, 33, 4),
        "noise_rgb": rng.integers(0, 256, (16, 16, 3)).astype(np.uint8),
    }
    for name, img in imgs.items():
        for ftype in range(5):
            dec = pc.decode_png(pc.encode_png(img, filter_type=ftype))
            assert np.array_equal(dec, img), (name, ftype)  # lossless


def test_palette_png_expands_to_rgb():
    # hand-built palette PNG: 4x2 image indexing a 3-entry palette
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1, 2, 1], [2, 2, 0, 1]], np.uint8)
    lines = b"".join(b"\x00" + row.tobytes() for row in idx)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", zlib.compress(lines))
        + chunk(b"IEND", b"")
    )
    assert pc.sniff_png(payload)
    dec = pc.decode_png(payload)
    assert dec.shape == (2, 4, 3)
    assert np.array_equal(dec, palette[idx])


def test_gates_name_unsupported_features():
    img = _gradient(8, 8, 3)
    # 16-bit and Adam7 are now SUPPORTED; only packed sub-byte depths gate
    enc = bytearray(pc.encode_png(img))
    # IHDR body starts at offset 16: w(4) h(4) depth color comp filt ilace
    enc[24] = 4  # depth -> 4-bit packed
    with pytest.raises(NotImplementedError, match="4-bit"):
        pc.decode_png(bytes(enc))
    with pytest.raises(ValueError, match="not a PNG"):
        pc.decode_png(b"\xff\xd8\xffJPEG")


def test_roundtrip_16bit_and_adam7_matrix():
    rng = np.random.default_rng(20260816)
    for shape, dt in [
        ((9, 13), np.uint8), ((9, 13), np.uint16),
        ((7, 5, 3), np.uint16), ((3, 10, 4), np.uint16),
        ((1, 1), np.uint8), ((8, 1, 2), np.uint8), ((33, 17), np.uint16),
    ]:
        hi = 256 if dt == np.uint8 else 65536
        img = rng.integers(0, hi, size=shape).astype(dt)
        for ft in range(5):
            for il in (False, True):
                dec = pc.decode_png(
                    pc.encode_png(img, filter_type=ft, interlace=il)
                )
                assert dec.dtype == img.dtype, (shape, dt, ft, il)
                assert np.array_equal(dec, img), (shape, dt, ft, il)


def test_adam7_pass_geometry_hand_golden():
    # 2x2 grayscale: per §8.2 only passes 1 ((0,0)), 6 ((0,1)) and
    # 7 (row 1) are non-empty — hand-build the IDAT stream so the pass
    # ordering/geometry is pinned independently of the bundled encoder.
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    raw = bytes([0, 11]) + bytes([0, 22]) + bytes([0, 33, 44])
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(
        pc.decode_png(payload), np.array([[11, 22], [33, 44]], np.uint8)
    )


def test_truncated_and_corrupt_raise_valueerror():
    enc = pc.encode_png(_gradient(12, 12, 3))
    with pytest.raises(ValueError):
        pc.decode_png(enc[: len(enc) // 2])
    # corrupt the deflate stream
    bad = bytearray(enc)
    bad[-20] ^= 0xFF
    with pytest.raises(ValueError):
        pc.decode_png(bytes(bad))


def test_seam_end_to_end_through_decode_media(spark):
    from week5_datingnlp_big_data_spark.operators import multimodal as mm

    img0 = _gradient(12, 20, 3)
    img1 = np.full((9, 9), 200, dtype=np.uint8)
    media = spark.createDataFrame(
        [
            (0, "image", pc.encode_png(img0)),
            (1, "image", pc.encode_png(img1, filter_type=2)),
        ],
        "media_id long, kind string, payload binary",
    )
    mm.register_bundled_png_codec()
    try:
        out = {
            r["media_id"]: r
            for r in mm.decode_media(media, use_real_codec=True).collect()
        }
    finally:
        mm.unregister_codec("png")
    assert out[0]["width"] == 20 and out[0]["height"] == 12
    assert out[0]["mean_byte"] == pytest.approx(float(img0.mean()))
    assert out[1]["width"] == 9 and out[1]["mean_byte"] == 200.0
    # without the registration the same plan gates honestly
    with pytest.raises(Exception, match="register"):
        mm.decode_media(media, use_real_codec=True).collect()
