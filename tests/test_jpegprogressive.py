"""Progressive JPEG: decode equality against the spec-pinned baseline
path, hand-derived §G.1.2.3 scan-bitstream goldens (independent of the
bundled encoder), restart resync, and gating."""

from __future__ import annotations

import numpy as np
import pytest

from week5_datingnlp_big_data_spark.functions import jpegcodec as jc
from week5_datingnlp_big_data_spark.functions import jpegprogressive as jp


def _rng():
    return np.random.default_rng(20260816)


# --------------------------------------------------------------- equality
# Progressive and baseline encode the SAME quantized coefficients, so
# decode output must be pixel-identical — this pins every progressive
# scan path against the independently spec-pinned baseline decoder
# (zigzag sequence + color interop tests in test_jpegcodec.py).

@pytest.mark.parametrize("shape", [(8, 8), (16, 24), (13, 17), (1, 1), (7, 64)])
@pytest.mark.parametrize("spectral_only", [False, True])
def test_progressive_gray_equals_baseline(shape, spectral_only):
    img = _rng().integers(0, 256, size=shape, dtype=np.uint8)
    prog = jp.encode_jpeg_progressive(
        img, quality=85, spectral_only=spectral_only
    )
    base = jc.encode_jpeg_gray(img, quality=85)
    assert jp.has_progressive_sof(prog)
    assert not jp.has_progressive_sof(base)
    assert np.array_equal(jc.decode_jpeg(prog), jc.decode_jpeg(base))


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:2", "4:2:0"])
@pytest.mark.parametrize("spectral_only", [False, True])
def test_progressive_color_equals_baseline(sub, spectral_only):
    img = _rng().integers(0, 256, size=(13, 19, 3), dtype=np.uint8)
    prog = jp.encode_jpeg_progressive(
        img, quality=85, subsampling=sub, spectral_only=spectral_only
    )
    base = jc.encode_jpeg_color(img, quality=85, subsampling=sub)
    assert np.array_equal(jc.decode_jpeg(prog), jc.decode_jpeg(base))


@pytest.mark.parametrize("ri", [1, 2, 5])
def test_progressive_restart_resync(ri):
    img = _rng().integers(0, 256, size=(24, 40), dtype=np.uint8)
    prog = jp.encode_jpeg_progressive(img, quality=85, restart_interval=ri)
    base = jc.encode_jpeg_gray(img, quality=85)
    assert np.array_equal(jc.decode_jpeg(prog), jc.decode_jpeg(base))


def test_dispatch_through_decode_jpeg_gray_gate():
    img = _rng().integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    prog = jp.encode_jpeg_progressive(img, quality=90, subsampling="4:4:4")
    with pytest.raises(NotImplementedError, match="color"):
        jc.decode_jpeg_gray(prog)


# ------------------------------------------------- hand-derived goldens
# The §G.1.2.3 AC-refinement bit layout, assembled BY HAND from the spec
# (symbol, then sign bit, then the correction bits of already-nonzero
# coefficients passed, in position order) — independent of the encoder,
# so an encoder/decoder pair that deviates symmetrically still fails.

def _refine_bits(symbols):
    """Pack a hand-specified [(kind, value)] list: ('sym', s) Huffman-codes
    s with the Annex K luma AC table, ('bit', b) emits one raw bit."""
    enc, _dec = jc._build_huffman(jc.AC_BITS, jc.AC_VALS)
    bw = jc._BitWriter()
    for kind, v in symbols:
        if kind == "sym":
            code, length = enc[v]
            bw.write(code, length)
        else:
            bw.write(v, 1)
    bw.flush()
    return bytes(bw.out)


def test_ac_refine_decode_hand_golden():
    # Prior state (after the Al=1 first pass): pos1=2, pos5=-2.
    # This refinement (Ah=1, Al=0) grows pos1 to 3 (bit 1), keeps pos5
    # (bit 0), and introduces +1 at pos3 after one zero-history run.
    block = np.zeros(64, dtype=np.int64)
    block[1], block[5] = 2, -2
    data = _refine_bits([
        ("sym", 0x11),   # run 1 zero-history, newly significant
        ("bit", 1),      # sign: positive
        ("bit", 1),      # correction for pos1 (grow 2 -> 3)
        ("sym", 0x00),   # EOB (run 1)
        ("bit", 0),      # correction for pos5 (stays -2)
    ])
    br = jc._BitReader(data)
    eobrun = jp._ac_refine_block(br, jc.AC_DEC, block, 1, 63, 0, 0)
    assert eobrun == 0
    assert block[1] == 3 and block[3] == 1 and block[5] == -2
    assert np.count_nonzero(block) == 3


def test_ac_refine_encode_hand_golden():
    # The same scenario through the encoder must produce the exact bytes.
    block = np.zeros(64, dtype=np.int64)
    block[1], block[3], block[5] = 3, 1, -2
    enc, _ = jc._build_huffman(jc.AC_BITS, jc.AC_VALS)
    bw = jc._BitWriter()
    jp._encode_ac_refine(bw, enc, block, 1, 63, 0)
    bw.flush()
    assert bytes(bw.out) == _refine_bits([
        ("sym", 0x11), ("bit", 1), ("bit", 1), ("sym", 0x00), ("bit", 0),
    ])


def test_ac_refine_zrl_window_alignment():
    # An already-nonzero coefficient sitting AFTER the 16th zero of a run
    # must get its correction bit with the NEXT symbol, not with the ZRL
    # (the decoder consumes correction bits per 16-zero window).
    block = np.zeros(64, dtype=np.int64)
    block[17], block[21] = 2, 1  # final values
    enc, _ = jc._build_huffman(jc.AC_BITS, jc.AC_VALS)
    bw = jc._BitWriter()
    jp._encode_ac_refine(bw, enc, block, 1, 63, 0)
    bw.flush()
    expect = _refine_bits([
        ("sym", 0xF0),   # ZRL: 16 zero-history positions (pos 1..16)
        ("sym", 0x31),   # run 3 (pos 18..20), newly significant at 21
        ("bit", 1),      # sign
        ("bit", 0),      # correction for pos17 — AFTER the 0x31 symbol
        ("sym", 0x00),   # EOB
    ])
    assert bytes(bw.out) == expect
    # and the decoder round-trips it from the prior state
    prior = np.zeros(64, dtype=np.int64)
    prior[17] = 2
    br = jc._BitReader(bytes(bw.out))
    eobrun = jp._ac_refine_block(br, jc.AC_DEC, prior, 1, 63, 0, 0)
    assert eobrun == 0
    assert prior[17] == 2 and prior[21] == 1


def test_ac_first_eobrun_skips_blocks():
    # EOB2 (symbol 0x10 + 1 appended bit) covers the current block and
    # 2^1 - 1 + bit more: with bit=1, three blocks total stay empty.
    # Annex K tables carry no EOBn>0 symbols, so pin with a custom DHT
    # (progressive encoders define their own tables for exactly this).
    bits = [1, 1] + [0] * 14
    vals = [0x10, 0x00]
    enc, dec = jc._build_huffman(bits, vals)
    bw = jc._BitWriter()
    code, length = enc[0x10]
    bw.write(code, length)
    bw.write(1, 1)  # EOBRUN extension bit
    bw.flush()
    br = jc._BitReader(bytes(bw.out))
    blocks = [np.zeros(64, dtype=np.int64) for _ in range(3)]
    eobrun = 0
    for b in blocks:
        eobrun = jp._ac_first_block(br, dec, b, 1, 63, 0, eobrun)
    assert eobrun == 0
    assert all(np.count_nonzero(b) == 0 for b in blocks)


def test_dc_refinement_reconstructs_negatives():
    # DC successive approximation uses the arithmetic shift: floor(c/2)
    # at Al=1 then bit 0 ORed back — exact for negatives in two's
    # complement. A flat dark/bright checker exercises DC-dominated
    # blocks with negative level-shifted DC.
    img = np.zeros((16, 16), dtype=np.uint8)
    img[:8, :8] = 16   # strongly negative DC after -128 shift
    img[8:, 8:] = 240
    prog = jp.encode_jpeg_progressive(img, quality=90)
    base = jc.decode_jpeg(jc.encode_jpeg_gray(img, quality=90))
    assert np.array_equal(jc.decode_jpeg(prog), base)


def test_truncated_progressive_raises_valueerror():
    img = _rng().integers(0, 256, size=(16, 16), dtype=np.uint8)
    prog = jp.encode_jpeg_progressive(img, quality=85)
    with pytest.raises(ValueError):
        jp.decode_jpeg_progressive(prog[: len(prog) // 2])


def test_progressive_rejects_bad_band():
    img = _rng().integers(0, 256, size=(8, 8), dtype=np.uint8)
    prog = bytearray(jp.encode_jpeg_progressive(img, quality=85))
    # corrupt the first SOS band header: Se=200 > 63
    i = prog.find(b"\xff\xda")
    prog[i + 2 + 2 + 1 + 2 + 1] = 200
    with pytest.raises(ValueError):
        jp.decode_jpeg_progressive(bytes(prog))
