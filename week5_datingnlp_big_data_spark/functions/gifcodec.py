"""Pure-Python/NumPy GIF codec for the ``multimodal.register_codec``
plug-in seam. Everything here is from the public GIF87a/GIF89a
specification (CompuServe 1987/1989, mirrored by W3C): logical screen
descriptor, color tables, sub-block framing, variable-width LZW with
clear/EOI codes and the 4096-entry dictionary cap, and the 4-pass
row interlace scheme.

Scope (honest): still images — the decoder returns the FIRST frame as
(h, w, 3) RGB (training-data stats pipelines treat animated GIFs as
their poster frame; ``gif_frame_count`` reports how many frames exist).
Frames smaller than the logical screen are composited onto the screen
canvas (background-color-filled). Transparency (GIF89a GCE) is ignored
— the transparent index renders as its palette color. The encoder
exists so the decoder is testable end to end in-container (lossless
round-trip for any <= 256-color image, optional interlace to exercise
the 4-pass reorder).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "encode_gif", "gif_frame_count", "sniff_gif"]


def sniff_gif(payload: bytes) -> bool:
    return payload[:6] in (b"GIF87a", b"GIF89a")


# -------------------------------------------------------------- LZW ----
def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Variable-width LZW per GIF spec appendix: codes are packed
    little-endian; clear = 2^mcs resets the dictionary; width grows when
    the dictionary reaches the current width's capacity, capping at 12
    bits (4096 entries)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    # bit reader state
    acc = 0
    nbits = 0
    pos = 0

    def reset():
        return {i: (i,) for i in range(clear)}, min_code_size + 1

    table, width = reset()
    next_code = eoi + 1
    prev: tuple[int, ...] | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                if n_out == n_pixels:
                    return out
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, width = reset()
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + (prev[0],)          # the KwKwK case
        else:
            raise ValueError(f"invalid LZW code {code}")
        if n_out + len(entry) > n_pixels:
            raise ValueError("GIF LZW output exceeds frame size")
        out[n_out: n_out + len(entry)] = entry
        n_out += len(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            # ONE ENTRY EARLIER than the encoder's boundary: the
            # decoder's table add for a code lags the encoder's by one
            # (the encoder adds its entry at emit time; the decoder can
            # only reconstruct it from the FOLLOWING code), so the width
            # must grow as soon as next_code reaches 2^width - 1 to stay
            # bit-aligned with the encoder's 2^width boundary.
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
        prev = entry
    if n_out != n_pixels:
        raise ValueError(f"GIF frame decoded {n_out} of {n_pixels} pixels")
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prev: tuple[int, ...] = ()
    for v in indices.tolist():
        cur = prev + (v,)
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        if next_code < 4096:
            table[cur] = next_code
            next_code += 1
            # same boundary as the decoder: width grows as soon as the
            # table holds 2^width entries (the NEXT emitted code may
            # need the extra bit) — NOT one entry later
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = (v,)
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# GIF 4-pass interlace: rows 0,8,16…; 4,12…; 2,6,10…; 1,3,5…
def _interlace_order(h: int) -> list[int]:
    order: list[int] = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    return order


def gif_frame_count(payload: bytes) -> int:
    """Number of image descriptors in the stream (animated GIFs > 1)."""
    return _parse(payload, count_only=True)


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the first frame of a GIF into (h, w, 3) uint8 RGB (the
    logical screen, background-filled, with the frame composited at its
    offset). Corrupt/truncated streams raise ValueError."""
    if not sniff_gif(payload):
        raise ValueError("not a GIF payload")
    try:
        return _parse(payload, count_only=False)
    except (IndexError, struct.error, KeyError) as ex:
        raise ValueError(f"corrupt GIF stream: {ex}") from ex


def _parse(payload: bytes, count_only: bool):
    sw, sh, flags, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload[pos: pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    frames = 0
    first: np.ndarray | None = None
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:                                  # trailer
            break
        if block == 0x21:                                  # extension
            pos += 1                                       # label
            while payload[pos] != 0:                       # sub-blocks
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:                                # image descriptor
            x0, y0, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            lct = None
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                lct = np.frombuffer(
                    payload[pos: pos + 3 * n], dtype=np.uint8
                ).reshape(-1, 3)
                pos += 3 * n
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1: pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            frames += 1
            if frames == 1 and not count_only:
                if not (2 <= mcs <= 11):
                    raise ValueError(f"invalid LZW min code size {mcs}")
                idx = _lzw_decode(bytes(data), mcs, w * h).reshape(h, w)
                if iflags & 0x40:                          # interlaced
                    de = np.empty_like(idx)
                    de[_interlace_order(h)] = idx
                    idx = de
                pal = lct if lct is not None else gct
                if pal is None:
                    raise ValueError("GIF frame has no color table")
                if int(idx.max(initial=0)) >= len(pal):
                    raise ValueError("GIF palette index out of range")
                screen = np.zeros((sh, sw), dtype=np.uint8)
                if gct is not None and bg < len(gct):
                    screen[:] = bg
                screen[y0: y0 + h, x0: x0 + w] = idx
                first = pal[np.clip(screen, 0, len(pal) - 1)]
            elif count_only:
                continue
        else:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
    if count_only:
        return frames
    if first is None:
        raise ValueError("GIF stream holds no image")
    return first


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """Encode an (h, w, 3) uint8 RGB image with <= 256 distinct colors
    (or an (h, w) uint8 grayscale image, encoded through a 256-gray
    palette) as a single-frame GIF87a. Lossless round-trip with
    decode_gif."""
    arr = np.asarray(img)
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
        raise ValueError("need a uint8 (h, w[, 3]) array")
    if arr.ndim == 2:
        palette = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
        idx = arr
    else:
        if arr.shape[2] != 3:
            raise ValueError("color images must be (h, w, 3)")
        flat = arr.reshape(-1, 3)
        palette, inv = np.unique(flat, axis=0, return_inverse=True)
        if len(palette) > 256:
            raise ValueError(
                f"{len(palette)} distinct colors — GIF palettes hold <= 256 "
                "(quantize first)"
            )
        idx = inv.astype(np.uint8).reshape(arr.shape[:2])
    h, w = idx.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    # pad palette to a power of two >= 2
    size_bits = max(1, int(len(palette) - 1).bit_length())
    pal = np.zeros((1 << size_bits, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    mcs = max(2, size_bits)

    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_bits - 1), 0, 0)
    out += pal.tobytes()
    iflags = 0x40 if interlace else 0x00
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
    rows = idx[_interlace_order(h)] if interlace else idx
    out.append(mcs)
    lzw = _lzw_encode(rows.reshape(-1), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i: i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
