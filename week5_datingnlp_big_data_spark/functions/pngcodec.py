"""Pure-Python/NumPy PNG codec for the ``multimodal.register_codec``
plug-in seam — the second-most-common crawl image format through the
same hook a PIL decoder would use. Everything here is from the public
PNG specification (RFC 2083 / W3C PNG 2nd ed.): chunk structure (§5),
scanline filters 0-4 (§6/§9), color types 0/2/3/4/6. The DEFLATE layer
is the Python standard library's ``zlib`` (RFC 1950/1951) — a real
decompressor, not a stub; the PNG-specific work (chunking, unfiltering,
palette/alpha expansion) is implemented here.

Scope (honest): 8-bit AND 16-bit depths, non-interlaced AND Adam7
interlaced (§8.2: seven passes, each an independently filtered scanline
group inside one DEFLATE stream). 1/2/4-bit packed depths raise
NotImplementedError with the feature named — plug PIL in for those. The
encoder exists so the decoder is testable end to end in-container
(lossless round-trip, any filter type × depth × interlace).

PNG filters are byte-oriented at every depth (§9: the Sub/Paeth left
distance is BYTES-per-pixel), so the 16-bit path unfilters bytes and
only reinterprets as big-endian u16 at the end; 16-bit decode returns a
uint16 array (what PIL's I;16 mode gives you).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["decode_png", "encode_png", "sniff_png"]

_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (before palette expansion)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def sniff_png(payload: bytes) -> bool:
    return payload[:8] == _SIG


def _paeth(a: int, b: int, c: int) -> int:
    # §9.4: a = left, b = above, c = upper-left
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


_PAETH_V = np.frompyfunc(_paeth, 3, 1)


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters (§9): raw is the inflated byte
    stream reshaped to (height, 1 + stride); returns (height, stride)
    reconstructed bytes. Up/None vectorize per line; Sub/Average/Paeth
    recurse along x so they loop per pixel-column (tiles here are
    small; a real cluster plugs libpng via register_codec)."""
    out = np.zeros((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        if ftype == 0:                                    # None
            rec = line
        elif ftype == 2:                                  # Up
            rec = (line + prior) & 0xFF
        elif ftype == 1:                                  # Sub
            rec = line.copy()
            for i in range(bpp, stride):
                rec[i] = (rec[i] + rec[i - bpp]) & 0xFF
        elif ftype == 3:                                  # Average
            rec = line.copy()
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + ((left + prior[i]) >> 1)) & 0xFF
        elif ftype == 4:                                  # Paeth
            rec = line.copy()
            for i in range(stride):
                left = int(rec[i - bpp]) if i >= bpp else 0
                up = int(prior[i])
                ul = int(prior[i - bpp]) if i >= bpp else 0
                rec[i] = (rec[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ftype} on line {y}")
        out[y] = rec.astype(np.uint8)
        prior = rec
    return out


# Adam7 pass grid (§8.2): (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit or 16-bit PNG (non-interlaced or Adam7) into an
    array: (h, w) for grayscale, (h, w, 3) for RGB/palette,
    (h, w, 2)/(h, w, 4) with alpha; dtype uint8, or uint16 for 16-bit
    depth. Packed sub-byte depths raise NotImplementedError;
    corrupt/truncated streams raise ValueError."""
    if not sniff_png(payload):
        raise ValueError("not a PNG payload")
    try:
        return _decode_png(payload)
    except (IndexError, struct.error, zlib.error) as ex:
        raise ValueError(f"corrupt PNG stream: {ex}") from ex


def _decode_png(payload: bytes) -> np.ndarray:
    pos = 8
    ihdr = None
    palette: np.ndarray | None = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8: pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length                                 # skip CRC
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if depth not in (8, 16):
        raise NotImplementedError(
            f"{depth}-bit PNG unsupported (8/16-bit only)"
        )
    if color not in _CHANNELS:
        raise ValueError(f"invalid PNG color type {color}")
    if color == 3 and depth == 16:
        raise ValueError("palette PNG cannot be 16-bit")
    if w == 0 or h == 0:
        raise ValueError("empty PNG image")
    ch = _CHANNELS[color]
    sb = depth // 8                                        # bytes/sample
    bpp = ch * sb                                          # filter delta
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if interlace == 1:
        rec = _deinterlace_adam7(raw, w, h, bpp)
    else:
        stride = w * bpp
        if raw.size != h * (stride + 1):
            raise ValueError(
                f"PNG pixel data is {raw.size} bytes, "
                f"expected {h * (stride + 1)}"
            )
        rec = _unfilter(raw.reshape(h, stride + 1), h, stride, bpp)
    if depth == 16:
        img = np.ascontiguousarray(rec).view(">u2").astype(np.uint16)
        img = img.reshape(h, w, ch)
    else:
        img = rec.reshape(h, w, ch)
    if color == 3:                                         # palette
        if palette is None:
            raise ValueError("palette PNG missing PLTE chunk")
        idx = img[..., 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("PNG palette index out of range")
        return palette[idx]
    if ch == 1:
        return img[..., 0]
    return img


def _deinterlace_adam7(raw: np.ndarray, w: int, h: int, bpp: int) -> np.ndarray:
    """§8.2 Adam7: seven sequentially-stored passes inside one DEFLATE
    stream, each an independently filtered reduced image; scatter each
    reconstructed pass back onto its (x_start + i·x_step,
    y_start + j·y_step) grid. Returns the full (h, w·bpp) byte plane."""
    out = np.zeros((h, w * bpp), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        stride = pw * bpp
        need = ph * (stride + 1)
        if pos + need > raw.size:
            raise ValueError("truncated Adam7 pass data")
        rec = _unfilter(
            raw[pos: pos + need].reshape(ph, stride + 1), ph, stride, bpp
        )
        pos += need
        cols = (
            (x0 + np.arange(pw) * dx)[:, None] * bpp + np.arange(bpp)
        ).ravel()
        out[y0: y0 + ph * dy: dy, cols] = rec.reshape(ph, pw * bpp)
    if pos != raw.size:
        raise ValueError(
            f"Adam7 pixel data is {raw.size} bytes, expected {pos}"
        )
    return out


def _apply_filter(
    line: np.ndarray, prior: np.ndarray, ftype: int, bpp: int
) -> np.ndarray:
    """Forward filter (§9) — exact inverse of _unfilter's branch."""
    x = line.astype(np.int32)
    if ftype == 0:
        return line
    if ftype == 1:                                        # Sub
        left = np.zeros_like(x)
        left[bpp:] = x[:-bpp]
        return ((x - left) & 0xFF).astype(np.uint8)
    if ftype == 2:                                        # Up
        return ((x - prior) & 0xFF).astype(np.uint8)
    if ftype == 3:                                        # Average
        left = np.zeros_like(x)
        left[bpp:] = x[:-bpp]
        return ((x - ((left + prior) >> 1)) & 0xFF).astype(np.uint8)
    if ftype == 4:                                        # Paeth
        left = np.zeros_like(x)
        left[bpp:] = x[:-bpp]
        ul = np.zeros_like(x)
        ul[bpp:] = prior[:-bpp]
        pred = _PAETH_V(left, prior, ul).astype(np.int32)
        return ((x - pred) & 0xFF).astype(np.uint8)
    raise ValueError(f"invalid filter type {ftype}")


def _filter_block(flat: np.ndarray, filter_type: int, bpp: int) -> bytearray:
    """Filter one scanline group (a whole image or one Adam7 pass):
    ``flat`` is (rows, stride) bytes; returns filter-tagged lines."""
    lines = bytearray()
    prior = np.zeros(flat.shape[1], dtype=np.int32)
    for y in range(flat.shape[0]):
        lines.append(filter_type)
        lines += _apply_filter(flat[y], prior, filter_type, bpp).tobytes()
        prior = flat[y].astype(np.int32)
    return lines


def encode_png(
    img: np.ndarray,
    filter_type: int = 4,
    level: int = 6,
    interlace: bool = False,
) -> bytes:
    """Encode a uint8 OR uint16 array — (h, w) gray, (h, w, 2)
    gray+alpha, (h, w, 3) RGB, (h, w, 4) RGBA — as an 8/16-bit PNG,
    optionally Adam7-interlaced, with one filter type applied to every
    scanline (default Paeth, the hardest unfilter path; lossless
    round-trip with decode_png at every depth × interlace combination)."""
    arr = np.asarray(img)
    if arr.dtype not in (np.uint8, np.uint16) or arr.ndim not in (2, 3):
        raise ValueError("need a uint8/uint16 (h, w[, c]) array")
    depth = 8 if arr.dtype == np.uint8 else 16
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color is None or h == 0 or w == 0:
        raise ValueError(f"unsupported channel count/shape {arr.shape}")
    if filter_type not in range(5):
        raise ValueError("filter_type must be 0..4")
    bpp = ch * depth // 8
    # byte plane: 16-bit samples serialize big-endian (§7.1)
    if depth == 16:
        flat = np.frombuffer(
            arr.astype(">u2").tobytes(), dtype=np.uint8
        ).reshape(h, w * bpp)
    else:
        flat = arr.reshape(h, w * bpp)
    if interlace:
        lines = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            cols = (
                (x0 + np.arange(pw) * dx)[:, None] * bpp + np.arange(bpp)
            ).ravel()
            block = flat[y0: y0 + ph * dy: dy][:, cols]
            lines += _filter_block(block, filter_type, bpp)
    else:
        lines = _filter_block(flat, filter_type, bpp)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    out = bytearray(_SIG)
    out += chunk(
        b"IHDR",
        struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, int(interlace)),
    )
    out += chunk(b"IDAT", zlib.compress(bytes(lines), level))
    out += chunk(b"IEND", b"")
    return bytes(out)
