"""Pure-NumPy BASELINE JPEG codec (grayscale, ITU-T T.81): a real
compressed-format decoder for the ``multimodal.register_codec`` plug-in
seam — proving the seam with an actual entropy-coded format instead of a
stub. Everything here is from the public JPEG specification (ITU-T
T.81 / ISO 10918-1): Annex K quantization + Huffman tables, §F entropy
coding, §A.3.3 DCT.

Scope (honest): BASELINE sequential DCT, 8-bit, SINGLE component
(grayscale). Color (multi-component, chroma subsampling), progressive,
and arithmetic coding raise NotImplementedError — plug PIL in for those.
The encoder exists so the decoder is testable end to end in-container
(encode → decode round-trips within quantization error; at quality 100
the quant table is all-ones and the round-trip is near-exact).

Performance note: entropy decode is a Python bit reader — fine for the
Arrow-batched test media this engine ships (tiny tiles), and the
decode-per-payload shape is exactly what a C codec would slot into via
register_codec on a real cluster.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg_gray", "encode_jpeg_gray", "sniff_jpeg"]

# ---------------------------------------------------------------- tables
# ITU-T T.81 Annex K.1 — luminance quantization table (natural order).
QTABLE_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)

# Annex K.3.1 — luminance DC: BITS (codes per length 1..16) + HUFFVAL.
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

# Annex K.3.2 — luminance AC.
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# §A.3.6 zigzag: ZIGZAG[k] = (row, col) of the k-th coefficient.
# Odd anti-diagonals run top-right → bottom-left (row ascending), even
# ones bottom-left → top-right (col ascending), giving the spec
# sequence 0,1,8,16,9,2,3,10,... in natural (row-major) indices.
def _zigzag_order() -> list[tuple[int, int]]:
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1],
                        rc[0] if (rc[0] + rc[1]) % 2 else rc[1]),
    )
    return order


ZIGZAG = _zigzag_order()

# Orthonormal DCT-II basis: A @ block @ A.T = DCT, A.T @ coef @ A = IDCT.
def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    a = np.sqrt(2.0 / 8.0) * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
    a[0, :] = np.sqrt(1.0 / 8.0)
    return a


DCT_A = _dct_matrix()


def sniff_jpeg(payload: bytes) -> bool:
    return len(payload) >= 3 and payload[:3] == b"\xff\xd8\xff"


def _quality_table(quality: int) -> np.ndarray:
    # IJG quality scaling (public libjpeg convention).
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    tbl = (QTABLE_LUM * scale + 50) // 100
    return np.clip(tbl, 1, 255).astype(np.int64)


def _build_huffman(bits: list[int], vals: list[int]):
    """(symbol -> (code, length), (length, code) -> symbol) per §C.2."""
    enc, dec = {}, {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[vals[i]] = (code, length)
            dec[(length, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return enc, dec


DC_ENC, DC_DEC = _build_huffman(DC_BITS, DC_VALS)
AC_ENC, AC_DEC = _build_huffman(AC_BITS, AC_VALS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # §F.1.2.3 byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("JPEG entropy stream truncated at 0xFF")
                marker = self.data[self.pos]
                self.pos += 1
                if marker != 0x00:  # stuffing removed; RST handled by caller
                    raise ValueError(f"unexpected marker 0xFF{marker:02X} in scan")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")


def _magnitude(v: int) -> tuple[int, int]:
    """(category, value-bits) per §F.1.2.1."""
    s = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def _extend(bits: int, s: int) -> int:
    """Inverse of _magnitude per §F.2.2.1."""
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def encode_jpeg_gray(
    img: np.ndarray, quality: int = 90, restart_interval: int = 0
) -> bytes:
    """Encode an (h, w) uint8 array as a baseline grayscale JFIF stream
    (single component, Annex K Huffman tables). ``restart_interval`` > 0
    emits a DRI segment and RST markers every N MCUs (§B.2.4.4 /
    §E.2.4) — restart markers are how real encoders bound error
    propagation, and they exercise the decoder's resynchronization
    path."""
    arr = np.asarray(img)
    if arr.ndim != 2 or arr.dtype != np.uint8:
        raise ValueError("need an (h, w) uint8 grayscale array")
    h, w = arr.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qtbl = _quality_table(quality)
    ph, pw = -h % 8, -w % 8
    padded = np.pad(arr, ((0, ph), (0, pw)), mode="edge").astype(np.float64)
    out = bytearray()
    out += b"\xff\xd8"                                   # SOI
    # DQT (one 8-bit table, id 0), zigzag order
    zz = bytes(int(qtbl[r, c]) for r, c in ZIGZAG)
    out += b"\xff\xdb" + struct.pack(">HB", 2 + 1 + 64, 0x00) + zz
    # SOF0: 8-bit precision, 1 component (id 1, sampling 1x1, qtable 0)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3, 8, h, w, 1)
    out += struct.pack("BBB", 1, 0x11, 0)
    # DHT: DC table class 0 id 0, AC table class 1 id 0
    for cls, bits, vals in ((0, DC_BITS, DC_VALS), (1, AC_BITS, AC_VALS)):
        body = bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + len(body), cls << 4) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS: 1 component, DC/AC table 0, spectral 0..63
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2, 1)
    out += struct.pack("BBBBB", 1, 0x00, 0, 63, 0)
    bw = _BitWriter()
    prev_dc = 0
    mcu = 0
    rst = 0
    for by in range(0, padded.shape[0], 8):
        for bx in range(0, padded.shape[1], 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                out += bw.out
                out += bytes((0xFF, 0xD0 + rst))
                rst = (rst + 1) % 8
                bw = _BitWriter()
                prev_dc = 0
            mcu += 1
            block = padded[by:by + 8, bx:bx + 8] - 128.0
            coef = DCT_A @ block @ DCT_A.T
            q = np.round(coef / qtbl).astype(np.int64)
            seq = [int(q[r, c]) for r, c in ZIGZAG]
            # DC: differential
            s, bits_v = _magnitude(seq[0] - prev_dc)
            prev_dc = seq[0]
            code, length = DC_ENC[s]
            bw.write(code, length)
            if s:
                bw.write(bits_v, s)
            # AC: run-length of zeros
            run = 0
            last_nz = max((i for i in range(1, 64) if seq[i]), default=0)
            for i in range(1, last_nz + 1):
                v = seq[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = AC_ENC[0xF0]          # ZRL
                    bw.write(code, length)
                    run -= 16
                s, bits_v = _magnitude(v)
                code, length = AC_ENC[(run << 4) | s]
                bw.write(code, length)
                bw.write(bits_v, s)
                run = 0
            if last_nz < 63:
                code, length = AC_ENC[0x00]              # EOB
                bw.write(code, length)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"                                   # EOI
    return bytes(out)


def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """Decode a baseline grayscale JPEG into an (h, w) uint8 array.
    Multi-component (color), progressive, and arithmetic-coded streams
    raise NotImplementedError with the unsupported feature named;
    corrupt/truncated streams raise ValueError."""
    if not sniff_jpeg(payload):
        raise ValueError("not a JPEG payload")
    try:
        return _decode_jpeg_gray(payload)
    except (IndexError, KeyError, struct.error) as ex:
        # KeyError covers an SOS referencing an undefined quant/Huffman
        # table id — a structural defect of the stream, not of the codec.
        raise ValueError(f"corrupt JPEG stream: {ex}") from ex


def _decode_jpeg_gray(payload: bytes) -> np.ndarray:
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_dec: dict[int, dict] = {}
    ac_dec: dict[int, dict] = {}
    h = w = None
    comp_q = comp_dc = comp_ac = 0
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at byte {pos}")
        # §B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:                                # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:      # TEM/RSTn/SOI
            continue                                       # length-less
        seg_len = struct.unpack_from(">H", payload, pos)[0]
        body = payload[pos + 2: pos + seg_len]
        if marker == 0xDB:                                # DQT
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.zeros((8, 8), dtype=np.int64)
                for k, (r, c) in enumerate(ZIGZAG):
                    tbl[r, c] = body[bpos + 1 + k]
                qtables[tq] = tbl
                bpos += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only BASELINE sequential JPEG supported (SOF{marker - 0xC0})"
            )
        elif marker == 0xC0:                              # SOF0
            precision, h, w, n_comp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise NotImplementedError("only 8-bit precision supported")
            if n_comp != 1:
                raise NotImplementedError(
                    "only single-component (grayscale) JPEG supported — "
                    "plug PIL in via register_codec for color"
                )
            # per-component fields start at offset 6: id, sampling, qtable
            if body[7] != 0x11:
                raise NotImplementedError("subsampled grayscale unsupported")
            comp_q = body[8]
        elif marker == 0xC4:                              # DHT
            bpos = 0
            while bpos < len(body):
                cls, tid = body[bpos] >> 4, body[bpos] & 0x0F
                bits = list(body[bpos + 1: bpos + 17])
                n_vals = sum(bits)
                vals = list(body[bpos + 17: bpos + 17 + n_vals])
                _enc, dec = _build_huffman(bits, vals)
                (dc_dec if cls == 0 else ac_dec)[tid] = dec
                bpos += 17 + n_vals
        elif marker == 0xDD:                              # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:                              # SOS
            if body[0] != 1:
                raise NotImplementedError("multi-component scan unsupported")
            comp_dc, comp_ac = body[2] >> 4, body[2] & 0x0F
            scan_start = pos + seg_len
            return _decode_scan(
                payload, scan_start, h, w,
                qtables[comp_q], dc_dec[comp_dc], ac_dec[comp_ac],
                restart_interval,
            )
        pos += seg_len
    raise ValueError("no SOS marker — empty JPEG scan")


def _decode_scan(payload, pos, h, w, qtbl, dc_table, ac_table,
                 restart_interval):
    if h is None:
        raise ValueError("SOS before SOF0")
    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    out = np.zeros((bh * 8, bw_ * 8), dtype=np.float64)
    # split the entropy stream at restart markers; bit reader per segment
    mcu_total = bh * bw_
    segments: list[bytes] = []
    if restart_interval:
        cur = bytearray()
        i = pos
        while i < len(payload):
            b = payload[i]
            if b == 0xFF and i + 1 < len(payload):
                nxt = payload[i + 1]
                if 0xD0 <= nxt <= 0xD7:
                    segments.append(bytes(cur))
                    cur = bytearray()
                    i += 2
                    continue
                if nxt == 0xD9:
                    break
            cur.append(b)
            i += 1
        segments.append(bytes(cur))
    else:
        end = payload.rfind(b"\xff\xd9")
        segments.append(payload[pos: end if end > pos else len(payload)])
    mcu = 0
    for seg in segments:
        br = _BitReader(seg)
        prev_dc = 0
        limit = (
            min(mcu + restart_interval, mcu_total)
            if restart_interval else mcu_total
        )
        while mcu < limit:
            s = br.read_symbol(dc_table)
            diff = _extend(br.read_bits(s), s) if s else 0
            prev_dc += diff
            seq = [0] * 64
            seq[0] = prev_dc
            k = 1
            while k < 64:
                rs = br.read_symbol(ac_table)
                run, size = rs >> 4, rs & 0x0F
                if rs == 0x00:                            # EOB
                    break
                if rs == 0xF0:                            # ZRL
                    k += 16
                    continue
                k += run
                if k > 63:
                    raise ValueError("AC run past end of block")
                seq[k] = _extend(br.read_bits(size), size)
                k += 1
            coef = np.zeros((8, 8), dtype=np.float64)
            for i, (r, c) in enumerate(ZIGZAG):
                coef[r, c] = seq[i] * qtbl[r, c]
            block = DCT_A.T @ coef @ DCT_A + 128.0
            by, bx = divmod(mcu, bw_)
            out[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = block
            mcu += 1
    if mcu != mcu_total:
        raise ValueError(f"decoded {mcu} of {mcu_total} MCUs")
    return np.clip(np.round(out[:h, :w]), 0, 255).astype(np.uint8)
