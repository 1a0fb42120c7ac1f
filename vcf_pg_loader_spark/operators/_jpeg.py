"""Pure-Python baseline JPEG codec (ITU-T T.81): a real pixel decode for
the multimodal seam with zero dependencies beyond numpy.

Decoder (`decode_jpeg`): baseline + extended-sequential DCT AND
progressive DCT (SOF2, round 8 — spectral selection, successive
approximation with EOB-run and refinement-bit coding, T.81 Annex G),
Huffman entropy coding, 8-bit precision, grayscale or YCbCr with any
sampling factors whose ratios divide (4:4:4, 4:2:2, 4:2:0), restart
intervals.  Arithmetic coding, lossless, and 12-bit scans raise
ValueError so the caller's seam can fall through to PIL when present.
This is what makes MJPEG *video* features real-pixel-derived in this
container: operators/multimodal.py extracts real frames and previously
had to fake their pixels without PIL (round-6 verdict item).

Encoder (`encode_jpeg`): minimal but spec-valid baseline writer used by
tests to build fixtures and prove decode correctness by round-trip —
4:4:4 or 4:2:0, quality-1 quantization (all-ones tables) so
IDCT(DCT(x)) error is ±2, and canonical Huffman tables constructed
locally (one 4-bit length class for the 12 DC categories, one 9-bit
class for the 162 AC run/size symbols) rather than the Annex K
defaults — any T.81 decoder accepts them since they ride in DHT.

Structure notes (T.81 references): marker parse §B.2, canonical Huffman
construction §C.2, entropy decode procedure §F.2.2 (EXTEND in F.2.2.1),
zigzag Table 5, IDCT as the separable orthonormal DCT-III pair.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index -> (row, col) position in the 8x8 block
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# orthonormal 8-point DCT basis: A[x, u] = c(u)/2 * cos((2x+1) u pi / 16)
_A = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for u in range(8)
        ]
        for x in range(8)
    ]
)


def is_jpeg(data: bytes) -> bool:
    return len(data) > 3 and data[:2] == b"\xff\xd8"


def _idct_2d(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


def _fdct_2d(block: np.ndarray) -> np.ndarray:
    return _A.T @ block @ _A


def _build_decode_table(counts: list[int], symbols: list[int]) -> dict:
    """Canonical Huffman (T.81 §C.2): {(length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over de-stuffed entropy-coded bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = 0
        self.acc = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: entropy data exhausted")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_block(
    bits: _BitReader, dc_tab: dict, ac_tab: dict, qt: np.ndarray, pred: int
) -> tuple[np.ndarray, int]:
    """One 8x8 block: returns (spatial block float64, new DC predictor)."""
    t = bits.decode(dc_tab)
    dc = pred + _extend(bits.read_bits(t), t)
    zz = np.zeros(64, dtype=np.float64)
    zz[0] = dc
    k = 1
    while k < 64:
        rs = bits.decode(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("jpeg: AC coefficient index out of range")
        zz[k] = _extend(bits.read_bits(s), s)
        k += 1
    coeffs = np.zeros(64, dtype=np.float64)
    coeffs[_ZIGZAG] = zz * qt  # dequantize + de-zigzag in one scatter
    return _idct_2d(coeffs.reshape(8, 8)), dc


def _split_entropy_segments(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded data from `start` to the next real marker, split at
    restart markers (FFD0-FFD7) with FF00 stuffing removed per segment.
    Returns (segments, position of the terminating marker's 0xFF)."""
    segments: list[bytes] = []
    buf = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            buf.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:  # stuffed FF
            buf.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # restart marker
            segments.append(bytes(buf))
            buf = bytearray()
            i += 2
        else:  # a real marker terminates the scan
            break
    segments.append(bytes(buf))
    return segments, i


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline/extended-sequential Huffman JPEG -> (h, w, ch) uint8,
    ch = 1 (grayscale) or 3 (RGB via the JFIF YCbCr transform).
    Raises ValueError for anything unsupported or malformed, so the
    decode seam can fall through to PIL / the deterministic fake."""
    try:
        return _decode_jpeg(data)
    except (
        struct.error,  # truncated segment header
        IndexError,  # truncated/garbled input
        KeyError,  # scan referencing an undefined DQT/DHT id
        ZeroDivisionError,  # zero sampling factor in SOF
    ) as exc:
        raise ValueError(f"jpeg: malformed input ({exc})") from exc


def _decode_jpeg(data: bytes) -> np.ndarray:
    if not is_jpeg(data):
        raise ValueError("jpeg: missing SOI")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None  # (h, w, [(comp_id, hs, vs, tq)])
    progressive = False
    restart_interval = 0
    i = 2
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError("jpeg: marker expected")
        marker = data[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        (seg_len,) = struct.unpack(">H", data[i : i + 2])
        seg = data[i + 2 : i + seg_len]
        if marker == 0xDB:  # DQT — possibly several tables in one segment
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    qt = np.frombuffer(seg[p : p + 64], dtype=np.uint8)
                    p += 64
                else:
                    qt = np.frombuffer(seg[p : p + 128], dtype=">u2")
                    p += 128
                qtables[tq] = qt.astype(np.float64)
            i += seg_len
        elif marker == 0xC4:  # DHT — possibly several tables
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                nsym = sum(counts)
                symbols = list(seg[p + 17 : p + 17 + nsym])
                htables[(tc, th)] = _build_decode_table(counts, symbols)
                p += 17 + nsym
            i += seg_len
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential / progressive DCT
            precision = seg[0]
            if precision != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
            i += seg_len
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: lossless/arithmetic SOF not supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
            i += seg_len
        elif marker == 0xDA:  # SOS — decode the scan
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            if progressive:
                # hand the whole remaining stream (this SOS included) to
                # the multi-scan progressive decoder
                return _decode_progressive(
                    data, i - 2, frame, qtables, htables, restart_interval
                )
            ns = seg[0]
            scan_tabs = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c : 3 + 2 * c]
                scan_tabs[cid] = (tt >> 4, tt & 0x0F)
            i += seg_len
            segments, i = _split_entropy_segments(data, i)
            return _decode_scan(
                frame, scan_tabs, qtables, htables, segments, restart_interval
            )
        else:  # APPn, COM, anything skippable
            i += seg_len
    raise ValueError("jpeg: no scan found")


def _decode_scan(
    frame, scan_tabs, qtables, htables, segments, restart_interval
) -> np.ndarray:
    h, w, comps = frame
    for cid, hs, vs, tq in comps:
        if hs < 1 or vs < 1:
            raise ValueError("jpeg: zero sampling factor in SOF")
        if tq not in qtables:
            raise ValueError(f"jpeg: SOF references undefined DQT {tq}")
        if cid not in scan_tabs:
            raise ValueError(f"jpeg: SOS missing component {cid}")
        if (0, scan_tabs[cid][0]) not in htables:
            raise ValueError("jpeg: SOS references undefined DC DHT")
        if (1, scan_tabs[cid][1]) not in htables:
            raise ValueError("jpeg: SOS references undefined AC DHT")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)

    planes = {
        cid: np.zeros((mcus_y * vs * 8, mcus_x * hs * 8))
        for cid, hs, vs, _tq in comps
    }
    preds = {cid: 0 for cid, *_ in comps}
    seg_idx = 0
    bits = _BitReader(segments[0])
    n_mcus = mcus_x * mcus_y
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            seg_idx += 1  # restart: fresh byte-aligned segment,
            bits = _BitReader(segments[seg_idx])
            preds = {cid: 0 for cid, *_ in comps}  # DC predictors reset
        my, mx = divmod(m, mcus_x)
        for cid, hs, vs, tq in comps:
            dc_tab = htables[(0, scan_tabs[cid][0])]
            ac_tab = htables[(1, scan_tabs[cid][1])]
            qt = qtables[tq]
            for by in range(vs):
                for bx in range(hs):
                    block, preds[cid] = _decode_block(
                        bits, dc_tab, ac_tab, qt, preds[cid]
                    )
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block

    return _finish_image(frame, planes)


def _finish_image(frame, planes) -> np.ndarray:
    """Level shift, upsample to full resolution, color-transform — the
    shared reconstruction tail of the sequential and progressive paths."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for cid, hs, vs, _tq in comps:
        p = planes[cid] + 128.0
        if vs != vmax:
            p = np.repeat(p, vmax // vs, axis=0)
        if hs != hmax:
            p = np.repeat(p, hmax // hs, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        gray = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    if len(full) != 3:
        raise ValueError("jpeg: only 1- or 3-component scans supported")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Minimal encoder — fixture generator for the decoder's tests (and the
# MJPEG test streams).  Locally-constructed canonical Huffman tables:
# DC = twelve 4-bit codes (categories 0-11), AC = 162 9-bit codes (all
# run/size symbols incl. EOB and ZRL); both ride in DHT so any T.81
# decoder accepts them.
# ---------------------------------------------------------------------------
_DC_SYMBOLS = list(range(12))
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12  # all twelve at length 4
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_COUNTS = [0] * 8 + [len(_AC_SYMBOLS)] + [0] * 7  # all at length 9


def _build_encode_table(counts: list[int], symbols: list[int]) -> dict:
    return {
        sym: (length, code)
        for (length, code), sym in _build_decode_table(counts, symbols).items()
    }


_DC_ENC = _build_encode_table(_DC_COUNTS, _DC_SYMBOLS)
_AC_ENC = _build_encode_table(_AC_COUNTS, _AC_SYMBOLS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # pad 1s


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(bw: _BitWriter, block: np.ndarray, pred: int) -> int:
    coeffs = np.rint(_fdct_2d(block)).astype(int)  # quant table all ones
    zz = coeffs.reshape(-1)[_ZIGZAG]
    diff = int(zz[0]) - pred
    t = _category(diff)
    length, code = _DC_ENC[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = _AC_ENC[0xF0]
            bw.write(code, length)
            run -= 16
        s = _category(v)
        length, code = _AC_ENC[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        length, code = _AC_ENC[0x00]  # EOB
        bw.write(code, length)
    return int(zz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def encode_jpeg(
    rgb: np.ndarray, subsampling: str = "4:4:4", restart_interval: int = 0
) -> bytes:
    """Encode an (h, w, 3) uint8 array as baseline JFIF with all-ones
    quantization (near-lossless: round-trip error is IDCT rounding, ±2).
    4:2:0 averages each 2x2 chroma block; h and w must be multiples of 8
    (16 for 4:2:0) — fixtures pad upstream.  restart_interval > 0 emits
    DRI + RSTn markers every N MCUs (exercises the decoder's segment
    reset path, and is what real MJPEG cameras emit)."""
    h, w, _ = rgb.shape
    f = rgb.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = 128.0 - 0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2]
    cr = 128.0 + 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2]
    if subsampling == "4:2:0":
        if h % 16 or w % 16:
            raise ValueError("jpeg encode: 4:2:0 needs multiples of 16")
        cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        samp = [(1, 2, 2), (2, 1, 1), (3, 1, 1)]
    elif subsampling == "4:4:4":
        if h % 8 or w % 8:
            raise ValueError("jpeg encode: needs multiples of 8")
        samp = [(1, 1, 1), (2, 1, 1), (3, 1, 1)]
    else:
        raise ValueError(f"jpeg encode: unsupported subsampling {subsampling}")

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # all-ones table 0
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([3])
    for cid, hs, vs in samp:
        sof += bytes([cid, (hs << 4) | vs, 0])
    out += _seg(0xC0, bytes(sof))
    out += _seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_COUNTS) + bytes(_DC_SYMBOLS)
        + bytes([0x10]) + bytes(_AC_COUNTS) + bytes(_AC_SYMBOLS),
    )
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([3]) + b"".join(bytes([cid, 0x00]) for cid, _h, _v in samp)
    out += _seg(0xDA, sos + bytes([0, 63, 0]))

    planes = {1: y, 2: cb, 3: cr}
    bw = _BitWriter()
    hmax = max(s[1] for s in samp)
    vmax = max(s[2] for s in samp)
    mcus_x = w // (8 * hmax)
    mcus_y = h // (8 * vmax)
    preds = {1: 0, 2: 0, 3: 0}
    m = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and m and m % restart_interval == 0:
                bw.flush()
                out += bw.out
                out += bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)])
                bw = _BitWriter()
                preds = {1: 0, 2: 0, 3: 0}
            for cid, hs, vs in samp:
                p = planes[cid]
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        block = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        preds[cid] = _encode_block(bw, block, preds[cid])
            m += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive DCT (SOF2) — T.81 Annex G, Huffman entropy coding.
#
# A progressive stream carries the SAME quantized coefficients as a
# sequential one, split across multiple SOS scans: spectral selection
# (each scan covers a zigzag band [Ss, Se]) and successive approximation
# (a first pass sends coefficients at reduced precision — point
# transform by Al — and refinement passes restore one bit each, Ah ->
# Al).  Decoding therefore accumulates INTEGER coefficients per block
# across scans (zigzag order), and only after EOI dequantizes + IDCTs.
# DC scans may be interleaved (all components, MCU order); AC scans are
# always single-component in block-raster order over the component's
# OWN block grid (T.81 G.1.1.1.1), with EOB-run coding across blocks.
# ---------------------------------------------------------------------------
def _decode_progressive(
    data: bytes, i: int, frame, qtables, htables, restart_interval
) -> np.ndarray:
    h, w, comps = frame
    for cid, hs, vs, tq in comps:
        if hs < 1 or vs < 1:
            raise ValueError("jpeg: zero sampling factor in SOF")
        if tq not in qtables:
            raise ValueError(f"jpeg: SOF references undefined DQT {tq}")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    coeff: dict[int, np.ndarray] = {}
    geom: dict[int, tuple] = {}
    for cid, hs, vs, tq in comps:
        bw_pad, bh_pad = mcus_x * hs, mcus_y * vs
        bw_dat = -(-(-(-w * hs // hmax)) // 8)
        bh_dat = -(-(-(-h * vs // vmax)) // 8)
        coeff[cid] = np.zeros((bh_pad, bw_pad, 64), dtype=np.int32)
        geom[cid] = (hs, vs, tq, bw_dat, bh_dat)

    saw_scan = False
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError("jpeg: marker expected")
        marker = data[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (seg_len,) = struct.unpack(">H", data[i : i + 2])
        seg = data[i + 2 : i + seg_len]
        if marker == 0xDB:  # tables may refresh between scans
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    qt = np.frombuffer(seg[p : p + 64], dtype=np.uint8)
                    p += 64
                else:
                    qt = np.frombuffer(seg[p : p + 128], dtype=">u2")
                    p += 128
                qtables[tq] = qt.astype(np.float64)
            i += seg_len
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                nsym = sum(counts)
                symbols = list(seg[p + 17 : p + 17 + nsym])
                htables[(tc, th)] = _build_decode_table(counts, symbols)
                p += 17 + nsym
            i += seg_len
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", seg[:2])
            i += seg_len
        elif marker == 0xDA:
            ns = seg[0]
            scan_comps = []  # [(cid, td, ta)]
            for c in range(ns):
                cid, tt = seg[1 + 2 * c : 3 + 2 * c]
                scan_comps.append((cid, tt >> 4, tt & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            i += seg_len
            segments, i = _split_entropy_segments(data, i)
            _progressive_scan(
                coeff, geom, comps, scan_comps, htables, segments,
                restart_interval, ss, se, ah, al, mcus_x, mcus_y,
            )
            saw_scan = True
        else:
            i += seg_len
    if not saw_scan:
        raise ValueError("jpeg: no scan found")

    # dequantize + IDCT every (padded-grid) block, vectorized per comp
    planes = {}
    for cid, hs, vs, tq in comps:
        qt = qtables[tq]
        zz = coeff[cid].astype(np.float64) * qt  # (bh, bw, 64) zigzag
        nat = np.zeros_like(zz)
        nat[:, :, _ZIGZAG] = zz  # de-zigzag into natural order
        bh, bwid = nat.shape[0], nat.shape[1]
        blocks = nat.reshape(bh, bwid, 8, 8)
        spatial = np.einsum("ab,ijbc,dc->ijad", _A, blocks, _A)
        planes[cid] = (
            spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bwid * 8)
        )
    return _finish_image(frame, planes)


def _progressive_scan(
    coeff, geom, comps, scan_comps, htables, segments, restart_interval,
    ss, se, ah, al, mcus_x, mcus_y,
) -> None:
    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("jpeg: DC scan with Se != 0")
        _dc_scan(
            coeff, geom, comps, scan_comps, htables, segments,
            restart_interval, ah, al, mcus_x, mcus_y,
        )
        return
    if len(scan_comps) != 1:
        raise ValueError("jpeg: AC scan must be single-component")
    if se > 63 or ss > se:
        raise ValueError("jpeg: bad spectral band")
    cid, _td, ta = scan_comps[0]
    if (1, ta) not in htables:
        raise ValueError("jpeg: SOS references undefined AC DHT")
    ac_tab = htables[(1, ta)]
    _hs, _vs, _tq, bw_dat, bh_dat = geom[cid]
    arr = coeff[cid]
    bits = _BitReader(segments[0])
    seg_idx = 0
    eobrun = 0
    unit = 0
    for by in range(bh_dat):
        for bx in range(bw_dat):
            if restart_interval and unit and unit % restart_interval == 0:
                seg_idx += 1
                bits = _BitReader(segments[seg_idx])
                eobrun = 0
            blk = arr[by, bx]
            if ah == 0:
                eobrun = _ac_first_block(bits, ac_tab, blk, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(bits, ac_tab, blk, ss, se, al, eobrun)
            unit += 1


def _dc_scan(
    coeff, geom, comps, scan_comps, htables, segments, restart_interval,
    ah, al, mcus_x, mcus_y,
) -> None:
    scan_ids = [sc[0] for sc in scan_comps]
    tabs = {}
    if ah == 0:
        for cid, td, _ta in scan_comps:
            if (0, td) not in htables:
                raise ValueError("jpeg: SOS references undefined DC DHT")
            tabs[cid] = htables[(0, td)]
    preds = {cid: 0 for cid in scan_ids}
    bits = _BitReader(segments[0])
    seg_idx = 0

    def one_block(cid, by, bx):
        blk = coeff[cid][by, bx]
        if ah == 0:
            t = bits.decode(tabs[cid])
            preds[cid] += _extend(bits.read_bits(t), t)
            blk[0] = preds[cid] << al
        else:  # refinement: one raw bit restores the next precision bit
            if bits.read_bit():
                blk[0] = int(blk[0]) | (1 << al)

    if len(scan_comps) > 1:  # interleaved, MCU order, padded grid
        unit = 0
        by_comp = {c[0]: c for c in comps}
        for m in range(mcus_x * mcus_y):
            if restart_interval and unit and unit % restart_interval == 0:
                seg_idx += 1
                bits = _BitReader(segments[seg_idx])
                for cid in preds:
                    preds[cid] = 0
            my, mx = divmod(m, mcus_x)
            for cid in scan_ids:
                _c, hs, vs, _tq = by_comp[cid]
                for by in range(vs):
                    for bx in range(hs):
                        one_block(cid, my * vs + by, mx * hs + bx)
            unit += 1
    else:  # single component: non-interleaved raster over its own grid
        cid = scan_ids[0]
        _hs, _vs, _tq, bw_dat, bh_dat = geom[cid]
        unit = 0
        for by in range(bh_dat):
            for bx in range(bw_dat):
                if restart_interval and unit and unit % restart_interval == 0:
                    seg_idx += 1
                    bits = _BitReader(segments[seg_idx])
                    preds[cid] = 0
                one_block(cid, by, bx)
                unit += 1


def _ac_first_block(bits, ac_tab, blk, ss, se, al, eobrun) -> int:
    """First (Ah=0) AC pass for one block: T.81 G.1.2.2 — run/size with
    EOB-run coding; values enter at magnitude << Al."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = bits.decode(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += bits.read_bits(r)
                return eobrun
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("jpeg: AC index out of band")
            blk[k] = _extend(bits.read_bits(s), s) * (1 << al)
            k += 1
    return 0


def _ac_refine_block(bits, ac_tab, blk, ss, se, al, eobrun) -> int:
    """Refinement (Ah>0) AC pass for one block: T.81 G.1.2.3 — each
    already-nonzero coefficient gets a correction bit; newly-nonzero
    coefficients arrive as ±1 << Al positioned by runs counted over
    ZERO-HISTORY coefficients only."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    in_eob = eobrun > 0  # this block is covered by a previous EOB run
    if in_eob:
        eobrun -= 1
    else:
        while k <= se:
            rs = bits.decode(ac_tab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    # EOB run INCLUDES this block; the stored count
                    # excludes it, and this block still owes the
                    # correction bits for the rest of its band
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += bits.read_bits(r)
                    in_eob = True
                    break
                # r == 15: a run of 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("jpeg: bad refinement size")
                val = p1 if bits.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if bits.read_bit() and (abs(int(blk[k])) & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val != 0:
                if k > se:
                    raise ValueError("jpeg: refinement position out of band")
                blk[k] = val
            k += 1
    if in_eob:
        while k <= se:
            if blk[k] != 0:
                if bits.read_bit() and (abs(int(blk[k])) & p1) == 0:
                    blk[k] += p1 if blk[k] > 0 else m1
            k += 1
    return eobrun


# ---------------------------------------------------------------------------
# Progressive encoder — fixture generator proving the SOF2 decoder by
# round-trip, exactly as encode_jpeg proves the baseline decoder.  Emits
# the full feature surface: interleaved DC first pass at Al=1 + DC
# refinement, per-component AC first passes over two spectral bands at
# Al=1 (EOB-runs, ZRL), then AC refinement passes (correction bits,
# newly-nonzero insertion) — T.81 Annex G encoding procedures.
# ---------------------------------------------------------------------------
def _ac_point(v: int, al: int) -> int:
    """AC point transform: magnitude shift, truncation toward zero
    (G.1.2.2 — unlike DC, which arithmetic-shifts)."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def _encode_dc_first(bw: _BitWriter, t_val: int, pred: int) -> int:
    diff = t_val - pred
    t = _category(diff)
    length, code = _DC_ENC[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    return t_val


def _encode_ac_first_block(bw: _BitWriter, zz, ss: int, se: int, al: int) -> None:
    run = 0
    for k in range(ss, se + 1):
        v = _ac_point(int(zz[k]), al)
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = _AC_ENC[0xF0]
            bw.write(code, length)
            run -= 16
        s = _category(v)
        length, code = _AC_ENC[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        length, code = _AC_ENC[0x00]  # EOB (run length 1, no extra bits)
        bw.write(code, length)


def _encode_ac_refine_block(bw: _BitWriter, zz, ss: int, se: int, al: int) -> None:
    """Exact mirror of _ac_refine_block's walk structure: after every
    emitted symbol come the correction bits for the nonzero-HISTORY
    positions that symbol's advance walk passes, in position order —
    a ZRL's walk spans exactly 16 zero-history positions, a (r,1)'s
    walk spans its r zero-history positions up to the placement, and
    the closing EOB's span is the rest of the band."""
    t_now = [_ac_point(int(zz[k]), al) for k in range(ss, se + 1)]
    t_prev = [_ac_point(int(zz[k]), al + 1) for k in range(ss, se + 1)]
    n = len(t_now)

    def corr(j: int) -> int:
        return abs(t_now[j]) & 1

    cur = 0  # index into the band
    newly = [j for j in range(n) if t_prev[j] == 0 and t_now[j] != 0]
    for nj in newly:
        r = sum(
            1 for j in range(cur, nj) if t_prev[j] == 0 and t_now[j] == 0
        )
        while r > 15:
            length, code = _AC_ENC[0xF0]
            bw.write(code, length)
            zeros = 0
            while zeros < 16:  # the ZRL walk span
                if t_prev[cur] != 0:
                    bw.write(corr(cur), 1)
                else:
                    zeros += 1
                cur += 1
            r -= 16
        length, code = _AC_ENC[(r << 4) | 1]
        bw.write(code, length)
        bw.write(1 if t_now[nj] > 0 else 0, 1)
        while cur < nj:  # corrections the placement walk passes
            if t_prev[cur] != 0:
                bw.write(corr(cur), 1)
            cur += 1
        cur = nj + 1
    if cur < n:  # anything left: EOB, then the rest of the corrections
        length, code = _AC_ENC[0x00]
        bw.write(code, length)
        while cur < n:
            if t_prev[cur] != 0:
                bw.write(corr(cur), 1)
            cur += 1


def encode_jpeg_progressive(rgb: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 as progressive JFIF (SOF2), 4:4:4, all-ones
    quantization; h and w must be multiples of 8.  Scan script:
      1. DC interleaved, Ah=0 Al=1        4-5. AC 1-5 / 6-63 first, Al=1
      2. DC refinement,  Ah=1 Al=0        6-7. AC refinements, Ah=1 Al=0
    (AC scans per component, so 1 DC + 1 DC-refine + 6 AC + 6 AC-refine
    scans in total for three components.)"""
    h, w, _ = rgb.shape
    if h % 8 or w % 8:
        raise ValueError("jpeg encode: needs multiples of 8")
    f = rgb.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = 128.0 - 0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2]
    cr = 128.0 + 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2]
    planes = {1: y, 2: cb, 3: cr}
    bh, bwid = h // 8, w // 8
    zz_all = {
        cid: np.zeros((bh, bwid, 64), dtype=int) for cid in planes
    }
    for cid, p in planes.items():
        for by in range(bh):
            for bx in range(bwid):
                block = p[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] - 128.0
                zz_all[cid][by, bx] = np.rint(_fdct_2d(block)).astype(int).reshape(
                    -1
                )[_ZIGZAG]

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([3])
    for cid in (1, 2, 3):
        sof += bytes([cid, 0x11, 0])
    out += _seg(0xC2, bytes(sof))
    out += _seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_COUNTS) + bytes(_DC_SYMBOLS)
        + bytes([0x10]) + bytes(_AC_COUNTS) + bytes(_AC_SYMBOLS),
    )

    def sos_header(comps_spec: list[tuple[int, int]], ss, se, ah, al) -> bytes:
        body = bytes([len(comps_spec)])
        for cid, tt in comps_spec:
            body += bytes([cid, tt])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    # scan 1: DC first, interleaved, Al=1 (DC point transform is an
    # arithmetic shift, G.1.2.1)
    bw = _BitWriter()
    preds = {1: 0, 2: 0, 3: 0}
    for by in range(bh):
        for bx in range(bwid):
            for cid in (1, 2, 3):
                preds[cid] = _encode_dc_first(
                    bw, int(zz_all[cid][by, bx, 0]) >> 1, preds[cid]
                )
    bw.flush()
    out += sos_header([(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, 0, 1)
    out += bw.out

    # scan 2: DC refinement — one raw bit per block, same MCU order
    bw = _BitWriter()
    for by in range(bh):
        for bx in range(bwid):
            for cid in (1, 2, 3):
                bw.write(int(zz_all[cid][by, bx, 0]) & 1, 1)
    bw.flush()
    out += sos_header([(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, 1, 0)
    out += bw.out

    # AC first passes at Al=1, two spectral bands, per component
    for ss, se in ((1, 5), (6, 63)):
        for cid in (1, 2, 3):
            bw = _BitWriter()
            for by in range(bh):
                for bx in range(bwid):
                    _encode_ac_first_block(bw, zz_all[cid][by, bx], ss, se, 1)
            bw.flush()
            out += sos_header([(cid, 0x00)], ss, se, 0, 1)
            out += bw.out

    # AC refinement passes (Ah=1 -> Al=0), same bands, per component
    for ss, se in ((1, 5), (6, 63)):
        for cid in (1, 2, 3):
            bw = _BitWriter()
            for by in range(bh):
                for bx in range(bwid):
                    _encode_ac_refine_block(bw, zz_all[cid][by, bx], ss, se, 0)
            bw.flush()
            out += sos_header([(cid, 0x00)], ss, se, 1, 0)
            out += bw.out

    out += b"\xff\xd9"
    return bytes(out)
