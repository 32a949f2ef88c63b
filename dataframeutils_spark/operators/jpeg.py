"""Pure-Python/numpy baseline JPEG codec for the multimodal real-pixel
tier (no PIL/libjpeg in the environment — see reference parity note in
operators/multimodal.py; the reference repo has no media ops at all, so
this whole tier is north-star surface, not reference parity).

Decoder: Huffman JPEG — baseline/extended sequential (SOF0/SOF1) AND
progressive (SOF2: spectral selection, successive approximation, EOB
runs per T.81 G.1.2) — with arbitrary chroma subsampling (4:4:4 /
4:2:2 / 4:2:0), multiple DQT/DHT segments, 16-bit quant tables, and
DRI/RSTn restart intervals. Lossless/hierarchical/arithmetic SOFs
raise ``NotImplementedError`` with the marker named.

Encoder: single-component (grayscale) baseline JPEG whose rasters are
CONSTANT per 8x8 block. A constant block survives JPEG exactly — the
level-shifted DCT is DC-only (F00 = 8*(c-128)), the quantizer divides
it by q00 = 8 without remainder, and any conforming IDCT reproduces the
constant — so the encoded pixels are exactly recomputable by a SQL
oracle as f(x//8, y//8), the same hash-derived-oracle pattern as the
PNG and GIF tiers, while still exercising the real DC-prediction chain,
Huffman coding, byte stuffing, and edge-block padding. Cross-validated
in tests against Java ImageIO (Spark's `image` data source), an
independent decoder: exact equality on repo-encoded streams, tolerance
equality on real-world 4:2:0 photos.
"""
from __future__ import annotations

import struct

import numpy as np

# Annex K.3 typical Huffman tables (luminance DC / AC): (BITS counts
# for code lengths 1..16, then HUFFVAL symbol list)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
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

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)


def _dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis C with X = C @ x (1-D); the 2-D
    inverse is C.T @ F @ C."""
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0] *= np.sqrt(0.5)
    return c


_C = _dct_basis()


def _canonical_codes(bits: list[int], vals: list[int]):
    """Canonical Huffman codes per ITU-T T.81 Annex C. Returns
    {(length, code): symbol} for the decoder and {symbol: (code, length)}
    for the encoder."""
    decode: dict[tuple[int, int], int] = {}
    encode: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            decode[(length, code)] = sym
            encode[sym] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return decode, encode


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    real marker (RSTn handled by the caller via align_to_marker)."""

    def __init__(self, b: bytes, pos: int):
        self.b = b
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.b):
                # pad with 1s past the end (spec: decoder may read past
                # the final stuffing bits)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            byte = self.b[self.pos]
            if byte == 0xFF:
                nxt = self.b[self.pos + 1] if self.pos + 1 < len(self.b) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: caller resyncs; pad with 1s
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
                else:
                    # EOI / next segment: pad with 1s
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def align_restart(self) -> None:
        """Byte-align and consume one RSTn marker."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.b):
            if self.b[self.pos] == 0xFF and 0xD0 <= self.b[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected JPEG restart marker")


def _extend(v: int, n: int) -> int:
    """EXTEND per T.81 F.2.2.1: map the n received bits to the signed
    coefficient value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def decode_jpeg_pixels(b: bytes):
    """REAL pixel decode for Huffman JPEG — baseline/extended
    sequential (SOF0/SOF1) AND progressive (SOF2, spectral selection +
    successive approximation per ITU-T T.81 G.1.2). All scans fill a
    per-component DCT coefficient store; the shared finish step
    dequantizes, inverse-zigzags, applies an exact float64 IDCT,
    nearest-neighbor-upsamples chroma, and converts JFIF YCbCr->RGB.
    Returns (width, height, uint8 array of shape (h, w) for grayscale
    or (h, w, 3) RGB). Lossless/hierarchical/arithmetic SOFs raise
    ``NotImplementedError``."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[tuple[int, int, int, int]] = []  # (id, h, v, tq)
    W = H = 0
    restart_interval = 0
    coefs: list[np.ndarray] = []  # per comp: (blocks_y, blocks_x, 64) zigzag
    eobrun_preds: dict = {}
    pos = 2
    while pos + 1 < len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"JPEG marker stream desynced at {pos}")
        marker = b[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack(">H", b[pos + 2 : pos + 4])[0]
        seg = b[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 15
                i += 1
                if prec:
                    vals = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                else:
                    vals = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
                qt[tid] = vals
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                dec, _ = _canonical_codes(bits, vals)
                (huff_ac if cls else huff_dc)[tid] = dec
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential / progressive
            H = struct.unpack(">H", seg[1:3])[0]
            W = struct.unpack(">H", seg[3:5])[0]
            nc = seg[5]
            comps = [
                (seg[6 + 3 * c], seg[7 + 3 * c] >> 4, seg[7 + 3 * c] & 15, seg[8 + 3 * c])
                for c in range(nc)
            ]
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = -(-W // (8 * hmax))
            mcus_y = -(-H // (8 * vmax))
            coefs = [
                np.zeros((mcus_y * cv, mcus_x * ch, 64), dtype=np.int32)
                for _, ch, cv, _ in comps
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only sequential (SOF0/SOF1) and progressive (SOF2) Huffman "
                f"JPEG; got SOF marker 0x{marker:02x}"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS: scan header then entropy data
            if not comps:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []  # (comp_index, dc_table, ac_table)
            for s in range(ns):
                cid, tabs = seg[1 + 2 * s], seg[2 + 2 * s]
                ci = next(i for i, c in enumerate(comps) if c[0] == cid)
                scan.append((ci, tabs >> 4, tabs & 15))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15
            reader = _BitReader(b, pos + 2 + ln)
            _decode_scan_into(
                reader, W, H, comps, scan, coefs, huff_dc, huff_ac,
                restart_interval, ss, se, ah, al,
            )
            # resume the marker walk after this scan's entropy data
            pos = reader.pos
            while pos + 1 < len(b):
                if b[pos] == 0xFF:
                    nxt = b[pos + 1]
                    if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                        pos += 2
                        continue
                    break
                pos += 1
            continue
        pos += 2 + ln
    if not coefs:
        raise ValueError("JPEG ended before SOS")
    return _finish(W, H, comps, coefs, qt)


def _decode_scan_into(
    reader, W, H, comps, scan, coefs, huff_dc, huff_ac, restart_interval, ss, se, ah, al
):
    """Entropy-decode one scan into the coefficient store. Sequential
    scans are the ss=0..se=63, ah=al=0 case of the progressive
    machinery (T.81 G.1.2): DC-first scans shift by al, DC-refine
    scans append one bit per block, AC-first scans run-length decode
    the ss..se band with EOB runs, AC-refine scans apply the
    correction-bit procedure of G.1.2.3."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-W // (8 * hmax))
    mcus_y = -(-H // (8 * vmax))
    preds = [0] * len(comps)
    state = {"eobrun": 0}

    def dc_block(ci, dct, by, bx):
        s = reader.decode_symbol(huff_dc[dct])
        diff = _extend(reader.receive(s), s)
        preds[ci] += diff
        coefs[ci][by, bx, 0] = preds[ci] << al

    def dc_refine_block(ci, by, bx):
        if reader.read_bit():
            coefs[ci][by, bx, 0] |= 1 << al

    def seq_block(ci, dct, act, by, bx):
        dc_block(ci, dct, by, bx)
        zz = coefs[ci][by, bx]
        k = 1
        while k < 64:
            rs = reader.decode_symbol(huff_ac[act])
            r, size = rs >> 4, rs & 15
            if size == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("JPEG AC run past block end")
            zz[k] = _extend(reader.receive(size), size)
            k += 1

    def ac_first_block(ci, act, by, bx):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        zz = coefs[ci][by, bx]
        k = ss
        while k <= se:
            rs = reader.decode_symbol(huff_ac[act])
            r, size = rs >> 4, rs & 15
            if size == 0:
                if r == 15:
                    k += 16
                    continue
                state["eobrun"] = (1 << r) - 1 + reader.receive(r)
                return
            k += r
            if k > se:
                raise ValueError("JPEG AC run past band end")
            zz[k] = _extend(reader.receive(size), size) << al
            k += 1

    def ac_refine_block(ci, act, by, bx):
        # T.81 G.1.2.3 / libjpeg decode_mcu_AC_refine semantics
        zz = coefs[ci][by, bx]
        p1, m1 = 1 << al, -1 << al

        def correct(k):
            if reader.read_bit() and (zz[k] & p1) == 0:
                zz[k] += p1 if zz[k] >= 0 else m1

        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = reader.decode_symbol(huff_ac[act])
                r, size = rs >> 4, rs & 15
                val = 0
                if size == 0:
                    if r < 15:
                        # NOTE: unlike the AC-first case there is no -1
                        # here — the current block's remainder is
                        # corrected by the eobrun>0 walk below, which
                        # then decrements (libjpeg AC_refine ordering)
                        state["eobrun"] = (1 << r) + reader.receive(r)
                        break
                    # r == 15: pass over 16 zero-history coefficients
                else:
                    if size != 1:
                        raise ValueError("JPEG AC refinement size != 1")
                    val = p1 if reader.read_bit() else m1
                while k <= se:
                    if zz[k] != 0:
                        correct(k)
                    else:
                        if r == 0:
                            if val:
                                zz[k] = val
                            k += 1
                            break
                        r -= 1
                    k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if zz[k] != 0:
                    correct(k)
                k += 1
            state["eobrun"] -= 1

    def restart():
        reader.align_restart()
        preds[:] = [0] * len(comps)
        state["eobrun"] = 0

    if len(scan) == 1:
        # non-interleaved scan (T.81 A.2.2): one block per MCU, units
        # iterate the component's OWN block grid (ceil dims, not
        # MCU-padded), row-major — covers single-component sequential
        # images and every progressive DC/AC band scan
        ci, dct, act = scan[0]
        _, ch, cv, _ = comps[ci]
        cols = -(-W * ch // hmax)  # ceil(W * h_i / hmax) component samples
        rows = -(-H * cv // vmax)
        bw = -(-cols // 8)
        bh = -(-rows // 8)
        unit = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and unit and unit % restart_interval == 0:
                    restart()
                if ss == 0 and se == 63 and ah == 0 and al == 0:
                    seq_block(ci, dct, act, by, bx)
                elif ss == 0:
                    if ah == 0:
                        dc_block(ci, dct, by, bx)
                    else:
                        dc_refine_block(ci, by, bx)
                else:
                    if ah == 0:
                        ac_first_block(ci, act, by, bx)
                    else:
                        ac_refine_block(ci, act, by, bx)
                unit += 1
        return

    # interleaved scan (sequential full scans and progressive DC scans)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                restart()
            for ci, dct, act in scan:
                _, ch, cv, _ = comps[ci]
                for by in range(cv):
                    for bx in range(ch):
                        gy, gx = my * cv + by, mx * ch + bx
                        if ss == 0 and se == 63 and ah == 0 and al == 0:
                            seq_block(ci, dct, act, gy, gx)
                        elif ss == 0 and ah == 0:
                            dc_block(ci, dct, gy, gx)
                        elif ss == 0:
                            dc_refine_block(ci, gy, gx)
                        else:
                            raise ValueError("interleaved JPEG AC scan")
            mcu_count += 1


def _finish(W, H, comps, coefs, qt):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    out_planes = []
    for (cid, ch, cv, tq), cf in zip(comps, coefs):
        q = qt[tq]  # DQT stores the table in zigzag order, like cf
        by_n, bx_n, _ = cf.shape
        deq = cf.astype(np.float64) * q[None, None, :]
        nat = np.zeros_like(deq)
        nat[:, :, _ZIGZAG] = deq
        blocks = nat.reshape(by_n, bx_n, 8, 8)
        # batched exact IDCT: C.T @ F @ C over all blocks at once
        px = np.einsum("ij,abjk,kl->abil", _C.T, blocks, _C) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(by_n * 8, bx_n * 8)
        up = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        out_planes.append(up[:H, :W])
    if len(out_planes) == 1:
        return W, H, np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    rgb = np.stack([r, g, bl], axis=-1)
    return W, H, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.acc = (self.acc << pad) | ((1 << pad) - 1)
            byte = self.acc & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nbits = 0
        return bytes(self.out)


def _dc_category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def synthesize_jpeg(width: int, height: int, shift: int) -> bytes:
    """A minimal VALID baseline grayscale JFIF whose pixels are exactly
    block(x//8, y//8) = (11*bx + 17*by + shift) % 256: every 8x8 block
    is constant, so quantization (q00 = 8) is exact and any conforming
    decoder reproduces the gradient bit-for-bit (see module docstring).
    Edge blocks extend past the image; decoders crop them away."""
    bw, bh = -(-width // 8), -(-height // 8)
    qtab = np.full(64, 8, dtype=np.uint8)  # q00=8 makes DC exact
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(qtab)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1) + bytes([1, 0x11, 0])
    dc_bits = bytes(_DC_LUM_BITS)
    dc_vals = bytes(_DC_LUM_VALS)
    ac_bits = bytes(_AC_LUM_BITS)
    ac_vals = bytes(_AC_LUM_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 19 + len(dc_vals)) + b"\x00" + dc_bits + dc_vals
    out += b"\xff\xc4" + struct.pack(">H", 19 + len(ac_vals)) + b"\x10" + ac_bits + ac_vals
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    _, dc_enc = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    _, ac_enc = _canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    eob_code, eob_len = ac_enc[0x00]
    w = _BitWriter()
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            c = (11 * bx + 17 * by + shift) % 256
            dc = c - 128  # quantized DC = 8*(c-128)/q00 with q00 = 8
            diff = dc - pred
            pred = dc
            s = _dc_category(diff)
            code, ln = dc_enc[s]
            w.write(code, ln)
            if s:
                w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
            w.write(eob_code, eob_len)
    out += w.flush()
    out += b"\xff\xd9"
    return bytes(out)
