"""JPEG codecs (ITU-T T.81) — pure stdlib + numpy, no third-party
image library: Baseline Process 1 (sequential DCT, 8-bit, lossy) and
Lossless Process 14 (SOF3 predictive, 2-16 bit, exact).

Why this exists: the reference pipeline decodes whatever pydicom
handles (``/root/reference/generate_images_from_dicom.py:44-51``),
which includes JPEG-compressed DICOM transfer syntaxes. The engine's
stdlib DICOM reader (``codecs.decode_dicom_gray``) covered explicit-VR
little-endian and RLE Lossless; this module closes the most common
compressed syntax, JPEG Baseline Process 1 (1.2.840.10008.1.2.4.50),
AND the common archival CR/DX syntaxes, JPEG Lossless
(1.2.840.10008.1.2.4.57 / .4.70 SV1), so compressed monochrome DICOMs
decode in-container with zero optional dependencies.

Decoder scope (the full baseline feature set):
  - multi-segment DQT / DHT, byte stuffing (FF 00), fill bytes
  - SOF0 with any component count and sampling factors h,v ∈ {1,2,4}
    (grayscale 4:4:4, YCbCr 4:2:0/4:2:2 all walk the same MCU loop)
  - restart intervals (DRI + RSTn resync, DC predictors reset)
  - returns HxW uint8 for 1 component, HxWxC uint8 otherwise
    (component planes upsampled to full resolution; no color-space
    conversion — DICOM monochrome never needs one, and callers that
    want RGB can apply the JFIF YCbCr matrix to the returned planes)

Encoder scope: single-component (grayscale) baseline, 4:4:4, the
Annex K example quantization + Huffman tables — enough to produce
real compressed fixtures for roundtrip tests and JPEG-DICOM synthesis
(``encode_dicom_jpeg`` in codecs.py). JPEG is lossy: roundtrip
accuracy is asserted in tests as a pixel tolerance, not bit equality.

Performance note: entropy decode is per-bit Python and meant for the
Arrow-batched multimodal UDF path where images are decoded per batch;
the hot path at scale is the same shape as the other codecs here —
CPU-parallel across scan partitions, no shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 luminance quantization table (natural row order)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

# Annex K.3 luminance Huffman tables: (bits[1..16], huffval)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: spatial = D.T @ coeff @ D."""
    k = np.arange(8)
    d = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    d *= np.sqrt(2.0 / 8.0)
    d[0, :] *= 1.0 / np.sqrt(2.0)
    return d


_DCT = _dct_matrix()


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code) → symbol, per T.81 C.2 canonical assignment."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, code_length)."""
    return {
        sym: (code, length)
        for (length, code), sym in _huff_decode_table(bits, vals).items()
    }


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00 byte
    stuffing removed on the fly; stops at any real marker."""

    __slots__ = ("data", "pos", "acc", "nbits", "marker")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG (entropy data ends early)")
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(d):
                raise ValueError("truncated JPEG (entropy data ends early)")
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:  # a real marker terminates the entropy segment
                self.marker = nxt
                self.acc = (self.acc << 8) & 0xFFFFFFFF  # pad with zeros
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> int:
        """Skip to the next marker (for RSTn resync). Returns marker."""
        self.acc = 0
        self.nbits = 0
        self.marker = None
        d = self.data
        p = self.pos
        n = len(d)
        while p + 1 < n and (d[p] != 0xFF or d[p + 1] == 0x00):
            p += 1
        # T.81 B.1.1.2: fill bytes — repeated 0xFF collapse to one marker
        while p + 1 < n and d[p + 1] == 0xFF:
            p += 1
        if p + 1 >= n:
            raise ValueError("truncated JPEG (no restart marker found)")
        self.pos = p + 2
        return d[p + 1]


def _decode_huff(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg_baseline(data: bytes) -> np.ndarray:
    """Decode a baseline sequential-DCT 8-bit JPEG. Returns HxW uint8
    for single-component images, HxWxC uint8 otherwise (planes
    upsampled to full resolution, no color-space conversion)."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None  # (h, w, comps) with comps = [(cid, hs, vs, tq)]
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker; collapse them so the id byte is never read as a length
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        body_end = pos + seglen
        if body_end > n:
            raise ValueError("truncated JPEG (segment extends past end)")
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    tab = np.frombuffer(seg[i:i + 64], dtype=np.uint8)
                    i += 64
                else:
                    tab = np.frombuffer(
                        seg[i:i + 128], dtype=">u2"
                    ).astype(np.int64)
                    i += 128
                q = np.zeros(64, dtype=np.int64)
                q[ZIGZAG] = tab  # stored in zigzag order
                qtabs[tq] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                htabs[(tc, th)] = _huff_decode_table(bits, vals)
                i += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            prec = seg[0]
            if prec != 8:
                raise ValueError(f"JPEG precision {prec} unsupported "
                                 "(baseline is 8-bit)")
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, seg[8 + 3 * c]))
            frame = (h, w, comps)
        elif marker == 0xC3:
            raise ValueError(
                "JPEG SOF3 is lossless process 14; use "
                "decode_jpeg_lossless"
            )
        elif marker in (0xC2, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG SOF{marker - 0xC0} (non-baseline: progressive/"
                "hierarchical/arithmetic) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs = seg[1 + 2 * c]
                tdta = seg[2 + 2 * c]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            return _decode_scan(
                data, body_end, frame, scan, qtabs, htabs,
                restart_interval,
            )
        pos = body_end
    raise ValueError("JPEG has no SOS segment")


def _decode_scan(data, pos, frame, scan, qtabs, htabs, restart_interval):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    # per-scan component state in scan order
    state = []
    planes: dict[int, np.ndarray] = {}
    for cs, td, ta in scan:
        cid, hs, vs, tq = by_id[cs]
        planes[cid] = np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.int64)
        state.append({
            "cid": cid, "hs": hs, "vs": vs,
            "q": qtabs[tq],
            "dc": htabs[(0, td)], "ac": htabs[(1, ta)],
            "pred": 0,
        })
    r = _BitReader(data, pos)
    coef = np.zeros(64, dtype=np.int64)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                m = r.align_to_marker()
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError("expected JPEG restart marker")
                for st in state:
                    st["pred"] = 0
            for st in state:
                hs, vs = st["hs"], st["vs"]
                for byy in range(vs):
                    for bxx in range(hs):
                        coef[:] = 0
                        t = _decode_huff(r, st["dc"])
                        diff = _extend(r.read_bits(t), t) if t else 0
                        st["pred"] += diff
                        coef[0] = st["pred"]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(r, st["ac"])
                            rr, ss = rs >> 4, rs & 0x0F
                            if ss == 0:
                                if rr == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise ValueError("JPEG AC run overflow")
                            coef[ZIGZAG[k]] = _extend(r.read_bits(ss), ss)
                            k += 1
                        block = (coef.reshape(8, 8) * st["q"]).astype(float)
                        spatial = _DCT.T @ block @ _DCT
                        y0 = (my * vs + byy) * 8
                        x0 = (mx * hs + bxx) * 8
                        planes[st["cid"]][y0:y0 + 8, x0:x0 + 8] = (
                            np.round(spatial).astype(np.int64) + 128
                        )
            mcu_count += 1
    out = []
    for cid, hs, vs, _tq in comps:
        p = np.clip(planes[cid], 0, 255).astype(np.uint8)
        if hs < hmax or vs < vmax:  # nearest upsample to full grid
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        return out[0]
    return np.stack(out, axis=-1)


# ---------------------------------------------------------------------------
# encoder (grayscale baseline, Annex K tables)
# ---------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def pad(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 F.1.2.3)."""
        if self.nbits:
            n = 8 - self.nbits
            self.write((1 << n) - 1, n)

    def flush(self) -> bytes:
        self.pad()
        return bytes(self.buf)


def _csize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def encode_jpeg_baseline_gray(
    arr: np.ndarray, quality: int = 90, restart_interval: int = 0
) -> bytes:
    """Encode an HxW uint8 array as a single-component baseline JPEG
    using the Annex K example tables (quantization scaled by the
    standard IJG quality mapping). ``restart_interval`` > 0 emits DRI
    and RSTn markers every that many MCUs (exercises the decoder's
    resync path; also what a parallel encoder would emit)."""
    if arr.dtype != np.uint8 or arr.ndim != 2:
        raise ValueError("encoder expects HxW uint8")
    h, w = arr.shape
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.clip((QUANT_LUMA * scale + 50) // 100, 1, 255).astype(np.int64)
    qm = q.reshape(8, 8)

    dc_tab = _huff_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_tab = _huff_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)

    by = -(-h // 8)
    bx = -(-w // 8)
    padded = np.empty((by * 8, bx * 8), dtype=float)
    padded[:h, :w] = arr
    padded[h:, :w] = arr[h - 1:h, :]  # edge-replicate padding
    padded[:, w:] = padded[:, w - 1:w]
    padded -= 128.0

    wtr = _BitWriter()
    pred = 0
    mcu_i = 0
    rst = 0
    for yb in range(by):
        for xb in range(bx):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                # close the entropy segment and resync
                wtr.pad()
                wtr.buf += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                pred = 0
            mcu_i += 1
            block = padded[yb * 8:yb * 8 + 8, xb * 8:xb * 8 + 8]
            coefs = _DCT @ block @ _DCT.T
            qz = np.round(coefs / qm).astype(np.int64).reshape(64)
            zz = qz[ZIGZAG]
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            t = _csize(diff)
            code, ln = dc_tab[t]
            wtr.write(code, ln)
            if t:
                wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_tab[0xF0]  # ZRL
                    wtr.write(code, ln)
                    run -= 16
                s = _csize(v)
                code, ln = ac_tab[(run << 4) | s]
                wtr.write(code, ln)
                wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if run:
                code, ln = ac_tab[0x00]  # EOB
                wtr.write(code, ln)
    entropy = wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    # DQT stores the table in zigzag order
    dqt = bytes([0x00]) + bytes(int(q[ZIGZAG[i]]) for i in range(64))
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
    dht_ac = bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xFF\xD8"
        + seg(0xDB, dqt)
        + seg(0xC0, sof)
        + seg(0xC4, dht_dc)
        + seg(0xC4, dht_ac)
        + dri
        + seg(0xDA, sos)
        + entropy
        + b"\xFF\xD9"
    )


# ---------------------------------------------------------------------------
# lossless JPEG (ITU-T T.81 process 14 — SOF3 predictive, Huffman)
# ---------------------------------------------------------------------------
#
# The archival CR/DX transfer syntaxes a real RSNA-shaped corpus hits:
# 1.2.840.10008.1.2.4.57 (Process 14) and .4.70 (Process 14,
# first-order prediction / SV1) both carry SOF3 streams. Lossless mode
# has no DCT, no quantization and no subsampling: each sample is
# predicted from decoded neighbors (T.81 H.1.2.1 predictors 1-7), the
# difference is Huffman-coded with a DC-style category + magnitude-bit
# code (category 16 = the bitless 32768 special), and reconstruction is
# exact modulo 2^16 — so decode must equal the source bit-for-bit,
# which the tests assert as strict equality (stronger than the lossy
# baseline's tolerance band).
#
# Same per-sample-Python performance contract as the baseline entropy
# decoder (module docstring): parallel ACROSS images via the
# Arrow-batched scan, pydicom/native preferred at 100 TB of compressed
# DICOMs.

# canonical 17-symbol table for diff categories 0..16: three 2-bit
# codes then one symbol per length 3..16 (Kraft sum < 1, so the
# all-ones max-length code stays unused as T.81 C.2 requires)
LOSSLESS_DC_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1]
LOSSLESS_DC_VALS = list(range(17))


def _predict(recon, y: int, x: int, sel: int, default: int) -> int:
    """T.81 H.1.2.1: neighbor prediction with the first-line /
    first-column fallbacks. ``recon`` is the per-component 2-D int
    array being filled in raster order."""
    if y == 0:
        return default if x == 0 else int(recon[0, x - 1])
    if x == 0:
        return int(recon[y - 1, 0])
    ra = int(recon[y, x - 1])
    rb = int(recon[y - 1, x])
    rc = int(recon[y - 1, x - 1])
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    if sel == 7:
        return (ra + rb) >> 1
    raise ValueError(f"JPEG lossless predictor {sel} invalid")


def decode_jpeg_lossless(data: bytes) -> np.ndarray:
    """Decode a lossless (SOF3, process 14) JPEG. Returns HxW uint8
    (precision <= 8) or uint16 (9..16); HxWxC for multi-component
    streams (1x1 sampling only — DICOM monochrome never interleaves).
    Supports predictors 1-7, point transform, and restart intervals
    (predictors reset to the scan-start state after each RSTn)."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    htabs: dict[int, dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None  # (prec, h, w, comps) with comps = [(cid, hs, vs)]
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1  # fill bytes
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        body_end = pos + seglen
        if body_end > n:
            raise ValueError("truncated JPEG (segment extends past end)")
        seg = data[pos + 2:pos + seglen]
        if marker == 0xC4:  # DHT (lossless uses DC-class tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                if len(vals) < nv:
                    raise ValueError("truncated JPEG DHT")
                if tc == 0:
                    htabs[th] = _huff_decode_table(bits, vals)
                i += 17 + nv
        elif marker == 0xC3:  # SOF3 — lossless sequential Huffman
            prec = seg[0]
            if not 2 <= prec <= 16:
                raise ValueError(f"JPEG lossless precision {prec} invalid")
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                if hv != 0x11:
                    raise ValueError(
                        "JPEG lossless with subsampling unsupported"
                    )
                comps.append(cid)
            frame = (prec, h, w, comps)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG SOF{marker - 0xC0} is not lossless process 14; "
                "use decode_jpeg_baseline for SOF0/1"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF3")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs = seg[1 + 2 * c]
                td = seg[2 + 2 * c] >> 4
                scan.append((cs, td))
            sel = seg[1 + 2 * ns]        # Ss = predictor selection
            pt = seg[3 + 2 * ns] & 0x0F  # Al = point transform
            return _decode_lossless_scan(
                data, body_end, frame, scan, htabs, sel, pt,
                restart_interval,
            )
        pos = body_end
    raise ValueError("JPEG has no SOS segment")


def _decode_lossless_scan(data, pos, frame, scan, htabs, sel, pt,
                          restart_interval):
    prec, h, w, comps = frame
    if sorted(cs for cs, _ in scan) != sorted(comps):
        raise ValueError("JPEG lossless scan/frame component mismatch")
    default = 1 << (prec - pt - 1)
    planes = {cs: np.zeros((h, w), dtype=np.int64) for cs, _ in scan}
    tabs = {}
    for cs, td in scan:
        if td not in htabs:
            raise ValueError(f"JPEG lossless missing DHT {td}")
        tabs[cs] = htabs[td]
    r = _BitReader(data, pos)
    mcu = 0
    fresh = {cs: True for cs, _ in scan}  # scan-start / post-restart
    for y in range(h):
        for x in range(w):
            if restart_interval and mcu and mcu % restart_interval == 0:
                m = r.align_to_marker()
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError("expected JPEG restart marker")
                for cs, _ in scan:
                    fresh[cs] = True
            for cs, _td in scan:
                t = _decode_huff(r, tabs[cs])
                if t == 16:  # T.81: category 16 carries no bits
                    diff = 32768
                elif t:
                    diff = _extend(r.read_bits(t), t)
                else:
                    diff = 0
                if fresh[cs]:
                    pred = default
                    fresh[cs] = False
                else:
                    pred = _predict(planes[cs], y, x, sel, default)
                planes[cs][y, x] = (pred + diff) & 0xFFFF
            mcu += 1
    out = []
    dt = np.uint8 if prec <= 8 else np.uint16
    for cs in comps:
        p = planes[cs]
        if pt:
            p = p << pt  # undo the point transform's downshift
        out.append(p.astype(dt))
    if len(out) == 1:
        return out[0]
    return np.stack(out, axis=-1)


def encode_jpeg_lossless_gray(
    arr: np.ndarray,
    predictor: int = 1,
    restart_interval: int = 0,
) -> bytes:
    """Encode an HxW uint8/uint16 array as a single-component lossless
    JPEG (SOF3, process 14). ``predictor=1`` (left neighbor) is SV1 —
    the DICOM 1.2.840.10008.1.2.4.70 selection; 1-7 all roundtrip.
    Bit-exact: tests assert array equality, not a tolerance."""
    if arr.ndim != 2 or arr.dtype not in (np.uint8, np.uint16):
        raise ValueError("encoder expects HxW uint8 or uint16")
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1..7")
    prec = 8 if arr.dtype == np.uint8 else 16
    h, w = arr.shape
    tab = _huff_encode_table(LOSSLESS_DC_BITS, LOSSLESS_DC_VALS)
    a = arr.astype(np.int64)
    default = 1 << (prec - 1)
    wtr = _BitWriter()
    mcu = 0
    rst = 0
    fresh = True
    for y in range(h):
        for x in range(w):
            if restart_interval and mcu and mcu % restart_interval == 0:
                wtr.pad()
                wtr.buf += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                fresh = True
            mcu += 1
            if fresh:
                pred = default
                fresh = False
            else:
                pred = _predict(a, y, x, predictor, default)
            d = (int(a[y, x]) - pred) & 0xFFFF
            if d == 32768:
                code, ln = tab[16]
                wtr.write(code, ln)
                continue
            sd = d - 65536 if d > 32768 else d
            t = _csize(sd)
            code, ln = tab[t]
            wtr.write(code, ln)
            if t:
                wtr.write(sd if sd >= 0 else sd + (1 << t) - 1, t)
    entropy = wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    sof = struct.pack(">BHHB", prec, h, w, 1) + bytes([1, 0x11, 0])
    dht = (
        bytes([0x00])
        + bytes(LOSSLESS_DC_BITS)
        + bytes(LOSSLESS_DC_VALS)
    )
    # SOS for lossless: Ss = predictor, Se = 0, AhAl = 0 (no point
    # transform)
    sos = bytes([1, 1, 0x00, predictor, 0, 0])
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xFF\xD8"
        + seg(0xC3, sof)
        + seg(0xC4, dht)
        + dri
        + seg(0xDA, sos)
        + entropy
        + b"\xFF\xD9"
    )
