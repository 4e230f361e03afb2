"""From-scratch baseline JPEG (JFIF) codec — replaces the deterministic
fake for foreign image bytes in multimodal.DECODERS (reference behavior
anchor: rioxarray opens any GDAL-readable format, JPEG included, through
/root/reference/rioxarray/_io.py; the corpus's lq8 codec was the
documented JPEG stand-in until this).

Public-spec implementation (ITU-T T.81 baseline sequential DCT +
progressive DCT + JFIF):

- markers: SOI, APPn/COM (skipped), DQT (8/16-bit, multi-table), DHT,
  SOF0/SOF1/SOF2, DRI, SOS, EOI; entropy stream with 0xFF00 byte stuffing
  and RSTn restart handling
- progressive (SOF2, T.81 G.2): multi-scan spectral selection +
  successive approximation — interleaved/non-interleaved DC first &
  refinement scans, single-component AC first & refinement scans with
  EOBn run coalescing, ZRL-with-correction-bits, EOB-run correction
  tails; coefficients accumulate across scans and reconstruct once at
  EOI (encoder twin `encode_jpeg_progressive` makes the roundtrip
  bit-identical to the baseline path at equal quality)
- Huffman decode per Annex C (BITS/HUFFVAL -> canonical codes), DC
  prediction per component, AC run-length/EOB/ZRL
- dequantize -> de-zigzag -> 2-D IDCT (vectorized 8x8 basis matmul over
  all blocks of a scan) -> +128 level shift -> clamp
- sampling factors (4:4:4, 4:2:2, 4:2:0 via pixel-replication upsample),
  BT.601 YCbCr -> RGB
- encoder (tests/pipelines): FDCT + IJG quality-scaled Annex K tables +
  the Annex K standard Huffman tables, 4:4:4 or 4:2:0

Exactness note: T.81 does not mandate a bit-exact IDCT, so decoded
pixels are THIS decoder's convention (float64 IDCT, round-half-even);
DC-only blocks ARE exact (constant = round(DC*Q0/8) + 128) — the
hand-built spec goldens in tests/test_jpeg.py exploit that.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 luminance / chrominance quantization tables (zigzag order NOT
# applied — natural row-major order here)
QL_BASE = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QC_BASE = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 standard Huffman tables: (bits[1..16], values)
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
          list(range(12)))
AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# 8x8 DCT-II basis: B[u, x] = c(u)/2 * cos((2x+1)u*pi/16)
_B = np.zeros((8, 8))
for _u in range(8):
    cu = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _B[_u, _x] = cu / 2 * np.cos((2 * _x + 1) * _u * np.pi / 16)


def is_jpeg(data: bytes) -> bool:
    return len(data) >= 3 and data[:3] == b"\xff\xd8\xff"


def _build_decode_table(bits, values):
    """Annex C canonical codes -> {(length, code): value}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """Entropy-segment bit reader: 0xFF00 unstuffing, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.marker = None

    def _fill(self):
        while self.nbits <= 24:
            if self.marker is not None:
                self.buf = (self.buf << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn consumed by caller
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.buf = ((self.buf << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read(self, n):
        if n == 0:
            return 0
        self._fill()
        v = (self.buf >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return v

    def huff(self, table):
        self._fill()
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            hit = table.get((length, code))
            if hit is not None:
                return hit
        raise ValueError("jpeg: invalid Huffman code")

    def restart(self):
        """Consume an RSTn marker and realign to the next byte."""
        self.buf = 0
        self.nbits = 0
        self.marker = None
        # scan forward to the RSTn (pos may sit just before it)
        while self.data[self.pos] != 0xFF or not (
            0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        self.pos += 2


def _extend(v, t):
    """T.81 EXTEND: map t-bit magnitude to signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (bands, h, w) uint8 (RGB, or 1-band gray)."""
    try:
        return _decode_jpeg(data)
    except (IndexError, struct.error):
        raise ValueError("jpeg: truncated stream") from None


def _decode_jpeg(data: bytes) -> np.ndarray:
    if not is_jpeg(data):
        raise ValueError("jpeg: missing SOI marker")
    pos = 2
    qt = {}
    huff_dc = {}
    huff_ac = {}
    frame = None
    progressive = False
    coeffs = None
    restart_interval = 0
    while True:
        if data[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if coeffs is not None:  # progressive: all scans consumed
                return _reconstruct(frame, coeffs, qt)
            raise ValueError("jpeg: EOI before SOS")
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                off += 1
                if pq:
                    vals = np.frombuffer(body, ">u2", 64, off).astype(np.int64)
                    off += 128
                else:
                    vals = np.frombuffer(body, np.uint8, 64, off).astype(np.int64)
                    off += 64
                nat = np.empty(64, np.int64)
                nat[ZIGZAG] = vals
                qt[tq] = nat
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_table(
                    bits, vals
                )
                off += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec = body[0]
            if prec != 8:
                raise ValueError(f"jpeg: unsupported precision {prec}")
            h, w = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker == 0xC3 or 0xC5 <= marker <= 0xCF and marker != 0xC8:
            raise ValueError(
                "jpeg: only baseline and progressive DCT supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = body[0]
            scan = []
            for s in range(ns):
                cs, tt = body[1 + 2 * s], body[2 + 2 * s]
                scan.append((cs, tt >> 4, tt & 0xF))
            if not progressive:
                return _decode_scan(
                    data, pos + seglen, frame, scan, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            ss_, se_ = body[1 + 2 * ns], body[2 + 2 * ns]
            ahl = body[3 + 2 * ns]
            if coeffs is None:
                coeffs = _alloc_coeffs(frame)
            pos = _decode_progressive_scan(
                data, pos + seglen, frame, scan, ss_, se_, ahl >> 4,
                ahl & 0xF, coeffs, huff_dc, huff_ac, restart_interval,
            )
            continue
        pos += seglen


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, dri):
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan:
        c = by_id[cs]
        order.append((c, td, ta))
    # coefficient storage per component
    coeffs = {
        c["id"]: np.zeros(
            (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64
        )
        for c in comps
    }
    reader = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                reader.restart()
                pred = {c["id"]: 0 for c in comps}
            for c, td, ta in order:
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        blk = np.zeros(64, np.int64)
                        t = reader.huff(huff_dc[td])
                        diff = _extend(reader.read(t), t)
                        pred[c["id"]] += diff
                        blk[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.huff(huff_ac[ta])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            blk[k] = _extend(reader.read(s), s)
                            k += 1
                        coeffs[c["id"]][my * c["v"] + v,
                                        mx * c["h"] + hh] = blk
            mcu_count += 1
    return _reconstruct(frame, coeffs, qt)


def _alloc_coeffs(frame) -> dict:
    """Per-component zigzag coefficient planes sized to MCU coverage."""
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    return {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
        for c in comps
    }


def _comp_block_grid(frame, c) -> tuple[int, int]:
    """Non-interleaved block grid of one component (T.81 A.2.2: blocks
    cover ceil(dim * sampling / max_sampling) samples)."""
    h, w, comps = frame
    hmax = max(cc["h"] for cc in comps)
    vmax = max(cc["v"] for cc in comps)
    cw = -(-w * c["h"] // hmax)
    ch = -(-h * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _reconstruct(frame, coeffs, qt) -> np.ndarray:
    """Dequant + IDCT + upsample + colorspace, vectorized per component."""
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for c in comps:
        q = qt[c["tq"]]
        # coefficients are stored in ZIGZAG order; reorder the (natural-
        # order) quant table to match before de-zigzagging
        zz = coeffs[c["id"]] * q[ZIGZAG][None, None, :]
        nat = np.zeros_like(zz)
        nat[:, :, ZIGZAG] = zz
        blocks = nat.reshape(-1, 8, 8).astype(np.float64)
        spatial = np.einsum("ux,nuv,vy->nxy", _B, blocks, _B)
        by, bx = coeffs[c["id"]].shape[:2]
        plane = (
            spatial.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        plane = np.clip(np.rint(plane) + 128, 0, 255)
        # upsample to full grid by pixel replication
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, 0), rx, 1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0].astype(np.uint8)[None]
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b])
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _next_marker(data: bytes, pos: int) -> int:
    """First byte offset at/after ``pos`` holding a non-RST marker."""
    while True:
        if data[pos] == 0xFF and data[pos + 1] not in (0x00,) \
                and not (0xD0 <= data[pos + 1] <= 0xD7):
            return pos
        pos += 1


def _decode_progressive_scan(data, pos, frame, scan, ss, se, ah, al,
                             coeffs, huff_dc, huff_ac, dri) -> int:
    """One SOF2 scan (T.81 G.2): spectral band [ss, se] at successive-
    approximation depth (ah -> al) folded into ``coeffs``.  Returns the
    byte offset of the marker following the scan's entropy data."""
    h, w, comps = frame
    by_id = {c["id"]: c for c in comps}
    order = [(by_id[cs], td, ta) for cs, td, ta in scan]
    reader = _BitReader(data, pos)
    if ss == 0:
        if se != 0:
            raise ValueError("jpeg: progressive DC scan must have Se=0")
        _progressive_dc_scan(reader, frame, order, ah, al, coeffs,
                             huff_dc, dri)
    else:
        if len(order) != 1:
            raise ValueError("jpeg: progressive AC scan must be "
                             "single-component")
        c, _td, ta = order[0]
        _progressive_ac_scan(reader, frame, c, ta, ss, se, ah, al,
                             coeffs, huff_ac, dri)
    return _next_marker(data, reader.pos)


def _progressive_dc_scan(reader, frame, order, ah, al, coeffs, huff_dc,
                         dri) -> None:
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    pred = {c["id"]: 0 for c, _t, _a in order}
    if len(order) == 1:
        c, td, _ta = order[0]
        bh, bw = _comp_block_grid(frame, c)
        units = [(c, td, r, cc) for r in range(bh) for cc in range(bw)]
        per_mcu = 1
    else:
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        units = []
        for my in range(mcuy):
            for mx in range(mcux):
                for c, td, _ta in order:
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            units.append((c, td, my * c["v"] + v,
                                          mx * c["h"] + hh))
        per_mcu = sum(c["v"] * c["h"] for c, _t, _a in order)
    mcu = 0
    for i, (c, td, br, bc) in enumerate(units):
        if i % per_mcu == 0:  # MCU boundary
            if dri and mcu and mcu % dri == 0:
                reader.restart()
                pred = {k: 0 for k in pred}
            mcu += 1
        blk = coeffs[c["id"]][br, bc]
        if ah == 0:
            t = reader.huff(huff_dc[td])
            diff = _extend(reader.read(t), t)
            pred[c["id"]] += diff
            blk[0] = pred[c["id"]] << al
        else:
            if reader.read(1):
                blk[0] |= 1 << al


def _progressive_ac_scan(reader, frame, c, ta, ss, se, ah, al, coeffs,
                         huff_ac, dri) -> None:
    bh, bw = _comp_block_grid(frame, c)
    plane = coeffs[c["id"]]
    eobrun = 0
    table = huff_ac[ta]
    p1 = 1 << al
    m1 = -1 << al
    nblk = 0
    for br in range(bh):
        for bc in range(bw):
            if dri and nblk and nblk % dri == 0:
                reader.restart()
                eobrun = 0
            nblk += 1
            blk = plane[br, bc]
            if ah == 0:  # "first" scan for this band
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = reader.huff(table)
                    r, s = rs >> 4, rs & 0xF
                    if s:
                        k += r
                        if k > se:
                            raise ValueError("jpeg: AC index overflow")
                        blk[k] = _extend(reader.read(s), s) << al
                        k += 1
                    else:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.read(r)
                            break
                        k += 16
            else:  # refinement scan (T.81 G.2 / libjpeg AC_refine logic)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = reader.huff(table)
                        r, s = rs >> 4, rs & 0xF
                        newval = 0
                        if s:
                            if s != 1:
                                raise ValueError(
                                    "jpeg: refine scan magnitude != 1")
                            newval = p1 if reader.read(1) else m1
                        elif r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.read(r)
                            break
                        while k <= se:
                            if blk[k] != 0:
                                if reader.read(1) and not (blk[k] & p1):
                                    blk[k] += p1 if blk[k] >= 0 else m1
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval:
                            blk[k] = newval
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        if blk[k] != 0 and reader.read(1) \
                                and not (blk[k] & p1):
                            blk[k] += p1 if blk[k] >= 0 else m1
                        k += 1
                    eobrun -= 1


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _build_encode_table(bits, values):
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code, length):
        if length == 0:
            return
        self.buf = (self.buf << length) | code
        self.nbits += length
        while self.nbits >= 8:
            b = (self.buf >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.clip((base * s + 50) // 100, 1, 255)
    return q.astype(np.int64)


def _encode_blocks(plane: np.ndarray, q: np.ndarray):
    """(H, W) float plane (level-shifted) -> per-block zigzag coeffs."""
    H, W = plane.shape
    blocks = (
        plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )
    dct = np.einsum("ux,nxy,vy->nuv", _B, blocks, _B)
    qd = np.rint(dct.reshape(-1, 64) / q[None, :]).astype(np.int64)
    return qd[:, ZIGZAG]  # natural -> zigzag order (zz[i] = nat[ZIGZAG[i]])


def _mag(v: int):
    a = abs(v)
    t = 0
    while a:
        a >>= 1
        t += 1
    code = v if v >= 0 else v + (1 << t) - 1
    return t, code


def _prep_components(pixels: np.ndarray, quality: int, subsample: bool):
    """Shared encoder front half: colorspace, pad, subsample, DCT+quant.

    Returns (h, w, zigzag coeff blocks per comp, padded plane shapes,
    ql, qc, sub)."""
    if pixels.ndim == 2:
        pixels = pixels[None]
    bands, h, w = pixels.shape
    if bands == 3:
        r, g, b = pixels.astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        planes = [y, cb, cr]
    elif bands == 1:
        planes = [pixels[0].astype(np.float64)]
        subsample = False
    else:
        raise ValueError("jpeg: 1 or 3 bands only")
    ql = _quality_scale(QL_BASE, quality)
    qc = _quality_scale(QC_BASE, quality)
    sub = 2 if (subsample and bands == 3) else 1
    mcu = 8 * sub
    ph = -(-h // mcu) * mcu
    pw = -(-w // mcu) * mcu

    def pad(p):
        return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")

    comp_planes = []
    for i, p in enumerate(planes):
        p = pad(p)
        if i > 0 and sub == 2:
            p = p.reshape(ph // 2, 2, pw // 2, 2).mean((1, 3))
        comp_planes.append(p - 128.0)

    zz = [
        _encode_blocks(p, ql if i == 0 else qc)
        for i, p in enumerate(comp_planes)
    ]
    return h, w, zz, comp_planes, ql, qc, sub


def encode_jpeg(pixels: np.ndarray, quality: int = 90,
                subsample: bool = False) -> bytes:
    """(bands, h, w) uint8 (1 or 3 bands) -> baseline JFIF bytes."""
    h, w, zz, comp_planes, ql, qc, sub = _prep_components(
        pixels, quality, subsample)
    bands = len(comp_planes)
    dc_l = _build_encode_table(*DC_LUM)
    ac_l = _build_encode_table(*AC_LUM)
    dc_c = _build_encode_table(*DC_CHR)
    ac_c = _build_encode_table(*AC_CHR)

    wtr = _BitWriter()
    pred = [0] * bands
    bx = [p.shape[1] // 8 for p in comp_planes]
    mcu = 8 * sub
    ph, pw = comp_planes[0].shape
    mcux, mcuy = pw // mcu, ph // mcu

    def emit_block(ci, bi):
        dct_t, act_t = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
        blk = zz[ci][bi]
        diff = int(blk[0]) - pred[ci]
        pred[ci] = int(blk[0])
        t, code = _mag(diff)
        ln, cd = dct_t[t]
        wtr.write(cd, ln)
        wtr.write(code & ((1 << t) - 1), t)
        run = 0
        for k in range(1, 64):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, cd = act_t[0xF0]
                wtr.write(cd, ln)
                run -= 16
            t, code = _mag(v)
            ln, cd = act_t[(run << 4) | t]
            wtr.write(cd, ln)
            wtr.write(code & ((1 << t) - 1), t)
            run = 0
        if run:
            ln, cd = act_t[0x00]
            wtr.write(cd, ln)

    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(bands):
                reps = sub if (ci == 0 and sub == 2) else 1
                for v in range(reps):
                    for hh in range(reps):
                        by_ = my * reps + v
                        bx_ = mx * reps + hh
                        emit_block(ci, by_ * bx[ci] + bx_)
    wtr.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0

    def dqt(tq, q):
        zzq = q[ZIGZAG]
        body = bytes([tq]) + bytes(int(x) for x in zzq)
        return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body

    out += dqt(0, ql)
    if bands == 3:
        out += dqt(1, qc)
    ncomp = bands
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        hv = ((sub if ci == 0 else 1) << 4) | (sub if ci == 0 else 1)
        sof += bytes([ci + 1, hv, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof

    def dht(tc, th, spec):
        bits, vals = spec
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body

    out += dht(0, 0, DC_LUM) + dht(1, 0, AC_LUM)
    if bands == 3:
        out += dht(0, 1, DC_CHR) + dht(1, 1, AC_CHR)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, (0 if ci == 0 else 1) * 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (SOF2) — roundtrip oracle for the progressive decoder
# ---------------------------------------------------------------------------

# a universal Huffman table valid for EVERY rs symbol (254 8-bit codes +
# 2 9-bit) — progressive scans emit EOBn (r>0, s=0) symbols that Annex K's
# baseline tables cannot express, and a spec-legal fixed table keeps the
# encoder deterministic without a histogram pass
_UNIV = ([0, 0, 0, 0, 0, 0, 0, 254, 2, 0, 0, 0, 0, 0, 0, 0],
         list(range(256)))


def encode_jpeg_progressive(pixels: np.ndarray, quality: int = 90,
                            subsample: bool = False) -> bytes:
    """(bands, h, w) uint8 -> PROGRESSIVE (SOF2) JFIF bytes.

    Scan script exercises every T.81 G.2 decode path: interleaved DC
    first at Al=1, split spectral AC first scans at Al=1 (with EOBn run
    coalescing), AC refinement at Ah=1/Al=0 (new-coefficient insertion,
    ZRL-with-corrections, EOB-run correction tails), DC refinement.
    Quantized coefficients are IDENTICAL to `encode_jpeg` at the same
    quality, so decode(progressive) must equal decode(baseline) exactly
    — the roundtrip oracle in tests/test_jpeg.py."""
    h, w, zz, comp_planes, ql, qc, sub = _prep_components(
        pixels, quality, subsample)
    bands = len(comp_planes)
    univ = _build_encode_table(*_UNIV)
    bx = [p.shape[1] // 8 for p in comp_planes]
    by = [p.shape[0] // 8 for p in comp_planes]
    mcu = 8 * sub
    ph, pw = comp_planes[0].shape
    mcux, mcuy = pw // mcu, ph // mcu

    scans = []  # (header bytes, entropy bytes)

    def sos_header(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for ci in comp_ids:
            body += bytes([ci + 1, 0x00])  # DC/AC table 0 for all comps
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body

    # --- scan 1: DC first, interleaved, Al=1 ---------------------------
    wtr = _BitWriter()
    pred = [0] * bands

    def dc_first_block(ci, bi):
        v = int(zz[ci][bi][0]) >> 1  # arithmetic shift = DC point transform
        diff = v - pred[ci]
        pred[ci] = v
        t, code = _mag(diff)
        ln, cd = univ[t]
        wtr.write(cd, ln)
        wtr.write(code & ((1 << t) - 1), t)

    if bands == 1:
        for bi in range(by[0] * bx[0]):
            dc_first_block(0, bi)
    else:
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(bands):
                    reps = sub if (ci == 0 and sub == 2) else 1
                    for v in range(reps):
                        for hh in range(reps):
                            dc_first_block(
                                ci, (my * reps + v) * bx[ci] + mx * reps + hh)
    wtr.flush()
    scans.append((sos_header(list(range(bands)), 0, 0, 0, 1), bytes(wtr.out)))

    # --- AC first scans per component, split bands, Al=1 ----------------
    for ci in range(bands):
        for ss, se in ((1, 5), (6, 63)):
            wtr = _BitWriter()
            eob_run = 0

            def flush_eob():
                nonlocal eob_run
                while eob_run > 0:
                    r = min(eob_run.bit_length() - 1, 14)
                    ln, cd = univ[r << 4]
                    wtr.write(cd, ln)
                    extra = min(eob_run, (1 << (r + 1)) - 1) - (1 << r)
                    wtr.write(extra, r)
                    eob_run -= (1 << r) + extra

            for bi in range(by[ci] * bx[ci]):
                blk = zz[ci][bi]
                vals = [int(v) for v in blk[ss:se + 1]]
                pt = [(1 if v >= 0 else -1) * (abs(v) >> 1) for v in vals]
                if not any(pt):
                    eob_run += 1
                    if eob_run == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                last_nz = max(k for k, v in enumerate(pt) if v)
                run = 0
                for v in pt[:last_nz + 1]:
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, cd = univ[0xF0]
                        wtr.write(cd, ln)
                        run -= 16
                    t, code = _mag(v)
                    ln, cd = univ[(run << 4) | t]
                    wtr.write(cd, ln)
                    wtr.write(code & ((1 << t) - 1), t)
                    run = 0
                if last_nz < se - ss:
                    eob_run += 1
            flush_eob()
            wtr.flush()
            scans.append((sos_header([ci], ss, se, 0, 1), bytes(wtr.out)))

    # --- AC refinement per component, Ah=1 Al=0 --------------------------
    for ci in range(bands):
        wtr = _BitWriter()
        eob_run = 0
        held_bits: list[int] = []  # correction bits inside a pending EOB run

        def flush_eob_refine():
            nonlocal eob_run
            while eob_run > 0:
                r = min(eob_run.bit_length() - 1, 14)
                ln, cd = univ[r << 4]
                wtr.write(cd, ln)
                extra = min(eob_run, (1 << (r + 1)) - 1) - (1 << r)
                wtr.write(extra, r)
                eob_run -= (1 << r) + extra
            for b in held_bits:
                wtr.write(b, 1)
            held_bits.clear()

        for bi in range(by[ci] * bx[ci]):
            blk = zz[ci][bi]
            absv = [abs(int(v)) for v in blk[1:64]]
            sgn = [1 if int(v) >= 0 else 0 for v in blk[1:64]]
            eob_k = 0  # last newly-significant position (1-based band idx)
            for k, a in enumerate(absv):
                if a == 1:
                    eob_k = k + 1
            r = 0
            br: list[int] = []  # correction bits since last symbol
            emitted = False
            for k, a in enumerate(absv):
                kk = k + 1
                if a == 0:
                    r += 1
                    continue
                while r > 15 and kk <= eob_k:
                    flush_eob_refine()
                    ln, cd = univ[0xF0]
                    wtr.write(cd, ln)
                    r -= 16
                    for b in br:
                        wtr.write(b, 1)
                    br.clear()
                    emitted = True
                if a > 1:
                    br.append(a & 1)
                    continue
                flush_eob_refine()
                ln, cd = univ[(r << 4) | 1]
                wtr.write(cd, ln)
                wtr.write(sgn[k], 1)
                for b in br:
                    wtr.write(b, 1)
                br.clear()
                r = 0
                emitted = True
            if r > 0 or br:
                eob_run += 1
                held_bits.extend(br)
                if eob_run == 0x7FFF:
                    flush_eob_refine()
            elif not emitted:
                # completely empty band with nothing to correct: still a
                # member of the EOB run
                eob_run += 1
        flush_eob_refine()
        wtr.flush()
        scans.append((sos_header([ci], 1, 63, 1, 0), bytes(wtr.out)))

    # --- DC refinement, interleaved, Ah=1 Al=0 ---------------------------
    wtr = _BitWriter()

    def dc_refine_block(ci, bi):
        wtr.write(int(zz[ci][bi][0]) & 1, 1)

    if bands == 1:
        for bi in range(by[0] * bx[0]):
            dc_refine_block(0, bi)
    else:
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(bands):
                    reps = sub if (ci == 0 and sub == 2) else 1
                    for v in range(reps):
                        for hh in range(reps):
                            dc_refine_block(
                                ci, (my * reps + v) * bx[ci] + mx * reps + hh)
    wtr.flush()
    scans.append((sos_header(list(range(bands)), 0, 0, 1, 0), bytes(wtr.out)))

    # --- container -------------------------------------------------------
    out = bytearray(b"\xff\xd8")
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0

    def dqt(tq, q):
        zzq = q[ZIGZAG]
        body = bytes([tq]) + bytes(int(x) for x in zzq)
        return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body

    out += dqt(0, ql)
    if bands == 3:
        out += dqt(1, qc)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([bands])
    for ci in range(bands):
        hv = ((sub if ci == 0 else 1) << 4) | (sub if ci == 0 else 1)
        sof += bytes([ci + 1, hv, 0 if ci == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof

    def dht(tc, th, spec):
        bits, vals = spec
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body

    out += dht(0, 0, _UNIV) + dht(1, 0, _UNIV)
    for header, entropy in scans:
        out += header + entropy
    out += b"\xff\xd9"
    return bytes(out)
