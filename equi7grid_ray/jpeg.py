"""Pure-numpy baseline JPEG codec (ITU-T T.81 sequential DCT, 8-bit).

Real 100-TB image crawls are overwhelmingly JPEG; the sandbox has no
imaging library, so this implements the container and entropy layer
directly:

- decoder: SOI/APPn/DQT/SOF0/DHT/DRI/SOS/EOI parsing, Huffman decode of
  the interleaved MCU stream (16-bit-peek LUT, one table probe per
  symbol), restart markers, dequantize, vectorized 8x8 IDCT (one einsum
  over all blocks per component), chroma upsampling (1x1/2x1/1x2/2x2
  sampling factors), JFIF YCbCr->RGB,
- encoder: 4:4:4 or 4:2:0 baseline with the T.81 Annex K quantization
  and Huffman tables, libjpeg quality scaling, vectorized FDCT.

Decoder and encoder share only the constant tables -- decode parity
tests run against independently-computed pixels.  The per-symbol
Huffman loop is the one Python-level loop (entropy decoding is
inherently bit-serial); everything after it is vectorized numpy.
Throughput is bounded by that loop (~1-3 us/symbol); for the engine's
batch stages each worker decodes independent images, so the Ray-side
scaling story is unchanged.

Stands in for the reference's rasterio/GDAL JPEG path the way codec.py
does for PNG (reference warp.py:290-330 reads whatever GDAL can)."""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg_baseline", "jpeg_info"]

# --- constant tables (ITU-T T.81 Annex K) -----------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# Annex K Huffman specs: (bits[1..16] counts, values)
DC_LUMA_SPEC = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
DC_CHROMA_SPEC = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# 8x8 DCT-II orthonormal matrix: M[u, x] = c(u) cos((2x+1) u pi / 16)
_x = np.arange(8)
_DCT_M = np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16.0) * 0.5
_DCT_M[0] *= 1.0 / np.sqrt(2.0)


def _canonical_codes(bits: list[int]) -> list[tuple[int, int]]:
    """T.81 canonical code assignment: list of (code, length) in value
    order."""
    out = []
    code = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out.append((code, ln))
            code += 1
        code <<= 1
    return out


def _decode_lut(spec) -> tuple[np.ndarray, np.ndarray]:
    """(symbol, length) LUTs indexed by a 16-bit peek.  Entries not
    covered by any code hold length 0 (invalid stream)."""
    bits, values = spec
    sym = np.zeros(1 << 16, dtype=np.uint8)
    ln = np.zeros(1 << 16, dtype=np.uint8)
    for (code, length), v in zip(_canonical_codes(bits), values):
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        sym[lo:hi] = v
        ln[lo:hi] = length
    return sym, ln


class _BitReader:
    """MSB-first bit cursor over the unstuffed entropy byte stream."""

    __slots__ = ("data", "pos", "bitbuf", "bitcnt")

    def __init__(self, data: np.ndarray):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.bitcnt = 0

    def _fill(self, need: int) -> None:
        while self.bitcnt < need:
            b = int(self.data[self.pos]) if self.pos < len(self.data) else 0
            self.pos += 1
            self.bitbuf = ((self.bitbuf << 8) | b) & 0xFFFFFFFF
            self.bitcnt += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.bitbuf >> (self.bitcnt - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.bitcnt -= n

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = (self.bitbuf >> (self.bitcnt - n)) & ((1 << n) - 1)
        self.bitcnt -= n
        return v


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 sign extension of a SIZE-bit magnitude."""
    if size and v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients -> (n, 8, 8) pixel residuals
    (one einsum pair, vectorized over all blocks)."""
    return np.einsum("ui,nuv,vj->nij", _DCT_M, coefs, _DCT_M, optimize=True)


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ui,nij,vj->nuv", _DCT_M, blocks, _DCT_M, optimize=True)


def jpeg_info(buf: bytes) -> dict:
    """Cheap header scan: (width, height, n_components, subsampling) from
    the SOF0 marker only -- no entropy decode (the metadata-only path a
    crawl filter uses)."""
    mv = memoryview(buf)
    if bytes(mv[:2]) != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    i = 2
    while i + 4 <= len(mv):
        if mv[i] != 0xFF:
            raise ValueError("bad marker sync")
        marker = mv[i + 1]
        if marker in (0xC0, 0xC1):
            ln, prec, h, w, nc = struct.unpack_from(">HBHHB", mv, i + 2)
            samp = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from("BBB", mv, i + 10 + 3 * c)
                samp.append((hv >> 4, hv & 15))
            return {"width": w, "height": h, "components": nc,
                    "precision": prec, "sampling": samp}
        if marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF{marker - 0xC0})")
        ln = struct.unpack_from(">H", mv, i + 2)[0]
        i += 2 + ln
    raise ValueError("no SOF marker found")


def decode_jpeg(buf: bytes | memoryview,
                max_pixels: int = 64_000_000) -> np.ndarray:
    """Decode a baseline JPEG to (h, w) uint8 grayscale or (h, w, 3)
    uint8 RGB.  ``max_pixels`` guards against decompression bombs /
    corrupted SOF dimensions (a crawl decoder must bound allocation
    BEFORE trusting header fields)."""
    mv = np.frombuffer(buf, dtype=np.uint8)
    if mv[0] != 0xFF or mv[1] != 0xD8:
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    frame = None
    restart_interval = 0
    i = 2
    n = len(mv)
    while i + 2 <= n:
        if mv[i] != 0xFF:
            raise ValueError(f"bad marker sync at {i}")
        marker = int(mv[i + 1])
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        ln = int(mv[i]) << 8 | int(mv[i + 1])
        seg = mv[i + 2: i + ln]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    tbl = (seg[p:p + 128:2].astype(np.int64) << 8) \
                        | seg[p + 1:p + 128:2]
                    p += 128
                else:
                    tbl = seg[p:p + 64].astype(np.int64)
                    p += 64
                q = np.zeros(64, np.int64)
                q[ZIGZAG] = tbl
                qt[tq] = q.reshape(8, 8)
        elif marker in (0xC0, 0xC1):  # SOF0/1 (baseline)
            prec, fh, fw, nc = seg[0], int(seg[1]) << 8 | int(seg[2]), \
                int(seg[3]) << 8 | int(seg[4]), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            if int(fw) * int(fh) > max_pixels:
                raise ValueError(
                    f"frame {int(fw)}x{int(fh)} exceeds max_pixels="
                    f"{max_pixels} (decompression-bomb guard)")
            if int(fw) == 0 or int(fh) == 0 or nc == 0:
                raise ValueError("degenerate SOF dimensions")
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"{nc}-component JPEG (CMYK/YCCK) unsupported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c: 9 + 3 * c]
                sf_h, sf_v = int(hv) >> 4, int(hv) & 15
                if not (1 <= sf_h <= 4 and 1 <= sf_v <= 4):
                    raise ValueError(f"invalid sampling factors {sf_h}x{sf_v}")
                comps.append({"id": int(cid), "h": sf_h,
                              "v": sf_v, "tq": int(tq)})
            frame = {"w": int(fw), "h": int(fh), "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF{marker - 0xC0})")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = seg[p + 1: p + 17].tolist()
                nv = sum(bits)
                vals = seg[p + 17: p + 17 + nv].tolist()
                huff[(tc, th)] = _decode_lut((bits, vals))
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = int(seg[0]) << 8 | int(seg[1])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scomp = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                matches = [x for x in frame["comps"] if x["id"] == cs]
                if not matches:
                    raise ValueError(f"SOS references unknown component {cs}")
                scomp.append((matches[0], int(tdta) >> 4, int(tdta) & 15))
            i += ln
            return _decode_scan(mv, i, frame, scomp, qt, huff,
                                restart_interval)
        i += ln
    raise ValueError("no SOS marker found")


def _unstuff(data: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Remove 0xFF00 stuffing; return (bytes, positions of restart
    markers in the UNSTUFFED stream)."""
    ff = data == 0xFF
    nxt = np.zeros_like(data)
    nxt[:-1] = data[1:]
    drop = np.zeros(len(data), bool)
    # drop the 0x00 after a 0xFF (stuffing) and both bytes of RSTn
    stuff = ff & (nxt == 0)
    drop[1:] |= stuff[:-1]
    rst = ff & (nxt >= 0xD0) & (nxt <= 0xD7)
    drop |= rst
    drop[1:] |= rst[:-1]
    keep = ~drop
    out = data[keep]
    # restart-marker positions mapped into the unstuffed stream
    rpos = np.cumsum(keep)[rst] if rst.any() else np.empty(0, np.int64)
    return out, rpos.astype(np.int64)


def _decode_scan(mv, start, frame, scomp, qt, huff, restart_interval):
    # entropy stream runs to EOI (FFD9) or next non-RST marker
    data = mv[start:]
    # find end: first 0xFF followed by a marker that is not 00 / RSTn
    ff_idx = np.flatnonzero(data[:-1] == 0xFF)
    end = len(data)
    for j in ff_idx:
        b = data[j + 1]
        if b != 0 and not (0xD0 <= b <= 0xD7):
            end = j
            break
    stream, _ = _unstuff(data[:end])
    r = _BitReader(stream)

    w, h = frame["w"], frame["h"]
    comps = [c for c, _, _ in scomp]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    n_mcu = mcux * mcuy

    # per component: coefficient store (n_blocks, 64) in zigzag order
    stores = []
    for c, _, _ in scomp:
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        stores.append(np.zeros((bh * bw, 64), np.int64))

    dc_pred = [0] * len(scomp)
    mcu_since_rst = 0
    for m in range(n_mcu):
        if restart_interval and mcu_since_rst == restart_interval:
            # byte-align and reset predictors (markers already stripped)
            r.bitcnt -= r.bitcnt % 8
            dc_pred = [0] * len(scomp)
            mcu_since_rst = 0
        my, mx = divmod(m, mcux)
        for ci, (c, td, ta) in enumerate(scomp):
            dsym, dlen = huff[(0, td)]
            asym, alen = huff[(1, ta)]
            bw = mcux * c["h"]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk = stores[ci][(my * c["v"] + by) * bw
                                     + mx * c["h"] + bx]
                    # DC
                    p16 = r.peek16()
                    size = int(dsym[p16])
                    ln = int(dlen[p16])
                    if ln == 0:
                        raise ValueError("invalid Huffman code (DC)")
                    r.skip(ln)
                    diff = _extend(r.read(size), size)
                    dc_pred[ci] += diff
                    if not (-(1 << 31) < dc_pred[ci] < (1 << 31)):
                        # valid streams keep |DC| < 2^15 * n_blocks;
                        # runaway prediction means a corrupt bitstream
                        raise ValueError("corrupt DC prediction stream")
                    blk[0] = dc_pred[ci]
                    # AC
                    k = 1
                    while k < 64:
                        p16 = r.peek16()
                        rs = int(asym[p16])
                        ln = int(alen[p16])
                        if ln == 0:
                            raise ValueError("invalid Huffman code (AC)")
                        r.skip(ln)
                        rrr, ssss = rs >> 4, rs & 15
                        if ssss == 0:
                            if rrr == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += rrr
                        if k > 63:
                            raise ValueError("AC run overflows block")
                        blk[k] = _extend(r.read(ssss), ssss)
                        k += 1
        mcu_since_rst += 1

    # dequantize + IDCT per component, vectorized
    planes = []
    for (c, _, _), store in zip(scomp, stores):
        q = qt[c["tq"]].reshape(-1)[ZIGZAG]  # zigzag-ordered quant
        coefs = (store * q)[:, UNZIGZAG].reshape(-1, 8, 8)
        px = _idct_blocks(coefs) + 128.0
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        plane = px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(bh * 8, bw * 8)
        # upsample to full MCU grid resolution
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# --- encoder ----------------------------------------------------------------

def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling of a base table."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (q * s + 50) // 100
    return np.clip(t, 1, 255)


class _BitWriter:
    __slots__ = ("out", "bitbuf", "bitcnt")

    def __init__(self):
        self.out = bytearray()
        self.bitbuf = 0
        self.bitcnt = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.bitbuf = (self.bitbuf << length) | (code & ((1 << length) - 1))
        self.bitcnt += length
        while self.bitcnt >= 8:
            b = (self.bitbuf >> (self.bitcnt - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # stuffing
            self.bitcnt -= 8
        self.bitbuf &= (1 << self.bitcnt) - 1

    def flush(self) -> None:
        if self.bitcnt:
            pad = 8 - self.bitcnt
            self.write((1 << pad) - 1, pad)

    def restart(self, n: int) -> None:
        """Byte-align and emit RSTn (bypasses 0xFF stuffing)."""
        self.flush()
        self.out += bytes([0xFF, 0xD0 + (n % 8)])


def _enc_tables(spec):
    bits, values = spec
    codes = {}
    for (code, length), v in zip(_canonical_codes(bits), values):
        codes[v] = (code, length)
    return codes


def _csize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_component_blocks(wtr, blocks_q, dc_codes, ac_codes, dc_pred):
    """blocks_q: (n, 64) zigzag-quantized int coefficients, MCU order."""
    for blk in blocks_q:
        diff = int(blk[0]) - dc_pred
        dc_pred = int(blk[0])
        size = _csize(diff)
        code, ln = dc_codes[size]
        wtr.write(code, ln)
        if size:
            wtr.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
        nz = np.flatnonzero(blk[1:]) + 1
        k = 1
        for pos in nz:
            run = int(pos) - k
            while run >= 16:
                code, ln = ac_codes[0xF0]
                wtr.write(code, ln)
                run -= 16
            v = int(blk[pos])
            size = _csize(v)
            code, ln = ac_codes[(run << 4) | size]
            wtr.write(code, ln)
            wtr.write(v if v >= 0 else v + (1 << size) - 1, size)
            k = int(pos) + 1
        if k < 64:
            code, ln = ac_codes[0x00]  # EOB
            wtr.write(code, ln)
    return dc_pred


def _plane_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Pad a plane to 8-multiples (edge replicate), FDCT, quantize,
    zigzag: (n_blocks, 64) in raster block order."""
    h, w = plane.shape
    H = (h + 7) // 8 * 8
    W = (w + 7) // 8 * 8
    pad = np.empty((H, W), np.float64)
    pad[:h, :w] = plane
    if H > h:
        pad[h:, :w] = plane[-1:, :]
    if W > w:
        pad[:, w:] = pad[:, w - 1: w]
    blocks = pad.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, 8, 8) - 128.0
    coefs = _fdct_blocks(blocks)
    qz = np.rint(coefs / q[None]).astype(np.int64)
    return qz.reshape(-1, 64)[:, ZIGZAG]


def encode_jpeg_baseline(img: np.ndarray, quality: int = 85,
                         subsampling: str = "444",
                         restart_interval: int = 0) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 as baseline JPEG
    with the Annex K tables.  ``subsampling``: '444', '420', '422' or '440' (RGB
    only).  ``restart_interval`` > 0 emits a DRI segment and RSTn
    markers every N MCUs (DC predictors reset, byte-aligned)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("uint8 input required")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("expected (h, w) or (h, w, 3)")
    if subsampling not in ("444", "420", "422", "440"):
        raise ValueError("subsampling must be one of 444/420/422/440")
    h, w = img.shape[:2]
    qy = _quality_scale(Q_LUMA, quality).astype(np.float64)
    qc = _quality_scale(Q_CHROMA, quality).astype(np.float64)

    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"

    def seg(marker: bytes, payload: bytes) -> None:
        out.extend(marker + struct.pack(">H", len(payload) + 2) + payload)

    zz = lambda q: bytes(int(v) for v in q.reshape(-1)[ZIGZAG])  # noqa: E731
    seg(b"\xff\xdb", b"\x00" + zz(qy))
    if not gray:
        seg(b"\xff\xdb", b"\x01" + zz(qc))

    sub = {"444": (1, 1), "420": (2, 2), "422": (2, 1),
           "440": (1, 2)}[subsampling] if not gray else (1, 1)
    if gray:
        comp_spec = [(1, 1, 1, 0)]
    else:
        comp_spec = [(1, sub[0], sub[1], 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comp_spec)])
    for cid, ch, cv, tq in comp_spec:
        sof += bytes([cid, (ch << 4) | cv, tq])
    seg(b"\xff\xc0", sof)

    def dht(tc, th, spec):
        bits, values = spec
        seg(b"\xff\xc4", bytes([(tc << 4) | th]) + bytes(bits) + bytes(values))

    dht(0, 0, DC_LUMA_SPEC)
    dht(1, 0, AC_LUMA_SPEC)
    if not gray:
        dht(0, 1, DC_CHROMA_SPEC)
        dht(1, 1, AC_CHROMA_SPEC)

    if restart_interval:
        seg(b"\xff\xdd", struct.pack(">H", restart_interval))

    sos = bytes([len(comp_spec)])
    for cid, _, _, tq in comp_spec:
        sos += bytes([cid, 0x00 if tq == 0 else 0x11])
    sos += bytes([0, 63, 0])
    seg(b"\xff\xda", sos)

    # color transform
    if gray:
        planes = [img.astype(np.float64)]
        qs = [qy]
    else:
        r, g, b = (img[..., k].astype(np.float64) for k in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        sh, sv = sub
        if (sh, sv) != (1, 1):
            H2 = (h + sv - 1) // sv * sv
            W2 = (w + sh - 1) // sh * sh

            def ds(p):
                pp = np.empty((H2, W2))
                pp[:h, :w] = p
                if H2 > h:
                    pp[h:, :w] = p[h - 1: h, :w]
                if W2 > w:
                    pp[:, w:] = pp[:, w - 1: w]
                return pp.reshape(H2 // sv, sv, W2 // sh, sh).mean(axis=(1, 3))

            cb, cr = ds(cb), ds(cr)
        planes = [y, cb, cr]
        qs = [qy, qc, qc]

    enc_dc = [_enc_tables(DC_LUMA_SPEC)] + \
        ([] if gray else [_enc_tables(DC_CHROMA_SPEC)] * 2)
    enc_ac = [_enc_tables(AC_LUMA_SPEC)] + \
        ([] if gray else [_enc_tables(AC_CHROMA_SPEC)] * 2)

    wtr = _BitWriter()
    n_rst = 0
    since_rst = 0

    def maybe_restart(dc_pred):
        nonlocal n_rst, since_rst
        since_rst += 1
        if restart_interval and since_rst == restart_interval:
            wtr.restart(n_rst)
            n_rst += 1
            since_rst = 0
            return [0] * len(dc_pred)
        return dc_pred

    if gray or subsampling == "444":
        # interleaved 1x1: one block per component per MCU
        comp_blocks = [_plane_blocks(p, q) for p, q in zip(planes, qs)]
        n_blocks = comp_blocks[0].shape[0]
        dc_pred = [0] * len(planes)
        for bi in range(n_blocks):
            for ci in range(len(planes)):
                dc_pred[ci] = _encode_component_blocks(
                    wtr, comp_blocks[ci][bi:bi + 1], enc_dc[ci],
                    enc_ac[ci], dc_pred[ci])
            dc_pred = maybe_restart(dc_pred)
    else:
        # subsampled: MCU = (sv x sh) Y blocks + 1 Cb + 1 Cr
        sh, sv = sub
        yb = _plane_blocks(planes[0], qs[0])
        cbb = _plane_blocks(planes[1], qs[1])
        crb = _plane_blocks(planes[2], qs[2])
        ybw = (w + 7) // 8
        ybh = (h + 7) // 8
        cbw = (planes[1].shape[1] + 7) // 8
        mcux = (w + 8 * sh - 1) // (8 * sh)
        mcuy = (h + 8 * sv - 1) // (8 * sv)
        # pad the Y block grid to MCU multiples (replicate edge blocks:
        # any valid coefficients do; decode is cropped to (h, w))
        yg = np.zeros((mcuy * sv, mcux * sh, 64), np.int64)
        yg[:ybh, :ybw] = yb.reshape(ybh, ybw, 64)
        if mcuy * sv > ybh:
            yg[ybh:, :ybw] = yg[ybh - 1: ybh, :ybw]
        if mcux * sh > ybw:
            yg[:, ybw:] = yg[:, ybw - 1][:, None]
        cg = cbb.reshape(-1, cbw, 64)
        rg = crb.reshape(-1, cbw, 64)
        dc3 = [0, 0, 0]
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(sv):
                    for bx in range(sh):
                        dc3[0] = _encode_component_blocks(
                            wtr, yg[sv * my + by, sh * mx + bx][None],
                            enc_dc[0], enc_ac[0], dc3[0])
                dc3[1] = _encode_component_blocks(
                    wtr, cg[my, mx][None], enc_dc[1], enc_ac[1], dc3[1])
                dc3[2] = _encode_component_blocks(
                    wtr, rg[my, mx][None], enc_dc[2], enc_ac[2], dc3[2])
                dc3 = maybe_restart(dc3)
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
