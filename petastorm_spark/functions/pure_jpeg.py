"""Pure-python baseline JPEG decoder (ITU-T T.81 / JFIF) on numpy.

Decode-only fallback backend for :class:`CompressedImageCodec` when no
image library (PIL/OpenCV) is importable — real ``.jpg`` byte streams
written by any standard encoder decode to numpy arrays. Parity
surface: the reference decodes jpeg via OpenCV
(/root/reference/petastorm/codecs.py:58-130); training feeds only ever
exercise the read path, so encode stays gated on PIL.

Scope (enough for tensor-codec parity, not a general JPEG library):

  - baseline DCT (SOF0) and extended sequential (SOF1), 8-bit;
  - grayscale or 3-component YCbCr, any integer sampling-factor
    combination (4:4:4, 4:2:2, 4:2:0 all covered);
  - restart intervals (DRI / RSTn);
  - interleaved single-scan frames, plus single-component scans.

Progressive (SOF2), hierarchical, arithmetic-coded, and 12-bit frames
raise NotImplementedError.
"""

from __future__ import annotations

import numpy as np

# Zigzag scan order: stream index k -> (row, col) in the 8x8 block.
# Generated, not transcribed: diagonal d runs bottom-left->top-right
# when even, top-right->bottom-left when odd (T.81 figure A.6).
_ZZ = [
    (r, d - r)
    for d in range(15)
    for r in (
        range(min(d, 7), max(0, d - 7) - 1, -1)
        if d % 2 == 0
        else range(max(0, d - 7), min(d, 7) + 1)
    )
]
_ZIG_ROW = np.array([r for r, _ in _ZZ])
_ZIG_COL = np.array([c for _, c in _ZZ])

# 8x8 IDCT basis: f = M @ F @ M.T with M[x, u] = c(u)/2 cos((2x+1)u pi/16)
_IDCT_M = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for u in range(8)
        ]
        for x in range(8)
    ]
)


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy-coded segment."""

    __slots__ = ("data", "pos", "val", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.val = 0
        self.nbits = 0

    def receive(self, n: int) -> int:
        while self.nbits < n:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.val = (self.val << 8) | b
            self.nbits += 8
        self.nbits -= n
        out = (self.val >> self.nbits) & ((1 << n) - 1)
        self.val &= (1 << self.nbits) - 1
        return out


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map the s-bit magnitude code to its signed value."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _build_huffman(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman table: (code_length, code) -> symbol."""
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


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.receive(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("corrupt JPEG: invalid Huffman code")


def _decode_block(br, dc_tbl, ac_tbl, pred: int, qtab: np.ndarray):
    """One 8x8 block: Huffman -> dequant -> IDCT. Returns (pixels, pred)."""
    coef = np.zeros(64)
    s = _huff_decode(br, dc_tbl)
    pred += _extend(br.receive(s), s) if s else 0
    coef[0] = pred * qtab[0]
    k = 1
    while k < 64:
        rs = _huff_decode(br, ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                break  # EOB
            k += 16  # ZRL: 16 zeros
            continue
        k += r
        if k > 63:
            raise ValueError("corrupt JPEG: AC index past block end")
        coef[k] = _extend(br.receive(s), s) * qtab[k]
        k += 1
    block = np.zeros((8, 8))
    block[_ZIG_ROW, _ZIG_COL] = coef  # qtab is stored zigzag too
    return _IDCT_M @ block @ _IDCT_M.T + 128.0, pred


def _split_entropy(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff the entropy-coded data from ``start``; split on RSTn.
    Returns (segments, index of the next real marker's 0xFF)."""
    segments: list[bytes] = []
    cur = bytearray()
    j = start
    n = len(data)
    while j < n:
        b = data[j]
        if b != 0xFF:
            cur.append(b)
            j += 1
            continue
        nb = data[j + 1] if j + 1 < n else 0xD9
        if nb == 0x00:
            cur.append(0xFF)
            j += 2
        elif 0xD0 <= nb <= 0xD7:
            segments.append(bytes(cur))
            cur = bytearray()
            j += 2
        else:
            break
    segments.append(bytes(cur))
    return segments, j


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes to (H, W) uint8 grayscale or
    (H, W, 3) uint8 RGB (JFIF YCbCr -> RGB conversion)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG byte stream (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    i = 2
    while i < len(data) - 1:
        if data[i] != 0xFF:
            i += 1  # padding/garbage between segments
            continue
        m = data[i + 1]
        i += 2
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            continue
        if m == 0xD9:  # EOI
            break
        ln = int.from_bytes(data[i : i + 2], "big")
        seg = data[i + 2 : i + ln]
        i += ln
        if m == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq:  # 16-bit table
                    qt[tq] = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.float64)
                    p += 128
                else:
                    qt[tq] = np.frombuffer(
                        seg[p : p + 64], dtype=np.uint8
                    ).astype(np.float64)
                    p += 64
        elif m in (0xC0, 0xC1):  # SOF0/SOF1: baseline-decodable
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline/extended-sequential JPEG is supported "
                f"(SOF marker 0xFF{m:02X})"
            )
        elif m == 0xC4:  # DHT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = seg[p + 17 : p + 17 + nv]
                huff[(tc, th)] = _build_huffman(bits, vals)
                p += 17 + nv
        elif m == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif m == 0xDA:  # SOS -> entropy-coded data follows
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c : 3 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, huff[(0, tables >> 4)], huff[(1, tables & 0x0F)]))
            segments, i = _split_entropy(data, i)
            _decode_scan(frame, scan, qt, segments, restart_interval)
        # else: APPn / COM / DNL etc. — skipped
    if frame is None or "planes" not in frame:
        raise ValueError("corrupt JPEG: no decoded scan")
    return _assemble(frame)


def _decode_scan(frame, scan, qt, segments, restart_interval) -> None:
    """Decode one (baseline: the only) scan into per-component planes."""
    h, w = frame["h"], frame["w"]
    max_h = max(c["h"] for c in frame["comps"])
    max_v = max(c["v"] for c in frame["comps"])
    planes = frame.setdefault("planes", {})
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    for comp, _, _ in scan:
        planes.setdefault(
            comp["id"],
            np.zeros((mcus_y * comp["v"] * 8, mcus_x * comp["h"] * 8)),
        )
    pred = {comp["id"]: 0 for comp, _, _ in scan}
    seg_iter = iter(segments)
    br = _BitReader(next(seg_iter))
    interleaved = len(scan) > 1

    if interleaved:
        total_mcus = mcus_x * mcus_y
        units = [
            (comp, dc, ac, by, bx)
            for comp, dc, ac in scan
            for by in range(comp["v"])
            for bx in range(comp["h"])
        ]
        for mcu in range(total_mcus):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br = _BitReader(next(seg_iter))  # RSTn: realign + reset DC
                pred = dict.fromkeys(pred, 0)
            my, mx = divmod(mcu, mcus_x)
            for comp, dc, ac, by, bx in units:
                pix, pred[comp["id"]] = _decode_block(
                    br, dc, ac, pred[comp["id"]], qt[comp["tq"]]
                )
                y0 = (my * comp["v"] + by) * 8
                x0 = (mx * comp["h"] + bx) * 8
                planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = pix
    else:
        comp, dc, ac = scan[0]
        # non-interleaved: the scan covers the component's own sampled
        # resolution, one block per MCU
        cw = -(-(w * comp["h"]) // max_h)
        ch = -(-(h * comp["v"]) // max_v)
        bw, bh = -(-cw // 8), -(-ch // 8)
        plane = planes[comp["id"]]
        if plane.shape[0] < bh * 8 or plane.shape[1] < bw * 8:
            grown = np.zeros((max(plane.shape[0], bh * 8), max(plane.shape[1], bw * 8)))
            grown[: plane.shape[0], : plane.shape[1]] = plane
            planes[comp["id"]] = plane = grown
        for blk in range(bw * bh):
            if restart_interval and blk and blk % restart_interval == 0:
                br = _BitReader(next(seg_iter))
                pred = dict.fromkeys(pred, 0)
            by, bx = divmod(blk, bw)
            pix, pred[comp["id"]] = _decode_block(
                br, dc, ac, pred[comp["id"]], qt[comp["tq"]]
            )
            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = pix


def _assemble(frame) -> np.ndarray:
    """Upsample component planes to full resolution, convert to RGB."""
    h, w = frame["h"], frame["w"]
    max_h = max(c["h"] for c in frame["comps"])
    max_v = max(c["v"] for c in frame["comps"])
    full = []
    for comp in frame["comps"]:
        plane = frame["planes"][comp["id"]]
        plane = np.repeat(plane, max_v // comp["v"], axis=0)
        plane = np.repeat(plane, max_h // comp["h"], axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        return np.clip(full[0], 0, 255).astype(np.uint8)
    if len(full) != 3:
        raise NotImplementedError(f"{len(full)}-component JPEG not supported")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(rgb, 0, 255).astype(np.uint8)
