"""Pure-stdlib/numpy BASELINE JPEG codec (ITU-T T.81 sequential DCT,
Huffman, 8-bit) — the last image-format seam (imagecodec handles
PNG/PNM): marker walk, DQT/DHT/SOF0/SOS parse, Huffman-decoded DCT
coefficients, dequantize → IDCT → level shift, YCbCr→RGB for 3-component
scans. The encode twin writes grayscale or 4:4:4 color with the spec's
Annex-K quantization and Huffman tables.

Scope (errors name anything else): baseline SOF0, 8-bit, 1 or 3
components, sampling factors up to 2x2 (4:4:4, 4:2:2, 4:4:0 and the
camera-standard 4:2:0 — chroma upsampled by pixel replication),
restart intervals (DRI/RSTn with DC-predictor reset and bit
realignment), no progressive/arithmetic coding.

Exactness contract for oracles (the dyadic-MLP trick applied to a
LOSSY codec): an image built of CONSTANT 8x8 blocks with even pixel
values survives encode→decode EXACTLY — FDCT of a constant block is
DC-only (8·(v−128)), the Annex-K DC quantizer is 16, and even v makes
round((v−128)/2) exact, so dequantize+IDCT reproduces v bit-for-bit.
q144 pins the whole pipeline on such fixtures with zero tolerance,
while gradient roundtrips are tested within the usual lossy bounds.
"""

from __future__ import annotations

import struct

import numpy as np

# -- Annex K tables ---------------------------------------------------------

QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# standard Huffman specs: (BITS counts per code length 1..16, values)
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
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
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# orthonormal 8-point DCT-II basis (float64)
_C = np.array(
    [
        [
            (np.sqrt(1.0 / 8) if k == 0 else np.sqrt(2.0 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


def _build_huffman(spec) -> dict[int, tuple[int, int]]:
    """Spec (BITS, values) → {value: (code, length)} per T.81 C.2."""
    counts, values = spec
    out: dict[int, tuple[int, int]] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[values[vi]] = (code, length)
            code += 1
            vi += 1
        code <<= 1
    return out


def _decode_table(spec) -> dict[tuple[int, int], int]:
    """{(code, length): value} for the decoder."""
    return {cl: v for v, cl in _build_huffman(spec).items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("entropy data exhausted mid-symbol")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated byte stuffing")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def expect_restart(self, m: int) -> None:
        """Byte-align and consume the RST(m) marker (T.81 E.2.4):
        restart boundaries discard partial bits and reset DC
        prediction in the caller."""
        self.nbits = 0
        self.acc = 0
        if self.pos + 2 > len(self.data):
            raise ValueError("missing restart marker")
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != 0xD0 + m:
            raise ValueError(
                f"expected RST{m} at byte {self.pos}, got "
                f"{self.data[self.pos:self.pos + 2]!r}"
            )
        self.pos += 2

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

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if (code, length) in table:
                return table[(code, length)]
        raise ValueError("invalid Huffman code in scan")


def _magnitude(v: int) -> tuple[int, int]:
    """DC/AC value → (category, appended bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    if bits < (1 << (cat - 1)):
        return bits - (1 << cat) + 1
    return bits


# -- encoder ---------------------------------------------------------------


def encode_jpeg(
    img: np.ndarray,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 → baseline JFIF bytes
    (Annex-K tables). `subsampling` is "444" or "420" (color only —
    chroma box-mean-subsampled 2x2, the camera-standard layout);
    `restart_interval` > 0 inserts RSTn markers every that many MCUs.
    Dimensions must be multiples of the MCU size (8, or 16 for 4:2:0)
    — fixture generation, not a general-purpose encoder."""
    a = np.asarray(img, dtype=np.uint8)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling {subsampling!r} unsupported")
    sub420 = subsampling == "420" and not gray
    mcu = 16 if sub420 else 8
    if h % mcu or w % mcu:
        raise ValueError(f"encoder requires multiple-of-{mcu} dimensions")

    if gray:
        planes = [a.astype(np.float64)]
        quants = [QUANT_LUMA]
    else:
        r = a[:, :, 0].astype(np.float64)
        g = a[:, :, 1].astype(np.float64)
        b = a[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if sub420:
            cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        planes = [y, cb, cr]
        quants = [QUANT_LUMA, QUANT_CHROMA, QUANT_CHROMA]

    dc_tabs = [_build_huffman(DC_LUMA_SPEC)] + (
        [] if gray else [_build_huffman(DC_CHROMA_SPEC)] * 2
    )
    ac_tabs = [_build_huffman(AC_LUMA_SPEC)] + (
        [] if gray else [_build_huffman(AC_CHROMA_SPEC)] * 2
    )

    bw = _BitWriter()
    pred = [0] * len(planes)

    def emit_block(ci: int, plane: np.ndarray, by: int, bx: int) -> None:
        block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
        coef = _fdct(block)
        q = np.round(coef / quants[ci]).astype(np.int64)
        zz = q.reshape(-1)[ZIGZAG]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        cat, bits = _magnitude(diff)
        code, ln = dc_tabs[ci][cat]
        bw.write(code, ln)
        if cat:
            bw.write(bits, cat)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_tabs[ci][0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            cat, bits = _magnitude(v)
            code, ln = ac_tabs[ci][(run << 4) | cat]
            bw.write(code, ln)
            bw.write(bits, cat)
            run = 0
        if run:
            code, ln = ac_tabs[ci][0x00]  # EOB
            bw.write(code, ln)

    mcus_y, mcus_x = h // mcu, w // mcu
    mcu_no = 0
    rst_m = 0
    scan_parts = []
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                scan_parts.append(bw.flush())
                scan_parts.append(bytes([0xFF, 0xD0 + rst_m]))
                rst_m = (rst_m + 1) % 8
                bw = _BitWriter()
                pred = [0] * len(planes)
            if sub420:
                for byy in range(2):
                    for bxx in range(2):
                        emit_block(0, planes[0], my * 2 + byy, mx * 2 + bxx)
                emit_block(1, planes[1], my, mx)
                emit_block(2, planes[2], my, mx)
            else:
                for ci, plane in enumerate(planes):
                    emit_block(ci, plane, my, mx)
            mcu_no += 1
    scan_parts.append(bw.flush())
    scan = b"".join(scan_parts)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(
        0xDB, bytes([0]) + bytes(QUANT_LUMA.reshape(-1)[ZIGZAG].astype(np.uint8))
    )
    if not gray:
        out += seg(
            0xDB,
            bytes([1]) + bytes(QUANT_CHROMA.reshape(-1)[ZIGZAG].astype(np.uint8)),
        )
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hv = 0x22 if (sub420 and ci == 0) else 0x11
        sof += bytes([ci + 1, hv, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    def dht(cls: int, tid: int, spec) -> bytes:
        counts, values = spec
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(counts) + bytes(values))

    out += dht(0, 0, DC_LUMA_SPEC) + dht(1, 0, AC_LUMA_SPEC)
    if not gray:
        out += dht(0, 1, DC_CHROMA_SPEC) + dht(1, 1, AC_CHROMA_SPEC)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos) + scan + b"\xff\xd9"  # EOI
    return out


# -- decoder ---------------------------------------------------------------


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JPEG bytes → uint8 (H, W) gray or (H, W, 3) RGB.
    Raises ValueError for anything outside the supported scope."""
    try:
        return _decode_jpeg(buf)
    except ValueError:
        raise
    except Exception as exc:  # struct.error, IndexError…
        raise ValueError(f"corrupt JPEG file: {exc}") from exc


def _decode_jpeg(buf: bytes) -> np.ndarray:
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file (no SOI)")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    comps = []
    scan_comps = None
    scan_start = None
    restart_interval = 0
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack(">H", buf[pos + 2 : pos + 4])
        body = buf[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(
                    body[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int32)
                quants[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 0xF
                counts = list(body[p + 1 : p + 17])
                nvals = sum(counts)
                values = list(body[p + 17 : p + 17 + nvals])
                huff[(cls, tid)] = _decode_table((counts, values))
                p += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"{prec}-bit precision unsupported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + ci * 3 : 9 + ci * 3]
                hf, vf = hv >> 4, hv & 0xF
                if hf not in (1, 2) or vf not in (1, 2):
                    raise ValueError(
                        f"sampling factor {hf}x{vf} unsupported (1-2 only)"
                    )
                comps.append({"id": cid, "tq": tq, "h": hf, "v": vf})
            frame = (fh, fw, nc)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"SOF{marker - 0xC0} unsupported (baseline only)")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for si in range(ns):
                cs, tabs = body[1 + si * 2], body[2 + si * 2]
                scan_comps.append((cs, tabs >> 4, tabs & 0xF))
            scan_start = pos + 2 + ln
            break
        pos += 2 + ln
    if frame is None or scan_start is None:
        raise ValueError("missing SOF0 or SOS")
    fh, fw, nc = frame

    # entropy-coded data runs until the EOI marker
    end = buf.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("missing EOI")
    br = _BitReader(buf[scan_start:end])

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (fw + mcu_w - 1) // mcu_w
    mcus_y = (fh + mcu_h - 1) // mcu_h
    # SOF0 dimensions are raw 2-byte fields: bound the plane allocation
    # against the entropy data actually present BEFORE allocating
    # (65535x65535x3 would demand ~100 GB) — every MCU costs at least
    # 4 bits per block (DC category + EOB), the grib2-ng fuzzer-class
    # policy
    n_blocks_per_mcu = sum(c["h"] * c["v"] for c in comps)
    min_bits = mcus_x * mcus_y * n_blocks_per_mcu * 4
    if min_bits > 8 * max(len(buf) - scan_start, 0):
        raise ValueError(
            f"frame declares {mcus_x * mcus_y} MCUs but the scan holds "
            f"only {len(buf) - scan_start} bytes"
        )
    # each component's plane at ITS OWN resolution
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8)) for c in comps
    ]
    pred = [0] * nc

    def decode_block(ci: int) -> np.ndarray:
        _, dc_t, ac_t = scan_comps[ci]
        q = quants[comps[ci]["tq"]]
        dct = huff.get((0, dc_t))
        act = huff.get((1, ac_t))
        if dct is None or act is None:
            raise ValueError("scan references undefined Huffman table")
        zz = np.zeros(64, dtype=np.int64)
        cat = br.read_symbol(dct)
        diff = _extend(br.read_bits(cat), cat) if cat else 0
        pred[ci] += diff
        zz[0] = pred[ci]
        k = 1
        while k < 64:
            rs = br.read_symbol(act)
            run, cat = rs >> 4, rs & 0xF
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += run
            if k > 63:
                raise ValueError("AC run past block end")
            zz[k] = _extend(br.read_bits(cat), cat)
            k += 1
        coef = np.zeros(64, dtype=np.float64)
        coef[ZIGZAG] = zz * q.reshape(-1)[ZIGZAG]
        return _idct(coef.reshape(8, 8)) + 128.0

    mcu_no = 0
    rst_m = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                br.expect_restart(rst_m)
                rst_m = (rst_m + 1) % 8
                pred = [0] * nc
            for ci, c in enumerate(comps):
                for byy in range(c["v"]):
                    for bxx in range(c["h"]):
                        block = decode_block(ci)
                        y0 = (my * c["v"] + byy) * 8
                        x0 = (mx * c["h"] + bxx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_no += 1

    # upsample subsampled components to frame resolution by pixel
    # replication, then crop
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] < hmax:
            p = np.repeat(p, hmax // c["h"], axis=1)
        if c["v"] < vmax:
            p = np.repeat(p, vmax // c["v"], axis=0)
        full.append(p[:fh, :fw])
    planes = full
    if nc == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if nc != 3:
        raise ValueError(f"{nc}-component scans unsupported")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)
