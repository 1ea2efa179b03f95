"""Executable specification of the .dwt bitstream (sequential, host-side).

This is a from-scratch behavioral model of the reference codec's bitstream
(reference: encode.c / decode.c and the bits/vli/rle header stack), written
in plain Python + numpy.  It is NOT the production path — the TPU pipeline
in ``dwt_tpu.codec`` is — but serves three roles:

1. Intermediate oracle: the parallel JAX encoder must produce byte-identical
   output; debugging against this model localizes failures far better than
   diffing against the reference binary.
2. Specification: every format rule lives here in readable form with
   citations to the reference's file:line.
3. Fallback: a tiny pure-Python codec for environments without TPU/compiler.

Format contract (reference encode.c:169-221, SURVEY.md §2.2):
  header:  'W', '5'|'6', (w-1) LE16, (h-1) LE16
  bit stream (LSB-first within each byte, bits.h:58-68):
    per channel: root band coder (encode.c:97-110)
    per channel: VLI(planes)            (encode.c:181-182)
    layered bitplane data               (schedule encode.c:183-220)
    final VLI(trailing zero run)        (rle_flush, rle.h:37-40)
"""

from __future__ import annotations

import numpy as np

from .geometry import Pyramid, compute_pyramid, ilog2
from .hilbert import linearization_perm, reconstruction_perm


def tdiv(a, p):
    """C truncation-toward-zero division by positive p (cdf53.h uses /2, /4)."""
    a = np.asarray(a)
    return (a + np.where(a < 0, p - 1, 0)) // p


# ---------------------------------------------------------------------------
# Color transform — reversible YCoCg-R lifting (reference image.h:39-79)
# ---------------------------------------------------------------------------

def rgb_to_ycocg(img: np.ndarray) -> np.ndarray:
    """img: (..., 3) int32 RGB -> YCoCg-R.  Lifting: U=R-B; T=B+U/2; V=G-T; Y=T+V/2."""
    R, G, B = img[..., 0], img[..., 1], img[..., 2]
    U = R - B
    T = B + tdiv(U, 2)
    V = G - T
    Y = T + tdiv(V, 2)
    return np.stack([Y, U, V], axis=-1)


def ycocg_to_rgb(img: np.ndarray) -> np.ndarray:
    """Inverse with the reference's range clamps (image.h:41-43)."""
    Y = np.clip(img[..., 0], 0, 255)
    U = np.clip(img[..., 1], -255, 255)
    V = np.clip(img[..., 2], -255, 255)
    T = Y - tdiv(V, 2)
    G = V + T
    B = T - tdiv(U, 2)
    R = B + U
    return np.stack([R, G, B], axis=-1)


# ---------------------------------------------------------------------------
# CDF 5/3 integer lifting (reference cdf53.h; exact math in SURVEY §2.3)
# ---------------------------------------------------------------------------

def cdf53_fwd_1d(x: np.ndarray, axis: int) -> np.ndarray:
    """Forward reversible CDF 5/3 along `axis`, deinterleaved [low | high]."""
    x = np.moveaxis(x, axis, 0).copy()
    N = x.shape[0]
    ev = x[0::2].astype(np.int64)  # ceil(N/2) even samples
    od = x[1::2].astype(np.int64)  # floor(N/2) odd samples
    ne, no = ev.shape[0], od.shape[0]
    if no:
        # predict: d[i] -= (x[i-1]+x[i+1])/2; right neighbor clamped when N even
        right = ev[1:] if ne > no else np.concatenate([ev[1:], ev[-1:]], axis=0)
        od = od - tdiv(ev[:no] + right[:no], 2)
        # update: s[0] += d[1]/2 == (d0+d0)/4; even i in [2, N&~1): (d[i-1]+d[i+1])/4
        left = np.concatenate([od[:1], od[:-1]], axis=0)
        upd = np.zeros_like(ev)
        nupd = ne if N % 2 == 0 else ne - 1  # last even of odd-N gets no update
        if nupd:
            r = od[:nupd]
            l = left[:nupd]
            upd[:nupd] = tdiv(l + r, 4)
        ev = ev + upd
    out = np.concatenate([ev, od], axis=0).astype(np.int32)
    return np.moveaxis(out, 0, axis)


def cdf53_inv_1d(x: np.ndarray, axis: int) -> np.ndarray:
    """Inverse: undo update, undo predict, re-interleave."""
    x = np.moveaxis(x, axis, 0)
    N = x.shape[0]
    ne = (N + 1) // 2
    ev = x[:ne].astype(np.int64).copy()
    od = x[ne:].astype(np.int64)
    no = od.shape[0]
    if no:
        left = np.concatenate([od[:1], od[:-1]], axis=0)
        nupd = ne if N % 2 == 0 else ne - 1
        if nupd:
            ev[:nupd] = ev[:nupd] - tdiv(left[:nupd] + od[:nupd], 4)
        right = ev[1:] if ne > no else np.concatenate([ev[1:], ev[-1:]], axis=0)
        od = od + tdiv(ev[:no] + right[:no], 2)
    out = np.empty((N,) + x.shape[1:], dtype=np.int64)
    out[0::2] = ev
    out[1::2] = od
    return np.moveaxis(out.astype(np.int32), 0, axis)


def dwt2d_fwd(img: np.ndarray, pyr: Pyramid) -> np.ndarray:
    """Multi-level forward 2-D DWT on (H, W, C) int32 (encode.c:16-30)."""
    out = img.astype(np.int32).copy()
    for l in range(pyr.levels, 0, -1):
        w, h = pyr.widths[l], pyr.heights[l]
        sub = out[:h, :w]
        sub = cdf53_fwd_1d(sub, axis=1)  # rows first (encode.c:18-21)
        sub = cdf53_fwd_1d(sub, axis=0)  # then all columns at once (encode.c:23)
        out[:h, :w] = sub
    return out


def dwt2d_inv(coeff: np.ndarray, pyr: Pyramid, levels: int | None = None) -> np.ndarray:
    """Inverse multi-level 2-D DWT (decode.c:16-30): coarsest level first."""
    out = coeff.astype(np.int32).copy()
    levels = pyr.levels if levels is None else levels
    for l in range(1, levels + 1):
        w, h = pyr.widths[l], pyr.heights[l]
        sub = out[:h, :w]
        sub = cdf53_inv_1d(sub, axis=0)
        sub = cdf53_inv_1d(sub, axis=1)
        out[:h, :w] = sub
    return out


# ---------------------------------------------------------------------------
# Bit / VLI / RLE writers (reference bits.h, vli.h, rle.h)
# ---------------------------------------------------------------------------

class BitWriter:
    """LSB-first bit packer (bits.h:58-78); flush pads final byte with zeros."""

    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.cnt = 0

    def put_bit(self, b: int):
        self.acc |= (1 if b else 0) << self.cnt
        self.cnt += 1
        if self.cnt == 8:
            self.bytes.append(self.acc & 255)
            self.acc = 0
            self.cnt = 0

    def write_bits(self, v: int, n: int):
        for i in range(n):
            self.put_bit((v >> i) & 1)

    def bits_count(self) -> int:
        return 8 * len(self.bytes) + self.cnt

    def flush(self) -> bytes:
        if self.cnt:
            self.bytes.append(self.acc & 255)
            self.acc = 0
            self.cnt = 0
        return bytes(self.bytes)


class VliWriter:
    """Adaptive Rice/Elias hybrid with global order state (vli.h:67-84).

    put(v): while v >= 2^order: emit 0, v -= 2^order, order += 1;
    emit 1; emit `order` raw LSB-first bits of remainder; order = max(order-2, 0).
    """

    def __init__(self, bits: BitWriter):
        self.bits = bits
        self.order = 0

    def put(self, val: int):
        while val >= (1 << self.order):
            self.bits.put_bit(0)
            val -= 1 << self.order
            self.order += 1
        self.bits.put_bit(1)
        self.bits.write_bits(val, self.order)
        self.order = max(self.order - 2, 0)

    def put_bit(self, b: int):
        self.bits.put_bit(b)

    def write_bits(self, v: int, n: int):
        self.bits.write_bits(v, n)


class RleWriter:
    """Zero-run coder over VLI (rle.h:56-103). Counter persists globally."""

    def __init__(self, vli: VliWriter):
        self.vli = vli
        self.cnt = 0

    def put_rle(self, b: int):
        if b:
            self.vli.put(self.cnt)
            self.cnt = 0
        else:
            self.cnt += 1

    def put_bit(self, b: int):
        if self.cnt > 0:
            self.vli.put(self.cnt)
            self.cnt = 0
        self.vli.put_bit(b)

    def flush(self):
        self.vli.put(self.cnt)
        self.cnt = 0


class Eof(Exception):
    pass


class BitReader:
    def __init__(self, data: bytes, skip: int = 0):
        self.data = data
        self.pos = skip  # byte position
        self.acc = 0
        self.cnt = 0

    def get_bit(self) -> int:
        if not self.cnt:
            if self.pos >= len(self.data):
                raise Eof()
            self.acc = self.data[self.pos]
            self.pos += 1
            self.cnt = 8
        b = self.acc & 1
        self.acc >>= 1
        self.cnt -= 1
        return b

    def read_bits(self, n: int) -> int:
        a = 0
        for i in range(n):
            a |= self.get_bit() << i
        return a


class VliReader:
    def __init__(self, bits: BitReader):
        self.bits = bits
        self.order = 0

    def get(self) -> int:
        s = 0
        while self.bits.get_bit() == 0:
            s += 1 << self.order
            self.order += 1
        val = self.bits.read_bits(self.order)
        self.order = max(self.order - 2, 0)
        return val + s

    def get_bit(self) -> int:
        return self.bits.get_bit()


class RleReader:
    def __init__(self, vli: VliReader):
        self.vli = vli
        self.cnt = 0

    def get_rle(self) -> int:
        if not self.cnt:
            self.cnt = self.vli.get()
            return 1 if not self.cnt else 0
        self.cnt -= 1
        return 1 if self.cnt == 0 else 0

    def get_bit(self) -> int:
        if self.cnt > 0:
            if self.get_rle() != 1:
                raise Eof()  # malformed: raw bit expected at run end
        return self.vli.get_bit()


# ---------------------------------------------------------------------------
# Layer schedule (reference encode.c:183-220; SURVEY §2.4)
# ---------------------------------------------------------------------------

def layer_schedule(levels: int, planes: list, channels: int,
                   levels_max: int | None = None) -> list:
    """Deterministic (channel, level, plane) coding order shared by both sides.

    A diagonal wavefront over (level, plane) with luma leading chroma by one
    layer (encode.c:190-219).  The encoder's pre-step codes the top luma
    plane of the coarsest detail chunk iff luma owns the global plane max.

    ``levels_max`` (decoder reduced-resolution mode, decode.c:213-214 and
    230-231): the whole schedule STOPS at the first loop step whose level
    reaches levels_max — the check runs before plane-validity filtering, so
    later still-valid coarse steps are abandoned too.
    """
    planes_max = max(planes) if planes else 0
    maximum = max(levels, planes_max)
    layers_max = 2 * maximum - 1
    if levels_max is None:
        levels_max = levels
    steps = []
    if planes and planes_max == planes[0] and levels > 0:
        steps.append((0, 0, planes[0] - 1))  # pre-step (encode.c:190-194)
    for layers in range(layers_max):
        for l in range(min(levels - 1, layers + 1) + 1):
            if l >= levels_max:
                return steps
            plane = planes_max - 1 - (layers + 1 - l)
            if 0 <= plane < planes[0]:
                steps.append((0, l, plane))
        for l in range(min(levels - 1, layers) + 1):
            if l >= levels_max:
                return steps
            for chan in range(1, channels):
                plane = planes_max - 1 - (layers - l)
                if 0 <= plane < planes[chan]:
                    steps.append((chan, l, plane))
    return steps


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def encode_root(vli: VliWriter, vals: np.ndarray):
    """Root band: VLI(bit count), then magnitude bits + sign bit per coeff
    (encode.c:97-110)."""
    mx = int(np.max(np.abs(vals))) if vals.size else 0
    cnt = 1 + ilog2(mx)
    vli.put(cnt)
    if cnt:
        for v in vals.tolist():
            vli.write_bits(abs(v), cnt)
            if v:
                vli.put_bit(1 if v < 0 else 0)


def encode_plane(rle: RleWriter, mag: np.ndarray, sgn: np.ndarray, q: np.ndarray, plane: int):
    """One (chunk, plane) step: significance pass then refinement pass
    (encode.c:60-95).  q = ilog2(mag) (-1 for zero) stands in for the
    reference's mutable sig/ref flag bits: refined <=> q > plane.
    """
    if plane < 0:
        # Degenerate all-zero-planes case: C computes bit_mask = 1 << -1
        # (x86: 1<<31); with magnitudes < 2^29 every bit is 0 => pure run.
        rle.cnt += int(mag.size)
        return
    refined = q > plane
    bits = (mag >> plane) & 1
    for i in range(mag.size):
        if not refined[i]:
            b = int(bits[i])
            rle.put_rle(b)
            if b:
                rle.put_bit(int(sgn[i]))
    for i in range(mag.size):
        if refined[i]:
            rle.put_bit(int(bits[i]))


def encode(img: np.ndarray, gray: bool, capacity: int = 0) -> bytes:
    """Full encoder: (H, W, C) uint8 image -> .dwt bytes (encode.c:133-232).

    Truncation semantics: the reference stops writing at `capacity` bytes
    (bytes.h:75-78), which yields exactly the prefix of the full stream.
    """
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[..., None]
    H, W, C = img.shape
    pyr = compute_pyramid(W, H)
    data = img.astype(np.int32)
    if not gray:
        data = rgb_to_ycocg(data)
    coeff = dwt2d_fwd(data, pyr)
    perm = linearization_perm(pyr)
    lin = coeff.reshape(-1, C)[perm]  # (total, C) in scan order

    root = lin[: pyr.pixels[0]]
    detail = lin[pyr.pixels[0] :]
    mag = np.abs(detail)
    sgn = (detail < 0).astype(np.int32)
    # exact ilog2 via frexp (float64 mantissa exact for |v| < 2^53):
    q = (np.frexp(mag.astype(np.float64))[1] - 1).astype(np.int32)
    q[mag == 0] = -1
    planes = [1 + int(q[:, c].max(initial=-1)) for c in range(C)]

    header = bytes([ord("W"), ord("6") if not gray else ord("5")])
    header += bytes([(W - 1) & 255, ((W - 1) >> 8) & 255])
    header += bytes([(H - 1) & 255, ((H - 1) >> 8) & 255])

    bw = BitWriter()
    vli = VliWriter(bw)
    for c in range(C):
        encode_root(vli, root[:, c])
    for c in range(C):
        vli.put(planes[c])
    rle = RleWriter(vli)
    for chan, l, plane in layer_schedule(pyr.levels, planes, C):
        off, num = pyr.chunk(l)
        off -= pyr.pixels[0]
        encode_plane(rle, mag[off : off + num, chan], sgn[off : off + num, chan],
                     q[off : off + num, chan], plane)
    rle.flush()
    stream = header + bw.flush()
    if capacity > 0:
        stream = stream[:capacity]
    return stream


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def decode(stream: bytes, pixels_max: int = 0):
    """Full decoder (decode.c:136-268): tolerates truncation anywhere.

    Returns (image uint8-range int32 (H, W, C), gray flag).
    """
    if len(stream) < 6 or stream[0] != ord("W") or stream[1] not in (ord("5"), ord("6")):
        raise ValueError("bad header")
    gray = stream[1] == ord("5")
    W = stream[2] + (stream[3] << 8) + 1
    H = stream[4] + (stream[5] << 8) + 1
    C = 1 if gray else 3
    pyr = compute_pyramid(W, H)
    levels_max = pyr.levels
    if pixels_max > 0:
        while levels_max > 0 and pyr.pixels[levels_max] > pixels_max:
            levels_max -= 1

    br = BitReader(stream, skip=6)
    vli = VliReader(br)
    total = pyr.total
    val = np.zeros((total, C), dtype=np.int64)  # decoded magnitudes (detail) / raw (root)
    sgn = np.zeros((total, C), dtype=np.int8)
    planes = [0] * C
    try:
        for c in range(C):
            cnt = vli.get()
            if cnt:
                for i in range(pyr.pixels[0]):
                    v = br.read_bits(cnt)
                    if v and vli.get_bit():
                        v = -v
                    val[i, c] = v
        for c in range(C):
            planes[c] = vli.get()
    except Eof:
        raise ValueError("stream too short for root band")

    missing = [[planes[c] for _ in range(max(pyr.levels, 1))] for c in range(C)]
    level = -1
    rle = RleReader(vli)
    # refined state per detail coefficient (reference's ref flag)
    refined = np.zeros((total - pyr.pixels[0], C), dtype=bool)
    sig = np.zeros((total - pyr.pixels[0], C), dtype=bool)

    def decode_plane(chan, l, plane):
        off, num = pyr.chunk(l)
        off -= pyr.pixels[0]
        d = slice(off, off + num)
        vals = val[pyr.pixels[0] :][d, chan]
        for i in range(num):
            if not refined[d, chan][i]:
                b = rle.get_rle()
                if b:
                    if plane >= 0:
                        vals[i] |= 1 << plane
                    s = rle.get_bit()
                    sgn[pyr.pixels[0] + off + i, chan] = s
                    sig[off + i, chan] = True
        ref = refined[d, chan]
        sg = sig[d, chan]
        for i in range(num):
            if ref[i]:
                b = rle.get_bit()
                if b and plane >= 0:
                    vals[i] |= 1 << plane
            elif sg[i]:
                ref[i] = True
                sg[i] = False
        val[pyr.pixels[0] :][d, chan] = vals
        refined[d, chan] = ref
        sig[d, chan] = sg

    try:
        if levels_max > 0:
            sched = layer_schedule(pyr.levels, planes, C, levels_max=levels_max)
            for chan, l, plane in sched:
                if level < l:
                    level = l
                decode_plane(chan, l, plane)
                missing[chan][l] -= 1
    except Eof:
        pass

    levels = level + 1
    outW, outH = pyr.widths[levels], pyr.heights[levels]
    n_out = pyr.pixels[levels]
    if levels == 0:
        # Nothing beyond the root was decoded.  The reference still runs one
        # inverse lifting pass at root size (decode.c:258 with levels=0 —
        # documented quirk, SURVEY §2.5) even though the encoder never
        # transformed at that size.
        coeff = val[:n_out].astype(np.int32).reshape(outH, outW, C)
        coeff = cdf53_inv_1d(coeff, axis=0)
        coeff = cdf53_inv_1d(coeff, axis=1)
        if not gray:
            coeff = ycocg_to_rgb(coeff)
        return np.clip(coeff, 0, 255).astype(np.int32), gray
    lin = np.where(sgn[:n_out] != 0, -val[:n_out], val[:n_out]).astype(np.int32)
    # missing-plane midpoint bias (decode.c:50-58)
    from .hilbert import level_of_position

    lvl_of = level_of_position(pyr)[:n_out]
    for c in range(C):
        for l in range(levels):
            m = missing[c][l] - 2
            if m >= 0:
                mask = lvl_of == l
                v = lin[:, c]
                bias = 1 << m
                v = np.where(mask & (v > 0), v + bias, v)
                v = np.where(mask & (v < 0), v - bias, v)
                lin[:, c] = v
    sub_pyr = compute_pyramid(outW, outH) if levels < pyr.levels else pyr
    inv = reconstruction_perm(sub_pyr)
    coeff = lin[inv].reshape(outH, outW, C)
    out = dwt2d_inv(coeff, sub_pyr)
    if not gray:
        out = ycocg_to_rgb(out)
    return np.clip(out, 0, 255).astype(np.int32), gray
