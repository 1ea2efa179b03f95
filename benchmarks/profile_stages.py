"""Per-stage TPU timing of the 4K encode pipeline.

Each stage is wrapped in a jit that CONSUMES every output into one scalar
checksum (XLA cannot DCE the stage; only one sync roundtrip per call) —
the same honesty protocol bench.py uses.  Enqueue N, sync each scalar at
the end: interleaving multi-leaf syncs with dispatches is unreliable on
relay-attached dev TPUs (see memory notes / BENCH_NOTES.md).
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")
from imagegen import random_image  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dwt_tpu.codec import encoder  # noqa: E402
from dwt_tpu.codec.encoder import (_bucket, _finish_tokens, _pack_bits,  # noqa: E402
                                   _ref_bits_pallas, _sig_tokens_pallas,
                                   _stream_words, _transform_and_stats,
                                   _vli_orders)

W, H = 3840, 2160
N = 4

rng = np.random.default_rng(7)
img = random_image(rng, W, H, 3, "mixed")
enc = encoder.get_encoder(W, H, 3)
img_dev = jnp.asarray(img)

lin, stats = enc._stage1(img_dev, enc._perm)
T = int(stats["T"])
padded_T = _bucket(T)
pyr, C = enc.pyr, 3
nwords = _stream_words(pyr, C, padded_T)
print(f"T={T} padded_T={padded_T} nwords={nwords}", file=sys.stderr)


def _cksum(tree):
    leaves = [x for x in jax.tree.leaves(tree)
              if hasattr(x, "dtype") and x.size > 0]
    return sum(jnp.sum(x.astype(jnp.uint32)
                       if x.dtype not in (jnp.int64, jnp.uint64)
                       else jnp.sum(x).astype(jnp.uint32)) for x in leaves)


def timed(name, fn, *args):
    g = jax.jit(lambda *a: _cksum(fn(*a)))
    int(g(*args))  # compile + warm
    t0 = time.time()
    outs = [g(*args) for _ in range(N)]
    for o in outs:
        int(o)
    dt = (time.time() - t0) / N
    print(f"{name:28s} {dt*1e3:8.1f} ms", file=sys.stderr)
    return fn(*args)


timed("stage1 transform+stats", lambda im: enc._stage1(im, enc._perm), img_dev)
timed("stage1a transform only",
      lambda im: _transform_and_stats(im, pyr, C, False, enc._perm)[0], img_dev)

from dwt_tpu.ops.color import rgb_to_ycocg  # noqa: E402
from dwt_tpu.ops.lifting import dwt2d_fwd  # noqa: E402

timed("stage1b ycocg+dwt only",
      lambda im: dwt2d_fwd(rgb_to_ycocg(im.astype(jnp.int32)), pyr), img_dev)
timed("stage1c perm gather only",
      lambda co: co.reshape(pyr.total, 3)[enc._perm].T,
      dwt2d_fwd(rgb_to_ycocg(img_dev.astype(jnp.int32)), pyr))
timed("stage1d stats from lin",
      lambda l: encoder._stats_from_lin(l, pyr, C)[1], lin)

zpA, sgA, vmag, com = timed(
    "A: sig-token compaction",
    lambda lin, stats: _sig_tokens_pallas(lin, stats, pyr, C, padded_T),
    lin, stats)
tv, tr, tf = timed(
    "finish tokens (dense)",
    lambda zp, sg, lin, stats: _finish_tokens(zp, sg, lin, stats, pyr, C,
                                              padded_T),
    zpA, sgA, lin, stats)
orders = timed("VLI order scan", lambda tv, tf: _vli_orders(tv, tf, padded_T),
               tv, tf)
words, bits_parts, wild, off, off_base = timed(
    "pack bits (codewords)",
    lambda lin, stats, tv, tr, tf, o: _pack_bits(
        lin, stats, tv, tr, tf, o, pyr, C, padded_T, nwords),
    lin, stats, tv, tr, tf, orders)
timed("B: refinement bits",
      lambda words, ob, vmag, stats: _ref_bits_pallas(
          words, ob, vmag, com, stats, pyr, C, padded_T),
      words, off_base, vmag, stats)

# st2 is the split two-jit pipeline; time it as the host composition with
# a scalar-only sync (wrapping it in another jit would inline the halves
# back into the old monolith and recompile it).
st2 = enc._get_stage2(padded_T)
_c = jax.jit(lambda w, tb: (jnp.sum(w, dtype=jnp.uint32), tb))


def _full(lin, stats):
    w, p, _wild, _ = st2(lin, stats)
    return _c(w, jnp.sum(p, dtype=jnp.int32))


def timed_host(name, fn, *args):
    for o in fn(*args):
        int(o)  # warm/compile
    t0 = time.time()
    outs = [fn(*args) for _ in range(N)]
    for tup in outs:
        for o in tup:
            int(o)
    print(f"{name:28s} {(time.time()-t0)/N*1e3:8.1f} ms", file=sys.stderr)


timed_host("stage2 (split pipeline)", _full, lin, stats)
timed_host("FULL pipeline",
           lambda im: _full(*enc._stage1(im, enc._perm)), img_dev)
