"""Full flat-carry _vli_orders candidate vs production: exactness + time."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")
import jax
import jax.numpy as jnp

from dwt_tpu.runtime import cache

cache.enable()
from imagegen import random_image
from dwt_tpu.codec import encoder
from dwt_tpu.codec.encoder import (BLOCK, NSTATE, _bucket, _finish_tokens,
                                   _ilog2_i32, _sig_tokens_pallas,
                                   _vli_orders)

W, H = 3840, 2160
N = 4
rng = np.random.default_rng(7)
img = random_image(rng, W, H, 3, "mixed")
enc = encoder.get_encoder(W, H, 3)
lin, stats = enc._stage1(jnp.asarray(img), enc._perm)
padded_T = _bucket(int(stats["T"]))
pyr, C = enc.pyr, 3
zpA, sgA, vmag, com = jax.jit(
    lambda lin, stats: _sig_tokens_pallas(lin, stats, pyr, C, padded_T)
)(lin, stats)
tv, tr, tf = jax.jit(
    lambda zp, sg, lin, stats: _finish_tokens(zp, sg, lin, stats, pyr, C,
                                              padded_T)
)(zpA, sgA, lin, stats)


def timed(name, fn, *args):
    g = jax.jit(lambda *a: sum(jnp.sum(x.astype(jnp.uint32))
                               for x in jax.tree.leaves(fn(*a))))
    int(g(*args))
    t0 = time.time()
    outs = [g(*args) for _ in range(N)]
    for o in outs:
        int(o)
    print(f"{name:34s} {(time.time()-t0)/N*1e3:8.1f} ms", flush=True)


def _af(s, row):
    """Flat apply1: row packed 11-bit (a+1 | b<<5); 0 = no-op."""
    a = ((row - 1) & 31).astype(jnp.int8)
    b = (((row - 1) >> 5) & 31).astype(jnp.int8)
    ns = jnp.clip(
        jnp.maximum(s, a + (s >= b).astype(jnp.int8)) - jnp.int8(2),
        jnp.int8(0), jnp.int8(NSTATE - 1))
    return jnp.where(row > 0, ns, s)


def vli_orders_flat(tok_val, tok_vli, padded_T):
    npair = padded_T // 2
    nblk = npair // BLOCK
    L = jnp.maximum(_ilog2_i32(jnp.maximum(tok_val, 1)), 0)
    rem = (jnp.int32(2) << L) - tok_val
    Bt = jnp.where(rem <= 1, 0, _ilog2_i32(jnp.maximum(rem - 1, 1)) + 1)
    ab = jnp.where(tok_vli, L | (Bt << 5), -1)
    ab2 = ab.reshape(npair, 2)
    packed = (ab2[:, 0] + 1) | ((ab2[:, 1] + 1) << 11)
    ab_b = packed.reshape(nblk, BLOCK).T  # (BLOCK, nblk)

    # Pass A: flat (NSTATE*nblk,) carry, xs broadcast per state row.
    abt = jnp.broadcast_to(ab_b[:, None, :], (BLOCK, NSTATE, nblk)) \
        .reshape(BLOCK, NSTATE * nblk)

    def stepA(s, row):
        return _af(_af(s, row & 0x7FF), (row >> 11) & 0x7FF), None

    initA = jnp.broadcast_to(jnp.arange(NSTATE, dtype=jnp.int8)[:, None],
                             (NSTATE, nblk)).reshape(-1)
    maps, _ = jax.lax.scan(stepA, initA, abt)

    # Pass B: unchanged composition over blocks.
    def compose(a, b):
        return jnp.take_along_axis(b, a, axis=-1)

    minc = jax.lax.associative_scan(
        compose, maps.reshape(NSTATE, nblk).T.astype(jnp.int32), axis=0)
    entry = jnp.concatenate([jnp.zeros((1,), jnp.int32), minc[:-1, 0]])

    # Pass C: flat (nblk,) carry, emit per-pair packed orders.
    def stepC(s, row):
        s1 = _af(s, row & 0x7FF)
        out = s.astype(jnp.int32) | (s1.astype(jnp.int32) << 5)
        return _af(s1, (row >> 11) & 0x7FF), out

    _, orders = jax.lax.scan(stepC, entry.astype(jnp.int8), ab_b)
    op = orders.T.reshape(npair)  # (BLOCK, nblk) -> token order
    return jnp.stack([op & 31, (op >> 5) & 31], axis=-1).reshape(padded_T)


want = np.asarray(jax.jit(
    lambda tv, tf: _vli_orders(tv, tf, padded_T))(tv, tf))
got = np.asarray(jax.jit(
    lambda tv, tf: vli_orders_flat(tv, tf, padded_T))(tv, tf))
print("exact equal:", np.array_equal(want, got), flush=True)

timed("vli_orders production", lambda tv, tf: _vli_orders(tv, tf, padded_T),
      tv, tf)
timed("vli_orders flat", lambda tv, tf: vli_orders_flat(tv, tf, padded_T),
      tv, tf)


def prep(tok_val, tok_vli):
    npair = padded_T // 2
    nblk = npair // BLOCK
    L = jnp.maximum(_ilog2_i32(jnp.maximum(tok_val, 1)), 0)
    rem = (jnp.int32(2) << L) - tok_val
    Bt = jnp.where(rem <= 1, 0, _ilog2_i32(jnp.maximum(rem - 1, 1)) + 1)
    ab = jnp.where(tok_vli, L | (Bt << 5), -1)
    ab2 = ab.reshape(npair, 2)
    packed = (ab2[:, 0] + 1) | ((ab2[:, 1] + 1) << 11)
    return packed.reshape(nblk, BLOCK).T


def passA_prod(ab_b):
    nblk = ab_b.shape[1]

    def apply1(s, x):
        a = ((x - 1) & 31).astype(jnp.int8)[:, None]
        b = (((x - 1) >> 5) & 31).astype(jnp.int8)[:, None]
        ns = jnp.clip(
            jnp.maximum(s, a + (s >= b).astype(jnp.int8)) - jnp.int8(2),
            jnp.int8(0), jnp.int8(NSTATE - 1))
        return jnp.where((x > 0)[:, None], ns, s)

    def trans(s, row):
        return apply1(apply1(s, row & 0x7FF), (row >> 11) & 0x7FF)

    init = jnp.broadcast_to(jnp.arange(NSTATE, dtype=jnp.int8)[None, :],
                            (nblk, NSTATE))
    maps, _ = jax.lax.scan(lambda s, x: (trans(s, x), None), init, ab_b)
    return maps


def passB(maps):
    def compose(a, b):
        return jnp.take_along_axis(b, a, axis=-1)

    minc = jax.lax.associative_scan(compose, maps.astype(jnp.int32), axis=0)
    return jnp.concatenate([jnp.zeros((1,), jnp.int32), minc[:-1, 0]])


timed("prep only", prep, tv, tf)
ab_b = jax.jit(prep)(tv, tf)
timed("passA prod (from ab_b)", passA_prod, ab_b)
maps = jax.jit(passA_prod)(ab_b)
timed("passB (from maps)", passB, maps)
