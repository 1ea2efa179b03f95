"""Pass B compose: take_along_axis gather vs select-chain vs one-hot
matmul over (nblk, NSTATE) maps.  Plus prep without stride-2 slicing."""
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
                                   _ilog2_i32, _sig_tokens_pallas)

W, H = 3840, 2160
N = 10
rng = np.random.default_rng(7)
img = random_image(rng, W, H, 3, "mixed")
enc = encoder.get_encoder(W, H, 3)
lin, stats = enc._stage1(jnp.asarray(img), enc._perm)
padded_T = _bucket(int(stats["T"]))
pyr, C = enc.pyr, 3
zpA, sgA, vmag, com = jax.jit(
    lambda lin, stats: _sig_tokens_pallas(lin, stats, pyr, C, padded_T)
)(lin, stats)
tv, tf = jax.jit(
    lambda zp, sg, lin, stats: (
        _finish_tokens(zp, sg, lin, stats, pyr, C, padded_T)[0],
        _finish_tokens(zp, sg, lin, stats, pyr, C, padded_T)[2])
)(zpA, sgA, lin, stats)

npair = padded_T // 2
nblk = npair // BLOCK


def timed(name, fn, *args):
    g = jax.jit(lambda *a: sum(jnp.sum(x.astype(jnp.uint32))
                               for x in jax.tree.leaves(fn(*a))))
    int(g(*args)); int(g(*args))
    t0 = time.time()
    outs = [g(*args) for _ in range(N)]
    int(outs[-1])
    print(f"{name:34s} {(time.time()-t0)/N*1e3:8.1f} ms", flush=True)
    return jax.jit(fn)(*args)


# build real maps via production passA
def prep_prod(tok_val, tok_vli):
    L = jnp.maximum(_ilog2_i32(jnp.maximum(tok_val, 1)), 0)
    rem = (jnp.int32(2) << L) - tok_val
    Bt = jnp.where(rem <= 1, 0, _ilog2_i32(jnp.maximum(rem - 1, 1)) + 1)
    ab = jnp.where(tok_vli, L | (Bt << 5), -1)
    ab2 = ab.reshape(npair, 2)
    packed = (ab2[:, 0] + 1) | ((ab2[:, 1] + 1) << 11)
    return packed.reshape(nblk, BLOCK).T


def prep_nostride(tok_val, tok_vli):
    """Token order -> (BLOCK, nblk) rows WITHOUT stride-2 lane slicing:
    reshape (nblk, BLOCK, 2), combine along the trailing 2-axis via
    one even/odd split on the LAST axis of a 3-D array (sublane-cheap),
    then transpose."""
    L = jnp.maximum(_ilog2_i32(jnp.maximum(tok_val, 1)), 0)
    rem = (jnp.int32(2) << L) - tok_val
    Bt = jnp.where(rem <= 1, 0, _ilog2_i32(jnp.maximum(rem - 1, 1)) + 1)
    ab = jnp.where(tok_vli, L | (Bt << 5), -1) + 1  # biased, 11 bits
    a3 = ab.reshape(nblk, BLOCK, 2)
    packed = a3[:, :, 0] | (a3[:, :, 1] << 11)
    return packed.T


timed("prep (stride-2 pairs)", prep_prod, tv, tf)
ab_b = timed("prep (3-D trailing pair)", prep_nostride, tv, tf)
print("prep equal:", bool((jax.jit(prep_prod)(tv, tf) == ab_b).all()),
      flush=True)


def passA(ab_b):
    def apply1(s, x):
        a = ((x - 1) & 31).astype(jnp.int8)[:, None]
        b = (((x - 1) >> 5) & 31).astype(jnp.int8)[:, None]
        ns = jnp.clip(
            jnp.maximum(s, a + (s >= b).astype(jnp.int8)) - jnp.int8(2),
            jnp.int8(0), jnp.int8(NSTATE - 1))
        return jnp.where((x > 0)[:, None], ns, s)

    init = jnp.broadcast_to(jnp.arange(NSTATE, dtype=jnp.int8)[None, :],
                            (nblk, NSTATE))
    maps, _ = jax.lax.scan(
        lambda s, x: (apply1(apply1(s, x & 0x7FF), (x >> 11) & 0x7FF), None),
        init, ab_b)
    return maps


maps = jax.jit(passA)(ab_b)


def passB_gather(maps):
    def compose(a, b):
        return jnp.take_along_axis(b, a, axis=-1)

    minc = jax.lax.associative_scan(compose, maps.astype(jnp.int32), axis=0)
    return jnp.concatenate([jnp.zeros((1,), jnp.int32), minc[:-1, 0]])


def passB_select(maps):
    def compose(a, b):
        out = jnp.zeros_like(a)
        for s in range(NSTATE):
            out = jnp.where(a == s, b[:, s : s + 1], out)
        return out

    minc = jax.lax.associative_scan(compose, maps.astype(jnp.int8), axis=0)
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), minc[:-1, 0].astype(jnp.int32)])


def passB_chain(maps):
    """Only the orbit of state 0 is needed: scan over block chunks with a
    flat carry applying each map via selects."""
    CH = 256
    mc = maps.astype(jnp.int8).reshape(nblk // CH, CH, NSTATE)

    # per-chunk maps for all entry states via sequential compose inside
    # chunk: carried (nblk//CH, NSTATE) too big? Instead: orbit carry only
    # needs per-chunk COMPOSED maps, same problem. Use two-level gather:
    # level-1: compose within chunks sequentially (CH steps, full maps)
    def compose_step(acc, m):
        # acc: (nchunk, NSTATE) current composed map; m: (nchunk, NSTATE)
        out = jnp.zeros_like(acc)
        for s in range(NSTATE):
            out = jnp.where(acc == s, m[:, s : s + 1], out)
        return out, None

    nch = nblk // CH
    init = jnp.broadcast_to(jnp.arange(NSTATE, dtype=jnp.int8)[None, :],
                            (nch, NSTATE))
    cmaps, _ = jax.lax.scan(compose_step, init,
                            jnp.swapaxes(mc, 0, 1))
    # level-2: orbit of 0 through nch chunk maps (sequential, tiny)
    def orbit(s, m):
        return m[s], s

    ent_ch, ents = jax.lax.scan(orbit, jnp.int8(0), cmaps)
    # entry state for each block: replay within chunk
    def replay(s, m):
        out = jnp.zeros_like(s)
        for q in range(NSTATE):
            out = jnp.where(s == q, m[:, q : q + 1], out)
        return out[:, 0][:, None], s[:, 0]

    _, blk_ents = jax.lax.scan(replay, ents[:, None],
                               jnp.swapaxes(mc, 0, 1))
    return jnp.swapaxes(blk_ents, 0, 1).reshape(nblk).astype(jnp.int32)


e1 = timed("passB gather", passB_gather, maps)
e2 = timed("passB select-chain", passB_select, maps)
print("passB equal:", np.array_equal(np.asarray(e1), np.asarray(e2)),
      flush=True)
e3 = timed("passB two-level orbit", passB_chain, maps)
print("passB orbit equal:", np.array_equal(np.asarray(e1), np.asarray(e3)),
      flush=True)
