"""Flat (1-D) scan carries at the VLI shapes: pass C as (nblk,) and
pass A as (31*nblk,)."""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from dwt_tpu.runtime import cache

cache.enable()

BLOCK, NSTATE = 256, 31
npair = 15728640
nblk = npair // BLOCK
N = 5


def bench(name, fn, *args):
    g = jax.jit(fn)
    r = g(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    outs = [g(*args) for _ in range(N)]
    for o in outs:
        jax.block_until_ready(o)
    print(f"{name:44s} {(time.time()-t0)/N*1e3:8.2f} ms", flush=True)


x = jnp.arange(npair, dtype=jnp.int32)
ab_b = (x.reshape(nblk, BLOCK).T % 1021) + 1  # (BLOCK, nblk)


def b8_flat(s, a, bb):
    ns = jnp.clip(
        jnp.maximum(s, a + (s >= bb).astype(jnp.int8)) - jnp.int8(2),
        jnp.int8(0), jnp.int8(NSTATE - 1))
    return jnp.where(a >= 0, ns, s)


def passC_flat(ab):
    def step(s, row):
        a = ((row - 1) & 31).astype(jnp.int8)
        bb = (((row - 1) >> 5) & 31).astype(jnp.int8)
        ok = (row > 0)
        ns = jnp.clip(
            jnp.maximum(s, a + (s >= bb).astype(jnp.int8)) - jnp.int8(2),
            jnp.int8(0), jnp.int8(NSTATE - 1))
        s1 = jnp.where(ok, ns, s)
        a2 = ((row >> 11) - 1 & 31).astype(jnp.int8)
        b2 = ((((row >> 11) - 1) >> 5) & 31).astype(jnp.int8)
        ns2 = jnp.clip(
            jnp.maximum(s1, a2 + (s1 >= b2).astype(jnp.int8)) - jnp.int8(2),
            jnp.int8(0), jnp.int8(NSTATE - 1))
        s2 = jnp.where((row >> 11) > 0, ns2, s1)
        out = s.astype(jnp.int32) | (s1.astype(jnp.int32) << 5)
        return s2, out

    init = jnp.zeros((nblk,), jnp.int8)
    _, orders = jax.lax.scan(step, init, ab)
    return orders


bench("pass C flat (nblk,) carry", passC_flat, ab_b)


def passA_flat(ab):
    # carry (31*nblk,) flat; params tiled per state row OUTSIDE the scan
    abt = jnp.broadcast_to(ab[:, None, :], (BLOCK, NSTATE, nblk)) \
        .reshape(BLOCK, NSTATE * nblk)

    def step(s, row):
        a = ((row - 1) & 31).astype(jnp.int8)
        bb = (((row - 1) >> 5) & 31).astype(jnp.int8)
        ns = jnp.clip(
            jnp.maximum(s, a + (s >= bb).astype(jnp.int8)) - jnp.int8(2),
            jnp.int8(0), jnp.int8(NSTATE - 1))
        s1 = jnp.where(row > 0, ns, s)
        a2 = (((row >> 11) - 1) & 31).astype(jnp.int8)
        b2 = ((((row >> 11) - 1) >> 5) & 31).astype(jnp.int8)
        ns2 = jnp.clip(
            jnp.maximum(s1, a2 + (s1 >= b2).astype(jnp.int8)) - jnp.int8(2),
            jnp.int8(0), jnp.int8(NSTATE - 1))
        return jnp.where((row >> 11) > 0, ns2, s1), None

    init = jnp.broadcast_to(jnp.arange(NSTATE, dtype=jnp.int8)[:, None],
                            (NSTATE, nblk)).reshape(-1)
    maps, _ = jax.lax.scan(step, init, abt)
    return maps


bench("pass A flat (31*nblk,) carry (tiled xs)", passA_flat, ab_b)


def passA_flat_notile(ab):
    # carry (31*nblk,) flat; params tiled INSIDE the body per step
    def step(s, row):
        rowt = jnp.broadcast_to(row[None, :], (NSTATE, nblk)).reshape(-1)
        a = ((rowt - 1) & 31).astype(jnp.int8)
        bb = (((rowt - 1) >> 5) & 31).astype(jnp.int8)
        ns = jnp.clip(
            jnp.maximum(s, a + (s >= bb).astype(jnp.int8)) - jnp.int8(2),
            jnp.int8(0), jnp.int8(NSTATE - 1))
        s1 = jnp.where(rowt > 0, ns, s)
        a2 = (((rowt >> 11) - 1) & 31).astype(jnp.int8)
        b2 = ((((rowt >> 11) - 1) >> 5) & 31).astype(jnp.int8)
        ns2 = jnp.clip(
            jnp.maximum(s1, a2 + (s1 >= b2).astype(jnp.int8)) - jnp.int8(2),
            jnp.int8(0), jnp.int8(NSTATE - 1))
        return jnp.where((rowt >> 11) > 0, ns2, s1), None

    init = jnp.broadcast_to(jnp.arange(NSTATE, dtype=jnp.int8)[:, None],
                            (NSTATE, nblk)).reshape(-1)
    maps, _ = jax.lax.scan(step, init, ab)
    return maps


bench("pass A flat carry, in-body tile", passA_flat_notile, ab_b)
