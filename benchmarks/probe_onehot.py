"""Micro-benchmark the one-hot placement variants used by the compaction
kernels, isolated in a tiny Pallas kernel looping K placements:

  a) current: s8 one-hot (tier rows x 1024) contracted with s8 nibbles
  b) bf16 one-hot + bf16 nibbles (sums <= 15, exact in bf16)
  c) compact-then-shift: rank one-hot (tier x 1024) then shift one-hot
     (tier+136 x tier) — construct cost ~tier*(1024+tier) vs (tier+136)*1024

Reports ns/placement for each at tier sizes matching the production
distribution."""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1024
K = 2000  # placements per kernel call


def _nib8(vals):
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (8, 1), 0) * 4
    return ((vals >> shifts) & jnp.uint32(0xF)).astype(jnp.int32).astype(jnp.int8)


def _recomb(acc):
    rshift = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) * 4
    return jnp.sum(acc << rshift, axis=0, keepdims=True, dtype=jnp.int32)


def mk_kernel(rows, mode):
    def kern(tgt_ref, val_ref, out_ref):
        def body(i, c):
            tgt = tgt_ref[0:1, :] + (i & 127)
            vals = val_ref[0:1, :].astype(jnp.uint32)
            if mode == "s8":
                rel = tgt
                oh = (jax.lax.broadcasted_iota(jnp.int32, (rows, N), 0)
                      == rel).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    _nib8(vals), oh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                out = _recomb(acc)
                out_ref[:, pl.ds(0, rows)] = out_ref[:, pl.ds(0, rows)] + out
            elif mode == "bf16":
                rel = tgt
                oh = jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, (rows, N), 0) == rel,
                    jnp.bfloat16(1), jnp.bfloat16(0))
                shifts = jax.lax.broadcasted_iota(jnp.uint32, (8, 1), 0) * 4
                nib = ((vals >> shifts) & jnp.uint32(0xF)).astype(
                    jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
                acc = jax.lax.dot_general(
                    nib, oh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(jnp.int32)
                out = _recomb(acc)
                out_ref[:, pl.ds(0, rows)] = out_ref[:, pl.ds(0, rows)] + out
            else:  # split: compact to rank, then shift-merge
                rel = tgt  # pretend ranks
                oh1 = (jax.lax.broadcasted_iota(jnp.int32, (rows, N), 0)
                       == rel).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    _nib8(vals), oh1, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)  # (8, rows)
                rows2 = rows + 136
                delta = i & 127
                oh2 = (jax.lax.broadcasted_iota(jnp.int32, (rows2, rows), 0)
                       == (jax.lax.broadcasted_iota(
                           jnp.int32, (rows2, rows), 1) + delta)
                       ).astype(jnp.int8)
                acc2 = jax.lax.dot_general(
                    acc.astype(jnp.int8), oh2, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                out = _recomb(acc2)
                out_ref[:, pl.ds(0, rows2)] = (
                    out_ref[:, pl.ds(0, rows2)] + out)
            return c

        jax.lax.fori_loop(0, K, body, jnp.int32(0))

    return kern


def bench(rows, mode):
    tgt = jnp.asarray(
        np.random.default_rng(1).integers(0, rows - 130, (8, N)), jnp.int32)
    val = jnp.asarray(
        np.random.default_rng(2).integers(0, 2**30, (8, N)), jnp.int32)
    f = pl.pallas_call(
        mk_kernel(rows, mode),
        out_shape=jax.ShapeDtypeStruct((1, rows + 256), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    g = jax.jit(lambda a, b: jnp.sum(f(a, b).astype(jnp.uint32)))
    int(g(tgt, val))
    t0 = time.time()
    outs = [g(tgt, val) for _ in range(3)]
    for o in outs:
        int(o)
    dt = (time.time() - t0) / 3 / K
    print(f"rows={rows:5d} mode={mode:5s} {dt*1e9:9.0f} ns/placement",
          file=sys.stderr, flush=True)


for rows in (192, 384, 768):
    for mode in ("s8", "bf16", "split"):
        bench(rows, mode)
print("DONE", file=sys.stderr)
