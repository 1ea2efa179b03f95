"""Raw transpose timings at the VLI-scan shapes, plus scan-step costs at
several BLOCK sizes — is the 106 ms VLI stage layout-bound or
latency-bound?"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from dwt_tpu.runtime import cache

cache.enable()

npair = 15728640
N = 5


def bench(name, fn, *args):
    g = jax.jit(fn)
    r = g(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    outs = [g(*args) for _ in range(N)]
    for o in outs:
        jax.block_until_ready(o)
    print(f"{name:40s} {(time.time()-t0)/N*1e3:8.2f} ms", flush=True)


x = jnp.arange(npair, dtype=jnp.int32)
for BLOCK in (64, 256, 1024):
    nblk = npair // BLOCK
    bench(f"XLA .T ({nblk}x{BLOCK}) i32",
          lambda v, nb=nblk, B=BLOCK: v.reshape(nb, B).T + 1, x)
bench("copy (reshape+add) i32", lambda v: v + 1, x)

# int8 variant
x8 = x.astype(jnp.int8)
bench("XLA .T (61440x256) i8",
      lambda v: v.reshape(61440, 256).T + 1, x8)

# scan-step latency: trivial carry update, varying steps
for steps in (64, 256, 1024):
    lanes = npair // steps

    def f(v, st=steps, ln=lanes):
        vb = v.reshape(st, ln)

        def step(s, row):
            return s + row, None

        out, _ = jax.lax.scan(step, jnp.zeros((ln,), jnp.int32), vb)
        return out

    bench(f"scan {steps} steps x {lanes} lanes", f, x)
