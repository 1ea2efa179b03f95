"""Find the scan-body cost cliff: time 256-step scans with increasing
body complexity at the VLI shapes."""
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
ab_b = (x.reshape(nblk, BLOCK).T % 1021) + 1  # (BLOCK, nblk) fake params


def scan_with(body, init):
    def f(ab):
        out, _ = jax.lax.scan(lambda s, row: (body(s, row), None), init, ab)
        return out
    return f


def apply1(dt):
    def b(s, x):
        a = ((x - 1) & 31).astype(dt)[None, :]
        bb = (((x - 1) >> 5) & 31).astype(dt)[None, :]
        ns = jnp.clip(jnp.maximum(s, a + (s >= bb).astype(dt)) - dt(2),
                      dt(0), dt(NSTATE - 1))
        return jnp.where((x > 0)[None, :], ns, s)
    return b


i8_31 = jnp.broadcast_to(jnp.arange(NSTATE, dtype=jnp.int8)[:, None],
                         (NSTATE, nblk))
i32_31 = i8_31.astype(jnp.int32)

bench("add-only, (31,nblk) i32 carry",
      scan_with(lambda s, r: s + r[None, :], i32_31), ab_b)
bench("add-only, (31,nblk) i8 carry",
      scan_with(lambda s, r: s + r.astype(jnp.int8)[None, :], i8_31), ab_b)
b32, b8 = apply1(jnp.int32), apply1(jnp.int8)
bench("apply1 x1, i32", scan_with(b32, i32_31), ab_b)
bench("apply1 x1, i8", scan_with(b8, i8_31), ab_b)
bench("apply1 x2, i32",
      scan_with(lambda s, r: b32(b32(s, r & 0x7FF), (r >> 11) & 0x7FF),
                i32_31), ab_b)
bench("apply1 x2, i8",
      scan_with(lambda s, r: b8(b8(s, r & 0x7FF), (r >> 11) & 0x7FF),
                i8_31), ab_b)
# one-row carry variants (pass C shape)
i8_1 = jnp.zeros((1, nblk), jnp.int8)
bench("apply1 x2, i8, (1,nblk) carry",
      scan_with(lambda s, r: b8(b8(s, r & 0x7FF), (r >> 11) & 0x7FF),
                i8_1), ab_b)
# unrolled variant: scan over fewer steps, 4 rows per step
ab4 = ab_b.reshape(BLOCK // 4, 4, nblk)


def body4(s, rows):
    for i in range(4):
        r = rows[i]
        s = b8(b8(s, r & 0x7FF), (r >> 11) & 0x7FF)
    return s


bench("apply1 x2 x4-unroll, i8 (64 steps)",
      scan_with(body4, i8_31), ab4)
