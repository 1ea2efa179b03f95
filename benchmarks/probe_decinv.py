"""Profile the decode TPU inverse tail stage by stage (VERDICT r3 weak #3:
0.46 s at 4K vs a 178 ms forward stage 1 for mirrored work).

Times, with scalar-only syncs:
  - full tail (reference point)
  - midpoint bias alone (take_along_axis gather into the 16-entry missing
    table — suspect: XLA gather ~8 ns/index over 25M lanes)
  - bias via comparison-select over levels (gather-free candidate)
  - inverse Hilbert scatter engine alone
  - inverse lifting alone
  - color + clamp alone
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp

from dwt_tpu.runtime import cache

cache.enable()

from dwt_tpu.codec import decoder, encoder
from dwt_tpu.geometry import compute_pyramid
from dwt_tpu.hilbert import level_of_position, reconstruction_perm, tile_plan
from dwt_tpu.ops.color import ycocg_to_rgb
from dwt_tpu.ops.lifting import dwt2d_inv
from imagegen import random_image

W, H, C = 3840, 2160, 3
N = 5


def bench(name, fn, *args):
    for _ in range(2):  # compile + warm, fully synced before timing
        o = fn(*args)
        (o[0] if isinstance(o, tuple) else o).block_until_ready()
    t0 = time.time()
    outs = [fn(*args) for _ in range(N)]
    for o in outs:
        (o[0] if isinstance(o, tuple) else o).block_until_ready()
    dt = (time.time() - t0) / N
    print(f"{name:34s} {dt*1e3:8.1f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(7)
    img = random_image(rng, W, H, 3, "mixed")
    enc = encoder.get_encoder(W, H, 3)
    stream = enc.encode(img)

    from dwt_tpu.runtime import native

    pyr = compute_pyramid(W, H)
    coeffs, missing, level, planes = native.entropy_decode(
        stream[6:], 3, pyr.levels, pyr.levels, pyr.pixels)
    out_levels = level + 1
    n_out = pyr.pixels[out_levels]
    cj, mj = jnp.asarray(coeffs), jnp.asarray(missing)

    tail = decoder._tail_fn(W, H, out_levels, 3, False)

    @jax.jit
    def tailsum(c, m):
        return jnp.sum(tail(c, m), dtype=jnp.uint32)

    bench("full tail", tailsum, cj, mj)

    sub_pyr = compute_pyramid(pyr.widths[out_levels], pyr.heights[out_levels])
    lvl_of = jnp.asarray(level_of_position(pyr)[:n_out])

    @jax.jit
    def bias_gather(c, m):
        lin = c[:, :n_out]
        mm = jnp.take_along_axis(
            m, jnp.broadcast_to(jnp.clip(lvl_of, 0, 15)[None, :], (C, n_out)),
            axis=1) - 2
        b = jnp.where((mm >= 0) & (lvl_of[None, :] >= 0),
                      jnp.left_shift(1, jnp.clip(mm, 0, 30)), 0).astype(jnp.int32)
        return jnp.sum(lin + jnp.sign(lin) * b, dtype=jnp.uint32)

    bench("bias (gather)", bias_gather, cj, mj)

    L = pyr.levels

    @jax.jit
    def bias_select(c, m):
        lin = c[:, :n_out]
        # missing is (C, 16); build per-element bias by comparing lvl_of to
        # each level id — L selects instead of a 25M-index gather.
        mm = jnp.zeros((C, n_out), jnp.int32)
        for l in range(L):
            mm = jnp.where(lvl_of[None, :] == l, m[:, l : l + 1], mm)
        mm = mm - 2
        b = jnp.where((mm >= 0) & (lvl_of[None, :] >= 0),
                      jnp.left_shift(1, jnp.clip(mm, 0, 30)), 0).astype(jnp.int32)
        return jnp.sum(lin + jnp.sign(lin) * b, dtype=jnp.uint32)

    bench("bias (select)", bias_select, cj, mj)

    from dwt_tpu.codec.encoder import _use_engine
    use_engine = _use_engine()
    print("engine:", use_engine)
    if use_engine:
        from dwt_tpu.ops.pallas_hilbert import hilbert_scatter_pallas

        plan = tile_plan(sub_pyr, 1)

        @jax.jit
        def scat(c):
            x = hilbert_scatter_pallas(c[:, :n_out], plan,
                                       pyr.heights[out_levels],
                                       pyr.widths[out_levels], C)
            return jnp.sum(x, dtype=jnp.uint32)

        bench("hilbert scatter engine", scat, cj)
    inv_perm = jnp.asarray(reconstruction_perm(sub_pyr))

    @jax.jit
    def scat_xla(c):
        x = c[:, :n_out][:, inv_perm].T.reshape(
            pyr.heights[out_levels], pyr.widths[out_levels], C)
        return jnp.sum(x, dtype=jnp.uint32)

    bench("hilbert scatter (xla gather)", scat_xla, cj)

    x0 = jnp.asarray(
        rng.integers(-1000, 1000,
                     (pyr.heights[out_levels], pyr.widths[out_levels], C),
                     np.int32))

    @jax.jit
    def lift(x):
        return jnp.sum(dwt2d_inv(x, sub_pyr), dtype=jnp.uint32)

    bench("inverse lifting", lift, x0)

    @jax.jit
    def color(x):
        return jnp.sum(jnp.clip(ycocg_to_rgb(x), 0, 255).astype(jnp.uint8),
                       dtype=jnp.uint32)

    bench("color+clamp", color, x0)

    # forward lifting for symmetry comparison
    from dwt_tpu.ops.lifting import dwt2d_fwd

    @jax.jit
    def liftf(x):
        return jnp.sum(dwt2d_fwd(x, sub_pyr), dtype=jnp.uint32)

    bench("forward lifting (symmetry ref)", liftf, x0)


if __name__ == "__main__":
    main()
