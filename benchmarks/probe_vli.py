"""Split the VLI order scan's 4K cost: pass A (31-state block maps) vs
pass B (map composition) vs pass C (replay) vs the layout transposes, and
try int8 state carries + precomputed per-token (A, B) closed-form
transitions as candidate optimizations."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")
from imagegen import random_image  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dwt_tpu.codec import encoder  # noqa: E402
from dwt_tpu.codec.encoder import (BLOCK, NSTATE, _bucket, _finish_tokens,  # noqa: E402
                                   _ilog2_i32, _sig_tokens_pallas,
                                   _vli_next_state, _vli_orders)

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
    print(f"{name:28s} {(time.time()-t0)/N*1e3:8.1f} ms",
          file=sys.stderr, flush=True)


timed("vli_orders full", lambda tv, tf: _vli_orders(tv, tf, padded_T), tv, tf)

nblk = padded_T // BLOCK


def passA(tv, tf):
    v_b = tv.reshape(nblk, BLOCK).T
    f_b = tf.reshape(nblk, BLOCK).T
    init = jnp.broadcast_to(jnp.arange(NSTATE, dtype=jnp.int32)[None, :],
                            (nblk, NSTATE))

    def stepA(s, xs):
        v, f = xs
        return _vli_next_state(v[:, None], s, f[:, None]), None

    maps, _ = jax.lax.scan(stepA, init, (v_b, f_b))
    return maps


timed("pass A (31-state maps)", passA, tv, tf)


def passA_i8(tv, tf):
    """Closed form: ns = clamp(ilog2(v + 2^s) - 2, 0, 30).  Since
    ilog2(v + 2^s) = s when 2^s > v, and in {L, L+1} when s <= L = ilog2(v)
    (L+1 iff 2^s >= 2^(L+1) - v), the transition is
    ns = clamp(max(s, A + (s >= B)) - 2) with per-token A = L, B =
    ceil_log2(2^(L+1) - v) — precomputed once, int8 state carries."""
    v_b = tv.reshape(nblk, BLOCK).T
    f_b = tf.reshape(nblk, BLOCK).T
    L = jnp.maximum(_ilog2_i32(jnp.maximum(v_b, 1)), 0)
    rem = (jnp.int32(2) << L) - v_b
    Bt = jnp.where(rem <= 1, 0, _ilog2_i32(jnp.maximum(rem - 1, 1)) + 1)
    A_i8 = jnp.where(f_b, L, -1).astype(jnp.int8)
    B_i8 = jnp.clip(Bt, 0, 31).astype(jnp.int8)
    init = jnp.broadcast_to(jnp.arange(NSTATE, dtype=jnp.int8)[None, :],
                            (nblk, NSTATE))

    def stepA(s, xs):
        a, b = xs
        av, bv = a[:, None], b[:, None]
        ns = jnp.clip(jnp.maximum(s, av + (s >= bv).astype(jnp.int8))
                      - jnp.int8(2), jnp.int8(0), jnp.int8(NSTATE - 1))
        return jnp.where(av >= 0, ns, s), None

    maps, _ = jax.lax.scan(stepA, init, (A_i8, B_i8))
    return maps


timed("pass A closed-form i8", passA_i8, tv, tf)

# Equivalence check on a slice.
m32 = np.asarray(passA(tv, tf))
m8 = np.asarray(passA_i8(tv, tf)).astype(np.int32)
print("pass A i8 == i32:", np.array_equal(m32, m8), file=sys.stderr)


def passC(tv, tf):
    v_b = tv.reshape(nblk, BLOCK).T
    f_b = tf.reshape(nblk, BLOCK).T
    entry = jnp.zeros((nblk,), jnp.int32)

    def stepC(s, xs):
        v, f = xs
        return _vli_next_state(v, s, f), s

    _, orders = jax.lax.scan(stepC, entry, (v_b, f_b))
    return orders.T.reshape(padded_T)


timed("pass C (replay)", passC, tv, tf)
timed("transpose only", lambda tv: tv.reshape(nblk, BLOCK).T + 1, tv)
print("DONE", file=sys.stderr, flush=True)
