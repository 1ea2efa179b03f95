"""MXU bit-packing kernel: interpret-mode semantics vs numpy scatter-add.

(The compiled TPU path is additionally gated end-to-end by bench.py's
byte-parity assertion against the reference C encoder.)
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from dwt_tpu.ops.pallas_pack import (BLOCKN, _win, _win1,  # noqa: E402
                                     pack_words_pallas, wild_blocks)


def _want(nwords, widx, c0, c1, c2):
    want = np.zeros(nwords, np.uint32)
    np.add.at(want, widx, c0)
    np.add.at(want, widx + 1, c1)
    np.add.at(want, widx + 2, c2)
    return want


def _stragglers(words, wild, widx, c0, c1, c2):
    for b in np.nonzero(wild)[0]:
        t = np.arange(b * BLOCKN, (b + 1) * BLOCKN)
        np.add.at(words, widx[t], c0[t])
        np.add.at(words, widx[t] + 1, c1[t])
        np.add.at(words, widx[t] + 2, c2[t])
    return words


@pytest.mark.parametrize("jumps", [False, True])
def test_pack_kernel_interpret(jumps):
    rng = np.random.default_rng(3)
    n = 8 * BLOCKN
    steps = rng.integers(0, 3, n)
    if jumps:
        # refinement-bit injection jumps make blocks "wild"
        for pos in (777, 5000, 9000, 9100, 15000):
            steps[pos] += rng.integers(10_000, 1_000_000)
    widx = np.cumsum(steps).astype(np.int32)
    c0 = rng.integers(0, 2**32, n, dtype=np.uint32)
    c1 = rng.integers(0, 2**32, n, dtype=np.uint32)
    c2 = rng.integers(0, 2**32, n, dtype=np.uint32)
    nwords = int(widx[-1]) + _win() + _win1() + 520

    got = np.asarray(pack_words_pallas(
        jnp.asarray(widx), jnp.asarray(c0), jnp.asarray(c1), jnp.asarray(c2),
        nwords, interpret=True))
    wild = np.asarray(wild_blocks(jnp.asarray(widx)))
    if jumps:
        assert wild.any()
    got = _stragglers(got.copy(), wild, widx, c0, c1, c2)
    np.testing.assert_array_equal(got, _want(nwords, widx, c0, c1, c2))


def test_pack_kernel_partial_tail_group():
    """n = 6*BLOCKN: a partial tail group (nblk % KGRP != 0) — exercises
    the wrapper's group padding and wild_blocks' jnp.repeat group starts,
    with an own-window jump in the full group and a wild block inside the
    tail group (ADVICE r4: this path was previously untested)."""
    from dwt_tpu.ops.pallas_pack import KGRP

    rng = np.random.default_rng(11)
    n = 6 * BLOCKN
    assert (n // BLOCKN) % KGRP != 0
    steps = rng.integers(0, 3, n)
    # own-window jump: lands past the first group's window but is coverable
    # by a block-private window (between blocks, like a real injection)
    steps[2 * BLOCKN] += 32 * (_win() + 4 * 128)
    # wild jump INSIDE the tail group (mid-block -> genuinely wild)
    steps[5 * BLOCKN + 700] += 32 * (_win() + 64 * 128)
    widx = np.cumsum(steps).astype(np.int32)
    c0 = rng.integers(0, 2**32, n, dtype=np.uint32)
    c1 = rng.integers(0, 2**32, n, dtype=np.uint32)
    c2 = rng.integers(0, 2**32, n, dtype=np.uint32)
    nwords = int(widx[-1]) + _win() + _win1() + 520

    got = np.asarray(pack_words_pallas(
        jnp.asarray(widx), jnp.asarray(c0), jnp.asarray(c1), jnp.asarray(c2),
        nwords, interpret=True))
    wild = np.asarray(wild_blocks(jnp.asarray(widx)))
    assert wild[5]  # the tail-group block with the mid-block jump is wild
    got = _stragglers(got.copy(), wild, widx, c0, c1, c2)
    np.testing.assert_array_equal(got, _want(nwords, widx, c0, c1, c2))
