"""Micro-probe: dynamic-lane-offset async_copy from a (1, N) ANY memref
into VMEM — does `src.at[:, pl.ds(k*1024, 1024)]` fetch the right lanes
on hardware for k > 0?"""
import sys
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NP_ = 4
TSQ = 1024


def kern(meta_ref, src, out, buf, sem, *, mul):
    b = pl.program_id(0)
    pid = meta_ref[b]
    if mul:
        o = pl.multiple_of(pid * TSQ, 128)
    else:
        o = pid * TSQ
    cp = pltpu.make_async_copy(src.at[:, pl.ds(o, TSQ)], buf, sem)
    cp.start()
    cp.wait()
    cp2 = pltpu.make_async_copy(buf, out.at[:, pl.ds(b * TSQ, TSQ)], sem)
    cp2.start()
    cp2.wait()


def run(mul):
    src = jnp.arange(NP_ * TSQ, dtype=jnp.int32).reshape(1, -1)
    meta = jnp.asarray([0, 1, 2, 3], jnp.int32)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(NP_,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((1, TSQ), jnp.int32),
                        pltpu.SemaphoreType.DMA])
    out = pl.pallas_call(
        functools.partial(kern, mul=mul), grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((1, NP_ * TSQ), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(meta, src)
    ok = np.array_equal(np.asarray(out), np.asarray(src))
    print(f"mul={mul}: identity fetch ok = {ok}")
    if not ok:
        o = np.asarray(out).reshape(NP_, TSQ)
        s = np.asarray(src).reshape(NP_, TSQ)
        for k in range(NP_):
            if not np.array_equal(o[k], s[k]):
                print(f"  block {k}: got first={o[k][:4]} want={s[k][:4]}")
    return ok


with jax.enable_x64(False):
    a = run(False)
    b = run(True)
sys.exit(0 if (a and b) else 1)
