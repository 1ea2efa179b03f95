"""Benchmark driver: one JSON line for the round driver.

Measures lossless encode throughput on a synthetic 4K RGB image (the
BASELINE.md headline config) on one chip.  Reports device-side throughput
with a scalar-only sync per call: on production hosts the stream payload
D2H rides PCIe at GB/s and is negligible, but this dev environment reaches
its TPU through a ~20 MB/s TCP relay which would otherwise dominate the
measurement.  Correctness of the measured pipeline is asserted in-run: the
encoded stream must be byte-identical to the reference C encoder (built
from /root/reference when present; otherwise the sequential spec encoder
on a crop).

Structure (round-3 rework, after BENCH_r02's rc=124):
 - The persistent XLA compilation cache (dwt_tpu/runtime/cache.py) is
   enabled everywhere: relay-side compiles of the 4K stage-2 program can
   take tens of minutes cold, and are sub-second warm.
 - The cascade first runs the on-device kernel selftest (dwt_tpu/selftest
   — byte-parity of every kernel configuration at production constants on
   small images, seconds each when warm) and starts at the first rung
   whose configuration passed, so a single miscompiling kernel can never
   consume the whole driver budget before a fallback reports.
 - Every rung runs a small-image parity gate BEFORE any 4K work.
 - The JSON records which rung produced the number and the selftest map.

Output (stdout): {"metric": ..., "value": N, "unit": "MP/s",
"vs_baseline": N, ...}
Baseline: reference C encoder, same 4K synthetic content: 2.60 MP/s
(BASELINE.md, measured).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_MPS = 2.60       # reference C encode, 4K, 1 thread (BASELINE.md)
DEC_BASELINE_MPS = 2.24   # reference C decode, same stream
W, H = 3840, 2160


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _oracle_or_none():
    """The reference C binary, if buildable here; else None (loudly)."""
    sys.path.insert(0, "tests")
    try:
        import oracle

        if oracle.available():
            oracle.encode_bin()  # force the build now, not mid-measurement
            return oracle
        log("oracle: /root/reference not present")
    except Exception as e:  # noqa: BLE001 - report, then fall back
        log(f"oracle: reference build FAILED ({e!r})")
    return None


def main():
    sys.path.insert(0, "tests")
    from imagegen import random_image

    import jax
    import jax.numpy as jnp

    from dwt_tpu.codec import encoder
    from dwt_tpu.runtime import cache

    cache.enable()
    rung = os.environ.get("DWT_BENCH_RUNG", "full")
    orc = _oracle_or_none()

    # ---- small parity gate first: seconds, catches a broken kernel ----
    rng = np.random.default_rng(7)
    small = random_image(rng, 512, 512, 3, "mixed")
    t0 = time.time()
    if orc is not None:
        from dwt_tpu.io.pnm import pnm_bytes

        assert encoder.encode(small) == orc.ref_encode(pnm_bytes(small)), \
            f"BENCH INVALID (rung {rung}): 512x512 stream != reference C"
        log(f"parity gate 512x512 vs reference C: ok ({time.time()-t0:.0f}s)")
    else:
        from dwt_tpu import specmodel

        assert encoder.encode(small) == specmodel.encode(small, gray=False), \
            f"BENCH INVALID (rung {rung}): 512x512 stream != spec model"
        log(f"parity gate 512x512 vs spec model: ok ({time.time()-t0:.0f}s)")

    img = random_image(rng, W, H, 3, "mixed")
    enc = encoder.get_encoder(W, H, 3)
    img_dev = jnp.asarray(img)

    # Warm-up / compile.  The timed function must CONSUME the stream words
    # (checksum) — returning only the bit count lets XLA dead-code-eliminate
    # the entire packing stage and overstates throughput ~3x.
    t0 = time.time()
    lin, stats = enc._stage1(img_dev, enc._perm)
    T = int(stats["T"])
    st2 = enc._get_stage2(encoder._bucket(T))

    @jax.jit
    def full(lin, stats):
        words, total_bits, _ = st2(lin, stats)
        return jnp.sum(words, dtype=jnp.uint32), total_bits

    cs, tb = full(lin, stats)
    int(cs), int(tb)
    log(f"warmup/compile: {time.time()-t0:.1f}s  T={T}")

    # Correctness gate: the full 4K stream must match the ground truth.
    stream = enc.encode(img)
    if orc is not None:
        from dwt_tpu.io.pnm import pnm_bytes

        want = orc.ref_encode(pnm_bytes(img))
        assert stream == want, \
            f"BENCH INVALID (rung {rung}): 4K stream != reference C"
        log("correctness gate: byte-identical to reference C encoder")
    else:
        from dwt_tpu import specmodel

        crop = img[:256, :256]
        assert encoder.encode(crop) == specmodel.encode(crop, gray=False), \
            f"BENCH INVALID (rung {rung}): 256 crop != spec model"
        log("correctness gate: spec-model parity on 256x256 crop")

    warmup_s = time.time() - t0

    # Timed region: full device pipeline per image.  Enqueue every frame,
    # then sync each scalar once at the end — interleaving host syncs with
    # dispatches re-stages the relay-attached device every iteration and
    # measures the tunnel, not the codec.  The stage-2 executable is the
    # warm bucket's (as in a production stream of same-geometry frames;
    # bucket changes re-dispatch, which warmup already paid).
    n = 5
    t0 = time.time()
    outs = [full(*enc._stage1(img_dev, enc._perm)) for _ in range(n)]
    for cs2, tb2 in outs:
        int(cs2), int(tb2)
    dt = (time.time() - t0) / n
    mps = W * H / 1e6 / dt

    # Decode: native entropy parse (host) + TPU inverse pipeline.  The
    # parse dominates; the inverse tail is timed separately with one
    # warm-up decode so compile time stays out of the measurement.
    from dwt_tpu.codec import decoder
    from dwt_tpu.runtime import native

    pyr = enc.pyr
    dimg, _ = decoder.decode(stream)  # warm-up (parse + inverse) + correctness
    assert np.array_equal(dimg, img), "BENCH INVALID: decode roundtrip"
    t0 = time.time()
    coeffs, missing, level, planes = native.entropy_decode(
        stream[6:], 3, pyr.levels, pyr.levels, pyr.pixels)
    parse_s = time.time() - t0
    # Device inverse timed with a scalar-only sync (the full image D2H
    # rides PCIe on production hosts; here it would measure the ~20 MB/s
    # dev tunnel instead of the codec).
    tail = decoder._tail_fn(W, H, level + 1, 3, False)
    cj, mj = jnp.asarray(coeffs), jnp.asarray(missing)
    int(jnp.sum(tail(cj, mj), dtype=jnp.uint32))  # warm-up/compile
    t0 = time.time()
    int(jnp.sum(tail(cj, mj), dtype=jnp.uint32))
    inv_s = time.time() - t0
    decode_s = parse_s + inv_s
    dec_mps = W * H / 1e6 / decode_s
    log(f"decode: parse {parse_s:.2f}s + inverse {inv_s:.2f}s = "
        f"{dec_mps:.2f} MP/s (C baseline {DEC_BASELINE_MPS})")

    # Tiled decode aggregate: 32 uniform 540x480 tiles of the same image
    # (the production many-stream path — independent tile streams parse on
    # all host cores, one vmapped TPU inverse).  MP/s from threaded parse +
    # device inverse, scalar-only syncs as above.
    from dwt_tpu.codec import tiled
    from dwt_tpu.geometry import compute_pyramid

    data = tiled.encode_tiled(img, tile=(540, 480))
    n = (W // 480) * (H // 540)
    table = np.frombuffer(data[16 : 16 + 4 * n], "<u4")
    offs = 16 + 4 * n + np.concatenate([[0], np.cumsum(table)])
    payloads = [data[int(a) : int(b)] for a, b in zip(offs[:-1], offs[1:])]
    tpyr = compute_pyramid(480, 540)
    native.entropy_decode_batch(  # warm-up
        payloads[:4], 3, tpyr.levels, tpyr.levels, tpyr.pixels, nthreads=4)
    t0 = time.time()
    co, mi, lv, _pl, rc = native.entropy_decode_batch(
        payloads, 3, tpyr.levels, tpyr.levels, tpyr.pixels, nthreads=0)
    tparse_s = time.time() - t0
    lvl = int(lv.min())
    btail = decoder._tail_batch_fn(480, 540, lvl + 1, 3, False)
    cjb, mjb = jnp.asarray(co), jnp.asarray(mi)
    int(jnp.sum(btail(cjb, mjb), dtype=jnp.uint32))  # warm-up/compile
    t0 = time.time()
    int(jnp.sum(btail(cjb, mjb), dtype=jnp.uint32))
    tinv_s = time.time() - t0
    tdec_mps = W * H / 1e6 / (tparse_s + tinv_s)
    log(f"tiled decode: parse {tparse_s:.2f}s + inverse {tinv_s:.2f}s = "
        f"{tdec_mps:.2f} MP/s aggregate (C baseline {DEC_BASELINE_MPS})")

    print(json.dumps({
        "metric": "encode_4k_lossless_throughput",
        "value": round(mps, 3),
        "unit": "MP/s",
        "vs_baseline": round(mps / BASELINE_MPS, 3),
        "decode_mps": round(dec_mps, 3),
        "decode_vs_baseline": round(dec_mps / DEC_BASELINE_MPS, 3),
        "tiled_decode_mps": round(tdec_mps, 3),
        "tiled_decode_vs_baseline": round(tdec_mps / DEC_BASELINE_MPS, 3),
        "warmup_seconds": round(warmup_s, 1),
        "rung": os.environ.get("DWT_BENCH_RUNG", "full"),
        "selftest": json.loads(os.environ.get("DWT_BENCH_SELFTEST", "{}")),
    }))


# Rung name -> kernel gates.  Mirrors dwt_tpu/selftest.CONFIGS (narrow ->
# broad there; broad -> narrow here: we bench the fastest configuration
# whose selftest passed and fall back only on failure).
RUNGS = [
    ("full", {}),
    ("fusedstats", {"DWT_NO_ENGINE": "1"}),
    ("mxuranks", {"DWT_NO_ENGINE": "1", "DWT_STATS_LOOP": "1"}),
    ("kernels", {"DWT_NO_ENGINE": "1", "DWT_NO_MXURANK": "1",
                 "DWT_STATS_LOOP": "1"}),
    ("xla", {"DWT_NO_PALLAS": "1"}),
]


def _cascade():
    """Selftest every kernel configuration (small images, seconds when the
    compile cache is warm), then bench the fastest configuration that
    passed; fall back down the rungs on any failure.  A single miscompiled
    kernel therefore costs one small-image selftest, never the driver's 4K
    budget (BENCH_r02 regression: rc=124)."""
    import subprocess

    from dwt_tpu import selftest

    t0 = time.time()
    st = selftest.run()
    log(f"selftest: {st} ({time.time()-t0:.0f}s)")
    for name, extra in RUNGS:
        if st.get(name) not in (None, "ok"):
            log(f"bench rung {name}: skipped (selftest {st[name]})")
            continue
        if name != "xla" and st.get("kdrive") not in (None, "ok"):
            # The direct kernel drive failed: every Pallas rung shares
            # kernels A/B, so only the pure-XLA rung is trustworthy.
            log(f"bench rung {name}: skipped (selftest kdrive "
                f"{st['kdrive']})")
            continue
        env = dict(os.environ, DWT_BENCH_INNER="1", DWT_BENCH_RUNG=name,
                   DWT_BENCH_SELFTEST=json.dumps(st), **extra)
        try:
            r = subprocess.run([sys.executable, __file__], env=env,
                               timeout=5400)
            rc = r.returncode
        except subprocess.TimeoutExpired:
            rc = "timeout"
        if rc == 0:
            return 0
        log(f"bench rung {name} failed (rc={rc}); trying next")
    return 1


if __name__ == "__main__":
    if os.environ.get("DWT_BENCH_INNER") == "1":
        main()
    else:
        sys.exit(_cascade())
