"""Command-line interface mirroring the reference programs' argv contract.

    python -m dwt_tpu.cli encode input.pnm output.dwt [CAPACITY]
    python -m dwt_tpu.cli decode input.dwt output.pnm [PIXELS]

``-`` means stdin/stdout, as in the reference (bytes.h:26-28,42-44).
Prints the same style of bit-count stats to stderr (encode.c:176,180,230).
"""

from __future__ import annotations

import sys


def _err(msg: str) -> int:
    print(msg, file=sys.stderr)
    return 1


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in ("encode", "decode", "tiled-encode"):
        return _err("usage: dwt_tpu {encode,decode,tiled-encode} IN OUT "
                    "[CAPACITY|PIXELS|TILE [BUDGET]]")
    mode, args = argv[0], argv[1:]

    # DWT_TRACE=<dir>: wrap the run in a jax.profiler device trace
    # (utils/trace.py); DWT_SELFCHECK=1 additionally makes every encode
    # verify its own stream decodes losslessly (codec/encoder.py).
    import os

    from .runtime import cache

    cache.enable()
    # Honor an explicit JAX_PLATFORMS request: TPU plugins (e.g. the axon
    # sitecustomize) force-pin the platform at backend init, overriding the
    # env var — re-pin through the config the way tests/conftest.py and
    # __graft_entry__.py do, so `JAX_PLATFORMS=cpu python -m dwt_tpu.cli`
    # really runs on CPU.
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass  # backend already initialized; env pin already applied
    trace_dir = os.environ.get("DWT_TRACE")
    if trace_dir:
        from .utils.trace import device_trace

        with device_trace(trace_dir):
            return _run(mode, args)
    return _run(mode, args)


def _run(mode: str, args: list) -> int:

    if mode == "tiled-encode":
        if len(args) not in (2, 3, 4):
            return _err("usage: dwt_tpu tiled-encode input.pnm output.dwtt "
                        "[TILE] [BUDGET]")
        from .codec import tiled
        from .io import pnm

        img, gray = pnm.read_pnm(args[0])
        t = int(args[2]) if len(args) >= 3 else 512
        budget = int(args[3]) if len(args) == 4 else 0
        data = tiled.encode_tiled(img, tile=(t, t), budget=budget)
        with open(args[1], "wb") as f:
            f.write(data)
        print(f"{len(data)} bytes, {t}x{t} tiles", file=sys.stderr)
        return 0

    if len(args) not in (2, 3):
        if mode == "encode":
            return _err("usage: dwt_tpu encode input.pnm output.dwt [CAPACITY]")
        return _err("usage: dwt_tpu decode input.dwt output.pnm [PIXELS]")

    from .io import pnm

    if mode == "encode":
        from .codec import encoder
        from .geometry import MAX_DIM, MIN_LEN

        img, gray = pnm.read_pnm(args[0])
        h, w = img.shape[:2]
        if w > MAX_DIM or h > MAX_DIM or w < MIN_LEN or h < MIN_LEN:
            return _err(f"unsupported image size {w}x{h}")
        capacity = int(args[2]) if len(args) == 3 else 0
        enc = encoder.get_encoder(img.shape[1], img.shape[0], img.shape[2])
        stream, info = enc.encode_with_stats(img, capacity=capacity)
        if args[1] == "-":
            sys.stdout.buffer.write(stream)
            sys.stdout.buffer.flush()
        else:
            with open(args[1], "wb") as f:
                f.write(stream)
        # Reference-style stage counters (encode.c:176,180,230): meta and
        # root bits separately, then the total (which includes both).
        print(f"{info['meta_bits']} bits for meta data", file=sys.stderr)
        print(f"{info['root_bits']} bits for root image", file=sys.stderr)
        print(f"{info['payload_bits'] + info['meta_bits']} bits "
              f"({(len(stream)+512)//1024} KiB) encoded; "
              f"planes={info['planes']} levels={info['levels']} "
              f"{info['mps']:.2f} MP/s", file=sys.stderr)
        return 0

    from .codec import decoder

    if args[0] == "-":
        stream = sys.stdin.buffer.read()
    else:
        with open(args[0], "rb") as f:
            stream = f.read()
    pixels = int(args[2]) if len(args) == 3 else 0
    try:
        if stream[:2] == b"WT":  # tiled container auto-detect
            from .codec import tiled

            img, gray = tiled.decode_tiled(stream, pixels_max=pixels)
        else:
            img, gray = decoder.decode(stream, pixels_max=pixels)
    except ValueError as e:
        return _err(str(e))
    pnm.write_pnm(args[1], img, gray=gray)
    return 0


if __name__ == "__main__":
    sys.exit(main())
