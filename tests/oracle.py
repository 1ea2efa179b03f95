"""Test oracle: builds and runs the reference C codec from /root/reference.

The reference sources are mounted read-only and are never copied into this
repo; we compile them out-of-tree into a cache dir and shell out.  Small
C probe programs that #include the reference headers extract kernel-level
goldens (cdf53, hilbert, vli/rle bit output, geometry).
"""

from __future__ import annotations

import os
import subprocess
import tempfile
from pathlib import Path

REF = Path(os.environ.get("DWT_REFERENCE", "/root/reference"))
CACHE = Path(os.environ.get("DWT_ORACLE_CACHE", "/tmp/dwt_oracle"))


def available() -> bool:
    return REF.exists() and (REF / "encode.c").exists()


def _build(name: str, src: Path) -> Path:
    CACHE.mkdir(parents=True, exist_ok=True)
    out = CACHE / name
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    subprocess.run(
        ["cc", "-std=c99", "-O2", "-I", str(REF), str(src), "-o", str(out)],
        check=True, capture_output=True,
    )
    return out


def encode_bin() -> Path:
    return _build("encode", REF / "encode.c")


def decode_bin() -> Path:
    return _build("decode", REF / "decode.c")


def ref_encode(pnm: bytes, capacity: int = 0) -> bytes:
    """Run reference encoder on in-memory PNM; returns .dwt bytes."""
    with tempfile.TemporaryDirectory() as d:
        inp, outp = Path(d) / "in.pnm", Path(d) / "out.dwt"
        inp.write_bytes(pnm)
        args = [str(encode_bin()), str(inp), str(outp)]
        if capacity:
            args.append(str(capacity))
        subprocess.run(args, check=True, capture_output=True)
        return outp.read_bytes()


def ref_encode_stderr(pnm: bytes, capacity: int = 0) -> str:
    """Run reference encoder; returns its stderr text (the stage bit
    counters of encode.c:176,180,230)."""
    with tempfile.TemporaryDirectory() as d:
        inp, outp = Path(d) / "in.pnm", Path(d) / "out.dwt"
        inp.write_bytes(pnm)
        args = [str(encode_bin()), str(inp), str(outp)]
        if capacity:
            args.append(str(capacity))
        res = subprocess.run(args, check=True, capture_output=True, text=True)
        return res.stderr


def ref_decode(dwt: bytes, pixels: int = 0) -> bytes:
    """Run reference decoder; returns PNM bytes."""
    with tempfile.TemporaryDirectory() as d:
        inp, outp = Path(d) / "in.dwt", Path(d) / "out.pnm"
        inp.write_bytes(dwt)
        args = [str(decode_bin()), str(inp), str(outp)]
        if pixels:
            args.append(str(pixels))
        subprocess.run(args, check=True, capture_output=True)
        return outp.read_bytes()


_PROBE_CACHE = {}


def probe(name: str, c_source: str, argv: list) -> str:
    """Compile (cached) and run a tiny C probe that includes reference headers."""
    src = CACHE / f"probe_{name}.c"
    CACHE.mkdir(parents=True, exist_ok=True)
    if _PROBE_CACHE.get(name) != c_source:
        src.write_text(c_source)
        _PROBE_CACHE[name] = c_source
        exe = CACHE / f"probe_{name}"
        subprocess.run(
            ["cc", "-std=c99", "-O2", "-I", str(REF), str(src), "-o", str(exe)],
            check=True, capture_output=True,
        )
    exe = CACHE / f"probe_{name}"
    res = subprocess.run([str(exe)] + [str(a) for a in argv],
                         check=True, capture_output=True, text=True)
    return res.stdout
