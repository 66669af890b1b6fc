"""Program entry: the reference's main program (src/main.f90:1-56).

Usage:
    python -m varden_tpu [inputs_file] [--key value ...]

Reads a reference-format &PROBIN namelist, applies --key value command-line
overrides (probin.template:107-126), runs the simulation, and reports total
wall time and device memory statistics (main.f90:31-52 equivalents).

The inputs file is located with the reference's 3-way priority
(probin.template:72-105): the $PROBIN environment variable, then the first
non-flag command-line argument, then ./inputs_varden.
"""
from __future__ import annotations

import os
import sys
import time

import jax

# Tunneled-TPU plugins may register themselves regardless of JAX_PLATFORMS;
# re-assert the env var's choice through the config so `JAX_PLATFORMS=cpu
# python -m varden_tpu ...` really runs on CPU.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    # Inputs-file discovery priority (probin.template:72-105):
    # $PROBIN env var > first non-flag argument > ./inputs_varden.
    path = None
    if argv and not argv[0].startswith("-"):
        path = argv[0]
        argv = argv[1:]
    env = os.environ.get("PROBIN")
    if env:
        if path is not None and path != env:
            # Reference priority gives $PROBIN the win (probin.template:
            # 72-105), but never silently: the user typed a file name.
            print(f"warning: $PROBIN={env} overrides the inputs-file "
                  f"argument '{path}' (unset PROBIN to use the argument)")
        path = env
    elif path is None and os.path.exists("inputs_varden"):
        path = "inputs_varden"
    if path is None:
        print(__doc__)
        print("error: no inputs file ($PROBIN, argument, or ./inputs_varden)")
        return 1
    overrides = {}
    i = 0
    while i < len(argv):
        key = argv[i].lstrip("-")
        val = argv[i + 1]
        overrides[key] = val
        i += 2

    from .config import load_config, VardenConfig
    import dataclasses
    cfg = load_config(path)
    if overrides:
        fields = {f.name: f for f in dataclasses.fields(VardenConfig)}
        typed = {}
        for k, v in overrides.items():
            if k not in fields:
                print(f"warning: unknown parameter --{k}")
                continue
            cur = getattr(cfg, k)
            typed[k] = type(cur)(v) if not isinstance(cur, bool) else \
                v.lower() in ("t", "true", ".true.", "1")
        cfg = dataclasses.replace(cfg, **typed)

    # TPU-first dtype default: the config default is float64 (the
    # reference's dp_t), but TPU f64 is software-emulated and this image's
    # remote compiler rejects/crashes on parts of it (f64 LuDecomposition,
    # nodal-solve SIGILL). When neither the inputs file nor the CLI chose a
    # dtype, run the f32 TPU-native fast path on TPU backends.
    if "dtype" not in overrides:
        from .config import parse_namelist
        with open(path) as f:
            raw_keys = parse_namelist(f.read())
        if "dtype" not in raw_keys and jax.default_backend() != "cpu":
            print("varden_tpu: float32 fast path on TPU backend "
                  "(pass --dtype float64 to force reference precision)")
            cfg = dataclasses.replace(cfg, dtype="float32")

    from .driver import Varden
    t0 = time.perf_counter()
    v = Varden(cfg)
    v.run()
    wall = time.perf_counter() - t0
    print(f"Run time = {wall:.6f}")
    try:
        for d in jax.local_devices():
            stats = d.memory_stats()
            if stats:
                print(f"[{d}] bytes_in_use={stats.get('bytes_in_use', 0)} "
                      f"peak={stats.get('peak_bytes_in_use', 0)}")
    except Exception:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
