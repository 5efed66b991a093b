#!/usr/bin/env python3
"""Benchmark: parcel-steps/s/chip for the full timestep pipeline.

Runs the flagship configuration (solid-body wind on an ERA-Interim-size
global grid; advection + turbulent + mesoscale diffusion + decay) for a
number of timed steps and prints ONE JSON line:

    {"metric": "parcel_steps_per_s_per_chip", "value": N,
     "unit": "parcel-steps/s", "vs_baseline": R}

Baseline: the reference's profiling example implies ~8.6e6
parcel-steps/s for MODULE_ADVECT on a 4-thread CPU
(/root/reference/docs/manual/profiling.md:60; BASELINE.md).

Default uses the packed-gather f32 interpolation fast path; --exact
switches to the reference-parity f64 path.
"""

import argparse
import json
import os
import sys
import time


BASELINE_PARCEL_STEPS_S = 8.6e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--np", type=int, dest="n_parcels",
                    default=int(os.environ.get("BENCH_NP", 2_000_000)))
    ap.add_argument("--steps", type=int,
                    default=int(os.environ.get("BENCH_STEPS", 20)))
    ap.add_argument("--nx", type=int, default=360)
    ap.add_argument("--ny", type=int, default=181)
    ap.add_argument("--nz", type=int, default=61)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU backend")
    ap.add_argument("--exact", action="store_true",
                    help="reference-parity f64 interpolation instead of "
                         "the packed f32 fast path")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import __graft_entry__ as g
    from mptrac_tpu.physics import pipeline

    ctl, clim, met01, atm, cache = g._make_setup(
        args.n_parcels, nx=args.nx, ny=args.ny, nz=args.nz)

    pack = None
    if not args.exact:
        from mptrac_tpu.ops.fast_interp import build_advect_pack
        pack = jax.jit(build_advect_pack)(met01)
        jax.block_until_ready(pack)

    step = jax.jit(
        lambda m, a, c, t, p: pipeline.run_timestep(ctl, clim, m, a, c,
                                                    t, pack=p))

    # Warmup / compile
    t = jnp.asarray(ctl.dt_mod, jnp.float64)
    a, c = step(met01, atm, cache, t, pack)
    jax.block_until_ready((a.lon, c.rng_ctr))

    t0 = time.time()
    for i in range(args.steps):
        t = jnp.asarray((i + 2) * ctl.dt_mod, jnp.float64)
        a, c = step(met01, a, c, t, pack)
    jax.block_until_ready((a.lon, c.rng_ctr))
    dt = time.time() - t0

    rate = args.n_parcels * args.steps / dt
    n_dev = jax.local_device_count()
    result = {
        "metric": "parcel_steps_per_s_per_chip",
        "value": rate / n_dev,
        "unit": "parcel-steps/s",
        "vs_baseline": rate / n_dev / BASELINE_PARCEL_STEPS_S,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
