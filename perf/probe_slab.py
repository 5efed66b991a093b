#!/usr/bin/env python3
"""Fine-grained attribution of the slab-interp advect path: time each
piece (locate, kernel, row extraction, fallback) in isolation so the
gap between the kernel microbenchmark and module_advect is explained.

Usage: python perf/probe_slab.py [--np N]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_mptrac"))


def _fetch(out):
    import jax
    import jax.numpy as jnp
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
    return float(sum(jnp.ravel(x)[0].astype(jnp.float32)
                     for x in leaves[:4]))


def timeit(fn, *args, n=10, **kw):
    out = fn(*args, **kw)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    _fetch(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--np", type=int, dest="n", default=2_000_000)
    ap.add_argument("--nx", type=int, default=360)
    ap.add_argument("--ny", type=int, default=181)
    ap.add_argument("--nz", type=int, default=61)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import jax.numpy as jnp

    import __graft_entry__ as g
    from mptrac_tpu.ops import interp, slab_interp
    from mptrac_tpu.ops.fast_interp import build_met_pack
    from mptrac_tpu.ops.sort import module_sort
    from mptrac_tpu.physics import timesteps
    from mptrac_tpu.types import astype_state

    n = args.n
    ctl, clim, met01, atm, cache = g._make_setup(
        n, nx=args.nx, ny=args.ny, nz=args.nz)
    atm, cache, met01, clim = astype_state(atm, cache, met01, clim)
    met01, atm, cache, clim = jax.device_put((met01, atm, cache, clim))
    lpack = jax.jit(functools.partial(build_met_pack, lane=True))(met01)
    jax.block_until_ready(lpack)
    atm, cache = jax.jit(module_sort)(met01, atm, cache)
    jax.block_until_ready(atm.lon)
    t = jnp.asarray(180.0, jnp.float64)
    cache = jax.jit(lambda c, a, m: timesteps.module_timesteps(
        ctl, c, m, a, t))(cache, atm, met01)
    jax.block_until_ready(cache.dt)
    tables = slab_interp.SlabTables(packT=lpack.packT, sfcT=lpack.sfcT,
                                    pack64=lpack.pack64)
    ny, npl = args.ny, args.nz
    nxc = args.nx  # synthetic grid: not periodic-duplicated
    ncell = nxc * ny * npl

    print(f"backend={jax.default_backend()} n={n}")
    res = {}

    # 1. locate_3d alone
    res["locate_3d"] = timeit(
        jax.jit(lambda a, m: interp.locate_3d(m, a.lon, a.lat, a.p)),
        atm, met01)
    loc = jax.jit(lambda a, m: interp.locate_3d(
        m, a.lon, a.lat, a.p))(atm, met01)
    jax.block_until_ready(loc)
    base = ((loc.ix * ny + loc.iy) * npl + loc.iz).astype(jnp.int32)
    wt = jnp.zeros(n, jnp.float32) + 0.5
    w4 = jnp.stack([loc.wx, loc.wy, loc.wz, wt]).astype(jnp.float32)
    base, w4 = jax.device_put((base, w4))
    jax.block_until_ready((base, w4))

    # 2. bare kernel call (no fallback, no row extraction)
    wrap = 2 * ny * npl
    CP, S, nanc = slab_interp._plan(tables.packT.shape[1], n, ny * npl)
    print(f"plan: CP={CP} S={S} nanc={nanc}")

    kern = jax.jit(lambda tab, b, w: slab_interp._slab_out3(
        tab, b, w, CP, S, ny * npl, "uvwt", nanc, ncell, wrap))
    res["kernel_uvwt_raw"] = timeit(kern, tables.packT, base, w4)

    # 3. kernel + row extraction
    def with_rows(tab, b, w):
        out3 = slab_interp._slab_out3(tab, b, w, CP, S, ny * npl,
                                      "uvwt", nanc, ncell, wrap)
        rows = [slab_interp._row(out3, r, n) for r in range(4)]
        ok = slab_interp._row(out3, 4, n) > 0.5
        return rows, ok
    res["kernel+rows"] = timeit(jax.jit(with_rows), tables.packT,
                                base, w4)

    # 4. full interp_uvwt (kernel + rows + fallback cond)
    res["interp_uvwt_full"] = timeit(
        jax.jit(lambda tb, b, w: slab_interp.interp_uvwt(
            tb, b, w, npl, ny * npl, ncell)), tables, base, w4)

    # 5. fallback pieces at the production cap
    cap = max(128, n // 32)
    ok = jax.jit(with_rows)(tables.packT, base, w4)[1]
    jax.block_until_ready(ok)
    res["compact_bad"] = timeit(
        jax.jit(lambda o: slab_interp._compact_bad(o, cap)), ok)
    idx_bad = jax.jit(lambda o: slab_interp._compact_bad(o, cap))(ok)
    jax.block_until_ready(idx_bad)
    res["fb_gather_pack64"] = timeit(
        jax.jit(lambda p, b, i: slab_interp._fb_corner_rows(p, b, i)),
        tables.pack64, base + wrap, idx_bad)

    # 6. uvwt_from_loc convenience wrapper (what module_advect calls)
    tm = jnp.zeros(n, jnp.float64) + 180.0
    res["uvwt_from_loc"] = timeit(
        jax.jit(lambda tb, m, lc, tt: slab_interp.uvwt_from_loc(
            tb, m, tt, lc)), tables, met01, loc, tm)

    # 7. weight stack + base computation alone
    def mkbase(lc, m):
        u3 = m.fields3d["u"]
        nyy, npll = u3.shape[-2:]
        b = ((lc.ix * nyy + lc.iy) * npll + lc.iz).astype(jnp.int32)
        wtt = interp.time_weight(m, t) + jnp.zeros_like(lc.wx)
        return b, jnp.stack([lc.wx, lc.wy, lc.wz, wtt]).astype(
            jnp.float32)
    res["base+weights"] = timeit(jax.jit(mkbase), loc, met01)

    for k, v in res.items():
        print(f"{k:<20} {v:>10.2f} ms {n / v / 1e3:>10.1f} Mp/s")


if __name__ == "__main__":
    main()
