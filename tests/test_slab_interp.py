"""Production slab-gather kernel (ops.slab_interp, interpret mode):
all three modes must match the XLA packed-gather paths exactly (same
f32 arithmetic order), with stragglers recovered by the fallback."""

import jax
import jax.numpy as jnp
import numpy as np

from mptrac_tpu import stack_met
from mptrac_tpu.met.synthetic import make_wind_met
from mptrac_tpu.ops import interp
from mptrac_tpu.ops import slab_interp as SL


def _setup(n=24576, seed=3, nx=60, ny=31, nz=10):
    met01 = stack_met(
        make_wind_met(t0=0.0, alpha=30.0, nx=nx, ny=ny, nz=nz),
        make_wind_met(t0=86400.0, alpha=30.0, nx=nx, ny=ny, nz=nz))
    rng = np.random.default_rng(seed)
    lon = jnp.asarray(rng.uniform(-180, 180, n))
    lat = jnp.asarray(rng.uniform(-85, 85, n))
    p = jnp.asarray(rng.uniform(120, 950, n))
    ts = jnp.full(n, 43200.0)
    met0 = jax.tree.map(lambda x: x[0], met01)
    loc = interp.locate_3d(met0, lon, lat, p)
    return met01, loc, ts


def test_uvwt_matches_packed64():
    met01, loc, ts = _setup()
    from mptrac_tpu.ops.fast_interp import (build_advect_pack64,
                                            interp_uvw_packed64,
                                            interp_t_packed64)
    pack64 = build_advect_pack64(met01)
    tables = SL.build_slab_tables(met01, sfc=False)
    ny = met01.lat.shape[-1]
    npl = met01.p.shape[-1]

    u_ref, v_ref, w_ref = interp_uvw_packed64(met01, pack64, ts, loc)
    t_ref = interp_t_packed64(met01, pack64, ts, loc)

    base = ((loc.ix * ny + loc.iy) * npl + loc.iz).astype(jnp.int32)
    order = jnp.argsort(base)
    wt = (met01.time[1] - ts) / (met01.time[1] - met01.time[0])
    w4 = jnp.stack([loc.wx, loc.wy, loc.wz, wt]
                   ).astype(jnp.float32)[:, order]

    nx = met01.lon.shape[-1]
    out, served = SL.interp_uvwt(tables, base[order], w4, npl,
                                 ny * npl, (nx - 1) * ny * npl,
                                 interpret=True)
    assert float(served) > 0.9
    ref = np.stack([np.asarray(u_ref), np.asarray(v_ref),
                    np.asarray(w_ref), np.asarray(t_ref)]
                   )[:, np.asarray(order)]
    # f64 parity-path wt vs kernel f32 wt: one-ulp slack
    got = np.stack([np.asarray(x, np.float64) for x in out])
    np.testing.assert_allclose(got, ref, rtol=3e-6, atol=2e-5)


def test_uvwt_unsorted_recovered_by_fallback():
    """Random (unsorted) parcels must still come out exact as long as
    the fallback cap covers the stragglers."""
    met01, loc, ts = _setup(n=4096, seed=11)
    from mptrac_tpu.ops.fast_interp import (build_advect_pack64,
                                            interp_uvw_packed64)
    pack64 = build_advect_pack64(met01)
    tables = SL.build_slab_tables(met01, sfc=False)
    ny = met01.lat.shape[-1]
    npl = met01.p.shape[-1]
    u_ref, v_ref, w_ref = interp_uvw_packed64(met01, pack64, ts, loc)
    base = ((loc.ix * ny + loc.iy) * npl + loc.iz).astype(jnp.int32)
    wt = (met01.time[1] - ts) / (met01.time[1] - met01.time[0])
    w4 = jnp.stack([loc.wx, loc.wy, loc.wz, wt]).astype(jnp.float32)
    nx = met01.lon.shape[-1]
    out, served = SL.interp_uvwt(tables, base, w4, npl, ny * npl,
                                 (nx - 1) * ny * npl, cap_frac=1,
                                 interpret=True)
    ref = np.stack([np.asarray(u_ref), np.asarray(v_ref),
                    np.asarray(w_ref)])
    got = np.stack([np.asarray(x, np.float64) for x in out[:3]])
    np.testing.assert_allclose(got, ref, rtol=3e-6, atol=2e-5)


def test_meso_matches_pack64_path():
    met01, loc, ts = _setup(n=16384, seed=5)
    from mptrac_tpu.ops.fast_interp import build_advect_pack64
    pack64 = build_advect_pack64(met01)
    tables = SL.build_slab_tables(met01, sfc=False)
    ny = met01.lat.shape[-1]
    npl = met01.p.shape[-1]
    base = ((loc.ix * ny + loc.iy) * npl + loc.iz).astype(jnp.int32)
    order = jnp.argsort(base)
    base_s = base[order]

    # reference: diffusion.py pack64 sigma arithmetic
    rows = jnp.take(pack64, base_s, axis=0)
    sig_ref = []
    for comp in range(3):
        mean = jnp.zeros(rows.shape[0], jnp.float32)
        msq = jnp.zeros(rows.shape[0], jnp.float32)
        for c in range(8):
            for lane in (c * 6 + comp, c * 6 + 3 + comp):
                val = rows[:, lane]
                mean = mean + val
                msq = msq + val * val
        var = (msq / jnp.float32(16.0)
               - (mean / jnp.float32(16.0)) ** 2)
        sig_ref.append(jnp.where(var > 0, jnp.sqrt(var), 0.0))
    sig_ref = np.stack([np.asarray(s) for s in sig_ref])

    nx = met01.lon.shape[-1]
    sig, served = SL.meso_sigma(tables, base_s, npl, ny * npl,
                                (nx - 1) * ny * npl, cap_frac=4,
                                interpret=True)
    sig = jnp.stack(sig)
    assert float(served) > 0.8
    # var = msq - mean^2 cancels ~6 digits on smooth wind fields, so
    # 0.5-ulp fma-contraction differences between the two graphs are
    # amplified; sigma only scales stochastic noise, so compare loosely
    np.testing.assert_allclose(np.asarray(sig, np.float64), sig_ref,
                               rtol=1e-2, atol=2e-3)


def test_sfc_matches_sfc_packed():
    met01, loc, ts = _setup(n=16384, seed=7)
    from mptrac_tpu.ops.fast_interp import (build_sfc_pack,
                                            interp_sfc_packed)
    sfc = build_sfc_pack(met01)
    tables = SL.build_slab_tables(met01, wind=False)
    ny = met01.lat.shape[-1]

    names = ("ps", "pbl", "ts", "zs")
    ref = interp_sfc_packed(met01, sfc, names, ts, loc)

    basexy = (loc.ix * ny + loc.iy).astype(jnp.int32)
    order = jnp.argsort(basexy)
    wt = (met01.time[1] - ts) / (met01.time[1] - met01.time[0])
    w4 = jnp.stack([loc.wx, loc.wy, wt, jnp.zeros_like(wt)]
                   ).astype(jnp.float32)[:, order]
    nx = met01.lon.shape[-1]
    fields = tuple(SL.SFC_FIELDS.index(name) for name in names)
    out, served = SL.interp_sfc(tables, basexy[order], w4, fields,
                                ny, (nx - 1) * ny, interpret=True)
    assert float(served) > 0.9
    for i, name in enumerate(names):
        np.testing.assert_allclose(
            np.asarray(out[i], np.float64),
            np.asarray(ref[name])[np.asarray(order)],
            rtol=3e-6, atol=2e-5)


def test_permute_f32_cols_banded_and_random():
    """Banded-gather permute must be exact for both nearly-banded and
    fully random permutations (fallback covers the stragglers)."""
    rng = np.random.default_rng(2)
    n = 50_000
    cols = [jnp.asarray(rng.standard_normal(n).astype(np.float32))
            for _ in range(7)]
    # banded: local shuffles plus a few big jumps
    perm = np.arange(n)
    for i in range(0, n - 64, 64):
        rng.shuffle(perm[i:i + 64])
    jump = rng.integers(0, n, 500)
    perm[jump] = rng.permutation(perm[jump])
    for p in (perm, rng.permutation(n)):
        got = SL.permute_f32_cols(cols, jnp.asarray(p, jnp.int32),
                                  cap_frac=1, interpret=True)
        for c, gr in zip(cols, got):
            np.testing.assert_array_equal(np.asarray(gr),
                                          np.asarray(c)[p])
