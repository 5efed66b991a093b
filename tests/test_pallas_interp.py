"""Pallas interpolation kernels (interpret mode) must match the XLA
packed-gather path exactly (same f32 arithmetic order)."""

import jax
import jax.numpy as jnp
import numpy as np

from mptrac_tpu import stack_met
from mptrac_tpu.met.synthetic import make_wind_met
from mptrac_tpu.ops import interp
from mptrac_tpu.ops.fast_interp import build_advect_pack, interp_uvw_packed
from mptrac_tpu.ops.pallas_interp import interp_uvw_sorted


def test_slab_kernel_matches_packed():
    met01 = stack_met(make_wind_met(t0=0.0, alpha=30.0, nx=60, ny=31,
                                    nz=10),
                      make_wind_met(t0=86400.0, alpha=30.0, nx=60,
                                    ny=31, nz=10))
    pack = build_advect_pack(met01)
    ny = met01.lat.shape[-1]
    npl = met01.p.shape[-1]

    # dense enough that a sorted 512-parcel block spans << slab_rows
    # cells (the production regime: ~100M parcels vs ~10M grid cells)
    n = 24576
    rng = np.random.default_rng(3)
    lon = jnp.asarray(rng.uniform(-180, 180, n))
    lat = jnp.asarray(rng.uniform(-85, 85, n))
    p = jnp.asarray(rng.uniform(120, 950, n))
    ts = jnp.full(n, 43200.0)

    met0 = jax.tree.map(lambda x: x[0], met01)
    loc = interp.locate_3d(met0, lon, lat, p)
    u_ref, v_ref, w_ref = interp_uvw_packed(met01, pack, ts, loc)

    # Sort by cell (the production driver runs module_sort)
    base = ((loc.ix * ny + loc.iy) * npl + loc.iz).astype(jnp.int32)
    order = jnp.argsort(base)
    base_s = base[order]
    wts = jnp.stack([
        loc.wx, loc.wy, loc.wz,
        (met01.time[1] - ts) / (met01.time[1] - met01.time[0])],
        axis=-1)[order]

    uvw, ok = interp_uvw_sorted(pack, base_s, wts,
                                strides=(ny * npl, npl),
                                slab_rows=4096, interpret=True)
    ok = np.asarray(ok)
    assert ok.mean() > 0.95, f"slab coverage only {ok.mean():.2f}"

    ref = np.stack([np.asarray(u_ref), np.asarray(v_ref),
                    np.asarray(w_ref)], axis=-1)[np.asarray(order)]
    got = np.asarray(uvw, np.float64)
    # kernel time-lerps in f32 (packed path uses f64 wt): one-ulp slack
    np.testing.assert_allclose(got[ok], ref[ok], rtol=2e-6, atol=5e-7)


def test_slab_kernel_flags_out_of_slab():
    """Unsorted parcels spanning the whole grid must be flagged, not
    silently mis-interpolated."""
    rng = np.random.default_rng(7)
    ncell = 50000
    pack = jnp.asarray(rng.normal(size=(ncell, 8)), jnp.float32)
    base = jnp.asarray(rng.integers(0, ncell - 2000, 600), jnp.int32)
    wts = jnp.asarray(rng.uniform(0, 1, (600, 4)), jnp.float32)
    uvw, ok = interp_uvw_sorted(pack, base, wts, strides=(1200, 40),
                                slab_rows=2048, interpret=True)
    ok = np.asarray(ok)
    # random bases over 50k cells with 2k slabs: most must be flagged
    assert ok.mean() < 0.5
    assert np.isfinite(np.asarray(uvw)).all()


def test_lane_kernel_matches_packed():
    """Lane-gather kernel (ops.lane_interp): interp + meso sigma agree
    with the row-major fallback arithmetic to f32 fma-contraction
    tolerance; stragglers (unsorted parcels, tiny cap) are recovered
    by the fallback."""
    from mptrac_tpu.ops import lane_interp as L

    ncell = 40_000
    n = 20_000
    rng = np.random.default_rng(0)
    pack64 = jnp.asarray(
        rng.standard_normal((ncell, 64)).astype(np.float32))
    ncellp = -(-ncell // 128) * 128
    packT = jnp.pad(pack64.T, ((0, 0), (0, ncellp - ncell)))
    tables = L.LaneTables(packT=packT, pack64=pack64)

    base_np = np.sort(rng.integers(0, ncell - 1, n)).astype(np.int32)
    base = jnp.asarray(base_np)
    w = jnp.asarray(rng.random((4, n)), jnp.float32)

    uvw, tt, frac = L.interp_uvwt_sorted(tables, base, w, nwin=4,
                                         interpret=True)
    ref_rows = jnp.take(pack64, base, axis=0)
    ref_uvw, ref_t = L._interp_rows(ref_rows, w)
    assert float(frac) > 0.99
    np.testing.assert_allclose(np.asarray(uvw), np.asarray(ref_uvw),
                               atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(tt), np.asarray(ref_t),
                               atol=2e-6, rtol=1e-5)

    sig, frac2 = L.meso_sigma_sorted(tables, base, nwin=4,
                                     interpret=True)
    ref_sig = L._meso_rows(ref_rows)
    np.testing.assert_allclose(np.asarray(sig), np.asarray(ref_sig),
                               atol=2e-6, rtol=1e-4)

    # unsorted worst case: everything straggles, fallback covers all
    basep = jnp.asarray(rng.permutation(base_np)[:2000])
    wp = w[:, :2000]
    uvw_u, t_u, _ = L.interp_uvwt_sorted(tables, basep, wp, nwin=4,
                                         cap_frac=1, interpret=True)
    ref_u, ref_tu = L._interp_rows(jnp.take(pack64, basep, axis=0), wp)
    np.testing.assert_allclose(np.asarray(uvw_u), np.asarray(ref_u),
                               atol=2e-6, rtol=1e-5)
