"""Pallas TPU lane-gather interpolation for sorted parcels.

The production advection/meso/meteo hot path.  XLA's TPU gather is a
serial per-offset row copy (~8 ns/offset measured on v5e — 31 GB/s
effective against 819 GB/s HBM); this kernel replaces it with the one
dynamic-indexing primitive the VPU actually has: the *lane gather*
(``take_along_axis`` along the minor axis, 128 lanes wide).

Design (see docs/performance.md):

- The packed corner table (ops.fast_interp.build_advect_pack64 layout)
  is stored **transposed**: ``packT [64, ncell]`` — lane index = grid
  cell.  A parcel needs exactly one column (its 2x2x2 corner block x
  (u0,v0,w0,u1,v1,w1) plus t0/t1 live in the 64 rows).
- Parcels are kept sorted by flat cell index (ops.sort / reference
  module_sort, c:5699), so a chunk of 128 consecutive parcels touches
  a narrow, monotone band of cells.
- Grid = (nchunk, nwin): each step DMAs one 128-cell window
  ``packT[:, (s[c]+k)*128 : (s[c]+k+1)*128]`` (Pallas double-buffers
  these block fetches automatically; consecutive windows stream the
  table near-sequentially at HBM bandwidth) and serves every parcel of
  chunk c whose cell falls in window k with a single [64, 128] lane
  gather.  All interpolation arithmetic happens in the transposed
  (component-major) layout — no relayout anywhere, and the [3, n]
  result rows are exactly what the diffusion/advection consumers use.
- Parcels whose cell misses all nwin windows (badly sorted stragglers,
  RK midpoints that crossed a lon cell = +ny*npl rows) are flagged and
  recomputed by the XLA row-gather fallback outside the kernel.

Total HBM traffic per call is ~(touched cell span) x 256 B — for a
full sweep of sorted parcels that is one sequential pass over the
table regardless of parcel count, vs 8 ns x offsets for XLA gather.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

LANES = 64          # pack row height (corner components)
WIN = 128           # lane-gather width == window size (hardware vreg)



def build_packT(met01, pack64=None) -> jnp.ndarray:
    """[64, ncell_padded] transposed corner table; same lane semantics
    as build_advect_pack64 (lane = corner*6 + comp; 48+ = t corners).

    ncell is padded up to a multiple of 128 so every window DMA is in
    bounds."""
    from mptrac_tpu.ops.fast_interp import build_advect_pack64
    if pack64 is None:
        pack64 = build_advect_pack64(met01)
    ncell = pack64.shape[0]
    ncellp = -(-ncell // WIN) * WIN
    packT = pack64.T
    if ncellp != ncell:
        packT = jnp.pad(packT, ((0, 0), (0, ncellp - ncell)))
    return packT


def _kernel_body(s_ref, base_ref, w_ref, win_ref, out_ref, *, mode):
    import jax.experimental.pallas as pl

    c = pl.program_id(0)
    k = pl.program_id(1)
    w0 = (s_ref[c] + jnp.int32(k)) * jnp.int32(WIN)
    base = base_ref[0, 0, :]
    idx = base - w0
    ok = (idx >= jnp.int32(0)) & (idx < jnp.int32(WIN))
    okf = jnp.where(ok, jnp.float32(1), jnp.float32(0))[None, :]
    idxc = jnp.where(ok, idx, jnp.int32(0))
    # (enable_x64(False): under x64 take_along_axis promotes indices
    # to int64, which Mosaic does not lower)
    with jax.enable_x64(False):
        rows = jnp.take_along_axis(
            win_ref[...], jnp.broadcast_to(idxc[None, :], (LANES, WIN)),
            axis=1)                                        # [64, 128]

    if mode == "interp":
        wx = w_ref[0:1, :]
        wy = w_ref[1:2, :]
        wz = w_ref[2:3, :]
        wt = w_ref[3:4, :]

        def cs(i):
            return rows[i * 6:(i + 1) * 6, :]
        a00 = wz * (cs(0) - cs(1)) + cs(1)
        a01 = wz * (cs(2) - cs(3)) + cs(3)
        a10 = wz * (cs(4) - cs(5)) + cs(5)
        a11 = wz * (cs(6) - cs(7)) + cs(7)
        a0 = wy * (a00 - a01) + a01
        a1 = wy * (a10 - a11) + a11
        vals = wx * (a0 - a1) + a1                         # [6, 128]
        uvw = wt * (vals[0:3, :] - vals[3:6, :]) + vals[3:6, :]

        def ts(i):
            return rows[48 + 2 * i:50 + 2 * i, :]          # (t0, t1)
        b00 = wz * (ts(0) - ts(1)) + ts(1)
        b01 = wz * (ts(2) - ts(3)) + ts(3)
        b10 = wz * (ts(4) - ts(5)) + ts(5)
        b11 = wz * (ts(6) - ts(7)) + ts(7)
        b0 = wy * (b00 - b01) + b01
        b1 = wy * (b10 - b11) + b11
        tv = wx * (b0 - b1) + b1                           # [2, 128]
        tt = wt * (tv[0:1, :] - tv[1:2, :]) + tv[1:2, :]

        contrib = jnp.concatenate(
            [uvw, tt, okf, jnp.zeros((3, WIN), jnp.float32)], axis=0)
    else:                                                  # meso sigma
        # 16-point subgrid variance per component (reference
        # module_diff_meso, c:4280-4304): mean/meansq over the 8
        # corners x 2 snapshots straight from the transposed rows.
        sigs = []
        for comp in range(3):
            # 8 corners x 2 snapshots; static unit-stride row slices
            # (a stride-3 sublane slice would lower to an unsupported
            # Mosaic gather)
            lanes = [c * 6 + s * 3 + comp
                     for c in range(8) for s in (0, 1)]
            mean = jnp.zeros((1, WIN), jnp.float32)
            msq = jnp.zeros((1, WIN), jnp.float32)
            for l in lanes:
                val = rows[l:l + 1, :]
                mean = mean + val
                msq = msq + val * val
            mean = mean * jnp.float32(1.0 / 16.0)
            msq = msq * jnp.float32(1.0 / 16.0)
            var = msq - mean * mean
            sigs.append(jnp.where(var > 0, jnp.sqrt(
                jnp.maximum(var, 0)), 0.0))
        contrib = jnp.concatenate(
            sigs + [okf, jnp.zeros((4, WIN), jnp.float32)], axis=0)

    contrib = contrib * okf

    @pl.when(k == 0)
    def _():
        out_ref[...] = contrib

    @pl.when(k > 0)
    def _():
        out_ref[...] = out_ref[...] + contrib


@functools.partial(jax.jit, static_argnames=("nwin", "mode",
                                             "interpret"))
def _lane_pass(packT, base, weights, nwin: int, mode: str,
               interpret: bool = False):
    """Shared pallas_call wrapper.

    base:    [n] int32 flat cell of the lower corner, ~sorted
    weights: [4, n] f32 (wx, wy, wz, wt) — ignored for mode='meso'
    Returns out [8, n] f32 (see kernel) with row 4 = served flag.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = base.shape[0]
    nchunk = -(-n // WIN)
    npad = nchunk * WIN
    ncellp = packT.shape[1]
    nblk_tab = ncellp // WIN

    base_p = jnp.pad(base, (0, npad - n), mode="edge")
    w_p = jnp.pad(weights, ((0, 0), (0, npad - n)))
    base2 = base_p.reshape(nchunk, 1, WIN)
    s = jnp.min(base2[:, 0, :], axis=1) // WIN
    s = jnp.minimum(s, nblk_tab - nwin).astype(jnp.int32)
    s = jnp.maximum(s, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunk, nwin),
        in_specs=[
            # (index-map zeros spelled c*0: python literals trace to
            # i64 under x64 and captured i32 consts are rejected)
            pl.BlockSpec((1, 1, WIN),
                         lambda c, k, s: (c, c * 0, c * 0)),
            pl.BlockSpec((4, WIN), lambda c, k, s: (c * 0, c)),
            pl.BlockSpec((LANES, WIN),
                         lambda c, k, s: (c * 0, s[c] + k)),
        ],
        out_specs=pl.BlockSpec((8, WIN), lambda c, k, s: (c * 0, c)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_body, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, npad), jnp.float32),
        interpret=interpret,
    )(s, base2, w_p, packT)
    return out[:, :n]


def _fallback_rows(pack64, base, idx_bad):
    """XLA row-gather for straggler parcels: rows [cap, 64]."""
    return jnp.take(pack64, jnp.take(base, idx_bad, axis=0,
                                     mode="clip"), axis=0)


def _interp_rows(rows, w):
    """Reference-order trilinear+time on row-major gathered rows
    ([m, 64]); w [4, m].  Returns (uvw [3, m], t [m])."""
    wx = w[0][:, None]
    wy = w[1][:, None]
    wz = w[2][:, None]
    wt = w[3][:, None]

    def cs(i):
        return rows[:, i * 6:(i + 1) * 6]
    a00 = wz * (cs(0) - cs(1)) + cs(1)
    a01 = wz * (cs(2) - cs(3)) + cs(3)
    a10 = wz * (cs(4) - cs(5)) + cs(5)
    a11 = wz * (cs(6) - cs(7)) + cs(7)
    a0 = wy * (a00 - a01) + a01
    a1 = wy * (a10 - a11) + a11
    vals = wx * (a0 - a1) + a1
    uvw = wt * (vals[:, 0:3] - vals[:, 3:6]) + vals[:, 3:6]

    def ts(i):
        return rows[:, 48 + 2 * i:50 + 2 * i]
    b00 = wz * (ts(0) - ts(1)) + ts(1)
    b01 = wz * (ts(2) - ts(3)) + ts(3)
    b10 = wz * (ts(4) - ts(5)) + ts(5)
    b11 = wz * (ts(6) - ts(7)) + ts(7)
    b0 = wy * (b00 - b01) + b01
    b1 = wy * (b10 - b11) + b11
    tv = wx * (b0 - b1) + b1
    tt = w[3] * (tv[:, 0] - tv[:, 1]) + tv[:, 1]
    return uvw.T, tt


def _meso_rows(rows):
    """Row-major fallback of the 16-point sigma."""
    sigs = []
    for comp in range(3):
        sel = rows[:, comp:48:3][:, :16]
        mean = jnp.sum(sel, axis=1) * jnp.float32(1.0 / 16.0)
        msq = jnp.sum(sel * sel, axis=1) * jnp.float32(1.0 / 16.0)
        var = msq - mean * mean
        sigs.append(jnp.where(var > 0,
                              jnp.sqrt(jnp.maximum(var, 0)), 0.0))
    return jnp.stack(sigs)


def default_nwin(ncell: int, n: int) -> int:
    """Windows needed to cover a typical sorted chunk span: ~1.5x the
    expected span of 128 uniform parcels over ncell cells, plus one
    for alignment."""
    span = ncell * WIN / max(n, 1)
    return max(1, min(16, int(span * 1.5 // WIN) + 2))


class LaneTables(NamedTuple):
    """Transposed + row-major packed tables for the sorted fast path."""
    packT: jnp.ndarray          # [64, ncellp]
    pack64: jnp.ndarray         # [ncell, 64] (straggler fallback)


def build_lane_tables(met01) -> LaneTables:
    from mptrac_tpu.ops.fast_interp import build_advect_pack64
    pack64 = build_advect_pack64(met01)
    return LaneTables(packT=build_packT(met01, pack64), pack64=pack64)


def interp_uvwt_sorted(tables: LaneTables, base, weights,
                       nwin: int = 4, cap_frac: int = 8,
                       interpret: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                  jnp.ndarray]:
    """(u,v,w) + T for ~sorted parcels: lane kernel + XLA fallback.

    base [n] i32, weights [4, n] f32 (wx, wy, wz, wt).
    Returns (uvw [3, n] f32, t [n] f32, served_frac scalar)."""
    n = base.shape[0]
    out = _lane_pass(tables.packT, base, weights, nwin, "interp",
                     interpret)
    ok = out[4, :] > 0.5
    cap = max(WIN, n // cap_frac)
    idx_bad = jnp.nonzero(~ok, size=cap, fill_value=n)[0]
    rows = _fallback_rows(tables.pack64, base, idx_bad)
    w_bad = jnp.take(weights, jnp.minimum(idx_bad, n - 1), axis=1)
    uvw_b, t_b = _interp_rows(rows, w_bad)
    uvw = out[0:3, :]
    tt = out[3, :]
    # scatter fallback results (idx n = dropped pad slot)
    uvw = jnp.concatenate([uvw, jnp.zeros((3, 1), uvw.dtype)], axis=1)
    tt = jnp.concatenate([tt, jnp.zeros((1,), tt.dtype)])
    uvw = uvw.at[:, idx_bad].set(uvw_b, mode="drop")
    tt = tt.at[idx_bad].set(t_b, mode="drop")
    return uvw[:, :n], tt[:n], jnp.mean(ok.astype(jnp.float32))


def meso_sigma_sorted(tables: LaneTables, base, nwin: int = 4,
                      cap_frac: int = 8, interpret: bool = False):
    """Subgrid wind sigma (u, v, w) for ~sorted parcels."""
    n = base.shape[0]
    dummy_w = jnp.zeros((4, n), jnp.float32)
    out = _lane_pass(tables.packT, base, dummy_w, nwin, "meso",
                     interpret)
    ok = out[3, :] > 0.5
    cap = max(WIN, n // cap_frac)
    idx_bad = jnp.nonzero(~ok, size=cap, fill_value=n)[0]
    rows = _fallback_rows(tables.pack64, base, idx_bad)
    sig_b = _meso_rows(rows)
    sig = out[0:3, :]
    sig = jnp.concatenate([sig, jnp.zeros((3, 1), sig.dtype)], axis=1)
    sig = sig.at[:, idx_bad].set(sig_b, mode="drop")
    return sig[:, :n], jnp.mean(ok.astype(jnp.float32))
