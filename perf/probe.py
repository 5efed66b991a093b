#!/usr/bin/env python3
"""On-chip microprobes for the round-4 gather-kernel design.

Measures the candidate inner ops for the coarse-grained sorted slab
interpolation kernel (docs/performance.md "Pallas lane-gather
experiments" follow-up):

  xla    — baseline: XLA row gather + trilerp (current production path)
  lane   — coarse kernel: manual slab DMA + per-group 128-lane gathers
  grid   — empty-kernel grid-step overhead
  small  — small-table (<=128 lanes) gather for climatology lookups
  sort   — argsort + permute cost at size

Usage: python perf/probe.py [probe ...] [--n N] [--ncell N]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.setrecursionlimit(100_000)

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _drain(out):
    """Force full execution on remote-attached backends: fetch a
    scalar derived from every output leaf."""
    return sum(float(jnp.sum(jnp.ravel(jnp.asarray(x))[:1]
                             .astype(jnp.float32)))
               for x in jax.tree.leaves(out))


def timeit(fn, *args, reps=3, inner=20):
    """Best-of-reps mean over `inner` queued calls: the remote-attached
    backend has a ~25 ms fixed fetch cost, amortized over inner."""
    out = fn(*args)
    _drain(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        _drain(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best, out


def make_data(n, ncell, seed=0, span_jitter=2):
    """Sorted base indices + weights resembling a sorted parcel cloud."""
    rng = np.random.default_rng(seed)
    base = np.sort(rng.integers(0, ncell - 1, n)).astype(np.int32)
    # jitter breaks perfect monotonicity like RK midpoints do
    base = np.clip(base + rng.integers(-span_jitter, span_jitter + 1, n),
                   0, ncell - 2).astype(np.int32)
    w = rng.uniform(0, 1, (4, n)).astype(np.float32)
    packT = rng.uniform(-50, 50, (64, -(-ncell // 128) * 128)
                        ).astype(np.float32)
    return (jnp.asarray(packT), jnp.asarray(base), jnp.asarray(w))


# ---------------------------------------------------------------- xla
def probe_xla(n, ncell):
    packT, base, w = make_data(n, ncell)
    pack64 = packT.T[:ncell]

    @jax.jit
    def run(pack64, base, w):
        from mptrac_tpu.ops.lane_interp import _interp_rows
        rows = jnp.take(pack64, base, axis=0)
        uvw, tt = _interp_rows(rows, w)
        return uvw.sum() + tt.sum()

    dt, _ = timeit(run, pack64, base, w)
    print(f"xla row-gather+interp: {dt*1e3:8.2f} ms  "
          f"{dt/n*1e9:6.2f} ns/parcel")


# --------------------------------------------------------------- lane
def _trilerp_T(rows, w_ref):
    """Transposed trilerp: rows [64, 128], w [4, 128] slices."""
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
        return rows[48 + 2 * i:50 + 2 * i, :]
    b00 = wz * (ts(0) - ts(1)) + ts(1)
    b01 = wz * (ts(2) - ts(3)) + ts(3)
    b10 = wz * (ts(4) - ts(5)) + ts(5)
    b11 = wz * (ts(6) - ts(7)) + ts(7)
    b0 = wy * (b00 - b01) + b01
    b1 = wy * (b10 - b11) + b11
    tv = wx * (b0 - b1) + b1                           # [2, 128]
    tt = wt * (tv[0:1, :] - tv[1:2, :]) + tv[1:2, :]
    return uvw, tt


def _coarse_kernel(s_ref, kwin_ref, base_ref, w_ref, packT, out_ref,
                   slab, sem, *, G, S):
    with jax.enable_x64(False):
        c = pl.program_id(0)
        start = s_ref[c] * 128
        cp = pltpu.make_async_copy(packT.at[:, pl.ds(start, S)], slab,
                                   sem)
        cp.start()
        cp.wait()
        nwin = S // 128
        for g in range(G):
            idx = base_ref[g:g + 1, :] - start             # [1,128]
            kg = kwin_ref[c * G + g] - s_ref[c]
            kgc = jnp.minimum(jnp.maximum(kg, jnp.int32(0)),
                              jnp.int32(nwin - 2))
            off = kgc * 128
            win0 = slab[:, pl.ds(off, 128)]
            win1 = slab[:, pl.ds(off + 128, 128)]
            i0 = idx - off
            sel0 = (i0 >= 0) & (i0 < 128)
            sel1 = (i0 >= 128) & (i0 < 256)
            ic0 = jnp.where(sel0, i0, 0)
            ic1 = jnp.where(sel1, i0 - 128, 0)
            g0 = jnp.take_along_axis(
                win0, jnp.broadcast_to(ic0, (64, 128)), axis=1)
            g1 = jnp.take_along_axis(
                win1, jnp.broadcast_to(ic1, (64, 128)), axis=1)
            rows = jnp.where(sel0, g0, jnp.where(sel1, g1, 0.0))
            okf = (sel0 | sel1).astype(jnp.float32)
            uvw, tt = _trilerp_T(rows,
                                 w_ref[:, g * 128:(g + 1) * 128])
            contrib = jnp.concatenate(
                [uvw, tt, okf, jnp.zeros((3, 128), jnp.float32)],
                axis=0)
            out_ref[:, g * 128:(g + 1) * 128] = contrib * okf


@functools.partial(jax.jit, static_argnames=("G", "S"))
def _coarse_call_outer(packT, base, w, G, S, CHUNK=2 ** 21):
    """lax.map over <=2M-parcel slices keeps the prefetched scalar
    arrays small enough for SMEM."""
    n = base.shape[0]
    if n <= CHUNK:
        return _coarse_call(packT, base, w, G, S)
    nch = -(-n // CHUNK)
    pad = nch * CHUNK - n
    base_p = jnp.pad(base, (0, pad), mode="edge").reshape(nch, CHUNK)
    w_p = jnp.pad(w, ((0, 0), (0, pad))).reshape(4, nch, CHUNK)
    out = jax.lax.map(
        lambda bw: _coarse_call(packT, bw[0], bw[1], G, S),
        (base_p, jnp.moveaxis(w_p, 1, 0)))
    return jnp.moveaxis(out, 0, 1).reshape(8, nch * CHUNK)[:, :n]


@functools.partial(jax.jit, static_argnames=("G", "S"))
def _coarse_call(packT, base, w, G, S):
    n = base.shape[0]
    CP = G * 128
    nchunk = -(-n // CP)
    npad = nchunk * CP
    nblk = packT.shape[1] // 128
    base_p = jnp.pad(base, (0, npad - n), mode="edge")
    w_p = jnp.pad(w, ((0, 0), (0, npad - n)))
    bmat = base_p.reshape(nchunk, G, 128)
    kwin = jnp.min(bmat, axis=2) // 128                    # [nchunk, G]
    s = jnp.clip(jnp.min(kwin, axis=1), 0, nblk - S // 128)
    kwin = kwin.astype(jnp.int32)
    s = s.astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchunk,),
        in_specs=[
            pl.BlockSpec((G, 128), lambda c, s, k: (c, c * 0)),
            pl.BlockSpec((4, CP), lambda c, s, k: (c * 0, c)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, CP), lambda c, s, k: (c * 0, c)),
        scratch_shapes=[
            pltpu.VMEM((64, S), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_coarse_kernel, G=G, S=S),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, npad), jnp.float32),
    )(s, kwin.reshape(-1), bmat.reshape(nchunk * G, 128),
      w_p.reshape(4, npad), packT)
    return out[:, :n]


def probe_lane(n, ncell, G, S):
    packT, base, w = make_data(n, ncell)

    def run(packT, base, w):
        return _coarse_call_outer(packT, base, w, G, S)

    dt, out = timeit(run, packT, base, w)
    served = float(jnp.mean(out[4, :]))
    # correctness vs XLA fallback on served parcels
    from mptrac_tpu.ops.lane_interp import _interp_rows
    rows = jnp.take(packT.T, base, axis=0)
    uvw_ref, tt_ref = _interp_rows(rows, w)
    ok = out[4, :] > 0.5
    err = float(jnp.max(jnp.where(ok, jnp.abs(out[0, :] - uvw_ref[0]), 0)))
    print(f"lane G={G:3d} S={S:5d}: {dt*1e3:8.2f} ms  "
          f"{dt/n*1e9:6.2f} ns/parcel  served={served:.4f} "
          f"maxerr={err:.2e}")


# --------------------------------------------------------------- grid
def probe_grid(n, ncell, G):
    CP = G * 128
    nchunk = -(-n // CP)

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            grid=(nchunk,),
            in_specs=[pl.BlockSpec((8, CP), lambda c: (0, c))],
            out_specs=pl.BlockSpec((8, CP), lambda c: (0, c)),
            out_shape=jax.ShapeDtypeStruct((8, nchunk * CP), jnp.float32),
        )(x)

    x = jnp.ones((8, nchunk * CP), jnp.float32)
    dt, _ = timeit(run, x)
    print(f"grid G={G:3d} ({nchunk} steps): {dt*1e3:8.2f} ms  "
          f"{dt/nchunk*1e6:6.2f} us/step")


# -------------------------------------------------------------- small
def probe_small(n):
    """Unsorted gather from a <=128-lane table (climatology case)."""
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.uniform(0, 1, (8, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 73, n).astype(np.int32))

    CP = 128 * 64

    def kern(tab_ref, idx_ref, o_ref):
        with jax.enable_x64(False):
            for g in range(64):
                ix = idx_ref[g:g + 1, :]
                rows = jnp.take_along_axis(
                    tab_ref[...], jnp.broadcast_to(ix, (8, 128)), axis=1)
                o_ref[:, g * 128:(g + 1) * 128] = rows

    @jax.jit
    def run(tab, idx):
        npad = -(-n // CP) * CP
        idx_p = jnp.pad(idx, (0, npad - n)).reshape(npad // 128, 128)
        return pl.pallas_call(
            kern,
            grid=(npad // CP,),
            in_specs=[
                pl.BlockSpec((8, 128), lambda c: (0, 0)),
                pl.BlockSpec((64, 128), lambda c: (c, 0)),
            ],
            out_specs=pl.BlockSpec((8, CP), lambda c: (0, c)),
            out_shape=jax.ShapeDtypeStruct((8, npad), jnp.float32),
        )(tab, idx_p)

    dt, _ = timeit(run, tab, idx)
    print(f"small-table lane gather: {dt*1e3:8.2f} ms  "
          f"{dt/n*1e9:6.2f} ns/parcel")

    @jax.jit
    def run_xla(tab, idx):
        return jnp.take(tab.T, idx, axis=0)

    dt, _ = timeit(run_xla, tab, idx)
    print(f"small-table XLA gather:  {dt*1e3:8.2f} ms  "
          f"{dt/n*1e9:6.2f} ns/parcel")


# --------------------------------------------------------------- sort
def probe_sort(n, ncell):
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, ncell, n).astype(np.int32))
    vals = jnp.asarray(rng.uniform(0, 1, (n, 8)).astype(np.float32))

    @jax.jit
    def run(key, vals):
        perm = jnp.argsort(key)
        return jnp.take(vals, perm, axis=0)

    dt, _ = timeit(run, key, vals)
    print(f"argsort+permute [n,8]: {dt*1e3:8.2f} ms  "
          f"{dt/n*1e9:6.2f} ns/parcel")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("probes", nargs="*",
                    default=["xla", "lane", "grid", "small", "sort"])
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--ncell", type=int, default=360 * 181 * 61)
    args = ap.parse_args()

    print(f"device={jax.devices()[0].device_kind} n={args.n} "
          f"ncell={args.ncell}", file=sys.stderr)
    for p in args.probes:
        if p == "xla":
            probe_xla(args.n, args.ncell)
        elif p == "lane":
            for G, S in ((8, 2048), (32, 2048), (32, 4096), (64, 4096),
                         (64, 8192)):
                probe_lane(args.n, args.ncell, G, S)
        elif p == "grid":
            for G in (8, 32, 64):
                probe_grid(args.n, args.ncell, G)
        elif p == "small":
            probe_small(args.n)
        elif p == "sort":
            probe_sort(args.n, args.ncell)


if __name__ == "__main__":
    main()
