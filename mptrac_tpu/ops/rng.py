"""Parallel random number generation.

Primary generator: the **Squares** counter-based RNG (Widynski 2022),
reimplemented bit-exactly from the reference ``module_rng``
(/root/reference/src/mptrac.c:5598-5667, RNG_TYPE 1) so that
trajectories can be cross-checked against reference runs: same key,
same counter advance (n+1 per call), same Box–Muller pairing with the
reference's single-precision cos/sin quirk.

Counter-based RNG is the natural TPU fit: stateless, order-independent
within a batch, and vectorizes to pure integer ALU work.  ``jax.random``
(threefry) is offered as RNG_TYPE 2 for idiomatic use (the reference's
type 2 is cuRAND, which has no bitwise-defined stream either).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

#: Squares key (reference mptrac.c:5601 — fixed, do not change)
SQUARES_KEY = 0xC8E4FD154CE32F6D

_TWO64 = 18446744073709551616.0  # (double)UINT64_MAX rounds to 2^64


def _use_limbs() -> bool:
    """True on backends without practical u64 multiply (TPU / axon):
    XLA:TPU has no native 64-bit integer multiply, so the Squares chain
    runs on 32-bit limb arithmetic there (bit-identical by
    construction; asserted by test_rng)."""
    import os

    if os.environ.get("MPTRAC_SQUARES_LIMBS"):
        return True
    try:
        return jax.default_backend() not in ("cpu", "gpu", "cuda",
                                             "rocm")
    except Exception:
        return False


def _mul32(a, b):
    """Full 32x32 -> 64 unsigned product as (hi, lo) u32 limbs, built
    from 16-bit partial products (every partial fits u32 exactly)."""
    m = jnp.uint32(0xFFFF)
    s16 = jnp.uint32(16)
    a0, a1 = a & m, a >> s16
    b0, b1 = b & m, b >> s16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    t = (ll >> s16) + (lh & m) + (hl & m)
    lo = (ll & m) | (t << s16)
    hi = hh + (lh >> s16) + (hl >> s16) + (t >> s16)
    return hi, lo


def _mul64(ah, al, bh, bl):
    """Low 64 bits of the u64 product, as (hi, lo) u32 limbs."""
    hi, lo = _mul32(al, bl)
    return hi + al * bh + ah * bl, lo


def _add64(ah, al, bh, bl):
    lo = al + bl
    carry = (lo < bl).astype(jnp.uint32)
    return ah + bh + carry, lo


def _squares_bits_u32(ctr, n: int):
    """Squares output bits for counters ctr..ctr+n as (hi, lo) u32
    limb arrays — the TPU path (no u64 multiply on XLA:TPU)."""
    kh = jnp.uint32(SQUARES_KEY >> 32)
    kl = jnp.uint32(SQUARES_KEY & 0xFFFFFFFF)
    ch = (ctr >> jnp.uint64(32)).astype(jnp.uint32)
    cl = ctr.astype(jnp.uint32)
    i = jnp.arange(n + 1, dtype=jnp.uint32)
    nh, nl = _add64(ch, cl, jnp.uint32(0), i)          # ctr + i
    xh, xl = _mul64(nh, nl, kh, kl)                    # * key
    yh, yl = xh, xl
    zh, zl = _add64(yh, yl, kh, kl)                    # y + key

    def sqr_round(xh, xl, ah, al):
        ph, plo = _mul64(xh, xl, xh, xl)
        sh, sl = _add64(ph, plo, ah, al)
        return sl, sh                                  # rot 32 = swap

    xh, xl = sqr_round(xh, xl, yh, yl)
    xh, xl = sqr_round(xh, xl, zh, zl)
    xh, xl = sqr_round(xh, xl, yh, yl)
    ph, plo = _mul64(xh, xl, xh, xl)
    th, tl = _add64(ph, plo, zh, zl)                   # t = x*x + z
    xh, xl = tl, th                                    # x = rot32(t)
    qh, _ = _add64(*_mul64(xh, xl, xh, xl), yh, yl)    # (x*x + y) >> 32
    return th, tl ^ qh                                 # r = t ^ ...


def _squares_bits_u64(ctr, n: int):
    """Squares output bits as (hi, lo) u32 — native u64 path (CPU/GPU,
    bit-identical to _squares_bits_u32)."""
    key = jnp.uint64(SQUARES_KEY)
    i = jnp.arange(n + 1, dtype=jnp.uint64)
    x = (ctr + i) * key
    y = x
    z = y + key

    def sqr_round(x, add):
        x = x * x + add
        return (x >> jnp.uint64(32)) | (x << jnp.uint64(32))

    x = sqr_round(x, y)
    x = sqr_round(x, z)
    x = sqr_round(x, y)
    t = x * x + z
    x = (t >> jnp.uint64(32)) | (t << jnp.uint64(32))
    r = t ^ ((x * x + y) >> jnp.uint64(32))
    hi = (r >> jnp.uint64(32)).astype(jnp.uint32)
    lo = (r & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    return hi, lo


def squares_bits(ctr, n: int):
    """Raw Squares bits for counters ctr..ctr+n as (hi, lo) u32 limb
    arrays; identical on every backend (reference c:5598-5630)."""
    if _use_limbs():
        return _squares_bits_u32(ctr, n)
    return _squares_bits_u64(ctr, n)


def squares_uniform(ctr, n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generate ``n + 1`` uniform doubles in [0, 1) and the advanced
    counter (reference c:5598-5630: the loop runs ``i <= n`` and the
    counter advances by ``n + 1``)."""
    hi32, lo32 = squares_bits(ctr, n)
    # Correctly-rounded uint64 -> double (XLA's direct cast can round
    # differently from C): hi*2^32 is exact, the sum rounds to nearest.
    # Scale by multiplying with the exact power of two 2^-64 rather
    # than dividing by 2^64: identical bits by IEEE-754, but exact on
    # TPU's emulated f64 where division rounds off-by-one-ulp.
    hi = hi32.astype(jnp.float64)
    lo = lo32.astype(jnp.float64)
    u = (hi * 4294967296.0 + lo) * (0.5 ** 64)
    return u, ctr + jnp.uint64(n + 1)


def squares_normal(ctr, n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generate ``n`` standard-normal doubles via the reference's
    Box–Muller transform (c:5632-5648): pairs (r cos phi, r sin phi)
    with phi evaluated in single precision (the reference calls
    ``cosf((float) phi)``)."""
    u, ctr = squares_uniform(ctr, n)
    m = (n + 1) // 2
    evens = u[0:n:2]
    odds = u[1:n + 1:2]
    r = jnp.sqrt(-2.0 * jnp.log(evens))
    phi = 2.0 * jnp.pi * odds
    phif = phi.astype(jnp.float32)
    out_e = r * jnp.cos(phif).astype(jnp.float64)
    out_o = r * jnp.sin(phif).astype(jnp.float64)
    out = jnp.stack([out_e[:m], out_o[:m]], axis=1).reshape(-1)[:n]
    return out, ctr


def squares_uniform_f32(ctr, n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """float32 uniforms from the same Squares bit stream (fp32 compute
    mode): the top 24 bits of each 64-bit draw, scaled by 2^-24.  Same
    counter advance as squares_uniform, so stream positions stay
    aligned with the f64 parity path; values are the f64 path's
    round-to-24-bit truncations.  Avoids all f64 arithmetic — on TPU
    f64 is emulated and ~10x the cost (and memory) of f32."""
    hi32, _ = squares_bits(ctr, n)
    u = (hi32 >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(0.5 ** 24)
    return u, ctr + jnp.uint64(n + 1)


def squares_normal_f32(ctr, n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """float32 Box-Muller normals over the f32 uniform stream (fp32
    compute mode; same pairing as squares_normal)."""
    u, ctr = squares_uniform_f32(ctr, n)
    m = (n + 1) // 2
    evens = jnp.maximum(u[0:n:2], jnp.float32(0.5 ** 25))
    odds = u[1:n + 1:2]
    r = jnp.sqrt(jnp.float32(-2.0) * jnp.log(evens))
    phi = jnp.float32(2.0 * 3.141592653589793) * odds
    out_e = r * jnp.cos(phi)
    out_o = r * jnp.sin(phi)
    out = jnp.stack([out_e[:m], out_o[:m]], axis=1).reshape(-1)[:n]
    return out, ctr


def squares_normal3_f32(ctr, n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Three component-major float32 normal streams from the Squares
    counter (fp32 compute mode).

    The reference stream (squares_normal) interleaves Box–Muller pairs
    into one flat array that consumers reshape to [n, 3]; on TPU every
    one of those relayouts (stride-2 slice, [n, 2] stack, [n, 3]
    reshape) costs far more than the bit chain itself (measured ~47 ms
    of a 50 ms 6M-draw call on v5e — the lane dimension is shuffled
    three times).  The fp32 fast path is *not* value-compatible with
    the f64 reference stream anyway (f32 physics diverges from the
    C double path within a step), so fp32 mode instead assigns each
    (component c, parcel p) one 64-bit Squares draw at counter
    ``ctr + c*n + p`` and derives both Box–Muller uniforms from it
    (radius from the high 24 bits, phase from the low 24 — all 64
    Squares output bits pass PractRand, Widynski 2022).  Everything is
    contiguous: no relayout at any point, and consumers index rows of
    the [3, n] result.  Counter advance stays 3n + 1 like the
    reference (c:5598-5630), so checkpoints interoperate with the
    parity path.

    Deterministic and bit-identical across backends (same integer
    chain as squares_bits); only transcendental rounding may differ by
    ulps between CPU and TPU libm implementations.
    """
    base = jnp.arange(n, dtype=jnp.uint32)
    out = []
    for c in range(3):
        ch = (ctr >> jnp.uint64(32)).astype(jnp.uint32)
        cl = ctr.astype(jnp.uint32)
        # counter + c*n + p  (u64 add in limbs; c*n fits u32 here)
        off_l = base + jnp.uint32(c * n)
        carry0 = (off_l < base).astype(jnp.uint32)
        nh, nl = _add64(ch + carry0, cl, jnp.uint32(0), off_l)
        hi, lo = _squares_core(nh, nl)
        u_r = jnp.maximum((hi >> jnp.uint32(8)).astype(jnp.float32)
                          * jnp.float32(0.5 ** 24),
                          jnp.float32(0.5 ** 25))
        u_phi = (lo >> jnp.uint32(8)).astype(jnp.float32) \
            * jnp.float32(0.5 ** 24)
        r = jnp.sqrt(jnp.float32(-2.0) * jnp.log(u_r))
        out.append(r * jnp.cos(jnp.float32(2.0 * 3.141592653589793)
                               * u_phi))
    return jnp.stack(out), ctr + jnp.uint64(3 * n + 1)


def _squares_core(nh, nl):
    """Squares rounds over an already-formed counter value given as
    (hi, lo) u32 limbs; returns the 64 output bits as (hi, lo)."""
    kh = jnp.uint32(SQUARES_KEY >> 32)
    kl = jnp.uint32(SQUARES_KEY & 0xFFFFFFFF)
    xh, xl = _mul64(nh, nl, kh, kl)
    yh, yl = xh, xl
    zh, zl = _add64(yh, yl, kh, kl)

    def sqr_round(xh, xl, ah, al):
        ph, plo = _mul64(xh, xl, xh, xl)
        sh, sl = _add64(ph, plo, ah, al)
        return sl, sh

    xh, xl = sqr_round(xh, xl, yh, yl)
    xh, xl = sqr_round(xh, xl, zh, zl)
    xh, xl = sqr_round(xh, xl, yh, yl)
    ph, plo = _mul64(xh, xl, xh, xl)
    th, tl = _add64(ph, plo, zh, zl)
    xh, xl = tl, th
    qh, _ = _add64(*_mul64(xh, xl, xh, xl), yh, yl)
    return th, tl ^ qh


def module_rng3(ctl_rng_type: int, ctr, n: int, dtype=jnp.float64,
                key=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Draw 3 standard normals per parcel as a component-major [3, n]
    array (the layout every consumer wants: diffusion/pbl use
    rs[0], rs[1], rs[2] directly, no [n, 3] relayout).

    f64 (parity mode) reproduces the reference's exact interleaved
    stream (module_rng method 1, c:5632-5648) and transposes —
    correctness over speed.  f32 uses the contiguous fast formulation
    (squares_normal3_f32).  rng_type 2 is threefry."""
    if ctl_rng_type in (0, 1):
        if dtype == jnp.float32:
            return jax.lax.optimization_barrier(
                squares_normal3_f32(ctr, n))
        rs, ctr = squares_normal(ctr, 3 * n)
        return jax.lax.optimization_barrier(
            (rs.astype(dtype).reshape(n, 3).T, ctr))
    k = jax.random.fold_in(jax.random.PRNGKey(0) if key is None else key,
                           ctr.astype(jnp.uint32))
    return (jax.random.normal(k, (3, n), dtype),
            ctr + jnp.uint64(3 * n + 1))


def module_rng(ctl_rng_type: int, ctr, n: int, method: int,
               key=None, dtype=jnp.float64
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch like the reference ``module_rng`` (c:5535).

    Returns (values[n], new_ctr).  rng_type 0/1 -> Squares (type 0, the
    GSL per-thread stream, has no portable bitstream; Squares is used
    for determinism), 2 -> jax.random threefry.

    Squares runs on every backend: native u64 on CPU/GPU, 32-bit limb
    arithmetic on TPU (XLA:TPU has no 64-bit multiply) — bit-identical
    streams either way, which is what makes reference gpu_test-style
    cross-backend determinism possible (tests/gpu_test/run.sh:20-60).

    The draw is wrapped in ``lax.optimization_barrier`` so XLA
    materializes the ~50-op limb bit chain exactly once per call:
    without the barrier XLA duplicates (rematerializes) the integer
    chain into each downstream consumer of ``values``, which was
    measured to cost ~36% of whole-pipeline throughput on TPU v5e.
    """
    if ctl_rng_type in (0, 1):
        if dtype == jnp.float32:
            # fp32 compute mode: same Squares bit stream and counter
            # advance, f32 arithmetic end-to-end (no emulated f64)
            if method == 0:
                u, ctr = squares_uniform_f32(ctr, n)
                return jax.lax.optimization_barrier((u[:n], ctr))
            return jax.lax.optimization_barrier(squares_normal_f32(ctr, n))
        if method == 0:
            u, ctr = squares_uniform(ctr, n)
            return jax.lax.optimization_barrier((u[:n].astype(dtype), ctr))
        rs, ctr = squares_normal(ctr, n)
        return jax.lax.optimization_barrier((rs.astype(dtype), ctr))
    # Threefry: counter folds into the key for stateless streams
    k = jax.random.fold_in(jax.random.PRNGKey(0) if key is None else key,
                           ctr.astype(jnp.uint32))
    if method == 0:
        vals = jax.random.uniform(k, (n,), dtype)
    else:
        vals = jax.random.normal(k, (n,), dtype)
    return vals, ctr + jnp.uint64(n + 1)
