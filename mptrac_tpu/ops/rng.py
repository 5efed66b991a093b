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


def _tpu_backend() -> bool:
    """True on backends without practical u64 support (TPU / axon)."""
    import os

    if os.environ.get("MPTRAC_FORCE_SQUARES"):
        return False
    try:
        return jax.default_backend() not in ("cpu", "gpu", "cuda",
                                             "rocm")
    except Exception:
        return False


def squares_uniform(ctr, n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generate ``n + 1`` uniform doubles in [0, 1) and the advanced
    counter (reference c:5598-5630: the loop runs ``i <= n`` and the
    counter advances by ``n + 1``)."""
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
    # Correctly-rounded uint64 -> double (XLA's direct cast can round
    # differently from C): hi*2^32 is exact, the sum rounds to nearest.
    hi = (r >> jnp.uint64(32)).astype(jnp.float64)
    lo = (r & jnp.uint64(0xFFFFFFFF)).astype(jnp.float64)
    u = (hi * 4294967296.0 + lo) / _TWO64
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


def module_rng(ctl_rng_type: int, ctr, n: int, method: int,
               key=None, dtype=jnp.float64
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch like the reference ``module_rng`` (c:5535).

    Returns (values[n], new_ctr).  rng_type 0/1 -> Squares (type 0, the
    GSL per-thread stream, has no portable bitstream; Squares is used
    for determinism), 2 -> jax.random threefry.

    On TPU backends, types 0/1 fall back to threefry: XLA:TPU has no
    native 64-bit integer multiply and the Squares u64 chain does not
    compile in practical time.  This mirrors the reference, whose RNG
    streams are also backend-dependent (GSL on CPU vs cuRAND on GPU,
    c:5535-5671); the counter advance is kept identical so
    checkpoints stay portable.  Set MPTRAC_FORCE_SQUARES=1 to override.
    """
    if ctl_rng_type in (0, 1) and _tpu_backend():
        ctl_rng_type = 2
    if ctl_rng_type in (0, 1):
        if method == 0:
            u, ctr = squares_uniform(ctr, n)
            return u[:n].astype(dtype), ctr
        rs, ctr = squares_normal(ctr, n)
        return rs.astype(dtype), ctr
    # Threefry: counter folds into the key for stateless streams
    k = jax.random.fold_in(jax.random.PRNGKey(0) if key is None else key,
                           ctr.astype(jnp.uint32))
    if method == 0:
        vals = jax.random.uniform(k, (n,), dtype)
    else:
        vals = jax.random.normal(k, (n,), dtype)
    return vals, ctr + jnp.uint64(n + 1)
