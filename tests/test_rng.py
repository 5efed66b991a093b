"""Squares RNG bit-exactness vs the reference algorithm.

Expected values were produced by an independent C harness implementing
the reference module_rng Squares path (mptrac.c:5598-5648) with
rng_ctr=0, n=9.
"""

import jax.numpy as jnp
import numpy as np

from mptrac_tpu.ops.rng import module_rng, squares_normal, squares_uniform

UNIFORM_EXPECT = [
    0.50019086869416041, 0.37230243853187395, 0.93321980187789921,
    0.97512608556929115, 0.70875096120765446, 0.94715712524134599,
    0.46290613648115603, 0.62902480120175641, 0.33295340236518806,
    0.31277537867472194,
]

BM_EXPECT = [
    -0.81809926385881249, 0.84631233646884862, 0.36726023598006169,
    -0.05787012731304092, 0.78444320936169987, -0.27046436919426858,
    -0.85515586707187607, -0.89953897943083572, -0.56991740051087514,
]


def test_squares_uniform_bit_exact():
    u, ctr = squares_uniform(jnp.uint64(0), 9)
    assert np.array_equal(np.asarray(u), np.array(UNIFORM_EXPECT))
    assert int(ctr) == 10


def test_squares_normal_matches_reference():
    nrm, ctr = squares_normal(jnp.uint64(0), 9)
    # cosf/sinf evaluated in f32: matches to f32 rounding of the angle
    np.testing.assert_allclose(np.asarray(nrm), np.array(BM_EXPECT),
                               rtol=0, atol=5e-7)
    assert int(ctr) == 10


def test_counter_advance_chain():
    # successive module calls continue the counter like the global
    # rng_ctr in the reference
    u1, c1 = squares_uniform(jnp.uint64(0), 4)
    u2, c2 = squares_uniform(c1, 4)
    # regenerate from 0 with a longer draw: values at offset 5 must match
    ufull, _ = squares_uniform(jnp.uint64(0), 10)
    assert int(c1) == 5 and int(c2) == 10
    assert np.array_equal(np.asarray(u2), np.asarray(ufull)[5:10])


def test_limb_path_bit_identical():
    """The 32-bit limb chain (TPU path) must produce the same bits as
    the native u64 chain for arbitrary counters."""
    from mptrac_tpu.ops.rng import _squares_bits_u32, _squares_bits_u64

    for ctr in (0, 1, 12345, 2**31, 2**32 - 1, 2**32, 2**53 + 7,
                2**63 + 11, 2**64 - 300):
        c = jnp.uint64(ctr)
        h32, l32 = _squares_bits_u32(c, 255)
        h64, l64 = _squares_bits_u64(c, 255)
        assert np.array_equal(np.asarray(h32), np.asarray(h64)), ctr
        assert np.array_equal(np.asarray(l32), np.asarray(l64)), ctr


def test_limb_uniform_bit_exact(monkeypatch):
    """Uniforms through the limb path match the golden reference
    doubles bit-for-bit (same conversion, same bits)."""
    monkeypatch.setenv("MPTRAC_SQUARES_LIMBS", "1")
    u, ctr = squares_uniform(jnp.uint64(0), 9)
    assert np.array_equal(np.asarray(u), np.array(UNIFORM_EXPECT))
    assert int(ctr) == 10


def test_squares_on_accelerator():
    """Cross-backend determinism (reference gpu_test analog): run the
    Squares stream on the default accelerator (TPU when attached) and
    assert bit equality with the CPU stream.  Gated on MPTRAC_TPU_TESTS
    because it leaves the suite's forced-CPU platform via subprocess."""
    import os
    import subprocess
    import sys

    if not os.environ.get("MPTRAC_TPU_TESTS"):
        import pytest
        pytest.skip("set MPTRAC_TPU_TESTS=1 to run on the TPU chip")
    code = (
        "import jax, numpy as np\n"
        "jax.config.update('jax_enable_x64', True)\n"
        "import jax.numpy as jnp\n"
        "from mptrac_tpu.ops.rng import (squares_bits, squares_uniform,\n"
        "                                squares_normal)\n"
        "assert jax.default_backend() not in ('cpu',), jax.default_backend()\n"
        "h, l = squares_bits(jnp.uint64(12345), 999)\n"
        "u, c = squares_uniform(jnp.uint64(12345), 999)\n"
        "n, _ = squares_normal(jnp.uint64(777), 100)\n"
        "np.save('/tmp/sq_tpu_h.npy', np.asarray(h))\n"
        "np.save('/tmp/sq_tpu_l.npy', np.asarray(l))\n"
        "np.save('/tmp/sq_tpu_u.npy', np.asarray(u))\n"
        "np.save('/tmp/sq_tpu_n.npy', np.asarray(n))\n"
    )
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   timeout=900)
    from mptrac_tpu.ops.rng import squares_bits
    h_cpu, l_cpu = squares_bits(jnp.uint64(12345), 999)
    u_cpu, _ = squares_uniform(jnp.uint64(12345), 999)
    n_cpu, _ = squares_normal(jnp.uint64(777), 100)
    # The RNG *stream* (the Squares output bits) is bit-identical
    # across backends — the gpu_test determinism property.
    assert np.array_equal(np.load("/tmp/sq_tpu_h.npy"),
                          np.asarray(h_cpu))
    assert np.array_equal(np.load("/tmp/sq_tpu_l.npy"),
                          np.asarray(l_cpu))
    # The float materialization matches to the TPU's emulated-f64
    # precision (double-float, ~49-bit significand): well inside the
    # f32 tolerance the physics contract requires.
    np.testing.assert_allclose(np.load("/tmp/sq_tpu_u.npy"),
                               np.asarray(u_cpu), rtol=1e-13, atol=0)
    np.testing.assert_allclose(np.load("/tmp/sq_tpu_n.npy"),
                               np.asarray(n_cpu), rtol=0, atol=5e-7)


def test_module_rng_dispatch():
    vals, ctr = module_rng(1, jnp.uint64(0), 6, 1)
    assert vals.shape == (6,)
    vals2, _ = module_rng(2, jnp.uint64(0), 6, 1)  # threefry path
    assert vals2.shape == (6,)
    # odd n exercises the n+1 padding in Box-Muller
    vals3, ctr3 = module_rng(1, jnp.uint64(0), 7, 1)
    assert vals3.shape == (7,) and int(ctr3) == 8
