"""Device-mesh sharding for particle data parallelism.

Replaces the reference's OpenMP particle loops + MPI ensemble/domain
machinery (/root/reference/src/mptrac.h:1536 PARTICLE_LOOP, trac.c:69
MPI task farm) with jax.sharding: particles are sharded over a 1-D
``dp`` mesh axis (met fields replicated per device), and the timestep
graph is jitted with those shardings so every module's elementwise and
gather work runs fully parallel across chips with no communication.

Spatial domain decomposition (sharded met + parcel migration) lives in
:mod:`mptrac_tpu.parallel.dd`.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mptrac_tpu.types import Atm, Cache, Met


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(
            f"Requested {n}-device mesh but only {len(devs)} devices "
            "are available (set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N for "
            "virtual CPU devices)")
    return Mesh(np.array(devs[:n]), (axis,))


def particle_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_atm(atm: Atm, mesh: Mesh, axis: str = "dp") -> Atm:
    """Place particle arrays sharded over the mesh; np scalar
    replicated.  Capacity must divide the mesh size (pad first)."""
    ps = particle_sharding(mesh, axis)
    rep = replicated(mesh)

    def put(x):
        return jax.device_put(x, ps if x.ndim >= 1 else rep)

    return Atm(
        time=put(atm.time), p=put(atm.p), lon=put(atm.lon),
        lat=put(atm.lat),
        q={k: put(v) for k, v in atm.q.items()},
        np=jax.device_put(atm.np, rep))


def shard_cache(cache: Cache, mesh: Mesh, axis: str = "dp") -> Cache:
    """Placements derive from the Cache field categories (types.py) so
    a new field can never be silently dropped (round-4 regression)."""
    from mptrac_tpu.types import cache_field_tree
    ps = particle_sharding(mesh, axis)
    rep = replicated(mesh)
    uvwp_s = NamedSharding(mesh, P(None, axis))
    shardings = cache_field_tree(particle=ps, particle2d=uvwp_s,
                                 device_scalar=rep, glob=rep)
    # iso_var may be the [1] placeholder when ISOSURF is off
    if cache.iso_var.shape != cache.dt.shape:
        shardings = shardings.replace(iso_var=rep)
    return jax.tree.map(jax.device_put, cache, shardings)


def replicate_met(met: Met, mesh: Mesh) -> Met:
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), met)


def pad_to_multiple(atm: Atm, multiple: int) -> Atm:
    """Grow particle capacity to a multiple of the mesh size (static
    shapes; padded entries are masked by atm.np)."""
    import jax.numpy as jnp
    npmax = atm.npmax
    target = ((npmax + multiple - 1) // multiple) * multiple
    if target == npmax:
        return atm
    pad = target - npmax

    def padarr(x):
        if x.ndim == 0:
            return x
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    return Atm(time=padarr(atm.time), p=padarr(atm.p),
               lon=padarr(atm.lon), lat=padarr(atm.lat),
               q={k: padarr(v) for k, v in atm.q.items()}, np=atm.np)
