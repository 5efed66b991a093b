"""Checkpoint / resume.

The reference has no explicit mechanism — runs are restartable only
through atm output files, losing the mesoscale perturbation cache and
RNG counter (SURVEY §5; reference cache_t uvwp is never persisted).
Here checkpointing is first-class: the full simulation state — particle
arrays, per-parcel cache including AR(1) perturbations, the Squares RNG
counter, and the current model time — round-trips through a single
compressed npz file.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from mptrac_tpu.types import Atm, Cache

FORMAT_VERSION = 1


def save_checkpoint(path: str, atm: Atm, cache: Cache, t: float,
                    meta: Optional[dict] = None) -> None:
    arrays = {
        "time": np.asarray(atm.time),
        "p": np.asarray(atm.p),
        "lon": np.asarray(atm.lon),
        "lat": np.asarray(atm.lat),
        "np": np.asarray(atm.np),
        "uvwp": np.asarray(cache.uvwp),
        "dt": np.asarray(cache.dt),
        "rng_ctr": np.asarray(cache.rng_ctr),
        "iso_var": np.asarray(cache.iso_var),
        "iso_ps": np.asarray(cache.iso_ps),
        "iso_ts": np.asarray(cache.iso_ts),
        "iso_n": np.asarray(cache.iso_n),
    }
    for name, v in atm.q.items():
        arrays[f"q_{name}"] = np.asarray(v)
    header = dict(version=FORMAT_VERSION, t=float(t),
                  qnt=[n for n in atm.q], meta=meta or {})
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, __header__=json.dumps(header), **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Tuple[Atm, Cache, float, dict]:
    with np.load(path, allow_pickle=False) as d:
        header = json.loads(str(d["__header__"]))
        if header["version"] != FORMAT_VERSION:
            raise ValueError(
                f"Unsupported checkpoint version {header['version']}")
        atm = Atm(
            time=jnp.asarray(d["time"]),
            p=jnp.asarray(d["p"]),
            lon=jnp.asarray(d["lon"]),
            lat=jnp.asarray(d["lat"]),
            q={n: jnp.asarray(d[f"q_{n}"]) for n in header["qnt"]},
            np=jnp.asarray(d["np"]))
        cache = Cache(
            uvwp=jnp.asarray(d["uvwp"]),
            dt=jnp.asarray(d["dt"]),
            rng_ctr=jnp.asarray(d["rng_ctr"]),
            iso_var=jnp.asarray(d["iso_var"]),
            iso_ps=jnp.asarray(d["iso_ps"]),
            iso_ts=jnp.asarray(d["iso_ts"]),
            iso_n=jnp.asarray(d["iso_n"]))
    return atm, cache, header["t"], header["meta"]
