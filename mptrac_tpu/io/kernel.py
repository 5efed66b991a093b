"""Altitude kernel functions for output weighting (reference
read_kernel /root/reference/src/mptrac.c:8522, kernel_weight
c:3298)."""

from __future__ import annotations

import numpy as np

from mptrac_tpu.constants import H0, P0


def read_kernel(filename: str):
    """Read ``z w`` rows; normalize weights by the maximum."""
    kz, kw = [], []
    with open(filename) as f:
        for line in f:
            toks = line.split()
            if len(toks) >= 2:
                try:
                    z, w = float(toks[0]), float(toks[1])
                except ValueError:
                    continue
                if kz and z < kz[-1]:
                    raise ValueError("Height levels must be ascending!")
                kz.append(z)
                kw.append(w)
    if len(kz) < 2:
        raise ValueError("Not enough height levels!")
    kw = np.array(kw)
    return np.array(kz), kw / kw.max()


def kernel_weight(kz, kw, p):
    """Weight at pressure p [hPa] by linear interpolation in altitude
    (reference kernel_weight, c:3298); 1.0 when no kernel loaded."""
    if kz is None or len(kz) < 2:
        return np.ones_like(np.asarray(p, float))
    z = H0 * np.log(P0 / np.asarray(p, float))
    return np.interp(z, kz, kw)
