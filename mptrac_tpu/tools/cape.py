"""cape — point calculation of CAPE/CIN/LCL/LFC/EL from a met file
(reference /root/reference/src/cape.c).

Usage: python -m mptrac_tpu.tools.cape <ctl> <met> <lon> <lat>
       [KEY VALUE ...]
"""

import sys

import numpy as np

from mptrac_tpu.config import read_ctl
from mptrac_tpu.met.build import read_met
from mptrac_tpu.tools._cli import require_args, run_tool


def main(argv):
    require_args(argv, 5, "cape <ctl> <met> <lon> <lat> [KEY VALUE ...]")
    ctl = read_ctl(argv[1], argv[4:]).replace(met_cape=1)
    met = read_met(argv[2], ctl)
    lon, lat = float(argv[3]), float(argv[4])
    import jax.numpy as jnp
    from mptrac_tpu.ops import interp
    loc = interp.locate_3d(met, jnp.asarray([lon]), jnp.asarray([lat]),
                           jnp.asarray([500.0]))
    for name in ("plcl", "plfc", "pel", "cape", "cin"):
        v = float(interp.interp_2d(met.fields2d[name], loc)[0])
        print(f"{name} = {v:g}")
    return 0


if __name__ == "__main__":
    sys.exit(run_tool(main))
