"""sedi — calculate sedimentation velocity
(reference /root/reference/src/sedi.c).

Usage: python -m mptrac_tpu.tools.sedi <p> <T> <r_p> <rho_p>

p [hPa], T [K], particle radius r_p [microns], density rho_p [kg/m^3].
"""

import sys

from mptrac_tpu.ops.thermo import sedi_velocity
from mptrac_tpu.tools._cli import require_args, run_tool


def main(argv):
    require_args(argv, 5, "sedi <p> <T> <r_p> <rho_p>")
    v = float(sedi_velocity(float(argv[1]), float(argv[2]),
                            float(argv[3]), float(argv[4])))
    print("v_s= %g m/s" % v)
    return 0


if __name__ == "__main__":
    sys.exit(run_tool(main))
