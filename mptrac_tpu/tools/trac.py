"""trac — the main simulation driver CLI.

Usage mirrors the reference (``/root/reference/src/trac.c:78``):

    python -m mptrac_tpu.tools.trac <dirlist> <ctl> <atm_in> [KEY VALUE ...]

Each line of <dirlist> names a working directory containing the control
and particle files; tasks run sequentially (the reference distributes
them over MPI ranks — here use a job array or multiple processes).
"""

from __future__ import annotations

import sys

from mptrac_tpu.tools._cli import require_args, run_tool


def main(argv):
    require_args(argv, 4, "trac <dirlist> <ctl> <atm_in> [KEY VALUE ...]")
    from mptrac_tpu.sim import run_trac
    with open(argv[1]) as f:
        dirnames = [line.strip() for line in f if line.strip()]
    for dirname in dirnames:
        run_trac(dirname, argv[2], argv[3], argv[4:])
    return 0


if __name__ == "__main__":
    sys.exit(run_tool(main))
