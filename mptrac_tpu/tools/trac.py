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
    import os
    from mptrac_tpu.sim import run_trac
    with open(argv[1]) as f:
        dirnames = [line.strip() for line in f if line.strip()]
    # Ensemble task farm (reference trac.c:86-94 distributes dirlist
    # tasks rank-strided over MPI): set MPTRAC_NTASK/MPTRAC_RANK for a
    # job array, or MPTRAC_WORKERS for a local process pool.
    ntask = int(os.environ.get("MPTRAC_NTASK", "1"))
    rank = int(os.environ.get("MPTRAC_RANK", "0"))
    mine = dirnames[rank::ntask] if ntask > 1 else dirnames
    workers = int(os.environ.get("MPTRAC_WORKERS", "0"))
    if workers > 1 and len(mine) > 1:
        import subprocess
        import sys as _sys
        procs = []
        for i, dirname in enumerate(mine):
            env = dict(os.environ, MPTRAC_WORKERS="0")
            with open(os.path.join(dirname, "trac.log"), "w") as log:
                procs.append(subprocess.Popen(
                    [_sys.executable, "-m", "mptrac_tpu.tools.trac",
                     "/dev/stdin", argv[2], argv[3], *argv[4:]],
                    stdin=subprocess.PIPE, stdout=log, stderr=log,
                    env=env, text=True))
                procs[-1].stdin.write(dirname + "\n")
                procs[-1].stdin.close()
            while sum(p.poll() is None for p in procs) >= workers:
                import time
                time.sleep(0.2)
        rcs = [p.wait() for p in procs]
        return max(rcs) if rcs else 0
    for dirname in mine:
        run_trac(dirname, argv[2], argv[3], argv[4:])
    return 0


if __name__ == "__main__":
    sys.exit(run_tool(main))
