"""plot — render particle/grid/met outputs
(reference projects/python/plot_atm.py, plot_traj.py, plot_grid.py,
plot_met_map.py).

Usage: python -m mptrac_tpu.tools.plot <kind> <out.png> <files...>
       [options]

kinds:
  atm      scatter map of particle positions colored by altitude
           (one png per input atm file when <out.png> contains '{}')
  traj     trajectories from a sequence of atm files
  grid     column density map from a grid output file
  met_map  temperature map from a met_map output table
"""

from __future__ import annotations

import sys

import numpy as np

from mptrac_tpu.tools._cli import require_args, run_tool


def _load_tab(path):
    rows = []
    with open(path) as f:
        for line in f:
            toks = line.split()
            if not toks or toks[0].startswith("#"):
                continue
            rows.append([float(x) for x in toks])
    return np.array(rows)


def main(argv):
    require_args(argv, 4, "plot <kind> <out.png> <files...>")
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    kind = argv[1]
    out = argv[2]
    files = argv[3:]

    if kind == "atm":
        for i, f in enumerate(files):
            d = _load_tab(f)
            fig, ax = plt.subplots(figsize=(10, 5))
            sc = ax.scatter(d[:, 2], d[:, 3], c=d[:, 1], s=2,
                            cmap="viridis")
            fig.colorbar(sc, ax=ax, label="altitude [km]")
            ax.set_xlabel("longitude [deg]")
            ax.set_ylabel("latitude [deg]")
            ax.set_title(f)
            fn = out.format(i) if "{}" in out or "{0}" in out else (
                out if len(files) == 1 else f"{out}.{i}.png")
            fig.savefig(fn, dpi=120)
            plt.close(fig)
    elif kind == "traj":
        fig, ax = plt.subplots(figsize=(10, 5))
        data = [_load_tab(f) for f in files]
        nmin = min(d.shape[0] for d in data)
        lon = np.stack([d[:nmin, 2] for d in data])
        lat = np.stack([d[:nmin, 3] for d in data])
        step = max(1, nmin // 500)
        ax.plot(lon[:, ::step], lat[:, ::step], lw=0.5, alpha=0.6)
        ax.set_xlabel("longitude [deg]")
        ax.set_ylabel("latitude [deg]")
        fig.savefig(out, dpi=120)
        plt.close(fig)
    elif kind == "grid":
        d = _load_tab(files[0])
        lon = np.unique(d[:, 2])
        lat = np.unique(d[:, 3])
        cd = np.full((lat.size, lon.size), np.nan)
        ilon = np.searchsorted(lon, d[:, 2])
        ilat = np.searchsorted(lat, d[:, 3])
        cd[ilat, ilon] = d[:, 6]
        fig, ax = plt.subplots(figsize=(10, 5))
        pm = ax.pcolormesh(lon, lat, cd, cmap="magma")
        fig.colorbar(pm, ax=ax, label="column density [kg/m^2]")
        ax.set_xlabel("longitude [deg]")
        ax.set_ylabel("latitude [deg]")
        fig.savefig(out, dpi=120)
        plt.close(fig)
    elif kind == "met_map":
        d = _load_tab(files[0])
        lon = np.unique(d[:, 2])
        lat = np.unique(d[:, 3])
        tt = np.full((lat.size, lon.size), np.nan)
        ilon = np.searchsorted(lon, d[:, 2])
        ilat = np.searchsorted(lat, d[:, 3])
        tt[ilat, ilon] = d[:, 5]
        fig, ax = plt.subplots(figsize=(10, 5))
        pm = ax.pcolormesh(lon, lat, tt, cmap="coolwarm")
        fig.colorbar(pm, ax=ax, label="temperature [K]")
        fig.savefig(out, dpi=120)
        plt.close(fig)
    else:
        raise SystemExit(f"Unknown plot kind: {kind}")
    return 0


if __name__ == "__main__":
    sys.exit(run_tool(main))
