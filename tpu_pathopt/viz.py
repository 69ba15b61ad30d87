"""Headless visualization of maps, corridors and optimized paths.

Replaces the reference's RViz marker pipeline (reference: src/test/demo.cpp:
213-385 — path colored by curvature, vehicle rectangles, bound spheres) with
matplotlib PNG rendering for CLI/CI use.
"""

from __future__ import annotations

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _extent(gm):
    r, c = int(gm.n_rows), int(gm.n_cols)
    hx = 0.5 * r * gm.resolution
    hy = 0.5 * c * gm.resolution
    # imshow extent in (left, right, bottom, top) for (y, x) display: we plot
    # world y on the horizontal axis and x on the vertical (grid_map style),
    # flipping so +y is left like RViz would show... keep it simple: plot
    # x horizontal, y vertical by transposing.
    return hx, hy


def plot_result(gm, result, scenario=None, path_out="path.png", title=None):
    """Render ESDF + optimized path (+ raw points / start / target)."""
    esdf = np.asarray(gm.esdf)[:int(gm.n_rows), :int(gm.n_cols)]
    r, c = esdf.shape
    hx, hy = _extent(gm)
    fig, ax = plt.subplots(figsize=(9, 9))
    # Transpose so horizontal = x, vertical = y; row 0 is max x, col 0 max y.
    # After transpose: array[j, i]; extent maps i -> x (descending), j -> y.
    ax.imshow(esdf.T, origin="upper", cmap="gray",
              extent=(hx, -hx, -hy, hy), vmax=np.percentile(esdf, 90))
    nv = int(result.n_valid)
    x = np.asarray(result.x)[:nv]
    y = np.asarray(result.y)[:nv]
    k = np.asarray(result.k)[:nv]
    sc = ax.scatter(x, y, c=np.abs(k), s=6, cmap="plasma", zorder=3)
    fig.colorbar(sc, ax=ax, label="|curvature| [1/m]", shrink=0.6)
    if scenario is not None:
        n_raw = int(scenario.n_raw)
        ax.plot(np.asarray(scenario.raw_x)[:n_raw],
                np.asarray(scenario.raw_y)[:n_raw],
                "c.--", lw=0.8, ms=4, label="raw reference", zorder=2)
        ax.plot(float(scenario.start_x), float(scenario.start_y), "g^",
                ms=10, label="start", zorder=4)
        ax.plot(float(scenario.target_x), float(scenario.target_y), "r*",
                ms=12, label="target", zorder=4)
        ax.legend(loc="upper right")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_title(title or
                 f"optimized path (ok={bool(result.ok)}, "
                 f"blocked={bool(result.blocked)}, n={nv})")
    ax.set_aspect("equal")
    fig.tight_layout()
    fig.savefig(path_out, dpi=110)
    plt.close(fig)
    return path_out
