"""Shared plotting helpers."""

from __future__ import annotations

import functools

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def savable(fn):
    """Add a uniform `fname=` kwarg to a plot function: save the
    figure (150 dpi) after drawing."""

    @functools.wraps(fn)
    def wrapper(*args, fname=None, **kwargs):
        out = fn(*args, **kwargs)
        if fname is not None:
            ax = out
            while isinstance(ax, (list, tuple, np.ndarray)):
                ax = ax[0] if len(ax) else None
            fig = ax.get_figure() if hasattr(ax, "get_figure") else plt.gcf()
            fig.savefig(fname, dpi=150, bbox_inches="tight")
        return out

    if wrapper.__doc__:
        wrapper.__doc__ += "\n\n    fname: optional path to save the figure."
    return wrapper
