"""Epoch-axis sharding for long scan tables.

SURVEY.md section 5 "long-context" analogue: the reference's "sequence"
is the epoch axis — Gaia DR4 IAD and G23H scan tables reach
hundreds-to-thousands of scans per source (`system.jl:35-54`,
`Octofitter.jl:305-309`). When one system's table exceeds a chip (or
you simply want to spread the work), shard the epoch axis over a
`jax.sharding.Mesh` with `shard_map` and reduce with `psum`:

- per-epoch log-likelihood terms are a plain sum -> psum of partials;
- the 5-parameter astrometric LSQ inside HGCA/G23H/DR4 is linear least
  squares, so its normal equations A'WA (5x5) and A'Wb (5) are
  reductions over epochs — exactly the structure ring-style sequence
  parallelism exploits. Each device reduces its shard, one psum of a
  (5,5)+(5,) pytree crosses the ICI, and every device solves the tiny
  system locally.

All entry points pad the epoch axis to a multiple of the mesh size
with zero weights, so results are exact, shape-static, and identical
on every device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def _pad_to(n_pad, arr, fill=0.0):
    pad = n_pad - arr.shape[0]
    if pad == 0:
        return arr
    return jnp.concatenate(
        [arr, jnp.full((pad,) + arr.shape[1:], fill, arr.dtype)]
    )


def sharded_epoch_sum(term_fn, arrays, mesh: Mesh, axis_name: str | None = None,
                      weights=None):
    """Sum per-epoch scalar terms over a sharded epoch axis.

    term_fn(*shard_arrays) -> per-epoch terms (shape (n_local,)); the
    total is psum(sum(local terms * local weights)). `arrays` is a
    tuple of equal-length epoch-axis arrays. Returns the exact global
    scalar (replicated).
    """
    axis_name = axis_name or mesh.axis_names[0]
    n_dev = mesh.devices.size
    n = arrays[0].shape[0]
    n_pad = -(-n // n_dev) * n_dev
    w = jnp.ones(n, arrays[0].dtype) if weights is None else jnp.asarray(weights)
    # pad data with 1s (not 0s) so term_fn stays finite on padded rows;
    # the zero pad weight removes them from the sum regardless
    arrays = tuple(_pad_to(n_pad, jnp.asarray(a), fill=1.0) for a in arrays)
    w = _pad_to(n_pad, w, fill=0.0)

    def local(w_l, *arr_l):
        terms = term_fn(*arr_l)
        contrib = jnp.where(w_l > 0, w_l * terms, 0.0)
        return jax.lax.psum(jnp.sum(contrib), axis_name)

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name),) * (1 + len(arrays)),
        out_specs=P(),
    )
    return f(w, *arrays)


def sharded_fit_5param(A, cosphi, sinphi, dalpha, ddelta, mesh: Mesh,
                       axis_name: str | None = None, weights=None,
                       residuals=0.0, sigma=None, include_chi2=False,
                       n_rows=None):
    """Epoch-sharded 5-parameter astrometric fit via normal equations.

    Same contract as `astrom.fitting.fit_5param` but with the epoch
    axis distributed over `mesh`: each device accumulates its shard's
    A'WA and A'Wb, one psum crosses the ICI, and the 5x5 solve is
    replicated. Exact up to normal-equation conditioning (the tables
    are <= a few thousand rows with benign design matrices; run in
    f64).
    """
    axis_name = axis_name or mesh.axis_names[0]
    n_dev = mesh.devices.size
    A = jnp.asarray(A)
    n = A.shape[0]
    b = dalpha * cosphi + ddelta * sinphi + residuals
    w = jnp.ones(n, A.dtype) if weights is None else jnp.asarray(weights, A.dtype)
    if sigma is not None and jnp.ndim(sigma) > 0:
        w = w / (jnp.asarray(sigma) ** 2)
    n_pad = -(-n // n_dev) * n_dev
    A_p = jnp.concatenate([A, jnp.zeros((n_pad - n, A.shape[1]), A.dtype)])
    b_p = _pad_to(n_pad, b)
    w_p = _pad_to(n_pad, w)

    def local(A_l, b_l, w_l):
        Aw = A_l * w_l[:, None]
        ata = jax.lax.psum(A_l.T @ Aw, axis_name)
        atb = jax.lax.psum(Aw.T @ b_l, axis_name)
        btb = jax.lax.psum(jnp.sum(w_l * b_l * b_l), axis_name)
        return ata, atb, btb

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(), P(), P()),
    )
    ata, atb, btb = f(A_p, b_p, w_p)
    x = jnp.linalg.solve(ata, atb)
    parameters = (x[0], x[1], x[3], x[4], x[2])
    out = {"parameters": parameters}
    if include_chi2:
        # chi2 = b'Wb - x'A'Wb (exact for the weighted LSQ solution)
        chi2 = btb - x @ atb
        if sigma is not None and jnp.ndim(sigma) == 0:
            chi2 = chi2 / (sigma * sigma)
        dof = (n if n_rows is None else n_rows) - 5
        out["chi_squared_astro"] = chi2
        out["chi2_reduced"] = chi2 / dof
    return out


def sharded_gaia_dr4_ll(table, model_al, jitter, mesh: Mesh,
                        axis_name: str | None = None):
    """Epoch-sharded Gaia DR4 along-scan Gaussian log-likelihood.

    table: dict with centroid_pos_al, centroid_pos_error_al (the >10^4
    scan case); model_al: model along-scan positions. The per-scan
    terms are independent Gaussians -> one psum of partial sums.
    """
    data = jnp.asarray(table["centroid_pos_al"])
    err = jnp.asarray(table["centroid_pos_error_al"])

    def term(d, e, m):
        var = e * e + jitter * jitter
        return -0.5 * ((d - m) ** 2 / var + jnp.log(2 * jnp.pi * var))

    return sharded_epoch_sum(term, (data, err, jnp.asarray(model_al)), mesh,
                             axis_name)
