"""Parameterization helpers.

TPU-native equivalents of `/root/reference/src/parameterizations.jl`:
pure jnp functions usable as derived-variable callables.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..constants import KEPLER_YEAR_DAYS


def _nu_to_tp(nu, e, a, M, theta_epoch):
    """True anomaly at theta_epoch -> epoch of periastron [MJD].

    Mean anomaly from true anomaly via the atan2 form used by the
    reference (`parameterizations.jl:60`), then tp = epoch - MA/n.
    """
    sq = jnp.sqrt(1 - e * e)
    MA = (
        jnp.arctan2(-sq * jnp.sin(nu), -e - jnp.cos(nu))
        + math.pi
        - e * sq * jnp.sin(nu) / (1 + e * jnp.cos(nu))
    )
    period_days = jnp.sqrt(a**3 / M) * KEPLER_YEAR_DAYS
    return theta_epoch - MA / (2 * math.pi) * period_days


def theta_at_epoch_to_tperi(
    theta,
    theta_epoch,
    *,
    M,
    e,
    a=None,
    P=None,
    i=None,
    omega=None,
    Omega=None,
    A=None,
    B=None,
    F=None,
    G=None,
    plx=None,
    **_ignored,
):
    """Position angle `theta` at `theta_epoch` -> epoch of periastron.

    Supports both Campbell (i, omega, Omega + a or P) and Thiele-Innes
    (A, B, F, G + plx) parameterizations, mirroring the reference
    `θ_at_epoch_to_tperi` (`parameterizations.jl:6-69`).
    """
    if A is not None and B is not None and F is not None and G is not None:
        if plx is None:
            raise ValueError("Thiele-Innes branch requires plx")
        u = (A**2 + B**2 + F**2 + G**2) / 2
        v = A * G - B * F
        alpha = jnp.sqrt(u + jnp.sqrt((u + v) * (u - v)))
        a_eff = alpha / plx
    elif i is not None and omega is not None and Omega is not None:
        if a is None:
            if P is None:
                raise ValueError("specify a or P with the Campbell branch")
            a = jnp.cbrt(M * (P / KEPLER_YEAR_DAYS) ** 2)
        a_eff = a
        cw, sw = jnp.cos(omega), jnp.sin(omega)
        cO, sO = jnp.cos(Omega), jnp.sin(Omega)
        ci = jnp.cos(i)
        A = cO * cw - sO * sw * ci
        B = sO * cw + cO * sw * ci
        F = -cO * sw - sO * cw * ci
        G = -sO * sw + cO * cw * ci
    else:
        raise ValueError(
            "Specify either (i, omega, Omega, a|P) or (A, B, F, G, plx)"
        )

    # Solve [A F; B G] [x; y] = [cos theta; sin theta] for the direction
    # in the deprojected plane (`parameterizations.jl:43-55`).
    det = A * G - F * B
    ct, st = jnp.cos(theta), jnp.sin(theta)
    x = (G * ct - F * st) / det
    y = (-B * ct + A * st) / det
    nu = jnp.arctan2(y, x)
    return _nu_to_tp(nu, e, a_eff, M, theta_epoch)


def ofti_linear_solve(
    epochs,
    ra_data,
    dec_data,
    sigma_ra,
    sigma_dec,
    cor,
    sigma_ABFG,
    e,
    a,
    tp,
    M,
    plx,
):
    """Analytic marginalization over Thiele-Innes constants.

    Given nonlinear parameters (e, a, tp, M, plx), sky positions are
    linear in (A, B, F, G); solve the weighted linear system with an
    isotropic Gaussian prior N(0, sigma_ABFG^2 I) and return the
    posterior means and the marginal log-likelihood. Math contract per
    the reference `ofti_linear_solve` (`parameterizations.jl:318-405`),
    restructured from an explicit (2N x 2N) weight matrix into fused
    per-epoch 2x2 block reductions.
    """
    from ..orbits.kepler import kepler_solver

    epochs = jnp.asarray(epochs)
    ra_data = jnp.asarray(ra_data)
    dec_data = jnp.asarray(dec_data)
    sigma_ra = jnp.asarray(sigma_ra)
    sigma_dec = jnp.asarray(sigma_dec)
    cor = jnp.asarray(cor)

    period_days = jnp.sqrt(a**3 / M) * KEPLER_YEAR_DAYS
    n = 2 * math.pi / period_days  # rad/day
    MA = n * (epochs - tp)
    EA = kepler_solver(MA, jnp.broadcast_to(e, MA.shape))
    x = jnp.cos(EA) - e                      # multiplies B (ra), A (dec)
    y = jnp.sin(EA) * jnp.sqrt(1 - e * e)    # multiplies G (ra), F (dec)

    # Per-epoch inverse covariance of (ra, dec)
    det_S = sigma_ra**2 * sigma_dec**2 * (1 - cor**2)
    w_rr = sigma_dec**2 / det_S
    w_dd = sigma_ra**2 / det_S
    w_rd = -cor * sigma_ra * sigma_dec / det_S

    # Parameter order (A, B, F, G); ra rows touch (B, G), dec rows (A, F).
    # Design rows: ra_j = x B + y G ; dec_j = x A + y F.
    # Accumulate normal equations Sigma_inv = D^T W D + prior, b = D^T W d.
    def outer4(ra_c, dec_c):
        # coefficient vectors for (A, B, F, G) given this epoch's
        # ra-row coeffs (0, x, 0, y) and dec-row coeffs (x, 0, y, 0)
        return jnp.stack(
            [x * dec_c, x * ra_c, y * dec_c, y * ra_c], axis=-1
        )

    # D^T W rows: for each epoch, W @ [ra_row; dec_row]
    # ra_row in param space: r = (0, x, 0, y); dec_row: s = (x, 0, y, 0)
    r = jnp.stack([jnp.zeros_like(x), x, jnp.zeros_like(y), y], axis=-1)
    s = jnp.stack([x, jnp.zeros_like(x), y, jnp.zeros_like(y)], axis=-1)

    # Sigma_inv = sum_j [ w_rr r r^T + w_rd (r s^T + s r^T) + w_dd s s^T ]
    Sigma_inv = (
        jnp.einsum("j,ji,jk->ik", w_rr, r, r)
        + jnp.einsum("j,ji,jk->ik", w_rd, r, s)
        + jnp.einsum("j,ji,jk->ik", w_rd, s, r)
        + jnp.einsum("j,ji,jk->ik", w_dd, s, s)
    )
    prior_prec = 1.0 / sigma_ABFG**2
    Sigma_inv = Sigma_inv + prior_prec * jnp.eye(4, dtype=Sigma_inv.dtype)

    b = (
        jnp.einsum("j,ji->i", w_rr * ra_data + w_rd * dec_data, r)
        + jnp.einsum("j,ji->i", w_dd * dec_data + w_rd * ra_data, s)
    )

    mu = jnp.linalg.solve(Sigma_inv, b)
    A_fit, B_fit, F_fit, G_fit = mu[0], mu[1], mu[2], mu[3]

    data_quad = jnp.sum(
        w_rr * ra_data**2 + 2 * w_rd * ra_data * dec_data + w_dd * dec_data**2
    )
    post_quad = mu @ Sigma_inv @ mu
    sign, logdet_post_inv = jnp.linalg.slogdet(Sigma_inv)
    logdet_prior_inv = 4 * jnp.log(prior_prec)
    logdet_data_cov = jnp.sum(jnp.log(det_S))
    N = epochs.shape[0]
    log_marginal = (
        -0.5
        * (
            data_quad
            - post_quad
            + logdet_post_inv
            - logdet_prior_inv
            + logdet_data_cov
        )
        - N * math.log(2 * math.pi)
    )
    return {
        "A": A_fit,
        "B": B_fit,
        "F": F_fit,
        "G": G_fit,
        "log_marginal_likelihood": log_marginal,
    }


def theta_omegatheta_at_epoch_to_omega_tperi(
    theta, omega_theta, theta_epoch, *, M, e, i, Omega, a=None, P=None, **_ignored
):
    """(theta, omega_theta) -> (tp, omega): position angle plus the
    angle omega_theta = atan2(B, A) parameterization
    (`θ_ωθ_at_epoch_to_ω_tperi`, reference `parameterizations.jl:71-160`).

    Returns (tp, omega).
    """
    if a is None:
        if P is None:
            raise ValueError("specify a or P")
        a = jnp.cbrt(M * (P / KEPLER_YEAR_DAYS) ** 2)
    omega = jnp.arctan(-jnp.tan(Omega - omega_theta) / jnp.cos(i))
    cw, sw = jnp.cos(omega), jnp.sin(omega)
    cO, sO = jnp.cos(Omega), jnp.sin(Omega)
    ci = jnp.cos(i)
    A = cO * cw - sO * sw * ci
    B = sO * cw + cO * sw * ci
    F = -cO * sw - sO * cw * ci
    G = -sO * sw + cO * cw * ci
    det = A * G - F * B
    ct, st = jnp.cos(theta), jnp.sin(theta)
    x = (G * ct - F * st) / det
    y = (-B * ct + A * st) / det
    nu = jnp.arctan2(y, x)
    tp = _nu_to_tp(nu, e, a, M, theta_epoch)
    return tp, omega


def theta_sep_at_epoch_to_tperi_sma(
    theta, sep, theta_epoch, *, M, plx, e, i, omega, Omega, **_ignored
):
    """(theta, sep) -> (tp, a): position angle + projected separation
    parameterization (`θ_sep_at_epoch_to_tperi_sma`, reference
    `parameterizations.jl:162-284`). sep in mas. Returns (tp, a[AU])."""
    from ..constants import IAU_PC2AU, RAD2AS

    e = jnp.where(e == 0.0, 1e-12, e)
    cw, sw = jnp.cos(omega), jnp.sin(omega)
    cO, sO = jnp.cos(Omega), jnp.sin(Omega)
    ci = jnp.cos(i)
    A = cO * cw - sO * sw * ci
    B = sO * cw + cO * sw * ci
    F = -cO * sw - sO * cw * ci
    G = -sO * sw + cO * cw * ci
    det = A * G - F * B
    ct, st = jnp.cos(theta), jnp.sin(theta)
    x = (G * ct - F * st) / det
    y = (-B * ct + A * st) / det
    nu = jnp.arctan2(y, x)

    # scale a so the projected separation matches (reference :237-270)
    dist_au = 1000.0 / plx * IAU_PC2AU
    cart2angle = RAD2AS * 1e3 / dist_au
    sep_au = sep / cart2angle
    snw, cnw = jnp.sin(omega + nu), jnp.cos(omega + nu)
    r = sep_au / jnp.sqrt(
        (cnw * sO + snw * ci * cO) ** 2 + (cnw * cO - snw * ci * sO) ** 2
    )
    p = r * (1 + e * jnp.cos(nu))
    a = p / (1 - e * e)
    tp = _nu_to_tp(nu, e, a, M, theta_epoch)
    return tp, a
