"""Batch (vectorized-over-parameters) ESS/R-hat diagnostics match the
scalar reference implementation exactly.

The scalar `ess_rhat` is the audited accounting (rank-normalized bulk
ESS + max of bulk/folded split-R-hat, Vehtari et al. 2021) used by the
bench gates; `ess_rhat_batch` is the one-pass vectorized version used
for large chain sets. For continuous float samples the two must agree
to floating-point roundoff.
"""

import numpy as np
import pytest

from octofitter_tpu.chains import (
    ess_rhat,
    ess_rhat_batch,
    ess_tail,
    ess_tail_batch,
)


def _make_chains(seed=0, m=8, n=512, p=6):
    rng = np.random.default_rng(seed)
    # AR(1) chains with per-parameter autocorrelation and per-chain
    # mean offsets so both ESS < m*n and R-hat > 1 paths are exercised
    phi = np.linspace(0.0, 0.9, p)
    eps = rng.standard_normal((m, n, p))
    x = np.empty((m, n, p))
    x[:, 0] = eps[:, 0]
    for t in range(1, n):
        x[:, t] = phi * x[:, t - 1] + eps[:, t]
    x += rng.standard_normal((m, 1, p)) * np.linspace(0.0, 0.5, p)
    return x


def test_batch_matches_scalar_ess_rhat():
    x = _make_chains()
    ess_b, rhat_b = ess_rhat_batch(x)
    for j in range(x.shape[-1]):
        ess_s, rhat_s = ess_rhat(x[:, :, j])
        assert ess_b[j] == pytest.approx(ess_s, rel=1e-10)
        assert rhat_b[j] == pytest.approx(rhat_s, rel=1e-10)


def test_batch_matches_scalar_with_ties():
    """Real sampler output always contains exact ties (an MH rejection
    duplicates the previous draw); average-tie ranking must match the
    scalar rankdata(method='average') path exactly."""
    rng = np.random.default_rng(7)
    x = _make_chains(seed=5, p=4)
    # MH-style rejection duplicates: ~30% of draws repeat the previous
    rej = rng.random((x.shape[0], x.shape[1], x.shape[2])) < 0.3
    for t in range(1, x.shape[1]):
        x[:, t] = np.where(rej[:, t], x[:, t - 1], x[:, t])
    # plus a heavily quantized column (many multi-way ties)
    x[:, :, 3] = np.round(x[:, :, 3] * 2.0) / 2.0
    ess_b, rhat_b = ess_rhat_batch(x)
    for j in range(x.shape[-1]):
        ess_s, rhat_s = ess_rhat(x[:, :, j])
        assert ess_b[j] == pytest.approx(ess_s, rel=1e-10)
        assert rhat_b[j] == pytest.approx(rhat_s, rel=1e-10)


def test_batch_matches_scalar_ess_tail():
    x = _make_chains(seed=3)
    tail_b = ess_tail_batch(x)
    for j in range(x.shape[-1]):
        tail_s = ess_tail(x[:, :, j])
        assert tail_b[j] == pytest.approx(tail_s, rel=1e-10)


def test_batch_handles_degenerate_columns():
    x = _make_chains(seed=1, p=4)
    x[:, :, 1] = 7.5  # constant
    x[2, 5, 2] = np.nan  # non-finite
    ess_b, rhat_b = ess_rhat_batch(x)
    tail_b = ess_tail_batch(x)
    for j in (1, 2):
        assert np.isnan(ess_b[j]) and np.isnan(rhat_b[j]) and np.isnan(tail_b[j])
    for j in (0, 3):
        ess_s, rhat_s = ess_rhat(x[:, :, j])
        assert ess_b[j] == pytest.approx(ess_s, rel=1e-10)
        assert rhat_b[j] == pytest.approx(rhat_s, rel=1e-10)


def test_batch_accepts_2d():
    x = _make_chains(seed=2, p=1)[:, :, 0]
    ess_b, rhat_b = ess_rhat_batch(x)
    ess_s, rhat_s = ess_rhat(x)
    assert ess_b.shape == (1,) and rhat_b.shape == (1,)
    assert ess_b[0] == pytest.approx(ess_s, rel=1e-10)
    assert rhat_b[0] == pytest.approx(rhat_s, rel=1e-10)


def test_all_degenerate_returns_nan():
    x = np.full((4, 64, 2), 3.0)
    ess_b, rhat_b = ess_rhat_batch(x)
    assert np.isnan(ess_b).all() and np.isnan(rhat_b).all()
    assert np.isnan(ess_tail_batch(x)).all()


def test_summary_uses_batch_consistently():
    from octofitter_tpu.chains import Chains

    x = _make_chains(seed=4, p=3)
    ch = Chains({f"p{j}": x[:, :, j] for j in range(3)})
    s = ch.summary()
    for j in range(3):
        ess_s, rhat_s = ess_rhat(x[:, :, j])
        assert s[f"p{j}"]["ess"] == pytest.approx(ess_s, rel=1e-10)
        assert s[f"p{j}"]["rhat"] == pytest.approx(rhat_s, rel=1e-10)
        assert s[f"p{j}"]["ess_tail"] == pytest.approx(
            ess_tail(x[:, :, j]), rel=1e-10
        )


def test_device_matches_numpy_batch():
    """The fused on-device diagnostics (`ess_rhat_batch_device`) match
    the numpy oracle to <1e-12 in f64, including MH-duplicate and
    multi-way ties and degenerate columns (VERDICT r4 item 5)."""
    from octofitter_tpu.chains import ess_rhat_batch_device

    rng = np.random.default_rng(11)
    x = _make_chains(seed=6, p=5)
    rej = rng.random(x.shape) < 0.3
    for t in range(1, x.shape[1]):
        x[:, t] = np.where(rej[:, t], x[:, t - 1], x[:, t])
    x[:, :, 2] = np.round(x[:, :, 2] * 2.0) / 2.0   # multi-way ties
    x[:, :, 3] = 7.0                                 # constant -> nan
    x[0, 5, 4] = np.nan                              # non-finite -> nan
    ess_d, rhat_d = ess_rhat_batch_device(x)
    ess_b, rhat_b = ess_rhat_batch(x)
    np.testing.assert_allclose(ess_d, ess_b, rtol=0, atol=1e-12 * 8 * 512)
    np.testing.assert_allclose(rhat_d, rhat_b, rtol=0, atol=1e-12)
    assert np.isnan(ess_d[3]) and np.isnan(rhat_d[3])
    assert np.isnan(ess_d[4]) and np.isnan(rhat_d[4])


def test_device_accepts_2d_and_short():
    from octofitter_tpu.chains import ess_rhat_batch_device

    x = _make_chains(seed=2, p=1)[:, :, 0]
    ess_d, rhat_d = ess_rhat_batch_device(x)
    ess_b, rhat_b = ess_rhat_batch(x)
    np.testing.assert_allclose(ess_d, ess_b, rtol=1e-12)
    np.testing.assert_allclose(rhat_d, rhat_b, rtol=1e-12)
    e, r = ess_rhat_batch_device(np.zeros((4, 3, 2)))   # n < 4
    assert np.isnan(e).all() and np.isnan(r).all()


def test_device_f32_large_s_no_ndtri_saturation():
    """f32 rank-normal scores at bench scale: the naive Blom argument
    (r - 0.375)/(S + 0.25) rounds to exactly 1.0 for near-max ranks
    once S >= 2^23 in float32, sending ndtri to +inf and poisoning
    W -> R-hat = NaN while ESS clamps to exactly m*n (observed on-chip
    at 8192x3000: every untied parameter NaN). The device path must
    evaluate the upper tail as -ndtri(1 - p) with the complementary
    numerator 2S - k formed in exact int32 arithmetic. S here is the
    minimal saturating size (1024 chains x 8192 draws = 2^23)."""
    import jax.numpy as jnp

    from octofitter_tpu.chains import ess_rhat_batch, ess_rhat_batch_device

    rng = np.random.default_rng(3)
    m, n = 1024, 8192
    x = (rng.standard_normal((m, n, 1)).cumsum(axis=1) * 0.02
         + rng.standard_normal((m, 1, 1)))
    ess_d, rhat_d = ess_rhat_batch_device(jnp.asarray(x, jnp.float32))
    assert np.isfinite(ess_d).all() and np.isfinite(rhat_d).all()
    assert not np.allclose(ess_d[0], m * n)   # the saturation signature
    ess_h, rhat_h = ess_rhat_batch(x)
    np.testing.assert_allclose(ess_d, ess_h, rtol=2e-3)
    np.testing.assert_allclose(rhat_d, rhat_h, rtol=1e-4)
