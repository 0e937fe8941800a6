"""NPML weight solve: hybrid (burn-in + active-set Newton + KKT) vs plain.

The round-5 solver (optimize/weights.py) must land at the same optimum
as the round-4 plain multiplicative fixed point — the flagship-fit
acceptance criterion is identical final log-likelihood to 1e-6 — and
must satisfy Lindsay's gradient condition D_j <= n with equality on the
support (the same D-score the reference optimizes,
optimize/parameters.rs:19-120).
"""

import numpy as np
import pytest

from pharmsol_tpu.optimize.weights import (
    _burnin_device,
    _burnin_host,
    _newton_active,
    solve_weights,
    solve_weights_plain,
)


def _mixture_psi(rng, n, k, bw=0.1):
    """Synthetic psi: subjects drawn near a few modes, row-normalized."""
    centers = rng.rand(max(1, k // 50) + 2)
    true = centers[rng.randint(len(centers), size=n)]
    theta = np.sort(rng.rand(k))
    log_psi = -0.5 * ((true[:, None] - theta[None, :]) / bw) ** 2
    return np.exp(log_psi - log_psi.max(axis=1, keepdims=True))


@pytest.mark.parametrize("n,k", [(60, 8), (400, 150), (300, 2)])
def test_hybrid_matches_plain_optimum(n, k):
    psi = _mixture_psi(np.random.RandomState(n + k), n, k)
    lam_p, pyl_p, ll_p = solve_weights_plain(psi)
    lam_n, pyl_n, ll_n = solve_weights(psi)
    assert ll_n >= ll_p - 1e-6 * max(1.0, abs(ll_p))
    assert abs(lam_n.sum() - 1.0) < 1e-12
    assert np.all(lam_n >= 0.0)


def test_hybrid_satisfies_kkt():
    psi = _mixture_psi(np.random.RandomState(3), 500, 120)
    lam, pyl, ll = solve_weights(psi)
    n = psi.shape[0]
    d = psi.T @ (1.0 / pyl)
    # supported points sit at D = n; excluded points below (Lindsay 1983)
    sup = lam > 1e-8
    assert np.all(d[sup] <= n * (1.0 + 1e-6))
    assert np.max(np.abs(d[sup] - n)) < n * 1e-4
    assert np.all(d[~sup] <= n * (1.0 + 1e-4))


def test_two_point_analytic():
    # two subjects, each matched perfectly by one column: lam = (.5, .5),
    # pyl = diag-dominant — the closed form the round-4 test pinned
    psi = np.array([[1.0, 1e-8], [1e-8, 1.0]])
    lam, pyl, ll = solve_weights(psi)
    assert np.allclose(lam, [0.5, 0.5], atol=1e-6)


def test_kkt_outer_loop_readmits_pruned_column():
    # burn-in prunes aggressively; a column essential to the optimum that
    # decays early must re-enter through the exact KKT check
    rng = np.random.RandomState(11)
    psi = _mixture_psi(rng, 200, 60, bw=0.05)
    lam, pyl, ll = solve_weights(psi)
    lam_p, pyl_p, ll_p = solve_weights_plain(psi, max_iters=20000)
    assert ll >= ll_p - 1e-6 * max(1.0, abs(ll_p))


def test_burnin_host_prunes_and_preserves_mass():
    psi = _mixture_psi(np.random.RandomState(5), 300, 100)
    lam = _burnin_host(psi)
    assert lam.shape == (100,)
    assert abs(lam.sum() - 1.0) < 1e-12
    assert np.sum(lam > 0) < 100  # pruning actually happened


def test_burnin_device_matches_host_direction():
    # the f32 jitted while_loop burn-in (CPU backend here) must land in
    # the same basin as the host burn-in: Newton from either endpoint
    # reaches the same ll
    psi = _mixture_psi(np.random.RandomState(7), 250, 96)
    n = psi.shape[0]
    pad = np.concatenate([psi, np.zeros((n, 32))], axis=1)
    lam_dev = _burnin_device(pad.astype(np.float32), 96)
    assert lam_dev.shape == (96,)
    assert abs(lam_dev.sum() - 1.0) < 1e-9
    lam_a = _newton_active(psi, lam_dev, n)
    lam_b = _newton_active(psi, _burnin_host(psi), n)
    lla = np.sum(np.log(np.maximum(psi @ lam_a, 1e-300)))
    llb = np.sum(np.log(np.maximum(psi @ lam_b, 1e-300)))
    assert abs(lla - llb) < 1e-6 * max(1.0, abs(llb))


def test_single_column_short_circuit():
    psi = np.abs(np.random.RandomState(0).rand(10, 1)) + 0.1
    lam, pyl, ll = solve_weights(psi)
    assert lam.shape == (1,) and lam[0] == 1.0
    assert np.allclose(pyl, psi[:, 0])
