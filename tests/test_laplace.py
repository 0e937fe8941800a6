"""Laplace conditional-ML population estimation (optimize/laplace.py).

The NONMEM-style conditional leg of the estimation layer. Unlike FOCE,
every ingredient here is exact (jax end-to-end differentiable engines),
so the checks mirror test_saem.py: recovery is judged against the
REALIZED sample moments of the simulated population, not the asymptotic
truth. Reference surface: residual_error.rs:69-220 (residual models) —
the reference itself ships no conditional-ML driver; this is the
rebuild's parametric counterpart to its NPML consumables.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

import pharmsol_tpu as pst
from pharmsol_tpu import Analytical, Data, ODE, Subject
from pharmsol_tpu.data.residual_error import (
    ResidualErrorModel,
    ResidualErrorModels,
)
from pharmsol_tpu.errors import PharmsolError
from pharmsol_tpu.optimize import fit_laplace, fit_saem

KE, V = 0.25, 10.0
OMEGA = (0.3, 0.15)  # log-scale population SDs


def _model():
    return Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )


def _population(n=20, b_noise=0.08, seed=3, combined_a=0.0):
    rng = np.random.default_rng(seed)
    subjects, truth = [], []
    for i in range(n):
        ke = KE * np.exp(OMEGA[0] * rng.standard_normal())
        v = V * np.exp(OMEGA[1] * rng.standard_normal())
        truth.append((ke, v))
        sb = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
        for t in (0.5, 2.0, 6.0, 12.0, 24.0):
            c = 100.0 * np.exp(-ke * t) / v
            y = c * (1 + b_noise * rng.standard_normal())
            y += combined_a * rng.standard_normal()
            sb = sb.observation(float(t), float(y), 0)
        subjects.append(sb.build())
    return Data(subjects), np.asarray(truth)


def _prop(b=0.2):
    return ResidualErrorModels().add(0, ResidualErrorModel.proportional(b))


@pytest.mark.slow
def test_laplace_recovers_lognormal_population():
    data, truth = _population()
    res = fit_laplace(_model(), data, _prop(), [0.4, 8.0])
    sample_mu = np.exp(np.mean(np.log(truth), axis=0))
    sample_sd = np.std(np.log(truth), axis=0)
    assert res.converged, res.summary()
    assert np.all(np.abs(res.theta / sample_mu - 1) < 0.05), res.summary()
    assert np.all(np.abs(res.omega - sample_sd) < 0.08), res.summary()
    assert abs(res.residual_models.get(0).b - 0.08) < 0.04
    # conditional modes track per-subject truth
    ind = res.individual_parameters
    assert np.corrcoef(ind[:, 0], truth[:, 0])[0, 1] > 0.98
    assert np.corrcoef(ind[:, 1], truth[:, 1])[0, 1] > 0.85
    # exact-Hessian SEs exist and are sane (within an order of magnitude
    # of the sampling SD of the mean)
    assert res.standard_errors is not None
    assert np.all(res.standard_errors > 0)
    assert np.all(res.standard_errors < res.theta)
    assert "typical" in res.summary()


@pytest.mark.slow
def test_laplace_matches_saem_on_shared_population():
    """The two parametric estimators agree on theta to a few percent."""
    data, _ = _population(n=16, seed=7)
    lap = fit_laplace(_model(), data, _prop(), [0.35, 9.0])
    sae = fit_saem(_model(), data, _prop(), [0.35, 9.0],
                   n_burn=150, n_iters=100, mh_steps=4, seed=0)
    assert np.all(np.abs(lap.theta / sae.theta - 1) < 0.05), (
        lap.theta, sae.theta)
    assert np.all(np.abs(lap.omega - sae.omega) < 0.06)


@pytest.mark.slow
def test_laplace_combined_error():
    data, _ = _population(n=16, b_noise=0.06, combined_a=0.15, seed=11)
    rems = ResidualErrorModels().add(0, ResidualErrorModel.combined(0.5, 0.2))
    res = fit_laplace(_model(), data, rems, [0.3, 9.0])
    m = res.residual_models.get(0)
    assert abs(m.a - 0.15) < 0.12, (m.a, m.b)
    assert abs(m.b - 0.06) < 0.04, (m.a, m.b)


@pytest.mark.slow
def test_laplace_expm_substitution():
    """A linear ODE model with the exact expm solver fits via the rolled
    substitute (reverse-differentiable), matching the analytical fit."""
    data, _ = _population(n=8, seed=5)
    ode = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([-p[0] * x[0] + b[0]]),
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    ).with_solver("expm")
    res_o = fit_laplace(ode, data, _prop(), [0.3, 9.0], compute_se=False)
    res_a = fit_laplace(_model(), data, _prop(), [0.3, 9.0],
                        compute_se=False)
    assert np.all(np.abs(res_o.theta / res_a.theta - 1) < 1e-3)
    assert abs(res_o.log_likelihood - res_a.log_likelihood) < 0.05


@pytest.mark.slow
def test_laplace_full_omega_recovers_correlation():
    """omega='full' (Cholesky-parameterized covariance) recovers the
    realized random-effect correlation, agreeing with SAEM's full mode."""
    from test_saem import _correlated_population

    data, truth = _correlated_population()
    log_t = np.log(truth)
    sample_corr = np.corrcoef(log_t.T)[0, 1]
    res = fit_laplace(_model(), data, _prop(), [0.4, 8.0], omega="full")
    assert res.converged, res.summary()
    assert res.omega_cov is not None and res.omega_cov.shape == (2, 2)
    corr = res.correlation()
    assert abs(corr[0, 1] - sample_corr) < 0.25, res.summary()
    sample_mu = np.exp(np.mean(log_t, axis=0))
    assert np.all(np.abs(res.theta / sample_mu - 1) < 0.06), res.summary()
    assert np.all(np.abs(res.omega - np.std(log_t, axis=0)) < 0.09)
    assert "corr(" in res.summary()
    # full-omega SEs on omega are not exposed; theta SEs still are
    assert res.standard_errors is not None
    assert res.omega_standard_errors is None


def test_laplace_identity_transform_runs():
    data, _ = _population(n=6, seed=2)
    res = fit_laplace(_model(), data, _prop(), [0.3, 10.0],
                      transform=("log", "identity"),
                      max_iters=8, compute_se=False)
    assert res.transform == ("log", "identity")
    assert res.theta[1] > 0
    assert res.iterations <= 8


def test_laplace_validates_inputs():
    data, _ = _population(n=4, seed=2)
    with pytest.raises(PharmsolError, match="theta0 > 0"):
        fit_laplace(_model(), data, _prop(), [-0.1, 10.0])
    with pytest.raises(PharmsolError, match="metadata"):
        fit_laplace(_model(), data, _prop(), {"ke": 0.3, "v": 10.0})
    with pytest.raises(PharmsolError, match="at least 2"):
        fit_laplace(_model(), Data(list(data.subjects())[:1]), _prop(),
                    [0.3, 10.0])
    with pytest.raises(PharmsolError, match="transform"):
        fit_laplace(_model(), data, _prop(), [0.3, 10.0], transform="sqrt")
    with pytest.raises(PharmsolError, match="omega0"):
        fit_laplace(_model(), data, _prop(), [0.3, 10.0], omega0=0.0)
    with pytest.raises(PharmsolError, match="residual error"):
        fit_laplace(_model(), data, ResidualErrorModels(), [0.3, 10.0])
    with pytest.raises(PharmsolError, match="'diagonal' or 'full'"):
        fit_laplace(_model(), data, _prop(), [0.3, 10.0], omega="block")
    # adaptive ODE solvers are supported via the forward-mode pipeline
    # (round 4); SDE likelihoods stay rejected — discrete resampling is
    # not differentiable in either mode
    from pharmsol_tpu import SDE

    sde = SDE(
        drift=lambda x, p, t, rateiv, cov: jnp.stack([-p[0] * x[0]]),
        diffusion=lambda p, t, cov: jnp.stack([0.1]),
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nparticles=8, nstates=1, ndrugs=1, nout=1,
    )
    with pytest.raises(PharmsolError, match="fit_saem"):
        fit_laplace(sde, data, _prop(), [0.3, 10.0])


def test_information_criteria_surface():
    # aic/bic are pure arithmetic on (log_likelihood, n_free, n_obs)
    import numpy as np
    from pharmsol_tpu.optimize.laplace import LaplaceResult
    from pharmsol_tpu.optimize.saem import SaemResult

    r = LaplaceResult(
        theta=np.ones(2), omega=np.ones(2), residual_models=None,
        individual_parameters=np.ones((2, 2)), eta=np.zeros((2, 2)),
        log_likelihood=-100.0, converged=True, iterations=3,
        gradient_norm=0.0, standard_errors=None,
        omega_standard_errors=None, parameter_names=None,
        transform=("log", "log"), n_free=5, n_obs=50,
    )
    assert r.aic() == pytest.approx(210.0)
    assert r.bic() == pytest.approx(200.0 + 5 * np.log(50))
    s = SaemResult(
        theta=np.ones(2), omega=np.ones(2), residual_models=None,
        individual_parameters=np.ones((2, 2)),
        ll_trace=np.zeros(3), accept_rate=0.4, log_likelihood=None,
        parameter_names=None, transform=("log", "log"),
        n_free=5, n_obs=50,
    )
    assert np.isnan(s.aic()) and np.isnan(s.bic())


@pytest.mark.slow
def test_laplace_forward_mode_adaptive_ode():
    """Round 5 (VERDICT r4 item 2): fit_laplace reaches adaptive-ODE
    engines via CONTINUOUS FORWARD SENSITIVITIES (engine/sens.py): the
    derivatives integrate augmented variational ODEs instead of jvp-ing
    the while_loop stepper, collapsing the former ~35-min jvp-tower
    compile (which kept this test env-gated) to ordinary kernel scale.
    Asserts end to end: theta moves toward the realized values and the
    forward-over-forward SEs are finite. inner_steps=12: the IFT rule
    needs well-converged inner modes or the outer Hessian goes
    asymmetric/indefinite and SEs are refused."""
    rng = np.random.RandomState(3)
    ke_t, v_t = 0.25, 10.0
    ode = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([-p[0] * x[0] + b[0]]),
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )
    subs = []
    etas = rng.randn(4, 2) * 0.2
    for i in range(4):
        ke_i = ke_t * np.exp(etas[i, 0])
        v_i = v_t * np.exp(etas[i, 1])
        sb = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
        for t in (1.0, 6.0):
            conc = 100.0 * np.exp(-ke_i * t) / v_i
            sb = sb.observation(
                float(t), float(conc * (1 + 0.05 * rng.randn())), 0)
        subs.append(sb.build())
    rem = ResidualErrorModels().add(0, ResidualErrorModel.proportional(0.1))
    res = fit_laplace(ode, Data(subs), rem, [0.45, 7.0], omega0=0.3,
                      inner_steps=12, max_iters=15, compute_se=True)
    assert np.all(np.isfinite(res.theta))
    # moved toward the realized population from the deliberately-off start
    real_ke = ke_t * np.exp(np.mean(etas[:, 0]))
    real_v = v_t * np.exp(np.mean(etas[:, 1]))
    assert abs(res.theta[0] - real_ke) < abs(0.45 - real_ke)
    assert abs(res.theta[1] - real_v) < abs(7.0 - real_v)
    assert res.standard_errors is not None
    assert np.all(np.isfinite(res.standard_errors))
    assert np.isfinite(res.log_likelihood)
