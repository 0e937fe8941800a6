"""Parametric population estimation via SAEM (optimize/saem.py).

The reference exposes the SAEM consumables — prediction-based residual
error models (residual_error.rs:69-220) and a per-subject batch
likelihood — for an external driver; this suite exercises the
in-framework SAEM loop built on them: MCMC E-step, two-phase stochastic
approximation, closed-form/MM sigma M-steps, and the population surface.
"""

import numpy as np
import pytest

import pharmsol_tpu as pst
from pharmsol_tpu import Analytical, Data, Route, Subject, metadata
from pharmsol_tpu.data.residual_error import (
    ResidualErrorModel,
    ResidualErrorModels,
)
from pharmsol_tpu.errors import PharmsolError
from pharmsol_tpu.optimize import fit_saem

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


def _correlated_population(n=24, corr=0.6, b_noise=0.08, seed=9):
    """Log-normal (ke, v) with correlated random effects."""
    rng = np.random.default_rng(seed)
    cov = np.array([
        [OMEGA[0] ** 2, corr * OMEGA[0] * OMEGA[1]],
        [corr * OMEGA[0] * OMEGA[1], OMEGA[1] ** 2],
    ])
    etas = rng.multivariate_normal(np.zeros(2), cov, size=n)
    subjects, truth = [], []
    for i in range(n):
        ke = KE * np.exp(etas[i, 0])
        v = V * np.exp(etas[i, 1])
        truth.append((ke, v))
        sb = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
        for t in (0.5, 2.0, 6.0, 12.0, 24.0):
            c = 100.0 * np.exp(-ke * t) / v
            sb = sb.observation(float(t), float(c * (1 + b_noise * rng.standard_normal())), 0)
        subjects.append(sb.build())
    return Data(subjects), np.asarray(truth)


@pytest.mark.slow
def test_saem_recovers_lognormal_population():
    data, truth = _population()
    res = fit_saem(_model(), data, _prop(), [0.4, 8.0],
                   n_burn=200, n_iters=150, mh_steps=4, seed=0, ll_draws=200)
    # compare against the REALIZED sample (what any estimator can see)
    sample_mu = np.exp(np.mean(np.log(truth), axis=0))
    sample_sd = np.std(np.log(truth), axis=0)
    assert np.all(np.abs(res.theta / sample_mu - 1) < 0.05), res.summary()
    assert np.all(np.abs(res.omega - sample_sd) < 0.08), res.summary()
    # proportional sigma recovered near the simulated 8%
    assert abs(res.residual_models.get(0).b - 0.08) < 0.04
    # individual posteriors track per-subject truth
    ind = res.individual_parameters
    assert np.corrcoef(ind[:, 0], truth[:, 0])[0, 1] > 0.98
    assert np.corrcoef(ind[:, 1], truth[:, 1])[0, 1] > 0.85
    # estimation-phase acceptance sits near the 0.3 target
    assert 0.15 < res.accept_rate < 0.5
    assert res.log_likelihood is not None and np.isfinite(res.log_likelihood)
    assert len(res.ll_trace) == 350 and np.all(np.isfinite(res.ll_trace))
    assert "typical" in res.summary()


@pytest.mark.slow
def test_saem_combined_error_mm_step():
    data, _ = _population(n=16, b_noise=0.06, combined_a=0.15, seed=11)
    rems = ResidualErrorModels().add(0, ResidualErrorModel.combined(0.5, 0.2))
    res = fit_saem(_model(), data, rems, [0.3, 9.0],
                   n_burn=150, n_iters=100, mh_steps=4, seed=1)
    m = res.residual_models.get(0)
    # the MM fixed point should land near the simulated (0.15, 0.06)
    assert abs(m.a - 0.15) < 0.12, (m.a, m.b)
    assert abs(m.b - 0.06) < 0.04, (m.a, m.b)


@pytest.mark.slow
def test_saem_named_theta0_and_fixed_sigma():
    md = (metadata.new("m").parameters(["ke", "v"]).states(["central"])
          .outputs(["cp"]).routes([Route.bolus("iv").to_state("central")]))
    model = _model().with_metadata(md)
    rng = np.random.default_rng(5)
    subjects = []
    for i in range(8):
        ke = KE * np.exp(0.2 * rng.standard_normal())
        sb = Subject.builder(f"s{i}").bolus(0.0, 100.0, "iv")
        for t in (1.0, 6.0, 18.0):
            c = 100.0 * np.exp(-ke * t) / V
            sb = sb.observation(float(t), float(c * 1.01), "cp")
        subjects.append(sb.build())
    rems = ResidualErrorModels().add(
        "cp", ResidualErrorModel.proportional(0.1)
    )
    res = fit_saem(model, Data(subjects), rems, {"v": 9.0, "ke": 0.3},
                   n_burn=60, n_iters=40, mh_steps=3, est_sigma=False)
    assert res.parameter_names == ("ke", "v")
    # est_sigma=False keeps the input residual model untouched
    assert res.residual_models.get("cp").b == 0.1
    assert abs(res.theta[0] - KE) / KE < 0.25


@pytest.mark.slow
def test_saem_full_omega_recovers_correlation():
    """omega='full' recovers the REALIZED correlation of the simulated
    random effects (NONMEM OMEGA BLOCK semantics)."""
    data, truth = _correlated_population()
    log_t = np.log(truth)
    sample_corr = np.corrcoef(log_t.T)[0, 1]
    res = fit_saem(_model(), data, _prop(), [0.4, 8.0], omega="full",
                   n_burn=200, n_iters=150, mh_steps=4, seed=0)
    assert res.omega_cov is not None and res.omega_cov.shape == (2, 2)
    corr = res.correlation()
    assert abs(corr[0, 1] - sample_corr) < 0.25, res.summary()
    # diagonal moments still recovered
    sample_mu = np.exp(np.mean(log_t, axis=0))
    sample_sd = np.std(log_t, axis=0)
    assert np.all(np.abs(res.theta / sample_mu - 1) < 0.06), res.summary()
    assert np.all(np.abs(res.omega - sample_sd) < 0.09), res.summary()
    assert "corr(" in res.summary()
    # diagonal mode on the same data reports no covariance
    res_d = fit_saem(_model(), data, _prop(), [0.4, 8.0],
                     n_burn=60, n_iters=40, mh_steps=3, seed=0)
    assert res_d.omega_cov is None and res_d.correlation() is None


def test_saem_identity_transform_runs():
    data, _ = _population(n=6, seed=2)
    res = fit_saem(_model(), data, _prop(), [0.3, 10.0],
                   transform=("log", "identity"),
                   n_burn=30, n_iters=20, mh_steps=2)
    assert res.transform == ("log", "identity")
    assert res.theta[1] > 0  # identity-scale v stays in range here


def test_saem_validates_inputs():
    data, _ = _population(n=4, seed=2)
    with pytest.raises(PharmsolError, match="theta0 > 0"):
        fit_saem(_model(), data, _prop(), [-0.1, 10.0])
    with pytest.raises(PharmsolError, match="metadata"):
        fit_saem(_model(), data, _prop(), {"ke": 0.3, "v": 10.0})
    with pytest.raises(PharmsolError, match="at least 2"):
        fit_saem(_model(), Data(list(data.subjects())[:1]), _prop(),
                 [0.3, 10.0])
    with pytest.raises(PharmsolError, match="transform"):
        fit_saem(_model(), data, _prop(), [0.3, 10.0], transform="sqrt")
    with pytest.raises(PharmsolError, match="omega0"):
        fit_saem(_model(), data, _prop(), [0.3, 10.0], omega0=0.0)
    with pytest.raises(PharmsolError, match="residual error"):
        fit_saem(_model(), data, ResidualErrorModels(), [0.3, 10.0])
    with pytest.raises(PharmsolError, match="'diagonal' or 'full'"):
        fit_saem(_model(), data, _prop(), [0.3, 10.0], omega="block")
