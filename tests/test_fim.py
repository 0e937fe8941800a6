"""Laplace-information SEs at external estimates (optimize/fim.py).

Oracles: evaluated at a Laplace fit's OWN optimum the helper must
reproduce fit_laplace's exact-Hessian SEs (same objective, same point);
at a SAEM optimum it must produce finite SEs of the same magnitude —
the standard "linearization covariance after SAEM" workflow.
"""

import numpy as np
import pytest

import pharmsol_tpu as pst
from pharmsol_tpu import Analytical, Data, Subject
from pharmsol_tpu.data.residual_error import (
    ResidualErrorModel,
    ResidualErrorModels,
)
from pharmsol_tpu.optimize import fit_laplace, fit_saem, laplace_standard_errors

KE, V, OM, SIG = 0.25, 10.0, 0.25, 0.06


def _model():
    return Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )


def _population(n=16, seed=3):
    rng = np.random.default_rng(seed)
    subjects = []
    for i in range(n):
        ke = KE * np.exp(OM * rng.standard_normal())
        v = V * np.exp(0.15 * rng.standard_normal())
        sb = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
        for t in (0.5, 2.0, 6.0, 12.0, 24.0):
            c = 100.0 * np.exp(-ke * t) / v
            sb = sb.observation(
                float(t), float(c * (1 + SIG * rng.standard_normal())), 0
            )
        subjects.append(sb.build())
    return Data(subjects)


def _prop():
    return ResidualErrorModels().add(0, ResidualErrorModel.proportional(SIG))


@pytest.mark.slow
def test_fim_reproduces_laplace_own_ses():
    data = _population()
    lap = fit_laplace(_model(), data, _prop(), [0.4, 8.0])
    assert lap.standard_errors is not None
    r = laplace_standard_errors(_model(), data, _prop(), lap)
    # same objective, same point: tiny gradient, matching SEs
    assert r.gradient_norm < 5e-2, r.summary()
    np.testing.assert_allclose(r.theta_se, lap.standard_errors, rtol=0.05)
    np.testing.assert_allclose(
        r.omega_se, lap.omega_standard_errors, rtol=0.05
    )
    assert r.covariance is not None and np.isfinite(r.covariance).all()
    assert np.isfinite(r.condition_number)
    assert abs(r.log_likelihood - lap.log_likelihood) < 1e-6
    # correlation has unit diagonal where defined
    d = np.diag(r.correlation)
    assert np.allclose(d[np.isfinite(d)], 1.0, atol=1e-8)
    assert len(r.names) == r.covariance.shape[0]


@pytest.mark.slow
def test_fim_gives_saem_ses_matching_laplace_scale():
    data = _population(seed=11)
    sae = fit_saem(_model(), data, _prop(), [0.4, 8.0],
                   n_burn=200, n_iters=150, mh_steps=4, seed=0)
    r = laplace_standard_errors(_model(), data, _prop(), sae)
    assert r.theta_se is not None and np.all(r.theta_se > 0)
    assert r.sigma_se is not None and np.all(r.sigma_se > 0)
    lap = fit_laplace(_model(), data, _prop(), [0.4, 8.0])
    ratio = r.theta_se / lap.standard_errors
    assert np.all((ratio > 0.5) & (ratio < 2.0)), ratio
