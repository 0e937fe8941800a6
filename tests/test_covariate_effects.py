"""Covariate effects on typical values (optimize/_coveffects.py).

NONMEM-style covariate modeling for the parametric estimators: the
transformed-scale population mean gains ``beta_k * g_k(cov)`` terms —
``'power'`` (allometric ``theta*(cov/ref)**beta`` on log parameters) and
``'linear'`` (additive on the transformed scale). Laplace fits beta as
free psi coordinates with exact SEs; SAEM solves the joint (mu, beta)
GLS normal equations in its M-step. Recovery is judged against the
REALIZED covariate-regression slope of the simulated population (the
repo's standard: sample moments, not asymptotic truth). The reference
ships the engine under such estimators (residual_error.rs:69-220), not
the estimators themselves — this is rebuild-native surface.
"""

import numpy as np
import pytest

import pharmsol_tpu as pst
from pharmsol_tpu import Analytical, Data, Subject
from pharmsol_tpu.data.residual_error import (
    ResidualErrorModel,
    ResidualErrorModels,
)
from pharmsol_tpu.errors import PharmsolError
from pharmsol_tpu.optimize import fit_laplace, fit_saem

KE, V = 0.25, 10.0


def _model():
    return Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )


def _prop(b=0.2):
    return ResidualErrorModels().add(0, ResidualErrorModel.proportional(b))


def _population(n=24, seed=3, beta_true=0.75, form="power"):
    """ke depends on weight; v is covariate-free."""
    rng = np.random.default_rng(seed)
    subjects, truth = [], []
    for i in range(n):
        wt = float(rng.uniform(45.0, 110.0))
        if form == "power":
            shift = beta_true * np.log(wt / 70.0)
        else:
            shift = beta_true * (wt - 70.0)
        ke = KE * np.exp(shift + 0.12 * rng.standard_normal())
        v = V * np.exp(0.15 * rng.standard_normal())
        truth.append((ke, v, wt))
        sb = (Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
              .covariate("wt", 0.0, wt))
        for t in (0.5, 2.0, 6.0, 12.0, 24.0):
            c = 100.0 * np.exp(-ke * t) / v
            y = c * (1 + 0.06 * rng.standard_normal())
            sb = sb.observation(float(t), float(y), 0)
        subjects.append(sb.build())
    return Data(subjects), np.asarray(truth)


def _realized_slope(truth, form="power"):
    x = (np.log(truth[:, 2] / 70.0) if form == "power"
         else truth[:, 2] - 70.0)
    return float(np.polyfit(x, np.log(truth[:, 0]), 1)[0])


@pytest.mark.slow
def test_laplace_and_saem_recover_power_effect():
    data, truth = _population()
    slope = _realized_slope(truth)
    eff = [(0, "wt", "power", 70.0)]
    lap = fit_laplace(_model(), data, _prop(), [0.3, 9.0],
                      covariate_effects=eff)
    assert lap.converged, lap.summary()
    assert lap.beta is not None and lap.beta.shape == (1,)
    assert abs(lap.beta[0] - slope) < 0.1, (lap.beta, slope)
    # beta SE covers the estimation uncertainty and the label renders
    assert lap.beta_standard_errors is not None
    assert 0.0 < lap.beta_standard_errors[0] < 0.5
    assert "p[0]~wt(power,ref=70)" in lap.summary()
    assert lap.covariate_effects == ((0, "wt", "power", 70.0),)
    # the covariate-adjusted fit shrinks the ke random effect toward the
    # realized residual SD (0.12 truth) vs the unadjusted ~0.3 spread
    assert lap.omega[0] < 0.2

    sae = fit_saem(_model(), data, _prop(), [0.3, 9.0],
                   covariate_effects=eff,
                   n_burn=200, n_iters=150, mh_steps=4, seed=0)
    assert sae.beta is not None
    assert abs(sae.beta[0] - slope) < 0.1, (sae.beta, slope)
    assert abs(sae.beta[0] - lap.beta[0]) < 0.05
    assert np.all(np.abs(sae.theta / lap.theta - 1) < 0.05)
    assert "beta" in sae.summary()


@pytest.mark.slow
def test_linear_effect_and_default_reference():
    """'linear' form; omitted reference defaults to the population median."""
    data, truth = _population(seed=9, beta_true=0.01, form="linear")
    med = float(np.median(truth[:, 2]))
    x = truth[:, 2] - med
    slope = float(np.polyfit(x, np.log(truth[:, 0]), 1)[0])
    lap = fit_laplace(_model(), data, _prop(), [0.3, 9.0],
                      covariate_effects=[(0, "wt", "linear")],
                      compute_se=False)
    assert lap.covariate_effects[0][3] == pytest.approx(med)
    assert abs(lap.beta[0] - slope) < 0.004, (lap.beta, slope)


def test_covariate_effect_validation():
    data, _ = _population(n=4, seed=2)
    m, r = _model(), _prop()
    with pytest.raises(PharmsolError, match="form must be one of"):
        fit_laplace(m, data, r, [0.3, 10.0],
                    covariate_effects=[(0, "wt", "sigmoid")])
    with pytest.raises(PharmsolError, match="out of range"):
        fit_laplace(m, data, r, [0.3, 10.0],
                    covariate_effects=[(5, "wt", "power")])
    with pytest.raises(PharmsolError, match="model metadata"):
        fit_laplace(m, data, r, [0.3, 10.0],
                    covariate_effects=[("ke", "wt", "power")])
    with pytest.raises(PharmsolError, match="no covariate"):
        fit_laplace(m, data, r, [0.3, 10.0],
                    covariate_effects=[(0, "crcl", "power")])
    with pytest.raises(PharmsolError, match="parameter, covariate"):
        fit_laplace(m, data, r, [0.3, 10.0], covariate_effects=[(0, "wt")])
    # power needs positive covariate values relative to the reference
    with pytest.raises(PharmsolError, match="positive"):
        fit_laplace(m, data, r, [0.3, 10.0],
                    covariate_effects=[(0, "wt", "power", -70.0)])


def test_no_effects_is_none_surface():
    """Empty spec keeps the result surface unchanged (beta is None)."""
    data, _ = _population(n=6, seed=2)
    res = fit_laplace(_model(), data, _prop(), [0.3, 10.0],
                      max_iters=5, compute_se=False)
    assert res.beta is None and res.covariate_labels is None
