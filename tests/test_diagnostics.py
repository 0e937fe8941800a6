"""Simulation-based population diagnostics (optimize/diagnostics.py).

VPC and NPDE re-simulate the observed design under a fitted population;
the oracles are statistical: under the TRUE data-generating population
the observed percentiles sit inside the simulated bands and the pooled
npde moments match N(0, 1); under a deliberately wrong population both
diagnostics flag the misfit. The reference library has no diagnostics
layer (it stops at simulation surfaces) — this is the rebuild's
downstream-workflow completion, NONMEM/Pmetrics VPC semantics.
"""

from types import SimpleNamespace

import numpy as np
import pytest

import pharmsol_tpu as pst
from pharmsol_tpu import Analytical, Data, Subject
from pharmsol_tpu.data.residual_error import (
    ResidualErrorModel,
    ResidualErrorModels,
)
from pharmsol_tpu.errors import PharmsolError
from pharmsol_tpu.optimize import npde, vpc

KE, V = 0.25, 10.0
OMEGA = (0.3, 0.15)
B_NOISE = 0.08


def _model():
    return Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )


def _population(n=24, seed=3):
    rng = np.random.default_rng(seed)
    subjects = []
    for i in range(n):
        ke = KE * np.exp(OMEGA[0] * rng.standard_normal())
        v = V * np.exp(OMEGA[1] * rng.standard_normal())
        sb = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
        for t in (0.5, 2.0, 6.0, 12.0, 24.0):
            c = 100.0 * np.exp(-ke * t) / v
            sb = sb.observation(float(t), float(c * (1 + B_NOISE * rng.standard_normal())), 0)
        subjects.append(sb.build())
    return Data(subjects)


def _prop(b=B_NOISE):
    return ResidualErrorModels().add(0, ResidualErrorModel.proportional(b))


def _truth():
    return SimpleNamespace(
        theta=np.asarray([KE, V]),
        omega=np.asarray(OMEGA),
        omega_cov=None,
        transform=("log", "log"),
    )


def test_vpc_correct_model_covers():
    data = _population()
    res = vpc(_model(), data, _prop(), _truth(), n_rep=300, seed=1)
    # 5 unique times -> one bin per time
    assert len(res.bin_times) == 5
    assert int(res.n_obs.sum()) == 24 * 5
    assert res.observed.shape == (3, 5)
    # under the true population most observed percentiles sit in-band
    assert res.coverage() >= 0.7, res.summary()
    # simulated medians track observed medians to population-sampling error
    rel = np.abs(res.predicted[1] / res.observed[1] - 1)
    assert np.all(rel < 0.35), res.summary()
    assert np.all(res.pi_low <= res.pi_high)
    assert "VPC" in res.summary()


def test_vpc_wrong_model_flags_misfit():
    data = _population()
    wrong = SimpleNamespace(
        theta=np.asarray([3.0 * KE, V]), omega=np.asarray(OMEGA),
        omega_cov=None, transform=("log", "log"),
    )
    res = vpc(_model(), data, _prop(), wrong, n_rep=300, seed=1)
    assert res.coverage() < 0.5, res.summary()


def test_vpc_nonparametric_population_runs():
    data = _population(n=12)
    pop = SimpleNamespace(
        support=np.asarray([[KE * 0.8, V], [KE * 1.25, V]]),
        weights=np.asarray([0.5, 0.5]),
    )
    res = vpc(_model(), data, _prop(), pop, n_rep=200, seed=0, bins=3)
    assert len(res.bin_times) <= 3 or len(res.bin_times) == 5
    assert np.all(res.n_obs > 0)
    assert np.isfinite(res.predicted).all()


def test_npde_correct_model_is_standard_normal():
    data = _population()
    res = npde(_model(), data, _prop(), _truth(), n_rep=1000, seed=2)
    assert len(res.npde) == 24 * 5
    assert len(res.subject_ids) == len(res.npde)
    assert abs(res.z_mean) < 3.0, res.summary()
    assert abs(res.z_var) < 3.5, res.summary()
    assert "NPDE" in res.summary()


def test_npde_wrong_model_rejects():
    data = _population()
    wrong = SimpleNamespace(
        theta=np.asarray([2.0 * KE, V]), omega=np.asarray(OMEGA),
        omega_cov=None, transform=("log", "log"),
    )
    res = npde(_model(), data, _prop(), wrong, n_rep=500, seed=2)
    assert abs(res.z_mean) > 4.0, res.summary()


def test_diagnostics_validation():
    data = _population(n=4)
    with pytest.raises(PharmsolError, match="n_rep"):
        vpc(_model(), data, _prop(), _truth(), n_rep=5)
    with pytest.raises(PharmsolError, match="ci"):
        vpc(_model(), data, _prop(), _truth(), ci=1.5)
    with pytest.raises(PharmsolError, match="outeq"):
        vpc(_model(), data, _prop(), _truth(), outeq=3, n_rep=20)
    with pytest.raises(PharmsolError, match="n_rep"):
        npde(_model(), data, _prop(), _truth(), n_rep=10)
    with pytest.raises(PharmsolError, match="population"):
        vpc(_model(), data, _prop(), object(), n_rep=20)


@pytest.mark.slow
def test_gof_correct_model_cwres_standard_normal():
    """CWRES from a Laplace fit of the true model ~ N(0, 1); shrinkage
    is small under this rich design; IPRED beats PRED."""
    from pharmsol_tpu.optimize import fit_laplace, gof

    data = _population(n=20, seed=3)
    lap = fit_laplace(_model(), data, _prop(0.2), [0.35, 9.0])
    g = gof(_model(), data, _prop(0.2), lap)
    assert len(g.observed) == 20 * 5
    assert abs(np.mean(g.cwres)) < 0.3, g.summary()
    assert 0.5 < np.var(g.cwres, ddof=1) < 1.7, g.summary()
    # rich design: eta-shrinkage near zero
    assert np.all(np.abs(g.eta_shrinkage) < 0.25), g.summary()
    rmse_pred = np.sqrt(np.mean((g.observed - g.pred) ** 2))
    rmse_ipred = np.sqrt(np.mean((g.observed - g.ipred) ** 2))
    assert rmse_ipred < rmse_pred
    # the fitted sigma (not the passed-in starting value) weights iwres
    assert 0.5 < np.std(g.iwres, ddof=1) < 1.5
    assert "eta-shrinkage" in g.summary()
    # eta deviations reproduce the individual estimates exactly
    back = np.exp(np.log(lap.theta)[None, :] + g.eta)
    assert np.allclose(back, lap.individual_parameters, rtol=1e-8)


@pytest.mark.slow
def test_gof_covariate_effects_enter_pred():
    """With a fitted covariate model, PRED varies between subjects of
    different weight while eta stays the covariate-adjusted residual."""
    from test_covariate_effects import _population as _cov_population
    from pharmsol_tpu.optimize import fit_laplace, gof

    data, truth = _cov_population(n=20, seed=5)
    lap = fit_laplace(_model(), data, _prop(0.2), [0.3, 9.0],
                      covariate_effects=[(0, "wt", "power", 70.0)])
    g = gof(_model(), data, _prop(0.2), lap)
    # PRED at the first observation time differs across weights
    first = g.time == 0.5
    assert np.std(g.pred[first]) > 0.05
    assert abs(np.mean(g.cwres)) < 0.35, g.summary()
    assert 0.4 < np.var(g.cwres, ddof=1) < 1.8, g.summary()


@pytest.mark.slow
def test_gof_nonparametric_moment_matched():
    from pharmsol_tpu import AssayErrorModel, AssayErrorModels, ErrorPoly
    from pharmsol_tpu.optimize import fit_population, gof

    data = _population(n=20, seed=3)
    ems = AssayErrorModels().add(
        0, AssayErrorModel.proportional(ErrorPoly(0.05, 0.1), 2.0)
    )
    pop = fit_population(_model(), data, ems, [(0.05, 0.8), (5.0, 20.0)])
    g = gof(_model(), data, _prop(0.2), pop)
    assert abs(np.mean(g.cwres)) < 0.5
    rmse_pred = np.sqrt(np.mean((g.observed - g.pred) ** 2))
    rmse_ipred = np.sqrt(np.mean((g.observed - g.ipred) ** 2))
    assert rmse_ipred < rmse_pred


def test_gof_validates_population():
    from pharmsol_tpu.optimize import gof

    data = _population(n=4, seed=2)
    with pytest.raises(PharmsolError, match="fit result"):
        gof(_model(), data, _prop(), SimpleNamespace(theta=None, support=None))


@pytest.mark.slow
def test_npde_covariate_effects_shift_replicates():
    """Replicate simulation applies typical-value covariate shifts.

    Data generated with a strong ke~wt power effect: simulating from the
    TRUE (theta, omega, beta) population is calibrated, while the same
    marginals with beta dropped put the wrong means on the wrong
    subjects and the pooled npde variance blows up.
    """
    from test_covariate_effects import _population as _cov_population

    data, _ = _cov_population(n=24, seed=3, beta_true=0.75)
    pop = SimpleNamespace(
        theta=np.asarray([KE, V]),
        omega=np.asarray([0.12, 0.15]),
        omega_cov=None,
        transform=("log", "log"),
        beta=np.asarray([0.75]),
        covariate_effects=((0, "wt", "power", 70.0),),
    )
    res = npde(_model(), data, _prop(0.06), pop, n_rep=400, seed=1)
    assert abs(res.z_mean) < 3.0, res.summary()
    assert abs(res.z_var) < 3.5, res.summary()

    pop0 = SimpleNamespace(**{**pop.__dict__, "beta": None})
    res0 = npde(_model(), data, _prop(0.06), pop0, n_rep=400, seed=1)
    assert res0.z_var > 3.5, res0.summary()

    # beta without the specs cannot reconstruct the design
    bad = SimpleNamespace(**{**pop.__dict__, "covariate_effects": None})
    with pytest.raises(PharmsolError, match="covariate_effects"):
        npde(_model(), data, _prop(0.06), bad, n_rep=100, seed=1)
