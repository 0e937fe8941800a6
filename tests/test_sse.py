"""Simulation–re-estimation study driver (optimize/sse.py).

PsN-sse-style workflow with no reference counterpart (the reference
leaves study-level loops to external drivers, SURVEY §3.2): simulate
replicates from a fitted population on the observed design, refit each,
summarize bias / RMSE / CI coverage vs the generating truth.
"""

import math
from collections import namedtuple

import numpy as np
import pytest

import pharmsol_tpu as pst
from pharmsol_tpu import (
    Analytical,
    AssayErrorModel,
    AssayErrorModels,
    Data,
    ErrorPoly,
    Subject,
)
from pharmsol_tpu.data.residual_error import ResidualErrorModel, ResidualErrorModels
from pharmsol_tpu.errors import PharmsolError
from pharmsol_tpu.optimize import fit_map, sse
from pharmsol_tpu.optimize.sse import _replicate_subjects

TRUE = np.array([1.2, 0.25, 12.0])


def _conc(t):
    ka, ke, v = TRUE
    return 100.0 * ka / (ka - ke) * (math.exp(-ke * t) - math.exp(-ka * t)) / v


def _design(n=10):
    subjects = []
    for i in range(n):
        b = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
        for t in (0.5, 1.0, 2.0, 4.0, 8.0, 12.0):
            b = b.observation(float(t), _conc(t), 0)
        subjects.append(b.build())
    return Data(subjects)


def _model():
    return Analytical(
        pst.one_compartment_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    )


_Pop = namedtuple("_Pop", ["theta", "omega", "transform"])


def test_replicate_walk_round_trips_original_values():
    # feeding the ORIGINAL lowered obs values through the replicate walk
    # must reproduce every observation exactly — multi-occasion, missing
    # obs, and infusion events included
    from pharmsol_tpu.optimize._condll import build_cond_ll

    s1 = (Subject.builder("a").bolus(0.0, 50.0, 0)
          .observation(1.0, 3.5, 0).observation(2.0, 2.5, 0)
          .missing_observation(3.0, 0)
          .reset().infusion(0.0, 80.0, 0, 2.0)
          .observation(1.0, 4.5, 0).observation(4.0, 1.5, 0)
          .build())
    s2 = (Subject.builder("b").bolus(0.0, 100.0, 0)
          .observation(0.5, 7.0, 0).observation(6.0, 0.7, 0)
          .build())
    data = Data([s1, s2])
    rems = ResidualErrorModels().add(0, ResidualErrorModel.proportional(0.1))
    cond = build_cond_ll(_model(), data, rems)

    rebuilt = _replicate_subjects(
        cond.subjects, np.asarray(cond.obs_value), np.asarray(cond.active)
    )
    got = [
        (s.id, occ.index, e.time, e.value)
        for s in rebuilt for occ in s.occasions()
        for e in occ.observations()
    ]
    want = [
        (s.id, occ.index, e.time, e.value)
        for s in data.subjects() for occ in s.occasions()
        for e in occ.observations()
    ]
    assert got == want
    # and the rebuilt Data lowers to the identical obs grid
    cond2 = build_cond_ll(_model(), Data(rebuilt), rems)
    np.testing.assert_array_equal(
        np.asarray(cond2.obs_value), np.asarray(cond.obs_value)
    )
    np.testing.assert_array_equal(
        np.asarray(cond2.active), np.asarray(cond.active)
    )


@pytest.mark.slow
def test_sse_recovers_generating_truth_with_honest_coverage():
    data = _design()
    model = _model()
    rems = ResidualErrorModels().add(0, ResidualErrorModel.proportional(0.03))
    ems = AssayErrorModels().add(
        0, AssayErrorModel.proportional(ErrorPoly(0.0, 0.03), 1.0)
    )
    pop = _Pop(theta=TRUE, omega=np.array([1e-6] * 3),
               transform=("log", "log", "log"))
    r = sse(
        model, data, rems, pop,
        lambda d: fit_map(model, d, ems, [0.9, 0.35, 9.0]),
        n_sim=16, seed=1,
    )
    assert r.n_ok == 16 and r.n_failed == 0
    rb = r.relative_bias()["theta"]
    assert np.all(np.abs(rb) < 0.02), rb
    # replicate scatter ~ matches per-replicate Wald SEs (calibration)
    cov = r.coverage()
    assert cov is not None and np.all(cov >= 0.5)
    # rmse ~ sd when bias ~ 0
    np.testing.assert_allclose(
        r.rmse()["theta"], r.se()["theta"], rtol=0.25
    )
    assert "relbias" in r.summary()


def test_sse_rejects_censored_and_bad_args():
    from pharmsol_tpu.data.event import Censor

    s = (Subject.builder("c").bolus(0.0, 50.0, 0)
         .censored_observation(1.0, 0.1, 0, Censor.BLOQ)
         .observation(2.0, 1.0, 0).build())
    rems = ResidualErrorModels().add(0, ResidualErrorModel.proportional(0.1))
    pop = _Pop(theta=TRUE, omega=np.array([0.1] * 3),
               transform=("log", "log", "log"))
    with pytest.raises(PharmsolError, match="censored"):
        sse(_model(), Data([s]), rems, pop, lambda d: None, n_sim=2)
    with pytest.raises(PharmsolError, match="n_sim"):
        sse(_model(), _design(2), rems, pop, lambda d: None, n_sim=1)
    with pytest.raises(PharmsolError, match="on_error"):
        sse(_model(), _design(2), rems, pop, lambda d: None, n_sim=2,
            on_error="bogus")


@pytest.mark.slow
def test_sse_laplace_vectorized_refits_recover_population():
    # device-vectorized SSE: one vmapped scan-L-BFGS program refits every
    # simulated replicate through the y-parameterized Laplace objective
    from pharmsol_tpu.optimize.sse import sse_laplace

    rng = np.random.default_rng(3)
    KE, V, OM, SIG = 0.25, 10.0, 0.25, 0.08
    subjects = []
    for i in range(10):
        ke = KE * np.exp(OM * rng.standard_normal())
        v = V * np.exp(0.15 * rng.standard_normal())
        b = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
        for t in (0.5, 2.0, 6.0, 12.0, 24.0):
            c = 100.0 / v * np.exp(-ke * t)
            b = b.observation(
                float(t), float(c * (1 + SIG * rng.standard_normal())), 0
            )
        subjects.append(b.build())
    data = Data(subjects)
    model = Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )
    rems = ResidualErrorModels().add(0, ResidualErrorModel.proportional(SIG))
    r = sse_laplace(model, data, rems, [0.4, 8.0], n_sim=8, seed=5,
                    refit_iters=20, max_iters=40)
    assert r.n_ok == 8 and r.n_failed == 0
    # replicate refits recover the GENERATING (full-fit) theta closely;
    # omega replicates carry the well-known small-sample ML downward
    # bias, so only bound it loosely
    rb = r.relative_bias()
    assert np.all(np.abs(rb["theta"]) < 0.10), rb
    assert np.all(np.abs(rb["omega"]) < 0.50), rb
    assert set(r.samples) >= {"theta", "omega"}
    assert "relbias" in r.summary()


@pytest.mark.slow
def test_sse_laplace_covariate_effects():
    # the replicate simulator applies the fitted typical-value covariate
    # shifts and every vectorized refit re-estimates beta
    from test_covariate_effects import _population as _cov_population
    from pharmsol_tpu.optimize.sse import sse_laplace

    data, _ = _cov_population(n=16, seed=7, beta_true=0.75)
    model = Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )
    rems = ResidualErrorModels().add(0, ResidualErrorModel.proportional(0.06))
    r = sse_laplace(model, data, rems, [0.4, 8.0], n_sim=6, seed=2,
                    refit_iters=25, max_iters=60,
                    covariate_effects=[(0, "wt", "power", 70.0)])
    assert r.n_failed == 0 and "beta" in r.samples
    rb = r.relative_bias()
    assert np.all(np.abs(rb["theta"]) < 0.15), rb
    assert np.all(np.abs(rb["beta"]) < 0.25), rb
