"""Profile-likelihood confidence intervals (optimize/profile.py).

PsN-llp-style profiling around the Laplace fit: every (parameter, grid
point) pinned-coordinate re-optimization runs as one vmapped program.
Oracles: on a well-identified 1-cmt problem the profile CI agrees with
the Wald CI (locally quadratic likelihood); the deviance trace is ~0 at
the estimate and grows outward; bounds bracket the estimate.
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
from pharmsol_tpu.optimize import llp

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
def test_llp_matches_wald_on_quadratic_problem():
    data = _population()
    res = llp(_model(), data, _prop(), [0.4, 8.0],
              parameters=["p[0]", "omega[p[0]]"],
              compute_se=False)
    pk = res.parameters["p[0]"]
    assert pk.bracketed, res.summary()
    assert pk.lower < pk.estimate < pk.upper
    # typical values of a clean 1-cmt fit are near-quadratic in psi:
    # profile and Wald bounds agree to ~15%
    assert pk.lower == pytest.approx(pk.wald_lower, rel=0.15)
    assert pk.upper == pytest.approx(pk.wald_upper, rel=0.15)
    # deviance is ~0 at the estimate and increases outward on each side
    mid = np.argmin(pk.deviance)
    assert pk.deviance[mid] == pytest.approx(0.0, abs=1e-6)
    assert pk.deviance[0] > 1.0 and pk.deviance[-1] > 1.0

    pw = res.parameters["omega[p[0]]"]
    assert pw.lower > 0 and pw.lower < pw.estimate
    # omega profiles are right-skewed: upper reaches at least the Wald
    # bound (profile >= Wald is the classic variance-component pattern)
    if pw.bracketed:
        assert pw.upper >= pw.wald_upper * 0.9
    assert "Profile likelihood" in res.summary()


def test_llp_validation():
    data = _population(n=4, seed=2)
    with pytest.raises(PharmsolError, match="level"):
        llp(_model(), data, _prop(), [0.4, 8.0], level=1.5)
    with pytest.raises(PharmsolError, match="n_grid"):
        llp(_model(), data, _prop(), [0.4, 8.0], n_grid=1)
    with pytest.raises(PharmsolError, match="max_width"):
        llp(_model(), data, _prop(), [0.4, 8.0], max_width=-1.0)


@pytest.mark.slow
def test_llp_unknown_parameter_and_sigma_coord():
    data = _population(n=8, seed=5)
    with pytest.raises(PharmsolError, match="unknown profile parameter"):
        llp(_model(), data, _prop(), [0.4, 8.0], parameters=["nope"],
            compute_se=False)
    # sigma coordinate profiles too (est_sigma default True -> 1 slot)
    res = llp(_model(), data, _prop(), [0.4, 8.0],
              parameters=["sigma[0]"], n_grid=6, compute_se=False)
    ps = res.parameters["sigma[0]"]
    assert ps.estimate > 0
    assert np.all(ps.deviance >= -1e-6)
