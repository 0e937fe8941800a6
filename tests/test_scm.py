"""Stepwise covariate model building (optimize/scm.py).

PsN-scm-style forward-inclusion / backward-elimination over
NONMEM-style covariate effects, scored by 1-dof likelihood-ratio tests
between nested Laplace fits. Oracle: a population generated with a real
ke~wt effect plus a pure-noise covariate — the search must retain the
real effect and reject the noise one; the LRT bookkeeping must match
the underlying fit log-likelihoods exactly.
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
from pharmsol_tpu.optimize import scm
from pharmsol_tpu.optimize.scm import _lrt_pvalue_1dof

KE, V = 0.25, 10.0


def _model():
    return Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )


def _prop(b=0.06):
    return ResidualErrorModels().add(0, ResidualErrorModel.proportional(b))


def _population(n=20, seed=11, beta_true=0.9):
    """ke carries a strong wt power effect; 'junk' is pure noise."""
    rng = np.random.default_rng(seed)
    subjects = []
    for i in range(n):
        wt = float(rng.uniform(45.0, 110.0))
        junk = float(rng.uniform(0.5, 2.0))
        ke = KE * np.exp(beta_true * np.log(wt / 70.0)
                         + 0.10 * rng.standard_normal())
        v = V * np.exp(0.15 * rng.standard_normal())
        sb = (Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
              .covariate("wt", 0.0, wt).covariate("junk", 0.0, junk))
        for t in (0.5, 2.0, 6.0, 12.0, 24.0):
            c = 100.0 * np.exp(-ke * t) / v
            sb = sb.observation(
                float(t), float(c * (1 + 0.06 * rng.standard_normal())), 0
            )
        subjects.append(sb.build())
    return Data(subjects)


def test_lrt_pvalue_1dof():
    # chi2_1 tail via the normal CDF: quantiles from published tables
    assert _lrt_pvalue_1dof(3.841) == pytest.approx(0.05, abs=2e-4)
    assert _lrt_pvalue_1dof(6.635) == pytest.approx(0.01, abs=2e-4)
    assert _lrt_pvalue_1dof(0.0) == 1.0
    assert _lrt_pvalue_1dof(float("nan")) == 1.0
    assert _lrt_pvalue_1dof(-3.0) == 1.0


@pytest.mark.slow
def test_scm_selects_real_effect_rejects_noise():
    data = _population()
    cands = [(0, "wt", "power", 70.0), (0, "junk", "power", 1.0)]
    res = scm(_model(), data, _prop(), [0.3, 9.0], cands,
              compute_se=False)
    assert res.effects == ((0, "wt", "power", 70.0),), res.summary()
    # step log is consistent: one add, LRT matches the fit LLs
    adds = [s for s in res.steps if s.action == "add"]
    assert len(adds) == 1 and adds[0].effect == cands[0]
    assert adds[0].lrt == pytest.approx(
        2.0 * (adds[0].log_likelihood - res.base_log_likelihood), abs=1e-9
    )
    assert adds[0].p_value < 0.05
    # the final fit carries the fitted beta for the retained effect
    assert res.final.beta is not None and res.final.beta.shape == (1,)
    assert abs(res.final.beta[0] - 0.9) < 0.35
    # every candidate evaluation was recorded; junk was tried and failed
    junk_trials = [t for t in res.trials if t["effect"] == cands[1]]
    assert junk_trials and all(t["p_value"] > 0.01 for t in junk_trials)
    # cache: base fit + 2 forward fits round 1 + 1 forward fit round 2;
    # backward reuses cached fits, so no more than 5 distinct fits
    assert res.n_fits <= 5
    assert "retained" in res.summary()


@pytest.mark.slow
def test_scm_backward_elimination_drops_weak_effect():
    # loose forward alpha lets the noise covariate in; the stricter
    # backward alpha must remove it again
    data = _population(seed=4)
    cands = [(0, "wt", "power", 70.0), (0, "junk", "power", 1.0)]
    res = scm(_model(), data, _prop(), [0.3, 9.0], cands,
              forward_alpha=0.9999, backward_alpha=0.01,
              compute_se=False)
    assert (0, "wt", "power", 70.0) in res.effects
    assert (0, "junk", "power", 1.0) not in res.effects
    removes = [s for s in res.steps if s.action == "remove"]
    assert any(s.effect == cands[1] for s in removes)


def test_scm_validation():
    data = _population(n=4, seed=2)
    m, r = _model(), _prop()
    with pytest.raises(PharmsolError, match="at least one candidate"):
        scm(m, data, r, [0.3, 9.0], [])
    with pytest.raises(PharmsolError, match="duplicate"):
        scm(m, data, r, [0.3, 9.0],
            [(0, "wt", "power"), (0, "wt", "power")])
    with pytest.raises(PharmsolError, match="alphas"):
        scm(m, data, r, [0.3, 9.0], [(0, "wt", "power")], forward_alpha=1.5)
    with pytest.raises(PharmsolError, match="on_error"):
        scm(m, data, r, [0.3, 9.0], [(0, "wt", "power")], on_error="bogus")
