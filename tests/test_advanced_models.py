"""Advanced model features: multi-output, per-outeq error models,
parameter-dependent lag in the population path, seq-eq with prepared-path
exclusion."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import pharmsol_tpu as pst
from pharmsol_tpu import (
    Analytical,
    AssayErrorModel,
    AssayErrorModels,
    Data,
    ErrorPoly,
    ODE,
    Subject,
)
from pharmsol_tpu.likelihood.matrix import log_likelihood_matrix


def test_multi_output_model():
    """Parent + metabolite outputs with different error models."""
    def diffeq(x, p, t, b, rateiv, cov):
        ke, km = p[0], p[1]
        return jnp.stack([-ke * x[0] + b[0], ke * x[0] - km * x[1]])

    model = ODE(
        diffeq,
        out=lambda x, p, t, cov: jnp.stack([x[0] / p[2], x[1] / p[3]]),
        nstates=2, ndrugs=1, nout=2,
    ).with_tolerances(1e-10, 1e-10)

    b = Subject.builder("s").bolus(0.0, 100.0, 0)
    for t in (1.0, 4.0):
        b = b.observation(t, 5.0, 0).observation(t, 2.0, 1)
    subject = b.build()

    preds = model.estimate_predictions(subject, [0.3, 0.1, 10.0, 20.0])
    by_outeq = {}
    for p_ in preds.predictions():
        by_outeq.setdefault(p_.outeq, []).append(p_.prediction)
    assert len(by_outeq[0]) == 2 and len(by_outeq[1]) == 2
    # parent: simple decay / v
    np.testing.assert_allclose(
        by_outeq[0][0], 100 * math.exp(-0.3) / 10.0, rtol=1e-7
    )
    # metabolite: ke/(km-ke)... standard two-exponential
    ke, km = 0.3, 0.1
    met = 100 * ke / (ke - km) * (math.exp(-km * 1.0) - math.exp(-ke * 1.0)) / 20.0
    np.testing.assert_allclose(by_outeq[1][0], met, rtol=1e-6)

    ems = (
        AssayErrorModels()
        .add(0, AssayErrorModel.additive(ErrorPoly(0.3, 0.1), 1.0))
        .add(1, AssayErrorModel.proportional(ErrorPoly(0.2, 0.15), 1.5))
    )
    ll = model.estimate_log_likelihood(subject, [0.3, 0.1, 10.0, 20.0], ems)
    # manual recomputation
    total = 0.0
    for p_ in preds.predictions():
        if p_.outeq == 0:
            s = math.sqrt((0.3 + 0.1 * p_.observation) ** 2 + 1.0)
        else:
            s = 1.5 * (0.2 + 0.15 * p_.observation)
        z = (p_.observation - p_.prediction) / s
        total += -0.5 * math.log(2 * math.pi) - math.log(s) - 0.5 * z * z
    np.testing.assert_allclose(ll, total, rtol=1e-10)


@pytest.mark.slow
def test_parameter_dependent_lag_in_psi_matrix():
    """The segment grid depends on the support point when lag is a parameter;
    every psi cell must equal the per-subject log-likelihood."""
    model = Analytical(
        pst.one_compartment,
        lag=lambda p, t, cov: {0: p[1]},
        out=lambda x, p, t, cov: x[:1],
        nstates=1, ndrugs=1, nout=1,
    )
    subjects = []
    for i in range(3):
        b = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
        for t in (1.0, 2.0, 4.0):
            b = b.observation(t, 60 * math.exp(-0.25 * t) + 0.1 * i, 0)
        subjects.append(b.build())
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    support = np.array([[0.2, 0.0], [0.2, 0.5], [0.3, 0.9]])  # lag varies
    psi = log_likelihood_matrix(model, Data(subjects), support, ems)
    for i, s in enumerate(subjects):
        for j in range(3):
            want = model.estimate_log_likelihood(s, support[j], ems)
            np.testing.assert_allclose(psi[i, j], want, rtol=1e-12)
    # and lag actually matters: columns with different lag differ
    assert not np.allclose(psi[:, 0], psi[:, 1])


def test_seq_eq_disables_prepared_path():
    """Models with secondary equations must not use the hoisted kernel
    preparation (parameters change across segments)."""
    def seq(p, t, cov):
        return p.at[0].set(p[0] * 1.1)

    model = Analytical(
        pst.one_compartment,
        seq_eq=seq,
        out=lambda x, p, t, cov: x[:1],
        nstates=1, ndrugs=1, nout=1,
    )
    assert model.spec.prepare is None  # prepared path must be off
    subject = (
        Subject.builder("s").bolus(0.0, 100.0, 0)
        .observation(1.0, 0.0, 0).observation(2.0, 0.0, 0).build()
    )
    got = model.estimate_predictions(subject, [0.2]).flat_predictions()
    # spans: bolus@0->obs@1 (ke=0.22), obs@1->obs@2 (ke reset then *1.1 = 0.22)
    want1 = 100 * math.exp(-0.22)
    want2 = want1 * math.exp(-0.22)
    np.testing.assert_allclose(got, [want1, want2], rtol=1e-12)


def test_fa_per_support_point_in_psi():
    model = Analytical(
        pst.one_compartment,
        fa=lambda p, t, cov: {0: p[1]},
        out=lambda x, p, t, cov: x[:1],
        nstates=1, ndrugs=1, nout=1,
    )
    s = Subject.builder("s").bolus(0, 100, 0).observation(1.0, 30.0, 0).build()
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    support = np.array([[0.2, 1.0], [0.2, 0.5]])
    psi = log_likelihood_matrix(model, Data([s]), support, ems)
    for j in range(2):
        want = model.estimate_log_likelihood(s, support[j], ems)
        np.testing.assert_allclose(psi[0, j], want, rtol=1e-12)
    assert psi[0, 0] != psi[0, 1]


def test_missing_error_model_raises():
    """Observed outputs without an assay error model must fail
    (error_model.rs NoneErrorModel parity)."""
    import pytest
    from pharmsol_tpu.errors import PharmsolError

    model = Analytical(
        pst.one_compartment, out=lambda x, p, t, cov: x[:1], nstates=1, ndrugs=1, nout=1
    )
    s = Subject.builder("s").bolus(0, 100, 0).observation(1.0, 5.0, 0).build()
    with pytest.raises(PharmsolError, match="error model"):
        model.estimate_log_likelihood(s, [0.2], AssayErrorModels())
    # missing observations (no value) are fine without a model
    s2 = Subject.builder("s2").bolus(0, 100, 0).missing_observation(1.0, 0).build()
    ll = model.estimate_log_likelihood(s2, [0.2], AssayErrorModels())
    assert ll == 0.0


@pytest.mark.slow
def test_censoring_and_errorpoly_override_in_psi():
    """BLOQ/ALOQ censored observations and per-observation errorpoly
    overrides must flow through the fused psi scan identically to the
    prediction-path likelihood."""
    from pharmsol_tpu import Censor

    model = Analytical(
        pst.one_compartment, out=lambda x, p, t, cov: x[:1], nstates=1, ndrugs=1, nout=1
    )
    s = (
        Subject.builder("cens")
        .bolus(0.0, 100.0, 0)
        .observation(1.0, 60.0, 0)
        .censored_observation(6.0, 5.0, 0, Censor.BLOQ)
        .censored_observation(0.5, 90.0, 0, Censor.ALOQ)
        .observation_with_error(2.0, 40.0, 0, (1.0, 0.0, 0.0, 0.0), Censor.NONE)
        .build()
    )
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    support = np.array([[0.2], [0.35]])
    psi = log_likelihood_matrix(model, Data([s]), support, ems)
    import math

    from pharmsol_tpu.likelihood.distributions import LOG_2PI
    from scipy.stats import norm

    for j, ke in enumerate((0.2, 0.35)):
        total = 0.0
        for t, obs, cens, poly in (
            (1.0, 60.0, "none", None),
            (6.0, 5.0, "bloq", None),
            (0.5, 90.0, "aloq", None),
            (2.0, 40.0, "none", (1.0, 0.0, 0.0, 0.0)),
        ):
            pred = 100.0 * math.exp(-ke * t)
            if poly is None:
                a = 0.5 + 0.1 * obs
            else:
                a = poly[0]
            sig = math.sqrt(a * a + 1.0)
            z = (obs - pred) / sig
            if cens == "none":
                total += -0.5 * LOG_2PI - math.log(sig) - 0.5 * z * z
            elif cens == "bloq":
                total += norm.logcdf(z)
            else:
                total += norm.logsf(z)
        np.testing.assert_allclose(psi[0, j], total, rtol=1e-9)
