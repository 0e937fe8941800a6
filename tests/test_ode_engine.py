"""ODE engine: cross-engine parity with analytical solutions.

Mirrors the reference's numerical-stability strategy
(tests/numerical_stability.rs): the analytical closed forms are the oracle
for the ODE integrators on the same model. The reference gates at 1e-2
relative with default tolerances; here we additionally check tight
tolerances reach 1e-6.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import pharmsol_tpu as pst
from pharmsol_tpu import ODE, Analytical, Subject


def oral_subject():
    b = Subject.builder("s").bolus(0.0, 100.0, 0)
    for t in (0.5, 1.0, 2.0, 4.0, 8.0, 12.0):
        b = b.observation(t, 0.0, 0)
    return b.build()


def infusion_subject():
    b = (
        Subject.builder("s")
        .bolus(0.0, 100.0, 0)
        .infusion(24.0, 150.0, 0, 3.0)
    )
    for t in (1.0, 2.0, 4.0, 8.0, 12.0, 24.0, 25.0, 26.0, 27.0, 28.0, 32.0, 36.0):
        b = b.missing_observation(t, 0)
    return b.build()


@pytest.mark.parametrize("solver,rtol_req", [("dopri5", 1e-6), ("kvaerno3", 1e-4), ("kvaerno5", 1e-5)])
def test_one_compartment_iv_matches_analytical(solver, rtol_req):
    ode = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([-p[0] * x[0] + rateiv[0] + b[0]]),
        out=lambda x, p, t, cov: x[:1] / p[1],
        nstates=1,
        ndrugs=1,
        nout=1,
    ).with_solver(solver).with_tolerances(1e-8, 1e-8)
    analytical = Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[:1] / p[1],
        nstates=1,
        ndrugs=1,
        nout=1,
    )
    subject = infusion_subject()
    got = ode.estimate_predictions(subject, [0.1, 1.0]).flat_predictions()
    want = analytical.estimate_predictions(subject, [0.1, 1.0]).flat_predictions()
    np.testing.assert_allclose(got, want, rtol=rtol_req, atol=1e-10)


def test_two_compartment_oral_matches_analytical():
    def diffeq(x, p, t, b, rateiv, cov):
        ke, ka, kcp, kpc = p[0], p[1], p[2], p[3]
        return jnp.stack(
            [
                -ka * x[0] + b[0],
                ka * x[0] - (ke + kcp) * x[1] + kpc * x[2] + rateiv[0],
                kcp * x[1] - kpc * x[2],
            ]
        )

    ode = ODE(
        diffeq,
        out=lambda x, p, t, cov: x[1:2],
        nstates=3,
        ndrugs=1,
        nout=1,
    ).with_tolerances(1e-10, 1e-10)
    analytical = Analytical(
        pst.two_compartments_with_absorption,
        out=lambda x, p, t, cov: x[1:2],
        nstates=3,
        ndrugs=1,
        nout=1,
    )
    p = [0.15, 1.2, 0.3, 0.2]
    subject = infusion_subject()
    got = ode.estimate_predictions(subject, p).flat_predictions()
    want = analytical.estimate_predictions(subject, p).flat_predictions()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)


@pytest.mark.slow
def test_three_compartment_matches_analytical():
    def diffeq(x, p, t, b, rateiv, cov):
        k10, k12, k13, k21, k31 = p[0], p[1], p[2], p[3], p[4]
        return jnp.stack(
            [
                -(k10 + k12 + k13) * x[0] + k21 * x[1] + k31 * x[2] + rateiv[0] + b[0],
                k12 * x[0] - k21 * x[1],
                k13 * x[0] - k31 * x[2],
            ]
        )

    ode = ODE(
        diffeq, out=lambda x, p, t, cov: x[:1], nstates=3, ndrugs=1, nout=1
    ).with_tolerances(1e-10, 1e-10)
    analytical = Analytical(
        pst.three_compartments, out=lambda x, p, t, cov: x[:1], nstates=3, ndrugs=1, nout=1
    )
    p = [0.3, 0.2, 0.1, 0.15, 0.05]
    subject = infusion_subject()
    got = ode.estimate_predictions(subject, p).flat_predictions()
    want = analytical.estimate_predictions(subject, p).flat_predictions()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)


def test_stiff_problem_kvaerno():
    # Stiff linear system: fast/slow decay spanning 5 orders of magnitude.
    def diffeq(x, p, t, b, rateiv, cov):
        return jnp.stack([-1e4 * x[0] + b[0], x[0] * 1e4 - 0.1 * x[1]])

    subject = (
        Subject.builder("s")
        .bolus(0.0, 1.0, 0)
        .observation(0.5, 0.0, 1)
        .observation(5.0, 0.0, 1)
        .build()
    )
    ode = ODE(
        diffeq, out=lambda x, p, t, cov: x, nstates=2, ndrugs=1, nout=2
    ).with_solver("kvaerno5").with_tolerances(1e-8, 1e-10)
    got = ode.estimate_predictions(subject, [0.0]).flat_predictions()
    # exact: x1(t) = kf/(kf-ks) (e^{-ks t} - e^{-kf t}), kf=1e4, ks=0.1
    kf, ks = 1e4, 0.1
    want = [
        kf / (kf - ks) * (math.exp(-ks * t) - math.exp(-kf * t)) for t in (0.5, 5.0)
    ]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_bolus_rhs_difference_scaling():
    # User RHS maps half of the bolus into state 0: the RHS-difference trick
    # must honor it (ode/mod.rs:644-687 semantics).
    ode = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([0.5 * b[0] - p[0] * x[0]]),
        out=lambda x, p, t, cov: x[:1],
        nstates=1,
        ndrugs=1,
        nout=1,
    ).with_tolerances(1e-10, 1e-10)
    subject = Subject.builder("s").bolus(0.0, 100.0, 0).observation(1.0, 0.0, 0).build()
    got = ode.estimate_predictions(subject, [0.2]).flat_predictions()
    np.testing.assert_allclose(got, [50.0 * math.exp(-0.2)], rtol=1e-8)


def test_ode_lag_and_fa():
    ode = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([-p[0] * x[0] + b[0]]),
        lag=lambda p, t, cov: {0: p[1]},
        fa=lambda p, t, cov: {0: p[2]},
        out=lambda x, p, t, cov: x[:1],
        nstates=1,
        ndrugs=1,
        nout=1,
    ).with_tolerances(1e-10, 1e-10)
    subject = Subject.builder("s").bolus(0.0, 100.0, 0).observation(3.0, 0.0, 0).build()
    ke, tlag, f = 0.2, 0.7, 0.5
    got = ode.estimate_predictions(subject, [ke, tlag, f]).flat_predictions()
    want = [100.0 * f * math.exp(-ke * (3.0 - tlag))]
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_multi_input_lag_fa_closed_form_oracle():
    # two bolus inputs with DIFFERENT per-input lags and fa: a linear
    # 3-state system, so the exact solution is the superposition of two
    # lag-shifted fa-scaled first-order absorption curves
    # (structs.rs:611-666 lag/fa semantics, applied per input)
    ode = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0],
            -p[1] * x[1] + b[1],
            p[0] * x[0] + p[1] * x[1] - p[2] * x[2],
        ]),
        lag=lambda p, t, cov: {0: p[4], 1: p[5]},
        fa=lambda p, t, cov: {0: p[6], 1: 0.85},
        out=lambda x, p, t, cov: x[2:3] / p[3],
        nstates=3, ndrugs=2, nout=1,
    ).with_tolerances(1e-10, 1e-10)
    subject = (Subject.builder("s").bolus(0.0, 100.0, 0).bolus(0.3, 60.0, 1)
               .observation(2.0, 0.0, 0).observation(5.0, 0.0, 0).build())
    ka1, ka2, ke, V, lag0, lag1, fa0 = 1.0, 2.0, 0.25, 50.0, 0.6, 0.4, 0.8
    got = ode.estimate_predictions(
        subject, [ka1, ka2, ke, V, lag0, lag1, fa0]
    ).flat_predictions()

    def depot(dose, ka, t):
        return dose * ka / (ka - ke) * (
            math.exp(-ke * t) - math.exp(-ka * t))

    def conc(t):
        c = 0.0
        if t > lag0:
            c += depot(100.0 * fa0, ka1, t - lag0)
        if t > 0.3 + lag1:
            c += depot(60.0 * 0.85, ka2, t - 0.3 - lag1)
        return c / V

    np.testing.assert_allclose(got, [conc(2.0), conc(5.0)], rtol=1e-6)


def test_time_varying_covariate_in_rhs():
    # RHS reads a linearly interpolated covariate: dx/dt = -wt(t)*k*x.
    # With wt(t) = 1 + t on [0, 2], integral of wt over [0,2] = 4.
    ode = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([-p[0] * cov("wt", t) * x[0] + b[0]]),
        out=lambda x, p, t, cov: x[:1],
        nstates=1,
        ndrugs=1,
        nout=1,
    ).with_tolerances(1e-10, 1e-10)
    subject = (
        Subject.builder("s")
        .bolus(0.0, 1.0, 0)
        .observation(2.0, 0.0, 0)
        .covariate("wt", 0.0, 1.0)
        .covariate("wt", 2.0, 3.0)
        .build()
    )
    got = ode.estimate_predictions(subject, [0.5]).flat_predictions()
    want = [math.exp(-0.5 * 4.0)]
    np.testing.assert_allclose(got, want, rtol=1e-7)


def test_repeat_multi_dose_ode_vs_analytical():
    # "Repeat" workload shape: q12h x 5 doses (benches/common/mod.rs:76).
    b = Subject.builder("s").bolus(0.0, 100.0, 0).repeat(4, 12.0)
    for t in (1.0, 6.0, 13.0, 25.0, 48.0, 60.0):
        b = b.observation(t, 0.0, 0)
    subject = b.build()
    ode = ODE(
        lambda x, p, t, b_, rateiv, cov: jnp.stack([-p[0] * x[0] + b_[0] + rateiv[0]]),
        out=lambda x, p, t, cov: x[:1] / p[1],
        nstates=1,
        ndrugs=1,
        nout=1,
    ).with_tolerances(1e-10, 1e-10)
    analytical = Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[:1] / p[1],
        nstates=1,
        ndrugs=1,
        nout=1,
    )
    got = ode.estimate_predictions(subject, [0.15, 5.0]).flat_predictions()
    want = analytical.estimate_predictions(subject, [0.15, 5.0]).flat_predictions()
    np.testing.assert_allclose(got, want, rtol=1e-7)
