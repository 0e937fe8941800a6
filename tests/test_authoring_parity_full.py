"""Full-feature authoring parity (authoring_parity_corpus.rs strategy).

One model with every feature — covariates (linear + locf), derived
parameters, two bolus routes + one infusion route, lag and fa on one route,
init values, multi-state ODE — expressed three ways: handwritten closures,
the declarative API, and DSL text. All three must agree at trace precision.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import pharmsol_tpu as pst
from pharmsol_tpu import (
    ODE,
    AssayErrorModel,
    AssayErrorModels,
    ErrorPoly,
    Route,
    Subject,
    ode_model,
)
from pharmsol_tpu.dsl import compile_model

pytestmark = pytest.mark.slow  # heavy parity tier; quick gate runs -m 'not slow'

P = [1.1, 0.18, 0.07, 0.04, 35.0, 0.6, 0.85, 4.0, 18.0]
# [ka, ke, kcp, kpc, v, tlag_oral, f_oral, base_depot, base_central]

DSL_SRC = """
name = full_feature
kind = ode

params = ka, ke, kcp, kpc, v, tlag_oral, f_oral, base_depot, base_central
covariates = wt@linear, renal@locf
derived = adj_ke, adj_v
states = depot, central, peripheral
outputs = cp

bolus(oral) -> depot
bolus(load) -> central
infusion(iv) -> central

lag(oral) = tlag_oral * sqrt(wt / 70.0)
fa(oral) = min(max(f_oral * pow(renal / 90.0, 0.1), 0.0), 1.0)

adj_ke = ke * pow(wt / 70.0, 0.75)
adj_v = v * (wt / 70.0)

dx(depot) = -ka * depot
dx(central) = ka * depot - (adj_ke + kcp) * central + kpc * peripheral
dx(peripheral) = kcp * central - kpc * peripheral

init(depot) = base_depot + 0.05 * wt
init(central) = base_central + 0.1 * renal

out(cp) = central / adj_v ~ continuous()
"""


def dsl_model():
    return compile_model(DSL_SRC)


def declarative_model():
    return ode_model(
        name="full_feature",
        parameters=["ka", "ke", "kcp", "kpc", "v", "tlag_oral", "f_oral",
                    "base_depot", "base_central"],
        covariates=["wt", pst.CovariateDecl.locf("renal")],
        states=["depot", "central", "peripheral"],
        outputs=["cp"],
        routes=[
            Route.bolus("oral").to_state("depot"),
            Route.bolus("load").to_state("central"),
            Route.infusion("iv").to_state("central"),
        ],
        dynamics=lambda s, p, t, cov: {
            "depot": -p.ka * s.depot,
            "central": p.ka * s.depot
            - (p.ke * (cov.wt / 70.0) ** 0.75 + p.kcp) * s.central
            + p.kpc * s.peripheral,
            "peripheral": p.kcp * s.central - p.kpc * s.peripheral,
        },
        out=lambda s, p, t, cov: {"cp": s.central / (p.v * (cov.wt / 70.0))},
        init=lambda p, t, cov: {
            "depot": p.base_depot + 0.05 * cov.wt,
            "central": p.base_central + 0.1 * cov.renal,
        },
        lag=lambda p, t, cov: {"oral": p.tlag_oral * jnp.sqrt(cov.wt / 70.0)},
        fa=lambda p, t, cov: {
            "oral": jnp.minimum(
                jnp.maximum(p.f_oral * (cov.renal / 90.0) ** 0.1, 0.0), 1.0
            )
        },
    )


def closure_model():
    # dense layout: bolus inputs: oral=0, load=1; infusion inputs: iv=0
    def diffeq(x, p, t, b, rateiv, cov):
        adj_ke = p[1] * (cov("wt", t) / 70.0) ** 0.75
        return jnp.stack(
            [
                -p[0] * x[0] + b[0],
                p[0] * x[0] - (adj_ke + p[2]) * x[1] + p[3] * x[2] + rateiv[0] + b[1],
                p[2] * x[1] - p[3] * x[2],
            ]
        )

    return ODE(
        diffeq,
        lag=lambda p, t, cov: {0: p[5] * jnp.sqrt(cov("wt", t) / 70.0)},
        fa=lambda p, t, cov: {
            0: jnp.minimum(jnp.maximum(p[6] * (cov("renal", t) / 90.0) ** 0.1, 0.0), 1.0)
        },
        init=lambda p, t, cov: jnp.stack(
            [p[7] + 0.05 * cov("wt", t), p[8] + 0.1 * cov("renal", t), 0.0 * p[0]]
        ),
        out=lambda x, p, t, cov: x[1:2] / (p[4] * (cov("wt", t) / 70.0)),
        nstates=3,
        ndrugs=2,
        nout=1,
    )


def subject(named: bool):
    oral, load, iv, cp = ("oral", "load", "iv", "cp") if named else (0, 1, 0, 0)
    b = (
        Subject.builder("full")
        .bolus(0.0, 100.0, oral)
        .bolus(0.5, 20.0, load)
        .infusion(6.0, 50.0, iv, 2.0)
        .covariate("wt", 0.0, 80.0)
        .covariate("wt", 24.0, 76.0)
        .covariate("renal!", 0.0, 85.0)
    )
    for t in (1.0, 3.0, 7.0, 12.0, 24.0):
        b = b.observation(t, 1.0, cp)
    return b.build()


def test_three_way_full_feature_parity():
    # NOTE: the declarative/closure 'renal' covariate is declared locf via
    # the builder's `renal!` marker, so all three surfaces see carry-forward.
    a = closure_model().estimate_predictions(subject(False), P).flat_predictions()
    b = declarative_model().estimate_predictions(subject(True), P).flat_predictions()
    c = dsl_model().estimate_predictions(subject(True), P).flat_predictions()
    np.testing.assert_allclose(b, a, rtol=1e-10)
    np.testing.assert_allclose(c, a, rtol=1e-10)

    ems_n = AssayErrorModels().add("cp", AssayErrorModel.additive(ErrorPoly(0.3, 0.1), 1.0))
    ems_0 = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.3, 0.1), 1.0))
    ll_a = closure_model().estimate_log_likelihood(subject(False), P, ems_0)
    ll_b = declarative_model().estimate_log_likelihood(subject(True), P, ems_n)
    ll_c = dsl_model().estimate_log_likelihood(subject(True), P, ems_n)
    np.testing.assert_allclose(ll_b, ll_a, rtol=1e-10)
    np.testing.assert_allclose(ll_c, ll_a, rtol=1e-10)
