"""Auxiliary subsystems: export artifacts, profiling, error model accessors,
population predictions, 3-way authoring parity."""

import math

import jax.numpy as jnp
import numpy as np

import pharmsol_tpu as pst
from pharmsol_tpu import (
    ODE,
    Analytical,
    AssayErrorModel,
    AssayErrorModels,
    ErrorPoly,
    Factor,
    Route,
    Subject,
    ode_model,
)


def test_export_roundtrip():
    from pharmsol_tpu.ops import export_psi, load_exported

    model = Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )
    subjects = []
    for i in range(3):
        b = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
        for t in (1.0, 4.0, 8.0):
            b = b.observation(t, 40 * math.exp(-0.2 * t), 0)
        subjects.append(b.build())
    grid = model.lower(subjects)
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    lowered = ems.lower(model.resolve_output_label, model.nouteqs())

    blob = export_psi(model, grid, (4, 2), lowered, path="/tmp/psi_export.bin")
    assert len(blob) > 100

    fn = load_exported("/tmp/psi_export.bin")
    support = np.array([[0.1, 1.0], [0.2, 1.5], [0.15, 2.0], [0.3, 1.0]])
    from pharmsol_tpu.config import float_dtype

    psi = fn(
        grid.rows,
        jnp.asarray(grid.row_subject),
        jnp.asarray(support, dtype=float_dtype()),
        jnp.asarray(lowered.kind),
        jnp.asarray(lowered.factor, dtype=float_dtype()),
        jnp.asarray(lowered.poly, dtype=float_dtype()),
    )
    # compare with the live program
    from pharmsol_tpu.likelihood.matrix import log_likelihood_matrix
    from pharmsol_tpu import Data

    want = log_likelihood_matrix(model, Data(subjects), support, ems)
    np.testing.assert_allclose(np.asarray(psi), want, rtol=1e-12)


def test_profiling_stage_report():
    from pharmsol_tpu.utils import reset_stages, stage, stage_report

    reset_stages()
    with stage("demo"):
        sum(range(1000))
    with stage("demo"):
        sum(range(1000))
    report = stage_report()
    assert "demo" in report
    assert " 2 " in report or "       2" in report


def test_error_model_accessors():
    ems = AssayErrorModels().add("cp", AssayErrorModel.additive(ErrorPoly(0.1, 0.05), 2.0))
    assert ems.factor("cp") == 2.0
    ems.set_factor("cp", 3.0)
    assert ems.factor("cp") == 3.0
    assert not ems.is_factor_fixed("cp")
    ems.fix_factor("cp")
    assert ems.is_factor_fixed("cp")
    assert not ems.get("cp").optimize()
    ems.unfix_factor("cp")
    assert ems.get("cp").optimize()
    ems.set_errorpoly("cp", ErrorPoly(0.2, 0.0))
    assert ems.errorpoly("cp").c0 == 0.2
    from pharmsol_tpu.likelihood.prediction import Prediction

    pred = Prediction(time=1.0, observation=10.0, prediction=9.0, outeq="cp")
    np.testing.assert_allclose(ems.sigma(pred), math.sqrt(0.2**2 + 9.0))


def test_population_predictions_helper():
    from pharmsol_tpu.likelihood.prediction import population_predictions

    model = Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[:1],
        nstates=1, ndrugs=1, nout=1,
    )
    subjects = [
        Subject.builder(f"s{i}").bolus(0, 100, 0).observation(1.0, 5.0, 0).build()
        for i in range(2)
    ]
    support = np.array([[0.1], [0.2], [0.3]])
    pop = population_predictions(model, subjects, support)
    assert pop.n_subjects == 2 and pop.n_points == 3
    assert len(pop.get(0, 0)) == 1
    np.testing.assert_allclose(
        pop.get(1, 2).flat_predictions(), [100 * math.exp(-0.3)], rtol=1e-12
    )


def test_three_way_authoring_parity():
    """Closures, declarative API, and DSL text must agree exactly
    (authoring_parity_corpus.rs strategy)."""
    from pharmsol_tpu.dsl import compile_model

    p = [1.2, 0.25, 30.0]

    closures = ODE(
        lambda x, p_, t, b, rateiv, cov: jnp.stack(
            [-p_[0] * x[0] + b[0], p_[0] * x[0] - p_[1] * x[1]]
        ),
        out=lambda x, p_, t, cov: x[1:2] / p_[2],
        nstates=2, ndrugs=1, nout=1,
    )
    declarative = ode_model(
        parameters=["ka", "ke", "v"],
        states=["depot", "central"],
        outputs=["cp"],
        routes=[Route.bolus("oral").to_state("depot")],
        dynamics=lambda s, p_, t, cov: {
            "depot": -p_.ka * s.depot,
            "central": p_.ka * s.depot - p_.ke * s.central,
        },
        out=lambda s, p_, t, cov: {"cp": s.central / p_.v},
    )
    dsl = compile_model("""
name = parity
kind = ode
params = ka, ke, v
states = depot, central
outputs = cp
bolus(oral) -> depot
dx(depot) = -ka * depot
dx(central) = ka * depot - ke * central
out(cp) = central / v
""")

    def subj(named):
        i, o = ("oral", "cp") if named else (0, 0)
        b = Subject.builder("s").bolus(0.0, 100.0, i)
        for t in (0.5, 2.0, 6.0, 12.0):
            b = b.observation(t, 1.0, o)
        return b.build()

    a = closures.estimate_predictions(subj(False), p).flat_predictions()
    b = declarative.estimate_predictions(subj(True), p).flat_predictions()
    c = dsl.estimate_predictions(subj(True), p).flat_predictions()
    np.testing.assert_allclose(b, a, rtol=1e-12)
    np.testing.assert_allclose(c, a, rtol=1e-12)


def test_invalidate_clears_prediction_cache():
    """Reconfiguring a model must not serve stale cached results (review fix)."""
    import jax.numpy as jnp
    from pharmsol_tpu import ODE, Subject

    ode = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([-p[0] * x[0] + b[0]]),
        out=lambda x, p, t, cov: x[:1],
        nstates=1, ndrugs=1, nout=1,
    )
    s = Subject.builder("s").bolus(0, 100, 0).observation(1.0, 0.0, 0).build()
    a = ode.estimate_predictions(s, [0.3])
    ode.with_tolerances(1e-10, 1e-10)
    b = ode.estimate_predictions(s, [0.3])
    assert a is not b  # cache was invalidated; result recomputed
