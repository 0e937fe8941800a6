"""Declarative Python model API (macro-surface equivalent) + parity items."""

import io
import math

import numpy as np

import pharmsol_tpu as pst
from pharmsol_tpu import Analytical, Route, Subject
from pharmsol_tpu.models.declarative import analytical_model, ode_model, sde_model


def test_ode_model_named_callbacks():
    model = ode_model(
        name="one_cmt_oral",
        parameters=["ka", "ke", "v", "tlag"],
        states=["depot", "central"],
        outputs=["cp"],
        routes=[Route.bolus("oral").to_state("depot")],
        dynamics=lambda s, p, t, cov: {
            "depot": -p.ka * s.depot,
            "central": p.ka * s.depot - p.ke * s.central,
        },
        out=lambda s, p, t, cov: {"cp": s.central / p.v},
        lag=lambda p, t, cov: {"oral": p.tlag},
    ).with_tolerances(1e-10, 1e-10)
    subject = (
        Subject.builder("s").bolus(0.0, 100.0, "oral").observation(3.0, 0.0, "cp").build()
    )
    got = model.estimate_predictions(subject, [1.0, 0.1, 10.0, 0.5]).flat_predictions()
    ka, ke, v, tlag = 1.0, 0.1, 10.0, 0.5
    te = 3.0 - tlag
    want = 100 * ka / (ka - ke) * (math.exp(-ke * te) - math.exp(-ka * te)) / v
    np.testing.assert_allclose(got, [want], rtol=1e-6)


def test_ode_model_covariates():
    model = ode_model(
        parameters=["ke"],
        states=["central"],
        outputs=["cp"],
        routes=[Route.bolus("iv").to_state("central")],
        covariates=["wt"],
        dynamics=lambda s, p, t, cov: {"central": -p.ke * cov.wt * s.central},
        out=lambda s, p, t, cov: {"cp": s.central},
    ).with_tolerances(1e-10, 1e-10)
    subject = (
        Subject.builder("s")
        .bolus(0.0, 1.0, "iv")
        .observation(2.0, 0.0, "cp")
        .covariate("wt", 0.0, 1.0)
        .covariate("wt", 2.0, 3.0)
        .build()
    )
    got = model.estimate_predictions(subject, [0.5]).flat_predictions()
    np.testing.assert_allclose(got, [math.exp(-0.5 * 4.0)], rtol=1e-6)


def test_analytical_model_with_derive():
    model = analytical_model(
        structure="one_compartment",
        parameters=["cl", "vol"],
        states=["central"],
        outputs=["cp"],
        routes=[Route.infusion("iv").to_state("central")],
        derive=lambda p, t, cov: {"ke": p.cl / p.vol},
        out=lambda s, p, t, cov: {"cp": s.central / p.vol},
    )
    subject = (
        Subject.builder("s").infusion(0.0, 100.0, "iv", 2.0).observation(1.0, 0.0, "cp").build()
    )
    got = model.estimate_predictions(subject, [2.0, 20.0]).flat_predictions()
    ke = 0.1
    want = 50.0 / ke * (1 - math.exp(-ke)) / 20.0
    np.testing.assert_allclose(got, [want], rtol=1e-10)


def test_sde_model_declarative():
    model = sde_model(
        parameters=["ke", "v", "g"],
        states=["central"],
        outputs=["cp"],
        routes=[Route.bolus("iv").to_state("central")],
        drift=lambda s, p, t, cov: {"central": -p.ke * s.central},
        diffusion=lambda p, t, cov: {"central": p.g},
        out=lambda s, p, t, cov: {"cp": s.central / p.v},
        nparticles=16,
        seed=5,
    )
    subject = Subject.builder("s").bolus(0, 100, "iv").observation(1.0, 8.0, "cp").build()
    got = model.estimate_predictions(subject, [0.2, 10.0, 0.0]).flat_predictions()
    np.testing.assert_allclose(got, [10.0 * math.exp(-0.2)], rtol=1e-2)


def test_observation_metrics_trait():
    import pharmsol_tpu.nca.metrics  # installs methods

    subject = (
        Subject.builder("s")
        .bolus(0.0, 100.0, 0)
        .observation(0.0, 0.0, 0)
        .observation(1.0, 10.0, 0)
        .observation(2.0, 8.0, 0)
        .observation(4.0, 4.0, 0)
        .build()
    )
    assert subject.cmax_first(0) == 10.0
    assert subject.tmax_first(0) == 1.0
    assert subject.clast_first(0) == 4.0
    assert subject.tlast_first(0) == 4.0
    auc = subject.auc_first(0)
    np.testing.assert_allclose(auc, 26.0, rtol=1e-12)
    per_occ = subject.cmax(0)
    assert per_occ == [10.0]


def test_prediction_cache_hits():
    model = Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[:1],
        nstates=1,
        ndrugs=1,
        nout=1,
    )
    s = Subject.builder("c").bolus(0, 100, 0).observation(1.0, 5.0, 0).build()
    a = model.estimate_predictions(s, [0.3])
    b = model.estimate_predictions(s, [0.3])
    assert a is b  # cache returns the same object
    model.clear_cache()
    c = model.estimate_predictions(s, [0.3])
    assert c is not a
    model2 = model.disable_cache()
    d = model2.estimate_predictions(s, [0.3])
    e = model2.estimate_predictions(s, [0.3])
    assert d is not e


def test_progress_tracker():
    from pharmsol_tpu.likelihood.progress import ProgressTracker, format_duration

    buf = io.StringIO()
    tracker = ProgressTracker(2000, stream=buf)
    for _ in range(2000):
        tracker.inc()
    tracker.finish()
    out = buf.getvalue()
    assert "Progress: 1000/2000 (50%)" in out
    assert "Simulation complete!" in out
    assert format_duration(3725) == "01h:02m:05s"
    assert format_duration(65) == "01m:05s"


def test_reference_readme_quickstart():
    """The reference's front-page example (README.md:17-64): analytical
    structure with a covariate-derived kernel input, named parameters."""
    import numpy as np

    from pharmsol_tpu import Parameters, Route, Subject, analytical_model

    model = analytical_model(
        structure="one_compartment_with_absorption",
        parameters=["ka", "ke0", "v"],
        covariates=["wt"],
        states=["gut", "central"],
        outputs=["cp"],
        routes=[Route.bolus("oral").to_state("gut")],
        derive=lambda p, t, cov: {"ke": p.ke0 * (cov.wt / 70.0) ** 0.75},
        out=lambda s, p, t, cov: {"cp": s.central / p.v},
    )
    subject = (
        Subject.builder("patient_001")
        .bolus(0.0, 500.0, "oral")
        .missing_observation(0.5, "cp")
        .missing_observation(1.0, "cp")
        .missing_observation(2.0, "cp")
        .missing_observation(4.0, "cp")
        .covariate("wt", 0.0, 75.0)
        .build()
    )
    params = Parameters.with_model(model, [("ka", 1.2), ("ke0", 0.08), ("v", 194.0)])
    got = [p.prediction for p in model.estimate_predictions(subject, params).predictions()]

    # closure oracle with the allometric ke folded in by hand
    import pharmsol_tpu as pst2

    ke = 0.08 * (75.0 / 70.0) ** 0.75
    oracle = pst2.Analytical(
        pst2.one_compartment_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    )
    s2 = (
        Subject.builder("p").bolus(0.0, 500.0, 0)
        .missing_observation(0.5, 0).missing_observation(1.0, 0)
        .missing_observation(2.0, 0).missing_observation(4.0, 0).build()
    )
    want = [p.prediction for p in oracle.estimate_predictions(s2, [1.2, ke, 194.0]).predictions()]
    np.testing.assert_allclose(got, want, rtol=1e-10)
