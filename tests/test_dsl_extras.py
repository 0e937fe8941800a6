"""DSL extras: constants blocks, for loops, module selection, solver errors."""

import math

import numpy as np
import pytest

from pharmsol_tpu import Subject
from pharmsol_tpu.dsl import DslError, compile_model, compile_module, compile_module_source_to_runtime
from pharmsol_tpu.errors import SolverError


def test_constants_block_and_for_loop():
    src = """
model accum {
    kind ode
    parameters { ke }
    constants { base = 2.0, scale = base * 3.0 }
    states { central }
    derived { boost }
    routes { bolus iv -> central }
    derive {
        boost = 0.0
        for i in 0..3 { boost = boost + scale }
    }
    dynamics { dx(central) = -ke * central * 0.0 }
    outputs { out(cp) = central + boost }
}
"""
    runtime = compile_model(src)
    subject = Subject.builder("s").bolus(0, 10, "iv").observation(1.0, 0.0, "cp").build()
    got = runtime.estimate_predictions(subject, [0.1]).flat_predictions()
    # boost = 3 * (2*3) = 18; central stays 10 (zero dynamics)
    np.testing.assert_allclose(got, [28.0], rtol=1e-9)


def test_module_with_two_models():
    src = """
model a { kind ode
  parameters { ke } states { c } routes { bolus iv -> c }
  dynamics { dx(c) = -ke * c } outputs { out(y) = c } }
model b { kind ode
  parameters { ke } states { c } routes { bolus iv -> c }
  dynamics { dx(c) = -2.0 * ke * c } outputs { out(y) = c } }
"""
    models = compile_module(src)
    assert [m.analyzed.name for m in models] == ["a", "b"]
    rb = compile_module_source_to_runtime(src, name="b")
    subject = Subject.builder("s").bolus(0, 100, "iv").observation(1.0, 0.0, "y").build()
    pa = models[0].estimate_predictions(subject, [0.3]).flat_predictions()[0]
    pb = rb.estimate_predictions(subject, [0.3]).flat_predictions()[0]
    np.testing.assert_allclose(pa, 100 * math.exp(-0.3), rtol=1e-6)
    np.testing.assert_allclose(pb, 100 * math.exp(-0.6), rtol=2e-5)  # default ODE rtol 1e-4


def test_solver_error_carries_subject_context():
    from pharmsol_tpu import Analytical
    import pharmsol_tpu as pst

    model = Analytical(
        pst.one_compartment, out=lambda x, p, t, cov: x[:1], nstates=1, ndrugs=1, nout=1
    )
    subject = Subject.builder("bad_subject").bolus(0, 100, 0).observation(1.0, 0.0, 0).build()
    with pytest.raises(SolverError) as exc:
        model.estimate_predictions(subject, [float("nan")])
    assert "bad_subject" in str(exc.value)


def test_superposition_attached_to_subject():
    b = Subject.builder("sp").bolus(0.0, 100.0, 1)
    for t in np.linspace(0.0, 48.0, 25):
        b = b.observation(float(t), 10.0 * math.exp(-0.2 * t), 0)
    res = b.build().superposition(tau=12.0, n_eval_points=13)
    want = 1.0 / (1.0 - math.exp(-0.2 * 12.0))
    assert abs(res.accumulation_ratio - want) / want < 0.05


def test_if_inside_dynamics_michaelis_menten():
    """Saturable elimination with branch-dependent dx (nested call targets)."""
    import jax.numpy as jnp
    from pharmsol_tpu import ODE

    src = """
model mm {
    kind ode
    parameters { vmax, km, v }
    states { central }
    routes { bolus iv -> central }
    dynamics {
        let conc = central / v
        if conc > km { dx(central) = -vmax * central / (km + conc) }
        else { dx(central) = -0.5 * vmax * central / (km + conc) }
    }
    outputs { out(cp) = central / v }
}
"""
    rt = compile_model(src)

    def diffeq(x, p, t, b, rateiv, cov):
        conc = x[0] / p[2]
        full = -p[0] * x[0] / (p[1] + conc)
        half = -0.5 * p[0] * x[0] / (p[1] + conc)
        return jnp.stack([jnp.where(conc > p[1], full, half) + 0.0 * b[0]]) + b[0]

    hand = ODE(
        diffeq, out=lambda x, p, t, cov: x[:1] / p[2], nstates=1, ndrugs=1, nout=1
    )
    s_named = Subject.builder("s").bolus(0, 100, "iv").observation(2.0, 0.0, "cp").build()
    s_num = Subject.builder("s").bolus(0, 100, 0).observation(2.0, 0.0, 0).build()
    got = rt.estimate_predictions(s_named, [5.0, 2.0, 10.0]).flat_predictions()
    want = hand.estimate_predictions(s_num, [5.0, 2.0, 10.0]).flat_predictions()
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_t_keyword_reflects_simulation_time():
    """Output `t` echoes observation times (dsl_time_keyword.rs:80)."""
    import numpy as np

    src = """
name = clock
kind = ode
params = ke
states = central
outputs = y

bolus(dose) -> central

dx(central) = -ke * central
out(y) = t
"""
    rt = compile_module_source_to_runtime(src)
    times = [0.25, 1.5, 3.75, 9.0]
    b = Subject.builder("clk").bolus(0.0, 10.0, "dose")
    for t in times:
        b = b.observation(t, -1.0, "y")
    preds = rt.estimate_predictions(b.build(), [0.3]).flat_predictions()
    np.testing.assert_allclose(preds, times, rtol=1e-12)


def test_canonical_route_properties_desugar_to_lag_fa():
    """`routes { bolus oral -> depot { lag = ..., fa = ... } }` must behave
    exactly like the flat `lag(oral) = ...` form (previously parsed but
    silently dropped)."""
    canon = """
model m {
  kind ode
  parameters { ka, ke, v, tlag }
  states { depot, central }
  routes { bolus oral -> depot { lag = tlag, fa = 0.8 } }
  dynamics {
    dx(depot) = -ka * depot
    dx(central) = ka * depot - ke * central
  }
  outputs { out(cp) = central / v }
}
"""
    flat = """
name = m
kind = ode
params = ka, ke, v, tlag
states = depot, central
outputs = cp
bolus(oral) -> depot
lag(oral) = tlag
fa(oral) = 0.8
dx(depot) = -ka * depot
dx(central) = ka * depot - ke * central
out(cp) = central / v
"""
    a = compile_model(canon)
    b = compile_model(flat)
    info = a.info()["routes"][0]
    assert info["has_lag"] and info["has_bioavailability"]
    s = (Subject.builder("s").bolus(0.0, 100.0, "oral")
         .observation(1.0, -1.0, "cp").observation(4.0, -1.0, "cp").build())
    p = [1.2, 0.2, 10.0, 0.5]
    pa = [q.prediction for q in a.estimate_predictions(s, p).predictions()]
    pb = [q.prediction for q in b.estimate_predictions(s, p).predictions()]
    np.testing.assert_allclose(pa, pb, rtol=1e-12)

    with pytest.raises(DslError, match="DSL2038"):
        compile_model(canon.replace("fa = 0.8", "rate = 0.8"))
