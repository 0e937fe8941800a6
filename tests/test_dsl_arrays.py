"""Array state declarations: `states { a[N] }`, indexed dx targets, loops.

An extension beyond the reference DSL (which only has scalar named states,
src/dsl/mod.rs:69), motivated by transit-compartment chains. Array states
expand to element names (`a[0]`..) at parse time, so the engine sees ordinary
scalar states; indices must resolve to constants at trace time (literals,
constants, or unrolled loop variables).
"""

import numpy as np
import pytest

import pharmsol_tpu as pst
from pharmsol_tpu.dsl import (
    DslError,
    compile_module,
    compile_module_source_to_runtime,
    load_runtime_artifact,
    save_artifact,
)

TRANSIT_CANONICAL = """
model transit {
  kind ode
  parameters { ktr, ke, v }
  states { a[4] }
  routes { bolus oral -> a[0] }
  dynamics {
    dx[0] = -ktr * a[0]
    for i in 1..3 {
      dx[i] = ktr * (a[i-1] - a[i])
    }
    dx(a[3]) = ktr * a[2] - ke * a[3]
  }
  outputs { out(y) = a[3] / v }
}
"""

TRANSIT_FLAT = """
name = transit_flat
kind = ode
params = ktr, ke, v
states = a[4]
outputs = y

bolus(oral) -> a[0]

dx[0] = -ktr * a[0]
dx(a[1]) = ktr * (a[0] - a[1])
dx(a[2]) = ktr * (a[1] - a[2])
dx[3] = ktr * a[2] - ke * a[3]
out(y) = a[3] / v
"""

PARAMS = [1.8, 0.3, 25.0]


def _dsl_subject():
    return (
        pst.Subject.builder("s1")
        .bolus(0.0, 100.0, "oral")
        .observation(1.0, -1.0, "y")
        .observation(2.0, -1.0, "y")
        .observation(6.0, -1.0, "y")
        .build()
    )


def _closure_oracle():
    import jax.numpy as jnp

    def eq(x, p, t, b, rateiv, cov):
        ktr, ke = p[0], p[1]
        return jnp.stack(
            [
                -ktr * x[0] + b[0],
                ktr * (x[0] - x[1]),
                ktr * (x[1] - x[2]),
                ktr * x[2] - ke * x[3],
            ]
        )

    subject = (
        pst.Subject.builder("s1")
        .bolus(0.0, 100.0, 0)
        .observation(1.0, -1.0, 0)
        .observation(2.0, -1.0, 0)
        .observation(6.0, -1.0, 0)
        .build()
    )
    ode = pst.ODE(eq, out=lambda x, p, t, cov: x[3:4] / p[2], nstates=4, ndrugs=1, nout=1)
    return np.array(
        [p.prediction for p in ode.estimate_predictions(subject, PARAMS).predictions()]
    )


def test_transit_chain_canonical_matches_closure():
    rt = compile_module_source_to_runtime(TRANSIT_CANONICAL)
    got = np.array(
        [p.prediction for p in rt.estimate_predictions(_dsl_subject(), PARAMS).predictions()]
    )
    assert np.allclose(got, _closure_oracle(), rtol=1e-8)


def test_transit_chain_flat_matches_canonical():
    a = compile_module_source_to_runtime(TRANSIT_CANONICAL)
    b = compile_module_source_to_runtime(TRANSIT_FLAT)
    s = _dsl_subject()
    ga = [p.prediction for p in a.estimate_predictions(s, PARAMS).predictions()]
    gb = [p.prediction for p in b.estimate_predictions(s, PARAMS).predictions()]
    assert np.allclose(ga, gb, rtol=1e-12)


def test_array_states_expand_in_model_info():
    rt = compile_module_source_to_runtime(TRANSIT_CANONICAL)
    assert rt.info()["states"] == ["a[0]", "a[1]", "a[2]", "a[3]"]
    assert rt.analyzed.state_arrays == {"a": 4}


def test_array_state_artifact_roundtrip(tmp_path):
    rt = compile_module_source_to_runtime(TRANSIT_CANONICAL)
    path = str(tmp_path / "transit.pkm")
    save_artifact(rt, path)
    rt2 = load_runtime_artifact(path)
    s = _dsl_subject()
    ga = [p.prediction for p in rt.estimate_predictions(s, PARAMS).predictions()]
    gb = [p.prediction for p in rt2.estimate_predictions(s, PARAMS).predictions()]
    assert np.allclose(ga, gb, rtol=1e-12)
    assert rt2.analyzed.state_arrays == {"a": 4}


def test_mixed_array_and_scalar_states():
    src = """
model mixed {
  kind ode
  parameters { ktr, ke, v }
  states { tr[2], central }
  routes { bolus oral -> tr[0] }
  dynamics {
    dx(tr[0]) = -ktr * tr[0]
    dx(tr[1]) = ktr * (tr[0] - tr[1])
    dx(central) = ktr * tr[1] - ke * central
  }
  outputs { out(y) = central / v }
}
"""
    rt = compile_module_source_to_runtime(src)
    got = np.array(
        [p.prediction for p in rt.estimate_predictions(_dsl_subject(), PARAMS).predictions()]
    )
    assert np.all(np.isfinite(got)) and np.all(got > 0)


def _expect_code(src: str, code: str):
    with pytest.raises(DslError) as exc:
        compile_module(src)
    assert code in str(exc.value)


def test_index_out_of_bounds_diagnosed():
    _expect_code(
        """
model m { kind ode
  parameters { k }
  states { a[2] }
  routes { bolus oral -> a[0] }
  dynamics { dx[0] = -k*a[0]  dx[1] = k*a[0] - k*a[2] }
  outputs { out(y) = a[1] }
}""",
        "DSL2033",
    )


def test_dx_sugar_ambiguous_with_two_arrays():
    _expect_code(
        """
model m { kind ode
  parameters { k }
  states { a[2], b[2] }
  routes { bolus oral -> a[0] }
  dynamics { dx[0] = -k*a[0]  dx(a[1]) = k*a[0]  dx(b[0]) = 0  dx(b[1]) = 0 }
  outputs { out(y) = b[1] }
}""",
        "DSL2037",
    )


def test_indexing_scalar_state_diagnosed():
    _expect_code(
        """
model m { kind ode
  parameters { k }
  states { central }
  routes { bolus oral -> central }
  dynamics { dx(central) = -k*central[0] }
  outputs { out(y) = central }
}""",
        "DSL2034",
    )


def test_uncovered_array_element_diagnosed():
    # only a[0] gets a static dx; a[1] has no equation and no loop writes
    _expect_code(
        """
model m { kind ode
  parameters { k }
  states { a[2], central }
  routes { bolus oral -> a[0] }
  dynamics { dx(a[0]) = -k*a[0]  dx(central) = k*a[1] }
  outputs { out(y) = central }
}""",
        "DSL2018",
    )


def test_indexed_dx_in_loop_covers_array():
    # loop-written arrays satisfy coverage even though indices are dynamic
    src = """
model m {
  kind ode
  parameters { k }
  states { a[3] }
  routes { bolus oral -> a[0] }
  dynamics {
    dx[0] = -k * a[0]
    for i in 1..3 { dx[i] = k * (a[i-1] - a[i]) }
  }
  outputs { out(y) = a[2] }
}
"""
    compile_module(src)  # should not raise


def test_partial_loop_coverage_diagnosed():
    """Const-bounded loops are simulated, so a[2]/a[3] uncovered -> DSL2018."""
    _expect_code(
        """
model m { kind ode
  parameters { k }
  states { a[4] }
  routes { bolus oral -> a[0] }
  dynamics {
    for i in 0..2 { dx[i] = -k * a[i] }
  }
  outputs { out(y) = a[3] }
}""",
        "DSL2018",
    )
