"""Diagnostics golden suite: bad DSL programs -> expected codes/suggestions.

VERDICT item 8: assert the analyzer's full rule corpus the way the reference
pins its diagnostics (pharmsol-dsl/src/analyze.rs + diagnostic.rs codes,
spans, suggestions). Each case is one deliberately broken program; the test
asserts the diagnostic code, and where the reference attaches a typo
suggestion, the suggestion text.
"""

import pytest

from pharmsol_tpu.dsl import DslError, compile_model, parse_model
from pharmsol_tpu.dsl.analyze import analyze_model


BASE_ODE = """
name = m
kind = ode
params = ka, ke, v
states = depot, central
outputs = cp
bolus(oral) -> depot
dx(depot) = -ka * depot
dx(central) = ka * depot - ke * central
out(cp) = central / v
"""


def _codes(src):
    with pytest.raises(DslError) as ei:
        compile_model(src)
    return [d.code for d in ei.value.diagnostics], ei.value.diagnostics


def _expect(src, code, suggestion=None, needs_span=False):
    codes, diags = _codes(src)
    assert code in codes, f"expected {code}, got {codes}:\n" + "\n".join(
        d.render() for d in diags
    )
    d = next(d for d in diags if d.code == code)
    if suggestion is not None:
        assert d.suggestion == suggestion, (d.suggestion, suggestion)
    if needs_span:
        assert d.span.line > 0, "diagnostic should carry a source span"
    return d


# -- name resolution ---------------------------------------------------------

def test_unknown_name_in_dynamics_with_suggestion():
    _expect(BASE_ODE.replace("-ka * depot", "-kaa * depot"),
            "DSL2001", suggestion="ka", needs_span=True)


def test_unknown_name_in_output():
    _expect(BASE_ODE.replace("central / v", "central / vd"),
            "DSL2001", suggestion="v", needs_span=True)


def test_unknown_state_in_dynamics():
    _expect(BASE_ODE.replace("ka * depot - ke * central", "ka * depo - ke * central"),
            "DSL2001", suggestion="depot")


def test_unknown_function_with_suggestion():
    _expect(BASE_ODE.replace("central / v", "sqrtt(central) / v"),
            "DSL2002", suggestion="sqrt", needs_span=True)


def test_wrong_arity_pow():
    _expect(BASE_ODE.replace("central / v", "pow(central) / v"), "DSL2003")


def test_wrong_arity_min():
    _expect(BASE_ODE.replace("central / v", "min(central, v, ka)"), "DSL2003")


def test_wrong_arity_exp():
    _expect(BASE_ODE.replace("central / v", "exp(central, v)"), "DSL2003")


# -- statement targets -------------------------------------------------------

def test_unknown_dx_target_with_suggestion():
    _expect(BASE_ODE.replace("dx(central)", "dx(centrl)"),
            "DSL2005", suggestion="central")


def test_underived_assignment_in_derive_block():
    src = """
name = m
kind = ode
params = ka, ke, v
states = central
derived = kei
outputs = cp
bolus(oral) -> central
kei = ke * 1.1
extra = ka + 1
dx(central) = -kei * central
out(cp) = central / v
"""
    codes, _ = _codes(src)
    assert "DSL2006" in codes or "DSL2009" in codes, codes


def test_constant_must_be_literal():
    # constants blocks are canonical-syntax only
    src = """
model m {
  kind ode
  params { ka, ke, v }
  constants { c = ka * 2 }
  states { central }
  routes { bolus oral -> central }
  dynamics { dx(central) = -ke * central }
  outputs { out(cp) = central / v }
}
"""
    _expect(src, "DSL2007")


def test_unknown_covariate_interpolation():
    src = BASE_ODE.replace("params = ka, ke, v",
                           "params = ka, ke, v\ncovariates = wt@cubic")
    _expect(src, "DSL2008")


def test_out_target_not_declared():
    _expect(BASE_ODE.replace("out(cp)", "out(cpp)"), "DSL2010",
            suggestion="cp")


# -- name domains ------------------------------------------------------------

def test_cross_domain_collision_param_state():
    _expect(BASE_ODE.replace("states = depot, central", "states = ka, central"),
            "DSL2011")


def test_duplicate_parameter():
    _expect(BASE_ODE.replace("params = ka, ke, v", "params = ka, ka, ke, v"),
            "DSL2040")


def test_duplicate_state():
    _expect(BASE_ODE.replace("states = depot, central",
                             "states = depot, depot, central"), "DSL2040")


def test_duplicate_output():
    src = BASE_ODE.replace("outputs = cp", "outputs = cp, cp")
    _expect(src, "DSL2040")


def test_param_collides_with_covariate():
    src = BASE_ODE.replace("params = ka, ke, v",
                           "params = ka, ke, v\ncovariates = ka@linear")
    _expect(src, "DSL2011")


# -- routes -------------------------------------------------------------------

def test_duplicate_route():
    _expect(BASE_ODE.replace("bolus(oral) -> depot",
                             "bolus(oral) -> depot\nbolus(oral) -> central"),
            "DSL2012")


def test_route_to_unknown_state():
    _expect(BASE_ODE.replace("bolus(oral) -> depot", "bolus(oral) -> depo"),
            "DSL2013", suggestion="depot")


def test_lag_names_multiple_routes():
    _expect(BASE_ODE + "\nlag(oral, other) = 0.5\n", "DSL2014")


def test_lag_on_undeclared_route():
    _expect(BASE_ODE + "\nlag(orall) = 0.5\n", "DSL2015", suggestion="oral")


def test_lag_on_infusion_route():
    src = BASE_ODE.replace("bolus(oral) -> depot",
                           "bolus(oral) -> depot\ninfusion(iv) -> central")
    _expect(src + "\nlag(iv) = 0.5\n", "DSL2016")


def test_unknown_route_property():
    src = BASE_ODE.replace("bolus(oral) -> depot",
                           "bolus(oral) -> depot { tlag = 0.5 }")
    _expect(src, "DSL2038")


# -- model-kind rules ----------------------------------------------------------

def test_ode_requires_dynamics():
    src = """
name = m
kind = ode
params = ke, v
states = central
outputs = cp
bolus(oral) -> central
out(cp) = central / v
"""
    _expect(src, "DSL2017")


def test_state_without_dx_equation():
    _expect(BASE_ODE.replace("dx(central) = ka * depot - ke * central\n", ""),
            "DSL2018")


def test_ode_may_not_declare_structure():
    _expect(BASE_ODE.replace("kind = ode",
                             "kind = ode\nstructure = one_compartment"),
            "DSL2019")


def test_ode_may_not_declare_particles():
    _expect(BASE_ODE.replace("kind = ode", "kind = ode\nparticles = 100"),
            "DSL2020")


def test_sde_requires_drift():
    src = """
name = m
kind = sde
params = ke, v
states = central
outputs = cp
particles = 50
bolus(oral) -> central
out(cp) = central / v
"""
    _expect(src, "DSL2021")


def test_sde_requires_particles():
    src = """
name = m
kind = sde
params = ke, v
states = central
outputs = cp
bolus(oral) -> central
dx(central) = -ke * central
noise(central) = 0.1
out(cp) = central / v
"""
    _expect(src, "DSL2022")


def test_sde_may_not_declare_structure():
    src = """
name = m
kind = sde
params = ke, v
states = central
outputs = cp
particles = 50
structure = one_compartment
bolus(oral) -> central
dx(central) = -ke * central
out(cp) = central / v
"""
    _expect(src, "DSL2023")


def test_analytical_may_not_declare_dynamics():
    src = """
name = m
kind = analytical
structure = one_compartment
params = ke, v
states = central
outputs = cp
bolus(oral) -> central
dx(central) = -ke * central
out(cp) = central / v
"""
    _expect(src, "DSL2024")


def test_analytical_may_not_declare_particles():
    src = """
name = m
kind = analytical
structure = one_compartment
particles = 10
params = ke, v
states = central
outputs = cp
bolus(oral) -> central
out(cp) = central / v
"""
    _expect(src, "DSL2025")


def test_analytical_requires_structure():
    src = """
name = m
kind = analytical
params = ke, v
states = central
outputs = cp
bolus(oral) -> central
out(cp) = central / v
"""
    _expect(src, "DSL2026")


def test_unknown_analytical_structure():
    src = """
name = m
kind = analytical
structure = one_compartment_with_absorbtion
params = ka, ke, v
states = depot, central
outputs = cp
bolus(oral) -> depot
out(cp) = central / v
"""
    _expect(src, "DSL2027", suggestion="one_compartment_with_absorption")


def test_structure_state_count_mismatch():
    src = """
name = m
kind = analytical
structure = two_compartments
params = ke, kcp, kpc, v
states = central
outputs = cp
bolus(oral) -> central
out(cp) = central / v
"""
    _expect(src, "DSL2028")


def test_structure_missing_required_parameter():
    src = """
name = m
kind = analytical
structure = one_compartment_with_absorption
params = kab, keq, v
states = depot, central
outputs = cp
bolus(oral) -> depot
out(cp) = central / v
"""
    _expect(src, "DSL2030", suggestion="kab")


# -- outputs --------------------------------------------------------------------

def test_declared_output_without_equation():
    _expect(BASE_ODE.replace("outputs = cp", "outputs = cp, metabolite"),
            "DSL2031")


def test_model_without_outputs():
    src = """
name = m
kind = ode
params = ke
states = central
bolus(oral) -> central
dx(central) = -ke * central
"""
    _expect(src, "DSL2032")


# -- arrays ----------------------------------------------------------------------

def test_array_index_out_of_bounds():
    src = """
name = m
kind = ode
params = ke
states = x[3]
outputs = cp
bolus(oral) -> x
dx(x[0]) = -ke * x[0]
dx(x[1]) = ke * x[0] - ke * x[1]
dx(x[2]) = ke * x[1] - ke * x[2]
out(cp) = x[5]
"""
    _expect(src, "DSL2033")


def test_indexing_a_scalar_state():
    _expect(BASE_ODE.replace("central / v", "central[0] / v"), "DSL2034")


# -- parser guards -----------------------------------------------------------------

def test_expression_nesting_depth_guard():
    deep = "(" * 300 + "ka" + ")" * 300
    src = BASE_ODE.replace("-ka * depot", f"-{deep} * depot")
    with pytest.raises(DslError) as ei:
        compile_model(src)
    assert any(d.code == "DSL0103" for d in ei.value.diagnostics)
    assert any("nested too deeply" in d.message for d in ei.value.diagnostics)


# -- covariate-sourced kernel bindings (capability, not a diagnostic) ---------------

def test_covariate_sourced_kernel_binding():
    """A required kernel input may come straight from a covariate."""
    src = """
name = m
kind = analytical
structure = one_compartment
params = v
covariates = ke@linear
states = central
outputs = cp
bolus(oral) -> central
out(cp) = central / v
"""
    model = parse_model(src)
    am = analyze_model(model)
    assert am.kernel_plan is not None
    assert am.kernel_plan.bindings == [("covariate", 0)]

    # end-to-end: ke supplied as a constant covariate reproduces the plain model
    import numpy as np

    from pharmsol_tpu import Subject
    from pharmsol_tpu.dsl import compile_model as cm

    runtime = cm(src)
    s = (
        Subject.builder("s")
        .bolus(0.0, 100.0, "oral")
        .observation(1.0, 0.0, "cp")
        .observation(4.0, 0.0, "cp")
        .covariate("ke", 0.0, 0.25)
        .build()
    )
    got = runtime.model.estimate_predictions(s, [10.0]).flat_predictions()
    want = [100.0 * np.exp(-0.25 * t) / 10.0 for t in (1.0, 4.0)]
    np.testing.assert_allclose(got, want, rtol=1e-10)
