"""Pure-Python .pkm evaluator (the WASM-replacement portable tier)."""

import ast as pyast
import os

import numpy as np
import pytest

from pharmsol_tpu import Subject
from pharmsol_tpu.dsl import compile_model, save_artifact
from pharmsol_tpu.dsl.pure import PureCovariate, PureModel

SRC = """
name = portable
kind = ode
params = ka, cl, v
covariates = wt@linear
states = depot, central
derived = ke
outputs = cp
bolus(oral) -> depot
ke = cl * pow(wt / 70.0, 0.75) / v
dx(depot) = -ka * depot
dx(central) = ka * depot - ke * central
out(cp) = central / v
"""


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    runtime = compile_model(SRC)
    path = str(tmp_path_factory.mktemp("pkm") / "portable.pkm")
    save_artifact(runtime, path)
    return runtime, path


def test_pure_module_is_jax_free():
    """The evaluator must be vendorable: stdlib imports only."""
    import pharmsol_tpu.dsl.pure as pure

    tree = pyast.parse(open(pure.__file__).read())
    imported = set()
    for node in pyast.walk(tree):
        if isinstance(node, pyast.Import):
            imported.update(a.name.split(".")[0] for a in node.names)
        elif isinstance(node, pyast.ImportFrom) and node.level == 0:
            imported.add((node.module or "").split(".")[0])
    assert "jax" not in imported and "numpy" not in imported, imported


def test_pure_roles_match_jitted(artifact):
    runtime, path = artifact
    pure = PureModel.load(path)
    assert pure.kind == "ode"
    assert pure.parameters == ["ka", "cl", "v"]
    params = [1.2, 4.0, 35.0]
    cov = {"wt": PureCovariate([(0.0, 80.0)])}
    d = pure.derive(params, t=0.0, cov=cov)
    assert d["ke"] == pytest.approx(4.0 * (80.0 / 70.0) ** 0.75 / 35.0)
    dx = pure.dynamics([100.0, 0.0], params, 0.0, cov)
    assert dx[0] == pytest.approx(-1.2 * 100.0)
    assert dx[1] == pytest.approx(1.2 * 100.0)
    y = pure.out([0.0, 70.0], params, 1.0, cov)
    assert y[0] == pytest.approx(2.0)


def test_pure_simulate_matches_jitted(artifact):
    runtime, path = artifact
    pure = PureModel.load(path)
    params = [1.2, 4.0, 35.0]
    obs_times = [1.0, 4.0, 12.0]

    s = Subject.builder("s").bolus(0.0, 100.0, "oral").covariate("wt", 0.0, 80.0)
    for t in obs_times:
        s = s.observation(t, 0.0, "cp")
    want = np.asarray(
        runtime.model.estimate_predictions(s.build(), params).flat_predictions()
    )
    got = pure.simulate(params, boluses=[(0.0, 100.0, 0)], obs_times=obs_times,
                        cov={"wt": PureCovariate([(0.0, 80.0)])}, dt=0.005)
    np.testing.assert_allclose([g[0] for g in got], want, rtol=1e-4)


def test_pure_covariate_interpolation():
    c = PureCovariate([(0.0, 70.0), (24.0, 74.0)])
    assert c(-1.0) == 70.0
    assert c(12.0) == pytest.approx(72.0)
    assert c(30.0) == 74.0
    fixed = PureCovariate([(0.0, 1.0), (10.0, 2.0)], fixed=True)
    assert fixed(5.0) == 1.0
    assert fixed(10.0) == 2.0


ANALYTICAL_SRC = """
name = portable_analytical
kind = analytical
params = ka, cl, v
covariates = wt@linear
states = depot, central
derived = ke
outputs = cp
bolus(oral) -> depot
structure = one_compartment_with_absorption
ke = cl * pow(wt / 70.0, 0.75) / v
out(cp) = central / v
"""


def test_pure_simulate_analytical_matches_jitted(tmp_path):
    """Analytical-kind artifacts simulate EXACTLY in the pure tier.

    The stdlib affine matrix exponential propagates the kernel compartment
    matrix per segment (kernel inputs re-derived at segment end, engine
    parity) — no integration tolerance at all.
    """
    from pharmsol_tpu.dsl import compile_model, save_artifact

    runtime = compile_model(ANALYTICAL_SRC)
    path = str(tmp_path / "ana.pkm")
    save_artifact(runtime, path)
    pure = PureModel.load(path)
    assert pure.kind == "analytical"
    params = [1.2, 4.0, 35.0]
    obs_times = [1.0, 4.0, 12.0, 24.0]

    s = Subject.builder("s").bolus(0.0, 100.0, "oral").bolus(
        12.0, 50.0, "oral").covariate("wt", 0.0, 80.0)
    for t in obs_times:
        s = s.observation(t, 0.0, "cp")
    want = np.asarray(
        runtime.model.estimate_predictions(s.build(), params).flat_predictions()
    )
    got = pure.simulate(
        params, boluses=[(0.0, 100.0, 0), (12.0, 50.0, 0)],
        obs_times=obs_times, cov={"wt": PureCovariate([(0.0, 80.0)])},
    )
    np.testing.assert_allclose([g[0] for g in got], want, rtol=1e-9)


SDE_ZERO_DIFF_SRC = """
name = portable_sde
kind = sde
params = ke, vol
states = central
particles = 16
outputs = cp
bolus(iv) -> central
dx(central) = -ke * central
noise(central) = 0.0
out(cp) = central / vol
"""


def test_pure_simulate_sde_zero_diffusion_matches_jitted(tmp_path):
    """SDE-kind artifacts simulate in the pure tier; zero diffusion
    reproduces the deterministic engines up to the EM step error."""
    from pharmsol_tpu.dsl import compile_model, save_artifact

    runtime = compile_model(SDE_ZERO_DIFF_SRC)
    path = str(tmp_path / "sde.pkm")
    save_artifact(runtime, path)
    pure = PureModel.load(path)
    assert pure.kind == "sde"
    params = [0.3, 10.0]
    obs_times = [0.5, 1.0, 2.0]

    s = Subject.builder("s").bolus(0.0, 100.0, "iv")
    for t in obs_times:
        s = s.observation(t, 0.0, "cp")
    want = np.asarray(
        runtime.model.estimate_predictions(s.build(), params).flat_predictions()
    )
    got = pure.simulate(
        params, boluses=[(0.0, 100.0, 0)], obs_times=obs_times,
        dt=0.002, nparticles=4,
    )
    # the jitted engine's adaptive EM runs at rtol/atol 1e-2 (em.rs parity)
    # with first-order steps up to 0.1; the fine fixed-step pure tier is the
    # MORE accurate side of this comparison
    np.testing.assert_allclose([g[0] for g in got], want, rtol=6e-3)


def test_pure_sde_diffusion_statements(tmp_path):
    from pharmsol_tpu.dsl import compile_model, save_artifact

    src = SDE_ZERO_DIFF_SRC.replace("noise(central) = 0.0",
                                    "noise(central) = 0.5")
    runtime = compile_model(src)
    path = str(tmp_path / "sde2.pkm")
    save_artifact(runtime, path)
    pure = PureModel.load(path)
    assert pure.diffusion([0.3, 10.0], 0.0) == [0.5]
    # stochastic mean stays near the deterministic decay
    got = pure.simulate([0.3, 10.0], boluses=[(0.0, 100.0, 0)],
                        obs_times=[1.0], dt=0.01, nparticles=64, seed=3)
    det = 100.0 * np.exp(-0.3) / 10.0
    assert abs(got[0][0] - det) < 1.0
