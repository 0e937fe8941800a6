"""Gradient-based MAP fitting (optimize/map.py) — beyond the reference.

L-BFGS on the exact jax gradient of Equation.log_likelihood_fn, with
Laplace (inverse-Hessian) standard errors. The reference's optimizer is
derivative-free Nelder-Mead (optimize/parameters.rs); this surface has no
counterpart there.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pharmsol_tpu as pst
from pharmsol_tpu import (
    ODE,
    Analytical,
    AssayErrorModel,
    AssayErrorModels,
    Data,
    ErrorPoly,
    Subject,
)
from pharmsol_tpu.errors import PharmsolError
from pharmsol_tpu.optimize import fit_map

TRUE_P = np.array([1.2, 0.25, 12.0])


def _synth_data(n=6, seed=0):
    rng = np.random.default_rng(seed)
    subjects = []
    for i in range(n):
        sb = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
        for t in (0.5, 1.0, 2.0, 4.0, 8.0, 12.0):
            ka, ke, v = TRUE_P
            c = 100.0 * ka / (ka - ke) * (np.exp(-ke * t) - np.exp(-ka * t)) / v
            sb = sb.observation(
                float(t), float(c * (1 + 0.03 * rng.standard_normal())), 0
            )
        subjects.append(sb.build())
    return Data(subjects)


def _ems():
    return AssayErrorModels().add(
        0, AssayErrorModel.proportional(ErrorPoly(0.0, 0.03), 1.0)
    )


def _model():
    return Analytical(
        pst.one_compartment_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    )


def test_fit_map_recovers_true_parameters():
    res = fit_map(_model(), _synth_data(), _ems(), [0.8, 0.4, 8.0])
    assert res.converged
    assert np.all(np.abs(res.parameters - TRUE_P) / TRUE_P < 0.15)
    assert res.standard_errors is not None
    assert np.all(np.isfinite(res.standard_errors))
    assert np.all(res.standard_errors > 0)
    # Laplace covariance is symmetric PSD on the natural scale
    C = res.covariance
    assert np.allclose(C, C.T, rtol=1e-8)
    assert np.all(np.linalg.eigvalsh(C) > 0)
    assert "converged" in res.summary()


def test_fit_map_prior_shrinks_toward_prior_mean():
    data = _synth_data(n=2, seed=3)  # little data -> the prior matters
    ml = fit_map(_model(), data, _ems(), [0.8, 0.4, 8.0])
    mean = jnp.asarray([2.0, 0.1, 20.0])

    def prior(p):
        return -0.5 * jnp.sum(((jnp.log(p) - jnp.log(mean)) / 0.2) ** 2)

    mp = fit_map(_model(), data, _ems(), [0.8, 0.4, 8.0],
                 prior_logpdf=prior)
    assert mp.converged
    # every component moves from the ML estimate toward the prior mean
    for i in range(3):
        assert (abs(np.log(mp.parameters[i]) - np.log(float(mean[i])))
                < abs(np.log(ml.parameters[i]) - np.log(float(mean[i]))))
    assert mp.log_likelihood <= ml.log_likelihood + 1e-9


@pytest.mark.slow
def test_fit_map_expm_ode_engine():
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0],
            p[0] * x[0] - p[1] * x[1],
        ]),
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    ).with_solver("expm")
    res = fit_map(model, _synth_data(), _ems(), [0.8, 0.4, 8.0])
    assert res.converged
    assert np.all(np.abs(res.parameters - TRUE_P) / TRUE_P < 0.15)


@pytest.mark.slow
def test_fit_map_adaptive_solver_forward_mode():
    # dopri5 integrates under lax.while_loop: fit_map must route its
    # gradients through the jacfwd custom_vjp shim and still converge
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0],
            p[0] * x[0] - p[1] * x[1],
        ]),
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    )
    res = fit_map(model, _synth_data(3), _ems(), [0.8, 0.4, 8.0])
    assert res.converged
    assert np.all(np.abs(res.parameters - TRUE_P) / TRUE_P < 0.15)
    assert res.standard_errors is not None


def test_fit_map_rejects_sde_and_bad_x0():
    from pharmsol_tpu import SDE

    sde = SDE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([-p[0] * x[0] + b[0]]),
        diffusion=lambda p: jnp.asarray([0.1]),
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1, nparticles=8,
    )
    with pytest.raises(PharmsolError, match="SDE"):
        fit_map(sde, _synth_data(1), _ems(), [0.3, 10.0])
    with pytest.raises(PharmsolError, match="positive"):
        fit_map(_model(), _synth_data(1), _ems(), [0.8, -0.4, 8.0])
    # ka == ke is the flip-flop singularity of the oral kernel: the
    # objective is non-finite there and fit_map must say so up front
    with pytest.raises(PharmsolError, match="non-finite"):
        fit_map(_model(), _synth_data(1), _ems(), [0.5, 0.5, 8.0])


def test_fit_map_reuses_compiled_programs_across_same_shaped_data():
    # bootstrap / cross-validation workflow: refitting a different Data
    # of the same padded shapes must NOT retrace — the lowered data rides
    # as jit operands and the compiled optimizer lives in a cache on the
    # model keyed by program structure
    m = _model()
    ems = _ems()
    r1 = fit_map(m, _synth_data(seed=0), ems, [0.8, 0.4, 8.0])
    cache = m.__dict__["_fit_map_jit"]
    assert len(cache) == 1
    _, value_fn, step, _, _ = next(iter(cache.values()))
    traces = (value_fn._cache_size(), step._cache_size())
    r2 = fit_map(m, _synth_data(seed=1), ems, [0.8, 0.4, 8.0])
    assert len(cache) == 1
    assert (value_fn._cache_size(), step._cache_size()) == traces
    assert r1.converged and r2.converged
    # different noise realizations -> different optima (really refit)
    assert not np.allclose(r1.parameters, r2.parameters)
