"""Nonparametric adaptive-grid population fit (optimize/npag.py).

The reference ships the psi matrix FOR an external NPAG driver (SURVEY
§3.2; matrix.rs:52); this suite exercises the in-framework population
loop built on that matrix: NPML weight solve, condensation, batched
adaptive-grid expansion with the reference's D-score
(optimize/parameters.rs:19-120), and the posterior surface.
"""

import numpy as np
import pytest

import pharmsol_tpu as pst
from pharmsol_tpu import (
    Analytical,
    AssayErrorModel,
    AssayErrorModels,
    Data,
    ErrorPoly,
    Route,
    Subject,
    metadata,
)
from pharmsol_tpu.errors import PharmsolError
from pharmsol_tpu.optimize import fit_population
from pharmsol_tpu.optimize.npag import _halton, _solve_weights

# bimodal 1-cmt IV population: a fast-eliminator and a slow-eliminator
# cluster — the case nonparametric estimation exists for
KE_MODES = (0.12, 0.45)
V_TRUE = 10.0


def _model():
    return Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )


def _population(n_per_mode=6, noise=0.02, seed=1, input_label=0, out_label=0):
    rng = np.random.default_rng(seed)
    subjects = []
    for m, ke_mode in enumerate(KE_MODES):
        for i in range(n_per_mode):
            ke = ke_mode * (1 + 0.05 * rng.standard_normal())
            sb = Subject.builder(f"m{m}s{i}").bolus(0.0, 100.0, input_label)
            for t in (1.0, 3.0, 6.0, 12.0, 24.0):
                c = 100.0 * np.exp(-ke * t) / V_TRUE
                sb = sb.observation(
                    float(t),
                    float(c * (1 + noise * rng.standard_normal())),
                    out_label,
                )
            subjects.append(sb.build())
    return Data(subjects)


def _ems(out_label=0):
    return AssayErrorModels().add(
        out_label, AssayErrorModel.proportional(ErrorPoly(0.0, 0.05), 1.0)
    )


def test_halton_fills_unit_cube():
    h = _halton(256, 3)
    assert h.shape == (256, 3)
    assert np.all((h > 0) & (h < 1))
    # low-discrepancy: every octant of the cube gets points
    for d in range(3):
        assert np.sum(h[:, d] < 0.5) > 90


def test_solve_weights_matches_analytic_two_point():
    # two support points, psi known: NPML weights solve a 1-D problem
    # with an interior optimum we can verify by brute force
    psi = np.array([[1.0, 0.2], [0.3, 1.0], [0.9, 0.4], [0.2, 0.8]])
    lam, pyl, ll = _solve_weights(psi)
    grid = np.linspace(1e-6, 1 - 1e-6, 20001)
    lls = np.sum(np.log(np.outer(psi[:, 0], grid)
                        + np.outer(psi[:, 1], 1 - grid)), axis=0)
    best = grid[np.argmax(lls)]
    assert abs(lam[0] - best) < 1e-4
    assert abs(ll - lls.max()) < 1e-8
    # gradient condition: D_j == n on the support
    d = (psi / pyl[:, None]).sum(axis=0)
    assert np.allclose(d, psi.shape[0], atol=1e-6)


@pytest.mark.slow
def test_fit_population_recovers_bimodal_ke():
    res = fit_population(
        _model(), _population(), _ems(),
        [(0.05, 0.8), (5.0, 20.0)],
        init_points=64, max_cycles=40,
    )
    assert res.converged
    assert np.isclose(res.weights.sum(), 1.0)
    # optimality: no grid point scores above n (within tolerance)
    assert res.d_max < 1e-3 * res.posterior.shape[0]
    # the fitted mixture is bimodal in ke: mass near both modes
    ke, w = res.support[:, 0], res.weights
    for mode in KE_MODES:
        near = np.abs(ke - mode) / mode < 0.15
        assert w[near].sum() > 0.25, (mode, res.summary())
    # v is unimodal at the truth
    v_mean = float(res.weights @ res.support[:, 1])
    assert abs(v_mean - V_TRUE) / V_TRUE < 0.1
    # posterior classification: subjects built from mode 0 put most
    # posterior mass on low-ke points
    post_ke = res.individual_posterior_means()[:, 0]
    assert np.all(post_ke[:6] < 0.3) and np.all(post_ke[6:] > 0.3)
    assert "support points" in res.summary()


@pytest.mark.slow
def test_fit_population_named_ranges_and_refine():
    md = (metadata.new("m").parameters(["ke", "v"]).states(["central"])
          .outputs(["cp"]).routes([Route.bolus("iv").to_state("central")]))
    model = _model().with_metadata(md)
    res = fit_population(
        model, _population(n_per_mode=4, input_label="iv", out_label="cp"),
        _ems("cp"),
        {"v": (5.0, 20.0), "ke": (0.05, 0.8)},
        init_points=48, max_cycles=25, refine="nm",
    )
    assert res.parameter_names == ("ke", "v")
    assert res.log_likelihood > -np.inf
    assert res.support.shape[1] == 2


@pytest.mark.slow
def test_fit_population_sharded_matches_unsharded():
    from pharmsol_tpu.parallel.mesh import population_mesh

    data = _population(n_per_mode=3)
    kwargs = dict(init_points=32, max_cycles=12)
    base = fit_population(_model(), data, _ems(),
                          [(0.05, 0.8), (5.0, 20.0)], **kwargs)
    shard = fit_population(_model(), data, _ems(),
                           [(0.05, 0.8), (5.0, 20.0)],
                           mesh=population_mesh(shape=(4, 2)), **kwargs)
    # psi sharded == unsharded numerically, so the whole deterministic
    # fit must agree
    assert base.support.shape == shard.support.shape
    np.testing.assert_allclose(base.support, shard.support, rtol=1e-10)
    np.testing.assert_allclose(base.weights, shard.weights, rtol=1e-8)
    assert np.isclose(base.log_likelihood, shard.log_likelihood)


def test_fit_population_validates_inputs():
    with pytest.raises(PharmsolError, match="hi > lo"):
        fit_population(_model(), _population(1), _ems(),
                       [(0.5, 0.1), (5.0, 20.0)], init_points=8)
    with pytest.raises(PharmsolError, match="metadata"):
        fit_population(_model(), _population(1), _ems(),
                       {"ke": (0.1, 0.5), "v": (5.0, 20.0)}, init_points=8)
    with pytest.raises(PharmsolError, match="refine"):
        fit_population(_model(), _population(1), _ems(),
                       [(0.05, 0.8), (5.0, 20.0)], init_points=8,
                       max_cycles=1, refine="bogus")
