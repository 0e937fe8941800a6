"""Parity tests for the fused pallas SDE particle-filter psi tier.

Zero-diffusion models are EXACT vs the XLA SDE engine (same EM controller
law, no noise dependence). Stochastic parity is statistical: the kernel's
on-core draws are independent per (row, support, trial), so fixed-seed
bitwise equality across engines is not defined — matching the reference's
own thread-local-RNG non-reproducibility (sde/mod.rs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pharmsol_tpu import (
    SDE,
    AssayErrorModel,
    AssayErrorModels,
    Data,
    ErrorPoly,
    Subject,
    SubjectBuilder,
)
from pharmsol_tpu.errors import PharmsolError
from pharmsol_tpu.likelihood.matrix import log_likelihood_matrix

pytestmark = pytest.mark.slow  # heavy parity tier; quick gate runs -m 'not slow'


def _ems(factor=0.5):
    return AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.5, 0.0, 0.0, 0.0), factor)
    )


def test_sde_pallas_zero_diffusion_exact():
    sde = SDE(
        drift=lambda x, p, t, rateiv, cov: jnp.stack(
            [-p[0] * x[0] + rateiv[0]]
        ),
        diffusion=lambda p, t, cov: jnp.stack([0.0]),
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nparticles=16, nstates=1, ndrugs=1, nout=1, seed=3,
    )
    subs = []
    for i in range(5):
        sb = SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0)
        if i % 2 == 0:
            sb = sb.infusion(0.5, 20.0, 0, 0.5)
        for t in (0.3, 0.8, 1.5):
            sb = sb.observation(t, float(8 * np.exp(-0.3 * t) + 0.1 * i), 0)
        subs.append(sb.build())
    rng = np.random.default_rng(4)
    sp = np.column_stack([rng.uniform(0.2, 0.6, 6), rng.uniform(8, 14, 6)])
    px = log_likelihood_matrix(sde, Data(subs), sp, _ems(), engine="xla")
    pp = log_likelihood_matrix(sde, Data(subs), sp, _ems(), engine="pallas")
    rel = np.max(np.abs(pp - px) / np.maximum(np.abs(px), 1.0))
    assert rel < 1e-9, rel


def test_sde_pallas_sharded_zero_diffusion_matches_unsharded():
    """shard_map routes SDE models to _PallasSdePsiPlan; with zero
    diffusion the filter is deterministic, so the 8-device virtual-mesh
    psi must equal the unsharded pallas psi exactly (the per-shard RNG
    streams differ but are never consulted when sigma == 0)."""
    from pharmsol_tpu.parallel.mesh import (
        log_likelihood_matrix_sharded, population_mesh,
    )

    sde = SDE(
        drift=lambda x, p, t, rateiv, cov: jnp.stack(
            [-p[0] * x[0] + rateiv[0]]
        ),
        diffusion=lambda p, t, cov: jnp.stack([0.0]),
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nparticles=16, nstates=1, ndrugs=1, nout=1, seed=3,
    )
    subs = []
    for i in range(10):
        sb = SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0)
        for t in (0.3, 0.8, 1.5):
            sb = sb.observation(t, float(8 * np.exp(-0.3 * t) + 0.1 * i), 0)
        subs.append(sb.build())
    rng = np.random.default_rng(11)
    sp = np.column_stack([rng.uniform(0.2, 0.6, 6), rng.uniform(8, 14, 6)])
    want = log_likelihood_matrix(sde, Data(subs), sp, _ems(),
                                 engine="pallas")
    mesh = population_mesh()
    got = log_likelihood_matrix_sharded(
        sde, Data(subs), sp, _ems(), mesh=mesh, engine="pallas"
    )
    assert got.shape == (10, 6)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_sde_pallas_stochastic_statistical_parity():
    def make(seed):
        return SDE(
            drift=lambda x, p, t, rateiv, cov: jnp.stack(
                [-x[0] * x[1], -x[1] + p[0]]
            ),
            diffusion=lambda p, t, cov: jnp.stack([1.0, 0.01]),
            init=lambda p, t, cov: jnp.stack([0.0, 1.0]),
            out=lambda x, p, t, cov: x[0:1],
            nparticles=400, nstates=2, ndrugs=1, nout=1, seed=seed,
        )

    s = (Subject.builder("id1").bolus(0.0, 20.0, 0)
         .observation(0.2, 16.6434, 0).observation(0.4, 14.3233, 0)
         .observation(0.6, 9.8468, 0).observation(0.8, 9.4177, 0)
         .observation(1.0, 7.5170, 0).build())
    ems = _ems(factor=0.0)
    sp = np.array([[1.0]])
    xla = [float(log_likelihood_matrix(make(i), Data([s]), sp, ems,
                                       engine="xla")[0, 0])
           for i in range(4)]
    pal = [float(log_likelihood_matrix(make(i), Data([s]), sp, ems,
                                       engine="pallas")[0, 0])
           for i in range(4)]
    assert all(np.isfinite(v) for v in xla + pal)
    assert abs(np.mean(xla) - np.mean(pal)) < 0.6, (xla, pal)


def test_sde_pallas_rejections():
    base = dict(
        drift=lambda x, p, t, rateiv, cov: jnp.stack([-p[0] * x[0]]),
        diffusion=lambda p, t, cov: jnp.stack([0.1]),
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nparticles=8, nstates=1, ndrugs=1, nout=1,
    )
    s = (SubjectBuilder("s").bolus(0.0, 100.0, 0)
         .observation(1.0, 5.0, 0).build())
    sp = np.array([[0.3, 10.0]])

    # systematic resampling stays on the XLA engine
    m = SDE(**base).with_resampling("systematic")
    with pytest.raises(PharmsolError, match="stratified"):
        log_likelihood_matrix(m, Data([s]), sp, _ems(), engine="pallas")

    # censoring is supported since round 4 (see
    # test_sde_pallas_censoring_*); only systematic resampling and
    # non-traceable closures reject now


def test_sde_pallas_covariate_dependent_init_zero_diffusion():
    # init reads a covariate: rides per-(row, support) init planes; zero
    # diffusion makes parity exact vs the XLA SDE engine
    sde = SDE(
        drift=lambda x, p, t, rateiv, cov: jnp.stack([-p[0] * x[0]]),
        diffusion=lambda p, t, cov: jnp.stack([0.0]),
        init=lambda p, t, cov: jnp.stack([p[1] * cov("wt", t) / 70.0]),
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nparticles=16, nstates=1, ndrugs=1, nout=1, seed=5,
    )
    subs = []
    for i in range(5):
        sb = (SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0)
              .covariate("wt", 0.0, 55.0 + 6.0 * i))
        for t in (0.3, 0.8, 1.5):
            sb = sb.observation(t, float(8 * np.exp(-0.3 * t) + 0.1 * i), 0)
        subs.append(sb.build())
    rng = np.random.default_rng(6)
    sp = np.column_stack([rng.uniform(0.2, 0.6, 6), rng.uniform(8, 14, 6)])
    px = log_likelihood_matrix(sde, Data(subs), sp, _ems(), engine="xla")
    pp = log_likelihood_matrix(sde, Data(subs), sp, _ems(), engine="pallas")
    rel = np.max(np.abs(pp - px) / np.maximum(np.abs(px), 1.0))
    assert rel < 1e-9, rel


def test_sde_pallas_coupled_em_control():
    # coupled controller threads through the plan: zero-diffusion exact
    # vs the XLA engine in the same mode
    def make(sig, em_control):
        return SDE(
            drift=lambda x, p, t, rateiv, cov: jnp.stack([-p[0] * x[0]]),
            diffusion=lambda p, t, cov: jnp.stack([sig]),
            out=lambda x, p, t, cov: x[0:1] / p[1],
            nparticles=64, nstates=1, ndrugs=1, nout=1, seed=3,
            em_control=em_control,
        )

    subs = []
    for i in range(5):
        sb = SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0)
        for t in (0.3, 0.8, 1.5):
            sb = sb.observation(t, float(8 * np.exp(-0.3 * t) + 0.1 * i), 0)
        subs.append(sb.build())
    rng = np.random.default_rng(4)
    sp = np.column_stack([rng.uniform(0.2, 0.6, 6), rng.uniform(8, 14, 6)])
    px = log_likelihood_matrix(make(0.0, "coupled"), Data(subs), sp, _ems(),
                               engine="xla")
    pp = log_likelihood_matrix(make(0.0, "coupled"), Data(subs), sp, _ems(),
                               engine="pallas")
    rel = np.max(np.abs(pp - px) / np.maximum(np.abs(px), 1.0))
    assert rel < 1e-9, rel
    # stochastic: coupled pallas within filter noise of coupled XLA
    ll_x = float(log_likelihood_matrix(make(0.3, "coupled"), Data(subs[:1]),
                                       sp[:1], _ems(), engine="xla")[0, 0])
    ll_p = float(log_likelihood_matrix(make(0.3, "coupled"), Data(subs[:1]),
                                       sp[:1], _ems(), engine="pallas")[0, 0])
    assert np.isfinite(ll_x) and np.isfinite(ll_p)
    assert abs(ll_x - ll_p) < 1.0, (ll_x, ll_p)


def test_sde_pallas_multi_input_zero_diffusion_exact():
    """Round 4: multi-input boluses + infusions ride per-input streams
    (inject-to-destination identity mapping, sde/mod.rs:46-79); zero
    diffusion makes parity exact vs the XLA SDE engine."""
    sde = SDE(
        drift=lambda x, p, t, rateiv, cov: jnp.stack([
            -p[0] * x[0] + rateiv[1],
            p[0] * x[0] - p[1] * x[1] + rateiv[0],
        ]),
        diffusion=lambda p, t, cov: jnp.stack([0.0, 0.0]),
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nparticles=8, nstates=2, ndrugs=2, nout=1, seed=3,
    )
    subs = []
    for i in range(3):
        sb = (SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0)
              .bolus(0.4, 60.0, 1).infusion(0.8, 40.0, 1, 0.5))
        for t in (0.3, 1.5):
            sb = sb.observation(t, float(8 * np.exp(-0.3 * t) + 0.1 * i), 0)
        subs.append(sb.build())
    rng = np.random.default_rng(4)
    sp = np.column_stack([
        rng.uniform(0.3, 0.8, 4), rng.uniform(0.2, 0.6, 4),
        rng.uniform(8, 14, 4),
    ])
    px = log_likelihood_matrix(sde, Data(subs), sp, _ems(), engine="xla")
    pp = log_likelihood_matrix(sde, Data(subs), sp, _ems(), engine="pallas")
    rel = np.max(np.abs(pp - px) / np.maximum(np.abs(px), 1.0))
    assert rel < 1e-9, rel


def test_sde_pallas_lag_fa_zero_diffusion_exact():
    """Round 4: static lag/fa ride per-(row, support) planes + the
    in-kernel pending-dose split march; the EM controller restarts at
    the fire exactly like the engine's per-support grid split, so zero
    diffusion is EXACT."""
    sde = SDE(
        drift=lambda x, p, t, rateiv, cov: jnp.stack([-p[0] * x[0]]),
        diffusion=lambda p, t, cov: jnp.stack([0.0]),
        lag=lambda p, t, cov: {0: p[2]},
        fa=lambda p, t, cov: {0: p[3]},
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nparticles=8, nstates=1, ndrugs=1, nout=1, seed=3,
    )
    subs = []
    for i in range(3):
        sb = SubjectBuilder(f"t{i}").bolus(0.0, 100.0, 0).bolus(2.0, 50.0, 0)
        for t in (0.5, 1.2, 2.6):
            sb = sb.observation(t, float(6 * np.exp(-0.3 * t) + 0.1 * i), 0)
        subs.append(sb.build())
    rng = np.random.default_rng(5)
    sp = np.column_stack([
        rng.uniform(0.8, 1.6, 4), rng.uniform(8, 14, 4),
        rng.uniform(0.1, 1.0, 4), rng.uniform(0.4, 1.0, 4),
    ])
    px = log_likelihood_matrix(sde, Data(subs), sp, _ems(), engine="xla")
    pp = log_likelihood_matrix(sde, Data(subs), sp, _ems(), engine="pallas")
    rel = np.max(np.abs(pp - px) / np.maximum(np.abs(px), 1.0))
    assert rel < 1e-9, rel


def test_sde_pallas_tv_covariate_zero_diffusion_exact():
    """Round 4: time-varying covariates ride per-segment affine (a, b)
    streams (knot-free spans; knots on breakpoints), exact vs the
    engine's global CovView interpolation at zero diffusion."""
    sde = SDE(
        drift=lambda x, p, t, rateiv, cov: jnp.stack(
            [-p[0] * (cov("wt", t) / 70.0) * x[0]]
        ),
        diffusion=lambda p, t, cov: jnp.stack([0.0]),
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nparticles=8, nstates=1, ndrugs=1, nout=1, seed=3,
    )
    subs = []
    for i in range(3):
        sb = (SubjectBuilder(f"u{i}").bolus(0.0, 100.0, 0)
              .covariate("wt", 0.0, 55.0 + 4 * i)
              .covariate("wt", 0.9, 70.0 - 3 * i))
        for t in (0.3, 0.9, 1.5):
            sb = sb.observation(t, float(8 * np.exp(-0.3 * t) + 0.1 * i), 0)
        subs.append(sb.build())
    rng = np.random.default_rng(6)
    sp = np.column_stack([rng.uniform(0.2, 0.6, 4), rng.uniform(8, 14, 4)])
    px = log_likelihood_matrix(sde, Data(subs), sp, _ems(), engine="xla")
    pp = log_likelihood_matrix(sde, Data(subs), sp, _ems(), engine="pallas")
    rel = np.max(np.abs(pp - px) / np.maximum(np.abs(px), 1.0))
    assert rel < 1e-9, rel


def test_sde_pallas_lag_stochastic_finite():
    """Stochastic + lag: both engines produce finite LLs within filter
    noise of each other (statistical parity only — independent draws)."""
    def make(seed):
        return SDE(
            drift=lambda x, p, t, rateiv, cov: jnp.stack([-p[0] * x[0]]),
            diffusion=lambda p, t, cov: jnp.stack([0.3]),
            lag=lambda p, t, cov: {0: p[2]},
            out=lambda x, p, t, cov: x[0:1] / p[1],
            nparticles=256, nstates=1, ndrugs=1, nout=1, seed=seed,
        )

    sb = SubjectBuilder("s0").bolus(0.0, 100.0, 0)
    for t in (0.5, 1.2, 2.6):
        sb = sb.observation(t, float(6 * np.exp(-0.3 * t)), 0)
    data = Data([sb.build()])
    sp = np.array([[1.0, 10.0, 0.4]])
    ll_x = float(log_likelihood_matrix(make(1), data, sp, _ems(),
                                       engine="xla")[0, 0])
    ll_p = float(log_likelihood_matrix(make(1), data, sp, _ems(),
                                       engine="pallas")[0, 0])
    assert np.isfinite(ll_x) and np.isfinite(ll_p)
    assert abs(ll_x - ll_p) < 1.0, (ll_x, ll_p)


def test_sde_pallas_dynamic_lag_fa_zero_diffusion_exact():
    """Round 4: TIME-DEPENDENT lag/fa closures ride exact per-dose-
    segment planes with static slot tables (ODE-tier mechanism); zero
    diffusion keeps parity exact vs the XLA engine's per-support grid
    shift."""
    sde = SDE(
        drift=lambda x, p, t, rateiv, cov: jnp.stack([-p[0] * x[0]]),
        diffusion=lambda p, t, cov: jnp.stack([0.0]),
        lag=lambda p, t, cov: {0: p[2] * (1.0 + 0.05 * t)},
        fa=lambda p, t, cov: {0: 1.0 / (1.0 + 0.02 * t)},
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nparticles=8, nstates=1, ndrugs=1, nout=1, seed=3,
    )
    subs = []
    for i in range(3):
        sb = SubjectBuilder(f"d{i}").bolus(0.0, 100.0, 0).bolus(2.0, 50.0, 0)
        for t in (0.5, 1.2, 2.6, 3.5):
            sb = sb.observation(t, float(6 * np.exp(-0.3 * t) + 0.1 * i), 0)
        subs.append(sb.build())
    rng = np.random.default_rng(7)
    sp = np.column_stack([
        rng.uniform(0.8, 1.6, 4), rng.uniform(8, 14, 4),
        rng.uniform(0.1, 0.5, 4),
    ])
    px = log_likelihood_matrix(sde, Data(subs), sp, _ems(), engine="xla")
    pp = log_likelihood_matrix(sde, Data(subs), sp, _ems(), engine="pallas")
    rel = np.max(np.abs(pp - px) / np.maximum(np.abs(px), 1.0))
    assert rel < 1e-9, rel


def test_sde_pallas_censoring_zero_diffusion_matches_ode():
    """Round 4: censored observations weight particles by normcdf/ccdf
    (reference parity: exp(Prediction::log_likelihood), sde/mod.rs:560
    + prediction.rs:105-125). At zero diffusion every particle follows
    the deterministic trajectory, so the SDE mean-weight LL must equal
    the deterministic ODE engine's censored log-likelihood — a
    cross-engine oracle, and XLA-vs-pallas must agree exactly."""
    from pharmsol_tpu import Censor, ODE

    def drift(x, p, t, rateiv, cov):
        return jnp.stack([-p[0] * x[0]])

    sde = SDE(
        drift=drift,
        diffusion=lambda p, t, cov: jnp.stack([0.0]),
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nparticles=8, nstates=1, ndrugs=1, nout=1, seed=3,
    )
    ode = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([-p[0] * x[0] + b[0]]),
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )
    subs = []
    for i in range(3):
        sb = (SubjectBuilder(f"c{i}").bolus(0.0, 100.0, 0)
              .observation(0.3, float(8 * np.exp(-0.3 * 0.3) + 0.1 * i), 0)
              .censored_observation(1.5, 0.5, 0, Censor.BLOQ)
              .censored_observation(0.1, 9.0, 0, Censor.ALOQ))
        subs.append(sb.build())
    rng = np.random.default_rng(4)
    sp = np.column_stack([rng.uniform(0.2, 0.6, 4), rng.uniform(8, 14, 4)])
    ll_sde_x = log_likelihood_matrix(sde, Data(subs), sp, _ems(),
                                     engine="xla")
    ll_sde_p = log_likelihood_matrix(sde, Data(subs), sp, _ems(),
                                     engine="pallas")
    ll_ode = log_likelihood_matrix(ode, Data(subs), sp, _ems(),
                                   engine="xla")
    rel_x = np.max(np.abs(ll_sde_x - ll_ode) / np.maximum(np.abs(ll_ode), 1.0))
    rel_p = np.max(np.abs(ll_sde_p - ll_ode) / np.maximum(np.abs(ll_ode), 1.0))
    # EM integrates at rtol=atol=1e-2 (em.rs parity) vs the ODE engine's
    # 1e-4, and the LL amplifies prediction error by ~z/sigma — a few
    # percent is the honest cross-engine bound; the censoring TERMS are
    # exact (same normcdf law on both sides)
    assert rel_x < 5e-2, rel_x
    assert rel_p < 5e-2, rel_p
    # XLA-vs-pallas at zero diffusion: same EM law, near-exact (the
    # kernel's log_ndtr is an approximation, ~6e-5 abs)
    rel_xp = np.max(np.abs(ll_sde_p - ll_sde_x)
                    / np.maximum(np.abs(ll_sde_x), 1.0))
    assert rel_xp < 1e-4, rel_xp
