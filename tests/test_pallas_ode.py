"""Parity tests for the fused pallas ODE psi tier (interpret mode, f64).

The pallas ODE kernel (ops/pallas_ode.py) must match the general XLA
engine at adaptive-solver ACCURACY: both run the same embedded
Dormand-Prince 5(4) controller, but the kernel's merged march crosses
observation-only breakpoints with dense output instead of stopping, so
the two paths take different step sequences and agree at the controller's
real error level (~rtol), not bit-level. test_pallas_ode_merge.py pins
the merged march against a tight-tolerance golden; lag/SDIRK paths never
merge and keep their tighter step-identical bounds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pharmsol_tpu import (
    ODE,
    AssayErrorModel,
    AssayErrorModels,
    Data,
    ErrorPoly,
    SubjectBuilder,
)
from pharmsol_tpu.errors import PharmsolError
from pharmsol_tpu.likelihood.matrix import (
    last_engine_decision,
    log_likelihood_matrix,
)

pytestmark = pytest.mark.slow  # heavy parity tier; quick gate runs -m 'not slow'


def _ems():
    return AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0)
    )


def _subjects(n=10, infusion_every=3, obs_times=(0.5, 1.0, 2.0, 4.0, 8.0)):
    subjects = []
    for i in range(n):
        sb = SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0)
        if infusion_every and i % infusion_every == 0:
            sb = sb.infusion(2.0, 50.0, 0, 1.0)
        for t in obs_times:
            sb = sb.observation(t, float(5 * np.exp(-0.3 * t) + 0.1 * i), 0)
        subjects.append(sb.build())
    return Data(subjects)


def _two_cmt_ode():
    return ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0],
            p[0] * x[0] - p[1] * x[1] + rateiv[0],
        ]),
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    )


def _support(S=16, seed=0):
    rng = np.random.default_rng(seed)
    return np.column_stack([
        rng.uniform(0.5, 2.0, S), rng.uniform(0.05, 0.5, S),
        rng.uniform(30, 90, S),
    ])


def _rel_err(a, b):
    return np.max(np.abs(a - b) / np.maximum(np.abs(b), 1.0))


def test_ode_pallas_matches_xla_bolus_and_infusion():
    data = _subjects()
    sp = _support()
    model = _two_cmt_ode()
    psi_x = log_likelihood_matrix(model, data, sp, _ems(), engine="xla")
    psi_p = log_likelihood_matrix(model, data, sp, _ems(), engine="pallas")
    assert _rel_err(psi_p, psi_x) < 1e-4


def test_ode_pallas_nonlinear_rhs():
    # Michaelis-Menten elimination: genuinely nonlinear, no expm shortcut
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] / (p[1] + x[0]) + b[0] + rateiv[0],
        ]),
        out=lambda x, p, t, cov: x[0:1] / p[2],
        nstates=1, ndrugs=1, nout=1,
    )
    rng = np.random.default_rng(3)
    sp = np.column_stack([
        rng.uniform(5.0, 20.0, 12), rng.uniform(5.0, 30.0, 12),
        rng.uniform(20, 60, 12),
    ])
    data = _subjects(n=8)
    psi_x = log_likelihood_matrix(model, data, sp, _ems(), engine="xla")
    psi_p = log_likelihood_matrix(model, data, sp, _ems(), engine="pallas")
    assert _rel_err(psi_p, psi_x) < 1e-4


def test_ode_pallas_init_equation():
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0],
        ]),
        init=lambda p, t, cov: jnp.stack([p[2]]),
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )
    rng = np.random.default_rng(5)
    sp = np.column_stack([
        rng.uniform(0.1, 0.6, 12), rng.uniform(10, 40, 12),
        rng.uniform(0.0, 30.0, 12),
    ])
    data = _subjects(n=6, infusion_every=0)
    psi_x = log_likelihood_matrix(model, data, sp, _ems(), engine="xla")
    psi_p = log_likelihood_matrix(model, data, sp, _ems(), engine="pallas")
    assert _rel_err(psi_p, psi_x) < 1e-4


def test_ode_pallas_time_constant_covariates():
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * (cov("wt", t) / 70.0) * x[0] + b[0],
        ]),
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )
    subjects = []
    for i in range(8):
        sb = (SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0)
              .covariate("wt", 0.0, 55.0 + 5.0 * i))
        for t in (1.0, 2.0, 4.0, 8.0):
            sb = sb.observation(t, float(4 * np.exp(-0.25 * t)), 0)
        subjects.append(sb.build())
    rng = np.random.default_rng(7)
    sp = np.column_stack([
        rng.uniform(0.1, 0.6, 12), rng.uniform(10, 40, 12),
    ])
    psi_x = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="xla")
    psi_p = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="pallas")
    assert _rel_err(psi_p, psi_x) < 1e-4


def test_ode_pallas_multi_output_and_censoring():
    from pharmsol_tpu import Censor

    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0],
            p[0] * x[0] - p[1] * x[1],
        ]),
        out=lambda x, p, t, cov: jnp.stack([x[0] / p[2], x[1] / p[2]]),
        nstates=2, ndrugs=1, nout=2,
    )
    subjects = []
    for i in range(6):
        sb = SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0)
        for k, t in enumerate((0.5, 1.5, 3.0, 6.0)):
            sb = sb.observation(t, float(3 * np.exp(-0.3 * t)), k % 2)
        sb = sb.censored_observation(8.0, 0.1, 0, Censor.BLOQ)
        subjects.append(sb.build())
    ems = (AssayErrorModels()
           .add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
           .add(1, AssayErrorModel.additive(ErrorPoly(0.3, 0.15), 1.0)))
    sp = _support(12, seed=9)
    psi_x = log_likelihood_matrix(model, Data(subjects), sp, ems,
                                  engine="xla")
    psi_p = log_likelihood_matrix(model, Data(subjects), sp, ems,
                                  engine="pallas")
    # censored cells carry the kernel's ~6e-5-abs log-CDF approximation
    assert _rel_err(psi_p, psi_x) < 1e-4


def test_ode_pallas_rejects_unknown_solver():
    model = _two_cmt_ode().with_solver("bogus")
    with pytest.raises(PharmsolError, match="supports solvers"):
        log_likelihood_matrix(
            model, _subjects(n=2), _support(4), _ems(), engine="pallas"
        )


def test_ode_pallas_expm_exact_parity():
    # the fused expm march is EXACT (same Taylor/squaring chain as the
    # XLA expm path, engine/ode.py:706-776) — parity is machine-level,
    # not tolerance-level
    model = _two_cmt_ode().with_solver("expm")
    data = _subjects()
    sp = _support()
    psi_x = log_likelihood_matrix(model, data, sp, _ems(), engine="xla")
    psi_p = log_likelihood_matrix(model, data, sp, _ems(), engine="pallas")
    assert _rel_err(psi_p, psi_x) < 1e-10


def test_ode_pallas_expm_lag_fa_parity():
    # the pending-dose split march composes with the exact propagator:
    # each sub-span is one expm, so parity stays machine-level
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0],
            p[0] * x[0] - p[1] * x[1],
        ]),
        lag=lambda p, t, cov: {0: p[3]},
        fa=lambda p, t, cov: {0: p[4]},
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    ).with_solver("expm")
    subjects = []
    for i in range(6):
        sb = (SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0)
              .bolus(6.0, 80.0, 0))
        for t in (0.5, 1.0, 2.0, 4.0, 7.0, 10.0):
            sb = sb.observation(t, float(4 * np.exp(-0.25 * t) + 0.05 * i), 0)
        subjects.append(sb.build())
    rng = np.random.default_rng(23)
    sp = np.column_stack([
        rng.uniform(0.5, 2.0, 12), rng.uniform(0.05, 0.5, 12),
        rng.uniform(30, 90, 12),
        rng.uniform(0.0, 1.5, 12),   # lag
        rng.uniform(0.3, 1.0, 12),   # fa
    ])
    psi_x = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="xla")
    psi_p = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="pallas")
    assert _rel_err(psi_p, psi_x) < 1e-9


def test_ode_pallas_expm_step_covariate_parity():
    # carry-forward covariates are constant within segments (affine
    # streams with b == 0): the RHS stays autonomous and expm stays exact
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0],
            p[0] * x[0] - p[1] * (1.0 + 0.5 * cov("phase", t)) * x[1],
        ]),
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    ).with_solver("expm")
    subjects = []
    for i in range(6):
        sb = (SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0)
              .covariate("phase!", 0.0, 0.0)
              .covariate("phase!", 3.0, 1.0))
        for t in (1.0, 3.0, 5.0, 9.0):
            sb = sb.observation(t, float(3 * np.exp(-0.2 * t)), 0)
        subjects.append(sb.build())
    sp = _support(12, seed=29)
    psi_x = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="xla")
    psi_p = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="pallas")
    assert _rel_err(psi_p, psi_x) < 1e-9


def test_ode_pallas_expm_multi_output_and_init():
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0],
            p[0] * x[0] - p[1] * x[1],
        ]),
        init=lambda p, t, cov: jnp.stack([0.0, p[3]]),
        out=lambda x, p, t, cov: jnp.stack([x[1] / p[2], x[0]]),
        nstates=2, ndrugs=1, nout=2,
    ).with_solver("expm")
    subjects = []
    for i in range(6):
        sb = SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0)
        for t in (0.5, 2.0, 6.0):
            sb = sb.observation(t, float(4 * np.exp(-0.25 * t)), 0)
            sb = sb.observation(t + 0.25, float(30 * np.exp(-0.9 * t)), 1)
        subjects.append(sb.build())
    ems = AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0)
    ).add(1, AssayErrorModel.additive(ErrorPoly(1.0, 0.05), 1.0))
    rng = np.random.default_rng(31)
    sp = np.column_stack([
        rng.uniform(0.5, 2.0, 12), rng.uniform(0.05, 0.5, 12),
        rng.uniform(30, 90, 12), rng.uniform(0.0, 10.0, 12),
    ])
    psi_x = log_likelihood_matrix(model, Data(subjects), sp, ems,
                                  engine="xla")
    psi_p = log_likelihood_matrix(model, Data(subjects), sp, ems,
                                  engine="pallas")
    assert _rel_err(psi_p, psi_x) < 1e-10


def test_ode_pallas_expm_rejects_nonlinear_rhs():
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] / (p[1] + x[0]) + b[0],
        ]),
        out=lambda x, p, t, cov: x[0:1] / p[2],
        nstates=1, ndrugs=1, nout=1,
    ).with_solver("expm")
    sp = np.array([[10.0, 15.0, 30.0]])
    with pytest.raises(PharmsolError, match="AFFINE"):
        log_likelihood_matrix(model, _subjects(n=2), sp, _ems(),
                              engine="pallas")


def test_ode_pallas_expm_rejects_time_dependent_rhs():
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * (1.0 + 0.1 * t) * x[0] + b[0],
        ]),
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    ).with_solver("expm")
    sp = np.array([[0.3, 20.0]])
    with pytest.raises(PharmsolError, match="autonomous"):
        log_likelihood_matrix(model, _subjects(n=2), sp, _ems(),
                              engine="pallas")


def test_ode_pallas_expm_rejects_linear_covariate():
    # a linearly-interpolating covariate makes the in-segment RHS
    # time-dependent — expm falls back even though every knot sits on a
    # segment boundary (the adaptive tiers would accept this model)
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * (cov("wt", t) / 70.0) * x[0] + b[0],
        ]),
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    ).with_solver("expm")
    sb = (SubjectBuilder("s0").bolus(0.0, 100.0, 0)
          .covariate("wt", 0.0, 60.0)
          .covariate("wt", 2.0, 80.0))
    for t in (1.0, 2.0, 4.0):
        sb = sb.observation(t, 1.0, 0)
    sp = np.array([[0.3, 20.0]])
    with pytest.raises(PharmsolError, match="constant within segments"):
        log_likelihood_matrix(model, Data([sb.build()]), sp, _ems(),
                              engine="pallas")


def test_ode_pallas_lag_fa_parity():
    # per-support lag (pending-dose split march) + fa (amount scaling):
    # the kernel integrates to each lane's shifted dose time, applies the
    # scaled bolus, and continues — must match the XLA engine's in-jit
    # re-sorted schedule
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0],
            p[0] * x[0] - p[1] * x[1],
        ]),
        lag=lambda p, t, cov: {0: p[3]},
        fa=lambda p, t, cov: {0: p[4]},
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    )
    subjects = []
    for i in range(6):
        sb = (SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0)
              .bolus(6.0, 80.0, 0))
        for t in (0.5, 1.0, 2.0, 4.0, 7.0, 10.0):
            sb = sb.observation(t, float(4 * np.exp(-0.25 * t) + 0.05 * i), 0)
        subjects.append(sb.build())
    rng = np.random.default_rng(17)
    sp = np.column_stack([
        rng.uniform(0.5, 2.0, 12), rng.uniform(0.05, 0.5, 12),
        rng.uniform(30, 90, 12),
        rng.uniform(0.0, 1.5, 12),   # lag: spans obs times and none
        rng.uniform(0.3, 1.0, 12),   # fa
    ])
    psi_x = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="xla")
    psi_p = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="pallas")
    assert _rel_err(psi_p, psi_x) < 5e-5


def test_ode_pallas_lag_with_infusion_parity():
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0] + rateiv[0],
        ]),
        lag=lambda p, t, cov: {0: p[2]},
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )
    subjects = []
    for i in range(4):
        sb = (SubjectBuilder(f"s{i}").bolus(0.0, 50.0, 0)
              .infusion(1.0, 40.0, 0, 2.0))
        for t in (0.5, 1.5, 3.0, 5.0):
            sb = sb.observation(t, float(3 * np.exp(-0.2 * t)), 0)
        subjects.append(sb.build())
    rng = np.random.default_rng(19)
    sp = np.column_stack([
        rng.uniform(0.2, 0.8, 8), rng.uniform(10, 40, 8),
        rng.uniform(0.0, 0.9, 8),
    ])
    psi_x = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="xla")
    psi_p = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="pallas")
    assert _rel_err(psi_p, psi_x) < 5e-5


def test_ode_pallas_rejects_overlapping_lag():
    # two doses of one row must never pend simultaneously: max lag exceeds
    # the inter-dose gap -> explicit fallback error
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([-p[0] * x[0] + b[0]]),
        lag=lambda p, t, cov: {0: p[1]},
        out=lambda x, p, t, cov: x[0:1],
        nstates=1, ndrugs=1, nout=1,
    )
    sb = (SubjectBuilder("s").bolus(0.0, 50.0, 0).bolus(1.0, 50.0, 0)
          .observation(0.5, 1.0, 0).observation(3.0, 1.0, 0))
    with pytest.raises(PharmsolError, match="inter-dose gap"):
        log_likelihood_matrix(
            model, Data([sb.build()]),
            np.column_stack([np.full(4, 0.3), np.full(4, 2.5)]),
            _ems(), engine="pallas",
        )


def test_ode_auto_engine_falls_back_on_cpu():
    model = _two_cmt_ode()
    data = _subjects(n=4)
    sp = _support(8)
    psi_auto = log_likelihood_matrix(model, data, sp, _ems(), engine="auto")
    psi_x = log_likelihood_matrix(model, data, sp, _ems(), engine="xla")
    np.testing.assert_allclose(psi_auto, psi_x, rtol=1e-12)
    decision = last_engine_decision(model)
    assert decision["engine"] == "xla"
    assert "TPU" in decision["reason"] or "crossover" in decision["reason"]


def test_ode_pallas_sharded_matches_unsharded():
    from pharmsol_tpu.parallel.mesh import log_likelihood_matrix_sharded

    model = _two_cmt_ode()
    data = _subjects(n=8)
    sp = _support(8)
    ref = log_likelihood_matrix(model, data, sp, _ems(), engine="pallas")
    shd = log_likelihood_matrix_sharded(
        model, data, sp, _ems(), engine="pallas"
    )
    np.testing.assert_allclose(shd, ref, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("solver", ["trbdf2", "kvaerno3"])
def test_ode_pallas_sdirk_matches_xla(solver):
    """In-kernel SDIRK (frozen-Jacobian Newton with a per-lane inverse)
    matches the XLA implicit engines at integration tolerance."""
    model = _two_cmt_ode().with_solver(solver)
    data = _subjects(n=8)
    rng = np.random.default_rng(17)
    sp = np.column_stack([
        rng.uniform(5.0, 20.0, 12), rng.uniform(0.05, 0.5, 12),
        rng.uniform(30, 90, 12),
    ])
    psi_x = log_likelihood_matrix(model, data, sp, _ems(), engine="xla")
    psi_p = log_likelihood_matrix(model, data, sp, _ems(), engine="pallas")
    assert _rel_err(psi_p, psi_x) < 5e-4


def test_ode_pallas_sdirk_stiff_tmdd():
    """A stiff TMDD-like binding model through the pallas trbdf2 kernel."""
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] - p[2] * x[0] * x[1] + b[0],
            p[3] - p[4] * x[1] - p[2] * x[0] * x[1],
        ]),
        init=lambda p, t, cov: jnp.stack([0.0, p[3] / p[4]]),
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=2, ndrugs=1, nout=1,
    ).with_solver("trbdf2")
    subjects = []
    for i in range(4):
        sb = SubjectBuilder(f"t{i}").bolus(0.0, 50.0, 0)
        for t in (0.25, 1.0, 4.0, 12.0, 24.0):
            sb = sb.observation(t, float(2 * np.exp(-0.2 * t) + 0.05 * i), 0)
        subjects.append(sb.build())
    rng = np.random.default_rng(19)
    S = 8
    sp = np.column_stack([
        rng.uniform(0.05, 0.2, S),   # linear elimination
        rng.uniform(3.0, 6.0, S),    # volume
        rng.uniform(1.0, 5.0, S),    # binding (stiff term)
        rng.uniform(1.0, 3.0, S),    # target synthesis
        rng.uniform(0.5, 2.0, S),    # target turnover
    ])
    ems = _ems()
    psi_x = log_likelihood_matrix(model, Data(subjects), sp, ems,
                                  engine="xla")
    psi_p = log_likelihood_matrix(model, Data(subjects), sp, ems,
                                  engine="pallas")
    assert _rel_err(psi_p, psi_x) < 1e-3


def test_ode_pallas_time_varying_covariate_linear():
    # wt interpolates linearly between knots placed ON event boundaries:
    # the per-segment affine (a, b) streams must match the XLA engine's
    # global CovView interpolation exactly
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * (cov("wt", t) / 70.0) * x[0] + b[0],
        ]),
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )
    subjects = []
    for i in range(8):
        sb = (SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0)
              .covariate("wt", 0.0, 55.0 + 5.0 * i)
              .covariate("wt", 2.0, 80.0 - 3.0 * i)
              .covariate("wt", 8.0, 60.0 + 2.0 * i))
        for t in (1.0, 2.0, 4.0, 8.0):
            sb = sb.observation(t, float(4 * np.exp(-0.25 * t)), 0)
        subjects.append(sb.build())
    rng = np.random.default_rng(11)
    sp = np.column_stack([
        rng.uniform(0.1, 0.6, 12), rng.uniform(10, 40, 12),
    ])
    psi_x = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="xla")
    psi_p = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="pallas")
    assert _rel_err(psi_p, psi_x) < 1e-4


def test_ode_pallas_time_varying_covariate_fixed_step():
    # `!` fixed covariates carry forward between knots (step function);
    # the affine stream degenerates to b=0 with the carried value
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0],
            p[0] * x[0] - p[1] * (1.0 + 0.5 * cov("dose_phase", t)) * x[1],
        ]),
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    )
    subjects = []
    for i in range(6):
        sb = (SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0)
              .covariate("dose_phase!", 0.0, 0.0)
              .covariate("dose_phase!", 3.0, 1.0))
        for t in (1.0, 3.0, 5.0, 9.0):
            sb = sb.observation(t, float(3 * np.exp(-0.2 * t)), 0)
        subjects.append(sb.build())
    sp = _support(12, seed=13)
    psi_x = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="xla")
    psi_p = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="pallas")
    # looser than the linear case: at a step ending exactly on a knot the
    # XLA CovView evaluates the C=1.0 RK stage with the step covariate's
    # right-limit (new) value while the affine stream keeps the left
    # limit over the whole span (the mathematically consistent choice for
    # a discontinuous RHS) — the disagreement is a stage-level artifact
    # bounded by the integration tolerance, not a stream error
    assert _rel_err(psi_p, psi_x) < 5e-4


def test_ode_pallas_rejects_interior_covariate_knot():
    # a knot strictly inside an integration segment cannot be expressed
    # as a per-segment affine stream -> explicit fallback error
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * (cov("wt", t) / 70.0) * x[0] + b[0],
        ]),
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )
    sb = (SubjectBuilder("s0").bolus(0.0, 100.0, 0)
          .covariate("wt", 0.0, 70.0)
          .covariate("wt", 2.5, 80.0))  # 2.5 is not an event time
    for t in (1.0, 2.0, 4.0):
        sb = sb.observation(t, 1.0, 0)
    sp = np.array([[0.3, 20.0]])
    with pytest.raises(PharmsolError, match="segment boundaries"):
        log_likelihood_matrix(model, Data([sb.build()]), sp, _ems(),
                              engine="pallas")


def test_ode_pallas_lag_with_time_varying_covariate():
    # lag/fa closures that do NOT read the varying covariate compose with
    # per-segment affine covariate streams: the pending-dose split march
    # stays inside one segment, where the (a, b) stream is valid
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * (cov("wt", t) / 70.0) * x[0] + b[0],
            p[0] * (cov("wt", t) / 70.0) * x[0] - p[1] * x[1],
        ]),
        lag=lambda p, t, cov: {0: p[3]},
        fa=lambda p, t, cov: {0: p[4]},
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    )
    subjects = []
    for i in range(6):
        sb = (SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0)
              .bolus(6.0, 80.0, 0)
              .covariate("wt", 0.0, 55.0 + 4.0 * i)
              .covariate("wt", 2.0, 80.0 - 3.0 * i)
              .covariate("wt", 10.0, 60.0 + 2.0 * i))
        for t in (0.5, 1.0, 2.0, 4.0, 7.0, 10.0):
            sb = sb.observation(t, float(4 * np.exp(-0.25 * t) + 0.05 * i), 0)
        subjects.append(sb.build())
    rng = np.random.default_rng(23)
    sp = np.column_stack([
        rng.uniform(0.5, 2.0, 12), rng.uniform(0.05, 0.5, 12),
        rng.uniform(30, 90, 12),
        rng.uniform(0.0, 1.5, 12),   # lag
        rng.uniform(0.3, 1.0, 12),   # fa
    ])
    psi_x = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="xla")
    psi_p = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="pallas")
    assert _rel_err(psi_p, psi_x) < 5e-5


def test_ode_pallas_lag_reading_varying_covariate_parity():
    # a lag closure READING a time-varying covariate rides the exact
    # per-dose-segment planes (lag evaluated at each bolus's ORIGINAL
    # breakpoint time with the engine's CovView interpolation)
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0],
            p[0] * x[0] - p[1] * x[1],
        ]),
        lag=lambda p, t, cov: {0: p[3] * cov("wt", t) / 70.0},
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    )
    subjects = []
    for i in range(4):
        sb = (SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0)
              .bolus(6.0, 80.0, 0)
              .covariate("wt", 0.0, 55.0 + 3.0 * i)
              .covariate("wt", 2.0, 85.0 - 2.0 * i)
              .covariate("wt", 10.0, 60.0 + 1.0 * i))
        for t in (0.5, 1.0, 2.0, 4.0, 7.0, 10.0):
            sb = sb.observation(t, float(4 * np.exp(-0.25 * t) + 0.05 * i), 0)
        subjects.append(sb.build())
    rng = np.random.default_rng(31)
    sp = np.column_stack([
        rng.uniform(0.5, 2.0, 8), rng.uniform(0.05, 0.5, 8),
        rng.uniform(30, 90, 8),
        rng.uniform(0.0, 1.1, 8),   # lag scale: effective lag varies by wt
    ])
    psi_x = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="xla")
    psi_p = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="pallas")
    assert _rel_err(psi_p, psi_x) < 5e-5


def test_ode_pallas_time_dependent_lag_fa_parity():
    # time-DEPENDENT lag and fa closures: lag evaluated at each bolus's
    # own time, fa at the lag-SHIFTED time (add_lagtime runs first —
    # structs.rs:611-666) — both per-dose-segment planes
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0],
            p[0] * x[0] - p[1] * x[1],
        ]),
        lag=lambda p, t, cov: {0: p[3] / (1.0 + 0.1 * t)},
        fa=lambda p, t, cov: {0: p[4] / (1.0 + 0.05 * t)},
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    )
    subjects = []
    for i in range(4):
        sb = (SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0)
              .bolus(6.0, 80.0, 0))
        for t in (0.5, 1.0, 2.0, 4.0, 7.0, 10.0):
            sb = sb.observation(t, float(4 * np.exp(-0.25 * t) + 0.05 * i), 0)
        subjects.append(sb.build())
    rng = np.random.default_rng(37)
    sp = np.column_stack([
        rng.uniform(0.5, 2.0, 8), rng.uniform(0.05, 0.5, 8),
        rng.uniform(30, 90, 8),
        rng.uniform(0.0, 1.4, 8),   # lag
        rng.uniform(0.3, 1.0, 8),   # fa
    ])
    psi_x = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="xla")
    psi_p = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="pallas")
    assert _rel_err(psi_p, psi_x) < 5e-5


def test_ode_pallas_bdf_parity():
    # in-kernel variable-order BDF (1-5): accuracy-level parity vs the
    # XLA bdf engine (different step/order sequences, same tolerances)
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0],
            p[0] * x[0] - p[1] * x[1],
        ]),
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    ).with_solver("bdf")
    subjects = []
    for i in range(4):
        sb = SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0).bolus(6.0, 80.0, 0)
        for t in (0.5, 1.0, 2.0, 4.0, 7.0, 10.0):
            sb = sb.observation(t, float(4 * np.exp(-0.25 * t) + 0.05 * i), 0)
        subjects.append(sb.build())
    rng = np.random.default_rng(3)
    sp = np.column_stack([
        rng.uniform(0.5, 2.0, 8), rng.uniform(0.05, 0.5, 8),
        rng.uniform(30, 90, 8),
    ])
    psi_x = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="xla")
    psi_p = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="pallas")
    assert _rel_err(psi_p, psi_x) < 5e-4


def test_ode_pallas_bdf_stiff_parity():
    # widely separated rates (ka up to 500/h vs ke ~0.3/h): the stiff
    # regime bdf exists for — order/step adaptation must hold per lane
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0],
            p[0] * x[0] - p[1] * x[1],
        ]),
        out=lambda x, p, t, cov: x[1:2],
        nstates=2, ndrugs=1, nout=1,
    ).with_solver("bdf")
    sb = SubjectBuilder("s").bolus(0.0, 50.0, 0)
    for t in (0.1, 0.5, 1.0, 3.0, 8.0):
        sb = sb.observation(t, 1.0, 0)
    sp = np.column_stack([
        np.array([50.0, 200.0, 500.0, 20.0]),
        np.array([0.3, 0.5, 0.2, 0.4]),
    ])
    psi_x = log_likelihood_matrix(model, Data([sb.build()]), sp, _ems(),
                                  engine="xla")
    psi_p = log_likelihood_matrix(model, Data([sb.build()]), sp, _ems(),
                                  engine="pallas")
    assert _rel_err(psi_p, psi_x) < 1e-3


def test_ode_pallas_bdf_with_lag_and_infusion():
    # bdf composes with the pending-dose split march and rate streams
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0] + rateiv[0],
            p[0] * x[0] - p[1] * x[1],
        ]),
        lag=lambda p, t, cov: {0: p[3]},
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    ).with_solver("bdf")
    sb = (SubjectBuilder("s").bolus(0.0, 100.0, 0)
          .infusion(2.0, 40.0, 0, 1.5))
    for t in (0.5, 1.0, 2.5, 4.0, 7.0):
        sb = sb.observation(t, 1.0, 0)
    rng = np.random.default_rng(9)
    sp = np.column_stack([
        rng.uniform(0.5, 2.0, 8), rng.uniform(0.05, 0.5, 8),
        rng.uniform(30, 90, 8), rng.uniform(0.0, 1.2, 8),
    ])
    psi_x = log_likelihood_matrix(model, Data([sb.build()]), sp, _ems(),
                                  engine="xla")
    psi_p = log_likelihood_matrix(model, Data([sb.build()]), sp, _ems(),
                                  engine="pallas")
    assert _rel_err(psi_p, psi_x) < 5e-4


def test_ode_pallas_multi_input_time_dependent_lag_parity():
    # per-dose-segment slot tables compose with per-input pending slots:
    # two bolus inputs, each with a time-dependent lag
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0],
            -p[1] * x[1] + b[1],
            p[0] * x[0] + p[1] * x[1] - p[2] * x[2],
        ]),
        lag=lambda p, t, cov: {0: p[3] / (1.0 + 0.1 * t),
                               1: p[4] / (1.0 + 0.2 * t)},
        out=lambda x, p, t, cov: x[2:3],
        nstates=3, ndrugs=2, nout=1,
    )
    sb = (SubjectBuilder("s").bolus(0.0, 80.0, 0).bolus(0.5, 50.0, 1)
          .bolus(8.0, 80.0, 0)
          .observation(2.0, 1.5, 0).observation(5.0, 0.8, 0)
          .observation(11.0, 0.4, 0))
    rng = np.random.default_rng(7)
    sp = np.column_stack([
        rng.uniform(0.4, 1.5, 8), rng.uniform(0.8, 2.5, 8),
        rng.uniform(0.05, 0.4, 8),
        rng.uniform(0.0, 1.5, 8), rng.uniform(0.0, 1.0, 8),
    ])
    psi_x = log_likelihood_matrix(model, Data([sb.build()]), sp, _ems(),
                                  engine="xla")
    psi_p = log_likelihood_matrix(model, Data([sb.build()]), sp, _ems(),
                                  engine="pallas")
    assert _rel_err(psi_p, psi_x) < 5e-5


def test_ode_pallas_multi_input_bolus_parity():
    # two drugs dosed into different RHS inputs: per-input bolus streams +
    # per-input probed bolus maps (ode/mod.rs:644-687 generalized)
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0],
            -p[1] * x[1] + b[1],
            p[0] * x[0] + p[1] * x[1] - p[2] * x[2],
        ]),
        out=lambda x, p, t, cov: x[2:3] / p[3],
        nstates=3, ndrugs=2, nout=1,
    )
    subjects = []
    for i in range(6):
        sb = (SubjectBuilder(f"s{i}")
              .bolus(0.0, 100.0, 0)
              .bolus(1.0, 60.0, 1)
              .bolus(6.0, 40.0, 0))
        for t in (0.5, 1.5, 3.0, 5.0, 8.0):
            sb = sb.observation(t, float(4 * np.exp(-0.25 * t) + 0.05 * i), 0)
        subjects.append(sb.build())
    rng = np.random.default_rng(29)
    sp = np.column_stack([
        rng.uniform(0.5, 2.0, 12), rng.uniform(0.3, 1.2, 12),
        rng.uniform(0.05, 0.5, 12), rng.uniform(20, 60, 12),
    ])
    psi_x = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="xla")
    psi_p = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="pallas")
    assert _rel_err(psi_p, psi_x) < 5e-5


def test_ode_pallas_multi_input_infusion_parity():
    # infusions into a non-zero input ride their own rate stream and reach
    # the RHS at the right rateiv slot
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0] + rateiv[1],
            p[0] * x[0] - p[1] * x[1] + rateiv[0],
        ]),
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=2, nout=1,
    )
    subjects = []
    for i in range(4):
        sb = (SubjectBuilder(f"s{i}").bolus(0.0, 50.0, 0)
              .infusion(1.0, 40.0, 1, 2.0)
              .infusion(4.0, 30.0, 0, 1.5))
        for t in (0.5, 1.5, 3.0, 5.0, 7.0):
            sb = sb.observation(t, float(3 * np.exp(-0.2 * t)), 0)
        subjects.append(sb.build())
    rng = np.random.default_rng(31)
    sp = np.column_stack([
        rng.uniform(0.3, 1.0, 8), rng.uniform(0.05, 0.4, 8),
        rng.uniform(10, 40, 8),
    ])
    psi_x = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="xla")
    psi_p = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="pallas")
    assert _rel_err(psi_p, psi_x) < 5e-5


def test_ode_pallas_lag_fa_multi_input_parity():
    # per-input pending-dose slots: two bolus inputs with DIFFERENT lags
    # and bioavailabilities; both doses can fire inside the same segment
    # (the kernel's split march takes one pass per input, ordered by the
    # per-lane fire times) — must match the XLA engine's re-sorted
    # schedule
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0],
            -p[1] * x[1] + b[1],
            p[0] * x[0] + p[1] * x[1] - p[2] * x[2],
        ]),
        lag=lambda p, t, cov: {0: p[4], 1: p[5]},
        fa=lambda p, t, cov: {0: p[6], 1: 0.85},
        out=lambda x, p, t, cov: x[2:3] / p[3],
        nstates=3, ndrugs=2, nout=1,
    )
    subjects = []
    for i in range(5):
        sb = (SubjectBuilder(f"s{i}")
              .bolus(0.0, 100.0, 0).bolus(0.3, 60.0, 1)
              .bolus(8.0, 100.0, 0).bolus(8.3, 60.0, 1))
        for t in (0.5, 1.0, 2.0, 4.0, 7.0, 10.0, 14.0):
            sb = sb.observation(t, float(3 * np.exp(-0.2 * t) + 0.04 * i), 0)
        subjects.append(sb.build())
    rng = np.random.default_rng(23)
    sp = np.column_stack([
        rng.uniform(0.5, 2.0, 12), rng.uniform(0.8, 3.0, 12),
        rng.uniform(0.05, 0.5, 12), rng.uniform(30, 90, 12),
        rng.uniform(0.0, 1.4, 12),   # lag input 0: spans obs times and none
        rng.uniform(0.0, 0.9, 12),   # lag input 1
        rng.uniform(0.3, 1.0, 12),   # fa input 0
    ])
    psi_x = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="xla")
    psi_p = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="pallas")
    assert _rel_err(psi_p, psi_x) < 5e-5


def test_ode_pallas_lag_multi_input_same_fire_segment():
    # both inputs' lagged doses fire inside ONE segment, in a per-lane
    # ORDER that differs across supports (input 0 first on some lanes,
    # input 1 first on others) — exercises the sorted multi-pass split
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0],
            -1.3 * p[0] * x[1] + b[1],
            p[0] * x[0] + 1.3 * p[0] * x[1] - p[1] * x[2],
        ]),
        lag=lambda p, t, cov: {0: p[2], 1: p[3]},
        out=lambda x, p, t, cov: x[2:3],
        nstates=3, ndrugs=2, nout=1,
    )
    sb = (SubjectBuilder("s").bolus(0.0, 80.0, 0).bolus(0.0, 50.0, 1)
          .observation(3.0, 1.5, 0).observation(6.0, 0.8, 0))
    rng = np.random.default_rng(5)
    sp = np.column_stack([
        rng.uniform(0.4, 1.5, 8), rng.uniform(0.05, 0.4, 8),
        rng.uniform(0.1, 2.5, 8),   # lag 0: sometimes before, sometimes
        rng.uniform(0.1, 2.5, 8),   # lag 1: after the other input's
    ])
    psi_x = log_likelihood_matrix(model, Data([sb.build()]), sp, _ems(),
                                  engine="xla")
    psi_p = log_likelihood_matrix(model, Data([sb.build()]), sp, _ems(),
                                  engine="pallas")
    assert _rel_err(psi_p, psi_x) < 5e-5


def test_ode_pallas_covariate_dependent_init():
    # init reads a covariate: rides per-(row, support) init planes
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0],
        ]),
        init=lambda p, t, cov: jnp.stack([p[2] * cov("wt", t) / 70.0]),
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )
    subjects = []
    for i in range(6):
        sb = (SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0)
              .covariate("wt", 0.0, 55.0 + 6.0 * i))
        for t in (0.5, 1.0, 2.0, 4.0, 8.0):
            sb = sb.observation(t, float(4 * np.exp(-0.25 * t)), 0)
        subjects.append(sb.build())
    rng = np.random.default_rng(41)
    sp = np.column_stack([
        rng.uniform(0.1, 0.6, 12), rng.uniform(10, 40, 12),
        rng.uniform(5.0, 30.0, 12),
    ])
    psi_x = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="xla")
    psi_p = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="pallas")
    assert _rel_err(psi_p, psi_x) < 1e-4


def test_ode_pallas_covariate_dependent_init_varying_cov():
    # the init covariate varies in time: init must use its t=0 value while
    # the RHS sees the per-segment affine interpolation
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * (cov("crcl", t) / 100.0) * x[0] + b[0],
        ]),
        init=lambda p, t, cov: jnp.stack([p[2] * cov("crcl", t) / 100.0]),
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )
    subjects = []
    for i in range(6):
        sb = (SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0)
              .covariate("crcl", 0.0, 80.0 + 4.0 * i)
              .covariate("crcl", 4.0, 60.0 + 4.0 * i))
        for t in (0.5, 1.0, 2.0, 4.0, 8.0):
            sb = sb.observation(t, float(4 * np.exp(-0.25 * t)), 0)
        subjects.append(sb.build())
    rng = np.random.default_rng(43)
    sp = np.column_stack([
        rng.uniform(0.1, 0.6, 12), rng.uniform(10, 40, 12),
        rng.uniform(5.0, 30.0, 12),
    ])
    psi_x = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="xla")
    psi_p = log_likelihood_matrix(model, Data(subjects), sp, _ems(),
                                  engine="pallas")
    assert _rel_err(psi_p, psi_x) < 1e-4


def test_ode_pallas_state_dependent_bolus_rhs_diff():
    """Nonlinear/state-dependent bolus mappings run the reference's
    RHS-difference trick IN-KERNEL (ode/mod.rs:644-687) instead of
    rejecting — the probe only picks static-map vs rhs_diff mode."""
    from pharmsol_tpu.likelihood.matrix import _PallasOdePsiPlan
    from pharmsol_tpu.ops.pallas_psi import SUB_TILE

    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0] * (1.0 + 0.05 * x[1]),
            p[0] * x[0] - p[1] * x[1] + rateiv[0],
        ]),
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    )
    subs = []
    for i in range(5):
        sb = SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0).bolus(4.0, 60.0, 0)
        if i % 2 == 0:
            sb = sb.infusion(1.0, 30.0, 0, 0.8)
        for t in (0.5, 1.5, 3.0, 5.0, 8.0):
            sb = sb.observation(t, float(5 * np.exp(-0.3 * t) + 0.1 * i), 0)
        subs.append(sb.build())
    rng = np.random.default_rng(4)
    sp = np.column_stack([
        rng.uniform(0.8, 1.6, 6), rng.uniform(0.15, 0.4, 6),
        rng.uniform(8, 14, 6),
    ])
    grid = model.lower(Data(subs).subjects())
    lowered = _ems().lower(model.resolve_output_label, model.nouteqs())
    plan = _PallasOdePsiPlan(
        model, grid, np.asarray(sp, np.float64), lowered,
        row_multiple=SUB_TILE,
    )
    assert plan.bolus_rhs_diff
    px = log_likelihood_matrix(model, Data(subs), sp, _ems(), engine="xla")
    pp = log_likelihood_matrix(model, Data(subs), sp, _ems(),
                               engine="pallas")
    rel = np.max(np.abs(pp - px) / np.maximum(np.abs(px), 1.0))
    assert rel < 5e-4, rel


def test_ode_pallas_amount_nonlinear_bolus_rhs_diff():
    # saturable dose entry: b[0]/(1 + 0.002 b[0]) — amount-nonlinear
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0] / (1.0 + 0.002 * b[0]),
            p[0] * x[0] - p[1] * x[1],
        ]),
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    )
    subs = []
    for i in range(4):
        sb = SubjectBuilder(f"n{i}").bolus(0.0, 100.0, 0).bolus(4.0, 60.0, 0)
        for t in (0.5, 1.5, 3.0, 6.0):
            sb = sb.observation(t, float(5 * np.exp(-0.3 * t) + 0.1 * i), 0)
        subs.append(sb.build())
    rng = np.random.default_rng(5)
    sp = np.column_stack([
        rng.uniform(0.8, 1.6, 6), rng.uniform(0.15, 0.4, 6),
        rng.uniform(8, 14, 6),
    ])
    px = log_likelihood_matrix(model, Data(subs), sp, _ems(), engine="xla")
    pp = log_likelihood_matrix(model, Data(subs), sp, _ems(),
                               engine="pallas")
    rel = np.max(np.abs(pp - px) / np.maximum(np.abs(px), 1.0))
    assert rel < 5e-4, rel


def test_ode_pallas_state_dependent_bolus_with_lag():
    # the split-march fire sites apply the RHS-difference too: a lagged
    # dose whose mapping reads the state at FIRE time must match the
    # engine's per-support grid placement exactly (accuracy-level)
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0] * (1.0 + 0.03 * x[1]),
            p[0] * x[0] - p[1] * x[1],
        ]),
        lag=lambda p, t, cov: {0: p[3]},
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    )
    subs = []
    for i in range(4):
        sb = SubjectBuilder(f"l{i}").bolus(0.0, 100.0, 0).bolus(5.0, 60.0, 0)
        for t in (0.5, 1.5, 3.0, 6.0, 9.0):
            sb = sb.observation(t, float(5 * np.exp(-0.3 * t) + 0.1 * i), 0)
        subs.append(sb.build())
    rng = np.random.default_rng(6)
    sp = np.column_stack([
        rng.uniform(0.8, 1.6, 6), rng.uniform(0.15, 0.4, 6),
        rng.uniform(8, 14, 6), rng.uniform(0.2, 1.2, 6),
    ])
    px = log_likelihood_matrix(model, Data(subs), sp, _ems(), engine="xla")
    pp = log_likelihood_matrix(model, Data(subs), sp, _ems(),
                               engine="pallas")
    rel = np.max(np.abs(pp - px) / np.maximum(np.abs(px), 1.0))
    assert rel < 5e-4, rel


def test_ode_pallas_vector_style_rhs_stacked():
    """Round 4: RHS styles the LaneVec shim cannot trace —
    jnp.zeros_like(x) + .at updates + whole-vector arithmetic — retry
    with the stacked-ARRAY representation (make_stacked_rhs) instead of
    falling back to XLA; the last ODE-tier model-class exclusion."""
    from pharmsol_tpu.likelihood.matrix import _PallasOdePsiPlan
    from pharmsol_tpu.ops.pallas_psi import SUB_TILE

    def diffeq(x, p, t, b, rateiv, cov):
        dx = jnp.zeros_like(x)
        dx = dx.at[0].set(-p[0] * x[0] + b[0])
        dx = dx.at[1].set(p[0] * x[0] - p[1] * x[1] + rateiv[0])
        return dx

    model = ODE(diffeq, out=lambda x, p, t, cov: x[1:2] / p[2],
                nstates=2, ndrugs=1, nout=1)
    subs = []
    for i in range(5):
        sb = SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0)
        if i % 2 == 0:
            sb = sb.infusion(1.0, 30.0, 0, 0.8)
        for t in (0.5, 1.5, 3.0, 6.0):
            sb = sb.observation(t, float(5 * np.exp(-0.3 * t) + 0.1 * i), 0)
        subs.append(sb.build())
    rng = np.random.default_rng(4)
    sp = np.column_stack([
        rng.uniform(0.8, 1.6, 6), rng.uniform(0.15, 0.4, 6),
        rng.uniform(8, 14, 6),
    ])
    grid = model.lower(Data(subs).subjects())
    lowered = _ems().lower(model.resolve_output_label, model.nouteqs())
    plan = _PallasOdePsiPlan(
        model, grid, np.asarray(sp, np.float64), lowered,
        row_multiple=SUB_TILE,
    )
    assert plan.rhs_style == "stacked"
    px = log_likelihood_matrix(model, Data(subs), sp, _ems(), engine="xla")
    pp = log_likelihood_matrix(model, Data(subs), sp, _ems(),
                               engine="pallas")
    rel = np.max(np.abs(pp - px) / np.maximum(np.abs(px), 1.0))
    assert rel < 5e-4, rel
