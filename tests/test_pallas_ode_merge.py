"""Merged-march dense-output tier of the fused pallas ODE psi kernel.

Observation-only breakpoints (no dose on any row, unchanged rate/covariate
streams, contiguous times) no longer stop the adaptive march: the kernel
crosses them and captures each interior observation from the DP5
dense-output interpolant (ops/pallas_ode.py). These tests pin

- the host-side span computation (_ode_merge_runs) against dose/rate/
  covariate blockers,
- engine-level parity: merged vs plain march vs a tight-tolerance golden
  (the merged march takes DIFFERENT steps, so agreement is accuracy-based,
  not step-identical),
- failure poisoning (-inf) and censoring/multi-output interior capture.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pharmsol_tpu import (
    ODE,
    AssayErrorModel,
    AssayErrorModels,
    Censor,
    Data,
    ErrorPoly,
    SubjectBuilder,
)
from pharmsol_tpu.likelihood.matrix import (
    _ode_merge_runs,
    _PallasOdePsiPlan,
    log_likelihood_matrix,
)
from pharmsol_tpu.ops.pallas_psi import SUB_TILE


def _ems():
    return AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0)
    )


def _rel(a, b):
    return np.max(np.abs(a - b) / np.maximum(np.abs(b), 1.0))


def _two_cmt():
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


def _plan(model, data, sp):
    grid = model.lower(list(data))
    lowered = _ems().lower(model.resolve_output_label, model.nouteqs())
    return _PallasOdePsiPlan(model, grid, sp, lowered,
                             row_multiple=SUB_TILE)


def test_merge_runs_blocked_by_doses_and_rates():
    """Dose and infusion-rate breakpoints split the spans; observation-only
    ones merge."""
    subjects = []
    for i in range(4):
        sb = SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0)
        if i == 0:
            sb = sb.infusion(2.0, 50.0, 0, 1.0)  # rate change at 2.0, 3.0
        sb = sb.bolus(4.0, 50.0, 0)
        for t in (0.5, 1.0, 2.0, 3.0, 5.0, 6.0, 8.0):
            sb = sb.observation(t, 1.0, 0)
        subjects.append(sb.build())
    plan = _plan(_two_cmt(), Data(subjects), _support())
    runs = plan.merge_runs
    assert runs is not None
    # spans tile the schedule consecutively
    assert runs[0][0] == 0
    for (a, b), (c, d) in zip(runs, runs[1:]):
        assert b == c and b > a
    assert runs[-1][1] == plan.M
    assert any(b - a > 1 for a, b in runs)  # something actually merged
    # every column where a dose lands or the infusion rate changes (on any
    # row) must begin a run — read the blockers straight off the streams
    starts = {a for a, _ in runs}
    bol = np.asarray(plan.padded[1], np.float64)
    rate = np.asarray(plan.padded[2], np.float64)
    blocked = 0
    for m in range(1, plan.M):
        if np.any(bol[:, m] != 0.0) or np.any(rate[:, m] != rate[:, m - 1]):
            assert m in starts, (m, runs)
            blocked += 1
    assert blocked >= 3  # bolus at 4.0 + infusion start/end


def test_merge_runs_env_kill_switch():
    sb = SubjectBuilder("s").bolus(0.0, 100.0, 0)
    for t in (1.0, 2.0, 4.0):
        sb = sb.observation(t, 1.0, 0)
    data = Data([sb.build()])
    os.environ["PHARMSOL_ODE_NO_MERGE"] = "1"
    try:
        assert _plan(_two_cmt(), data, _support()).merge_runs is None
    finally:
        del os.environ["PHARMSOL_ODE_NO_MERGE"]
    assert _plan(_two_cmt(), data, _support()).merge_runs is not None


@pytest.mark.slow
def test_merged_march_accuracy_vs_tight_golden():
    """The merged march takes different steps than the stop-at-every-
    breakpoint march, so they agree at ACCURACY level (both within the
    rtol=1e-4 controller's real error of a tight golden), not step-level.
    """
    subjects = []
    for i in range(8):
        sb = SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0)
        for t in (0.5, 1.0, 2.0, 3.0, 4.0, 6.0, 8.0, 10.0, 12.0):
            sb = sb.observation(t, float(5 * np.exp(-0.3 * t) + 0.1 * i), 0)
        subjects.append(sb.build())
    data = Data(subjects)
    sp = _support()
    model = _two_cmt()

    plan_m = _plan(model, data, sp)
    assert plan_m.merge_runs is not None
    out_m = np.asarray(
        plan_m.runner()(*plan_m.stream_args(), *plan_m.rep_args()),
        np.float64,
    )
    plan_m.merge_runs = None
    out_p = np.asarray(
        plan_m.runner()(*plan_m.stream_args(), *plan_m.rep_args()),
        np.float64,
    )
    grid = model.lower(list(data))
    psi_m = plan_m.finalize(out_m, grid)
    psi_p = plan_m.finalize(out_p, grid)

    tight = ODE(
        model._diffeq, out=model._out, nstates=2, ndrugs=1, nout=1,
    ).with_tolerances(1e-8, 1e-8)
    psi_t = log_likelihood_matrix(tight, data, sp, _ems(), engine="xla")
    # merged error vs the golden stays within ~3x of the plain march's
    assert _rel(psi_m, psi_t) < 3.0 * max(_rel(psi_p, psi_t), 1e-6), (
        _rel(psi_m, psi_t), _rel(psi_p, psi_t)
    )
    assert _rel(psi_m, psi_p) < 1e-4


@pytest.mark.slow
def test_merged_march_censoring_multi_output_interior():
    """Censored + multi-output observations in span interiors ride the
    dense-output capture."""
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0],
            p[0] * x[0] - p[1] * x[1],
        ]),
        out=lambda x, p, t, cov: jnp.stack([x[1] / p[2], x[0] / p[2]]),
        nstates=2, ndrugs=1, nout=2,
    )
    subjects = []
    for i in range(6):
        sb = SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0)
        for j, t in enumerate((0.5, 1.0, 2.0, 4.0, 8.0)):
            oe = j % 2
            if j == 2:
                sb = sb.censored_observation(
                    t, 0.2, oe, Censor.BLOQ
                )
            else:
                sb = sb.observation(t, float(3 * np.exp(-0.2 * t)), oe)
        subjects.append(sb.build())
    data = Data(subjects)
    rng = np.random.default_rng(7)
    sp = np.column_stack([
        rng.uniform(0.5, 2.0, 12), rng.uniform(0.05, 0.5, 12),
        rng.uniform(30, 90, 12),
    ])
    ems = AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0)
    ).add(1, AssayErrorModel.additive(ErrorPoly(0.4, 0.05), 1.0))

    grid = model.lower(list(data))
    lowered = ems.lower(model.resolve_output_label, model.nouteqs())
    plan = _PallasOdePsiPlan(model, grid, sp, lowered, row_multiple=SUB_TILE)
    assert plan.merge_runs is not None and any(
        b - a > 1 for a, b in plan.merge_runs
    )
    psi_p = log_likelihood_matrix(model, data, sp, ems, engine="pallas")
    psi_x = log_likelihood_matrix(model, data, sp, ems, engine="xla")
    assert _rel(psi_p, psi_x) < 1e-4


@pytest.mark.slow
def test_merged_march_duplicate_time_observation():
    """An observation sharing its time with the previous breakpoint (a
    zero-dt interior column) reads the exact span-start state."""
    sb = SubjectBuilder("s").bolus(0.0, 100.0, 0)
    sb = sb.observation(1.0, 4.0, 0).observation(1.0, 4.5, 0)
    sb = sb.observation(3.0, 2.0, 0)
    data = Data([sb.build()])
    sp = _support(S=8, seed=3)
    psi_p = log_likelihood_matrix(_two_cmt(), data, sp, _ems(),
                                  engine="pallas")
    psi_x = log_likelihood_matrix(_two_cmt(), data, sp, _ems(),
                                  engine="xla")
    assert _rel(psi_p, psi_x) < 1e-4


@pytest.mark.slow
def test_merged_march_poisons_failed_lanes():
    """A lane that exhausts its step budget poisons every cell it feeds
    (-inf), interior dense-output captures included."""
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            p[0] * x[0] * x[0] + b[0],  # finite-time blow-up for p[0] > 0
        ]),
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    ).with_max_steps(200)
    sb = SubjectBuilder("s").bolus(0.0, 5.0, 0)
    for t in (0.5, 1.0, 2.0, 4.0):
        sb = sb.observation(t, 1.0, 0)
    data = Data([sb.build()])
    sp = np.column_stack([
        np.array([1.0, 2.0, 0.001, 0.002]),
        np.array([10.0, 10.0, 10.0, 10.0]),
    ])
    psi_p = log_likelihood_matrix(model, data, sp, _ems(), engine="pallas")
    psi_x = log_likelihood_matrix(model, data, sp, _ems(), engine="xla")
    # blow-up supports -> -inf on both engines; finite ones agree
    assert np.isneginf(psi_p[0, 0]) and np.isneginf(psi_p[0, 1])
    assert np.isneginf(psi_x[0, 0]) and np.isneginf(psi_x[0, 1])
    assert np.all(np.isfinite(psi_p[0, 2:]))
    assert _rel(psi_p[:, 2:], psi_x[:, 2:]) < 1e-4


@pytest.mark.slow
def test_merged_march_sdirk_hermite_capture():
    """The stiff SDIRK tier merges too: interior observations captured
    with cubic Hermite (order-matched for trbdf2/kvaerno3)."""
    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[0] * x[0] + b[0],
            p[0] * x[0] - p[1] * x[1],
        ]),
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    ).with_solver("kvaerno3")
    subjects = []
    for i in range(4):
        sb = SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0)
        for t in (0.5, 1.0, 2.0, 4.0, 8.0, 12.0):
            sb = sb.observation(t, float(4 * np.exp(-0.25 * t) + 0.1 * i), 0)
        subjects.append(sb.build())
    data = Data(subjects)
    sp = _support(S=8, seed=11)

    plan = _plan(model, data, sp)
    assert plan.merge_runs is not None and any(
        b - a > 1 for a, b in plan.merge_runs
    )
    psi_m = log_likelihood_matrix(model, data, sp, _ems(), engine="pallas")
    tight = ODE(
        model._diffeq, out=model._out, nstates=2, ndrugs=1, nout=1,
    ).with_solver("kvaerno3").with_tolerances(1e-7, 1e-7)
    psi_t = log_likelihood_matrix(tight, data, sp, _ems(), engine="xla")
    assert _rel(psi_m, psi_t) < 1e-3  # 2nd/3rd-order controller at 1e-4


def test_derived_dense_interpolants():
    """dense_P_for derives a 4th-order quartic interpolant from the
    continuous-extension order conditions for any supported 5(4) tableau
    (reproducing dopri5's published class, covering tsit5 which has no
    committed constants)."""
    from pharmsol_tpu.ops.pallas_ode import (
        _TABLEAUS, _derive_dense_P, dense_P_for,
    )

    def step_and_interp(P, A, B, h, theta):
        y, ks = 1.0, []
        for i in range(len(P)):
            yi = y + h * sum(a * k for a, k in zip(A[i], ks))
            ks.append(-yi)  # y' = -y
        return y + h * sum(
            k * theta * (p[0] + theta * (p[1] + theta * (p[2] + theta * p[3])))
            for k, p in zip(ks, P)
        )

    for solver in ("dopri5", "tsit5"):
        A, B, E, C = _TABLEAUS[solver]
        P = dense_P_for(solver)
        assert P is not None, solver
        for row, b in zip(P, B):  # theta=1 reproduces the step weights
            assert abs(sum(row) - b) < 1e-10
        errs = [
            max(abs(step_and_interp(P, A, B, h, th) - np.exp(-h * th))
                for th in (0.25, 0.5, 0.75))
            for h in (0.1, 0.05)
        ]
        order = np.log2(errs[0] / errs[1])
        assert errs[0] < 1e-7 and order > 4.0, (solver, errs, order)


@pytest.mark.slow
def test_merged_march_tsit5_derived_interpolant():
    """tsit5 merges via its DERIVED interpolant and matches the XLA tsit5
    engine at accuracy level."""
    model = _two_cmt().with_solver("tsit5")
    subjects = []
    for i in range(6):
        sb = SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0)
        for t in (0.5, 1.0, 2.0, 4.0, 8.0, 12.0):
            sb = sb.observation(t, float(4 * np.exp(-0.25 * t) + 0.1 * i), 0)
        subjects.append(sb.build())
    data = Data(subjects)
    sp = _support(S=8, seed=13)
    plan = _plan(model, data, sp)
    assert plan.merge_runs is not None and any(
        b - a > 1 for a, b in plan.merge_runs
    )
    psi_p = log_likelihood_matrix(model, data, sp, _ems(), engine="pallas")
    psi_x = log_likelihood_matrix(model, data, sp, _ems(), engine="xla")
    assert _rel(psi_p, psi_x) < 1e-4
