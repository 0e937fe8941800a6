"""Lag + time-varying/time-dependent seq: per-COLUMN exact planes.

The last analytical-tier residue: a lag moves each dose's seq-reset
breakpoint to the per-(row, support) fire time. With a STATIC lag plane
those fire times are host-known scalars, so the engine's full event walk
(static resets/compounds plus each lane's own fires, engine sort-rank
tie order) is computable per (row, support, kernel column) —
`_decompose_seq_colplanes` walks it through each row's real CovView and
the kernel runs a true split march with a per-column POST-fire slot
stream (`_make_kernel lag_post`). Parity vs the XLA engine is f64-exact.

Reference semantics: structs.rs:611-666 (lag shifts bolus times),
analytical/mod.rs:331,360 (seq reset/carry per spanned segment).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import pharmsol_tpu as pst
from pharmsol_tpu import (
    Analytical,
    AssayErrorModel,
    AssayErrorModels,
    Data,
    ErrorPoly,
    Subject,
)
from pharmsol_tpu.likelihood.matrix import log_likelihood_matrix

pytestmark = pytest.mark.slow  # pallas interpret parity tier


def _ems():
    return AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0)
    )


def _subjects(n=6, with_inf=True, multi_dose=True):
    out = []
    for i in range(n):
        sb = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
        if multi_dose:
            sb = sb.bolus(6.0, 80.0, 0)
        if with_inf and i % 2 == 0:
            sb = sb.infusion(3.0, 50.0, 0, 1.0)
        sb = (
            sb.covariate("wt", 0.0, 55.0 + 4.0 * i)
            .covariate("wt", 4.0, 62.0 + 3.0 * i)
            .covariate("wt", 8.0, 50.0 + 2.0 * i)
        )
        for t in (0.5, 1.5, 3.5, 5.0, 7.5, 10.0):
            sb = sb.observation(t, float(4 * np.exp(-0.25 * t) + 0.05 * i), 0)
        out.append(sb.build())
    return Data(out)


def _check(model, data, sp, tol=1e-9):
    x = log_likelihood_matrix(model, data, sp, _ems(), engine="xla")
    p = log_likelihood_matrix(model, data, sp, _ems(), engine="pallas")
    err = np.max(np.abs(p - x) / np.maximum(np.abs(x), 1.0))
    assert err < tol, err


def test_lag_affine_tv_seq_all_regimens():
    # residue flavor 1: lag + per-segment AFFINE seq (tv covariate),
    # support-dependent lag so fire times differ per lane
    rng = np.random.RandomState(11)
    model = Analytical(
        pst.one_compartment_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[2],
        seq_eq=lambda p, t, cov: jnp.stack(
            [p[0], p[1] * (cov("wt", t) / 70.0) ** 0.75, p[2], p[3]]
        ),
        lag=lambda p, t, cov: {0: p[3]},
        nstates=2, ndrugs=1, nout=1,
    )
    sp = np.column_stack([
        rng.uniform(0.8, 2.0, 12), rng.uniform(0.1, 0.3, 12),
        rng.uniform(8, 15, 12), rng.uniform(0.1, 1.2, 12),
    ])
    for md in (False, True):
        for wi in (False, True):
            _check(model, _subjects(with_inf=wi, multi_dose=md), sp)


def test_lag_nonaffine_tv_seq_mixing():
    # residue flavor 2: lag + parameter-mixing seq over a tv covariate
    rng = np.random.RandomState(12)
    model = Analytical(
        pst.one_compartment_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[2],
        seq_eq=lambda p, t, cov: jnp.stack([
            p[0] * (cov("wt", t) / 70.0) ** p[3],
            p[1] * jnp.exp(-0.001 * p[0] * cov("wt", t)), p[2], p[3],
        ]),
        lag=lambda p, t, cov: {0: 0.4 + 0.5 * p[3]},
        nstates=2, ndrugs=1, nout=1,
    )
    sp = np.column_stack([
        rng.uniform(0.8, 2.0, 12), rng.uniform(0.1, 0.3, 12),
        rng.uniform(8, 15, 12), rng.uniform(0.4, 1.0, 12),
    ])
    for md in (False, True):
        for wi in (False, True):
            _check(model, _subjects(with_inf=wi, multi_dose=md), sp)


def test_lag_time_dependent_seq():
    # lag + seq reading t (no covariates): the fire-ending segment
    # applies seq AT the per-lane fire time
    rng = np.random.RandomState(13)
    model = Analytical(
        pst.one_compartment_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[2],
        seq_eq=lambda p, t, cov: jnp.stack([
            p[0] * jnp.exp(-0.02 * p[1] * t), p[1], p[2], p[3],
        ]),
        lag=lambda p, t, cov: {0: p[3]},
        nstates=2, ndrugs=1, nout=1,
    )
    sp = np.column_stack([
        rng.uniform(0.8, 2.0, 12), rng.uniform(0.1, 0.3, 12),
        rng.uniform(8, 15, 12), rng.uniform(0.2, 1.2, 12),
    ])
    subs = []
    for i in range(6):
        sb = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0).bolus(6.0, 80.0, 0)
        for t in (0.5, 1.5, 3.5, 5.0, 7.5, 10.0):
            sb = sb.observation(t, float(4 * np.exp(-0.25 * t)), 0)
        subs.append(sb.build())
    _check(model, Data(subs), sp)


def test_lag_fire_crossing_observations():
    # lag long enough that fires cross one or two observation resets:
    # the per-lane interleaving (fire before/after an obs, varying by
    # support) must match the engine exactly
    rng = np.random.RandomState(14)
    model = Analytical(
        pst.two_compartments,
        out=lambda x, p, t, cov: x[0:1] / p[3],
        seq_eq=lambda p, t, cov: jnp.stack([
            p[0] * (cov("wt", t) / 70.0) ** p[4],
            p[1], p[2], p[3], p[4],
        ]),
        lag=lambda p, t, cov: {0: 3.0 * p[4]},  # 1.5..3 h, crosses obs
        nstates=2, ndrugs=1, nout=1,
    )
    sp = np.column_stack([
        rng.uniform(0.1, 0.3, 12), rng.uniform(0.2, 0.4, 12),
        rng.uniform(0.1, 0.3, 12), rng.uniform(8, 15, 12),
        rng.uniform(0.5, 1.0, 12),
    ])
    _check(model, _subjects(multi_dose=False), sp)


def test_lag_equal_to_dose_gap_rejected():
    # at lag == inter-dose gap the kernel's single pending slot would be
    # overwritten by the arriving dose in the very column the old one
    # fires (the first dose silently vanishes) — the plan must REJECT the
    # boundary (strict >=), not produce a wrong psi
    from pharmsol_tpu.errors import PharmsolError

    rng = np.random.RandomState(15)

    def model_with_lag(lag_h):
        return Analytical(
            pst.one_compartment,
            out=lambda x, p, t, cov: x[0:1] / p[1],
            seq_eq=lambda p, t, cov: jnp.stack(
                [p[0] * (cov("wt", t) / 70.0) ** 0.5, p[1]]
            ),
            lag=lambda p, t, cov: {0: lag_h},
            nstates=1, ndrugs=1, nout=1,
        )

    sp = np.column_stack([
        rng.uniform(0.1, 0.3, 8), rng.uniform(8, 15, 8),
    ])
    with pytest.raises(PharmsolError, match="strictly before"):
        log_likelihood_matrix(
            model_with_lag(6.0), _subjects(with_inf=False), sp, _ems(),
            engine="pallas",
        )
    # just inside the boundary: exact parity
    _check(model_with_lag(5.75), _subjects(with_inf=False), sp)


def test_colplanes_plan_takes_the_post_stream():
    from pharmsol_tpu.likelihood.matrix import _PallasPsiPlan
    from pharmsol_tpu.ops.pallas_psi import SUB_TILE

    rng = np.random.RandomState(16)
    model = Analytical(
        pst.one_compartment_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[2],
        seq_eq=lambda p, t, cov: jnp.stack(
            [p[0], p[1] * (cov("wt", t) / 70.0) ** 0.75, p[2], p[3]]
        ),
        lag=lambda p, t, cov: {0: p[3]},
        nstates=2, ndrugs=1, nout=1,
    )
    sp = np.column_stack([
        rng.uniform(0.8, 2.0, 6), rng.uniform(0.1, 0.3, 6),
        rng.uniform(8, 15, 6), rng.uniform(0.1, 1.2, 6),
    ])
    data = _subjects()
    grid = model.lower(data.subjects())
    lowered = _ems().lower(model.resolve_output_label, model.nouteqs())
    plan = _PallasPsiPlan(
        model, grid, np.asarray(sp, np.float64), lowered,
        row_multiple=SUB_TILE,
    )
    assert plan.seg_postdepth is not None
    assert plan.param_planes is not None
    assert plan.seg_depth is not None and plan.seg_evcode is None


def test_zero_fa_cell_rejected_in_split_march():
    # a support cell whose fa evaluates to EXACTLY 0.0 can never fire the
    # in-kernel pending dose (fire tests pend_amt != 0), so the seq reset
    # the engine still applies at the lag-shifted time would be skipped —
    # the plan must reject to XLA, mirroring the zero-amount-bolus rule
    from pharmsol_tpu.errors import PharmsolError

    rng = np.random.RandomState(17)
    model = Analytical(
        pst.one_compartment_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[2],
        seq_eq=lambda p, t, cov: jnp.stack(
            [p[0], p[1] * (cov("wt", t) / 70.0) ** 0.75, p[2], p[3]]
        ),
        lag=lambda p, t, cov: {0: p[3]},
        fa=lambda p, t, cov: {0: jnp.maximum(p[3] - 0.5, 0.0)},
        nstates=2, ndrugs=1, nout=1,
    )
    sp = np.column_stack([
        rng.uniform(0.8, 2.0, 8), rng.uniform(0.1, 0.3, 8),
        rng.uniform(8, 15, 8),
        np.concatenate([rng.uniform(0.6, 1.2, 7), [0.3]]),  # one fa==0 lane
    ])
    with pytest.raises(PharmsolError, match="exactly"):
        log_likelihood_matrix(
            model, _subjects(with_inf=False, multi_dose=False), sp, _ems(),
            engine="pallas",
        )
    # all-positive fa: the tier runs and matches the engine
    sp_ok = sp.copy()
    sp_ok[-1, 3] = 0.8
    _check(model, _subjects(with_inf=False, multi_dose=False), sp_ok)


def test_stress_lag_tvseq_infusion_censoring_multioutput():
    # the VERDICT-1 stress pattern: lag x tv-covariate seq x infusion x
    # BLOQ/ALOQ censoring x multi-output, per-support lag so every lane
    # fires at its own time
    from pharmsol_tpu.data.event import Censor

    rng = np.random.RandomState(18)
    model = Analytical(
        pst.one_compartment_with_absorption,
        out=lambda x, p, t, cov: jnp.stack(
            [x[1] / p[2], 2.5 * x[1] / p[2] + 0.1]
        ),
        seq_eq=lambda p, t, cov: jnp.stack([
            p[0] * jnp.exp(-0.01 * t),
            p[1] * (cov("wt", t) / 70.0) ** 0.75,
            p[2], p[3],
        ]),
        lag=lambda p, t, cov: {0: p[3]},
        nstates=2, ndrugs=1, nout=2,
    )
    ems = (
        AssayErrorModels()
        .add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
        .add(1, AssayErrorModel.proportional(ErrorPoly(0.3, 0.15), 1.5))
    )
    subs = []
    for i in range(6):
        sb = (
            Subject.builder(f"x{i}").bolus(0.0, 100.0, 0)
            .bolus(8.0, 60.0, 0).infusion(3.0, 50.0, 0, 1.5)
            .covariate("wt", 0.0, 52.0 + 5.0 * i)
            .covariate("wt", 5.0, 70.0 - 3.0 * i)
            .covariate("wt", 10.0, 60.0 + 2.0 * i)
        )
        for t in (0.5, 1.5, 3.5, 5.0, 7.5, 10.0):
            sb = sb.observation(t, float(4 * np.exp(-0.2 * t) + 0.1 * i), 0)
            sb = sb.observation(
                t + 0.25, float(9 * np.exp(-0.2 * t) + 0.2 * i), 1
            )
        sb = (sb.censored_observation(14.0, 0.1, 0, Censor.BLOQ)
              .censored_observation(0.25, 8.0, 1, Censor.ALOQ))
        subs.append(sb.build())
    sp = np.column_stack([
        rng.uniform(0.8, 2.0, 12), rng.uniform(0.1, 0.3, 12),
        rng.uniform(8, 15, 12), rng.uniform(0.2, 1.4, 12),
    ])
    data = Data(subs)
    x = log_likelihood_matrix(model, data, sp, ems, engine="xla")
    p = log_likelihood_matrix(model, data, sp, ems, engine="pallas")
    err = np.max(np.abs(p - x) / np.maximum(np.abs(x), 1.0))
    # censored cells ride the kernel's own log-CDF (not the engine's
    # log_ndtr), so parity is approximation-level, not f64-exact
    assert err < 1e-6, err


def test_colplanes_f32_budget_case_takes_the_tier():
    # the committed budget case must actually exercise the colplanes tier
    from pharmsol_tpu.likelihood.matrix import _PallasPsiPlan
    from pharmsol_tpu.ops.pallas_psi import SUB_TILE
    from pharmsol_tpu.utils.f32_budget import _seq_colplanes_case

    model, data, sp, ems = _seq_colplanes_case().build()
    grid = model.lower(data.subjects())
    lowered = ems.lower(model.resolve_output_label, model.nouteqs())
    plan = _PallasPsiPlan(
        model, grid, np.asarray(sp, np.float64), lowered,
        row_multiple=SUB_TILE,
    )
    assert plan.seg_postdepth is not None


def test_dynamic_lag_with_covfree_seq_exact():
    """Round 4: a DYNAMIC (time-dependent) lag composed with a
    covariate-free seq rides the in-kernel depth counter + per-dose-
    segment lag slot tables — exact vs the engine."""
    rng = np.random.RandomState(21)
    model = Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[0:1] / p[1],
        seq_eq=lambda p, t, cov: jnp.stack(
            [p[0] * (1.0 + 0.15 * p[2]), p[1], p[2]]
        ),
        lag=lambda p, t, cov: {0: p[2] * (1.0 + 0.05 * t)},
        nstates=1, ndrugs=1, nout=1,
    )
    subs = []
    for i in range(4):
        sb = (Subject.builder(f"g{i}").bolus(0.0, 100.0, 0)
              .infusion(1.0, 50.0, 0, 1.5))
        if i % 2 == 0:
            sb = sb.bolus(3.0, 60.0, 0)
        for t in (0.5, 1.2, 2.1, 3.5, 4.5, 6.0):
            sb = sb.observation(float(t), float(np.abs(3 + rng.randn())), 0)
        subs.append(sb.build())
    sp = np.abs(np.column_stack([
        0.2 * (1 + 0.15 * rng.randn(8)), 11.0 * (1 + 0.15 * rng.randn(8)),
        rng.uniform(0.1, 0.6, 8),
    ]))
    _check(model, Data(subs), sp)


def test_dynamic_lag_with_tv_seq_exact():
    """Round 4: DYNAMIC lag + tv-covariate seq — the colplanes walk
    takes exact per-dose-COLUMN lag planes (each fire time is still a
    host-known scalar per (row, support, dose)), so the LAST analytical
    feature-combination fallback is closed; engine='auto' no longer
    degrades any analytical model outside the slot/memory caps."""
    rng = np.random.RandomState(22)
    model = Analytical(
        pst.one_compartment_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[2],
        seq_eq=lambda p, t, cov: jnp.stack(
            [p[0], p[1] * (cov("wt", t) / 70.0) ** 0.75, p[2], p[3]]
        ),
        lag=lambda p, t, cov: {0: p[3] * (1.0 + 0.05 * t)},
        nstates=2, ndrugs=1, nout=1,
    )
    subs = []
    for i in range(4):
        sb = (Subject.builder(f"h{i}").bolus(0.0, 100.0, 0)
              .bolus(6.0, 80.0, 0)
              .covariate("wt", 0.0, 55.0 + 4 * i)
              .covariate("wt", 4.0, 62.0 + 3 * i))
        for t in (0.5, 1.5, 3.5, 7.5):
            sb = sb.observation(
                float(t), float(4 * np.exp(-0.25 * t) + 0.05 * i), 0)
        subs.append(sb.build())
    sp = np.column_stack([
        rng.uniform(0.8, 2.0, 6), rng.uniform(0.1, 0.3, 6),
        rng.uniform(8, 15, 6), rng.uniform(0.1, 0.8, 6),
    ])
    _check(model, Data(subs), sp)


def test_dynamic_lag_reading_tv_covariate_with_tv_seq_exact():
    """The hardest composition: lag READS the time-varying covariate
    that the seq also reads."""
    rng = np.random.RandomState(23)
    model = Analytical(
        pst.one_compartment_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[2],
        seq_eq=lambda p, t, cov: jnp.stack(
            [p[0], p[1] * (cov("wt", t) / 70.0) ** 0.75, p[2], p[3]]
        ),
        lag=lambda p, t, cov: {0: p[3] * cov("wt", t) / 70.0},
        nstates=2, ndrugs=1, nout=1,
    )
    subs = []
    for i in range(4):
        sb = (Subject.builder(f"k{i}").bolus(0.0, 100.0, 0)
              .bolus(6.0, 80.0, 0)
              .covariate("wt", 0.0, 55.0 + 4 * i)
              .covariate("wt", 4.0, 62.0 + 3 * i))
        for t in (0.5, 1.5, 3.5, 7.5):
            sb = sb.observation(
                float(t), float(4 * np.exp(-0.25 * t) + 0.05 * i), 0)
        subs.append(sb.build())
    sp = np.column_stack([
        rng.uniform(0.8, 2.0, 6), rng.uniform(0.1, 0.3, 6),
        rng.uniform(8, 15, 6), rng.uniform(0.1, 0.8, 6),
    ])
    _check(model, Data(subs), sp)
