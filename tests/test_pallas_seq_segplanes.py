"""Segment-indexed exact seq planes: the fully general no-lag seq tier.

Covers what the affine tv streams (`_decompose_seq_tv`) and the
time-constant planes (`_decompose_seq_planes`) reject: seq equations that
read ``t`` and/or a TIME-VARYING covariate in any (non-affine,
parameter-mixing) form. The host walks the engine's reset/carry chain
per (row, segment, support) through each row's REAL CovView, so the
closure's own covariate time requests (baseline reads included) are
honored exactly — parity vs the XLA engine is f64-exact.

Reference semantics: analytical/mod.rs:331,360 (seq applied per spanned
segment at the segment end, reset at real events, carried across
infusion-end sub-splits); covariate.rs (linear interpolation, boundary
carries).
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


def _tv_subjects(n=8, with_inf=True):
    """Subjects with a genuinely time-VARYING wt (3 knots, obs between)."""
    out = []
    for i in range(n):
        sb = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
        if with_inf and i % 3 == 0:
            sb = sb.infusion(2.0, 50.0, 0, 1.0)
        sb = (
            sb.covariate("wt", 0.0, 55.0 + 4.0 * i)
            .covariate("wt", 4.0, 62.0 + 3.0 * i)
            .covariate("wt", 8.0, 50.0 + 2.0 * i)
        )
        for t in (0.5, 1.5, 3.0, 6.0, 10.0):
            sb = sb.observation(t, float(4 * np.exp(-0.25 * t) + 0.05 * i), 0)
        out.append(sb.build())
    return Data(out)


def _check(model, data, sp, tol=1e-9):
    ems = AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0)
    )
    x = log_likelihood_matrix(model, data, sp, ems, engine="xla")
    p = log_likelihood_matrix(model, data, sp, ems, engine="pallas")
    err = np.max(np.abs(p - x) / np.maximum(np.abs(x), 1.0))
    assert err < tol, err


def test_tv_cov_parameter_mixing_segplanes():
    # allometric scaling with an ESTIMATED exponent on a time-varying wt:
    # non-affine in parameters AND time-varying — only the segment-indexed
    # planes tier can carry it
    rng = np.random.RandomState(41)
    model = Analytical(
        pst.two_compartments,
        out=lambda x, p, t, cov: x[0:1] / p[3],
        seq_eq=lambda p, t, cov: jnp.stack([
            p[0] * (cov("wt", t) / 70.0) ** p[4],
            p[1] / (1.0 + p[2] * cov("wt", t) / 700.0),
            p[2], p[3], p[4],
        ]),
        nstates=2, ndrugs=1, nout=1,
    )
    sp = np.column_stack([
        rng.uniform(0.1, 0.3, 12), rng.uniform(0.2, 0.4, 12),
        rng.uniform(0.1, 0.3, 12), rng.uniform(8, 15, 12),
        rng.uniform(0.5, 1.0, 12),
    ])
    _check(model, _tv_subjects(), sp)


def test_time_dependent_nonaffine_seq_segplanes():
    # seq reading t through an estimated rate: parameter mixing makes it
    # non-affine, t-reads make it time-dependent — segment planes carry
    # the exact per-segment-end evaluation
    rng = np.random.RandomState(42)
    model = Analytical(
        pst.one_compartment_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[2],
        seq_eq=lambda p, t, cov: jnp.stack([
            p[0] * jnp.exp(-0.02 * p[1] * t),
            p[1], p[2],
        ]),
        nstates=2, ndrugs=1, nout=1,
    )
    sp = np.column_stack([
        rng.uniform(0.8, 2.0, 12), rng.uniform(0.1, 0.3, 12),
        rng.uniform(8, 15, 12),
    ])
    _check(model, _tv_subjects(with_inf=False), sp)
    _check(model, _tv_subjects(), sp)


def test_baseline_cov_read_nonaffine_segplanes():
    # closure reads wt at BASELINE (cov("wt", 0.0)) while wt varies in
    # time: the engine's CovView honors the requested time, so the host
    # chain must too (the fixed-value shim would silently substitute
    # wt(t_segment_end))
    rng = np.random.RandomState(43)
    model = Analytical(
        pst.two_compartments,
        out=lambda x, p, t, cov: x[0:1] / p[3],
        seq_eq=lambda p, t, cov: jnp.stack([
            p[0] * (cov("wt", 0.0) / 70.0) ** p[4]
            * (1.0 + 0.001 * cov("wt", t)),
            p[1], p[2], p[3], p[4],
        ]),
        nstates=2, ndrugs=1, nout=1,
    )
    sp = np.column_stack([
        rng.uniform(0.1, 0.3, 12), rng.uniform(0.2, 0.4, 12),
        rng.uniform(0.1, 0.3, 12), rng.uniform(8, 15, 12),
        rng.uniform(0.5, 1.0, 12),
    ])
    _check(model, _tv_subjects(), sp)


def test_baseline_cov_read_affine_tv_streams():
    # AFFINE seq with a baseline covariate read against a time-varying
    # covariate: rides the per-segment affine streams, which must evaluate
    # the closure through the row's real CovView (regression: the
    # fixed-value shim substituted wt(t_end) for wt(0.0))
    rng = np.random.RandomState(44)
    model = Analytical(
        pst.one_compartment_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[2],
        seq_eq=lambda p, t, cov: jnp.stack([
            p[0],
            p[1] + 0.001 * cov("wt", 0.0) + 0.0005 * cov("wt", t),
            p[2],
        ]),
        nstates=2, ndrugs=1, nout=1,
    )
    sp = np.column_stack([
        rng.uniform(0.8, 2.0, 12), rng.uniform(0.1, 0.3, 12),
        rng.uniform(8, 15, 12),
    ])
    _check(model, _tv_subjects(), sp)


def test_tv_cov_three_cmt_segplanes():
    # 3-cmt + tv-covariate seq: per-slot XLA eigen preparation on the
    # [R, S] planes
    rng = np.random.RandomState(45)
    model = Analytical(
        pst.three_compartments,
        out=lambda x, p, t, cov: x[0:1] / p[5],
        seq_eq=lambda p, t, cov: jnp.stack([
            p[0] * (cov("wt", t) / 70.0) ** p[2],
            p[1], p[2], p[3], p[4], p[5],
        ]),
        nstates=3, ndrugs=1, nout=1,
    )
    sp = np.column_stack([
        rng.uniform(0.1, 0.3, 12), rng.uniform(0.15, 0.35, 12),
        rng.uniform(0.05, 0.2, 12), rng.uniform(0.1, 0.3, 12),
        rng.uniform(0.05, 0.15, 12), rng.uniform(8, 15, 12),
    ])
    _check(model, _tv_subjects(), sp)


def test_segplanes_dedup_keeps_slots_small():
    # chains repeat between covariate knots: the per-row dedup must keep
    # the slot count well under the column count
    from pharmsol_tpu.likelihood.matrix import _PallasPsiPlan
    from pharmsol_tpu.ops.pallas_psi import SUB_TILE

    rng = np.random.RandomState(46)
    model = Analytical(
        pst.two_compartments,
        out=lambda x, p, t, cov: x[0:1] / p[3],
        seq_eq=lambda p, t, cov: jnp.stack([
            p[0] * (cov("wt", t) / 70.0) ** p[4],
            p[1], p[2], p[3], p[4],
        ]),
        nstates=2, ndrugs=1, nout=1,
    )
    sp = np.column_stack([
        rng.uniform(0.1, 0.3, 6), rng.uniform(0.2, 0.4, 6),
        rng.uniform(0.1, 0.3, 6), rng.uniform(8, 15, 6),
        rng.uniform(0.5, 1.0, 6),
    ])
    data = _tv_subjects(with_inf=False)
    ems = AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0)
    )
    grid = model.lower(data.subjects())
    lowered = ems.lower(model.resolve_output_label, model.nouteqs())
    plan = _PallasPsiPlan(
        model, grid, np.asarray(sp, np.float64), lowered,
        row_multiple=SUB_TILE,
    )
    assert plan.param_planes is not None
    L = plan.param_planes.shape[0]
    M = plan.seg_depth.shape[1]
    # 3 wt knots -> at most a handful of distinct chain values per row
    assert L <= 6 and L < M, (L, M)


def test_tv_seq_stress_combination():
    # tv-covariate non-affine seq x infusion sub-splits x BLOQ censoring x
    # two outputs: the segment planes must compose with every other stream
    from pharmsol_tpu import Censor

    rng = np.random.RandomState(47)
    model = Analytical(
        pst.two_compartments,
        out=lambda x, p, t, cov: jnp.stack(
            [x[0] / p[3], 0.5 * x[1] / p[3]]
        ),
        seq_eq=lambda p, t, cov: jnp.stack([
            p[0] * (cov("wt", t) / 70.0) ** p[4],
            p[1], p[2], p[3], p[4],
        ]),
        nstates=2, ndrugs=1, nout=2,
    )
    subs = []
    for i in range(8):
        sb = (
            Subject.builder(f"s{i}")
            .bolus(0.0, 100.0, 0)
            .infusion(2.0, 50.0, 0, 1.5)
            .covariate("wt", 0.0, 55.0 + 4.0 * i)
            .covariate("wt", 4.0, 66.0 + 3.0 * i)
        )
        for t in (0.5, 1.5, 3.0, 6.0, 10.0):
            sb = sb.observation(t, float(4 * np.exp(-0.25 * t) + 0.05 * i), 0)
        sb = sb.censored_observation(8.0, 0.25, 1, Censor.BLOQ)
        sb = sb.observation(9.0, 0.6, 1)
        subs.append(sb.build())
    data = Data(subs)
    sp = np.column_stack([
        rng.uniform(0.1, 0.3, 12), rng.uniform(0.2, 0.4, 12),
        rng.uniform(0.1, 0.3, 12), rng.uniform(8, 15, 12),
        rng.uniform(0.5, 1.0, 12),
    ])
    ems = (
        AssayErrorModels()
        .add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
        .add(1, AssayErrorModel.additive(ErrorPoly(0.3, 0.05), 1.0))
    )
    x = log_likelihood_matrix(model, data, sp, ems, engine="xla")
    p = log_likelihood_matrix(model, data, sp, ems, engine="pallas")
    err = np.max(np.abs(p - x) / np.maximum(np.abs(x), 1.0))
    # in-kernel log-CDF for the censored cell is ~1e-6-accurate in f64
    assert err < 1e-5, err
