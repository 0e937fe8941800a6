"""Second tranche of literal expectations TRANSCRIBED from reference tests.

Extends tests/test_reference_literals.py (round 3, ~70 values) toward full
coverage of the reference's committed numeric expectations. Every value
asserted here is copied from a numeric literal in the reference source's
unit tests — cross-implementation parity evidence that survives without a
Rust toolchain. Each test cites the reference file:line of the transcribed
assertion.

Coverage map (reference test -> transcribed value count):

| Reference test module                    | tests | values |
|------------------------------------------|-------|--------|
| data/row.rs:679-760 (ADDL/II expansion)  | 4     | 24     |
| data/row.rs:779-830 (build_data sorting) | 2     | 6      |
| data/auc.rs in-module tests              | 7     | 16     |
| nca/tests.rs fixtures + options          | 8     | 15     |
| nca/sparse.rs tests                      | 3     | 8      |
| nca/summary.rs tests                     | 3     | 12     |
| data/residual_error.rs tests             | 6     | 16     |
| data/structs.rs:1724-1776 (expand)       | 2     | 6      |
| parser/pmetrics.rs CSV fixtures          | 2     | 33     |
| data/covariate.rs:685-772 (CSV interp)   | (same)| 9      |
| data/event.rs constructor tests          | 1     | 7      |

Together with tests/test_reference_literals.py (33 tests / ~70 values)
and the 26 PKNCA golden tables, the transcribed corpus now carries
200+ reference-committed numeric expectations.
"""

import math

import numpy as np
import pytest

from pharmsol_tpu import AUCMethod, Censor, Data, Subject
from pharmsol_tpu.data.auc import (
    auc,
    auc_interval,
    auc_segment,
    aumc,
    interpolate_linear,
)
from pharmsol_tpu.data.residual_error import (
    ResidualErrorModel,
    ResidualErrorModels,
)
from pharmsol_tpu.data.row import DataRow, build_data
from pharmsol_tpu.nca import NCAOptions, nca, nca_all
from pharmsol_tpu.nca.sparse import sparse_auc
from pharmsol_tpu.nca.summary import summarize
from pharmsol_tpu.nca.types import BLQRule, LambdaZMethod, LambdaZOptions


# ---------------------------------------------------------------------------
# data/row.rs — ADDL/II expansion literals
# ---------------------------------------------------------------------------


def test_positive_addl_times():
    """row.rs:680-695: ADDL=3, II=12 -> additional doses first, then the
    original: times [12, 24, 36, 0]."""
    row = (DataRow.builder("pt1", 0.0).evid(1).dose(100.0).input(1)
           .addl(3).ii(12.0).build())
    events = row.into_events()
    assert len(events) == 4
    assert [e.time for e in events] == [12.0, 24.0, 36.0, 0.0]


def test_negative_addl_times():
    """row.rs:697-713: ADDL=-3, II=12 -> doses go backward in time:
    [-12, -24, -36, 0]."""
    row = (DataRow.builder("pt1", 0.0).evid(1).dose(100.0).input(1)
           .addl(-3).ii(12.0).build())
    events = row.into_events()
    assert len(events) == 4
    assert [e.time for e in events] == [-12.0, -24.0, -36.0, 0.0]


def test_large_negative_addl_times():
    """row.rs:715-734: ADDL=-10, II=12 -> 11 events, 10 backward."""
    row = (DataRow.builder("pt1", 0.0).evid(1).dose(100.0).input(1)
           .addl(-10).ii(12.0).build())
    events = row.into_events()
    assert len(events) == 11
    assert [e.time for e in events] == [
        -12.0, -24.0, -36.0, -48.0, -60.0, -72.0, -84.0, -96.0, -108.0,
        -120.0, 0.0,
    ]


def test_infusion_with_addl():
    """row.rs:736-760: DUR=1 + ADDL=2 expands to 3 infusions, every one
    amount 100 / duration 1."""
    row = (DataRow.builder("pt1", 0.0).evid(1).dose(100.0).dur(1.0)
           .input(1).addl(2).ii(24.0).build())
    events = row.into_events()
    assert len(events) == 3
    for e in events:
        assert e.amount == 100.0
        assert e.duration == 1.0


def test_build_data_positive_addl_sorted():
    """row.rs:779-801: ADDL=24, II=120 builds 25 sorted dose times from 0
    to 2880."""
    rows = [
        DataRow.builder("pt1", 0.0).evid(1).dose(100.0).input(1)
        .addl(24).ii(120.0).build()
    ]
    data = build_data(rows)
    occ = data.subjects()[0].occasions()[0]
    times = [b.time for b in occ.events if hasattr(b, "amount")
             and not hasattr(b, "duration")]
    assert len(times) == 25
    assert times == sorted(times)
    assert times[0] == 0.0
    assert times[-1] == 2880.0


def test_build_data_negative_addl_sorted():
    """row.rs:804-826: ADDL=-1, II=48 -> sorted times [-48, 0]."""
    rows = [
        DataRow.builder("pt1", 0.0).evid(1).dose(100.0).input(1)
        .addl(-1).ii(48.0).build()
    ]
    data = build_data(rows)
    occ = data.subjects()[0].occasions()[0]
    times = [b.time for b in occ.events if hasattr(b, "amount")
             and not hasattr(b, "duration")]
    assert times == [-48.0, 0.0]


# ---------------------------------------------------------------------------
# data/auc.rs — in-module test literals
# ---------------------------------------------------------------------------


def test_auc_segment_linear_9():
    """auc.rs test_auc_segment_linear: (10 + 8) / 2 * 1 = 9."""
    assert abs(auc_segment(0.0, 10.0, 1.0, 8.0, AUCMethod.LINEAR) - 9.0) \
        < 1e-10


def test_auc_segment_log_down_value():
    """auc.rs test_auc_segment_log_down: 5 / ln(10/5)."""
    want = 5.0 / math.log(10.0 / 5.0)
    assert abs(
        auc_segment(0.0, 10.0, 1.0, 5.0, AUCMethod.LIN_UP_LOG_DOWN) - want
    ) < 1e-10


def test_auc_segment_ascending_linuplogdown_is_linear():
    """auc.rs test_auc_segment_ascending_linuplogdown: ascending segment
    uses linear: (5 + 10) / 2 * 1 = 7.5."""
    assert abs(
        auc_segment(0.0, 5.0, 1.0, 10.0, AUCMethod.LIN_UP_LOG_DOWN) - 7.5
    ) < 1e-10


def test_auc_full_profile_44():
    """auc.rs test_auc_full_profile_linear: total = 44."""
    times = [0.0, 1.0, 2.0, 4.0, 8.0, 12.0]
    concs = [0.0, 10.0, 8.0, 4.0, 2.0, 1.0]
    assert abs(auc(times, concs, AUCMethod.LINEAR) - 44.0) < 1e-10


def test_auc_interval_literals():
    """auc.rs test_auc_interval_exact_boundaries (21.0),
    _interpolated_boundaries (16.5), _outside_range (0.0),
    _zero_width (0.0)."""
    t1 = [0.0, 1.0, 2.0, 4.0, 8.0]
    c1 = [0.0, 10.0, 8.0, 4.0, 2.0]
    assert abs(auc_interval(t1, c1, 1.0, 4.0, AUCMethod.LINEAR) - 21.0) \
        < 1e-10
    t2 = [0.0, 2.0, 4.0]
    c2 = [0.0, 10.0, 6.0]
    assert abs(auc_interval(t2, c2, 1.0, 3.0, AUCMethod.LINEAR) - 16.5) \
        < 1e-10
    t3 = [1.0, 2.0, 4.0]
    c3 = [10.0, 8.0, 4.0]
    assert auc_interval(t3, c3, 0.0, 0.5, AUCMethod.LINEAR) == 0.0
    assert auc_interval(t3, c3, 5.0, 10.0, AUCMethod.LINEAR) == 0.0
    t4 = [0.0, 1.0, 2.0]
    c4 = [0.0, 10.0, 8.0]
    assert auc_interval(t4, c4, 1.0, 1.0, AUCMethod.LINEAR) == 0.0


def test_aumc_linear_18():
    """auc.rs test_aumc_linear: 5 + 13 = 18."""
    assert abs(
        aumc([0.0, 1.0, 2.0], [0.0, 10.0, 8.0], AUCMethod.LINEAR) - 18.0
    ) < 1e-10


def test_interpolate_linear_literals():
    """auc.rs test_interpolate_linear_within (5.0, 8.0), _at_boundary
    (0.0, 6.0), _clamped (5.0, 15.0)."""
    t = [0.0, 2.0, 4.0]
    v = [0.0, 10.0, 6.0]
    assert abs(interpolate_linear(t, v, 1.0) - 5.0) < 1e-10
    assert abs(interpolate_linear(t, v, 3.0) - 8.0) < 1e-10
    assert abs(interpolate_linear(t, v, 0.0) - 0.0) < 1e-10
    assert abs(interpolate_linear(t, v, 4.0) - 6.0) < 1e-10
    assert interpolate_linear([1.0, 3.0], [5.0, 15.0], 0.0) == 5.0
    assert interpolate_linear([1.0, 3.0], [5.0, 15.0], 5.0) == 15.0


# ---------------------------------------------------------------------------
# nca/tests.rs — fixture-based literals
# ---------------------------------------------------------------------------


def _single_dose_oral() -> Subject:
    """nca/tests.rs:18-31 fixture."""
    return (
        Subject.builder("test").bolus(0.0, 100.0, 0)
        .observation(0.0, 0.0, 0).observation(0.5, 5.0, 0)
        .observation(1.0, 10.0, 0).observation(2.0, 8.0, 0)
        .observation(4.0, 4.0, 0).observation(8.0, 2.0, 0)
        .observation(12.0, 1.0, 0).observation(24.0, 0.25, 0)
        .build()
    )


def test_nca_basic_exposure_literals():
    """nca/tests.rs:107-122: Cmax 10.0 at Tmax 1.0; Clast 0.25 at
    Tlast 24.0."""
    r = nca(_single_dose_oral(), NCAOptions())
    assert r.exposure.cmax == 10.0
    assert r.exposure.tmax == 1.0
    assert r.exposure.clast == 0.25
    assert r.exposure.tlast == 24.0
    assert r.exposure.auc_last > 0.0


def test_nca_steady_state_tau_12():
    """nca/tests.rs:291-309: tau=12 steady-state block with positive
    AUCtau/Cmin/Cavg/fluctuation."""
    s = (
        Subject.builder("test").bolus(0.0, 100.0, 0)
        .observation(0.0, 5.0, 0).observation(1.0, 15.0, 0)
        .observation(2.0, 12.0, 0).observation(4.0, 8.0, 0)
        .observation(6.0, 6.0, 0).observation(8.0, 5.5, 0)
        .observation(12.0, 5.0, 0).build()
    )
    r = nca(s, NCAOptions().with_tau(12.0))
    assert r.steady_state is not None
    assert r.steady_state.tau == 12.0
    assert r.steady_state.auc_tau > 0.0
    assert r.steady_state.cmin > 0.0
    assert r.steady_state.cavg > 0.0
    assert r.steady_state.fluctuation > 0.0


def _blq_subject() -> Subject:
    """nca/tests.rs:79-92 fixture (LOQ=0.1 BLOQ at t=24)."""
    return (
        Subject.builder("test").bolus(0.0, 100.0, 0)
        .observation(0.0, 0.0, 0).observation(1.0, 10.0, 0)
        .observation(2.0, 8.0, 0).observation(4.0, 4.0, 0)
        .observation(8.0, 2.0, 0).observation(12.0, 0.5, 0)
        .censored_observation(24.0, 0.1, 0, Censor.BLOQ)
        .build()
    )


def test_nca_blq_exclude_tlast_12():
    """nca/tests.rs:317-325: Exclude BLQ -> Tlast 12.0."""
    opts = NCAOptions()
    opts.blq_rule = BLQRule.EXCLUDE
    r = nca(_blq_subject(), opts)
    assert r.exposure.tlast == 12.0


def test_nca_iv_infusion_duration_half():
    """nca/tests.rs:251-269: infusion fixture carries duration 0.5 into
    the IV-infusion route params."""
    s = (
        Subject.builder("test").infusion(0.0, 100.0, 1, 0.5)
        .observation(0.0, 0.0, 0).observation(0.5, 5.0, 0)
        .observation(1.0, 10.0, 0).observation(2.0, 8.0, 0)
        .observation(4.0, 4.0, 0).observation(8.0, 2.0, 0)
        .observation(12.0, 1.0, 0).observation(24.0, 0.25, 0)
        .build()
    )
    r = nca(s, NCAOptions())
    assert r.route_params is not None
    assert r.route_params.kind == "iv_infusion"
    assert r.route_params.params.infusion_duration == 0.5


def test_bioequivalence_preset_literals():
    """nca/tests.rs:508-512: bioequivalence() preset pins min R² 0.90 and
    max AUC extrapolation 20%."""
    o = NCAOptions.bioequivalence()
    assert o.lambda_z.min_r_squared == 0.90
    assert o.max_auc_extrap_pct == 20.0


def test_sparse_preset_literals():
    """nca/tests.rs:515-519: sparse() preset pins min R² 0.80 and max AUC
    extrapolation 30%."""
    o = NCAOptions.sparse()
    assert o.lambda_z.min_r_squared == 0.80
    assert o.max_auc_extrap_pct == 30.0


def test_lambda_z_manual_points_4():
    """nca/tests.rs:376-390: manual lambda-z with 4 points reports
    n_points == 4."""
    opts = NCAOptions()
    opts.lambda_z = LambdaZOptions(
        method=LambdaZMethod.MANUAL, manual_points=4
    )
    r = nca(_single_dose_oral(), opts)
    assert r.terminal is not None and r.terminal.regression is not None
    assert r.terminal.regression.n_points == 4


def test_lambda_z_auto_quality():
    """nca/tests.rs:354-372: auto selection on the oral fixture gives
    R² > 0.9 with >= 3 points."""
    r = nca(_single_dose_oral(), NCAOptions())
    reg = r.terminal.regression
    assert reg.r_squared > 0.9
    assert reg.n_points >= 3


# ---------------------------------------------------------------------------
# nca/sparse.rs — Bailer sparse AUC literals
# ---------------------------------------------------------------------------


def test_sparse_auc_group_means():
    """sparse.rs tests: 12 destructive samples over 4 timepoints; group
    means [0, 11, 5, ...]."""
    times = [0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 4.0, 4.0, 4.0, 8.0, 8.0, 8.0]
    concs = [0.0, 0.0, 0.0, 10.0, 12.0, 11.0, 5.0, 4.0, 6.0, 1.0, 1.5, 1.2]
    r = sparse_auc(times, concs, None)
    assert r.n_timepoints == 4
    assert r.auc > 0.0
    assert r.auc_se >= 0.0
    assert r.auc_ci_lower <= r.auc <= r.auc_ci_upper
    assert abs(r.mean_concentrations[0] - 0.0) < 1e-10
    assert abs(r.mean_concentrations[1] - 11.0) < 1e-10
    assert abs(r.mean_concentrations[2] - 5.0) < 1e-10


def test_sparse_auc_time_tolerance_grouping():
    """sparse.rs test_sparse_auc_with_tolerance: tol 0.05 merges
    {0, 0.01} and {1.0, 0.99} -> 2 groups."""
    r = sparse_auc([0.0, 0.01, 1.0, 0.99], [0.0, 0.0, 10.0, 12.0], 0.05)
    assert r.n_timepoints == 2


def test_sparse_auc_duplicates_exact():
    """sparse.rs duplicate-samples test: AUC = (10+5)/2*2 = 15, SE 0."""
    r = sparse_auc([0.0, 0.0, 2.0, 2.0], [10.0, 10.0, 5.0, 5.0], None)
    assert abs(r.auc - 15.0) < 1e-10
    assert abs(r.auc_se - 0.0) < 1e-10


# ---------------------------------------------------------------------------
# nca/summary.rs — population summary literals
# ---------------------------------------------------------------------------


def _scaled_oral(sid: str, scale: float) -> Subject:
    b = Subject.builder(sid).bolus(0.0, 100.0, 0)
    for t, c in ((0.0, 0.0), (0.5, 2.5), (1.0, 5.0), (2.0, 4.0),
                 (4.0, 2.0), (8.0, 1.0), (12.0, 0.5)):
        b = b.observation(t, c * scale, 0)
    return b.build()


def test_summarize_population_literals():
    """summary.rs test_summarize_basic: cmax values {10, 20, 15} ->
    n 3, mean 15, min 10, max 20, median 15."""
    results = [
        nca(_scaled_oral("S1", 2.0), NCAOptions()),   # cmax 10
        nca(_scaled_oral("S2", 4.0), NCAOptions()),   # cmax 20
        nca(_scaled_oral("S3", 3.0), NCAOptions()),   # cmax 15
    ]
    summary = summarize(results)
    assert summary.n_subjects == 3
    cmax = next(p for p in summary.parameters if p.name == "cmax")
    assert cmax.n == 3
    assert abs(cmax.mean - 15.0) < 1e-10
    assert cmax.min == 10.0
    assert cmax.max == 20.0
    assert cmax.median == 15.0


def test_summarize_single_result_literals():
    """summary.rs test_summarize_single_result: one subject -> sd 0, min
    == max == mean."""
    summary = summarize([nca(_scaled_oral("S1", 2.0), NCAOptions())])
    assert summary.n_subjects == 1
    cmax = next(p for p in summary.parameters if p.name == "cmax")
    assert cmax.n == 1
    assert abs(cmax.mean - 10.0) < 1e-10
    assert cmax.sd == 0.0
    assert cmax.min == 10.0
    assert cmax.max == 10.0


def test_summarize_geometric_identical_values():
    """summary.rs geometric test: identical values -> geo_mean = value,
    geo CV 0%."""
    results = [nca(_scaled_oral(f"S{i}", 2.0), NCAOptions())
               for i in range(3)]
    cmax = next(p for p in summarize(results).parameters
                if p.name == "cmax")
    assert abs(cmax.geo_mean - 10.0) < 1e-10
    assert abs(cmax.geo_cv_pct - 0.0) < 1e-10


def test_summarize_empty():
    """summary.rs test_summarize_empty."""
    s = summarize([])
    assert s.n_subjects == 0
    assert s.parameters == []


# ---------------------------------------------------------------------------
# data/residual_error.rs — sigma literals
# ---------------------------------------------------------------------------


def test_residual_constant_sigma():
    """residual_error.rs test_constant_error: sigma 0.5 at every
    prediction (0, 100, -50)."""
    m = ResidualErrorModel.constant(0.5)
    for f in (0.0, 100.0, -50.0):
        assert abs(float(m.sigma(f)) - 0.5) < 1e-10


def test_residual_proportional_sigma():
    """residual_error.rs test_proportional_error: b=0.1 -> sigma 10 at
    f=100, 5 at f=50, 10 at f=-100 (absolute value)."""
    m = ResidualErrorModel.proportional(0.1)
    assert abs(float(m.sigma(100.0)) - 10.0) < 1e-10
    assert abs(float(m.sigma(50.0)) - 5.0) < 1e-10
    assert abs(float(m.sigma(-100.0)) - 10.0) < 1e-10


def test_residual_combined_sigma():
    """residual_error.rs test_combined_error: sqrt(0.25) at f=0,
    sqrt(100.25) at f=100."""
    m = ResidualErrorModel.combined(0.5, 0.1)
    assert abs(float(m.sigma(0.0)) - 0.5) < 1e-10
    assert abs(float(m.sigma(100.0)) - math.sqrt(100.25)) < 1e-10


def test_residual_weighted_squared():
    """residual_error.rs test_weighted_residual: constant -> (5-3)^2 = 4;
    proportional weights by 1/pred^2 -> (12-10)^2/10^2 = 0.04."""
    m = ResidualErrorModel.constant(1.0)
    assert abs(float(m.weighted_squared_residual(5.0, 3.0)) - 4.0) < 1e-10
    p = ResidualErrorModel.proportional(0.1)
    assert abs(float(p.weighted_squared_residual(12.0, 10.0)) - 0.04) \
        < 1e-10


def test_residual_sigma_cutoff():
    """residual_error.rs test_sigma_cutoff: proportional sigma at f=0 is
    floored at sqrt(f64 eps), never 0."""
    m = ResidualErrorModel.proportional(0.1)
    s = float(m.sigma(0.0))
    assert s > 0.0
    assert s >= math.sqrt(np.finfo(np.float64).eps)


def test_residual_models_per_outeq():
    """residual_error.rs models map test: len 2; sigma(0, 100)=0.5,
    sigma(1, 100)=10."""
    models = (ResidualErrorModels()
              .add(0, ResidualErrorModel.constant(0.5))
              .add(1, ResidualErrorModel.proportional(0.1)))
    assert len(models) == 2
    assert abs(float(models.sigma(0, 100.0)) - 0.5) < 1e-10
    assert abs(float(models.sigma(1, 100.0)) - 10.0) < 1e-10


# ---------------------------------------------------------------------------
# data/structs.rs — expand() literals
# ---------------------------------------------------------------------------


def test_expand_grid_reaches_last_dose_plus_tad():
    """structs.rs:1724-1747: idelta=1, tad=3 -> grid [0, 1, 2, 3]."""
    s = (Subject.builder("s1").bolus(0.0, 100.0, 0)
         .observation(0.0, 5.0, 0).build())
    expanded = Data([s]).expand(1.0, 3.0)
    occ = expanded.subjects()[0].occasions()[0]
    times = sorted(
        e.time for e in occ.events
        if e.__class__.__name__ == "Observation"
    )
    assert times == [0.0, 1.0, 2.0, 3.0]


def test_expand_last_time_is_per_occasion():
    """structs.rs:1749-1776: idelta=5 tad=0; occasion 0 keeps 1
    observation, occasion 1 (dose at 10) gets grid 0,5,10 -> 3."""
    s = (Subject.builder("s1").bolus(0.0, 100.0, 0)
         .observation(0.0, 5.0, 0)
         .reset()
         .bolus(10.0, 100.0, 0).observation(10.0, 5.0, 0)
         .build())
    expanded = Data([s]).expand(5.0, 0.0)
    occs = expanded.subjects()[0].occasions()

    def count_obs(occ):
        return sum(1 for e in occ.events
                   if e.__class__.__name__ == "Observation")

    assert count_obs(occs[0]) == 1
    assert count_obs(occs[1]) == 3


# ---------------------------------------------------------------------------
# nca/tests.rs — positional BLQ literal
# ---------------------------------------------------------------------------


def test_positional_blq_cmax_10():
    """nca/tests.rs:549-577 (test_positional_blq_rule): positional rule
    keeps Cmax 10.0 on the fixture."""
    opts = NCAOptions()
    opts.blq_rule = BLQRule.POSITIONAL
    r = nca(_blq_subject(), opts)
    assert r.exposure.cmax == 10.0


def test_nca_matches_nca_all_first():
    """nca/tests.rs:738-760: subject.nca equals nca_all()[0] to 1e-10 on
    cmax and auc_last."""
    s = _single_dose_oral()
    first = nca(s, NCAOptions())
    vec_first = nca_all(s, NCAOptions())[0]
    assert abs(first.exposure.cmax - vec_first.exposure.cmax) < 1e-10
    assert abs(first.exposure.auc_last - vec_first.exposure.auc_last) \
        < 1e-10


# ---------------------------------------------------------------------------
# data/parser/pmetrics.rs — CSV fixture literals
# ---------------------------------------------------------------------------

_ADDL_CSV = """ID,EVID,TIME,DUR,DOSE,ADDL,II,INPUT,OUT,OUTEQ,C0,C1,C2,C3
1,1,0,0,600,-10,12,1,.,.,.,.,.,.
1,0,9,.,.,.,.,.,100,100,.,.,.,.
2,1,0,0,600,10,12,1,.,.,.,.,.,.
2,0,9,.,.,.,.,.,100,100,.,.,.,.
"""

_COVARIATE_CSV = """ID,EVID,TIME,DUR,DOSE,ADDL,II,INPUT,OUT,OUTEQ,C0,C1,C2,C3,WT
1,1,0,0,600,.,.,1,.,.,.,.,.,.,70.0
1,0,9,.,.,.,.,.,100,100,.,.,.,.,70.0
1,0,24,.,.,.,.,.,90,100,.,.,.,.,72.0
1,0,48,.,.,.,.,.,85,100,.,.,.,.,74.0
2,1,0,0,600,.,.,1,.,.,.,.,.,.,65.0
2,0,12,.,.,.,.,.,95,100,.,.,.,.,65.0
2,0,24,.,.,.,.,.,88,100,.,.,.,.,67.0
2,0,48,.,.,.,.,.,82,100,.,.,.,.,69.0
"""


def test_pmetrics_addl_csv_event_times():
    """pmetrics.rs test_addl (src/tests/data/addl_test.csv transcribed):
    subject 1 (ADDL=-10) expands to times [-120..-12, 0, 9]; subject 2
    (ADDL=+10) to [0, 9, 12..120]."""
    import io

    from pharmsol_tpu.data.pmetrics import read_pmetrics

    data = read_pmetrics(io.StringIO(_ADDL_CSV))
    subjects = data.subjects()
    s1 = subjects[0].occasions()[0]
    s1_times = [e.time for e in s1.events]
    assert s1_times == [
        -120.0, -108.0, -96.0, -84.0, -72.0, -60.0, -48.0, -36.0, -24.0,
        -12.0, 0.0, 9.0,
    ]
    s2 = subjects[1].occasions()[0]
    s2_times = [e.time for e in s2.events]
    assert s2_times == [
        0.0, 9.0, 12.0, 24.0, 36.0, 48.0, 60.0, 72.0, 84.0, 96.0, 108.0,
        120.0,
    ]


def test_pmetrics_covariate_csv_interpolation():
    """covariate.rs:685-772 (src/tests/data/covariate_test.csv
    transcribed): WT interpolates 70/72/74 at knots, 70.4 at t=12, 73 at
    t=36, carry-forward 74 at t=60; subject 2: 65 at 0, 66 at 18, 69 at
    48."""
    import io

    from pharmsol_tpu.data.pmetrics import read_pmetrics

    data = read_pmetrics(io.StringIO(_COVARIATE_CSV))
    subjects = data.subjects()
    wt = subjects[0].occasions()[0].covariates.get_covariate("wt")
    assert wt.interpolate(0.0) == 70.0
    assert wt.interpolate(24.0) == 72.0
    assert wt.interpolate(48.0) == 74.0
    assert abs(wt.interpolate(12.0) - 70.4) < 1e-8
    assert wt.interpolate(36.0) == 73.0
    assert wt.interpolate(60.0) == 74.0
    wt2 = subjects[1].occasions()[0].covariates.get_covariate("wt")
    assert wt2.interpolate(0.0) == 65.0
    assert wt2.interpolate(18.0) == 66.0
    assert wt2.interpolate(48.0) == 69.0


# ---------------------------------------------------------------------------
# data/event.rs — constructor literals
# ---------------------------------------------------------------------------


def test_event_constructor_literals():
    """event.rs test_bolus_creation / test_infusion_creation: field
    round-trips (2.5/100/1; 1.0/200/1/2.5)."""
    from pharmsol_tpu import Bolus, Infusion

    b = Bolus(time=2.5, amount=100.0, input=1)
    assert b.time == 2.5
    assert b.amount == 100.0
    assert str(b.input) == "1"

    inf = Infusion(time=1.0, amount=200.0, input=1, duration=2.5)
    assert inf.time == 1.0
    assert inf.amount == 200.0
    assert inf.duration == 2.5
