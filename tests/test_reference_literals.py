"""Literal expectations TRANSCRIBED from the reference's committed tests.

Unlike tests/goldens/reference_scenarios.json (self-pinned by this repo's
own engine), every value asserted here is copied from a numeric literal in
the reference source's unit tests — cross-implementation parity evidence
that survives without executing the Rust reference. Each test cites the
reference file:line of the transcribed assertion.
"""

import math

import numpy as np
import pytest

import pharmsol_tpu as pst
from pharmsol_tpu import (
    Analytical,
    AssayErrorModel,
    AssayErrorModels,
    AUCMethod,
    Bolus,
    Censor,
    Data,
    ErrorPoly,
    Infusion,
    Observation,
    Subject,
)


# ---------------------------------------------------------------------------
# analytical/mod.rs — engine-level literals
# ---------------------------------------------------------------------------


def test_secondary_equations_accumulate_within_single_solve():
    """analytical/mod.rs:493-527: seq accumulates across the infusion
    sub-split; expected prediction 2.5."""
    import jax.numpy as jnp

    model = Analytical(
        lambda x, p, t, rateiv, cov: jnp.stack([x[0] + p[0] * t]),
        seq_eq=lambda p, t, cov: jnp.stack([p[0] + 1.0]),
        out=lambda x, p, t, cov: x[0:1],
        nstates=1, ndrugs=1, nout=1,
    )
    subject = (
        Subject.builder("seq").bolus(0.0, 0.0, 0)
        .infusion(0.25, 1.0, 0, 0.25).observation(1.0, 0.0, 0).build()
    )
    preds = model.estimate_predictions(subject, np.array([1.0]))
    assert abs(float(preds.flat_predictions()[0]) - 2.5) < 1e-9


def test_infusion_inputs_match_state_dimension():
    """analytical/mod.rs:529-560: rateiv[3] forcing gives prediction 4.0."""
    import jax.numpy as jnp

    model = Analytical(
        lambda x, p, t, rateiv, cov: jnp.stack(
            [x[0] + rateiv[3] * t, x[1], x[2], x[3]]
        ),
        out=lambda x, p, t, cov: x[0:1],
        nstates=4, ndrugs=4, nout=1,
    )
    subject = (
        Subject.builder("inf").infusion(0.0, 4.0, 3, 1.0)
        .observation(1.0, 0.0, 0).build()
    )
    preds = model.estimate_predictions(subject, np.array([0.0]))
    assert abs(float(preds.flat_predictions()[0]) - 4.0) < 1e-9


# ---------------------------------------------------------------------------
# data/structs.rs — sorting, lag, fa, containers
# ---------------------------------------------------------------------------


def _two_subject_data():
    s1 = Subject.builder("subject1").bolus(0.0, 100.0, 0).observation(1.0, 5.0, 0).build()
    s2 = Subject.builder("subject2").bolus(0.0, 100.0, 0).observation(1.0, 5.0, 0).build()
    return Data([s1, s2])


def test_data_container_literals():
    """structs.rs:1125-1170: len, ids, add_subject, filters."""
    data = _two_subject_data()
    assert len(data) == 2
    assert data.subjects()[0].id == "subject1"
    assert data.subjects()[1].id == "subject2"
    s3 = Subject.builder("subject3").observation(1.0, 1.0, 0).build()
    data.add_subject(s3)
    assert len(data) == 3
    assert data.subjects()[2].id == "subject3"
    data2 = _two_subject_data()
    inc = data2.filter_include(["subject1"])
    assert len(inc.subjects()) == 1
    assert inc.subjects()[0].id == "subject1"
    exc = data2.filter_exclude(["subject1"])
    assert len(exc) == 1
    assert exc.subjects()[0].id == "subject2"


def test_occasion_sort_by_time():
    """structs.rs:1172-1186: bolus@1 sorts before observation@2."""
    s = Subject.builder("s").observation(2.0, 1.0, 0).bolus(1.0, 100.0, 0).build()
    events = s.occasions()[0].events
    assert isinstance(events[0], Bolus) and events[0].time == 1.0
    assert isinstance(events[1], Observation) and events[1].time == 2.0


def test_observation_before_bolus_at_same_time():
    """structs.rs:1189-1205: at equal times observation sorts first."""
    s = Subject.builder("s").bolus(1.0, 100.0, 0).observation(1.0, 5.0, 0).build()
    events = s.occasions()[0].events
    assert len(events) == 2
    assert isinstance(events[0], Observation) and events[0].time == 1.0
    assert isinstance(events[1], Bolus) and events[1].time == 1.0


def test_observation_before_infusion_at_same_time():
    """structs.rs:1207-1221: observation sorts before infusion at a tie."""
    s = Subject.builder("s").infusion(1.0, 100.0, 0, 2.0).observation(1.0, 5.0, 0).build()
    events = s.occasions()[0].events
    assert isinstance(events[0], Observation) and events[0].time == 1.0
    assert isinstance(events[1], Infusion) and events[1].time == 1.0


def test_sort_multiple_timepoints_with_ties():
    """structs.rs:1249-1271: obs@0, bolus@0, obs@1, obs@2, bolus@2."""
    s = (
        Subject.builder("s")
        .bolus(2.0, 50.0, 0).observation(1.0, 4.0, 0).bolus(0.0, 100.0, 0)
        .observation(0.0, 5.0, 0).observation(2.0, 3.0, 0).build()
    )
    ev = s.occasions()[0].events
    assert len(ev) == 5
    assert isinstance(ev[0], Observation) and ev[0].time == 0.0
    assert isinstance(ev[1], Bolus) and ev[1].time == 0.0
    assert isinstance(ev[2], Observation) and ev[2].time == 1.0
    assert isinstance(ev[3], Observation) and ev[3].time == 2.0
    assert isinstance(ev[4], Bolus) and ev[4].time == 2.0


def test_lagtime_delays_bolus_but_not_infusion():
    """structs.rs:1289-1313: lag 5 moves the bolus to t=6; the infusion
    stays at t=1."""
    s = (
        Subject.builder("s").bolus(1.0, 100.0, 0)
        .infusion(1.0, 200.0, 0, 2.0).observation(8.0, 1.0, 0).build()
    )
    occ = s.occasions()[0]
    events = occ.process_events(
        lag=lambda p, t, cov: {0: 5.0}, parameters=[0.0]
    )
    bolus = [e for e in events if isinstance(e, Bolus)][0]
    infusion = [e for e in events if isinstance(e, Infusion)][0]
    assert bolus.time == 6.0
    assert infusion.time == 1.0


def test_lagtime_reorders_events():
    """structs.rs:1317-1333: after lag 5, the observation@3 precedes the
    shifted bolus@6."""
    s = Subject.builder("s").bolus(1.0, 100.0, 0).observation(3.0, 5.0, 0).build()
    events = s.occasions()[0].process_events(
        lag=lambda p, t, cov: {0: 5.0}, parameters=[0.0]
    )
    assert isinstance(events[0], Observation) and events[0].time == 3.0
    assert isinstance(events[1], Bolus) and events[1].time == 6.0


def test_bioavailability_scales_bolus_not_infusion():
    """structs.rs:1336-1360: fa 0.5 halves the bolus (100 -> 50); the
    infusion amount stays 200."""
    s = (
        Subject.builder("s").bolus(1.0, 100.0, 0)
        .infusion(1.0, 200.0, 0, 2.0).observation(8.0, 1.0, 0).build()
    )
    events = s.occasions()[0].process_events(
        fa=lambda p, t, cov: {0: 0.5}, parameters=[0.0]
    )
    bolus = [e for e in events if isinstance(e, Bolus)][0]
    infusion = [e for e in events if isinstance(e, Infusion)][0]
    assert bolus.amount == 50.0
    assert infusion.amount == 200.0


def test_process_events_none_preserves_order_and_values():
    """structs.rs:1364-1372: no lag/fa -> events unchanged."""
    s = Subject.builder("s").bolus(1.0, 100.0, 0).observation(2.0, 5.0, 0).build()
    events = s.occasions()[0].process_events()
    assert isinstance(events[0], Bolus)
    assert events[0].time == 1.0 and events[0].amount == 100.0
    assert isinstance(events[1], Observation) and events[1].time == 2.0


# ---------------------------------------------------------------------------
# data/error_model.rs — sigma literals
# ---------------------------------------------------------------------------


def test_additive_error_model_sigma():
    """error_model.rs:1185-1191: additive(poly(1,0,0,0), 5) at obs 20 ->
    sqrt(26)."""
    m = AssayErrorModel.additive(ErrorPoly(1.0, 0.0, 0.0, 0.0), 5.0)
    assert m.sigma_from_value(20.0) == pytest.approx(math.sqrt(26.0))


def test_proportional_error_model_sigma():
    """error_model.rs:1193-1199: proportional(poly(1,0,0,0), 2) -> 2.0."""
    m = AssayErrorModel.proportional(ErrorPoly(1.0, 0.0, 0.0, 0.0), 2.0)
    assert m.sigma_from_value(20.0) == pytest.approx(2.0)


def test_errorpoly_coefficients_roundtrip():
    """error_model.rs:1201-1223: coefficients() and set_errorpoly."""
    m = AssayErrorModel.additive(ErrorPoly(1.0, 2.0, 3.0, 4.0), 5.0)
    assert tuple(m.errorpoly().coefficients()) == (1.0, 2.0, 3.0, 4.0)


def test_error_model_factor_literals():
    """error_model.rs:1225-1230 set_factor; 1380-1408 models.factor."""
    m = AssayErrorModel.additive(ErrorPoly(1.0, 2.0, 3.0, 4.0), 5.0)
    assert m.factor() == 5.0
    models = AssayErrorModels().add(0, m)
    assert models.factor(0) == 5.0


def test_error_models_len_literals():
    """error_model.rs:1242-1296: empty len 0; adds give 1 then 2."""
    empty = AssayErrorModels()
    assert len(empty) == 0
    one = AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(1.0, 0.0, 0.0, 0.0), 0.0)
    )
    assert len(one) == 1
    two = one.add(
        1, AssayErrorModel.proportional(ErrorPoly(1.0, 0.0, 0.0, 0.0), 2.0)
    )
    assert len(two) == 2


# ---------------------------------------------------------------------------
# simulator/likelihood/mod.rs — identities
# ---------------------------------------------------------------------------


def test_lognormpdf_at_mean():
    """likelihood/mod.rs:345-359: log pdf at the mean of a standard normal
    is -0.5*ln(2*pi)."""
    from pharmsol_tpu.likelihood import lognormpdf

    got = float(lognormpdf(0.0, 0.0, 1.0))
    assert abs(got - (-0.5 * math.log(2.0 * math.pi))) < 1e-12


def test_empty_predictions_have_neutral_log_likelihood():
    """likelihood/mod.rs:319-325: no observations -> log-lik 0 (log 1)."""
    model = Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )
    s = Subject.builder("none").bolus(0.0, 100.0, 0).build()
    ems = AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(1.0, 0.0, 0.0, 0.0), 0.0)
    )
    ll = model.estimate_log_likelihood(s, np.array([0.2, 10.0]), ems)
    assert ll == 0.0


def test_log_likelihood_manual_normal_value():
    """likelihood/mod.rs:236-270 semantics with concrete numbers: obs 10,
    pred 10.5, additive poly(0,1,0,0) factor 0 -> sigma = obs-based
    |0 + 1*10| = 10; ll = -0.5*ln(2*pi) - ln(10) - 0.5*(0.5/10)^2."""
    import jax.numpy as jnp

    model = Analytical(
        lambda x, p, t, rateiv, cov: jnp.stack([x[0]]),
        init=lambda p, t, cov: jnp.stack([10.5]),
        out=lambda x, p, t, cov: x[0:1],
        nstates=1, ndrugs=1, nout=1,
    )
    s = Subject.builder("m").observation(1.0, 10.0, 0).build()
    ems = AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.0, 1.0, 0.0, 0.0), 0.0)
    )
    ll = model.estimate_log_likelihood(s, np.array([0.0]), ems)
    sigma = 10.0
    z = (10.0 - 10.5) / sigma
    want = -0.5 * math.log(2 * math.pi) - math.log(sigma) - 0.5 * z * z
    assert abs(ll - want) < 1e-9


# ---------------------------------------------------------------------------
# nca/calc.rs — NCA primitive literals
# ---------------------------------------------------------------------------


def test_auc_segment_linear_literal():
    """nca/calc.rs:768-772: (10+8)/2 * 1 = 9.0."""
    from pharmsol_tpu.data.auc import auc_segment

    assert auc_segment(0.0, 10.0, 1.0, 8.0, AUCMethod.LINEAR) == pytest.approx(9.0)


def test_auc_segment_log_down_literal():
    """nca/calc.rs:774-780: descending lin-up/log-down segment."""
    from pharmsol_tpu.data.auc import auc_segment

    got = auc_segment(0.0, 10.0, 1.0, 5.0, AUCMethod.LIN_UP_LOG_DOWN)
    want = 5.0 / math.log(10.0 / 5.0)
    assert got == pytest.approx(want, abs=1e-10)


def _reference_profile():
    """nca/calc.rs:744-765 make_test_profile: t 0..12, c 0,10,8,4,2,1."""
    from pharmsol_tpu.nca.observation import ObservationProfile
    from pharmsol_tpu.data.event import BLQRule

    b = Subject.builder("t").bolus(0.0, 100.0, 0)
    for t, c in [(0.0, 0.0), (1.0, 10.0), (2.0, 8.0), (4.0, 4.0),
                 (8.0, 2.0), (12.0, 1.0)]:
        b = b.observation(t, c, 0)
    occ = b.build().occasions()[0]
    return ObservationProfile.from_occasion(occ, 0, BLQRule.EXCLUDE)


def test_auc_last_literal():
    """nca/calc.rs:782-795: trapezoid sum = 44.0."""
    profile = _reference_profile()
    assert profile.auc_last(AUCMethod.LINEAR) == pytest.approx(44.0, abs=1e-10)


def test_half_life_literal():
    """nca/calc.rs:797-801: ln(2)/0.1 ~ 6.931."""
    from pharmsol_tpu.nca.calc import half_life

    assert abs(half_life(0.1) - 6.931) < 0.01


def test_clearance_literal():
    """nca/calc.rs:803-807: 100/50 = 2.0."""
    from pharmsol_tpu.nca.calc import clearance

    assert clearance(100.0, 50.0) == pytest.approx(2.0)


def test_vz_literal():
    """nca/calc.rs:809-813: 100/(0.1*50) = 20.0."""
    from pharmsol_tpu.nca.calc import vz

    assert vz(100.0, 0.1, 50.0) == pytest.approx(20.0)


def test_linear_regression_literal():
    """nca/calc.rs:815-825: y=2x -> slope 2, intercept 0, R^2 = 1."""
    from pharmsol_tpu.nca.calc import linear_regression

    slope, intercept, r2, _corr = linear_regression(
        [1.0, 2.0, 3.0, 4.0, 5.0], [2.0, 4.0, 6.0, 8.0, 10.0]
    )
    assert slope == pytest.approx(2.0, abs=1e-10)
    assert intercept == pytest.approx(0.0, abs=1e-10)
    assert r2 == pytest.approx(1.0, abs=1e-10)


def test_fluctuation_literal():
    """nca/calc.rs:827-831: (10-2)/5*100 = 160."""
    from pharmsol_tpu.nca.calc import fluctuation

    assert fluctuation(10.0, 2.0, 5.0) == pytest.approx(160.0)


def test_swing_literal():
    """nca/calc.rs:833-837: (10-2)/2 = 4."""
    from pharmsol_tpu.nca.calc import swing

    assert swing(10.0, 2.0) == pytest.approx(4.0)


def test_time_above_concentration_literals():
    """nca/calc.rs:842-888: all-above 4.0; all-below 0.0; crossing down
    1.2; crossing up 1.5."""
    from pharmsol_tpu.nca.calc import time_above_concentration

    assert time_above_concentration(
        [0.0, 1.0, 2.0, 4.0], [10.0, 8.0, 6.0, 5.0], 1.0
    ) == pytest.approx(4.0)
    assert time_above_concentration(
        [0.0, 1.0, 2.0], [0.5, 0.3, 0.1], 1.0
    ) == pytest.approx(0.0)
    assert time_above_concentration(
        [0.0, 1.0, 2.0], [10.0, 5.0, 0.0], 4.0
    ) == pytest.approx(1.2)
    assert time_above_concentration(
        [0.0, 1.0, 2.0], [0.0, 10.0, 10.0], 5.0
    ) == pytest.approx(1.5)


def test_c0_logslope_literal():
    """nca/calc.rs:890-907: back-extrapolated c0 ~ 40 from (0.5, 20),
    (1.0, 10)."""
    from pharmsol_tpu.data.event import BLQRule
    from pharmsol_tpu.nca.calc import C0Method, c0
    from pharmsol_tpu.nca.observation import ObservationProfile

    b = (Subject.builder("test").bolus(0.0, 100.0, 1)
         .observation(0.5, 20.0, 0).observation(1.0, 10.0, 0)
         .observation(4.0, 1.0, 0))
    occ = b.build().occasions()[0]
    profile = ObservationProfile.from_occasion(occ, 0, BLQRule.EXCLUDE)
    val, _method = c0(profile, [C0Method.LOG_SLOPE], 0.0)
    assert val == pytest.approx(40.0, rel=1e-6)


# ---------------------------------------------------------------------------
# data/covariate.rs — interpolation literals
# ---------------------------------------------------------------------------


def test_covariate_segment_linear_interpolation():
    """covariate.rs:507-520: slope-1 segment on [0, 10)."""
    from pharmsol_tpu.data.covariate import CovariateSegment

    seg = CovariateSegment(
        from_time=0.0, to_time=10.0, slope=1.0, intercept=0.0,
        carry_forward=False,
    )
    assert seg.interpolate(0.0) == 0.0
    assert seg.interpolate(5.0) == 5.0
    assert seg.interpolate(10.0) is None
    assert seg.interpolate(15.0) is None


def test_covariate_segment_carry_forward():
    """covariate.rs:522-534: carry-forward returns the intercept."""
    from pharmsol_tpu.data.covariate import CovariateSegment

    seg = CovariateSegment(
        from_time=0.0, to_time=10.0, slope=0.0, intercept=5.0,
        carry_forward=True,
    )
    assert seg.interpolate(0.0) == 5.0
    assert seg.interpolate(5.0) == 5.0
    assert seg.interpolate(10.0) is None


def test_covariate_interpolation_table():
    """covariate.rs:583-609: weight knots (0,70),(12,72),(24,75) ->
    interpolated 71 @6, 73.5 @18, carry 75 @30; fixed age stays 35."""
    from pharmsol_tpu.data.covariate import Covariate

    wt = Covariate("wt", observations=[(0.0, 70.0), (12.0, 72.0), (24.0, 75.0)])
    assert wt.interpolate(0.0) == pytest.approx(70.0)
    assert wt.interpolate(6.0) == pytest.approx(71.0)
    assert wt.interpolate(12.0) == pytest.approx(72.0)
    assert wt.interpolate(18.0) == pytest.approx(73.5)
    assert wt.interpolate(24.0) == pytest.approx(75.0)
    assert wt.interpolate(30.0) == pytest.approx(75.0)
    age = Covariate("age", fixed=True, observations=[(0.0, 35.0)])
    assert age.interpolate(0.0) == 35.0
    assert age.interpolate(12.0) == 35.0
    assert age.interpolate(100.0) == 35.0
