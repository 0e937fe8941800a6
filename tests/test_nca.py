"""NCA parity tests.

Golden values come from PKNCA v0.12.1 (the same external oracle the
reference validates against in tests/nca/test_pknca.rs). Tolerance 0.1%
relative / 1e-10 absolute, matching the reference gate.
"""

import math

import numpy as np
import pytest

from pharmsol_tpu import Censor, Data, Subject
from pharmsol_tpu.data.event import BLQRule, Route
from pharmsol_tpu.nca import (
    NCAOptions,
    bioavailability,
    bioequivalence,
    nca,
    nca_grouped,
    nca_to_csv,
    sparse_auc,
    summarize,
    superposition,
)

REL = 0.001


def approx(actual, expected, name=""):
    assert actual is not None, f"{name}: missing"
    diff = abs(actual - expected)
    assert diff <= 1e-10 or diff <= REL * max(abs(actual), abs(expected)), (
        f"{name}: expected {expected}, got {actual}"
    )


def test_pknca_basic_oral_01():
    subject = (
        Subject.builder("basic_oral_01")
        .bolus(0.0, 100.0, 0)
        .observation(0.0, 0.0, 0)
        .observation(0.5, 2.5, 0)
        .observation(1.0, 8.0, 0)
        .observation(2.0, 12.0, 0)
        .observation(3.0, 10.0, 0)
        .observation(4.0, 7.5, 0)
        .observation(6.0, 4.2, 0)
        .observation(8.0, 2.3, 0)
        .observation(12.0, 0.7, 0)
        .observation(24.0, 0.05, 0)
        .build()
    )
    result = nca(subject, NCAOptions())
    approx(result.exposure.cmax, 12.0, "cmax")
    approx(result.exposure.tmax, 2.0, "tmax")
    approx(result.exposure.tlast, 24.0, "tlast")
    approx(result.exposure.clast, 0.05, "clast")
    t = result.terminal
    approx(t.lambda_z, 0.2526, "lambda_z")
    approx(t.half_life, 2.7445, "half_life")
    approx(t.regression.r_squared, 0.9941, "r_squared")
    approx(t.regression.adj_r_squared, 0.9926, "adj_r_squared")
    assert t.regression.n_points == 6
    approx(t.regression.span_ratio, 7.6516, "span_ratio")


def test_pknca_iv_bolus_01():
    subject = (
        Subject.builder("iv_bolus_01")
        .bolus(0.0, 100.0, 0)
        .observation(0.0, 10.0, 0)
        .observation(0.25, 8.8, 0)
        .observation(0.5, 7.8, 0)
        .observation(1.0, 6.1, 0)
        .observation(2.0, 3.7, 0)
        .observation(4.0, 1.4, 0)
        .observation(6.0, 0.5, 0)
        .observation(8.0, 0.2, 0)
        .observation(12.0, 0.03, 0)
        .build()
    )
    result = nca(subject, NCAOptions().with_route(Route.IV_BOLUS))
    approx(result.exposure.cmax, 10.0, "cmax")
    approx(result.exposure.tmax, 0.0, "tmax")
    approx(result.exposure.auc_last, 20.172, "auc_last")
    approx(result.exposure.aumc_last, 40.3646, "aumc_last")
    approx(result.exposure.auc_inf_obs, 20.2338, "auc_inf_obs")
    approx(result.exposure.auc_inf_pred, 20.2316, "auc_inf_pred")
    approx(result.exposure.aumc_inf, 41.2336, "aumc_inf")
    t = result.terminal
    approx(t.lambda_z, 0.4854, "lambda_z")
    approx(t.half_life, 1.4279, "half_life")
    approx(t.mrt, 2.0379, "mrt")
    approx(t.regression.r_squared, 0.9998, "r_squared")
    assert t.regression.n_points == 8
    approx(t.regression.span_ratio, 8.2287, "span_ratio")
    assert result.route_params.kind == "iv_bolus"
    approx(result.route_params.params.c0, 10.0, "c0")
    approx(result.clearance.cl_f, 4.9422, "cl")
    approx(result.clearance.vz_f, 10.1814, "vz")
    approx(result.clearance.vss, 10.0716, "vss")


def test_pknca_blq_middle():
    subject = (
        Subject.builder("blq_middle")
        .bolus(0.0, 100.0, 0)
        .censored_observation(0.0, 0.1, 0, Censor.BLOQ)
        .observation(1.0, 5.0, 0)
        .observation(2.0, 10.0, 0)
        .censored_observation(3.0, 0.1, 0, Censor.BLOQ)
        .observation(4.0, 6.0, 0)
        .observation(6.0, 3.0, 0)
        .observation(8.0, 1.5, 0)
        .observation(12.0, 0.4, 0)
        .build()
    )
    result = nca(subject, NCAOptions().with_blq_rule(BLQRule.EXCLUDE))
    approx(result.exposure.cmax, 10.0, "cmax")
    approx(result.exposure.tmax, 2.0, "tmax")
    approx(result.exposure.clast, 0.4, "clast")
    approx(result.terminal.lambda_z, 0.3383, "lambda_z")
    approx(result.terminal.half_life, 2.0491, "half_life")
    assert result.terminal.regression.n_points == 4
    approx(result.terminal.regression.span_ratio, 3.9042, "span_ratio")


def test_pknca_blq_positional():
    subject = (
        Subject.builder("blq_positional")
        .bolus(0.0, 100.0, 0)
        .censored_observation(0.0, 0.1, 0, Censor.BLOQ)
        .observation(1.0, 10.0, 0)
        .censored_observation(2.0, 0.1, 0, Censor.BLOQ)
        .observation(4.0, 4.0, 0)
        .observation(8.0, 2.0, 0)
        .censored_observation(12.0, 0.1, 0, Censor.BLOQ)
        .build()
    )
    result = nca(subject, NCAOptions().with_blq_rule(BLQRule.POSITIONAL))
    approx(result.exposure.cmax, 10.0, "cmax")
    approx(result.exposure.tmax, 1.0, "tmax")
    approx(result.exposure.tlast, 8.0, "tlast")
    approx(result.exposure.clast, 2.0, "clast")
    approx(result.exposure.auc_last, 36.186, "auc_last")
    approx(result.exposure.aumc_last, 116.2766, "aumc_last")


def test_pknca_steady_state_oral():
    subject = (
        Subject.builder("ss")
        .bolus(0.0, 100.0, 0)
        .observation(0.0, 1.5, 0)
        .observation(0.5, 5.0, 0)
        .observation(1.0, 10.0, 0)
        .observation(2.0, 12.0, 0)
        .observation(4.0, 8.0, 0)
        .observation(6.0, 5.5, 0)
        .observation(8.0, 3.5, 0)
        .observation(10.0, 2.2, 0)
        .observation(12.0, 1.5, 0)
        .build()
    )
    result = nca(subject, NCAOptions().with_tau(12.0))
    approx(result.exposure.auc_last, 67.5547, "auc_last")
    approx(result.exposure.aumc_last, 295.7289, "aumc_last")
    approx(result.exposure.auc_inf_obs, 74.59, "auc_inf_obs")
    approx(result.exposure.auc_inf_pred, 74.5051, "auc_inf_pred")
    approx(result.exposure.aumc_inf, 413.1483, "aumc_inf")
    approx(result.terminal.lambda_z, 0.2132, "lambda_z")
    approx(result.terminal.half_life, 3.251, "half_life")
    approx(result.terminal.mrt, 5.5389, "mrt")
    assert result.terminal.regression.n_points == 5
    approx(result.clearance.cl_f, 1.3407, "cl")
    approx(result.clearance.vz_f, 6.2879, "vz")
    approx(result.steady_state.cmin, 1.5, "cmin")
    approx(result.steady_state.cavg, 5.6296, "cavg")


def test_exact_monoexponential_recovery():
    """λz on exact data must recover ke to machine-ish precision."""
    ke, c0 = 0.3, 50.0
    b = Subject.builder("exact").bolus(0.0, 100.0, 1)
    for t in (0.0, 1.0, 2.0, 4.0, 6.0, 8.0, 12.0):
        b = b.observation(t, c0 * math.exp(-ke * t), 0)
    result = nca(b.build(), NCAOptions().with_route(Route.IV_BOLUS))
    approx(result.terminal.lambda_z, ke, "lambda_z")
    assert abs(result.terminal.regression.r_squared - 1.0) < 1e-12
    approx(result.route_params.params.c0, c0, "c0")
    # AUCinf for exact exponential = C0/ke
    approx(result.exposure.auc_inf_obs, c0 / ke, "auc_inf_obs")


def test_route_detection():
    oral = Subject.builder("o").bolus(0, 100, 0).observation(1, 5, 0).observation(2, 4, 0).build()
    iv = Subject.builder("i").bolus(0, 100, 1).observation(1, 5, 0).observation(2, 4, 0).build()
    inf = (
        Subject.builder("f").infusion(0, 100, 0, 1.0).observation(1, 5, 0).observation(2, 4, 0).build()
    )
    assert nca(oral).route is Route.EXTRAVASCULAR
    assert nca(iv).route is Route.IV_BOLUS
    assert nca(inf).route is Route.IV_INFUSION


def test_tlag_from_raw_data():
    subject = (
        Subject.builder("lag")
        .bolus(0.0, 100.0, 0)
        .observation(0.0, 0.0, 0)
        .observation(0.5, 0.0, 0)
        .observation(1.0, 4.0, 0)
        .observation(2.0, 8.0, 0)
        .observation(4.0, 3.0, 0)
        .observation(8.0, 1.0, 0)
        .build()
    )
    result = nca(subject)
    approx(result.exposure.tlag, 0.5, "tlag")


def test_multi_dose_windows():
    b = Subject.builder("md").bolus(0.0, 100.0, 0).bolus(12.0, 100.0, 0)
    for t, c in [(1, 8), (4, 5), (8, 2.5), (13, 9), (16, 6), (20, 3), (24, 1.5)]:
        b = b.observation(float(t), float(c), 0)
    result = nca(b.build(), NCAOptions().with_dose_times([0.0, 12.0]))
    md = result.multi_dose
    assert md is not None
    assert md.dose_times == [0.0, 12.0]
    assert len(md.auc_intervals) == 2
    approx(md.cmax_intervals[0], 8.0, "cmax interval 0")
    approx(md.cmax_intervals[1], 9.0, "cmax interval 1")
    approx(md.tmax_intervals[1], 13.0, "tmax interval 1")


def test_sparse_auc_bailer():
    times = [0.0, 0.0, 1.0, 1.0, 4.0, 4.0, 8.0, 8.0]
    concs = [0.0, 0.0, 10.5, 12.0, 5.0, 4.5, 1.5, 2.0]
    res = sparse_auc(times, concs)
    # mean concentrations: 0, 11.25, 4.75, 1.75
    want_auc = (0 + 11.25) / 2 * 1 + (11.25 + 4.75) / 2 * 3 + (4.75 + 1.75) / 2 * 4
    approx(res.auc, want_auc, "bailer auc")
    assert res.auc_se > 0
    assert res.n_timepoints == 4


def test_superposition_monoexponential():
    """1-cmt superposition accumulation must equal 1/(1-exp(-ke*tau))."""
    ke = 0.2
    tau = 12.0
    b = Subject.builder("sp").bolus(0.0, 100.0, 1)
    for t in np.linspace(0.0, 48.0, 33):
        b = b.observation(float(t), 10.0 * math.exp(-ke * t), 0)
    res = superposition(b.build(), tau=tau, n_eval_points=25)
    want_acc = 1.0 / (1.0 - math.exp(-ke * tau))
    assert abs(res.accumulation_ratio - want_acc) / want_acc < 0.02
    assert res.n_doses > 1


def test_bioavailability_and_bioequivalence():
    def result_with(auc, dose):
        b = Subject.builder("x").bolus(0.0, dose, 0)
        # triangle profile scaled to hit a target AUClast
        scale = auc / 8.0
        for t, c in [(0, 0), (1, 2), (2, 4), (3, 2), (4, 0.5), (6, 0.1), (8, 0.01)]:
            b = b.observation(float(t), c * scale, 0)
        return nca(b.build())

    test = result_with(40.0, 100.0)
    ref = result_with(50.0, 100.0)
    ba = bioavailability(test, ref)
    approx(ba.f_auc_last, test.exposure.auc_last / ref.exposure.auc_last, "F")

    pairs = [(result_with(40.0 + i, 100.0), result_with(50.0, 100.0)) for i in range(4)]
    be = bioequivalence(pairs, 0.90)
    assert be is not None
    assert be.ci_lower_auc_last < be.gmr_auc_last < be.ci_upper_auc_last


def test_population_grouped_and_summary():
    subjects = []
    for i in range(4):
        b = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
        for t in (0.5, 1.0, 2.0, 4.0, 8.0, 12.0):
            b = b.observation(t, (10 + i) * math.exp(-0.25 * t), 0)
        subjects.append(b.build())
    grouped = nca_grouped(Data(subjects))
    assert len(grouped) == 4
    results = [g.successes()[0] for g in grouped]
    assert all(len(g.errors()) == 0 for g in grouped)
    summary = summarize(results)
    cmax = summary.get("cmax")
    assert cmax.n == 4
    assert 9.0 < cmax.mean < 14.0
    csv = nca_to_csv(results)
    assert csv.startswith("subject_id,occasion")
    assert len(csv.strip().split("\n")) == 5


def test_time_above_mic():
    b = Subject.builder("mic").bolus(0.0, 100.0, 0)
    for t, c in [(0, 0), (1, 10), (2, 8), (4, 4), (8, 1)]:
        b = b.observation(float(t), float(c), 0)
    result = nca(b.build(), NCAOptions().with_concentration_threshold(5.0))
    # above 5: crosses up between 0 and 1 at t=0.5; down between 2 and 4 at
    # c=5 -> t = 2 + 2*(8-5)/(8-4) = 3.5 -> total = 3.0
    approx(result.exposure.time_above_mic, 3.0, "time_above_mic")


def test_nca_with_dose_override():
    subject = (
        Subject.builder("ov")
        .observation(0.5, 9.0, 0)
        .observation(1.0, 8.0, 0)
        .observation(2.0, 6.0, 0)
        .observation(4.0, 3.0, 0)
        .observation(8.0, 0.8, 0)
        .build()
    )
    result = subject.nca_with_dose(100.0, Route.IV_BOLUS, None, NCAOptions())
    assert result.dose_amount == 100.0
    assert result.route is Route.IV_BOLUS
    assert result.clearance is not None


def test_nca_string_outeq_and_sole_label_fallback():
    """The reference's README NCA example uses labelled observations ("cp")
    with the default numeric outeq 0 — upstream that finds zero points
    (event.rs:616 parses labels as indices). Documented divergence: a
    numeric miss falls back to the occasion's sole distinct label; with
    several labels it still raises, and a string outeq selects explicitly.
    """
    from dataclasses import replace

    import pytest

    from pharmsol_tpu.nca import NCAOptions
    from pharmsol_tpu.nca.observation import NCAError

    subject = (
        Subject.builder("patient_001")
        .bolus(0.0, 100.0, "oral")
        .observation(0.5, 5.0, "cp")
        .observation(1.0, 10.0, "cp")
        .observation(2.0, 8.0, "cp")
        .observation(4.0, 4.0, "cp")
        .observation(8.0, 2.0, "cp")
        .build()
    )
    r = subject.nca(NCAOptions())
    assert abs(r.exposure.cmax - 10.0) < 1e-12
    assert abs(r.exposure.auc_last - 35.80) < 0.01

    two = (
        Subject.builder("x").bolus(0.0, 100.0, "oral")
        .observation(1.0, 5.0, "cp").observation(2.0, 4.0, "cp")
        .observation(1.0, 2.0, "metab").observation(2.0, 1.5, "metab")
        .build()
    )
    with pytest.raises(NCAError):
        two.nca(NCAOptions())  # ambiguous: numeric miss with two labels
    rm = two.nca(replace(NCAOptions(), outeq="metab"))
    assert abs(rm.exposure.cmax - 2.0) < 1e-12
