"""PKNCA cross-validation goldens: the full reference table set.

Transcribes the remaining PKNCA v0.12.1 expected-value scenarios from
/root/reference/tests/nca/test_pknca.rs (generated there by
`Rscript generate_expected.R`) that tests/test_nca.py does not already
cover. Each case is a data table: dosing/observation inputs plus the
PKNCA-published expected parameters. Tolerance 0.1% relative / 1e-10
absolute (test_pknca.rs:14-15).
"""

import pytest

from pharmsol_tpu import Subject
from pharmsol_tpu.data.event import AUCMethod, BLQRule, Censor, Route
from pharmsol_tpu.nca import NCAOptions, nca

REL = 0.001


def approx(actual, expected, name=""):
    assert actual is not None, f"{name}: missing"
    diff = abs(actual - expected)
    assert diff <= 1e-10 or diff <= REL * max(abs(actual), abs(expected)), (
        f"{name}: expected {expected}, got {actual}"
    )


def build(sid, dose_events, observations):
    b = Subject.builder(sid)
    for ev in dose_events:
        if len(ev) == 2:
            b = b.bolus(ev[0], ev[1], 0)
        else:
            b = b.infusion(ev[0], ev[1], 0, ev[2])
    for obs in observations:
        if len(obs) == 3:  # (t, value, censor)
            b = b.censored_observation(obs[0], obs[1], 0, obs[2])
        else:
            b = b.observation(obs[0], obs[1], 0)
    return b.build()


def check(result, expected):
    exp = result.exposure
    t = result.terminal
    for key, want in expected.items():
        if key in ("cmax", "tmax", "tlast", "clast", "auc_last", "aumc_last",
                   "auc_inf_obs", "auc_inf_pred", "aumc_inf", "auc_partial",
                   "tlag"):
            approx(getattr(exp, key), want, key)
        elif key in ("lambda_z", "half_life", "mrt"):
            assert t is not None, f"terminal missing for {key}"
            approx(getattr(t, key), want, key)
        elif key in ("r_squared", "adj_r_squared", "span_ratio"):
            approx(getattr(t.regression, key), want, key)
        elif key == "n_points":
            assert t.regression.n_points == want, (
                f"n_points: expected {want}, got {t.regression.n_points}"
            )
        elif key in ("cl_f", "vz_f", "vss"):
            approx(getattr(result.clearance, key), want, key)
        elif key == "c0":
            assert result.route_params.kind == "iv_bolus"
            approx(result.route_params.params.c0, want, key)
        elif key == "mrt_iv":
            assert result.route_params.kind == "iv_infusion"
            approx(result.route_params.params.mrt_iv, want, key)
        elif key in ("cmin", "cavg"):
            approx(getattr(result.steady_state, key), want, key)
        else:
            raise KeyError(key)


# (name, doses, observations, options-factory, expected)  — values from
# test_pknca.rs, cited per case.
CASES = [
    (  # test_pknca.rs:96 pknca_basic_oral_02
        "basic_oral_02",
        [(0.0, 250.0)],
        [(0.0, 0.0), (0.5, 0.5), (1.0, 2.0), (2.0, 5.5), (4.0, 10.0),
         (6.0, 8.5), (8.0, 6.2), (12.0, 3.1), (24.0, 0.8), (48.0, 0.05)],
        lambda: NCAOptions(),
        {"cmax": 10.0, "tmax": 4.0, "tlast": 48.0, "clast": 0.05,
         "lambda_z": 0.1148, "half_life": 6.0395, "r_squared": 1.0,
         "adj_r_squared": 0.9999, "n_points": 3, "span_ratio": 5.9607},
    ),
    (  # test_pknca.rs:197 pknca_iv_bolus_02 (biexponential)
        "iv_bolus_02",
        [(0.0, 500.0)],
        [(0.0, 50.0), (0.083, 35.0), (0.25, 22.0), (0.5, 15.0), (1.0, 10.0),
         (2.0, 6.5), (4.0, 3.8), (8.0, 1.3), (12.0, 0.45), (24.0, 0.05)],
        lambda: NCAOptions().with_route(Route.IV_BOLUS),
        {"cmax": 50.0, "tmax": 0.0, "tlast": 24.0, "clast": 0.05,
         "auc_last": 51.7981, "aumc_last": 166.7329, "auc_inf_obs": 52.0494,
         "auc_inf_pred": 52.0401, "aumc_inf": 174.0302, "lambda_z": 0.1989,
         "half_life": 3.485, "mrt": 3.3436, "r_squared": 0.9932,
         "adj_r_squared": 0.9865, "n_points": 3, "span_ratio": 4.5911,
         "c0": 50.0, "cl_f": 9.6063, "vz_f": 48.2984, "vss": 32.119},
    ),
    (  # test_pknca.rs:265 pknca_iv_infusion_01
        "iv_infusion_01",
        [(0.0, 200.0, 1.0)],
        [(0.0, 0.0), (0.5, 8.0), (1.0, 15.0), (1.5, 12.5), (2.0, 10.0),
         (4.0, 5.0), (6.0, 2.5), (8.0, 1.25), (12.0, 0.3)],
        lambda: NCAOptions(),
        {"cmax": 15.0, "tmax": 1.0, "tlast": 12.0, "clast": 0.3,
         "lambda_z": 0.3525, "half_life": 1.9666, "r_squared": 0.9999,
         "adj_r_squared": 0.9998, "n_points": 6, "span_ratio": 5.339},
    ),
    (  # test_pknca.rs:302 pknca_auc_method_linear
        "auc_method_linear",
        [(0.0, 100.0)],
        [(0.0, 0.0), (1.0, 5.0), (2.0, 10.0), (3.0, 8.0), (4.0, 6.0),
         (6.0, 3.0), (8.0, 1.5), (12.0, 0.4)],
        lambda: NCAOptions().with_auc_method(AUCMethod.LINEAR),
        {"cmax": 10.0, "tmax": 2.0, "tlast": 12.0, "clast": 0.4,
         "lambda_z": 0.3356, "half_life": 2.0652, "r_squared": 0.9997,
         "adj_r_squared": 0.9997, "n_points": 5, "span_ratio": 4.3579},
    ),
    (  # test_pknca.rs:334 pknca_auc_method_linuplogdown
        "auc_method_linuplogdown",
        [(0.0, 100.0)],
        [(0.0, 0.0), (1.0, 5.0), (2.0, 10.0), (3.0, 8.0), (4.0, 6.0),
         (6.0, 3.0), (8.0, 1.5), (12.0, 0.4)],
        lambda: NCAOptions(),
        {"cmax": 10.0, "tmax": 2.0, "tlast": 12.0, "clast": 0.4,
         "lambda_z": 0.3356, "half_life": 2.0652, "r_squared": 0.9997,
         "adj_r_squared": 0.9997, "n_points": 5, "span_ratio": 4.3579},
    ),
    (  # test_pknca.rs:366 pknca_auc_method_linlog
        "auc_method_linlog",
        [(0.0, 100.0)],
        [(0.0, 0.0), (1.0, 5.0), (2.0, 10.0), (3.0, 8.0), (4.0, 6.0),
         (6.0, 3.0), (8.0, 1.5), (12.0, 0.4)],
        lambda: NCAOptions().with_auc_method(AUCMethod.LIN_LOG),
        {"cmax": 10.0, "tmax": 2.0, "tlast": 12.0, "clast": 0.4,
         "lambda_z": 0.3356, "half_life": 2.0652, "r_squared": 0.9997,
         "adj_r_squared": 0.9997, "n_points": 5, "span_ratio": 4.3579},
    ),
    (  # test_pknca.rs:402 pknca_lambda_z_short
        "lambda_z_short",
        [(0.0, 100.0)],
        [(0.0, 0.0), (1.0, 10.0), (2.0, 8.0), (4.0, 4.0), (6.0, 2.0),
         (8.0, 1.0)],
        lambda: NCAOptions(),
        {"cmax": 10.0, "tmax": 1.0, "tlast": 8.0, "clast": 1.0,
         "lambda_z": 0.3466, "half_life": 2.0, "r_squared": 1.0,
         "adj_r_squared": 1.0, "n_points": 4, "span_ratio": 3.0},
    ),
    (  # test_pknca.rs:432 pknca_lambda_z_long
        "lambda_z_long",
        [(0.0, 100.0)],
        [(0.0, 0.0), (1.0, 10.0), (2.0, 12.0), (4.0, 8.0), (6.0, 5.5),
         (8.0, 3.8), (12.0, 1.8), (16.0, 0.85), (24.0, 0.19), (36.0, 0.02),
         (48.0, 0.002)],
        lambda: NCAOptions(),
        {"cmax": 12.0, "tmax": 2.0, "tlast": 48.0, "clast": 0.002,
         "lambda_z": 0.1882, "half_life": 3.6828, "r_squared": 1.0,
         "adj_r_squared": 1.0, "n_points": 8, "span_ratio": 11.9474},
    ),
    (  # test_pknca.rs:531 pknca_auc_all_terminal_blq
        "auc_all_terminal_blq",
        [(0.0, 100.0)],
        [(0.0, 0.5, Censor.BLOQ), (1.0, 5.0), (2.0, 10.0), (4.0, 6.0),
         (6.0, 3.0), (8.0, 1.5), (10.0, 0.5, Censor.BLOQ),
         (12.0, 0.5, Censor.BLOQ)],
        lambda: NCAOptions().with_blq_rule(BLQRule.EXCLUDE),
        {"cmax": 10.0, "tmax": 2.0, "tlast": 8.0, "clast": 1.5,
         "lambda_z": 0.3466, "half_life": 2.0, "r_squared": 1.0,
         "adj_r_squared": 1.0, "n_points": 3, "span_ratio": 2.0},
    ),
    (  # test_pknca.rs:567 pknca_sparse_profile
        "sparse_profile",
        [(0.0, 100.0)],
        [(0.0, 0.0), (2.0, 12.0), (8.0, 3.0), (24.0, 0.2)],
        lambda: NCAOptions(),
        {"cmax": 12.0, "tmax": 2.0, "tlast": 24.0, "clast": 0.2},
    ),
    (  # test_pknca.rs:660 pknca_clast_pred_comparison
        "clast_pred_comparison",
        [(0.0, 100.0)],
        [(0.0, 0.0), (1.0, 8.0), (2.0, 12.0), (4.0, 7.0), (6.0, 4.0),
         (8.0, 2.3), (12.0, 0.8)],
        lambda: NCAOptions(),
        {"cmax": 12.0, "tmax": 2.0, "tlast": 12.0, "clast": 0.8,
         "lambda_z": 0.2708, "half_life": 2.5597, "r_squared": 0.9998,
         "adj_r_squared": 0.9997, "n_points": 4, "span_ratio": 3.1254},
    ),
    (  # test_pknca.rs:691 pknca_partial_auc ([2, 8] interval)
        "partial_auc",
        [(0.0, 100.0)],
        [(0.0, 0.0), (1.0, 5.0), (2.0, 10.0), (4.0, 8.0), (6.0, 5.5),
         (8.0, 3.5), (12.0, 1.5), (24.0, 0.3)],
        lambda: NCAOptions().with_auc_interval(2.0, 8.0),
        {"cmax": 10.0, "tmax": 2.0, "tlast": 24.0, "clast": 0.3,
         "lambda_z": 0.1631, "half_life": 4.2493, "r_squared": 0.9862,
         "adj_r_squared": 0.9816, "n_points": 5, "span_ratio": 4.7066},
    ),
    (  # test_pknca.rs:727 pknca_mrt_calculation
        "mrt_calculation",
        [(0.0, 100.0)],
        [(0.0, 0.0), (0.5, 3.0), (1.0, 8.0), (2.0, 10.0), (4.0, 6.5),
         (6.0, 4.0), (8.0, 2.5), (12.0, 1.0), (24.0, 0.15)],
        lambda: NCAOptions(),
        {"cmax": 10.0, "tmax": 2.0, "tlast": 24.0, "clast": 0.15,
         "lambda_z": 0.1792, "half_life": 3.8672, "r_squared": 0.9913,
         "adj_r_squared": 0.987, "n_points": 4, "span_ratio": 4.6545},
    ),
    (  # test_pknca.rs:760 pknca_tlag_detection
        "tlag_detection",
        [(0.0, 100.0)],
        [(0.0, 0.0), (0.25, 0.0), (0.5, 0.0), (1.0, 5.0), (2.0, 10.0),
         (4.0, 6.0), (6.0, 3.0), (8.0, 1.5)],
        lambda: NCAOptions(),
        {"cmax": 10.0, "tmax": 2.0, "tlast": 8.0, "clast": 1.5, "tlag": 0.5,
         "lambda_z": 0.3466, "half_life": 2.0, "r_squared": 1.0,
         "adj_r_squared": 1.0, "n_points": 3, "span_ratio": 2.0},
    ),
    (  # test_pknca.rs:793 pknca_numerical_precision
        "numerical_precision",
        [(0.0, 1000.0)],
        [(0.0, 0.0), (0.5, 15.234), (1.0, 45.678), (2.0, 67.891),
         (4.0, 52.345), (8.0, 28.123), (12.0, 15.067), (24.0, 4.321),
         (48.0, 0.354), (72.0, 0.029), (96.0, 0.002)],
        lambda: NCAOptions(),
        {"cmax": 67.891, "tmax": 2.0, "tlast": 96.0, "clast": 0.002,
         "lambda_z": 0.1059, "half_life": 6.5456, "r_squared": 0.9998,
         "adj_r_squared": 0.9997, "n_points": 5, "span_ratio": 12.8331},
    ),
    (  # test_pknca.rs:828 pknca_c0_logslope
        "c0_logslope",
        [(0.0, 100.0)],
        [(0.0, 0.0), (0.5, 8.0), (1.0, 6.5), (2.0, 4.3), (4.0, 1.9),
         (6.0, 0.8), (8.0, 0.35)],
        lambda: NCAOptions().with_route(Route.IV_BOLUS),
        {"cmax": 8.0, "tmax": 0.5, "tlast": 8.0, "clast": 0.35,
         "lambda_z": 0.4182, "half_life": 1.6573, "r_squared": 0.9999,
         "adj_r_squared": 0.9999, "n_points": 5, "span_ratio": 4.2237,
         "c0": 9.8462},
    ),
    (  # test_pknca.rs:866 pknca_span_ratio_test
        "span_ratio_test",
        [(0.0, 100.0)],
        [(0.0, 0.0), (1.0, 8.0), (2.0, 12.0), (4.0, 9.0), (8.0, 5.0),
         (12.0, 2.8), (24.0, 0.9), (48.0, 0.1)],
        lambda: NCAOptions(),
        {"cmax": 12.0, "tmax": 2.0, "tlast": 48.0, "clast": 0.1,
         "lambda_z": 0.0924, "half_life": 7.5002, "r_squared": 0.9999,
         "adj_r_squared": 0.9999, "n_points": 3, "span_ratio": 4.7999},
    ),
    (  # test_pknca.rs:963 pknca_steady_state_iv (tau=24, 2h infusion)
        "steady_state_iv",
        [(0.0, 500.0, 2.0)],
        [(0.0, 2.0), (1.0, 12.0), (2.0, 18.0), (4.0, 14.0), (6.0, 10.5),
         (8.0, 7.5), (12.0, 4.0), (18.0, 1.5), (24.0, 0.5)],
        lambda: NCAOptions().with_tau(24.0),
        {"cmax": 18.0, "tmax": 2.0, "tlast": 24.0, "clast": 0.5,
         "auc_last": 139.0232, "aumc_last": 920.3314,
         "auc_inf_obs": 142.0334, "auc_inf_pred": 142.1897,
         "aumc_inf": 1010.7007, "lambda_z": 0.1661, "half_life": 4.1731,
         "mrt": 7.1159, "r_squared": 0.999, "adj_r_squared": 0.9988,
         "n_points": 6, "span_ratio": 4.7926, "cl_f": 3.5203,
         "vss": 25.0502, "cmin": 0.5, "cavg": 5.7926, "mrt_iv": 6.1159},
    ),
]


@pytest.mark.parametrize("name,doses,obs,make_options,expected",
                         CASES, ids=[c[0] for c in CASES])
def test_pknca_golden(name, doses, obs, make_options, expected):
    subject = build(name, doses, obs)
    result = nca(subject, make_options())
    check(result, expected)


def test_pknca_flat_cmax():
    """test_pknca.rs:590 — Cmax plateau; terminal phase conditional."""
    subject = build("flat_cmax", [(0.0, 100.0)],
                    [(0.0, 0.0), (1.0, 5.0), (2.0, 10.0), (3.0, 10.0),
                     (4.0, 10.0), (6.0, 6.0), (8.0, 3.0)])
    result = nca(subject, NCAOptions())
    approx(result.exposure.cmax, 10.0, "cmax")
    approx(result.exposure.tmax, 2.0, "tmax")
    approx(result.exposure.tlast, 8.0, "tlast")
    approx(result.exposure.clast, 3.0, "clast")
    if result.terminal is not None:
        approx(result.terminal.lambda_z, 0.301, "lambda_z")
        approx(result.terminal.half_life, 2.3029, "half_life")


def test_pknca_high_extrapolation():
    """test_pknca.rs:627 — short sampling window; terminal conditional."""
    subject = build("high_extrapolation", [(0.0, 100.0)],
                    [(0.0, 0.0), (1.0, 10.0), (2.0, 8.0), (4.0, 5.0),
                     (6.0, 3.0)])
    result = nca(subject, NCAOptions())
    approx(result.exposure.cmax, 10.0, "cmax")
    approx(result.exposure.tmax, 1.0, "tmax")
    approx(result.exposure.clast, 3.0, "clast")
    if result.terminal is not None:
        approx(result.terminal.lambda_z, 0.2452, "lambda_z")
        approx(result.terminal.half_life, 2.8268, "half_life")


def test_basic_nca_sanity():
    """test_pknca.rs:1035 — no-PKNCA sanity case."""
    subject = build("sanity", [(0.0, 100.0)],
                    [(0.0, 10.0), (1.0, 6.0), (2.0, 3.6), (4.0, 1.3),
                     (8.0, 0.17)])
    result = nca(subject, NCAOptions())
    assert result.exposure.cmax == 10.0
    assert result.exposure.tmax == 0.0
    assert result.exposure.auc_last > 0.0
    assert result.terminal is not None
    assert result.terminal.lambda_z > 0.0
    assert result.terminal.half_life > 0.0
