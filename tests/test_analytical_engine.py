"""Analytical engine parity tests.

Oracles:
- hand-derivable closed forms (1-cmt IV decay, infusion plateaus);
- exact expected values committed in the reference's own test suite
  (analytical/mod.rs:492-560: seq-eq accumulation -> 2.5, 4-input infusion
  -> 4.0);
- kernel algebra identities (CL wrappers vs micro-constant kernels,
  pm_ padded wrappers vs compact kernels).
"""

import math

import numpy as np
import pytest

import pharmsol_tpu as pst
from pharmsol_tpu import Analytical, Subject


def one_cmt_iv_model():
    return Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[:1] / p[1],
        nstates=1,
        ndrugs=1,
        nout=1,
    ).with_nstates(1).with_ndrugs(1).with_nout(1)


def test_single_bolus_decay():
    ke, v = 0.3, 2.0
    subject = (
        Subject.builder("s1")
        .bolus(0.0, 100.0, 0)
        .observation(1.0, 10.0, 0)
        .observation(2.0, 5.0, 0)
        .build()
    )
    model = one_cmt_iv_model()
    preds = model.estimate_predictions(subject, [ke, v])
    got = preds.flat_predictions()
    want = [100.0 * math.exp(-ke * t) / v for t in (1.0, 2.0)]
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_observation_before_bolus_at_same_time():
    # At equal times the observation sees the pre-dose state.
    ke, v = 0.1, 1.0
    subject = (
        Subject.builder("s1")
        .bolus(0.0, 50.0, 0)
        .observation(1.0, 0.0, 0)  # pre-dose of the t=1 bolus
        .bolus(1.0, 50.0, 0)
        .observation(2.0, 0.0, 0)
        .build()
    )
    model = one_cmt_iv_model()
    got = model.estimate_predictions(subject, [ke, v]).flat_predictions()
    pre = 50.0 * math.exp(-ke)
    want = [pre, (pre + 50.0) * math.exp(-ke)]
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_infusion_plateau_and_decay():
    # 1-cmt infusion: during infusion x = R/ke (1 - e^{-ke t})
    ke = 0.5
    subject = (
        Subject.builder("s1")
        .infusion(0.0, 10.0, 0, 2.0)  # rate 5 over [0, 2]
        .observation(1.0, 0.0, 0)
        .observation(2.0, 0.0, 0)
        .observation(3.0, 0.0, 0)
        .build()
    )
    model = Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[:1],
        nstates=1,
        ndrugs=1,
        nout=1,
    )
    got = model.estimate_predictions(subject, [ke]).flat_predictions()
    rate = 5.0
    x1 = rate / ke * (1 - math.exp(-ke * 1.0))
    x2 = rate / ke * (1 - math.exp(-ke * 2.0))
    x3 = x2 * math.exp(-ke * 1.0)
    np.testing.assert_allclose(got, [x1, x2, x3], rtol=1e-12)


def test_seq_eq_accumulates_within_span():
    """Reference oracle: analytical/mod.rs:492-527 expects exactly 2.5."""

    def eq(x, p, dt, rateiv, cov):
        return x + p[0] * dt

    def seq(p, t, cov):
        return p + 1.0

    model = Analytical(
        eq,
        seq_eq=seq,
        out=lambda x, p, t, cov: x[:1],
        nstates=1,
        ndrugs=1,
        nout=1,
    )
    subject = (
        Subject.builder("seq")
        .bolus(0.0, 0.0, 0)
        .infusion(0.25, 1.0, 0, 0.25)
        .observation(1.0, 0.0, 0)
        .build()
    )
    preds = model.estimate_predictions(subject, [1.0])
    assert abs(preds.flat_predictions()[0] - 2.5) < 1e-12


def test_multi_input_infusion():
    """Reference oracle: analytical/mod.rs:529-560 expects exactly 4.0."""

    def eq(x, p, dt, rateiv, cov):
        return x.at[0].add(rateiv[3] * dt)

    model = Analytical(
        eq,
        out=lambda x, p, t, cov: x[:1],
        nstates=4,
        ndrugs=4,
        nout=1,
    )
    subject = (
        Subject.builder("inf")
        .infusion(0.0, 4.0, 3, 1.0)
        .observation(1.0, 0.0, 0)
        .build()
    )
    preds = model.estimate_predictions(subject, [0.0])
    assert preds.flat_predictions()[0] == pytest.approx(4.0, abs=1e-12)


def test_oral_one_compartment_closed_form():
    ka, ke, v = 1.0, 0.1, 1.0
    dose = 100.0
    subject = Subject.builder("oral").bolus(0.0, dose, 0)
    for t in (0.5, 1.0, 2.0, 4.0, 8.0):
        subject = subject.observation(t, 0.0, 0)
    subject = subject.build()
    model = Analytical(
        pst.one_compartment_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2,
        ndrugs=1,
        nout=1,
    )
    got = model.estimate_predictions(subject, [ka, ke, v]).flat_predictions()
    want = [
        dose * ka / (ka - ke) * (math.exp(-ke * t) - math.exp(-ka * t)) / v
        for t in (0.5, 1.0, 2.0, 4.0, 8.0)
    ]
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_cl_wrappers_match_micro_kernels():
    import jax.numpy as jnp

    x1 = jnp.array([100.0])
    x2 = jnp.array([100.0, 40.0])
    x3 = jnp.array([100.0, 40.0, 20.0])
    r = jnp.array([3.0])
    t = 1.5
    cl, v = 0.4, 2.0
    np.testing.assert_allclose(
        pst.one_compartment_cl(x1, jnp.array([cl, v]), t, r),
        pst.one_compartment(x1, jnp.array([cl / v]), t, r),
        rtol=1e-14,
    )
    q, vc, vp = 1.0, 2.0, 5.0
    np.testing.assert_allclose(
        pst.two_compartments_cl(x2, jnp.array([cl, q, vc, vp]), t, r),
        pst.two_compartments(x2, jnp.array([cl / vc, q / vc, q / vp]), t, r),
        rtol=1e-14,
    )
    q2, vp2 = 0.5, 7.0
    np.testing.assert_allclose(
        pst.three_compartments_cl(x3, jnp.array([cl, q, q2, vc, vp, vp2]), t, r),
        pst.three_compartments(
            x3, jnp.array([cl / vc, q / vc, q2 / vc, q / vp, q2 / vp2]), t, r
        ),
        rtol=1e-14,
    )


def test_pm_wrappers_pad_slot_zero():
    import jax.numpy as jnp

    from pharmsol_tpu.engine.analytical import pm_wrap

    pm = pm_wrap(pst.two_compartments)
    x = jnp.array([1234.0, 100.0, 40.0])
    r = jnp.array([5678.0, 3.0])
    p = jnp.array([0.1, 0.3, 0.2])
    out = pm(x, p, 1.5, r)
    ref = pst.two_compartments(x[1:], p, 1.5, r[1:])
    assert out[0] == 0.0
    np.testing.assert_allclose(out[1:], ref, rtol=1e-14)


def test_two_compartments_matches_matrix_exponential():
    """Cross-check the eigen solution against expm of the rate matrix."""
    import jax.numpy as jnp
    from jax.scipy.linalg import expm

    ke, kcp, kpc = 0.23, 0.41, 0.17
    A = jnp.array([[-(ke + kcp), kpc], [kcp, -kpc]])
    x0 = jnp.array([80.0, 10.0])
    for t in (0.1, 1.0, 5.0):
        want = expm(A * t) @ x0
        got = pst.two_compartments(x0, jnp.array([ke, kcp, kpc]), t, jnp.array([0.0]))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9)


def test_three_compartments_matches_matrix_exponential():
    import jax.numpy as jnp
    from jax.scipy.linalg import expm

    k10, k12, k13, k21, k31 = 0.3, 0.2, 0.1, 0.15, 0.05
    A = jnp.array(
        [
            [-(k10 + k12 + k13), k21, k31],
            [k12, -k21, 0.0],
            [k13, 0.0, -k31],
        ]
    )
    x0 = jnp.array([100.0, 20.0, 5.0])
    p = jnp.array([k10, k12, k13, k21, k31])
    for t in (0.5, 2.0):
        want = expm(A * t) @ x0
        got = pst.three_compartments(x0, p, t, jnp.array([0.0]))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-8)


def test_lag_shifts_bolus():
    ke = 0.2
    tlag = 0.5

    model = Analytical(
        pst.one_compartment,
        lag=lambda p, t, cov: {0: p[1]},
        out=lambda x, p, t, cov: x[:1],
        nstates=1,
        ndrugs=1,
        nout=1,
    )
    subject = (
        Subject.builder("lag")
        .bolus(0.0, 100.0, 0)
        .observation(2.0, 0.0, 0)
        .build()
    )
    got = model.estimate_predictions(subject, [ke, tlag]).flat_predictions()
    want = 100.0 * math.exp(-ke * (2.0 - tlag))
    np.testing.assert_allclose(got, [want], rtol=1e-12)


def test_fa_scales_bolus():
    ke = 0.2
    f = 0.6
    model = Analytical(
        pst.one_compartment,
        fa=lambda p, t, cov: {0: p[1]},
        out=lambda x, p, t, cov: x[:1],
        nstates=1,
        ndrugs=1,
        nout=1,
    )
    subject = (
        Subject.builder("fa").bolus(0.0, 100.0, 0).observation(1.0, 0.0, 0).build()
    )
    got = model.estimate_predictions(subject, [ke, f]).flat_predictions()
    np.testing.assert_allclose(got, [60.0 * math.exp(-ke)], rtol=1e-12)


def test_multi_occasion_resets_state():
    ke = 0.3
    subject = (
        Subject.builder("occ")
        .bolus(0.0, 100.0, 0)
        .observation(1.0, 0.0, 0)
        .reset()
        .bolus(0.0, 50.0, 0)
        .observation(1.0, 0.0, 0)
        .build()
    )
    model = one_cmt_iv_model()
    got = model.estimate_predictions(subject, [ke, 1.0]).flat_predictions()
    want = [100.0 * math.exp(-ke), 50.0 * math.exp(-ke)]
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_init_applies_only_on_first_occasion():
    ke = 0.0
    model = Analytical(
        pst.one_compartment,
        init=lambda p, t, cov: np.asarray([7.0]),
        out=lambda x, p, t, cov: x[:1],
        nstates=1,
        ndrugs=1,
        nout=1,
    )
    subject = (
        Subject.builder("init")
        .observation(1.0, 0.0, 0)
        .reset()
        .observation(1.0, 0.0, 0)
        .build()
    )
    got = model.estimate_predictions(subject, [1e-12]).flat_predictions()
    np.testing.assert_allclose(got, [7.0, 0.0], atol=1e-9)


def test_covariate_modulated_elimination():
    # seq-free model whose out() uses a covariate at the obs time.
    model = Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[:1] / cov("wt", t),
        nstates=1,
        ndrugs=1,
        nout=1,
    )
    subject = (
        Subject.builder("cov")
        .bolus(0.0, 100.0, 0)
        .observation(0.0, 0.0, 0)
        .observation(10.0, 0.0, 0)
        .covariate("wt", 0.0, 50.0)
        .covariate("wt", 10.0, 70.0)
        .build()
    )
    ke = 1e-12
    got = model.estimate_predictions(subject, [ke]).flat_predictions()
    np.testing.assert_allclose(got, [0.0, 100.0 / 70.0], rtol=1e-9)


@pytest.mark.slow
def test_associative_scan_matches_serial():
    """with_scan('associative'): O(log M)-depth affine prefix composition
    must reproduce the serial segment scan exactly (SURVEY §5's
    sequence-parallel path; the reference has no counterpart)."""
    import numpy as np
    from pharmsol_tpu.likelihood.matrix import log_likelihood_matrix

    from pharmsol_tpu import AssayErrorModel, AssayErrorModels, Censor, ErrorPoly

    rng = np.random.RandomState(41)
    # long mixed regimen: q12h x 10 boluses + two infusions + dense obs,
    # multi-occasion, with BLOQ censoring
    b = Subject.builder("assoc")
    for d in range(10):
        b = b.bolus(d * 12.0, 100.0, 0)
    b = b.infusion(3.0, 50.0, 0, 2.0).infusion(60.0, 80.0, 0, 4.0)
    for t in np.linspace(0.5, 118.0, 25):
        b = b.observation(float(t), float(np.abs(5 + rng.randn())), 0)
    b = b.censored_observation(119.0, 0.5, 0, Censor.BLOQ)
    b = b.reset().bolus(0.0, 60.0, 0).observation(2.0, 3.0, 0)
    subject = b.build()

    def preds(model):
        return np.array(
            [q.prediction for q in model.estimate_predictions(
                subject, [0.15, 1.2, 0.3, 0.2, 10.0]).predictions()]
        )

    serial = Analytical(
        pst.two_compartments_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[4],
        nstates=3, ndrugs=1, nout=1,
    )
    assoc = Analytical(
        pst.two_compartments_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[4],
        nstates=3, ndrugs=1, nout=1,
    ).with_scan("associative")
    np.testing.assert_allclose(preds(assoc), preds(serial), rtol=1e-10)

    # psi path (ll_rows hook) with censoring
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    support = np.abs(
        np.array([0.15, 1.2, 0.3, 0.2, 10.0])[None, :] * (1.0 + 0.2 * rng.randn(11, 5))
    )
    from pharmsol_tpu import Data
    want = log_likelihood_matrix(serial, Data([subject]), support, ems)
    got = log_likelihood_matrix(assoc, Data([subject]), support, ems)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_associative_scan_rejects_seq_models():
    import pytest
    from pharmsol_tpu.errors import PharmsolError

    m = Analytical(
        pst.one_compartment,
        seq_eq=lambda p, t, cov: p,
        out=lambda x, p, t, cov: x[:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )
    with pytest.raises(PharmsolError, match="affine"):
        m.with_scan("associative")
    with pytest.raises(PharmsolError, match="scan mode"):
        Analytical(pst.one_compartment, out=lambda x, p, t, cov: x[:1],
                   nstates=1, ndrugs=1, nout=1).with_scan("butterfly")
