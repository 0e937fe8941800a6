"""Inter-occasion variability (IOV) in the Laplace fitter.

NONMEM-style occasion-level random effects: each listed parameter gets
``kappa_ik ~ N(0, omega_iov^2)`` on the transformed scale on top of the
subject-level eta (the reference leaves estimation to external drivers;
this is estimation-layer surface beyond it). Oracle strategy matches the
other population tests: recovery is judged against the REALIZED sample
moments of the generating draws, not the asymptotic truth.
"""

import numpy as np
import pytest

import pharmsol_tpu as pst
from pharmsol_tpu import Analytical, Data, Subject
from pharmsol_tpu.data.residual_error import (
    ResidualErrorModel,
    ResidualErrorModels,
)
from pharmsol_tpu.errors import PharmsolError
from pharmsol_tpu.optimize import fit_laplace, laplace_standard_errors

pytestmark = pytest.mark.slow

KE, V = 0.25, 10.0


def _model():
    return Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1,
        ndrugs=1,
        nout=1,
    )


def _rems():
    return ResidualErrorModels().add(0, ResidualErrorModel.proportional(0.05))


def _population(n_sub=12, n_occ=3, om_eta=0.15, om_iov=0.30, seed=11):
    rng = np.random.default_rng(seed)
    subs, kaps = [], []
    for i in range(n_sub):
        eta = om_eta * rng.standard_normal()
        sb = Subject.builder(f"s{i}")
        for occ in range(n_occ):
            if occ:
                sb = sb.reset()
            kap = om_iov * rng.standard_normal()
            kaps.append(kap)
            ke = KE * np.exp(eta + kap)
            sb = sb.bolus(0.0, 100.0, 0)
            for t in (1.0, 4.0, 10.0):
                c = 100.0 * np.exp(-ke * t) / V
                sb = sb.observation(
                    float(t), float(c * (1 + 0.05 * rng.standard_normal())), 0
                )
        subs.append(sb.build())
    return Data(subs), np.asarray(kaps)


class TestIovRecovery:
    def test_recovers_realized_kappa_sd_and_beats_no_iov(self):
        data, kaps = _population()
        r0 = fit_laplace(_model(), data, _rems(), [0.3, 9.0],
                         max_iters=50, compute_se=False)
        r1 = fit_laplace(_model(), data, _rems(), [0.3, 9.0],
                         iov=[0], omega_iov0=0.2, max_iters=80)
        assert r0.omega_iov is None
        assert r1.converged
        assert r1.kappa.shape == (12, 3, 1)
        # the IOV model must dominate on data generated WITH IOV
        assert r1.log_likelihood > r0.log_likelihood + 5.0
        realized = kaps.std(ddof=1)
        assert abs(r1.omega_iov[0] - realized) < 0.12
        # kappa conditional modes track the generating draws
        corr = np.corrcoef(r1.kappa[:, :, 0].reshape(-1), kaps)[0, 1]
        assert corr > 0.8
        # typical value still recovered
        assert abs(r1.theta[0] - KE) < 0.05
        assert r1.omega_iov_standard_errors is not None
        assert np.all(r1.omega_iov_standard_errors > 0)

    def test_unbalanced_occasions_pad_cleanly(self):
        # subjects with 1..3 occasions share one padded kappa block; a
        # padded kappa's Gaussian integral cancels exactly, so the fit
        # must stay finite and the 1-occasion subject's extra slots sit
        # at zero
        rng = np.random.default_rng(5)
        subs = []
        for i, n_occ in enumerate([3, 2, 1, 3, 2, 3, 1, 2]):
            eta = 0.1 * rng.standard_normal()
            sb = Subject.builder(f"s{i}")
            for occ in range(n_occ):
                if occ:
                    sb = sb.reset()
                ke = KE * np.exp(eta + 0.25 * rng.standard_normal())
                sb = sb.bolus(0.0, 100.0, 0)
                for t in (1.0, 6.0):
                    c = 100.0 * np.exp(-ke * t) / V
                    sb = sb.observation(
                        float(t),
                        float(c * (1 + 0.05 * rng.standard_normal())), 0,
                    )
            subs.append(sb.build())
        r = fit_laplace(_model(), Data(subs), _rems(), [0.3, 9.0],
                        iov=[0], max_iters=60, compute_se=False)
        assert np.isfinite(r.log_likelihood)
        assert r.kappa.shape == (8, 3, 1)
        # padded occasions (beyond a subject's real count) have zero modes
        assert abs(r.kappa[2, 1, 0]) < 1e-6 and abs(r.kappa[2, 2, 0]) < 1e-6
        assert abs(r.kappa[6, 1, 0]) < 1e-6 and abs(r.kappa[6, 2, 0]) < 1e-6

    def test_fim_reproduces_iov_ses(self):
        # BOTH parameters need real between-subject variability here or
        # the omega of the degenerate one collapses to the boundary and
        # the psi Hessian goes singular (SEs legitimately unavailable)
        rng = np.random.default_rng(3)
        subs = []
        for i in range(10):
            eta_ke = 0.20 * rng.standard_normal()
            eta_v = 0.15 * rng.standard_normal()
            v = V * np.exp(eta_v)
            sb = Subject.builder(f"s{i}")
            for occ in range(2):
                if occ:
                    sb = sb.reset()
                ke = KE * np.exp(eta_ke + 0.3 * rng.standard_normal())
                sb = sb.bolus(0.0, 100.0, 0)
                for t in (0.5, 2.0, 6.0, 12.0):
                    c = 100.0 * np.exp(-ke * t) / v
                    sb = sb.observation(
                        float(t),
                        float(c * (1 + 0.05 * rng.standard_normal())), 0)
            subs.append(sb.build())
        data = Data(subs)
        r = fit_laplace(_model(), data, _rems(), [0.3, 9.0],
                        iov=[0], max_iters=100)
        assert r.standard_errors is not None
        fim = laplace_standard_errors(_model(), data, _rems(), r)
        assert fim.gradient_norm < 1e-2
        assert any("omega_iov" in nm for nm in fim.names)
        np.testing.assert_allclose(fim.theta_se, r.standard_errors, rtol=1e-3)
        np.testing.assert_allclose(
            fim.omega_se, r.omega_standard_errors, rtol=1e-3
        )


class TestSaemIov:
    def test_saem_recovers_realized_kappa_sd(self):
        from pharmsol_tpu.optimize import fit_saem

        data, kaps = _population(n_sub=16, n_occ=3)
        r0 = fit_saem(_model(), data, _rems(), [0.3, 9.0],
                      n_burn=100, n_iters=80, seed=2)
        assert r0.omega_iov is None
        r1 = fit_saem(_model(), data, _rems(), [0.3, 9.0], iov=[0],
                      omega_iov0=0.2, n_burn=250, n_iters=150, seed=2)
        assert r1.kappa.shape == (16, 3, 1)
        realized = kaps.std(ddof=1)
        assert abs(r1.omega_iov[0] - realized) < 0.12
        assert abs(r1.theta[0] - KE) < 0.05
        corr = np.corrcoef(r1.kappa[:, :, 0].reshape(-1), kaps)[0, 1]
        assert corr > 0.6
        # the kappa MH block adapts toward the same 0.3 target
        assert 0.15 < r1.accept_rate < 0.45

    def test_vpc_npde_draw_kappa(self):
        # replicate simulation draws kappa per (replicate, subject,
        # occasion) and applies it on the transformed scale, so the
        # predictive checks calibrate on IOV-generated data under the
        # IOV fit
        from pharmsol_tpu.optimize import npde, vpc

        data, _ = _population(n_sub=12, n_occ=3, seed=7)
        r = fit_laplace(_model(), data, _rems(), [0.3, 9.0],
                        iov=[0], max_iters=60, compute_se=False)
        v = vpc(_model(), data, _rems(), r, n_rep=200, seed=1)
        assert v.coverage() >= 0.6
        d = npde(_model(), data, _rems(), r, n_rep=400, seed=1)
        # suite convention: z_mean/z_var are moment-test z-statistics
        assert abs(d.z_mean) < 3.0, d.summary()
        assert abs(d.z_var) < 3.5, d.summary()
        assert 0.6 < d.variance < 1.6, d.summary()


class TestIovValidation:
    def test_single_occasion_data_rejected(self):
        rng = np.random.default_rng(0)
        subs = []
        for i in range(4):
            sb = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
            for t in (1.0, 6.0):
                sb = sb.observation(
                    float(t),
                    float(10.0 * np.exp(-0.25 * t)
                          * (1 + 0.05 * rng.standard_normal())), 0)
            subs.append(sb.build())
        with pytest.raises(PharmsolError, match="more than one occasion"):
            fit_laplace(_model(), Data(subs), _rems(), [0.3, 9.0], iov=[0])

    def test_bad_specs_rejected(self):
        data, _ = _population(n_sub=3, n_occ=2, seed=1)
        with pytest.raises(PharmsolError, match="out of range"):
            fit_laplace(_model(), data, _rems(), [0.3, 9.0], iov=[4])
        with pytest.raises(PharmsolError, match="duplicate"):
            fit_laplace(_model(), data, _rems(), [0.3, 9.0], iov=[0, 0])
        with pytest.raises(PharmsolError, match="unknown IOV parameter"):
            fit_laplace(_model(), data, _rems(), [0.3, 9.0], iov=["nope"])
