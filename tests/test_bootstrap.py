"""Case-resampling bootstrap (optimize/bootstrap.py).

The reference leaves uncertainty quantification to external drivers;
this suite exercises the in-framework subject-resampling bootstrap:
mechanics with a deterministic stub fitter (quick tier) and a
statistical oracle against Laplace analytic SEs (slow tier).
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
from pharmsol_tpu.optimize import bootstrap, bootstrap_laplace, fit_laplace


class _StubResult:
    def __init__(self, theta, names=None):
        self.theta = np.asarray(theta, dtype=np.float64)
        self.parameter_names = names


def _toy_data(n=10):
    subjects = []
    for i in range(n):
        sb = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
        sb = sb.observation(1.0, float(i), 0)
        subjects.append(sb.build())
    return Data(subjects)


def _id_mean_fit(data):
    ids = [float(s.id[1:]) for s in data.subjects()]
    return _StubResult([np.mean(ids)], names=("mu",))


def test_bootstrap_mechanics_deterministic_stub():
    data = _toy_data(12)
    res = bootstrap(data, _id_mean_fit, n_boot=64, seed=1)
    assert res.n_requested == 64 and res.n_failed == 0
    assert res.samples["theta"].shape == (64, 1)
    assert res.parameter_names == ("mu",)
    # full-data estimate is the exact id mean
    assert res.estimate["theta"][0] == pytest.approx(np.mean(range(12)))
    # replicate means of a with-replacement resample scatter around the
    # full-data mean with SE ~ sd/sqrt(n)
    se = res.se()["theta"][0]
    expect = np.std(np.arange(12.0)) / np.sqrt(12.0)
    assert 0.5 * expect < se < 2.0 * expect
    lo, hi = res.ci()["theta"]
    assert lo[0] < res.estimate["theta"][0] < hi[0]
    assert "mu" in res.summary()
    bias = res.bias()["theta"][0]
    assert abs(bias) < 3.0 * se


def test_bootstrap_same_seed_reproduces():
    data = _toy_data(8)
    a = bootstrap(data, _id_mean_fit, n_boot=16, seed=7)
    b = bootstrap(data, _id_mean_fit, n_boot=16, seed=7)
    np.testing.assert_array_equal(a.samples["theta"], b.samples["theta"])
    c = bootstrap(data, _id_mean_fit, n_boot=16, seed=8)
    assert not np.array_equal(a.samples["theta"], c.samples["theta"])


def test_bootstrap_stratified_preserves_stratum_sizes():
    data = _toy_data(10)

    def per_stratum_counts(d):
        ids = [int(s.id[1:]) for s in d.subjects()]
        return _StubResult([
            sum(1 for i in ids if i % 2 == 0),
            sum(1 for i in ids if i % 2 == 1),
        ])

    res = bootstrap(
        data, per_stratum_counts, n_boot=16, seed=3,
        stratify=lambda s: int(s.id[1:]) % 2,
    )
    # stratum sizes are invariant under stratified resampling
    np.testing.assert_array_equal(
        res.samples["theta"], np.full((16, 2), 5.0)
    )


def test_bootstrap_skips_failed_replicates():
    data = _toy_data(6)
    calls = {"n": 0}

    def flaky(d):
        calls["n"] += 1
        if calls["n"] % 3 == 0:
            raise RuntimeError("refit blew up")
        return _id_mean_fit(d)

    res = bootstrap(data, flaky, n_boot=12, seed=0, include_full=False)
    assert res.n_failed == 4
    assert res.samples["theta"].shape[0] == 8
    with pytest.raises(RuntimeError):
        bootstrap(data, flaky, n_boot=12, seed=0, on_error="raise",
                  include_full=False)


def test_bootstrap_validation_errors():
    data = _toy_data(4)
    with pytest.raises(PharmsolError):
        bootstrap(data, _id_mean_fit, n_boot=1)
    with pytest.raises(PharmsolError):
        bootstrap(Data([data.subjects()[0]]), _id_mean_fit, n_boot=8)
    with pytest.raises(PharmsolError):
        bootstrap(data, _id_mean_fit, n_boot=8, on_error="explode")
    with pytest.raises(PharmsolError):
        bootstrap(data, lambda d: object(), n_boot=8)


# --- statistical oracle against the Laplace fitter (slow tier) ---

KE, V = 0.25, 10.0


def _model():
    return Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )


def _population(n=16, seed=5):
    rng = np.random.default_rng(seed)
    subjects = []
    for i in range(n):
        ke = KE * np.exp(0.3 * rng.standard_normal())
        v = V * np.exp(0.15 * rng.standard_normal())
        sb = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
        for t in (0.5, 2.0, 6.0, 12.0, 24.0):
            c = 100.0 * np.exp(-ke * t) / v
            sb = sb.observation(
                float(t), float(c * (1 + 0.08 * rng.standard_normal())), 0
            )
        subjects.append(sb.build())
    return Data(subjects)


@pytest.mark.slow
def test_vectorized_bootstrap_se_matches_laplace_analytic_se():
    data = _population(n=12)
    rem = ResidualErrorModels().add(0, ResidualErrorModel.proportional(0.2))
    res = bootstrap_laplace(
        _model(), data, rem, [0.4, 8.0],
        n_boot=24, seed=2, refit_iters=25, max_iters=60,
    )
    full = res.full  # the full-data LaplaceResult rides along (one fit)
    assert res.n_failed <= 4
    assert res.samples["theta"].shape[1] == 2
    assert res.samples["omega"].shape[1] == 2
    boot_se = res.se()["theta"]
    # bootstrap and analytic (exact-Hessian) SEs agree to a loose factor
    for j in range(2):
        ratio = boot_se[j] / full.standard_errors[j]
        assert 0.2 < ratio < 5.0, (j, boot_se, full.standard_errors)
    lo, hi = res.ci()["theta"]
    assert np.all(lo < full.theta) and np.all(full.theta < hi)
    # the full-data estimate rides along for bias reporting
    np.testing.assert_allclose(res.estimate["theta"], full.theta)
    assert "theta" in res.summary()
