"""Vectorized batch NCA vs the per-subject scalar path."""

import math
import time

import numpy as np

from pharmsol_tpu.data.event import Route
from pharmsol_tpu.nca import NCAOptions
from pharmsol_tpu.nca.analyze import AnalysisContext, analyze
from pharmsol_tpu.nca.batch import batch_nca
from pharmsol_tpu.nca.observation import _finalize


def make_profiles(n=40, T=24, seed=0):
    rng = np.random.RandomState(seed)
    t = np.linspace(0.25, 24.0, T)
    ka = 1.2 * np.exp(0.2 * rng.randn(n))
    ke = 0.2 * np.exp(0.3 * rng.randn(n))
    v = 30.0 * np.exp(0.2 * rng.randn(n))
    c = 100.0 * ka[:, None] / (ka - ke)[:, None] * (
        np.exp(-ke[:, None] * t[None, :]) - np.exp(-ka[:, None] * t[None, :])
    ) / v[:, None]
    return t, np.abs(c) + 1e-9


def test_batch_matches_scalar_path():
    t, c = make_profiles()
    options = NCAOptions()
    batch = batch_nca(t, c, dose=100.0, options=options)

    for i in range(c.shape[0]):
        profile = _finalize(list(t), list(c[i]))
        res = analyze(
            AnalysisContext(
                profile=profile,
                dose_amount=100.0,
                route=Route.EXTRAVASCULAR,
                infusion_duration=None,
                options=options,
            )
        )
        np.testing.assert_allclose(batch["cmax"][i], res.exposure.cmax, rtol=1e-12)
        np.testing.assert_allclose(batch["tmax"][i], res.exposure.tmax, rtol=1e-12)
        np.testing.assert_allclose(batch["auc_last"][i], res.exposure.auc_last, rtol=1e-10)
        np.testing.assert_allclose(batch["aumc_last"][i], res.exposure.aumc_last, rtol=1e-10)
        if res.terminal is not None:
            np.testing.assert_allclose(batch["lambda_z"][i], res.terminal.lambda_z, rtol=1e-9)
            np.testing.assert_allclose(batch["half_life"][i], res.terminal.half_life, rtol=1e-9)
            assert batch["lambda_z_n_points"][i] == res.terminal.regression.n_points
            np.testing.assert_allclose(
                batch["auc_inf_obs"][i], res.exposure.auc_inf_obs, rtol=1e-9
            )
            np.testing.assert_allclose(
                batch["auc_inf_pred"][i], res.exposure.auc_inf_pred, rtol=1e-9
            )
            np.testing.assert_allclose(batch["mrt"][i], res.terminal.mrt, rtol=1e-9)
            np.testing.assert_allclose(batch["cl_f"][i], res.clearance.cl_f, rtol=1e-9)
            np.testing.assert_allclose(batch["vz_f"][i], res.clearance.vz_f, rtol=1e-9)
        else:
            assert np.isnan(batch["lambda_z"][i])


def test_batch_nca_throughput():
    t, c = make_profiles(n=5000, T=32, seed=1)
    t0 = time.perf_counter()
    batch = batch_nca(t, c, dose=100.0)
    dt = time.perf_counter() - t0
    rate = c.shape[0] / dt
    print(f"batch NCA: {rate:,.0f} subjects/s")
    assert rate > 20_000  # scalar path is ~400/s
    assert np.all(np.isfinite(batch["lambda_z"]) | np.isnan(batch["lambda_z"]))


class TestBatchNCADevice:
    """Device (jitted) batch NCA == host batch NCA == scalar path."""

    def test_device_matches_host_batch(self):
        from pharmsol_tpu.nca.batch_device import batch_nca_device

        t, c = make_profiles(n=60, T=24, seed=2)
        host = batch_nca(t, c, dose=100.0)
        dev = batch_nca_device(t, c, dose=100.0)
        assert set(dev) == set(host)
        for key in host:
            h, d = host[key], dev[key]
            nan_h, nan_d = np.isnan(h), np.isnan(d)
            np.testing.assert_array_equal(nan_h, nan_d, err_msg=key)
            np.testing.assert_allclose(
                d[~nan_d], h[~nan_h], rtol=1e-8, err_msg=key
            )

    def test_device_matches_host_linear_method(self):
        from pharmsol_tpu.data.event import AUCMethod
        from pharmsol_tpu.nca.batch_device import batch_nca_device

        t, c = make_profiles(n=20, T=16, seed=3)
        opts = NCAOptions(auc_method=AUCMethod.LINEAR)
        host = batch_nca(t, c, options=opts)
        dev = batch_nca_device(t, c, options=opts)
        np.testing.assert_allclose(dev["auc_last"], host["auc_last"], rtol=1e-10)
        np.testing.assert_allclose(dev["aumc_last"], host["aumc_last"], rtol=1e-10)

    def test_device_no_dose(self):
        from pharmsol_tpu.nca.batch_device import batch_nca_device

        t, c = make_profiles(n=8, T=12, seed=4)
        dev = batch_nca_device(t, c)
        assert "cl_f" not in dev
        assert np.all(dev["cmax"] > 0)

    def test_device_runs_sharded(self):
        """The jitted program runs SPMD over a subjects-sharded mesh axis."""
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from pharmsol_tpu.nca.batch_device import batch_nca_device

        devs = jax.devices()
        if len(devs) < 2:
            import pytest

            pytest.skip("needs a multi-device mesh")
        n_dev = min(len(devs), 8)
        mesh = Mesh(np.array(devs[:n_dev]), ("subjects",))
        t, c = make_profiles(n=8 * n_dev, T=24, seed=5)
        c_sh = jax.device_put(c, NamedSharding(mesh, P("subjects", None)))
        got = batch_nca_device(t, c_sh, dose=100.0)
        want = batch_nca(t, c, dose=100.0)
        for key in ("cmax", "auc_last", "lambda_z", "cl_f"):
            h, d = want[key], got[key]
            nan = np.isnan(h)
            np.testing.assert_allclose(d[~nan], h[~nan], rtol=1e-8, err_msg=key)
