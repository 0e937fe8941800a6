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


class TestDeviceRouteSpecific:
    """Round 4: the device batch carries the full NCAResult — route-
    specific (C0 cascade / Vd / Vss, Ceoi / MRT-infusion) and
    steady-state blocks (analyze.rs:218-363) — so a 10k-population
    pipeline needs no host pass."""

    def _profiles(self, n=6, t0=0.0):
        rng = np.random.RandomState(7)
        t = np.array([t0, 0.5, 1.0, 2.0, 4.0, 8.0, 12.0, 24.0])
        if t0 > 0:
            t = t[1:]
        kes = rng.uniform(0.15, 0.35, n)
        c0s = rng.uniform(8.0, 15.0, n)
        c = c0s[:, None] * np.exp(-kes[:, None] * t[None, :])
        return t, c

    def _host_result(self, t, c_row, dose, route, dur=None, opts=None):
        from pharmsol_tpu import Subject
        from pharmsol_tpu.nca import nca

        input_idx = 1 if route in (Route.IV_BOLUS, Route.IV_INFUSION) else 0
        b = Subject.builder("s")
        if route is Route.IV_INFUSION:
            b = b.infusion(0.0, dose, 1, dur)
        elif route is Route.IV_BOLUS:
            b = b.bolus(0.0, dose, 1)
        else:
            b = b.bolus(0.0, dose, 0)
        for tt, cc in zip(t, c_row):
            b = b.observation(float(tt), float(cc), 0)
        return nca(b.build(), opts or NCAOptions())

    def test_iv_bolus_c0_vd_vss_parity(self):
        from pharmsol_tpu.nca.batch_device import batch_nca_device

        t, c = self._profiles(t0=0.25)  # no t=0 sample: LOG_SLOPE path
        dev = batch_nca_device(t, c, dose=100.0, route="iv_bolus")
        assert "c0" in dev and "vd" in dev and "vss" in dev
        for i in range(c.shape[0]):
            host = self._host_result(t, c[i], 100.0, Route.IV_BOLUS)
            assert host.route_params is not None
            hp = host.route_params.params
            np.testing.assert_allclose(dev["c0"][i], hp.c0, rtol=1e-8)
            np.testing.assert_allclose(dev["vd"][i], hp.vd, rtol=1e-8)
            np.testing.assert_allclose(
                dev["vss"][i], host.clearance.vss, rtol=1e-8
            )

    def test_iv_bolus_c0_observed_at_zero(self):
        from pharmsol_tpu.nca.batch_device import batch_nca_device

        t, c = self._profiles(t0=0.0)  # t=0 sample: OBSERVED wins
        dev = batch_nca_device(t, c, dose=100.0, route="iv_bolus")
        np.testing.assert_allclose(dev["c0"], c[:, 0], rtol=1e-12)

    def test_iv_infusion_ceoi_mrt_parity(self):
        from pharmsol_tpu.nca.batch_device import batch_nca_device

        t, c = self._profiles(t0=0.25)
        dur = 0.75  # interior to the grid: interpolated Ceoi
        dev = batch_nca_device(
            t, c, dose=100.0, route="iv_infusion", infusion_duration=dur
        )
        assert "ceoi" in dev and "mrt_iv" in dev
        for i in range(c.shape[0]):
            host = self._host_result(
                t, c[i], 100.0, Route.IV_INFUSION, dur=dur
            )
            hp = host.route_params.params
            np.testing.assert_allclose(dev["ceoi"][i], hp.ceoi, rtol=1e-8)
            np.testing.assert_allclose(
                dev["mrt_iv"][i], hp.mrt_iv, rtol=1e-8
            )

    def test_steady_state_block_parity(self):
        from pharmsol_tpu.nca.batch_device import batch_nca_device

        t, c = self._profiles(t0=0.25)
        opts = NCAOptions().with_tau(12.0)
        dev = batch_nca_device(t, c, dose=100.0, options=opts)
        for k in ("auc_tau", "cmin", "cavg", "fluctuation", "swing",
                  "peak_trough_ratio"):
            assert k in dev, k
        for i in range(c.shape[0]):
            host = self._host_result(
                t, c[i], 100.0, Route.EXTRAVASCULAR, opts=opts
            )
            ss = host.steady_state
            np.testing.assert_allclose(
                dev["auc_tau"][i], ss.auc_tau, rtol=1e-8)
            np.testing.assert_allclose(dev["cmin"][i], ss.cmin, rtol=1e-8)
            np.testing.assert_allclose(dev["cavg"][i], ss.cavg, rtol=1e-8)
            np.testing.assert_allclose(
                dev["fluctuation"][i], ss.fluctuation, rtol=1e-8)
            np.testing.assert_allclose(
                dev["swing"][i], ss.swing, rtol=1e-8)
