"""Kernel matrix: prepared-vs-plain parity and closed-form-vs-ODE oracles
for all 12 analytical kernels (numerical_stability.rs strategy, tightened)."""

import jax.numpy as jnp
import numpy as np
import pytest

import pharmsol_tpu as pst
from pharmsol_tpu import ODE, Analytical, Subject
from pharmsol_tpu.engine.analytical import KERNELS, PREPARED_KERNELS

pytestmark = pytest.mark.slow  # heavy parity tier; quick gate runs -m 'not slow'

# plausible positive parameters per kernel (kernel order)
KERNEL_PARAMS = {
    "one_compartment": [0.21],
    "one_compartment_with_absorption": [1.3, 0.21],
    "one_compartment_cl": [0.8, 3.7],
    "one_compartment_cl_with_absorption": [1.3, 0.8, 3.7],
    "two_compartments": [0.21, 0.31, 0.17],
    "two_compartments_with_absorption": [0.21, 1.3, 0.31, 0.17],
    "two_compartments_cl": [0.8, 1.1, 3.7, 6.1],
    "two_compartments_cl_with_absorption": [1.3, 0.8, 1.1, 3.7, 6.1],
    "three_compartments": [0.3, 0.2, 0.1, 0.15, 0.05],
    "three_compartments_with_absorption": [1.3, 0.3, 0.2, 0.1, 0.15, 0.05],
    "three_compartments_cl": [0.8, 1.1, 0.4, 3.7, 6.1, 9.0],
    "three_compartments_cl_with_absorption": [1.3, 0.8, 1.1, 0.4, 3.7, 6.1, 9.0],
}


@pytest.mark.parametrize("name", sorted(KERNELS))
def test_prepared_matches_plain(name):
    kernel, nstates, nparams = KERNELS[name]
    prepare, apply = PREPARED_KERNELS[name]
    p = jnp.asarray(KERNEL_PARAMS[name], dtype=jnp.float64)
    assert p.shape[0] == nparams
    rng = np.random.RandomState(3)
    for dt in (0.1, 1.0, 7.5):
        x = jnp.asarray(np.abs(rng.randn(nstates)) * 50.0)
        r = jnp.asarray([3.0])
        plain = kernel(x, p, dt, r)
        aux = prepare(p)
        prepped = apply(aux, x, dt, r)
        np.testing.assert_allclose(np.asarray(prepped), np.asarray(plain), rtol=1e-12)


def _ode_for(name):
    """Equivalent micro-constant ODE for each kernel family."""

    def cl1(p):
        return jnp.stack([p[0] / p[1]])

    def cl1abs(p):
        return jnp.stack([p[0], p[1] / p[2]])

    def cl2(p):
        return jnp.stack([p[0] / p[2], p[1] / p[2], p[1] / p[3]])

    def cl2abs(p):
        return jnp.stack([p[1] / p[3], p[0], p[2] / p[3], p[2] / p[4]])

    def cl3(p):
        return jnp.stack([p[0] / p[3], p[1] / p[3], p[2] / p[3], p[1] / p[4], p[2] / p[5]])

    def cl3abs(p):
        return jnp.stack(
            [p[0], p[1] / p[4], p[2] / p[4], p[3] / p[4], p[2] / p[5], p[3] / p[6]]
        )

    def iv1(x, k, b, r):
        return jnp.stack([-k[0] * x[0] + b[0] + r[0]])

    def oral1(x, k, b, r):
        ka, ke = k[0], k[1]
        return jnp.stack([-ka * x[0] + b[0], ka * x[0] - ke * x[1] + r[0]])

    def iv2(x, k, b, r):
        ke, kcp, kpc = k[0], k[1], k[2]
        return jnp.stack(
            [-(ke + kcp) * x[0] + kpc * x[1] + b[0] + r[0], kcp * x[0] - kpc * x[1]]
        )

    def oral2(x, k, b, r):
        ke, ka, kcp, kpc = k[0], k[1], k[2], k[3]
        return jnp.stack(
            [
                -ka * x[0] + b[0],
                ka * x[0] - (ke + kcp) * x[1] + kpc * x[2] + r[0],
                kcp * x[1] - kpc * x[2],
            ]
        )

    def iv3(x, k, b, r):
        k10, k12, k13, k21, k31 = k[0], k[1], k[2], k[3], k[4]
        return jnp.stack(
            [
                -(k10 + k12 + k13) * x[0] + k21 * x[1] + k31 * x[2] + b[0] + r[0],
                k12 * x[0] - k21 * x[1],
                k13 * x[0] - k31 * x[2],
            ]
        )

    def oral3(x, k, b, r):
        ka, k10, k12, k13, k21, k31 = k[0], k[1], k[2], k[3], k[4], k[5]
        return jnp.stack(
            [
                -ka * x[0] + b[0],
                ka * x[0] - (k10 + k12 + k13) * x[1] + k21 * x[2] + k31 * x[3] + r[0],
                k12 * x[1] - k21 * x[2],
                k13 * x[1] - k31 * x[3],
            ]
        )

    table = {
        "one_compartment": (iv1, None, 1),
        "one_compartment_with_absorption": (oral1, None, 2),
        "one_compartment_cl": (iv1, cl1, 1),
        "one_compartment_cl_with_absorption": (oral1, cl1abs, 2),
        "two_compartments": (iv2, None, 2),
        "two_compartments_with_absorption": (oral2, None, 3),
        "two_compartments_cl": (iv2, cl2, 2),
        "two_compartments_cl_with_absorption": (oral2, cl2abs, 3),
        "three_compartments": (iv3, None, 3),
        "three_compartments_with_absorption": (oral3, None, 4),
        "three_compartments_cl": (iv3, cl3, 3),
        "three_compartments_cl_with_absorption": (oral3, cl3abs, 4),
    }
    rhs, remap, nstates = table[name]

    def diffeq(x, p, t, b, rateiv, cov):
        k = remap(p) if remap else p
        return rhs(x, k, b, rateiv)

    return diffeq, nstates


@pytest.mark.parametrize("name", sorted(KERNELS))
def test_kernel_matches_ode(name):
    """Every closed form agrees with direct integration of its rate matrix."""
    kernel, nstates, nparams = KERNELS[name]
    p = KERNEL_PARAMS[name]
    diffeq, ns = _ode_for(name)
    assert ns == nstates

    b = Subject.builder("s").bolus(0.0, 100.0, 0).infusion(4.0, 60.0, 0, 2.0)
    for t in (0.5, 2.0, 5.0, 8.0, 16.0):
        b = b.missing_observation(t, 0)
    subject = b.build()

    analytical = Analytical(
        kernel, out=lambda x, pp, t, cov: x[:1], nstates=nstates, ndrugs=1, nout=1
    )
    ode = ODE(
        diffeq, out=lambda x, pp, t, cov: x[:1], nstates=nstates, ndrugs=1, nout=1
    ).with_tolerances(1e-11, 1e-11)

    got = analytical.estimate_predictions(subject, p).flat_predictions()
    want = ode.estimate_predictions(subject, p).flat_predictions()
    np.testing.assert_allclose(got, want, rtol=2e-7, atol=1e-10)
