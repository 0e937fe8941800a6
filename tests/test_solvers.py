"""Solver matrix (tests/test_solvers.rs parity) + tableau order conditions."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pharmsol_tpu as pst
from pharmsol_tpu import ODE, Analytical, Subject


def test_kvaerno_tableaus_satisfy_order_conditions():
    from pharmsol_tpu.engine.ode import (
        _KV3_A, _KV3_B, _KV3_BHAT, _KV3_C,
        _KV5_A, _KV5_B, _KV5_BHAT, _KV5_C,
    )

    for A, B, BHAT, C, order in (
        (_KV3_A, _KV3_B, _KV3_BHAT, _KV3_C, 3),
        (_KV5_A, _KV5_B, _KV5_BHAT, _KV5_C, 4),
    ):
        # stage consistency: row sums equal c
        for i, row in enumerate(A):
            assert abs(sum(row) - C[i]) < 1e-10, (i, sum(row), C[i])
        # order 1: sum b = 1; order 2: sum b c = 1/2; order 3: sum b c^2 = 1/3
        assert abs(sum(B) - 1.0) < 1e-10
        assert abs(sum(b * c for b, c in zip(B, C)) - 0.5) < 1e-10
        assert abs(sum(b * c * c for b, c in zip(B, C)) - 1.0 / 3.0) < 1e-9
        # embedded method is at least order 2
        assert abs(sum(BHAT) - 1.0) < 1e-10
        assert abs(sum(b * c for b, c in zip(BHAT, C)) - 0.5) < 1e-9


@pytest.mark.parametrize(
    "solver", ["dopri5", "tsit5", "kvaerno3", "kvaerno5", "bdf", "esdirk34", "trbdf2"]
)
def test_all_solver_names_agree(solver):
    """Every named solver integrates the 1-cmt infusion model to the
    analytical oracle (test_solvers.rs strategy)."""
    subject = (
        Subject.builder("s")
        .bolus(0.0, 100.0, 0)
        .infusion(4.0, 80.0, 0, 2.0)
        .observation(1.0, 0.0, 0)
        .observation(5.0, 0.0, 0)
        .observation(10.0, 0.0, 0)
        .build()
    )
    analytical = Analytical(
        pst.one_compartment, out=lambda x, p, t, cov: x[:1], nstates=1, ndrugs=1, nout=1
    )
    ode = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([-p[0] * x[0] + b[0] + rateiv[0]]),
        out=lambda x, p, t, cov: x[:1],
        nstates=1, ndrugs=1, nout=1,
    ).with_solver(solver).with_tolerances(1e-9, 1e-9)
    got = ode.estimate_predictions(subject, [0.35]).flat_predictions()
    want = analytical.estimate_predictions(subject, [0.35]).flat_predictions()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_unknown_solver_rejected():
    ode = ODE(
        lambda x, p, t, b, rateiv, cov: -p[0] * x,
        out=lambda x, p, t, cov: x[:1],
        nstates=1, ndrugs=1, nout=1,
    ).with_solver("rk99")
    subject = Subject.builder("s").bolus(0, 1, 0).observation(1.0, 0.0, 0).build()
    with pytest.raises(ValueError) as exc:
        ode.estimate_predictions(subject, [0.1])
    assert "unknown ODE solver" in str(exc.value)


@pytest.mark.parametrize("solver", ["dopri5", "bdf", "kvaerno3"])
def test_f32_runaway_lane_poisons_fast(solver):
    """A lane whose dynamics overflow f32 must poison (NaN), not spin.

    Without the no-progress stall guard the controller shrinks h below
    ulp(t), t + h == t, and the while loop runs all 10k max_steps doing
    nothing — under vmap at population scale that stalls the whole batch
    and trips the TPU watchdog (observed as a worker crash).
    """
    from pharmsol_tpu.engine.ode import _SEGMENT_SOLVERS, ODEOptions

    seg = _SEGMENT_SOLVERS[solver]

    def f(x, t):
        return x * x  # finite-time blow-up, overflows f32 immediately

    x0 = jnp.asarray([1e20], jnp.float32)
    out = np.asarray(
        jax.jit(lambda x: seg(f, x, jnp.float32(0.0), jnp.float32(10.0), ODEOptions()))(x0)
    )
    assert np.all(np.isnan(out))
