"""Quick-gate kernel smoke: one minimal interpret-mode parity test per
fused pallas tier.

Round-5 (VERDICT item 6): every heavy pallas parity file carries the
module-level ``slow`` marker, so the default pre-land gate exercised no
fused-kernel code at all — a broken kernel constant would only surface
in the ~4 h slow tier or on-chip smoke.  This file promotes ONE tiny
parity case per kernel family into the quick gate (budget: well under a
minute per test at these sizes):

  - analytical fused psi (ops/pallas_psi.py)
  - ODE explicit tier, dopri5 merged march (ops/pallas_ode.py)
  - ODE stiff tier, in-kernel SDIRK trbdf2 (ops/pallas_ode.py)
  - SDE particle filter at zero diffusion (ops/pallas_sde.py)
  - lag + tv-seq colplanes split-march (plans/decompose + pallas_psi)

The full coverage matrix stays in the slow-tier files; these exist only
so the quick gate fails when a kernel regresses.
"""

import jax.numpy as jnp
import numpy as np

import pharmsol_tpu as pst
from pharmsol_tpu import (
    SDE,
    Analytical,
    AssayErrorModel,
    AssayErrorModels,
    Data,
    ErrorPoly,
    Subject,
)
from pharmsol_tpu.likelihood.matrix import log_likelihood_matrix
from pharmsol_tpu.models.equation import ODE


def _ems():
    return AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0)
    )


def _subjects(n=4, obs=(0.5, 2.0, 6.0)):
    out = []
    for i in range(n):
        sb = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
        for t in obs:
            sb = sb.observation(t, float(5 * np.exp(-0.2 * t) + 0.1 * i), 0)
        out.append(sb.build())
    return Data(out)


def _check(model, data, sp, tol, **kw):
    x = log_likelihood_matrix(model, data, sp, _ems(), engine="xla")
    p = log_likelihood_matrix(model, data, sp, _ems(), engine="pallas")
    err = np.max(np.abs(p - x) / np.maximum(np.abs(x), 1.0))
    assert err < tol, err


def test_smoke_analytical_psi():
    rng = np.random.RandomState(0)
    model = Analytical(
        pst.one_compartment_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    )
    sp = np.column_stack([
        rng.uniform(0.8, 2.0, 4), rng.uniform(0.1, 0.3, 4),
        rng.uniform(8, 15, 4),
    ])
    _check(model, _subjects(), sp, 1e-9)


def test_smoke_ode_dopri5():
    rng = np.random.RandomState(1)
    ode = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack(
            [-p[0] * x[0] + b[0], p[0] * x[0] - p[1] * x[1]]
        ),
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    )
    sp = np.column_stack([
        rng.uniform(0.8, 2.0, 4), rng.uniform(0.1, 0.3, 4),
        rng.uniform(8, 15, 4),
    ])
    # merged-vs-XLA ODE parity is accuracy-level (~rtol), never tighten
    # below ~1e-4 (CLAUDE.md)
    _check(ode, _subjects(), sp, 1e-4)


def test_smoke_ode_stiff_trbdf2():
    rng = np.random.RandomState(2)
    ode = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack(
            [-p[0] * x[0] + b[0], p[0] * x[0] - p[1] * x[1]]
        ),
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    ).with_solver("trbdf2")
    sp = np.column_stack([
        rng.uniform(0.8, 2.0, 4), rng.uniform(0.1, 0.3, 4),
        rng.uniform(8, 15, 4),
    ])
    _check(ode, _subjects(), sp, 1e-3)


def test_smoke_sde_zero_diffusion():
    sde = SDE(
        drift=lambda x, p, t, rateiv, cov: jnp.stack([-p[0] * x[0]]),
        diffusion=lambda p, t, cov: jnp.stack([0.0]),
        out=lambda x, p, t, cov: x[0:1] / p[1],
        nparticles=8, nstates=1, ndrugs=1, nout=1, seed=3,
    )
    rng = np.random.default_rng(4)
    sp = np.column_stack([rng.uniform(0.2, 0.6, 4), rng.uniform(8, 14, 4)])
    _check(sde, _subjects(), sp, 1e-9)


def test_smoke_lag_tv_seq_colplanes():
    rng = np.random.RandomState(5)
    model = Analytical(
        pst.one_compartment_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[2],
        seq_eq=lambda p, t, cov: jnp.stack(
            [p[0], p[1] * (cov("wt", t) / 70.0) ** 0.75, p[2], p[3]]
        ),
        lag=lambda p, t, cov: {0: p[3]},
        nstates=2, ndrugs=1, nout=1,
    )
    subs = []
    for i in range(4):
        sb = (Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
              .covariate("wt", 0.0, 55.0 + 4.0 * i)
              .covariate("wt", 4.0, 62.0 + 3.0 * i))
        for t in (0.5, 2.0, 6.0):
            sb = sb.observation(t, float(4 * np.exp(-0.25 * t) + 0.1 * i), 0)
        subs.append(sb.build())
    sp = np.column_stack([
        rng.uniform(0.8, 2.0, 4), rng.uniform(0.1, 0.3, 4),
        rng.uniform(8, 15, 4), rng.uniform(0.1, 1.2, 4),
    ])
    _check(model, Data(subs), sp, 1e-9)
