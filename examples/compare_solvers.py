"""Solver comparison + analytical-vs-ODE agreement.

Mirrors the reference's examples/compare_solvers.rs and
examples/analytical_vs_ode.rs: the same 2-cmt oral model solved with the
closed-form kernel and every ODE stepper, agreeing within the solver
tolerance contracts, with per-solver wall times.

Run: python examples/compare_solvers.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

import pharmsol_tpu as pst
from pharmsol_tpu import ODE, Analytical, Subject

PARAMS = [0.15, 1.2, 0.3, 0.2, 10.0]  # ke, ka, kcp, kpc, v
SOLVERS = ["dopri5", "kvaerno3", "kvaerno5", "bdf", "tsit5"]


def diffeq(x, p, t, b, rateiv, cov):
    ke, ka, kcp, kpc = p[0], p[1], p[2], p[3]
    return jnp.stack(
        [
            -ka * x[0] + b[0],
            ka * x[0] - (ke + kcp) * x[1] + kpc * x[2] + rateiv[0],
            kcp * x[1] - kpc * x[2],
        ]
    )


def main():
    subject = Subject.builder("cmp").bolus(0.0, 100.0, 0).infusion(6.0, 50.0, 0, 2.0)
    for t in (0.5, 1.0, 2.0, 4.0, 8.0, 12.0, 24.0):
        subject = subject.missing_observation(t, 0)
    subject = subject.build()

    analytical = Analytical(
        pst.two_compartments_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[4],
        nstates=3,
        ndrugs=1,
        nout=1,
    )
    t0 = time.perf_counter()
    ref = np.asarray(analytical.estimate_predictions(subject, PARAMS).flat_predictions())
    t_analytical = time.perf_counter() - t0
    print(f"analytical (closed form): {t_analytical*1e3:7.1f} ms  (includes compile)")

    for name in SOLVERS:
        model = ODE(
            diffeq,
            out=lambda x, p, t, cov: x[1:2] / p[4],
            nstates=3,
            ndrugs=1,
            nout=1,
        ).with_solver(name).with_tolerances(1e-8, 1e-8)
        t0 = time.perf_counter()
        got = np.asarray(model.estimate_predictions(subject, PARAMS).flat_predictions())
        dt = time.perf_counter() - t0
        rel = np.max(np.abs(got - ref) / np.maximum(np.abs(ref), 1e-12))
        print(f"{name:10s}: {dt*1e3:7.1f} ms   max rel dev vs closed form: {rel:.2e}")
        assert rel < 1e-5, f"{name} disagrees with the closed form"

    print("all solvers agree with the analytical solution.")


if __name__ == "__main__":
    main()
