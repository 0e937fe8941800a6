"""Same-session A/B of the ODE psi hot path on the real chip.

Measures device time for the dopri5 psi matrix at several unroll factors
(the CLAUDE.md protocol: iteration scaling inside one process so chip-speed
drift cancels). Usage: python scripts/tpu_ode_ab.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import pharmsol_tpu as pst
from pharmsol_tpu import ODE, AssayErrorModel, AssayErrorModels, Data, ErrorPoly, Subject
from pharmsol_tpu.likelihood.matrix import log_likelihood_matrix


def main():
    print("platform:", jax.devices()[0].platform)
    rng = np.random.RandomState(0)
    subjects = []
    for i in range(32):
        b = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
        for t in (0.5, 1.0, 2.0, 4.0, 8.0, 12.0):
            b = b.observation(float(t), float(abs(5 + rng.randn())), 0)
        subjects.append(b.build())
    support = np.abs(
        np.array([0.15, 1.2, 0.3, 0.2, 10.0])[None, :]
        * (1.0 + 0.2 * rng.randn(64, 5))
    )
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))

    def eq(x, p, t, b, rateiv, cov):
        ke, ka, kcp, kpc = p[0], p[1], p[2], p[3]
        return jnp.stack([
            -ka * x[0] + b[0],
            ka * x[0] - (ke + kcp) * x[1] + kpc * x[2] + rateiv[0],
            kcp * x[1] - kpc * x[2],
        ])

    results = {}
    psis = {}
    for unroll in (1, 2, 4, 8):
        model = ODE(eq, out=lambda x, p, t, cov: x[1:2] / p[4],
                    nstates=3, ndrugs=1, nout=1)
        model._opts = model._opts._replace(unroll=unroll)
        t0 = time.perf_counter()
        psi = log_likelihood_matrix(model, Data(subjects), support, ems)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            psi = log_likelihood_matrix(model, Data(subjects), support, ems)
            times.append(time.perf_counter() - t0)
        hot = float(np.median(times))
        results[unroll] = hot
        psis[unroll] = psi
        cells = len(subjects) * support.shape[0]
        print(f"unroll={unroll}: hot {hot*1e3:8.1f} ms "
              f"({cells/hot:10,.0f} cells/s)  compile {compile_s:.1f}s")

    base = results[1]
    for u, t in results.items():
        d = float(np.max(np.abs(psis[u] - psis[1])))
        print(f"  unroll {u}: {base/t:.2f}x vs unroll=1, |psi diff| {d:.2e}")


if __name__ == "__main__":
    main()
