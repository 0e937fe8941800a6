"""Focused on-device smoke for the round-2 additions (small programs only).

The full scripts/tpu_smoke.py includes the SDE particle filter, whose
remote compile through the tunnel can take an hour; this variant checks
just the round-2 lowering surfaces: the pallas covariate-multiplier path,
the genuine BDF/TR-BDF2/Tsit5 steppers, and the device batch NCA.

    python scripts/tpu_smoke_focus.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import pharmsol_tpu as pst
from pharmsol_tpu import (
    Analytical, AssayErrorModel, AssayErrorModels, Data, ErrorPoly, ODE, Subject,
)
from pharmsol_tpu.likelihood.matrix import log_likelihood_matrix


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.RandomState(0)
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    checks = []

    # 1. pallas covariate multipliers (compiled Mosaic, f32)
    subs = []
    for i in range(16):
        b = Subject.builder(f"c{i}").bolus(0.0, 100.0, 0)
        b = b.covariate("wt", 0.0, 55.0 + 2.0 * i)
        for t in (0.5, 2.0, 8.0):
            b = b.observation(float(t), float(abs(4 + rng.randn())), 0)
        subs.append(b.build())

    def seq(p, t, cov):
        sc = (cov("wt", t) / 70.0) ** 0.75
        return jnp.stack([p[0] * sc, p[1], p[2] * sc, p[3] * sc, p[4]])

    support = np.abs(np.array([0.15, 1.2, 0.3, 0.2, 10.0])[None, :]
                     * (1.0 + 0.2 * rng.randn(40, 5)))
    ana = Analytical(pst.two_compartments_with_absorption, seq_eq=seq,
                     out=lambda x, p, t, cov: x[1:2] / p[4],
                     nstates=3, ndrugs=1, nout=1)
    want = log_likelihood_matrix(ana, Data(subs), support, ems)
    print("  ...xla covariate psi done", flush=True)
    got = log_likelihood_matrix(ana, Data(subs), support, ems, engine="pallas")
    rel = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1.0))
    checks.append(("pallas/covariate-mult", rel < 1e-3))
    print(f"  ...pallas covariate psi done (rel {rel:.2e})", flush=True)

    # 2. genuine stiff/explicit steppers compile and agree
    s = Subject.builder("a").bolus(0.0, 100.0, 0)
    for t in (0.5, 2.0, 8.0):
        s = s.missing_observation(t, 0)
    s = s.build()

    def eq(x, p, t, b, rateiv, cov):
        ke, ka, kcp, kpc = p[0], p[1], p[2], p[3]
        return jnp.stack([-ka * x[0] + b[0],
                          ka * x[0] - (ke + kcp) * x[1] + kpc * x[2] + rateiv[0],
                          kcp * x[1] - kpc * x[2]])

    ref = None
    for name in ("dopri5", "tsit5", "bdf", "trbdf2"):
        m = ODE(eq, out=lambda x, p, t, cov: x[1:2] / p[4],
                nstates=3, ndrugs=1, nout=1).with_solver(name)
        got_s = np.asarray(
            m.estimate_predictions(s, [0.15, 1.2, 0.3, 0.2, 10.0]).flat_predictions()
        )
        if ref is None:
            ref = got_s
        rel = np.max(np.abs(got_s - ref) / np.maximum(np.abs(ref), 1e-12))
        checks.append((f"ode/{name}", rel < 1e-3))
        print(f"  ...{name} compiled (rel {rel:.2e})", flush=True)

    # 3. device batch NCA
    from pharmsol_tpu.nca.batch import batch_nca
    from pharmsol_tpu.nca.batch_device import batch_nca_device

    t = np.array([0.5, 1, 2, 4, 8, 12, 24], dtype=float)
    prof = np.abs(10 * np.exp(-0.2 * t)[None, :] * (1 + 0.05 * rng.randn(64, 7))) + 1e-12
    res_h = batch_nca(t, prof, dose=100.0)
    res_d = batch_nca_device(t, prof, dose=100.0)
    diff = abs(np.nanmedian(res_d["half_life"]) - np.nanmedian(res_h["half_life"]))
    checks.append(("nca/batch-device", np.isfinite(np.nanmedian(res_d["half_life"]))
                   and diff < 0.05))
    print(f"  ...device NCA done (median half-life diff {diff:.2e})", flush=True)

    failed = [name for name, ok in checks if not ok]
    for name, ok in checks:
        print(f"  {'OK  ' if ok else 'FAIL'} {name}")
    if failed:
        raise SystemExit(f"TPU smoke failures: {failed}")
    print(f"all {len(checks)} focused on-device checks passed.")


if __name__ == "__main__":
    main()
