"""A miniature non-parametric estimation loop on top of the psi machinery.

The reference is the simulation engine underneath PMcore's NPAG; this
example shows the full stack an estimation driver needs — psi matrices,
support-point condensation, and Nelder-Mead refinement — recovering a
bimodal elimination-rate population.

For production use, the framework ships the full loop as
``pharmsol_tpu.optimize.fit_population`` (NPML weight solve, adaptive
grid, posterior surface); this file stays as the pedagogical version.

Run: python examples/npag_lite.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import pharmsol_tpu as pst
from pharmsol_tpu import (
    Analytical,
    AssayErrorModel,
    AssayErrorModels,
    Data,
    ErrorPoly,
    Subject,
)
from pharmsol_tpu.likelihood.matrix import log_likelihood_matrix
from pharmsol_tpu.optimize import ParameterOptimizer


def simulate_population(n=60, seed=1):
    rng = np.random.RandomState(seed)
    ke = np.where(rng.rand(n) < 0.5, 0.1, 0.4) * np.exp(0.05 * rng.randn(n))
    v = 20.0 * np.exp(0.1 * rng.randn(n))
    subjects = []
    for i in range(n):
        b = Subject.builder(f"pt{i:02d}").bolus(0.0, 100.0, 0)
        for t in (0.5, 1.0, 2.0, 4.0, 8.0, 12.0):
            c = 100.0 / v[i] * np.exp(-ke[i] * t)
            b = b.observation(t, float(abs(c * (1 + 0.08 * rng.randn()))), 0)
        subjects.append(b.build())
    return Data(subjects), ke


def multinomial_em_weights(psi_lin, iters=200):
    """Fixed-point EM for the mixing weights of a non-parametric mixture."""
    n_sub, n_sup = psi_lin.shape
    w = np.full(n_sup, 1.0 / n_sup)
    for _ in range(iters):
        mix = psi_lin @ w  # [n_sub]
        mix = np.maximum(mix, 1e-300)
        w = w * (psi_lin.T @ (1.0 / mix)) / n_sub
        w = np.maximum(w, 0.0)
        w /= w.sum()
    return w


def main():
    data, ke_true = simulate_population()
    model = Analytical(
        pst.one_compartment,
        out=lambda x, p, t, cov: x[:1] / p[1],
        nstates=1,
        ndrugs=1,
        nout=1,
    )
    ems = AssayErrorModels().add(0, AssayErrorModel.proportional(ErrorPoly(0.05, 0.1), 1.0))

    rng = np.random.RandomState(0)
    support = np.column_stack(
        [
            np.exp(rng.uniform(np.log(0.03), np.log(0.8), 128)),
            np.exp(rng.uniform(np.log(8.0), np.log(50.0), 128)),
        ]
    )

    for cycle in range(4):
        psi = log_likelihood_matrix(model, data, support, ems)
        psi_lin = np.exp(psi - psi.max(axis=1, keepdims=True))
        w = multinomial_em_weights(psi_lin)
        keep = w > 1e-4
        support = support[keep]
        w = w[keep] / w[keep].sum()

        # refine the heaviest points with Nelder-Mead against current pyl
        mix = psi_lin[:, keep] @ w
        opt = ParameterOptimizer(model, data, ems, mix)
        order = np.argsort(-w)[:8]
        for idx in order:
            support[idx] = np.abs(opt.optimize_point(support[idx]))

        print(f"cycle {cycle}: {support.shape[0]:4d} support points")

    ke_modes = support[np.argsort(-w)[:6], 0]
    print("heaviest ke values:", np.round(np.sort(ke_modes), 3))
    lo = np.sum((ke_modes > 0.05) & (ke_modes < 0.2))
    hi = np.sum((ke_modes > 0.25) & (ke_modes < 0.6))
    print(f"mode coverage: {lo} slow / {hi} fast (truth: 0.1 and 0.4)")
    assert lo >= 1 and hi >= 1, "failed to recover both ke modes"
    print("NPAG-lite recovered the bimodal population.")


if __name__ == "__main__":
    main()
