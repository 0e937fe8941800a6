"""Gradient-based individual MAP fitting with Laplace standard errors.

The Rust reference cannot autodiff its simulations, so its optimizer is
derivative-free Nelder-Mead (optimize/parameters.rs). This rebuild's
engines are differentiable end-to-end (Equation.log_likelihood_fn), so
individual fitting becomes: L-BFGS on exact gradients + an inverse-
Hessian covariance — here recovering 1-cmt oral parameters from noisy
synthetic observations, first by maximum likelihood, then MAP under a
log-normal prior.

Run: python examples/map_fit.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
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
from pharmsol_tpu.optimize import fit_map

TRUE = {"ka": 1.2, "ke": 0.25, "v": 12.0}


def main() -> int:
    rng = np.random.default_rng(7)
    subjects = []
    for i in range(8):
        sb = Subject.builder(f"pt{i}").bolus(0.0, 100.0, 0)
        for t in (0.5, 1.0, 2.0, 4.0, 8.0, 12.0):
            ka, ke, v = TRUE["ka"], TRUE["ke"], TRUE["v"]
            c = 100.0 * ka / (ka - ke) * (np.exp(-ke * t) - np.exp(-ka * t)) / v
            sb = sb.observation(
                float(t), float(c * (1 + 0.05 * rng.standard_normal())), 0
            )
        subjects.append(sb.build())
    data = Data(subjects)
    ems = AssayErrorModels().add(
        0, AssayErrorModel.proportional(ErrorPoly(0.0, 0.05), 1.0)
    )
    model = Analytical(
        pst.one_compartment_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2, ndrugs=1, nout=1,
    )

    print("true:", TRUE)
    ml = fit_map(model, data, ems, [0.6, 0.35, 5.0])
    print("\nmaximum likelihood (L-BFGS on exact gradients):")
    print(ml.summary())

    mean = jnp.asarray([1.0, 0.3, 10.0])

    def prior(p):  # log-normal, sd 0.3 on the log scale
        return -0.5 * jnp.sum(((jnp.log(p) - jnp.log(mean)) / 0.3) ** 2)

    mp = fit_map(model, data, ems, [0.6, 0.35, 5.0], prior_logpdf=prior)
    print("\nMAP under a log-normal prior:")
    print(mp.summary())
    assert ml.converged and mp.converged


if __name__ == "__main__":
    main()
