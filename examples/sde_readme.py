"""Stochastic one-compartment model with a particle filter (sde_readme.rs).

The elimination rate itself follows a latent stochastic process.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from pharmsol_tpu import AssayErrorModel, AssayErrorModels, ErrorPoly, Route, Subject, sde_model


def main():
    sde = sde_model(
        name="ke_diffusion",
        parameters=["ke0", "v", "sigma_ke"],
        states=["central", "ke_latent"],
        outputs=["cp"],
        routes=[Route.bolus("iv").to_state("central")],
        init=lambda p, t, cov: {"ke_latent": p.ke0},
        drift=lambda s, p, t, cov: {
            "central": -s.ke_latent * s.central,
            "ke_latent": -(s.ke_latent - p.ke0),  # mean-reverting
        },
        diffusion=lambda p, t, cov: {"ke_latent": p.sigma_ke},
        out=lambda s, p, t, cov: {"cp": s.central / p.v},
        nparticles=1000,
        seed=42,
    )

    subject = (
        Subject.builder("id1")
        .bolus(0.0, 100.0, "iv")
        .observation(1.0, 8.0, "cp")
        .observation(2.0, 6.2, "cp")
        .observation(4.0, 4.1, "cp")
        .observation(8.0, 1.8, "cp")
        .build()
    )

    ems = AssayErrorModels().add("cp", AssayErrorModel.additive(ErrorPoly(0.3, 0.1), 0.5))
    preds = sde.estimate_predictions(subject, [0.2, 10.0, 0.05])
    print("mean particle predictions:", [round(p.prediction, 4) for p in preds.predictions()])
    ll = sde.estimate_log_likelihood(subject, [0.2, 10.0, 0.05], ems)
    print(f"particle-filter log-likelihood: {ll:.4f}")


if __name__ == "__main__":
    main()
