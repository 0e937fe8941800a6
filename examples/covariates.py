"""Time-varying covariates scaling parameters in an ODE model.

Python counterpart of examples/covariates.rs: a one-compartment oral model
whose elimination rate is scaled by creatinine and age covariates, with lag
time and repeated dosing.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import jax

jax.config.update("jax_platforms", "cpu")

from pharmsol_tpu import Parameters, Route, Subject, ode_model


def main():
    ode = ode_model(
        name="one_cmt_covariates",
        parameters=["ka", "ke", "tlag", "v"],
        covariates=["creatinine", "age"],
        states=["gut", "central"],
        outputs=["cp"],
        routes=[Route.bolus("oral").to_state("gut")],
        dynamics=lambda s, p, t, cov: {
            "gut": -p.ka * s.gut,
            "central": p.ka * s.gut
            - p.ke * (cov.creatinine / 75.0) ** 0.75 * (cov.age / 25.0) ** 0.5 * s.central,
        },
        lag=lambda p, t, cov: {"oral": p.tlag},
        out=lambda s, p, t, cov: {"cp": s.central / p.v},
    )

    subject = (
        Subject.builder("id1")
        .bolus(0.0, 100.0, "oral")
        .repeat(2, 2.0)
        .observation(0.5, 0.1, "cp")
        .observation(1.0, 0.4, "cp")
        .observation(2.0, 1.0, "cp")
        .observation(2.5, 1.1, "cp")
        .covariate("creatinine", 0.0, 80.0)
        .covariate("creatinine", 1.0, 40.0)
        .covariate("age", 0.0, 25.0)
        .missing_observation(8.0, "cp")
        .build()
    )

    params = Parameters.with_model(
        ode, [("ka", 0.8), ("ke", 0.25), ("tlag", 0.2), ("v", 50.0)]
    )
    preds = ode.estimate_predictions(subject, params)
    for p in preds.predictions():
        obs = "   (sim)" if p.observation is None else f"{p.observation:8.3f}"
        print(f"t={p.time:5.2f}  obs={obs}  pred={p.prediction:9.5f}")


if __name__ == "__main__":
    main()
