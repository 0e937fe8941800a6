"""Compare analytical and ODE solutions for a one-compartment IV model.

Python counterpart of the reference's examples/one_compartment.rs: the same
model declared through the analytical structure and as an ODE, predictions
and log-likelihoods printed side by side.

Run: python examples/one_compartment.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import jax

jax.config.update("jax_platforms", "cpu")

from pharmsol_tpu import (
    AssayErrorModel,
    AssayErrorModels,
    ErrorPoly,
    Parameters,
    Route,
    Subject,
    analytical_model,
    ode_model,
)


def main():
    analytical = analytical_model(
        name="one_cmt_iv",
        structure="one_compartment",
        parameters=["ke", "v"],
        states=["central"],
        outputs=["cp"],
        routes=[Route.infusion("iv").to_state("central")],
        out=lambda s, p, t, cov: {"cp": s.central / p.v},
    )

    ode = ode_model(
        name="one_cmt_iv",
        parameters=["ke", "v"],
        states=["central"],
        outputs=["cp"],
        routes=[Route.infusion("iv").to_state("central")],
        dynamics=lambda s, p, t, cov: {"central": -p.ke * s.central},
        out=lambda s, p, t, cov: {"cp": s.central / p.v},
    ).with_tolerances(1e-8, 1e-8)

    subject = (
        Subject.builder("id1")
        .infusion(0.0, 500.0, "iv", 0.5)
        .observation(0.5, 1.645776, "cp")
        .observation(1.0, 1.216442, "cp")
        .observation(2.0, 0.462936, "cp")
        .observation(4.0, 0.150025, "cp")
        .build()
    )

    params = Parameters.with_model(analytical, [("ke", 1.02282724609375), ("v", 194.51904296875)])
    ems = AssayErrorModels().add("cp", AssayErrorModel.additive(ErrorPoly(0.0, 0.05), 0.0))

    pred_a = analytical.estimate_predictions(subject, params)
    pred_o = ode.estimate_predictions(subject, params)
    ll_a = analytical.estimate_log_likelihood(subject, params, ems)
    ll_o = ode.estimate_log_likelihood(subject, params, ems)

    print(f"{'time':>6} {'obs':>10} {'analytical':>12} {'ode':>12}")
    for a, o in zip(pred_a.predictions(), pred_o.predictions()):
        print(f"{a.time:6.1f} {a.observation:10.4f} {a.prediction:12.6f} {o.prediction:12.6f}")
    print(f"\nlog-likelihood  analytical: {ll_a:.6f}   ode: {ll_o:.6f}")


if __name__ == "__main__":
    main()
