"""Compile and run a model from DSL source text (examples/dsl_runtime_jit.rs)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import jax

jax.config.update("jax_platforms", "cpu")

from pharmsol_tpu import Subject
from pharmsol_tpu.dsl import compile_model

SOURCE = """
name = one_cmt_oral
kind = ode

params = ka, cl, v
covariates = wt@linear
states = depot, central
derived = ke
outputs = cp

bolus(oral) -> depot

ke = cl * pow(wt / 70.0, 0.75) / v

dx(depot) = -ka * depot
dx(central) = ka * depot - ke * central

out(cp) = central / v ~ continuous()
"""


def main():
    runtime = compile_model(SOURCE)
    print("compiled:", runtime.info()["name"], runtime.info()["kind"])

    subject = (
        Subject.builder("id1")
        .bolus(0.0, 100.0, "oral")
        .observation(1.0, 1.8, "cp")
        .observation(4.0, 2.1, "cp")
        .observation(12.0, 0.9, "cp")
        .covariate("wt", 0.0, 80.0)
        .build()
    )
    preds = runtime.estimate_predictions(subject, [1.2, 5.0, 40.0])
    for p in preds.predictions():
        print(f"t={p.time:5.1f}  obs={p.observation:6.2f}  pred={p.prediction:8.4f}")

    runtime.save_artifact("/tmp/one_cmt_oral.pkm")
    print("artifact saved to /tmp/one_cmt_oral.pkm")


if __name__ == "__main__":
    main()
