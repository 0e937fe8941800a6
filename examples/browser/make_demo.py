"""Bake the browser-host demo data: `.pkm` artifacts + jitted expectations.

The reference's browser e2e (tests/browser-e2e/run.mjs) compiles a model to a
WASM bundle, loads it in a page, and asserts in-browser results. The rebuild's
equivalent: this script compiles three DSL models (one per artifact kind),
serializes their `.pkm` payloads, computes the JITTED ENGINE's predictions on
the same regimen (CPU/f64 — the tier-1 truth), and writes everything into
``demo_data.js`` for ``index.html`` to execute with ``pkm_eval.js`` and
self-check against.

Run: python examples/browser/make_demo.py   (rewrites demo_data.js in place)
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

ODE_SRC = """
name = browser_ode
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
out(cp) = central / v
"""

ANALYTICAL_SRC = """
name = browser_analytical
kind = analytical
params = ka, ke, v
states = depot, central
outputs = cp
bolus(oral) -> depot
structure = one_compartment_with_absorption
out(cp) = central / v ~ continuous()
"""

SDE_SRC = """
name = browser_sde
kind = sde
params = ke, vol, ske
states = central
particles = 256
outputs = cp
bolus(iv) -> central
dx(central) = -ke * central
noise(central) = ske
out(cp) = central / vol
"""


def build_cases():
    """The demo case list: (artifact payload, regimen, jitted expectations).

    Shared by main() (writes demo_data.js) and tests/test_browser_demo.py
    (asserts every baked expectation is achievable by a contract-conformant
    `.pkm` host, via dsl/pure.py — the contract's reference implementation).
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from pharmsol_tpu import Subject
    from pharmsol_tpu.dsl import compile_model
    from pharmsol_tpu.dsl.runtime import _am_to_json, ARTIFACT_FORMAT, ARTIFACT_VERSION

    here = os.path.dirname(os.path.abspath(__file__))
    obs_times = [1.0, 2.0, 4.0, 8.0, 12.0]
    cases = []

    def payload(runtime):
        return {
            "format": ARTIFACT_FORMAT,
            "version": ARTIFACT_VERSION,
            "model": _am_to_json(runtime.analyzed),
            "info": runtime.info(),
            "source": runtime.source,
        }

    # -- ode: RK4 host vs jitted adaptive engine, covariate-bearing ---------
    runtime = compile_model(ODE_SRC)
    params = [1.2, 4.0, 35.0]
    b = Subject.builder("demo").bolus(0.0, 100.0, "oral").covariate("wt", 0.0, 80.0)
    for t in obs_times:
        b = b.observation(t, 0.0, "cp")
    jitted = [float(x) for x in
              runtime.model.estimate_predictions(b.build(), params).flat_predictions()]
    cases.append({
        "title": "ODE (fixed-step RK4 host vs adaptive jitted engine)",
        "payload": payload(runtime),
        "params": params,
        "boluses": [[0.0, 100.0, 0]],
        "obs_times": obs_times,
        "cov": {"wt": {"knots": [[0.0, 80.0]], "fixed": False}},
        "opts": {"dt": 0.005},
        "expected": jitted,
        "rtol": 1e-4,
    })

    # -- analytical: exact closed form in both hosts ------------------------
    runtime = compile_model(ANALYTICAL_SRC)
    params = [1.0, 0.15, 25.0]
    b = Subject.builder("demo").bolus(0.0, 100.0, "oral")
    for t in obs_times:
        b = b.observation(t, 0.0, "cp")
    jitted = [float(x) for x in
              runtime.model.estimate_predictions(b.build(), params).flat_predictions()]
    cases.append({
        "title": "Analytical (exact expm segment propagation)",
        "payload": payload(runtime),
        "params": params,
        "boluses": [[0.0, 100.0, 0]],
        "obs_times": obs_times,
        "cov": {},
        "opts": {},
        "expected": jitted,
        "rtol": 1e-9,
    })

    # -- sde: zero-diffusion cloud reproduces the deterministic solution ----
    runtime = compile_model(SDE_SRC)
    params = [0.2, 10.0, 0.0]
    b = Subject.builder("demo").bolus(0.0, 100.0, "iv")
    for t in obs_times:
        b = b.observation(t, 0.0, "cp")
    jitted = [float(x) for x in
              runtime.model.estimate_predictions(b.build(), params).flat_predictions()]
    cases.append({
        "title": "SDE (zero-diffusion EM cloud = deterministic tier)",
        "payload": payload(runtime),
        "params": params,
        "boluses": [[0.0, 100.0, 0]],
        "obs_times": obs_times,
        "cov": {},
        "opts": {"dt": 0.002, "nparticles": 16},
        "expected": jitted,
        # the jitted SDE engine itself is adaptive Euler-Maruyama at the
        # reference's rtol 1e-2 (em.rs) — its own coarseness dominates the
        # host's fixed-step error
        "rtol": 0.02,
    })

    # -- sde with real diffusion: particle mean within a statistical band ---
    params = [0.2, 10.0, 0.4]
    jitted_det = cases[-1]["expected"]  # drift-only trajectory, same ke/vol
    cases.append({
        "title": "SDE (diffusive cloud: mean within band of drift solution)",
        "payload": payload(runtime),
        "params": params,
        "boluses": [[0.0, 100.0, 0]],
        "obs_times": obs_times,
        "cov": {},
        "opts": {"dt": 0.002, "nparticles": 512, "seed": 7},
        "expected": jitted_det,
        # linear SDE: particle mean equals the drift solution in expectation;
        # band covers Monte-Carlo error at 512 particles
        "rtol": 0.05,
    })
    return cases


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    cases = build_cases()
    out = os.path.join(here, "demo_data.js")
    with open(out, "w") as f:
        f.write("// generated by make_demo.py — do not edit\n")
        f.write("window.PHARMSOL_DEMO = ")
        json.dump({"cases": cases}, f, indent=1)
        f.write(";\n")
    print(f"wrote {out} ({os.path.getsize(out)} bytes, {len(cases)} cases)")


if __name__ == "__main__":
    main()
