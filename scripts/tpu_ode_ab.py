"""Same-session A/B of the ODE psi hot path on the real chip.

Device time via the iteration-scaling protocol (CLAUDE.md): run the psi
program K times inside one jit with the support perturbed per iteration,
fetch one scalar, take the marginal time. Tunnel dispatch/fetch latency
(which dominates single-shot timings through axon: a ~40 ms floor even for
an 8 KB fetch) cancels out of the K_hi - K_lo difference.

A/Bs the cross-segment step-size warm start (ModelSpec.propagate_carry)
against the cold per-segment restart, per solver, in one process so chip
drift cancels. Usage: python scripts/tpu_ode_ab.py [--solvers dopri5,bdf]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from pharmsol_tpu import ODE, AssayErrorModel, AssayErrorModels, ErrorPoly, Subject
from pharmsol_tpu.config import float_dtype
from pharmsol_tpu.likelihood.matrix import _psi_fn


def build_population(n_subjects, n_supports):
    rng = np.random.RandomState(0)
    obs_times = [0.5, 1.0, 2.0, 3.0, 4.0, 6.0, 8.0, 10.0, 12.0]
    b = Subject.builder("s0").bolus(0.0, 100.0, 0)
    for t in obs_times:
        b = b.observation(t, 1.0, 0)
    proto = b.build()
    support = np.abs(
        np.array([0.15, 1.2, 0.3, 0.2, 10.0])[None, :]
        * (1.0 + 0.2 * rng.randn(n_supports, 5))
    )
    return proto, obs_times, support, rng


def eq(x, p, t, b, rateiv, cov):
    ke, ka, kcp, kpc = p[0], p[1], p[2], p[3]
    return jnp.stack([
        -ka * x[0] + b[0],
        ka * x[0] - (ke + kcp) * x[1] + kpc * x[2] + rateiv[0],
        kcp * x[1] - kpc * x[2],
    ])


def measure(model, proto, obs_times, support, rng, n_subjects, reps=5,
            k_lo=2, k_hi=8):
    fd = float_dtype()
    grid1 = model.lower([proto])
    rows = jax.tree_util.tree_map(
        lambda x: np.repeat(np.asarray(x), n_subjects, axis=0), grid1.rows
    )
    obs_vals = np.asarray(rows.obs_value)
    obs_vals[:, : len(obs_times)] = np.abs(
        5.0 + rng.randn(n_subjects, len(obs_times))
    )
    rows = rows._replace(obs_value=obs_vals)
    ems = AssayErrorModels().add(0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    lowered = ems.lower(model.resolve_output_label, model.nouteqs())

    psi_fn = _psi_fn(model, grid1.cov_names, n_subjects)
    rows_d = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, dtype=fd)
        if np.issubdtype(np.asarray(x).dtype, np.floating) else jnp.asarray(x),
        rows,
    )
    em_args = (
        jnp.asarray(lowered.kind),
        jnp.asarray(lowered.factor, dtype=fd),
        jnp.asarray(lowered.poly, dtype=fd),
    )
    sp0 = jnp.asarray(support, dtype=fd)
    rs = jnp.asarray(np.arange(n_subjects, dtype=np.int32))

    psi = np.asarray(jax.jit(psi_fn)(rows_d, rs, sp0, *em_args), np.float64)
    assert np.all(np.isfinite(psi)), "non-finite psi"

    def make_iter_fn(K):
        @jax.jit
        def run(sp):
            def body(c, i):
                p = psi_fn(rows_d, rs, sp * (1.0 + 1e-6 * i), *em_args)
                return c + jnp.sum(p), None
            total, _ = jax.lax.scan(body, jnp.asarray(0.0, fd),
                                    jnp.arange(K, dtype=fd))
            return total
        return run

    fn_lo, fn_hi = make_iter_fn(k_lo), make_iter_fn(k_hi)
    float(fn_lo(sp0)); float(fn_hi(sp0))

    def best_of(fn):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(sp0))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo, t_hi = best_of(fn_lo), best_of(fn_hi)
    per_iter = (t_hi - t_lo) / (k_hi - k_lo)
    if per_iter < 0.05 * t_hi / k_hi:
        per_iter = t_hi / k_hi
    return per_iter, psi


def main():
    parser = argparse.ArgumentParser()
    # bdf/implicit solvers are excluded by default: their psi programs take
    # ~8-12 min per remote TPU compile (4 compiles per A/B); opt in with
    # --solvers bdf --subjects 64 --supports 16.
    parser.add_argument("--solvers", default="dopri5")
    parser.add_argument("--subjects", type=int, default=512)
    parser.add_argument("--supports", type=int, default=64)
    # K must be large enough that (k_hi - k_lo) psi evaluations dominate the
    # ~40 ms tunnel latency floor, or the marginal time is pure noise
    parser.add_argument("--klo", type=int, default=8)
    parser.add_argument("--khi", type=int, default=64)
    args = parser.parse_args()

    platform = jax.devices()[0].platform
    print(f"platform: {platform}")
    if platform != "cpu":
        from pharmsol_tpu.config import set_float_dtype
        set_float_dtype(np.float32)

    n_subjects, n_supports = args.subjects, args.supports
    proto, obs_times, support, rng = build_population(n_subjects, n_supports)
    cells = n_subjects * n_supports

    for solver in args.solvers.split(","):
        variants = {}
        for label, strip_carry in (("warm", False), ("cold", True)):
            model = ODE(eq, out=lambda x, p, t, cov: x[1:2] / p[4],
                        nstates=3, ndrugs=1, nout=1).with_solver(solver)
            if strip_carry:
                model._spec_cache = model.spec._replace(propagate_carry=None)
            rng_m = np.random.RandomState(0)
            per_iter, psi = measure(model, proto, obs_times, support, rng_m,
                                    n_subjects, k_lo=args.klo, k_hi=args.khi)
            variants[label] = (per_iter, psi)
            print(f"  {solver}/{label}: {per_iter*1e3:8.1f} ms/psi "
                  f"({cells/per_iter:12,.0f} sims/s)")
        (tw, pw), (tc, pc) = variants["warm"], variants["cold"]
        d = float(np.max(np.abs(pw - pc)))
        print(f"  {solver}: warm is {tc/tw:.2f}x vs cold, |psi diff| {d:.2e}")


if __name__ == "__main__":
    main()
