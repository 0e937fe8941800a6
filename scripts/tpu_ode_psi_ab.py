"""Same-session device A/B: XLA dopri5 psi vs the fused pallas ODE psi.

Workload: the reference "Short" schedule (one oral bolus, 9 observations)
on a 2-cmt oral model written as a *numerically integrated ODE* — the path
every model outside the 12 closed forms must take. Measures both engines
with the iteration-scaling protocol (K program copies in one jit, fetch a
scalar, marginal time) so tunnel round-trips drop out; chip throughput
drifts +-25-30% between hours, so only same-session ratios are meaningful.

Usage: python scripts/tpu_ode_psi_ab.py [--subjects N] [--supports S]
       [--reps R] [--skip-xla]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--subjects", type=int, default=512)
    ap.add_argument("--supports", type=int, default=128)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--k-lo", type=int, default=2)
    ap.add_argument("--k-hi", type=int, default=16)
    ap.add_argument("--solver", default="dopri5")
    ap.add_argument("--skip-xla", action="store_true")
    ap.add_argument("--controllers", default=None,
                    help="comma-separated step-controller variants to A/B "
                         "same-session (e.g. 'i,pi'); default: env/i only")
    ap.add_argument("--tiles", default=None,
                    help="comma-separated row_block[xsp_block] tile variants "
                         "to sweep same-session (e.g. '16,32,64x128,16x256')")
    ap.add_argument("--merge-ab", action="store_true",
                    help="A/B the merged dense-output march vs the classic "
                         "stop-at-every-breakpoint march same-session")
    ap.add_argument("--capture-ab", action="store_true",
                    help="A/B the cond-guarded (lazy) interior-obs capture "
                         "vs the per-trial eager capture same-session")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    from pharmsol_tpu.config import enable_compilation_cache, set_float_dtype

    if platform == "tpu":
        set_float_dtype(np.float32)
        enable_compilation_cache()

    from pharmsol_tpu import (
        AssayErrorModel, AssayErrorModels, ErrorPoly, ODE, Subject,
    )
    from pharmsol_tpu.config import float_dtype
    from pharmsol_tpu.likelihood.matrix import _PallasOdePsiPlan, _psi_fn
    from pharmsol_tpu.ops.pallas_psi import SUB_TILE

    n_subjects, n_supports = args.subjects, args.supports
    obs_times = [0.5, 1.0, 2.0, 3.0, 4.0, 6.0, 8.0, 10.0, 12.0]

    model = ODE(
        lambda x, p, t, b, rateiv, cov: jnp.stack([
            -p[1] * x[0] + b[0],
            p[1] * x[0] - (p[0] + p[2]) * x[1] + p[3] * x[2] + rateiv[0],
            p[2] * x[1] - p[3] * x[2],
        ]),
        out=lambda x, p, t, cov: x[1:2] / p[4],
        nstates=3, ndrugs=1, nout=1,
    ).with_solver(args.solver)

    b = Subject.builder("s0").bolus(0.0, 100.0, 0)
    for t in obs_times:
        b = b.observation(t, 1.0, 0)
    proto = b.build()

    grid1 = model.lower([proto])
    rng = np.random.RandomState(0)
    rows = jax.tree_util.tree_map(
        lambda x: np.repeat(np.asarray(x), n_subjects, axis=0), grid1.rows
    )
    obs_vals = np.asarray(rows.obs_value)
    obs_vals[:, : len(obs_times)] = np.abs(
        5.0 + rng.randn(n_subjects, len(obs_times))
    )
    rows = rows._replace(obs_value=obs_vals)
    row_subject = np.arange(n_subjects, dtype=np.int32)

    center = np.array([0.15, 1.2, 0.3, 0.2, 10.0])
    support = np.abs(center[None, :] * (1.0 + 0.2 * rng.randn(n_supports, 5)))
    ems = AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0)
    )
    lowered = ems.lower(model.resolve_output_label, model.nouteqs())
    fd = float_dtype()
    sims = n_subjects * n_supports

    class _G:  # minimal PopulationGrid stand-in for the plan
        pass

    grid = _G()
    grid.rows = rows
    grid.row_subject = row_subject
    grid.cov_names = ()
    grid.n_rows = n_subjects
    grid.n_subjects = n_subjects

    def best_of(fn, x):
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(fn(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def marginal(make_fn, x):
        f_lo, f_hi = make_fn(args.k_lo), make_fn(args.k_hi)
        float(f_lo(x)); float(f_hi(x))
        t_lo, t_hi = best_of(f_lo, x), best_of(f_hi, x)
        per = (t_hi - t_lo) / (args.k_hi - args.k_lo)
        if per < 0.05 * t_hi / args.k_hi:
            per = t_hi / args.k_hi
        return per

    out = {"platform": platform, "subjects": n_subjects,
           "supports": n_supports, "solver": args.solver}

    # --- pallas ODE psi ---------------------------------------------------
    import os

    variants = [(None, {})]
    if args.controllers:
        variants = [
            (f"pallas_{c.strip()}", {"PHARMSOL_ODE_CONTROLLER": c.strip()})
            for c in args.controllers.split(",")
        ]
    if args.tiles:
        variants = []
        for t in (s.strip() for s in args.tiles.split(",")):
            rb, _, sb = t.partition("x")
            env = {"PHARMSOL_ODE_ROW_BLOCK": rb}
            if sb:
                env["PHARMSOL_ODE_SP_BLOCK"] = sb
            variants.append((f"pallas_t{t}", env))
    if args.merge_ab:
        variants = [("pallas_merged", {}),
                    ("pallas_nomerge", {"PHARMSOL_ODE_NO_MERGE": "1"})]
    if args.capture_ab:
        variants = [("pallas_eagercap", {}),
                    ("pallas_lazycap",
                     {"PHARMSOL_ODE_LAZY_CAPTURE": "1"})]
    psi_pallas = None
    per_pallas = None
    for key, env in variants:
        for k in ("PHARMSOL_ODE_CONTROLLER", "PHARMSOL_ODE_NO_MERGE",
                  "PHARMSOL_ODE_ROW_BLOCK",
                  "PHARMSOL_ODE_SP_BLOCK", "PHARMSOL_ODE_LAZY_CAPTURE"):
            os.environ.pop(k, None)
        for k, v in env.items():
            os.environ[k] = v
        plan = _PallasOdePsiPlan(model, grid, support, lowered,
                                 row_multiple=SUB_TILE)
        run = plan.runner()
        streams = plan.stream_args()
        rep = plan.rep_args()

        def make_pallas(K, run=run, streams=streams, rep=rep):
            @jax.jit
            def f(sp):
                def body(c, i):
                    r = (sp * (1.0 + 1e-6 * i),) + rep[1:]
                    return c + jnp.sum(run(*streams, *r)), None
                total, _ = jax.lax.scan(
                    body, jnp.asarray(0.0, fd), jnp.arange(K, dtype=fd)
                )
                return total
            return f

        if key is None:
            key = "pallas"
        sp0 = rep[0]
        t0 = time.perf_counter()
        psi_v = np.asarray(run(*streams, *rep), np.float64)
        out[f"{key}_first_s"] = round(time.perf_counter() - t0, 2)
        per_v = marginal(make_pallas, sp0)
        out[f"{key}_s_per_psi"] = round(per_v, 6)
        out[f"{key}_sims_per_sec"] = round(sims / per_v, 1)
        if psi_pallas is None:
            psi_pallas = psi_v
            per_pallas = per_v
        else:
            rel = np.max(np.abs(plan.finalize(psi_v, grid)
                                - plan.finalize(psi_pallas, grid))
                         / np.maximum(np.abs(plan.finalize(psi_pallas, grid)),
                                      1.0))
            out[f"{key}_vs_first_rel"] = float(rel)

    # --- XLA engine -------------------------------------------------------
    if not args.skip_xla:
        psi_fn = _psi_fn(model, (), n_subjects)
        rows_d = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dtype=fd)
            if np.issubdtype(np.asarray(x).dtype, np.floating)
            else jnp.asarray(x),
            rows,
        )
        em_args = (
            jnp.asarray(lowered.kind),
            jnp.asarray(lowered.factor, dtype=fd),
            jnp.asarray(lowered.poly, dtype=fd),
        )
        rs = jnp.asarray(row_subject)
        spx = jnp.asarray(support, dtype=fd)

        def make_xla(K):
            @jax.jit
            def f(sp):
                def body(c, i):
                    p = psi_fn(rows_d, rs, sp * (1.0 + 1e-6 * i), *em_args)
                    return c + jnp.sum(p), None
                total, _ = jax.lax.scan(
                    body, jnp.asarray(0.0, fd), jnp.arange(K, dtype=fd)
                )
                return total
            return f

        t0 = time.perf_counter()
        psi_x = np.asarray(jax.jit(psi_fn)(rows_d, rs, spx, *em_args),
                           np.float64)
        out["xla_first_s"] = round(time.perf_counter() - t0, 2)
        per_xla = marginal(make_xla, spx)
        out["xla_s_per_psi"] = round(per_xla, 6)
        out["xla_sims_per_sec"] = round(sims / per_xla, 1)
        out["speedup"] = round(per_xla / per_pallas, 2)
        pf = plan.finalize(psi_pallas, grid)
        rel = np.max(np.abs(pf - psi_x) / np.maximum(np.abs(psi_x), 1.0))
        out["max_rel_err"] = float(rel)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
