"""Same-session fused-tier stiff A/B: bdf vs kvaerno3 (vs trbdf2) on TMDD.

VERDICT r3 item 6: the in-kernel variable-order BDF (the reference's
default solver semantics, ode/mod.rs:59-64) is the weakest cell of the
fused solver matrix; the SDIRK tier covers the same stiff workloads.
This records the honest same-session ratio at equal tolerance
(rtol=atol=1e-4, the reference default) on the stiff TMDD corpus, plus
cross-solver psi agreement, so docs/API.md can steer users with a
measured number instead of an opinion.

    python scripts/tpu_stiff_ab.py [--subjects 512] [--supports 128]

Chip drift is +-25-30% between sessions (CLAUDE.md) — only the
same-session ratios are meaningful.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--subjects", type=int, default=512)
    ap.add_argument("--supports", type=int, default=128)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--k-lo", type=int, default=2)
    ap.add_argument("--k-hi", type=int, default=8)
    ap.add_argument("--solvers", default="bdf,kvaerno3,trbdf2")
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    from pharmsol_tpu.config import float_dtype, set_float_dtype

    if platform == "tpu":
        set_float_dtype(np.float32)

    from pharmsol_tpu import (
        AssayErrorModel, AssayErrorModels, ErrorPoly, ODE, Subject,
    )
    from pharmsol_tpu.likelihood.matrix import _PallasOdePsiPlan
    from pharmsol_tpu.ops.pallas_psi import SUB_TILE

    def tmdd(solver):
        """benches/stiff_bench.py TMDD model (stiff fast-binding)."""

        def diffeq(x, p, t, b, rateiv, cov):
            kel, kon, koff, ksyn, kdeg, kint = (
                p[0], p[1], p[2], p[3], p[4], p[5])
            L, R, P = x[0], x[1], x[2]
            bind = kon * L * R - koff * P
            return jnp.stack([
                -kel * L - bind + b[0] + rateiv[0],
                ksyn - kdeg * R - bind,
                bind - kint * P,
            ])

        def init(p, t, cov):
            return jnp.stack([0.0 * p[0], p[3] / p[4], 0.0 * p[0]])

        return ODE(diffeq, out=lambda x, p, t, cov: x[:1] / p[6],
                   init=init, nstates=3, ndrugs=1, nout=1
                   ).with_solver(solver)

    n_subjects, n_supports = args.subjects, args.supports
    obs_times = (0.1, 0.5, 1.0, 2.0, 5.0, 10.0, 24.0, 48.0)
    b = Subject.builder("s0").bolus(0.0, 100.0, 0)
    for t in obs_times:
        b = b.observation(t, 1.0, 0)
    proto = b.build()

    model0 = tmdd("bdf")
    grid1 = model0.lower([proto])
    rng = np.random.default_rng(0)
    rows = jax.tree_util.tree_map(
        lambda x: np.repeat(np.asarray(x), n_subjects, axis=0), grid1.rows
    )
    obs_vals = np.asarray(rows.obs_value)
    obs_vals[:, : len(obs_times)] = np.abs(
        5.0 + rng.standard_normal((n_subjects, len(obs_times)))
    )
    rows = rows._replace(obs_value=obs_vals)
    row_subject = np.arange(n_subjects, dtype=np.int32)

    base = np.array([0.1, 100.0, 0.1, 1.0, 0.1, 0.5, 5.0])
    support = base[None, :] * rng.uniform(
        0.7, 1.3, size=(n_supports, 7))
    ems = AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0)
    )
    lowered = ems.lower(model0.resolve_output_label, model0.nouteqs())
    fd = float_dtype()
    sims = n_subjects * n_supports

    class _G:
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

    out = {"platform": platform, "subjects": n_subjects,
           "supports": n_supports, "tolerance": "rtol=atol=1e-4"}
    psis = {}
    for solver in args.solvers.split(","):
        solver = solver.strip()
        model = tmdd(solver)
        t0 = time.perf_counter()
        plan = _PallasOdePsiPlan(model, grid, support, lowered,
                                 row_multiple=SUB_TILE)
        run = plan.runner()
        streams = plan.stream_args()
        rep = plan.rep_args()
        psi = plan.finalize(np.asarray(run(*streams, *rep), np.float64),
                            grid)
        compile_s = time.perf_counter() - t0
        psis[solver] = psi
        n_inf = int(np.sum(~np.isfinite(psi)))

        def make_iter(K, _run=run, _streams=streams, _rep=rep):
            @jax.jit
            def f(sp):
                def body(c, i):
                    r = (sp * (1.0 + 1e-6 * i),) + _rep[1:]
                    return c + jnp.sum(_run(*_streams, *r)), None
                total, _ = jax.lax.scan(
                    body, jnp.asarray(0.0, fd), jnp.arange(K, dtype=fd)
                )
                return total
            return f

        f_lo, f_hi = make_iter(args.k_lo), make_iter(args.k_hi)
        float(f_lo(rep[0])); float(f_hi(rep[0]))
        t_lo, t_hi = best_of(f_lo, rep[0]), best_of(f_hi, rep[0])
        per = (t_hi - t_lo) / (args.k_hi - args.k_lo)
        if per < 0.05 * t_hi / args.k_hi:
            per = t_hi / args.k_hi
        out[solver] = {
            "sims_per_sec": round(sims / per, 1),
            "s_per_psi": round(per, 5),
            "compile_s": round(compile_s, 1),
            "n_noninf_cells": int(np.isfinite(psi).sum()),
            "n_inf_cells": n_inf,
        }
        print(f"{solver:>9}: {sims / per:12,.0f} sims/s  "
              f"compile {compile_s:6.1f}s  ({n_inf} -inf cells)",
              file=sys.stderr)

    ref_name = next(iter(psis))
    ref = psis[ref_name]
    agreement = {}
    for solver, psi in psis.items():
        both = np.isfinite(psi) & np.isfinite(ref)
        agreement[solver] = (
            float(np.max(np.abs(psi[both] - ref[both])))
            if both.any() else float("nan")
        )
    out["max_abs_diff_vs_" + ref_name] = agreement
    if "bdf" in out and "kvaerno3" in out:
        out["kvaerno3_vs_bdf"] = round(
            out["kvaerno3"]["sims_per_sec"] / out["bdf"]["sims_per_sec"], 2
        )
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
