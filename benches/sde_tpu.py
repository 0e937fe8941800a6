"""SDE particle-filter psi throughput on the attached device.

The reference rayon-parallels particles per subject (sde/mod.rs:491-517);
here particles are a vmap axis inside each (subject, support) cell and the
whole psi matrix is one jitted program. The metric is particle-filter
subject-simulations per second — one simulation = one (subject, support)
cell, each carrying `particles` EM trajectories + weighting/resampling at
every observation.

Iteration-scaling protocol (bench.py): K psi programs in one jit, fetch a
scalar, marginal time. Prints ONE JSON line.

    python benches/sde_tpu.py [--subjects N] [--supports S] [--particles P]
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
    ap.add_argument("--subjects", type=int, default=256)
    ap.add_argument("--supports", type=int, default=32)
    ap.add_argument("--particles", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--k-lo", type=int, default=2)
    ap.add_argument("--k-hi", type=int, default=8)
    ap.add_argument("--engine", default="pallas",
                    choices=["pallas", "xla", "ab"])
    ap.add_argument("--em-control", default="independent",
                    choices=["independent", "coupled"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    from pharmsol_tpu.config import float_dtype, set_float_dtype

    if platform == "tpu":
        set_float_dtype(np.float32)

    from pharmsol_tpu import (
        AssayErrorModel, AssayErrorModels, ErrorPoly, SDE, Subject,
    )

    sde = SDE(
        drift=lambda x, p, t, rateiv, cov: jnp.stack(
            [-x[0] * x[1], -x[1] + p[0]]
        ),
        diffusion=lambda p, t, cov: jnp.stack([1.0, 0.01]),
        init=lambda p, t, cov: jnp.stack([0.0, 1.0]),
        out=lambda x, p, t, cov: x[0:1],
        nparticles=args.particles,
        nstates=2, ndrugs=1, nout=1,
    ).with_em_control(args.em_control)
    obs = [(0.2, 16.6434), (0.4, 14.3233), (0.6, 9.8468), (0.8, 9.4177),
           (1.0, 7.5170)]
    b = Subject.builder("s0").bolus(0.0, 20.0, 0)
    for t, v in obs:
        b = b.observation(t, v, 0)
    proto = b.build()
    ems = AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.5, 0.0, 0.0, 0.0), 0.0)
    )

    grid1 = sde.lower([proto])
    rng = np.random.RandomState(0)
    rows = jax.tree_util.tree_map(
        lambda x: np.repeat(np.asarray(x), args.subjects, axis=0), grid1.rows
    )
    obs_vals = np.asarray(rows.obs_value)
    obs_vals[:, : len(obs)] = np.abs(
        10.0 + 2.0 * rng.randn(args.subjects, len(obs))
    )
    rows = rows._replace(obs_value=obs_vals)
    row_subject = np.arange(args.subjects, dtype=np.int32)
    support = np.abs(1.0 + 0.2 * rng.randn(args.supports, 1))

    lowered = ems.lower(sde.resolve_output_label, sde.nouteqs())
    fd = float_dtype()
    from pharmsol_tpu.likelihood.matrix import _PallasSdePsiPlan, _psi_fn

    def measure_pallas():
        class _G:
            pass

        g = _G()
        g.rows = rows
        g.row_subject = row_subject
        g.cov_names = ()
        g.n_rows = args.subjects
        g.n_subjects = args.subjects
        plan = _PallasSdePsiPlan(sde, g, support, lowered, row_multiple=1)
        run = plan.runner()
        streams = plan.stream_args()
        rep = plan.rep_args()
        t0 = time.perf_counter()
        psi = plan.finalize(
            np.asarray(run(*streams, *rep), np.float64), g
        )
        first_s = time.perf_counter() - t0
        finite = bool(np.all(np.isfinite(psi) | np.isneginf(psi)))

        def make_iter(K):
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

        sp0 = rep[0]
        f_lo, f_hi = make_iter(args.k_lo), make_iter(args.k_hi)
        float(f_lo(sp0)); float(f_hi(sp0))

        def best_of(fn):
            ts = []
            for _ in range(args.reps):
                t1 = time.perf_counter()
                float(fn(sp0))
                ts.append(time.perf_counter() - t1)
            return min(ts)

        t_lo, t_hi = best_of(f_lo), best_of(f_hi)
        per = (t_hi - t_lo) / (args.k_hi - args.k_lo)
        if per < 0.05 * t_hi / args.k_hi:
            per = t_hi / args.k_hi
        sims = args.subjects * args.supports
        return sims / per, {
            "platform": platform,
            "engine": "pallas",
            "em_control": args.em_control,
            "subjects": args.subjects,
            "supports": args.supports,
            "particles": args.particles,
            "particle_steps_per_sec": round(
                sims * args.particles / per, 1
            ),
            "s_per_psi": round(per, 5),
            "first_s": round(first_s, 2),
            "finite": finite,
        }

    if args.engine == "pallas":
        rate, detail = measure_pallas()
        print(json.dumps({
            "metric": "sde_pf_sims_per_sec",
            "value": round(rate, 1),
            "unit": "sims/s",
            "detail": detail,
        }))
        return 0

    def measure_xla():
        psi_fn = _psi_fn(sde, grid1.cov_names, args.subjects)
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
        sp0 = jnp.asarray(support, dtype=fd)

        t0 = time.perf_counter()
        psi = np.asarray(
            jax.jit(psi_fn)(rows_d, rs, sp0, *em_args), np.float64
        )
        first_s = time.perf_counter() - t0
        # -inf is legitimate degradation (zero-likelihood); NaN is not
        finite = bool(np.all(np.isfinite(psi) | np.isneginf(psi)))

        def make_iter(K):
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

        f_lo, f_hi = make_iter(args.k_lo), make_iter(args.k_hi)
        float(f_lo(sp0)); float(f_hi(sp0))

        def best_of(fn):
            ts = []
            for _ in range(args.reps):
                t1 = time.perf_counter()
                float(fn(sp0))
                ts.append(time.perf_counter() - t1)
            return min(ts)

        t_lo, t_hi = best_of(f_lo), best_of(f_hi)
        per = (t_hi - t_lo) / (args.k_hi - args.k_lo)
        if per < 0.05 * t_hi / args.k_hi:
            per = t_hi / args.k_hi
        sims = args.subjects * args.supports
        return sims / per, {
            "platform": platform,
            "engine": "xla",
            "em_control": args.em_control,
            "subjects": args.subjects,
            "supports": args.supports,
            "particles": args.particles,
            "particle_steps_per_sec": round(sims * args.particles / per, 1),
            "s_per_psi": round(per, 5),
            "first_s": round(first_s, 2),
            "finite": finite,
        }

    if args.engine == "xla":
        rate, detail = measure_xla()
        print(json.dumps({
            "metric": "sde_pf_sims_per_sec",
            "value": round(rate, 1),
            "unit": "sims/s",
            "detail": detail,
        }))
        return 0

    # --engine ab: the honest same-session ratio at a scale where BOTH
    # programs survive (VERDICT r3: the 256x32x256 XLA psi crashed the
    # tunneled worker, leaving the fused kernel's number uncompared)
    rate_p, det_p = measure_pallas()
    rate_x, det_x = measure_xla()
    print(json.dumps({
        "metric": "sde_pf_pallas_vs_xla",
        "value": round(rate_p / rate_x, 3),
        "unit": "x",
        "detail": {
            "pallas": det_p,
            "xla": det_x,
            "same_session": True,
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
