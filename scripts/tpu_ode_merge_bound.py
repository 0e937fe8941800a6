"""Bound experiment: what could segment-merging/dense-output buy ODE psi?

The fused pallas ODE kernel stops the adaptive march at every event
boundary (9 observations in the reference "Short" schedule). A
dense-output scheme could integrate straight through observation-only
boundaries — but it pays per-iteration interpolation/crossing costs, so
before building it we measure the UPPER BOUND: the same kernel on

  A. the real 10-segment schedule (9 forced stops), vs
  B. a collapsed single 12 h segment with one terminal observation
     (identical integration span, no interior stops — the ll is wrong,
     the adaptive iteration cost is exactly what merging would leave).

throughput(B) / throughput(A) bounds any merging win. Run on the TPU;
iteration-scaling protocol (K kernel copies in one jit, scalar fetch,
marginal time) per CLAUDE.md.

Usage: python scripts/tpu_ode_merge_bound.py [--rows 4096] [--sp 256]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4096)
    ap.add_argument("--sp", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--k-lo", type=int, default=2)
    ap.add_argument("--k-hi", type=int, default=16)
    ap.add_argument("--solver", default="dopri5")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    print(f"platform: {platform}", flush=True)
    # tiny probe first (CLAUDE.md: wedge detection after worker crashes)
    print("probe:", float(jax.jit(lambda x: x + 1)(jnp.float32(1.0))),
          flush=True)

    from pharmsol_tpu.ops.pallas_ode import psi_ode

    R, S = args.rows, args.sp
    fd = np.float32 if platform == "tpu" else np.float64
    obs_times = [0.5, 1.0, 2.0, 3.0, 4.0, 6.0, 8.0, 10.0, 12.0]
    M = len(obs_times) + 1

    rng = np.random.RandomState(0)
    center = np.array([0.15, 1.2, 0.3, 0.2, 10.0])
    support = np.abs(
        center[None, :] * (1.0 + 0.2 * rng.randn(S, 5))
    ).astype(fd)

    def diffeq(x, p, t, b, rateiv, cov):
        return jnp.stack([
            -p[1] * x[0],
            p[1] * x[0] - (p[0] + p[2]) * x[1] + p[3] * x[2],
            p[2] * x[1] - p[3] * x[2],
        ])

    bolus_map = np.zeros((3, S), fd)
    bolus_map[0] = 1.0
    out_coef = np.zeros((1, 3, S), fd)
    out_coef[0, 1] = 1.0 / support[:, 4]

    def build(dts, mask_pattern, t0s):
        seg_dt = np.tile(np.asarray(dts, fd), (R, 1))
        seg_bolus = np.zeros((R, M), fd)
        seg_bolus[:, 0] = 100.0
        obs_mask = np.tile(np.asarray(mask_pattern, fd), (R, 1))
        obs_value = np.abs(5.0 + rng.randn(R, M)).astype(fd) * obs_mask
        obs_sigma = np.ones((R, M), fd)
        seg_t0 = np.tile(np.asarray(t0s, fd), (R, 1))
        return dict(
            seg_dt=jnp.asarray(seg_dt), seg_bolus=jnp.asarray(seg_bolus),
            seg_rateiv=None, obs_mask=jnp.asarray(obs_mask),
            obs_value=jnp.asarray(obs_value),
            obs_sigma=jnp.asarray(obs_sigma), obs_cens=None,
            seg_t0=jnp.asarray(seg_t0),
        )

    starts = [0.0] + obs_times
    dts_real = [b - a for a, b in zip(starts, starts[1:])] + [0.0]
    real = build(dts_real, [0.0] + [1.0] * 9, starts)
    collapsed = build([12.0] + [0.0] * 9, [0.0, 1.0] + [0.0] * 8,
                      [0.0, 12.0] + [12.0] * 8)

    kw = dict(
        support=jnp.asarray(support), diffeq=diffeq, n_states=3,
        solver=args.solver, out_coef=jnp.asarray(out_coef),
        bolus_map=jnp.asarray(bolus_map), unroll=1,
    )

    def make_fn(streams, K):
        sargs = dict(streams)

        @jax.jit
        def f(sp):
            def body(c, i):
                psi = psi_ode(**sargs, **{**kw, "support": sp * (1.0 + 1e-6 * i)})
                return c + jnp.sum(psi), None
            total, _ = jax.lax.scan(
                body, jnp.asarray(0.0, fd), jnp.arange(K, dtype=fd)
            )
            return total

        return f

    def best_of(fn, x):
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(fn(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def marginal(streams):
        f_lo, f_hi = make_fn(streams, args.k_lo), make_fn(streams, args.k_hi)
        sp0 = jnp.asarray(support)
        float(f_lo(sp0))
        float(f_hi(sp0))
        t_lo, t_hi = best_of(f_lo, sp0), best_of(f_hi, sp0)
        per = (t_hi - t_lo) / (args.k_hi - args.k_lo)
        if per < 0.05 * t_hi / args.k_hi:
            per = t_hi / args.k_hi
        return per

    sims = R * S
    t_real = marginal(real)
    print(f"real 10-seg:  {t_real:.4f} s/psi  "
          f"{sims / t_real / 1e6:.1f}M sims/s", flush=True)
    t_coll = marginal(collapsed)
    print(f"collapsed:    {t_coll:.4f} s/psi  "
          f"{sims / t_coll / 1e6:.1f}M sims/s", flush=True)
    print(f"merge-bound speedup: {t_real / t_coll:.2f}x", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
