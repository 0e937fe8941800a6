"""Pallas TPU kernel: fused particle-filter psi for SDE models.

The XLA SDE psi path (engine/sde.py under vmap x vmap) is dominated by
while_loop dispatch and threefry draws, compiles for ~9 minutes through
the tunnel, and crashed the TPU worker at population scale. Here the whole
occasion — Euler-Maruyama cloud march (step-doubling controller shared per
cell, em.rs parity), observation weighting, stratified resampling, and the
mean-weight log-likelihood — runs inside ONE kernel per (row, support
block) grid step:

- particle states live as ``n_states`` [P, sp_block] VMEM lanes: the
  particle axis is the sublane dimension, support points are lanes;
- noise comes from the on-core PRNG (``pltpu.prng_seed`` /
  ``prng_random_bits``) pushed through the Acklam inverse-normal
  approximation (log/sqrt only — Mosaic lowers neither erf nor a full
  Box-Muller reliably); draws are independent per (row, support, trial) —
  statistically equivalent to the engine's ``independent`` noise mode;
- the per-cell step controller reduces the step-doubling error over
  particles x states to one dt lane per support (engine parity: the
  controller is shared across the cloud);
- resampling per weighted observation: cumulative weights via ONE lower-
  triangular MXU matmul ([P, P] @ [P, sp] — the systolic array does the
  prefix sum), stratified positions u_j = (j + U_j)/P (sde/mod.rs:747-768
  semantics), index counts and the gather as two ``fori_loop`` passes of
  masked row broadcasts;
- drift/diffusion closures are traced straight into the kernel through
  the same lane shims as the ODE kernel (ops/pallas_ode.LaneVec).

Scope (validated by likelihood/matrix._PallasSdePsiPlan): multi-input
boluses (each active input doses its inject-to-destination state,
sde/mod.rs:46-79) and infusions (per-input rate streams into the matching
rateiv slot), time-constant covariates plus time-varying ones via
per-segment affine (a, b) streams (knot-free spans, like the ODE tier),
lag/fa via per-(row, support) planes + an in-kernel pending-dose
split march (the EM controller restarts at the fire, matching the
engine's per-support grid split at the lag-shifted time — zero-diffusion
parity stays exact; dynamic time-dependent / tv-covariate-reading
closures ride exact per-DOSE-SEGMENT planes selected by static
(input, segment) -> slot tables, like the ODE tier), outputs linear in
the state, and BLOQ/ALOQ-censored observations (particle weights route
through the kernel's log_ndtr CDF — reference parity with
exp(Prediction::log_likelihood), sde/mod.rs:560 + prediction.rs:105-125). Compiled kernels are float32-only; off-TPU the kernel runs in
interpret mode (CPU parity tests). Zero-diffusion models reproduce the deterministic engines exactly
up to EM step error; stochastic parity is statistical (same filter, same
resampling law — fixed-seed reproducibility holds per platform, not
across the XLA/pallas pair, which matches the reference's own
thread-local-RNG non-reproducibility, sde/mod.rs).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_ode import LaneCov, LaneVec
from .pallas_psi import SEG_PAD, SP_TILE, _pad_lanes, _static_any

LOG_2PI = math.log(2.0 * math.pi)

EM_RTOL = 1e-2
EM_ATOL = 1e-2
EM_MAX_STEP = 0.1
EM_MIN_STEP = 1e-6
EM_SAFETY = 0.9
EM_MAX_ITERS = 100_000

SDE_SP_BLOCK = 128


def _acklam_ndtri(p):
    """Inverse standard-normal CDF (Acklam 2003): log/sqrt/selects only.

    Max abs error ~1.15e-9 over (0, 1) in f64; in f32 the limiting factor
    is the uniform grid itself. Used to turn on-core uniform bits into
    normals without Box-Muller's cos (untrusted in Mosaic lowering).
    """
    a = (-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00)
    b = (-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01)
    c = (-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00)
    d = (7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00)
    p_low = 0.02425

    # tails: q = sqrt(-2 log(p)) (lower) / sqrt(-2 log(1-p)) (upper)
    pl = jnp.clip(p, 1e-7, 1.0 - 1e-7)
    q_low = jnp.sqrt(-2.0 * jnp.log(pl))
    x_low = ((((((c[0] * q_low + c[1]) * q_low + c[2]) * q_low + c[3])
               * q_low + c[4]) * q_low + c[5])
             / ((((d[0] * q_low + d[1]) * q_low + d[2]) * q_low + d[3])
                * q_low + 1.0))
    q_hi = jnp.sqrt(-2.0 * jnp.log(1.0 - pl))
    x_hi = -((((((c[0] * q_hi + c[1]) * q_hi + c[2]) * q_hi + c[3])
               * q_hi + c[4]) * q_hi + c[5])
             / ((((d[0] * q_hi + d[1]) * q_hi + d[2]) * q_hi + d[3])
                * q_hi + 1.0))
    # central region
    q = pl - 0.5
    r = q * q
    x_mid = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4])
             * r + a[5]) * q / (((((b[0] * r + b[1]) * r + b[2]) * r
                                  + b[3]) * r + b[4]) * r + 1.0)
    return jnp.where(pl < p_low, x_low,
                     jnp.where(pl > 1.0 - p_low, x_hi, x_mid))


def _make_sde_kernel(
    drift_rhs, diff_rhs, *, n_states: int, n_params: int, n_seg: int,
    n_particles: int, p_pad: int, n_bolus_in: int, dose_states: tuple,
    has_inf: bool, n_rate_in: int, n_out: int, has_bias: bool,
    has_init: bool, cov_names: tuple, cov_affine: tuple,
    has_lag: bool, has_fa: bool, has_cens: bool, seed: int,
    n_lag_planes: int = 0, n_fa_planes: int = 0,
    lag_slots=None, fa_slots=None,
    filter_on: bool = True, interpret: bool = False,
    rows_per_step: int = 8,
    init_mode: str = "rows", coupled: bool = False,
):
    """Build the fused SDE particle-filter psi kernel.

    Each grid step processes ``rows_per_step`` occasion rows sequentially
    (Mosaic requires sublane block sizes divisible by 8, so single-row
    blocks are not expressible); each row runs the full particle filter on
    [P, sp_block] lanes.

    Ref layout: segment streams (dt, bolus x n_bolus_in,
    [rateiv x n_rate_in], mask, value, sigma, [outeq], t0, [init_mask],
    cov... — affine covariates ride (a, b) stream pairs) each
    [rows_per_step, SEG_PAD]; lag/fa planes (one per bolus input) and
    init planes ride [rows_per_step, sp_block] tile refs; parameter rows
    (p columns, [init rows], coef rows, [bias rows]) each [1, sp_block];
    out_ref [rows_per_step, sp_block].

    Dosing follows the engine (engine/sde.py): boluses add the (fa-scaled)
    amount to ``dose_states[jb]`` on every particle; a lagged dose parks in
    a per-input (pend_amt, pend_rem) slot and fires via a TRUE split march
    (the EM controller restarts at the fire, exactly like the engine's
    per-support grid split at the lag-shifted time — zero-diffusion parity
    is exact). Infusions ride per-input rate lanes into the matching
    rateiv slot (sde/mod.rs:184-198 semantics).
    """
    from jax.experimental import pallas as pl

    has_outeq = n_out > 1
    P = p_pad
    inv_p_real = 1.0 / float(n_particles)

    def kernel(*refs):
        from jax.experimental.pallas import tpu as pltpu

        it = iter(refs)
        dts = next(it)[:, :]
        bols_l = [next(it)[:, :] for _ in range(n_bolus_in)]
        rates_l = ([next(it)[:, :] for _ in range(n_rate_in)]
                   if has_inf else None)
        masks = next(it)[:, :]
        vals = next(it)[:, :]
        sigs = next(it)[:, :]
        censs = next(it)[:, :] if has_cens else None
        outeqs = next(it)[:, :] if has_outeq else None
        t0s = next(it)[:, :]
        initm = next(it)[:, :] if has_init else None
        cov_streams = [
            ((next(it)[:, :], next(it)[:, :]) if aff else next(it)[:, :])
            for aff in cov_affine
        ]
        lag_planes = ([next(it)[:, :]
                       for _ in range(n_lag_planes or n_bolus_in)]
                      if has_lag else None)
        fa_planes = ([next(it)[:, :]
                      for _ in range(n_fa_planes or n_bolus_in)]
                     if has_fa else None)
        params = [next(it)[:, :] for _ in range(n_params)]
        init_rows = [next(it)[:, :] for _ in range(n_states)] if has_init else None
        coefs = [[next(it)[:, :] for _ in range(n_states)] for _ in range(n_out)]
        biases = [next(it)[:, :] for _ in range(n_out)] if has_bias else None
        out_ref = next(it)

        dtype = out_ref.dtype
        sp = out_ref.shape[1]
        shape = (P, sp)
        zeros = jnp.zeros(shape, dtype)
        zrow = jnp.zeros((1, sp), dtype)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, dts.shape[1]), 1)
        # padded particle slots are masked out of weights/errors
        prow = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        pmask = (prow < n_particles).astype(dtype)
        # lower-triangular ones for the MXU prefix sum over particles
        tri = (jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
               >= jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)).astype(dtype)

        # RNG: the compiled path uses the stateful on-core PRNG (fresh bits
        # on every runtime invocation, including while_loop iterations).
        # Interpret mode emulates it with threefry keyed on a STATIC
        # per-call-site id plus a traced iteration salt — a mutable traced
        # counter would leak a while-body tracer into the outer trace
        # (pallas then rejects it as a captured constant).
        site_counter = [0]
        if not interpret:
            pltpu.prng_seed(
                seed + pl.program_id(0) * 7919 + pl.program_id(1) * 104729
            )

            def uniforms(salt):
                bits = pltpu.bitcast(
                    pltpu.prng_random_bits(shape), jnp.int32
                )
                # signed int32 -> [0, 1): x * 2^-32 in [-0.5, 0.5) shifted
                return bits.astype(jnp.float32) * (1.0 / 4294967296.0) + 0.5

            def normals(salt):
                return _acklam_ndtri(uniforms(salt)).astype(dtype)
        else:

            def _site_key(salt):
                site_counter[0] += 1
                key = jax.random.fold_in(
                    jax.random.PRNGKey(seed), site_counter[0]
                )
                return jax.random.fold_in(key, salt)

            def uniforms(salt):
                return jax.random.uniform(_site_key(salt), shape, dtype)

            def normals(salt):
                return jax.random.normal(_site_key(salt), shape, dtype)

        def resample(w, xs):
            """Stratified resampling per support lane (sde/mod.rs:747-768).

            qc = tri @ w is the cumulative weight ladder; u_j = (j+U_j)/P;
            idx_j = #(qc_k < u_j); the gather is a fori pass of masked row
            broadcasts.
            """
            qc = jnp.dot(tri, w, preferred_element_type=dtype)  # [P, sp]
            uu = uniforms(jnp.zeros((), jnp.int32)).astype(dtype)
            u = (prow.astype(dtype) + uu) / float(n_particles)

            # row k extraction via masked iota reduction — Mosaic has no
            # dynamic_slice on the sublane dim for traced indices
            def count_body(k, idx):
                selk = (prow == k).astype(dtype)
                qck = jnp.sum(qc * selk, axis=0, keepdims=True)  # [1, sp]
                return idx + (qck < u).astype(dtype)

            idx = jax.lax.fori_loop(0, n_particles, count_body, zeros)
            idx = jnp.minimum(idx, float(n_particles - 1))

            def gather_body(k, xn):
                selk = (prow == k).astype(dtype)
                sel = (idx == k.astype(dtype)).astype(dtype)
                return [
                    x + sel * jnp.sum(xsrc * selk, axis=0, keepdims=True)
                    for x, xsrc in zip(xn, xs)
                ]

            return jax.lax.fori_loop(
                0, n_particles, gather_body, [zeros] * n_states
            )

        def row_program(rr):
            """The full particle filter for occasion row ``rr``."""

            def col(a, m):
                sel = (lane1 == np.int32(m)).astype(a.dtype)
                return jnp.sum(a[rr:rr + 1, :] * sel, axis=1, keepdims=True)

            const_lanes = {
                name: col(cs, 0)
                for name, cs, aff in zip(cov_names, cov_streams, cov_affine)
                if not aff
            }

            def cov_for_seg(m):
                lanes = dict(const_lanes)
                for name, cs, aff in zip(cov_names, cov_streams, cov_affine):
                    if aff:
                        lanes[name] = (col(cs[0], m), col(cs[1], m))
                return lanes

            def drift(xs, t, rate, cov_lanes):
                return drift_rhs(xs, params, t, rate, cov_lanes, shape, dtype)

            def diffusion(t, cov_lanes):
                return diff_rhs(params, t, cov_lanes, (1, sp), dtype)

            def em_march(xs, dt_col, rate, t0_col, cov_lanes):
                """Adaptive step-doubling EM over one segment (em.rs
                parity). dt control is per SUPPORT lane, shared across the
                cloud; the error is the max normalized |full - two halves|
                over particles and states. Draws are fresh per sub-step."""
                target = jnp.broadcast_to(dt_col, (1, sp))
                live0 = (target > 0.0).astype(dtype)

                def em_step(xs_c, t, h, dws):
                    d = drift(xs_c, t, rate, cov_lanes)
                    g = diffusion(t, cov_lanes)
                    return [
                        x + dd * h + g[s] * dws[s]
                        for s, (x, dd) in enumerate(zip(xs_c, d))
                    ]

                def one_trial(carry):
                    tau, xs_c, h_c, live_f, it_ = carry
                    live = live_f > 0.5
                    h_try = jnp.minimum(h_c, jnp.maximum(target - tau, 1e-14))
                    t_abs = t0_col + tau
                    sq_h = jnp.sqrt(jnp.maximum(h_try * 0.5, 0.0))
                    if coupled:
                        # dW_full = dW_1 + dW_2: the error estimate measures
                        # truncation, not fresh-noise difference — steps
                        # grow to what the EM scheme earns
                        n1 = [normals(it_) for _ in range(n_states)]
                        n2 = [normals(it_) for _ in range(n_states)]
                        w_full = [(a + b) * sq_h for a, b in zip(n1, n2)]
                        w1 = [a * sq_h for a in n1]
                        w2 = [b * sq_h for b in n2]
                    else:
                        sq = jnp.sqrt(jnp.maximum(h_try, 0.0))
                        w_full = [normals(it_) * sq for _ in range(n_states)]
                        w1 = [normals(it_) * sq_h for _ in range(n_states)]
                        w2 = [normals(it_) * sq_h for _ in range(n_states)]
                    y1 = em_step(xs_c, t_abs, h_try, w_full)
                    y2 = em_step(xs_c, t_abs, h_try * 0.5, w1)
                    y2 = em_step(y2, t_abs + h_try * 0.5, h_try * 0.5, w2)
                    err = zrow
                    for s in range(n_states):
                        tol = EM_ATOL + EM_RTOL * jnp.abs(xs_c[s])
                        e = jnp.abs(y1[s] - y2[s]) / tol * pmask
                        err = jnp.maximum(
                            err, jnp.max(e, axis=0, keepdims=True)
                        )
                    finite = jnp.isfinite(err)
                    accept = live & (err <= 1.0) & finite
                    tau_n = jnp.where(accept, tau + h_try, tau)
                    xs_n = [jnp.where(accept, y, x) for y, x in zip(y2, xs_c)]
                    h_n = jnp.where(
                        live,
                        jnp.clip(
                            h_try * EM_SAFETY
                            * jax.lax.rsqrt(jnp.maximum(
                                jnp.where(finite, err, 1e4), 1e-12)),
                            EM_MIN_STEP, EM_MAX_STEP,
                        ),
                        h_c,
                    )
                    done = tau_n >= target - 1e-6 * jnp.maximum(target, 1e-30)
                    stalled = live & ((tau_n + h_n) <= tau_n) & ~done
                    live_n = live & ~done & ~stalled
                    return (tau_n, xs_n, h_n, live_n.astype(dtype), it_ + 1)

                def cond(carry):
                    _, _, _, live_f, it_ = carry
                    return (it_ < EM_MAX_ITERS) & (jnp.max(live_f) > 0.5)

                init = (jnp.zeros((1, sp), dtype), list(xs),
                        jnp.full((1, sp), EM_MAX_STEP, dtype), live0,
                        jnp.zeros((), jnp.int32))
                tau_f, xs_f, _, _, _ = jax.lax.while_loop(
                    cond, one_trial, init)
                incomplete = tau_f < target - 1e-6 * jnp.maximum(target, 1e-30)
                nan = jnp.full(shape, jnp.nan, dtype)
                return [jnp.where(incomplete, nan, x) for x in xs_f]

            # ---- initial cloud ----
            if has_init:
                im = col(initm, 0)
                # planes mode: init rides [rows_per_step, sp] tile refs
                # (covariate-dependent init); rr is a static Python int
                xs = [
                    im * (init_rows[s] if init_mode == "rows"
                          else init_rows[s][rr:rr + 1, :]) + zeros
                    for s in range(n_states)
                ]
            else:
                xs = [zeros] * n_states
            ll = zrow
            if has_lag:
                pend_amt = [zrow] * n_bolus_in
                pend_rem = [zrow] * n_bolus_in

            for m in range(n_seg):
                dt = col(dts, m)
                mask = col(masks, m)
                val = col(vals, m)
                sig = col(sigs, m) + (1.0 - mask)

                # observation BEFORE bolus: weight, record, resample
                if filter_on:
                    def pred_out(k):
                        pr = coefs[k][0] * xs[0]
                        for i in range(1, n_states):
                            pr = pr + coefs[k][i] * xs[i]
                        if has_bias:
                            pr = pr + biases[k]
                        return pr

                    if n_out == 1:
                        pred = pred_out(0)
                    else:
                        oe = col(outeqs, m)
                        pred = zeros
                        for k in range(n_out):
                            pred = pred + (oe == float(k)).astype(dtype) \
                                * pred_out(k)
                    z = (val - pred) / sig
                    q = jnp.exp(-0.5 * z * z) / (sig * math.sqrt(2.0 * math.pi))
                    if has_cens:
                        # censoring-aware particle weights (reference:
                        # exp(Prediction::log_likelihood) routes BLOQ ->
                        # normcdf, ALOQ -> normccdf; the stream carries
                        # the +-1/0 sign convention and the kernel's own
                        # log_ndtr supplies the CDF)
                        from .pallas_psi import _log_ndtr

                        s_c = col(censs, m)
                        q = jnp.where(
                            s_c == 0.0, q, jnp.exp(_log_ndtr(s_c * z))
                        )
                    q = q * pmask  # padded particles carry zero weight
                    sum_q = jnp.sum(q, axis=0, keepdims=True)  # [1, sp]
                    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
                    ll = ll + mask * jnp.log(
                        jnp.maximum(sum_q * inv_p_real, tiny)
                    )
                    w = q / jnp.maximum(sum_q, tiny)
                    xs_rs = resample(w, xs)
                    do_rs = mask > 0.0
                    xs = [jnp.where(do_rs, xr, x)
                          for xr, x in zip(xs_rs, xs)]

                rate = ([col(r, m) for r in rates_l] if has_inf else None)
                t0_col = col(t0s, m)
                cov_m = cov_for_seg(m)

                def fa_src(jb, _m=m):
                    if not has_fa:
                        return None
                    if fa_slots is not None:
                        si = fa_slots[jb][_m]
                        return None if si < 0 else fa_planes[si]
                    return fa_planes[jb]

                def lag_src(jb, _m=m):
                    if lag_slots is not None:
                        si = lag_slots[jb][_m]
                        return None if si < 0 else lag_planes[si]
                    return lag_planes[jb]

                def amt_for(jb, _m=m):
                    a = col(bols_l[jb], _m)
                    f_ = fa_src(jb, _m)
                    if f_ is not None:
                        a = a * f_[rr:rr + 1, :]
                    return a

                if not has_lag:
                    for jb in range(n_bolus_in):
                        ds = dose_states[jb]
                        xs[ds] = xs[ds] + amt_for(jb)
                    nxs = em_march(xs, dt, rate, t0_col, cov_m)
                    live = jnp.broadcast_to(dt, (1, sp)) > 0.0
                    xs = [jnp.where(live, nx, x)
                          for nx, x in zip(nxs, xs)]
                else:
                    # doses due exactly at this breakpoint (rem elapsed)
                    # fire first — after the observation, before arrivals
                    for jb in range(n_bolus_in):
                        fire0 = (pend_amt[jb] != 0.0) & (pend_rem[jb] <= 0.0)
                        ds = dose_states[jb]
                        xs[ds] = jnp.where(
                            fire0, xs[ds] + pend_amt[jb], xs[ds])
                        pend_amt[jb] = jnp.where(fire0, zrow, pend_amt[jb])
                    # arrivals park with their per-lane lag; a None lag
                    # source means the host plan proved no bolus lands at
                    # this column (slot -1): statically skipped
                    for jb in range(n_bolus_in):
                        lp_ = lag_src(jb)
                        if lp_ is None:
                            continue
                        bol_j = col(bols_l[jb], m)
                        amt_j = amt_for(jb)
                        arrive = bol_j != 0.0
                        pend_amt[jb] = jnp.where(
                            arrive, pend_amt[jb] + amt_j, pend_amt[jb])
                        pend_rem[jb] = jnp.where(
                            arrive, lp_[rr:rr + 1, :] + zrow,
                            pend_rem[jb])
                    # split march: one pass per input, each advancing to
                    # the next earliest per-lane fire time (the EM
                    # controller restarts at the fire — same law as the
                    # engine's per-support grid split at the shifted time)
                    dt_b = jnp.broadcast_to(dt, (1, sp))
                    elapsed = zrow
                    for p_ in range(n_bolus_in):
                        will = [(pend_amt[jb] != 0.0)
                                & (pend_rem[jb] < dt_b)
                                for jb in range(n_bolus_in)]
                        t_next = dt_b
                        for jb in range(n_bolus_in):
                            t_next = jnp.minimum(
                                t_next,
                                jnp.where(will[jb], pend_rem[jb], dt_b),
                            )
                        t_next = jnp.maximum(t_next, elapsed)
                        nxs = em_march(xs, t_next - elapsed, rate,
                                       t0_col + elapsed, cov_m)
                        live_s = (t_next - elapsed) > 0.0
                        xs = [jnp.where(live_s, nx, x)
                              for nx, x in zip(nxs, xs)]
                        for jb in range(n_bolus_in):
                            fire = will[jb] & (pend_rem[jb] <= t_next)
                            ds = dose_states[jb]
                            xs[ds] = jnp.where(
                                fire, xs[ds] + pend_amt[jb], xs[ds])
                            pend_amt[jb] = jnp.where(
                                fire, zrow, pend_amt[jb])
                        elapsed = t_next
                    nxs = em_march(xs, dt_b - elapsed, rate,
                                   t0_col + elapsed, cov_m)
                    live_s = (dt_b - elapsed) > 0.0
                    xs = [jnp.where(live_s, nx, x)
                          for nx, x in zip(nxs, xs)]
                    live = dt_b > 0.0
                    for jb in range(n_bolus_in):
                        pend_rem[jb] = jnp.where(
                            (pend_amt[jb] != 0.0) & live,
                            pend_rem[jb] - dt_b, pend_rem[jb],
                        )

            return ll

        for rr in range(rows_per_step):
            out_ref[rr:rr + 1, :] = row_program(rr)

    return kernel


def psi_sde(
    seg_dt, seg_bolus, seg_rateiv, obs_mask, obs_value, obs_sigma,
    seg_t0, support, drift, diffusion,
    *,
    obs_cens=None,
    n_states: int,
    n_particles: int,
    ninput: int = None,
    dose_states: tuple = (0,),
    rate_inputs: tuple = (0,),
    seed: int = 0,
    obs_outeq=None,
    out_coef=None,
    out_bias=None,
    init_rows=None,
    init_planes=None,
    init_mask=None,
    cov_streams=None,
    cov_names=(),
    cov_modes=None,
    lag_planes=None,
    fa_planes=None,
    lag_slots=None,
    fa_slots=None,
    interpret: Optional[bool] = None,
    em_control: str = "independent",
):
    """Fused particle-filter psi for SDE models.

    Segment streams are [R, M] (pallas_psi.streams_from_grid layout,
    censoring unsupported) plus ``seg_t0`` [R, M]. ``seg_bolus`` is one
    [R, M] stream or a tuple of them (one per active bolus input, dosing
    ``dose_states[jb]``); ``seg_rateiv`` likewise per ``rate_inputs``
    entry. ``cov_streams[name]`` is a per-row constant stream (value in
    column 0) or an ``(a, b)`` pair of per-segment affine streams
    (``cov_modes[name] == 'affine'``). ``lag_planes``/``fa_planes`` are
    tuples of [R, S] planes, one per bolus input (static closures only —
    the kernel runs a true pending-dose split march). ``support``
    [S, n_cols]. Returns psi [R, S]; R unconstrained (one grid step per
    row), S must be a multiple of SDE_SP_BLOCK.
    """
    from jax.experimental import pallas as pl

    from .pallas_ode import make_lane_rhs

    R, M = seg_dt.shape
    S = support.shape[0]
    n_params = support.shape[1]
    ROWS_PER_STEP = 8
    if R % ROWS_PER_STEP:
        raise ValueError(
            f"R ({R}) must be a multiple of {ROWS_PER_STEP} (pad rows with "
            "dt=0/mask=0)"
        )
    if S % SDE_SP_BLOCK:
        raise ValueError(f"S ({S}) must be a multiple of {SDE_SP_BLOCK}")
    if M > SEG_PAD:
        raise ValueError(f"segment stream too long ({M} > {SEG_PAD})")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    dtype = seg_dt.dtype
    if not interpret and dtype != jnp.float32:
        raise ValueError(
            f"compiled pallas SDE kernels are float32-only (got {dtype})"
        )
    if out_coef is None:
        raise ValueError("out_coef [n_out, n_states, S] is required")
    out_coef = jnp.asarray(out_coef, dtype)
    n_out = out_coef.shape[0]
    has_outeq = n_out > 1
    bolus_streams = (list(seg_bolus) if isinstance(seg_bolus, (list, tuple))
                     else [seg_bolus])
    n_bolus_in = len(bolus_streams)
    dose_states = tuple(dose_states)
    if len(dose_states) != n_bolus_in:
        raise ValueError(
            f"dose_states ({len(dose_states)}) must match the number of "
            f"bolus streams ({n_bolus_in})"
        )
    rate_streams = ([] if seg_rateiv is None
                    else list(seg_rateiv)
                    if isinstance(seg_rateiv, (list, tuple))
                    else [seg_rateiv])
    has_inf = any(_static_any(r) for r in rate_streams)
    n_rate_in = len(rate_streams) if has_inf else 0
    rate_inputs = tuple(rate_inputs)[:len(rate_streams)]
    if init_rows is not None and init_planes is not None:
        raise ValueError("pass init_rows OR init_planes, not both")
    has_init = init_rows is not None or init_planes is not None
    init_mode = "planes" if init_planes is not None else "rows"
    has_bias = _static_any(out_bias)
    has_lag = lag_planes is not None
    has_fa = fa_planes is not None
    has_cens = _static_any(obs_cens)
    p_pad = max(8, ((n_particles + 7) // 8) * 8)

    zeros_rm = jnp.zeros_like(jnp.asarray(seg_dt, dtype))
    if obs_outeq is None:
        obs_outeq = zeros_rm

    cov_names = tuple(cov_names)
    cov_modes = dict(cov_modes or {})
    cov_affine = tuple(
        cov_modes.get(n, "const") == "affine" for n in cov_names
    )

    streams = [_pad_lanes(jnp.asarray(seg_dt, dtype), SEG_PAD)]
    streams += [_pad_lanes(jnp.asarray(b, dtype), SEG_PAD)
                for b in bolus_streams]
    if has_inf:
        streams += [_pad_lanes(jnp.asarray(r, dtype), SEG_PAD)
                    for r in rate_streams]
    mask_p = _pad_lanes(jnp.asarray(obs_mask, dtype), SEG_PAD)
    streams.append(mask_p)
    streams.append(_pad_lanes(jnp.asarray(obs_value, dtype), SEG_PAD))
    streams.append(_pad_lanes(jnp.asarray(obs_sigma, dtype), SEG_PAD) * mask_p)
    if has_cens:
        streams.append(_pad_lanes(jnp.asarray(obs_cens, dtype), SEG_PAD))
    if has_outeq:
        streams.append(_pad_lanes(jnp.asarray(obs_outeq, dtype), SEG_PAD))
    streams.append(_pad_lanes(jnp.asarray(seg_t0, dtype), SEG_PAD))
    if has_init:
        streams.append(_pad_lanes(jnp.asarray(init_mask, dtype), SEG_PAD))
    for n, aff in zip(cov_names, cov_affine):
        e = (cov_streams or {})[n]
        if aff:
            streams.append(_pad_lanes(jnp.asarray(e[0], dtype), SEG_PAD))
            streams.append(_pad_lanes(jnp.asarray(e[1], dtype), SEG_PAD))
        else:
            streams.append(_pad_lanes(jnp.asarray(e, dtype), SEG_PAD))

    sp_arr = jnp.asarray(support, dtype)
    ROWS_SPEC = "row_tile"  # sentinel for tile-shaped entries in p_rows
    # [R, S] planes ride tile-shaped refs BEFORE the parameter rows
    # (matching the kernel's ref order: lag, fa, then params)
    plane_rows = []
    if has_lag:
        if lag_slots is None and len(lag_planes) != n_bolus_in:
            raise ValueError("lag_planes must have one [R, S] plane per "
                             "bolus input (or pass lag_slots tables)")
        plane_rows += [jnp.asarray(p_, dtype) for p_ in lag_planes]
    if has_fa:
        if fa_slots is None and len(fa_planes) != n_bolus_in:
            raise ValueError("fa_planes must have one [R, S] plane per "
                             "bolus input (or pass fa_slots tables)")
        plane_rows += [jnp.asarray(p_, dtype) for p_ in fa_planes]
    if lag_slots is not None:
        lag_slots = tuple(tuple(int(x) for x in rw) for rw in lag_slots)
    if fa_slots is not None:
        fa_slots = tuple(tuple(int(x) for x in rw) for rw in fa_slots)
    p_rows = list(plane_rows)
    p_row_kinds = [ROWS_SPEC] * len(plane_rows)
    p_rows += [sp_arr[:, i].reshape(1, S) for i in range(n_params)]
    p_row_kinds += ["p"] * n_params
    if has_init and init_mode == "rows":
        ir = jnp.asarray(init_rows, dtype)
        if ir.shape != (n_states, S):
            raise ValueError(
                f"init_rows must be [{n_states}, {S}], got {ir.shape}"
            )
        p_rows += [ir[s].reshape(1, S) for s in range(n_states)]
        p_row_kinds += ["p"] * n_states
    elif has_init:
        ip = jnp.asarray(init_planes, dtype)
        if ip.shape != (n_states, R, S):
            raise ValueError(
                f"init_planes must be [{n_states}, {R}, {S}], got {ip.shape}"
            )
        p_rows += [ip[s] for s in range(n_states)]
        p_row_kinds += [ROWS_SPEC] * n_states
    p_rows += [
        out_coef[k, i].reshape(1, S)
        for k in range(n_out) for i in range(n_states)
    ]
    p_row_kinds += ["p"] * (n_out * n_states)
    if has_bias:
        ob = jnp.asarray(out_bias, dtype)
        p_rows += [ob[k].reshape(1, S) for k in range(n_out)]
        p_row_kinds += ["p"] * n_out

    # SDE drift signature is (x, p, t, rateiv, cov) — no bolus argument
    # (boluses apply at breakpoints); adapt to the shared diffeq shim shape
    drift_rhs = make_lane_rhs(
        lambda x, p, t, b, rateiv, cov: drift(x, p, t, rateiv, cov),
        n_states, n_params, ninput or n_states,
        rate_inputs=rate_inputs or (0,),
    )

    def diff_rhs(p_lanes, t, cov_lanes, shape, dt_):
        out = diffusion(LaneVec(p_lanes), t, LaneCov(cov_lanes))
        if isinstance(out, (list, tuple, LaneVec)):
            comps = list(out)
        else:
            comps = [out[i] for i in range(n_states)]
        return [jnp.broadcast_to(jnp.asarray(c, dt_), shape) for c in comps]

    kernel = _make_sde_kernel(
        drift_rhs, diff_rhs, n_states=n_states, n_params=n_params, n_seg=M,
        n_particles=n_particles, p_pad=p_pad, n_bolus_in=n_bolus_in,
        dose_states=dose_states, has_inf=has_inf, n_rate_in=n_rate_in,
        n_out=n_out,
        has_bias=has_bias, has_init=has_init, cov_names=cov_names,
        cov_affine=cov_affine, has_lag=has_lag, has_fa=has_fa,
        has_cens=has_cens,
        n_lag_planes=len(lag_planes) if has_lag else 0,
        n_fa_planes=len(fa_planes) if has_fa else 0,
        lag_slots=lag_slots, fa_slots=fa_slots,
        seed=seed, filter_on=True,
        interpret=interpret, rows_per_step=ROWS_PER_STEP,
        init_mode=init_mode, coupled=(em_control == "coupled"),
    )
    sp_block = SDE_SP_BLOCK
    row_spec = pl.BlockSpec((ROWS_PER_STEP, SEG_PAD), lambda i, j: (i, 0))
    p_spec = pl.BlockSpec((1, sp_block), lambda i, j: (0, j))
    tile_spec = pl.BlockSpec((ROWS_PER_STEP, sp_block), lambda i, j: (i, j))
    p_specs = [tile_spec if k == ROWS_SPEC else p_spec for k in p_row_kinds]

    def call():
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, S), dtype),
            grid=(R // ROWS_PER_STEP, S // sp_block),
            in_specs=[row_spec] * len(streams) + p_specs,
            out_specs=tile_spec,
            interpret=interpret,
        )(*streams, *p_rows)

    if dtype == jnp.float32:
        with jax.enable_x64(False):
            return call()
    return call()
