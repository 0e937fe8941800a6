"""Fused ODE psi plan (`_PallasOdePsiPlan`) and the merged-run lowering.

Split out of likelihood/matrix.py in round 5 as pure code movement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...config import float_dtype
from ...errors import PharmsolError
from .decompose import (  # noqa: F401
    _pallas_structure_name,
    _constant_covariate_values,
    _classify_covariates,
    _covariate_values_at,
    _affine_covariate_streams,
    _RowCov,
    _decompose_input_seg_planes,
    _affine_solve,
    _host_cpu_device,
    _host_cov_values,
    _decompose_kernel_inputs,
    _InputPlaneDynamic,
    _decompose_input_plane,
    _decompose_input_planes,
    _validate_lag_no_overlap,
    _check_out_covariate_free,
)
from .seq import (  # noqa: F401
    _MAX_PLANE_FLOATS,
    _MAX_SEQ_COLPLANES,
    _MAX_SEQ_LEVELS,
    _MAX_SEQ_SEGPLANES,
    _colplanes_dynamic_lag,
    _decompose_seq,
    _decompose_seq_colplanes,
    _decompose_seq_levels,
    _decompose_seq_planes,
    _decompose_seq_segplanes,
    _decompose_seq_tv,
    _seq_depth_stream,
)

# a merged span holds one extra [rows, sp] carry lane per interior obs in
# the kernel's while carry — cap the span length to bound VMEM growth
_ODE_MERGE_MAX_SPAN = 16


def _ode_merge_runs(streams, seg_t0, solver, *, n_bolus_in, n_rate_in,
                    affine_streams, has_lag):
    """Static (m0, m1) spans whose interior breakpoints the fused ODE
    kernel may cross with dense output (see ops/pallas_ode.psi_ode).

    A breakpoint m (the start of column m) is crossable iff on EVERY row:
    no bolus lands there (any input), the infusion rates and time-varying
    covariate affine (a, b) streams are identical across it, and the
    segment times are contiguous (t0[m] == t0[m-1] + dt[m-1] — dead
    trailing columns satisfy this with dt 0). Returns None when no span
    would merge (the kernel then runs the classic per-segment march).
    """
    import os

    from ...ops.pallas_ode import _SDIRK_TABLEAUS, dense_P_for

    if (dense_P_for(solver) is None and solver not in _SDIRK_TABLEAUS) \
            or has_lag:
        return None
    if (solver in _SDIRK_TABLEAUS
            and _SDIRK_TABLEAUS[solver]["order"] > 3.0):
        # the cubic-Hermite interior capture is order-matched only for
        # the 2nd/3rd-order stiffly-accurate tableaus; kvaerno5 marches
        # segment by segment
        return None
    if os.environ.get("PHARMSOL_ODE_NO_MERGE") == "1":
        # perf-experiment kill switch; lives HERE (not in psi_ode) so the
        # choice is part of the plan and its cache_key
        return None
    dt_np = np.asarray(streams[0], np.float64)
    M = dt_np.shape[1]
    if M < 2:
        return None
    mergeable = np.ones(M, dtype=bool)
    mergeable[0] = False
    for b in range(n_bolus_in):
        bol = np.asarray(streams[1 + b], np.float64)
        mergeable &= np.all(bol == 0.0, axis=0)
    for r in range(n_rate_in):
        rate = np.asarray(streams[1 + n_bolus_in + r], np.float64)
        mergeable[1:] &= np.all(rate[:, 1:] == rate[:, :-1], axis=0)
    for a, bb in affine_streams.values():
        a = np.asarray(a, np.float64)
        bb = np.asarray(bb, np.float64)
        mergeable[1:] &= np.all(a[:, 1:] == a[:, :-1], axis=0)
        mergeable[1:] &= np.all(bb[:, 1:] == bb[:, :-1], axis=0)
    t0_np = np.asarray(seg_t0, np.float64)
    cont = np.abs(t0_np[:, 1:] - (t0_np[:, :-1] + dt_np[:, :-1])) \
        <= 1e-9 * np.maximum(1.0, np.abs(t0_np[:, 1:]))
    mergeable[1:] &= np.all(cont, axis=0)
    runs = []
    start = 0
    for m in range(1, M + 1):
        if m == M or not mergeable[m] or (m - start) >= _ODE_MERGE_MAX_SPAN:
            runs.append((start, m))
            start = m
    if all(b - a == 1 for a, b in runs):
        return None
    return tuple(runs)


class _PallasOdePsiPlan:
    """Validated, padded inputs for a fused pallas ODE psi evaluation.

    The ODE companion of :class:`_PallasPsiPlan` (same contract: cache_key /
    stream_args / rep_args / runner / finalize, so the driver below and any
    sharded driver treat both uniformly). Everything the kernel cannot probe
    per-step is extracted here by host-side numeric probes on the CPU
    backend (support-only work):

    - bolus map: the engine applies boluses by RHS difference
      (ode/mod.rs:644-687); the probe verifies the difference is
      state-independent, amount-linear, time- and covariate-independent,
      and extracts the per-support per-unit-dose state increment;
    - init rows: ``init(p, 0, cov)`` per support (occasion-0 rows only,
      via the init-mask stream); covariate-dependent init falls back;
    - linear output coefficients: pallas_psi.extract_linear_out;
    - lane-RHS compatibility: the user RHS is traced once with 2-D lane
      shims; styles the shim cannot carry (dynamic indexing, ``.at`` on a
      dense state vector) fall back to the XLA engine;
    - covariates: time-constant ones ride per-row lanes; time-varying
      ones ride per-segment affine ``(a, b)`` streams (exact vs the
      reference interpolation when every knot falls on a segment
      boundary — _affine_covariate_streams validates, else fallback).
    """

    def __init__(self, equation, grid, sp, lowered, row_multiple: int):
        from ...config import BIG_TIME
        from ...engine.grid import CovView
        from ...ops.pallas_ode import (
            _SDIRK_TABLEAUS, _TABLEAUS, make_lane_rhs,
        )
        from ...ops.pallas_psi import (
            SP_TILE, extract_linear_out, segment_schedule, streams_from_grid,
        )

        opts = equation._opts
        if (opts.solver not in _TABLEAUS
                and opts.solver not in _SDIRK_TABLEAUS
                and opts.solver not in ("bdf", "expm")):
            raise PharmsolError(
                f"engine='pallas' ODE psi supports solvers "
                f"{sorted(_TABLEAUS) + sorted(_SDIRK_TABLEAUS)
                   + ['bdf', 'expm']} "
                f"(model uses `{opts.solver}`; use the default XLA engine)"
            )
        self.opts = opts
        self.diffeq = equation._diffeq
        self.n_states = int(equation.nstates())
        self.n_out = int(equation.nouteqs())
        n_states = self.n_states
        ninput = int(equation.ndrugs())
        self.ninput = ninput
        n_params = sp.shape[1]
        self.n_params = n_params
        fd_probe = np.float64
        cov_values, varying_covs = _classify_covariates(grid)
        self.cov_names = tuple(grid.cov_names)
        self.cov_modes = tuple(
            "affine" if n in varying_covs else "const"
            for n in self.cov_names
        )

        # --- active dose inputs ------------------------------------------
        # multi-drug models dose into several RHS inputs; each active input
        # gets its own bolus stream + probed bolus map (and rate stream)
        from ...config import BIG_TIME as _BT

        bt_ = np.asarray(grid.rows.bolus_t, np.float64)
        ba_ = np.asarray(grid.rows.bolus_amt, np.float64)
        bi_ = np.asarray(grid.rows.bolus_input)
        real_b = (bt_ < _BT / 2) & (ba_ != 0.0)
        bolus_inputs = tuple(sorted(
            {int(j) for j in bi_[real_b]})) or (0,)
        it_ = np.asarray(grid.rows.inf_t, np.float64)
        rate_inputs = (0,)
        if it_.size:
            ia_ = np.asarray(grid.rows.inf_amt, np.float64)
            ii_ = np.asarray(grid.rows.inf_input)
            real_i = (it_ < _BT / 2) & (ia_ != 0.0)
            rate_inputs = tuple(sorted(
                {int(j) for j in ii_[real_i]})) or (0,)
        if max(bolus_inputs + rate_inputs) >= ninput:
            raise PharmsolError(
                f"engine='pallas' ODE psi: a dose targets input "
                f">= ndrugs ({ninput})"
            )
        self.bolus_inputs = bolus_inputs
        self.rate_inputs = rate_inputs

        # lag/fa plane construction is deferred until the segment streams
        # exist (the dynamic path needs the dose-carrying columns); see
        # the block after seg_t0 below.

        # --- host probes (CPU backend, tiny shapes) -----------------------
        p_ref = np.where(np.abs(sp[0]) > 1e-30, sp[0], 1.0)
        x_a = np.linspace(0.7, 1.9, n_states)
        x_b = np.flip(x_a) * 1.31 + 0.23
        cov0 = {n: float(np.asarray(v)[0]) for n, v in cov_values.items()}
        cov1 = {n: v * 1.31 + 0.17 for n, v in cov0.items()}
        diffeq = self.diffeq

        def delta(p, x, amt, t, covd, j):
            b = jnp.zeros((ninput,), jnp.float64).at[j].set(amt)
            z = jnp.zeros((ninput,), jnp.float64)
            shim = _RowCov(covd)
            xj = jnp.asarray(x, jnp.float64)
            tj = jnp.asarray(t, jnp.float64)
            with_b = jnp.asarray(diffeq(xj, p, tj, b, z, shim), jnp.float64)
            no_b = jnp.asarray(diffeq(xj, p, tj, z, z, shim), jnp.float64)
            return with_b - no_b

        bmaps = []
        bolus_rhs_diff = False
        for j in bolus_inputs:
            try:
                with _host_cpu_device():
                    d_ref = np.asarray(jax.vmap(
                        lambda p: delta(p, x_a, 1.0, 0.0, cov0, j))(
                            jnp.asarray(sp, jnp.float64)), np.float64)
                    d_x = np.asarray(jax.vmap(
                        lambda p: delta(p, x_b, 1.0, 0.0, cov0, j))(
                            jnp.asarray(sp, jnp.float64)), np.float64)
                    d_amt = np.asarray(jax.vmap(
                        lambda p: delta(p, x_a, 2.37, 0.0, cov0, j))(
                            jnp.asarray(sp, jnp.float64)), np.float64)
                    d_t = np.asarray(jax.vmap(
                        lambda p: delta(p, x_a, 1.0, 17.31, cov0, j))(
                            jnp.asarray(sp, jnp.float64)), np.float64)
                    d_cov = np.asarray(jax.vmap(
                        lambda p: delta(p, x_a, 1.0, 0.0, cov1, j))(
                            jnp.asarray(sp, jnp.float64)), np.float64)
            except PharmsolError:
                raise
            except Exception as e:
                raise PharmsolError(
                    f"engine='pallas' could not probe the ODE bolus "
                    f"mapping: {e}"
                ) from e
            scale = np.maximum(np.abs(d_ref).max(), 1e-12)
            tol = 1e-6 * scale
            if (np.abs(d_x - d_ref).max() > tol
                    or np.abs(d_amt / 2.37 - d_ref).max() > tol
                    or np.abs(d_t - d_ref).max() > tol
                    or np.abs(d_cov - d_ref).max() > tol):
                # nonlinear / state-dependent / time- or cov-dependent
                # bolus mapping: the kernel computes the reference's
                # RHS-difference (ode/mod.rs:644-687) IN-KERNEL at each
                # dose boundary (two traced RHS calls) instead of riding
                # precomputed per-unit increment rows — exact for any
                # mapping the lane shims can trace
                bolus_rhs_diff = True
            if not np.all(np.isfinite(d_ref)):
                raise PharmsolError(
                    "engine='pallas' ODE bolus probe produced non-finite "
                    "values"
                )
            bmaps.append(d_ref.T)  # [n_states, S]
        bolus_map = (np.stack(bmaps, axis=0)
                     if not bolus_rhs_diff else None)  # [nb, n_states, S]
        self.bolus_rhs_diff = bolus_rhs_diff

        if opts.solver == "expm":
            # The in-kernel expm march trusts the RHS to be affine in the
            # state and autonomous within segments (the XLA expm path
            # verifies this AT RUNTIME with in-jit probes + NaN poisoning,
            # engine/ode.py:725-776; here the same contracts are verified
            # once, host-side in f64, and violation falls back to the XLA
            # engine — which then poisons per its own semantics).
            def rhs_at(p, x, t, covd, rate_vec):
                z = jnp.zeros((ninput,), jnp.float64)
                shim = _RowCov(covd)
                return jnp.asarray(
                    diffeq(jnp.asarray(x, jnp.float64), p,
                           jnp.asarray(t, jnp.float64), z,
                           jnp.asarray(rate_vec, jnp.float64), shim),
                    jnp.float64,
                )

            x_zero = np.zeros(n_states)
            x_sum = x_a + x_b
            rate_probes = [np.zeros(ninput)]
            for j in rate_inputs:
                rv = np.zeros(ninput)
                rv[j] = 1.73
                rate_probes.append(rv)
            try:
                with _host_cpu_device():
                    for covd in (cov0, cov1):
                        for rv in rate_probes:
                            def ev(x, t, _c=covd, _r=rv):
                                return np.asarray(jax.vmap(
                                    lambda p: rhs_at(p, x, t, _c, _r))(
                                        jnp.asarray(sp, jnp.float64)),
                                    np.float64)

                            f0 = ev(x_zero, 0.11)
                            fa_p = ev(x_a, 0.11)
                            fb_p = ev(x_b, 0.11)
                            fab = ev(x_sum, 0.11)
                            pscale = 1.0 + np.abs(fa_p).max() \
                                + np.abs(fb_p).max()
                            if (np.abs(fab + f0 - fa_p - fb_p).max()
                                    > 1e-6 * pscale):
                                raise PharmsolError(
                                    "engine='pallas' expm psi requires an "
                                    "RHS AFFINE in the state (dx = A(p, "
                                    "cov) x + u); the superposition probe "
                                    "failed — use an adaptive solver or "
                                    "the default XLA engine"
                                )
                            fa_t = ev(x_a, 17.31)
                            if np.abs(fa_t - fa_p).max() > 1e-6 * pscale:
                                raise PharmsolError(
                                    "engine='pallas' expm psi requires an "
                                    "RHS autonomous within segments (no "
                                    "direct t reads) — use the default "
                                    "XLA engine"
                                )
            except PharmsolError:
                raise
            except Exception as e:
                raise PharmsolError(
                    f"engine='pallas' could not probe RHS affinity for "
                    f"expm: {e}"
                ) from e

        init_rows = None
        init_planes = None
        if equation._init is not None:
            init_fn = equation._init

            def init_at(p, covd):
                return jnp.asarray(
                    init_fn(p, jnp.asarray(0.0, jnp.float64), _RowCov(covd)),
                    jnp.float64,
                )

            try:
                with _host_cpu_device():
                    i_ref = np.asarray(jax.vmap(
                        lambda p: init_at(p, cov0))(
                            jnp.asarray(sp, jnp.float64)), np.float64)
                    i_cov = np.asarray(jax.vmap(
                        lambda p: init_at(p, cov1))(
                            jnp.asarray(sp, jnp.float64)), np.float64)
            except PharmsolError:
                raise
            except Exception as e:
                raise PharmsolError(
                    f"engine='pallas' could not probe the ODE init "
                    f"equation: {e}"
                ) from e
            iscale = np.maximum(np.abs(i_ref).max(), 1e-12)
            if np.abs(i_cov - i_ref).max() > 1e-6 * iscale:
                # covariate-dependent init: evaluate it exactly once per
                # (row, support) pair on the host probe backend and ride
                # per-state [R, S] planes into the kernel (the init is
                # applied at t=0 with the covariate's t=0 value —
                # engine/sim.py:147-152 semantics)
                cov_at0 = _covariate_values_at(grid, 0.0)
                names = tuple(grid.cov_names)
                cov_mat = np.stack(
                    [np.asarray(cov_at0[n], np.float64) for n in names],
                    axis=1,
                )  # [R, ncov]

                def init_row(p, cv):
                    covd = {n: cv[i] for i, n in enumerate(names)}
                    return init_at(p, covd)

                try:
                    with _host_cpu_device():
                        pl_ = np.asarray(
                            jax.vmap(lambda cv: jax.vmap(
                                lambda p: init_row(p, cv))(
                                    jnp.asarray(sp, jnp.float64)))(
                                jnp.asarray(cov_mat, jnp.float64)),
                            np.float64,
                        )  # [R, S, n_states]
                except PharmsolError:
                    raise
                except Exception as e:
                    raise PharmsolError(
                        f"engine='pallas' could not evaluate the "
                        f"covariate-dependent ODE init per row: {e}"
                    ) from e
                if pl_.shape != (cov_mat.shape[0], sp.shape[0], n_states):
                    raise PharmsolError(
                        f"engine='pallas' init equation must return "
                        f"[{n_states}] states"
                    )
                if not np.all(np.isfinite(pl_)):
                    raise PharmsolError(
                        "engine='pallas' covariate-dependent init "
                        "evaluation produced non-finite values"
                    )
                init_planes = np.transpose(pl_, (2, 0, 1))  # [n, R, S]
            else:
                init_rows = i_ref.T  # [n_states, S]

        # lane-RHS compatibility: trace once with 2-D lane shapes; RHS
        # styles the LaneVec shim cannot carry (``jnp.zeros_like(x)``,
        # ``.at`` updates, whole-vector arithmetic) retry with the
        # stacked-ARRAY representation (make_stacked_rhs) before any
        # fallback — closing the last ODE-tier model-class exclusion
        from ...ops.pallas_ode import make_stacked_rhs

        self.rhs_style = "lanes"
        rhs = make_lane_rhs(diffeq, n_states, n_params, ninput)

        def lane_probe():
            shape = (2, 2)
            z = jnp.zeros((2, 1), jnp.float64)
            xs = [jnp.zeros(shape, jnp.float64) for _ in range(n_states)]
            p_lanes = [jnp.zeros((1, 2), jnp.float64) for _ in range(n_params)]
            covd = {
                n: ((z, z) if m == "affine" else z)
                for n, m in zip(self.cov_names, self.cov_modes)
            }
            b_lanes = ({j: z for j in bolus_inputs}
                       if bolus_rhs_diff else None)
            return rhs(xs, p_lanes, jnp.zeros(shape, jnp.float64),
                       z, covd, shape, jnp.float64, b_lanes)

        try:
            jax.eval_shape(lane_probe)
        except PharmsolError:
            raise
        except Exception:
            # retry with real stacked arrays (vector-style RHS code)
            self.rhs_style = "stacked"
            rhs = make_stacked_rhs(diffeq, n_states, n_params, ninput)
            try:
                jax.eval_shape(lane_probe)
            except PharmsolError:
                raise
            except Exception as e:
                raise PharmsolError(
                    f"engine='pallas' ODE psi could not trace the RHS "
                    f"with lane shims or stacked arrays (avoid "
                    f"data-dependent indexing of the state): {e}"
                ) from e
            if jax.devices()[0].platform == "tpu":
                # a style can TRACE through stacked arrays yet use a
                # primitive Mosaic cannot lower (e.g. `.at[i].set` ->
                # scatter). Probe-lower the RHS in a trivial kernel
                # client-side so unsupported styles fall back at PLAN
                # time instead of crashing the compiled psi at runtime.
                from jax.experimental import pallas as pl

                shape32 = (8, 128)

                def _probe_kernel(o_ref):
                    xs32 = [jnp.full(shape32, 0.5, jnp.float32)
                            for _ in range(n_states)]
                    p32 = [jnp.full((1, 128), 0.3, jnp.float32)
                           for _ in range(n_params)]
                    z32 = jnp.zeros((1, 128), jnp.float32)
                    covd32 = {
                        n: ((z32, z32) if m == "affine" else z32)
                        for n, m in zip(self.cov_names, self.cov_modes)
                    }
                    b32 = ({j: z32 for j in bolus_inputs}
                           if bolus_rhs_diff else None)
                    out32 = rhs(xs32, p32,
                                jnp.full(shape32, 0.1, jnp.float32),
                                z32, covd32, shape32, jnp.float32, b32)
                    acc = out32[0]
                    for c in out32[1:]:
                        acc = acc + c
                    o_ref[:, :] = acc

                try:
                    jax.jit(lambda: pl.pallas_call(
                        _probe_kernel,
                        out_shape=jax.ShapeDtypeStruct(
                            shape32, jnp.float32),
                    )()).lower()
                except PharmsolError:
                    raise
                except Exception as e:
                    raise PharmsolError(
                        f"engine='pallas' ODE psi: this RHS style uses "
                        f"a primitive the TPU kernel compiler cannot "
                        f"lower (e.g. `.at` scatter updates on the "
                        f"state) — build dx via jnp.stack or "
                        f"whole-vector arithmetic, or use the default "
                        f"XLA engine: {e}"
                    ) from e

        if grid.cov_names and equation._out is not None:
            _check_out_covariate_free(
                equation, sp, cov_values, n_states, CovView
            )

        # --- streams ------------------------------------------------------
        try:
            streams = streams_from_grid(grid.rows, lowered, inputs=ninput)
        except ValueError as e:
            raise PharmsolError(f"engine='pallas' ODE psi: {e}") from e
        # split the per-input stacks onto one stream per ACTIVE input
        seg_bolus3 = np.asarray(streams[1], np.float64)  # [R, M, ninput]
        seg_rate3 = np.asarray(streams[2], np.float64)
        streams = (
            [streams[0]]
            + [seg_bolus3[..., j] for j in bolus_inputs]
            + [seg_rate3[..., j] for j in rate_inputs]
            + list(streams[3:])
        )
        self.n_bolus_in = len(bolus_inputs)
        self.n_rate_in = len(rate_inputs)
        _, t_sorted, _, _ = segment_schedule(grid.rows)
        real = t_sorted < BIG_TIME / 2
        t_real_max = np.max(np.where(real, t_sorted, -np.inf), axis=1)
        t_real_max = np.where(np.isfinite(t_real_max), t_real_max, 0.0)
        seg_t0 = np.minimum(t_sorted, t_real_max[:, None])

        # --- lag/fa planes ------------------------------------------------
        # one pending-dose slot per (lane, bolus input); multi-drug
        # regimens with lag compose (no-overlap validated per input
        # against that input's own inter-dose gaps). Constant path: one
        # [R, S] plane per input (closure time-independent, no tv-cov
        # reads). Dynamic path (time-dependent closures or closures that
        # READ a time-varying covariate): exact per-DOSE-SEGMENT planes,
        # evaluated host-side with the engine's CovView at each bolus's
        # original breakpoint time (lag, structs.rs:629) / lag-shifted
        # time (fa, engine/grid.py:502-512), selected statically by the
        # kernel via (input, segment) -> plane-slot tables.
        lag_planes = None
        fa_planes = None
        lag_slots = None
        fa_slots = None
        sel = list(bolus_inputs)
        nb_ = len(bolus_inputs)
        M_ = streams[0].shape[1]
        dynamic = False
        if equation._lag is not None or equation._fa is not None:
            try:
                if equation._lag is not None:
                    lp = _decompose_input_planes(
                        equation._lag, sp, grid, ninput, 0.0, "lag")[sel]
                    if np.any(lp != 0.0):
                        for k, j in enumerate(bolus_inputs):
                            if np.any(lp[k] != 0.0):
                                _validate_lag_no_overlap(
                                    lp[k], grid, input_j=j)
                        lag_planes = lp
                if equation._fa is not None:
                    fp = _decompose_input_planes(
                        equation._fa, sp, grid, ninput, 1.0, "fa")[sel]
                    if not np.all(fp == 1.0):
                        fa_planes = fp
            except _InputPlaneDynamic:
                dynamic = True
        if dynamic:
            lag_planes = fa_planes = None
            dose_cols = [
                m for m in range(M_)
                if any(np.any(np.asarray(streams[1 + k],
                                         np.float64)[:, m] != 0.0)
                       for k in range(nb_))
            ]
            seg_pl = _decompose_input_seg_planes(
                equation, sp, grid, ninput, dose_cols, seg_t0
            )
            has_lag_dyn = equation._lag is not None and any(
                np.any(seg_pl[m][0][sel] != 0.0) for m in dose_cols
            )
            has_fa_dyn = equation._fa is not None and any(
                not np.all(seg_pl[m][1][sel] == 1.0) for m in dose_cols
            )
            if has_lag_dyn:
                # pairwise no-overlap per input: each dose's lag (max over
                # supports) must elapse before the SAME input's next dose
                for k, j in enumerate(bolus_inputs):
                    bstream = np.asarray(streams[1 + k], np.float64)
                    for r in range(bstream.shape[0]):
                        cols = [m for m in dose_cols
                                if bstream[r, m] != 0.0]
                        cols.sort(key=lambda m: seg_t0[r, m])
                        for m1, m2 in zip(cols, cols[1:]):
                            gap = seg_t0[r, m2] - seg_t0[r, m1]
                            lag_max = seg_pl[m1][0][j, r, :].max()
                            # strict: lag == gap clobbers the pend slot
                            if lag_max >= gap:
                                raise PharmsolError(
                                    f"engine='pallas' lag support "
                                    f"requires each dose's lag to elapse "
                                    f"strictly before the input's next "
                                    f"dose (row {r}, input {j}: max lag "
                                    f"{lag_max:.4g} >= gap {gap:.4g}) — "
                                    "use the default XLA engine"
                                )
            lag_seg_list = []
            fa_seg_list = []
            if has_lag_dyn:
                lag_slot_rows = [[-1] * M_ for _ in range(nb_)]
                for m in dose_cols:
                    for k in range(nb_):
                        lag_slot_rows[k][m] = len(lag_seg_list)
                        lag_seg_list.append(seg_pl[m][0][sel][k])
                lag_slots = tuple(tuple(rw) for rw in lag_slot_rows)
                lag_planes = np.stack(lag_seg_list)
            if has_fa_dyn:
                fa_slot_rows = [[-1] * M_ for _ in range(nb_)]
                for m in dose_cols:
                    for k in range(nb_):
                        fa_slot_rows[k][m] = len(fa_seg_list)
                        fa_seg_list.append(seg_pl[m][1][sel][k])
                fa_slots = tuple(tuple(rw) for rw in fa_slot_rows)
                fa_planes = np.stack(fa_seg_list)
        self.lag_slots = lag_slots
        self.fa_slots = fa_slots

        self.R = streams[0].shape[0]
        self.S = sp.shape[0]
        self.M = streams[0].shape[1]
        self.Rp = ((self.R + row_multiple - 1) // row_multiple) * row_multiple
        self.Sp = ((self.S + SP_TILE - 1) // SP_TILE) * SP_TILE
        fd = float_dtype()
        if jax.devices()[0].platform == "tpu":
            fd = jnp.float32
        self.fd = fd

        def pad_rows(a):
            a = np.asarray(a, dtype=np.float64)
            if self.Rp == self.R:
                return a
            return np.concatenate(
                [a, np.zeros((self.Rp - self.R, a.shape[1]), dtype=a.dtype)],
                axis=0,
            )

        self.padded = [jnp.asarray(pad_rows(a), dtype=fd) for a in streams]
        self.seg_t0 = jnp.asarray(pad_rows(seg_t0), dtype=fd)
        im = np.asarray(grid.rows.init_mask, np.float64).reshape(-1)
        init_mask_rm = np.zeros((self.R, self.M))
        init_mask_rm[:, 0] = im
        self.init_mask = (
            jnp.asarray(pad_rows(init_mask_rm), dtype=fd)
            if (init_rows is not None or init_planes is not None) else None
        )
        affine_streams = (
            _affine_covariate_streams(
                grid, sorted(varying_covs), seg_t0, np.asarray(streams[0])
            ) if varying_covs else {}
        )
        if opts.solver == "expm":
            # expm is exact only for an autonomous in-segment RHS; a
            # covariate that interpolates LINEARLY with a nonzero slope
            # makes it time-dependent (carry-forward / piecewise-constant
            # covariates ride affine streams with b == 0 and stay exact)
            for name, (_a_s, b_s) in affine_streams.items():
                if np.any(np.asarray(b_s, np.float64) != 0.0):
                    raise PharmsolError(
                        f"engine='pallas' expm psi requires covariates "
                        f"constant within segments; `{name}` interpolates "
                        f"linearly with a nonzero slope — use an adaptive "
                        f"solver or the default XLA engine"
                    )
        self.cov_streams = {}
        for name in self.cov_names:
            if name in affine_streams:
                a, b = affine_streams[name]
                self.cov_streams[name] = (
                    jnp.asarray(pad_rows(a), dtype=fd),
                    jnp.asarray(pad_rows(b), dtype=fd),
                )
            else:
                vs = np.zeros((self.R, self.M))
                vs[:, 0] = np.asarray(cov_values[name], np.float64)
                self.cov_streams[name] = jnp.asarray(pad_rows(vs), dtype=fd)

        def pad_support(a):
            if self.Sp == self.S:
                return a
            return np.concatenate(
                [a, np.repeat(a[..., -1:], self.Sp - self.S, axis=-1)],
                axis=-1,
            )

        sp_padded = (
            np.concatenate(
                [sp, np.repeat(sp[-1:], self.Sp - self.S, axis=0)], axis=0
            ) if self.Sp != self.S else sp
        )
        self.sp_dev = jnp.asarray(sp_padded, dtype=fd)
        self.bolus_map = (
            jnp.asarray(pad_support(bolus_map), dtype=fd)
            if bolus_map is not None else None
        )
        self.init_rows = (
            jnp.asarray(pad_support(init_rows), dtype=fd)
            if init_rows is not None else None
        )

        def pad_plane(a, fill):
            a = np.asarray(a, np.float64)
            if self.Rp != self.R:
                a = np.concatenate(
                    [a, np.full((self.Rp - self.R, a.shape[1]), fill)],
                    axis=0,
                )
            if self.Sp != self.S:
                a = np.concatenate(
                    [a, np.repeat(a[:, -1:], self.Sp - self.S, axis=1)],
                    axis=1,
                )
            return jnp.asarray(a, dtype=fd)

        self.lag_planes_dev = (
            tuple(pad_plane(lag_planes[k], 0.0)
                  for k in range(len(lag_planes)))
            if lag_planes is not None else None
        )
        self.fa_planes_dev = (
            tuple(pad_plane(fa_planes[k], 1.0)
                  for k in range(len(fa_planes)))
            if fa_planes is not None else None
        )
        self.init_planes_dev = (
            jnp.stack([pad_plane(init_planes[s], 0.0)
                       for s in range(n_states)])
            if init_planes is not None else None
        )
        out_fn = equation._out or (lambda x, p, t, cov: x[: self.n_out])
        occ0 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a)[0]), grid.rows
        )
        cov = CovView(
            occ0.cov_t.astype(fd), occ0.cov_v.astype(fd), occ0.cov_fixed,
            tuple(grid.cov_names),
        )
        try:
            C, b = extract_linear_out(
                out_fn, sp_padded, n_states, self.n_out, cov, fd
            )
        except PharmsolError:
            raise
        except Exception as e:
            raise PharmsolError(
                f"engine='pallas' ODE psi could not extract linear output "
                f"coefficients (non-linear output?): {e}"
            ) from e
        self.out_coef = jnp.asarray(np.transpose(C, (1, 2, 0)), dtype=fd)
        self.out_bias = jnp.asarray(b.T, dtype=fd) if np.any(b) else None
        self.pass_inf = bool(np.any(seg_rate3))
        i_cens = 1 + self.n_bolus_in + self.n_rate_in + 3
        self.pass_cens = bool(np.any(streams[i_cens]))
        self.pass_outeq = self.n_out > 1

        # --- merged-march spans --------------------------------------------
        # breakpoints that are observation-only on EVERY row (no dose, rate
        # and covariate streams unchanged, contiguous segment times) need
        # not stop the adaptive march: the kernel crosses them and captures
        # the observation from the solver's dense-output interpolant
        # (ops/pallas_ode.py). Proven here on the host-side numpy streams;
        # each extra interior obs costs one carry lane, so spans are capped.
        self.merge_runs = _ode_merge_runs(
            streams, seg_t0, opts.solver,
            n_bolus_in=self.n_bolus_in, n_rate_in=self.n_rate_in,
            affine_streams=affine_streams, has_lag=lag_planes is not None,
        )

    def cache_key(self, *extra):
        o = self.opts
        return ("pallas_ode", self.n_states, self.n_params, self.ninput,
                self.bolus_inputs, self.rate_inputs, self.bolus_rhs_diff,
                self.rhs_style,
                self.Rp,
                self.Sp, self.M, self.pass_inf, self.pass_cens,
                self.pass_outeq, self.n_out, self.out_bias is not None,
                self.init_rows is not None,
                self.init_planes_dev is not None,
                self.cov_names, self.cov_modes,
                self.lag_planes_dev is not None,
                self.fa_planes_dev is not None,
                self.lag_slots, self.fa_slots,
                o.solver, self.merge_runs,
                o.rtol, o.atol, o.h0, o.max_steps, str(self.fd)) + extra

    def stream_args(self):
        p = self.padded
        include = ([True] + [True] * self.n_bolus_in
                   + [self.pass_inf] * self.n_rate_in
                   + [True, True, True, self.pass_cens, self.pass_outeq])
        out = tuple(a for a, inc in zip(p, include) if inc)
        out = out + (self.seg_t0,)
        if self.init_mask is not None:
            out = out + (self.init_mask,)
        for n in self.cov_names:
            e = self.cov_streams[n]
            out = out + (e if isinstance(e, tuple) else (e,))
        for planes in (self.lag_planes_dev, self.fa_planes_dev):
            if planes is not None:
                out = out + tuple(planes)
        if self.init_planes_dev is not None:
            # one [Rp, Sp] plane per state (rows leading for sharding)
            out = out + tuple(
                self.init_planes_dev[s]
                for s in range(self.init_planes_dev.shape[0])
            )
        return out

    def rep_args(self):
        out = [self.sp_dev]
        if self.bolus_map is not None:
            out.append(self.bolus_map)
        if self.init_rows is not None:
            out.append(self.init_rows)
        out.append(self.out_coef)
        if self.out_bias is not None:
            out.append(self.out_bias)
        return tuple(out)

    def runner(self):
        from ...ops.pallas_ode import psi_ode

        o = self.opts
        n_states = self.n_states
        ninput = self.ninput
        diffeq = self.diffeq
        pass_inf, pass_cens = self.pass_inf, self.pass_cens
        pass_outeq = self.pass_outeq
        n_init_planes = (int(self.init_planes_dev.shape[0])
                         if self.init_planes_dev is not None else 0)
        has_init_rows = self.init_rows is not None
        has_init = has_init_rows or n_init_planes > 0
        has_bias = self.out_bias is not None
        cov_names = self.cov_names
        cov_modes = self.cov_modes
        pass_lag = self.lag_planes_dev is not None
        pass_fa = self.fa_planes_dev is not None
        n_lag_pl = len(self.lag_planes_dev) if pass_lag else 0
        n_fa_pl = len(self.fa_planes_dev) if pass_fa else 0
        lag_slots, fa_slots = self.lag_slots, self.fa_slots
        merge_runs = self.merge_runs
        nb, nr = self.n_bolus_in, self.n_rate_in
        bolus_inputs, rate_inputs = self.bolus_inputs, self.rate_inputs
        bolus_rhs_diff = self.bolus_rhs_diff
        rhs_style = self.rhs_style
        n_streams = (5 + nb + (nr if pass_inf else 0)
                     + int(pass_cens) + int(pass_outeq)
                     + int(has_init) + n_lag_pl + n_fa_pl
                     + n_init_planes
                     + sum(2 if m == "affine" else 1 for m in cov_modes))
        # ODEOptions.unroll amortizes XLA's per-while-iteration dispatch;
        # inside the pallas kernel there is no dispatch to amortize and
        # every extra unrolled trial is wasted work on lanes that just
        # finished — 1 is measurably best (same-session A/B)
        unroll = 1

        def run(*args):
            it = iter(args[:n_streams])
            dt = next(it)
            bols = [next(it) for _ in range(nb)]
            infs = [next(it) for _ in range(nr)] if pass_inf else None
            mask, val, sig = next(it), next(it), next(it)
            cens = next(it) if pass_cens else None
            outeq = next(it) if pass_outeq else None
            t0 = next(it)
            imask = next(it) if has_init else None
            covs = {
                n: ((next(it), next(it)) if m == "affine" else next(it))
                for n, m in zip(cov_names, cov_modes)
            }
            lagp = (tuple(next(it) for _ in range(n_lag_pl))
                    if pass_lag else None)
            fap = (tuple(next(it) for _ in range(n_fa_pl))
                   if pass_fa else None)
            ipl = (jnp.stack([next(it) for _ in range(n_init_planes)])
                   if n_init_planes else None)
            rep = iter(args[n_streams:])
            sp_dev = next(rep)
            bmap = None if bolus_rhs_diff else next(rep)
            irows = next(rep) if has_init_rows else None
            coef = next(rep)
            bias = next(rep) if has_bias else None
            bol = bols[0] if nb == 1 else jnp.stack(bols, axis=-1)
            inf = (None if infs is None
                   else infs[0] if nr == 1 else jnp.stack(infs, axis=-1))
            return psi_ode(
                dt, bol, inf, mask, val, sig, cens, t0, sp_dev, diffeq,
                n_states=n_states, ninput=ninput, solver=o.solver,
                rtol=o.rtol, atol=o.atol,
                h0=o.h0, max_iters=o.max_steps, unroll=unroll,
                newton_iters=o.newton_iters,
                obs_outeq=outeq, out_coef=coef, out_bias=bias,
                bolus_map=bmap, bolus_rhs_diff=bolus_rhs_diff,
                init_rows=irows, init_planes=ipl,
                init_mask=imask,
                cov_streams=covs, cov_names=cov_names,
                lag_plane=lagp, fa_plane=fap,
                lag_slots=lag_slots, fa_slots=fa_slots,
                bolus_inputs=bolus_inputs, rate_inputs=rate_inputs,
                merge_runs=merge_runs, rhs_style=rhs_style,
            )

        run.n_streams = n_streams
        return run

    def finalize(self, psi_rows, grid) -> np.ndarray:
        psi_rows = np.asarray(psi_rows, dtype=np.float64)[: self.R, : self.S]
        psi = np.zeros((grid.n_subjects, self.S), dtype=np.float64)
        np.add.at(psi, np.asarray(grid.row_subject), psi_rows)
        return psi
