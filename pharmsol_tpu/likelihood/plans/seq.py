"""Seq-equation decomposition tiers for the fused analytical psi plan.

The eight tiers that turn secondary-equation structure into kernel
streams/planes: multiplicative (`_decompose_seq`), time-varying
per-segment (`_decompose_seq_tv`), chain-depth level tables
(`_decompose_seq_levels`), per-(row, support) parameter planes
(`_decompose_seq_planes`), segment-indexed planes
(`_decompose_seq_segplanes`), per-column main/post planes for lag +
tv-seq (`_decompose_seq_colplanes`) and the dynamic-lag column walk.
Split from plans/decompose.py in round 5 as pure code movement (the
covariate/input-plane machinery it builds on stays there).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...config import float_dtype
from ...errors import PharmsolError
from .decompose import (
    _RowCov,
    _affine_solve,
    _classify_covariates,
    _constant_covariate_values,
    _decompose_input_seg_planes,
    _host_cpu_device,
)

def _decompose_seq(seq, sp, cov_values: dict, n_kernel_params: int,
                   n_rows_total: int = 1):
    """Validate + decompose a seq equation into per-row affine factors.

    Probes (all numeric, evaluated once on the host):
    - time-independence: seq(p, t, cov) must not depend on t;
    - diagonal-affine form: ``seq[i] = p[i] * g_i(cov) + h_i(cov)`` —
      solved from two parameter probes and validated at a third (covers
      the multiplicative covariate-scaling standard form AND additive
      effects; cross-parameter mixing fails the validation probe).

    Returns (mult [R, k], offset [R, k] | None — None when the offsets are
    identically zero, i.e. purely multiplicative); raises PharmsolError
    when the seq equation does not fit (fall back to engine='xla').
    """
    from ...config import float_dtype

    fd = float_dtype()
    # probe tolerance tracks the working precision (f32 on TPU)
    tol = 1e-9 if np.dtype(fd) == np.float64 else 1e-5
    n_rows = len(next(iter(cov_values.values()))) if cov_values else n_rows_total
    p_ref = np.where(np.abs(sp[0]) > 1e-30, sp[0], 1.0)
    p_alt = p_ref * 1.37 + 0.011
    if np.any(np.abs(p_ref - p_alt) < 1e-9):
        p_alt = p_ref * 1.61 + 0.173
    p_val = p_ref * 0.73 + 0.311

    def eval_rows(p, t):
        p = jnp.asarray(p, dtype=fd)
        t = jnp.asarray(t, dtype=fd)
        if cov_values:
            stacked = jnp.stack(
                [jnp.asarray(v, dtype=fd) for v in cov_values.values()],
                axis=1,
            )  # [R, C]
            names = list(cov_values.keys())

            def one(row):
                shim = _RowCov({n: row[i] for i, n in enumerate(names)})
                return jnp.asarray(seq(p, t, shim), dtype=fd)

            return np.asarray(jax.vmap(one)(stacked), dtype=np.float64)
        out = np.asarray(seq(p, t, _RowCov({})), dtype=np.float64)
        return np.broadcast_to(out[None, :], (n_rows, out.shape[0])).copy()

    try:
        with _host_cpu_device():
            out_ref = eval_rows(p_ref, 0.0)
            out_t = eval_rows(p_ref, 123.456)
            out_alt = eval_rows(p_alt, 0.0)
            out_val = eval_rows(p_val, 0.0)
    except PharmsolError:
        raise
    except Exception as e:
        raise PharmsolError(
            f"engine='pallas' could not probe the seq equation: {e}"
        ) from e
    if not np.allclose(out_ref, out_t, rtol=tol, atol=tol):
        raise PharmsolError(
            "engine='pallas' requires a time-independent seq equation "
            "(this one changes with t; use the default XLA engine)"
        )
    k = n_kernel_params
    solved = _affine_solve(
        out_ref[:, :k], out_alt[:, :k], out_val[:, :k],
        p_ref[None, :k], p_alt[None, :k], p_val[None, :k], tol,
    )
    if solved is None:
        raise PharmsolError(
            "engine='pallas' requires diagonal-affine covariate effects "
            "(seq[i] = p[i] * g_i(cov) + h_i(cov)); this seq equation "
            "mixes parameters or is nonlinear — use the default XLA engine"
        )
    g, h = solved
    if np.allclose(h, 0.0, atol=tol * 10):
        return np.ascontiguousarray(g), None
    return np.ascontiguousarray(g), np.ascontiguousarray(h)


def _decompose_seq_tv(seq, sp, grid, n_kernel_params: int):
    """Per-row, per-SEGMENT diagonal-affine seq decomposition.

    Generalizes :func:`_decompose_seq` two ways, both required for engine
    parity (sim.step, engine/sim.py):

    - the affine factors are evaluated at each segment's END time (the
      engine evaluates seq at ``t + dt``) with the row's covariates
      interpolated at that time — this carries time-VARYING covariates;
    - the engine's reset/carry chain is baked in: seq parameters reset to
      the raw support point at real events but compound across
      infusion-end sub-splits (grid.build_segments is_event semantics,
      analytical/mod.rs:331,360) — applying a single per-row multiplier to
      rows containing infusions was measurably wrong (0.17 in log-lik).

    Per segment m: ``seq[i] = p[i] * g_i(m) + h_i(m)`` solved from two
    parameter probes, validated at a third on sample segments; the chain
    composes affinely (``g_m*(g_prev p + h_prev) + h_m``). Returns
    (mult_seg [R, P, M], offset_seg [R, P, M] | None).
    """
    from ...config import float_dtype
    from ...ops.pallas_psi import segment_schedule

    fd = float_dtype()
    tol = 1e-9 if np.dtype(fd) == np.float64 else 1e-5
    order, t_sorted, seg_dt, is_event = segment_schedule(grid.rows)
    R, M = t_sorted.shape
    k = n_kernel_params
    p_ref = np.where(np.abs(sp[0]) > 1e-30, sp[0], 1.0)
    p_alt = p_ref * 1.37 + 0.011
    if np.any(np.abs(p_ref - p_alt) < 1e-9):
        p_alt = p_ref * 1.61 + 0.173
    p_val = p_ref * 0.73 + 0.311

    # padded breakpoints sit at BIG_TIME; clamp their evaluation time to the
    # row's last real breakpoint so seq closures reading t stay finite
    from ...config import BIG_TIME

    real = t_sorted < BIG_TIME / 2
    t_real_max = np.max(np.where(real, t_sorted, -np.inf), axis=1)
    t_real_max = np.where(np.isfinite(t_real_max), t_real_max, 0.0)
    te = np.minimum(t_sorted + seg_dt, t_real_max[:, None])  # [R, M]

    names = list(grid.cov_names)
    # evaluate through each row's REAL CovView (not a fixed-value shim) so
    # closures that read a covariate at a time OTHER than the t they are
    # handed — e.g. a baseline read cov("wt", 0.0) against a time-varying
    # wt — see exactly what the engine's view returns
    from ...engine.grid import CovView

    kt_r = np.asarray(grid.rows.cov_t, np.float64)
    kv_r = np.asarray(grid.rows.cov_v, np.float64)
    fx_r = np.asarray(grid.rows.cov_fixed)
    if fx_r.ndim == 1 and kt_r.ndim == 3:
        fx_r = np.broadcast_to(fx_r[None, :], kt_r.shape[:2])
    if not names:
        kt_r = np.zeros((R, 0, 1), np.float64)
        kv_r = np.zeros((R, 0, 1), np.float64)
        fx_r = np.zeros((R, 0), bool)
    kt_j = jnp.asarray(kt_r, dtype=fd)
    kv_j = jnp.asarray(kv_r, dtype=fd)
    fx_j = jnp.asarray(fx_r)

    def values_at(p, m):
        p_j = jnp.asarray(p, dtype=fd)
        t_j = jnp.asarray(te[:, m], dtype=fd)

        def one(ct, cv, cf, t_r):
            view = CovView(ct, cv, cf, names)
            return jnp.asarray(seq(p_j, t_r, view), dtype=fd)

        out = np.asarray(jax.vmap(one)(kt_j, kv_j, fx_j, t_j),
                         dtype=np.float64)
        if out.shape[1] != sp.shape[1]:
            # the engine scan carries the seq output as the next p_base
            # (engine/sim.py step), so exact support width is the contract
            raise PharmsolError(
                "engine='pallas' seq must return exactly the support "
                "width — use the default XLA engine"
            )
        return out[:, :k]

    sample = {0, M // 2, M - 1}
    try:
        with _host_cpu_device():
            f_ref = np.stack([values_at(p_ref, m) for m in range(M)], axis=2)
            f_alt = np.stack([values_at(p_alt, m) for m in range(M)], axis=2)
            f_vals = {m: values_at(p_val, m) for m in sample}
    except PharmsolError:
        raise
    except Exception as e:
        raise PharmsolError(
            f"engine='pallas' could not probe the seq equation: {e}"
        ) from e

    denom = (p_ref - p_alt)[None, :k, None]
    g = (f_ref - f_alt) / denom  # [R, k, M]
    h = f_ref - g * p_ref[None, :k, None]
    for m in sample:
        pred = g[:, :, m] * p_val[None, :k] + h[:, :, m]
        scale = np.maximum(np.abs(f_vals[m]), 1.0)
        if not (np.all(np.isfinite(pred))
                and np.all(np.abs(pred - f_vals[m]) <= tol * 100 * scale)):
            raise PharmsolError(
                "engine='pallas' requires diagonal-affine covariate "
                "effects (seq[i] = p[i] * g_i(t, cov) + h_i(t, cov)); "
                "this seq equation mixes parameters or is nonlinear — "
                "use the default XLA engine"
            )
    if not (np.all(np.isfinite(g)) and np.all(np.isfinite(h))):
        raise PharmsolError(
            "engine='pallas' seq decomposition produced non-finite "
            "factors — use the default XLA engine"
        )

    # engine reset/carry chain: p_base = raw at events else carried;
    # p_seg = affine_m(p_base) on spanned segments, p_base otherwise
    mult = np.empty_like(g)
    off = np.empty_like(h)
    prev_g = np.ones((R, k))
    prev_h = np.zeros((R, k))
    for m in range(M):
        ev = is_event[:, m][:, None]
        base_g = np.where(ev, 1.0, prev_g)
        base_h = np.where(ev, 0.0, prev_h)
        span = seg_dt[:, m][:, None] > 0
        cur_g = np.where(span, g[:, :, m] * base_g, base_g)
        cur_h = np.where(span, g[:, :, m] * base_h + h[:, :, m], base_h)
        mult[:, :, m] = cur_g
        off[:, :, m] = cur_h
        prev_g, prev_h = cur_g, cur_h
    tol_h = 1e-9 if np.dtype(fd) == np.float64 else 1e-5
    if np.allclose(off, 0.0, atol=tol_h * 10):
        return np.ascontiguousarray(mult), None
    return np.ascontiguousarray(mult), np.ascontiguousarray(off)


_MAX_SEQ_LEVELS = 8
# param-plane mode materializes [L, n_base, R, S] float64 host-side; cap it
# so a pathological population can't swallow host memory (fall back to XLA)
_MAX_PLANE_FLOATS = 1 << 27  # 128M doubles = 1 GiB host / 512 MiB device f32


def _seq_depth_stream(grid, lag_mode: bool = False):
    """Chain depth per (row, segment) from the engine's reset/carry rule.

    ``p_base`` resets to the raw support point at real events and carries
    across infusion-end sub-splits; spanned segments apply seq once more
    (engine/sim.py step, analytical/mod.rs:331,360). Returns
    (depth [R, M] 1-based / 0 on dead segments, L = max depth >= 1).

    ``lag_mode=True`` (lag + seq chain depth > 1): a lag-shifted bolus
    moves its seq-reset breakpoint to the per-(row, support) fire time, so
    a host-side depth stream cannot exist. Instead return
    (evcode [R, M], L): per-column event codes 1 = reset boundary
    (observation / infusion-start — these never move), 2 = infusion-end
    sub-split (compound), 0 = bolus column (a PHANTOM split under lag: the
    engine's segment continues through it with unchanged parameters) or
    dead/padding. The kernel replays the engine's reset/carry recurrence
    on these codes with an in-kernel depth counter and resets at each
    per-lane dose fire. L is the no-fire upper bound on the counter —
    exact when no dose fires, and fires only ever RESET the chain (to
    depth 1), so no lane can exceed it.
    """
    from ...config import BIG_TIME
    from ...ops.pallas_psi import segment_schedule

    if not lag_mode:
        _, t_sorted, seg_dt, is_event = segment_schedule(grid.rows)
        R, M = t_sorted.shape
        depth = np.zeros((R, M), dtype=np.float64)
        d_cur = np.zeros(R, dtype=np.int64)
        for m in range(M):
            base = np.where(is_event[:, m], 0, d_cur)
            span = seg_dt[:, m] > 0
            d_seg = np.where(span, base + 1, base)
            depth[:, m] = np.where(span, d_seg, 0)
            d_cur = d_seg
        L = int(depth.max())
        if L == 0:
            L = 1  # no spanned segments: one trivial level keeps shapes valid
        if L > _MAX_SEQ_LEVELS:
            raise PharmsolError(
                f"engine='pallas' seq chain depth {L} exceeds "
                f"{_MAX_SEQ_LEVELS} — use the default XLA engine"
            )
        return depth, L

    _, t_sorted, seg_dt, _, rank = segment_schedule(grid.rows,
                                                    with_ranks=True)
    R, M = t_sorted.shape
    real = t_sorted < BIG_TIME / 2
    evcode = np.zeros((R, M), dtype=np.float64)
    evcode[real & ((rank == 1.0) | (rank == 3.0))] = 1.0  # obs / inf-start
    evcode[real & (rank == 0.0)] = 2.0  # infusion-end sub-split
    # a real zero-amount bolus is still a seq-reset event in the engine but
    # carries no dose the kernel's pending mechanism could fire (and reset)
    # on — reject rather than silently diverge
    b_t = np.asarray(grid.rows.bolus_t, np.float64)
    b_a = np.asarray(grid.rows.bolus_amt, np.float64)
    if np.any((b_t < BIG_TIME / 2) & (b_a == 0.0)):
        raise PharmsolError(
            "engine='pallas' lag with seq chain depth > 1 does not support "
            "zero-amount bolus records (their seq-reset breakpoint moves "
            "with the lag but no dose ever fires) — use the default XLA "
            "engine"
        )
    # no-fire upper-bound simulation of the in-kernel counter: fires only
    # reset the chain (depth 1 <= any applied depth), so never-firing doses
    # maximize every column's depth
    dc = np.zeros(R, dtype=np.int64)
    app = np.zeros(R, dtype=bool)
    max_d = 1
    for m in range(M):
        span = seg_dt[:, m] > 0
        code = evcode[:, m]
        dc = np.where(
            code == 1.0, np.where(span, 1, 0),
            np.where(code == 2.0, dc + span,
                     dc + (span & ~app)),
        )
        app = np.where(code == 1.0, span,
                       np.where(code == 2.0, span, app | span))
        max_d = max(max_d, int(np.where(span, dc, 0).max(initial=0)))
    if max_d > _MAX_SEQ_LEVELS:
        raise PharmsolError(
            f"engine='pallas' seq chain depth {max_d} (lag no-fire bound) "
            f"exceeds {_MAX_SEQ_LEVELS} — use the default XLA engine"
        )
    return evcode, max_d


def _decompose_seq_levels(seq, sp, grid, sdef, n_kernel_params: int,
                          lag_mode: bool = False):
    """Chain-depth level tables for covariate-free, time-independent seq.

    The engine evaluates ``p_seg = seq(p_base, t+dt, cov)`` per spanned
    segment with p_base resetting to the raw support point at real events
    and carrying across infusion-end sub-splits (analytical/mod.rs:331,360).
    When seq reads neither t nor covariates, ``p_seg = seq^d(p)`` where the
    chain depth d is a pure function of the ROW's event structure —
    computable host-side. This covers seq equations of ANY form (including
    non-separable parameter mixing) and every structure (3-cmt included:
    eigen prep runs per level).

    Returns (param_levels [L, n_base, S] in the structure's micro-constant
    parameterization, seg_depth [R, M] with 1-based level indices, 0 on
    dead segments). With ``lag_mode=True`` the second element is instead
    the evcode stream and L the no-fire depth bound (see
    :func:`_seq_depth_stream`) — the kernel then tracks depth in-kernel.
    """
    from ...config import float_dtype
    from ...ops.pallas_psi import segment_schedule

    fd = float_dtype()
    tol = 1e-9 if np.dtype(fd) == np.float64 else 1e-5
    p_ref = np.where(np.abs(sp[0]) > 1e-30, sp[0], 1.0)

    cov_values = _constant_covariate_values(grid) if grid.cov_names else {}
    cov0 = {n: float(np.asarray(v)[0]) for n, v in cov_values.items()}
    cov1 = {n: v * 1.31 + 0.17 for n, v in cov0.items()}

    def seq_once(p_rows, t, covd):
        def one(p):
            return jnp.asarray(seq(jnp.asarray(p, jnp.float64),
                                   jnp.asarray(t, jnp.float64),
                                   _RowCov(covd)), jnp.float64)
        return np.asarray(jax.vmap(one)(jnp.asarray(p_rows, jnp.float64)),
                          np.float64)

    try:
        with _host_cpu_device():
            f0 = seq_once(p_ref[None, :], 0.0, cov0)
            ft = seq_once(p_ref[None, :], 123.456, cov0)
            fc = seq_once(p_ref[None, :], 0.0, cov1)
    except PharmsolError:
        raise
    except Exception as e:
        raise PharmsolError(
            f"engine='pallas' could not probe the seq equation: {e}"
        ) from e
    scale = np.maximum(np.abs(f0).max(), 1.0)
    if np.abs(ft - f0).max() > tol * scale:
        raise PharmsolError(
            "engine='pallas' seq levels require a time-independent seq "
            "equation — use the default XLA engine"
        )
    if cov0 and np.abs(fc - f0).max() > tol * scale:
        raise PharmsolError(
            "engine='pallas' seq levels require a covariate-free seq "
            "equation — use the default XLA engine"
        )

    # chain depth per (row, segment) from the engine's reset/carry rule
    depth, L = _seq_depth_stream(grid, lag_mode)

    # iterated level tables on the full declared support width
    k = n_kernel_params
    remap = sdef["remap"]
    levels = []
    cur = np.asarray(sp, np.float64)
    try:
        with _host_cpu_device():
            for _ in range(L):
                cur = seq_once(cur, 0.0, cov0)
                if cur.shape[1] < sp.shape[1]:
                    raise PharmsolError(
                        "engine='pallas' seq returned fewer columns than "
                        "the support width — use the default XLA engine"
                    )
                rows = [cur[:, i] for i in range(k)]
                rows = remap(rows) if remap else rows
                levels.append(np.stack(rows, axis=0))  # [n_base, S]
    except PharmsolError:
        raise
    except Exception as e:
        raise PharmsolError(
            f"engine='pallas' could not iterate the seq equation: {e}"
        ) from e
    param_levels = np.stack(levels, axis=0)  # [L, n_base, S]
    if not np.all(np.isfinite(param_levels)):
        raise PharmsolError(
            "engine='pallas' seq level tables are non-finite — use the "
            "default XLA engine"
        )
    return np.ascontiguousarray(param_levels), np.ascontiguousarray(depth)


def _decompose_seq_planes(seq, sp, grid, sdef, n_kernel_params: int,
                          lag_mode: bool = False):
    """Per-(row, support) parameter planes for covariate-dependent seq.

    The exact generalization of :func:`_decompose_seq_levels` to seq
    equations that READ covariates in ANY form — true parameter x covariate
    mixing (``ke * wt**gamma``, ``cl / (1 + km * crcl)``, ...) included —
    provided the seq equation is time-independent and every covariate it
    reads is time-constant within each occasion row. The iterated chain
    ``seq^d(p, cov_r)`` is then a pure function of (row, support, depth),
    evaluated host-side into full parameter planes.

    Returns (param_planes [L, n_base, R, S] in the structure's
    micro-constant parameterization, seg_depth [R, M] 1-based, 0 on dead
    segments). Raises PharmsolError (-> XLA fallback) for time-dependent
    seq, seq reading a time-varying covariate, or a plane volume past the
    host-memory cap. ``lag_mode=True``: second element is the evcode
    stream, L the no-fire bound (see :func:`_seq_depth_stream`).
    """
    fd = float_dtype()
    tol = 1e-9 if np.dtype(fd) == np.float64 else 1e-5
    p_ref = np.where(np.abs(sp[0]) > 1e-30, sp[0], 1.0)

    cov_values, varying_covs = (_classify_covariates(grid)
                                if grid.cov_names else ({}, set()))
    names = list(cov_values.keys())
    cov0 = {n: float(np.asarray(v)[0]) for n, v in cov_values.items()}
    cov_var = {n: (v * 1.31 + 0.17 if n in varying_covs else v)
               for n, v in cov0.items()}

    def seq_once(p_rows, t, covd):
        def one(p):
            return jnp.asarray(seq(jnp.asarray(p, jnp.float64),
                                   jnp.asarray(t, jnp.float64),
                                   _RowCov(covd)), jnp.float64)
        return np.asarray(jax.vmap(one)(jnp.asarray(p_rows, jnp.float64)),
                          np.float64)

    try:
        with _host_cpu_device():
            f0 = seq_once(p_ref[None, :], 0.0, cov0)
            ft = seq_once(p_ref[None, :], 123.456, cov0)
            fv = (seq_once(p_ref[None, :], 0.0, cov_var)
                  if varying_covs else f0)
    except PharmsolError:
        raise
    except Exception as e:
        raise PharmsolError(
            f"engine='pallas' could not probe the seq equation: {e}"
        ) from e
    scale = np.maximum(np.abs(f0).max(), 1.0)
    if np.abs(ft - f0).max() > tol * scale:
        raise PharmsolError(
            "engine='pallas' seq planes require a time-independent seq "
            "equation — use the default XLA engine"
        )
    if varying_covs and np.abs(fv - f0).max() > tol * scale:
        raise PharmsolError(
            "engine='pallas' seq planes require the seq equation not to "
            "read a time-varying covariate — use the default XLA engine"
        )

    depth, L = _seq_depth_stream(grid, lag_mode)
    R = grid.n_rows
    S = sp.shape[0]
    k = n_kernel_params
    remap = sdef["remap"]
    n_base = len(remap([1.0] * k)) if remap else k
    if L * n_base * R * S > _MAX_PLANE_FLOATS:
        raise PharmsolError(
            "engine='pallas' covariate-dependent seq planes would exceed "
            f"the memory cap ({L}x{n_base}x{R}x{S} cells) — use the "
            "default XLA engine"
        )

    cov_mat = np.stack([np.asarray(cov_values[n], np.float64)
                        for n in names], axis=1) if names else \
        np.zeros((R, 0), np.float64)

    levels = []
    try:
        with _host_cpu_device():
            sp_j = jnp.asarray(sp, jnp.float64)
            cur = jnp.broadcast_to(sp_j[None, :, :],
                                   (R,) + sp_j.shape)  # [R, S, ncols]

            def step_row(cur_row, cov_row):
                covd = {n: cov_row[i] for i, n in enumerate(names)}

                def one(p):
                    return jnp.asarray(
                        seq(p, jnp.asarray(0.0, jnp.float64),
                            _RowCov(covd)), jnp.float64)

                return jax.vmap(one)(cur_row)

            cov_j = jnp.asarray(cov_mat, jnp.float64)
            for _ in range(L):
                cur = jax.vmap(step_row)(cur, cov_j)  # [R, S, ncols']
                arr = np.asarray(cur, np.float64)
                if arr.shape[2] < sp.shape[1]:
                    raise PharmsolError(
                        "engine='pallas' seq returned fewer columns than "
                        "the support width — use the default XLA engine"
                    )
                rows = [arr[:, :, i] for i in range(k)]  # [R, S] each
                rows = remap(rows) if remap else rows
                levels.append(np.stack(rows, axis=0))  # [n_base, R, S]
    except PharmsolError:
        raise
    except Exception as e:
        raise PharmsolError(
            f"engine='pallas' could not iterate the seq equation per "
            f"row: {e}"
        ) from e
    param_planes = np.stack(levels, axis=0)  # [L, n_base, R, S]
    if not np.all(np.isfinite(param_planes)):
        raise PharmsolError(
            "engine='pallas' seq parameter planes are non-finite — use "
            "the default XLA engine"
        )
    return np.ascontiguousarray(param_planes), np.ascontiguousarray(depth)


# segment-indexed planes unroll the kernel's masked level select per slot;
# past this many distinct chain values per row the select cost and plane
# volume stop paying for themselves — fall back to XLA
_MAX_SEQ_SEGPLANES = 16


def _decompose_seq_segplanes(seq, sp, grid, sdef, n_kernel_params: int):
    """Exact per-(row, support) SEGMENT-indexed parameter planes.

    The fully general no-lag seq tier: seq equations that read ``t``
    and/or a TIME-VARYING covariate in ANY form — non-affine parameter
    mixing included, i.e. everything :func:`_decompose_seq_tv` (affine
    only) and :func:`_decompose_seq_planes` (time-constant covariates
    only) reject. Without an active lag the reset/carry chain's reset
    points are the static grid breakpoints (they never move per
    support), so the engine recurrence (engine/sim.py step;
    analytical/mod.rs:331,360)

        p_base(m) = raw support at real events, carried otherwise
        p_seg(m)  = seq(p_base(m), t_start(m)+dt(m), cov)  when spanned

    is a pure function of (row, segment, support) — host-computable by
    walking the schedule once, calling the TRUE closure with the row's
    REAL CovView so the closure's own covariate time requests are
    honored exactly (``cov("wt", 0.0)`` baseline reads included).
    Distinct chain values per row are deduplicated into level slots
    (chains repeat between covariate knots), producing
    (param_planes [L, n_base, R, S], slot stream [R, M] 1-based, 0 on
    dead segments) for the kernel's existing planes mechanism.
    """
    from ...config import BIG_TIME
    from ...engine.grid import CovView
    from ...ops.pallas_psi import segment_schedule

    _, t_sorted, seg_dt, is_event = segment_schedule(grid.rows)
    R, M = t_sorted.shape
    S = sp.shape[0]
    k = n_kernel_params
    remap = sdef["remap"]
    n_base = len(remap([1.0] * k)) if remap else k
    if M * n_base * R * S > _MAX_PLANE_FLOATS:
        raise PharmsolError(
            "engine='pallas' segment-indexed seq planes would exceed the "
            f"memory cap ({M}x{n_base}x{R}x{S} cells) — use the default "
            "XLA engine"
        )

    # padded breakpoints sit at BIG_TIME; clamp their evaluation time to
    # the row's last real breakpoint so closures reading t stay finite
    real = np.asarray(t_sorted) < BIG_TIME / 2
    t_real_max = np.max(np.where(real, t_sorted, -np.inf), axis=1)
    t_real_max = np.where(np.isfinite(t_real_max), t_real_max, 0.0)
    te = np.minimum(np.asarray(t_sorted) + np.asarray(seg_dt),
                    t_real_max[:, None])  # [R, M]

    names = list(grid.cov_names)
    kt = np.asarray(grid.rows.cov_t, np.float64)  # [R, C, K]
    kv = np.asarray(grid.rows.cov_v, np.float64)
    fx = np.asarray(grid.rows.cov_fixed)
    if fx.ndim == 1 and kt.ndim == 3:
        fx = np.broadcast_to(fx[None, :], kt.shape[:2])
    if not names:
        kt = np.zeros((R, 0, 1), np.float64)
        kv = np.zeros((R, 0, 1), np.float64)
        fx = np.zeros((R, 0), bool)

    span_np = np.asarray(seg_dt) > 0.0
    ev_np = np.asarray(is_event, bool)

    def eval_col(cur_col, te_col, kt_j, kv_j, fx_j):
        # cur_col [R, S, ncols] f64, te_col [R] -> [R, S, ncols]
        def per_row(p_rows, t_r, kt_r, kv_r, fx_r):
            cv = CovView(kt_r, kv_r, fx_r, names)
            return jax.vmap(
                lambda p: jnp.asarray(seq(p, t_r, cv), jnp.float64)
            )(p_rows)

        return jax.vmap(per_row)(cur_col, te_col, kt_j, kv_j, fx_j)

    col_planes = [None] * M  # spanned columns -> [n_base, R, S] f64
    try:
        with _host_cpu_device():
            sp_j = jnp.asarray(sp, jnp.float64)
            cur = jnp.broadcast_to(sp_j[None], (R,) + sp_j.shape)
            kt_j = jnp.asarray(kt, jnp.float64)
            kv_j = jnp.asarray(kv, jnp.float64)
            fx_j = jnp.asarray(fx)
            eval_jit = jax.jit(eval_col)
            for m in range(M):
                base = jnp.where(
                    jnp.asarray(ev_np[:, m])[:, None, None], sp_j[None],
                    cur,
                )
                if not span_np[:, m].any():
                    cur = base
                    continue
                new = eval_jit(base, jnp.asarray(te[:, m], jnp.float64),
                               kt_j, kv_j, fx_j)
                arr = np.asarray(new, np.float64)
                if arr.shape[2] != sp.shape[1]:
                    raise PharmsolError(
                        "engine='pallas' seq must return exactly the "
                        "support width for segment-indexed planes — use "
                        "the default XLA engine"
                    )
                rows = [arr[:, :, i] for i in range(k)]  # [R, S] each
                rows = remap(rows) if remap else rows
                col_planes[m] = np.stack(rows, axis=0)  # [n_base, R, S]
                cur = jnp.where(
                    jnp.asarray(span_np[:, m])[:, None, None], new, base
                )
    except PharmsolError:
        raise
    except Exception as e:
        raise PharmsolError(
            f"engine='pallas' could not walk the seq chain per segment: "
            f"{e}"
        ) from e

    # per-row dedup of spanned-column chain values into level slots
    depth = np.zeros((R, M), np.float64)
    slot_maps = [{} for _ in range(R)]
    planes_rows = [[] for _ in range(R)]  # r -> list of [n_base, S]
    for m in range(M):
        pm = col_planes[m]
        if pm is None:
            continue
        for r in np.nonzero(span_np[:, m])[0]:
            key = pm[:, r, :].tobytes()
            sm = slot_maps[r]
            sl = sm.get(key)
            if sl is None:
                sl = len(sm)
                sm[key] = sl
                planes_rows[r].append(pm[:, r, :])
            depth[r, m] = sl + 1
    L = max([len(x) for x in planes_rows] + [1])
    if L > _MAX_SEQ_SEGPLANES:
        raise PharmsolError(
            f"engine='pallas' segment-indexed seq planes need {L} slots "
            f"(> {_MAX_SEQ_SEGPLANES}) — use the default XLA engine"
        )
    if L * n_base * R * S > _MAX_PLANE_FLOATS:
        raise PharmsolError(
            "engine='pallas' segment-indexed seq planes would exceed the "
            f"memory cap ({L}x{n_base}x{R}x{S} cells) — use the default "
            "XLA engine"
        )
    # rows with no spanned segments never select a slot; fill with the
    # remapped raw support so every plane cell stays finite
    fill_rows = [np.asarray(sp[:, i], np.float64) for i in range(k)]
    fill_rows = remap(fill_rows) if remap else fill_rows
    fill = np.stack(fill_rows, axis=0)  # [n_base, S]
    param_planes = np.empty((L, n_base, R, S), np.float64)
    for r in range(R):
        lst = planes_rows[r] or [fill]
        for l in range(L):
            param_planes[l, :, r, :] = lst[min(l, len(lst) - 1)]
    if not np.all(np.isfinite(param_planes)):
        raise PharmsolError(
            "engine='pallas' segment-indexed seq planes are non-finite — "
            "use the default XLA engine"
        )
    return np.ascontiguousarray(param_planes), np.ascontiguousarray(depth)


# lag+tv-seq column planes: main+post chain values share one slot space
# per row; past this many slots the select cost stops paying
_MAX_SEQ_COLPLANES = 24


def _colplanes_dynamic_lag(equation, sp, grid, ninput: int):
    """Per-dose-COLUMN [R, S] lag planes for a DYNAMIC lag closure.

    Evaluated host-side at each bolus's original breakpoint time with
    the engine's CovView (structs.rs:629 semantics) via the seg-planes
    evaluator; returns ``{column m: [R, S]}`` for the colplanes walk
    (the analytical kernel doses one input — input 0's plane applies).
    """
    from ...config import BIG_TIME
    from ...ops.pallas_psi import segment_schedule

    _, t_sorted, _, _, rank = segment_schedule(grid.rows, with_ranks=True)
    t_sorted = np.asarray(t_sorted, np.float64)
    rank = np.asarray(rank, np.float64)
    real = t_sorted < BIG_TIME / 2
    t_real_max = np.max(np.where(real, t_sorted, -np.inf), axis=1)
    t_real_max = np.where(np.isfinite(t_real_max), t_real_max, 0.0)
    t0_np = np.minimum(t_sorted, t_real_max[:, None])
    dose_mask = real & (rank == 2.0)
    dose_cols = sorted(int(m) for m in np.nonzero(dose_mask.any(axis=0))[0])
    if not dose_cols:
        raise PharmsolError(
            "engine='pallas' dynamic lag with tv-seq found no dose "
            "columns — use the default XLA engine"
        )
    seg_pl = _decompose_input_seg_planes(
        equation, sp, grid, ninput, dose_cols, t0_np
    )
    return {m: np.asarray(seg_pl[m][0][0], np.float64) for m in dose_cols}


def _decompose_seq_colplanes(seq, sp, grid, sdef, n_kernel_params: int,
                             lag_probe):
    """Per-COLUMN exact planes for lag combined with tv/time-dep seq.

    The last analytical residue: a lag moves each dose's seq-reset
    breakpoint to the per-(row, support) fire time, so no row-indexed
    stream can say which chain state a LANE is in. But with a STATIC lag
    plane the fire times ``t_dose + lag[r, s]`` are host-known scalars —
    the engine's full event walk (static resets/compounds PLUS per-lane
    fires) is computable per (row, support, kernel column):

    - walk each lane's merged event schedule (static obs/inf events +
      its own fire times, engine sort-rank tie order) applying the TRUE
      closure through the row's real CovView at each spanned segment's
      end time (the fire-ending segment applies seq AT the fire time);
    - ``main[m]`` = the chain value governing column m's span start
      (pre-fire on the fire column); ``post[m]`` = the value governing
      the remainder after a fire inside column m (used by the kernel's
      split march; filled with main where no fire can land).

    Main and post contents dedup per row into ONE slot space, returning
    (param_planes [L, n_base, R, S], seg_depth [R, M] 1-based main
    slots, seg_postdepth [R, M] post slots). The kernel selects twice
    from the same plane tensor and runs the true split march
    (_make_kernel ``lag_post``). Raises PharmsolError (-> XLA fallback)
    past the slot/memory caps.
    """
    from ...config import BIG_TIME
    from ...engine.grid import CovView
    from ...ops.pallas_psi import segment_schedule

    _, t_sorted, seg_dt, is_event, rank = segment_schedule(
        grid.rows, with_ranks=True
    )
    R, M = t_sorted.shape
    S = sp.shape[0]
    k = n_kernel_params
    remap = sdef["remap"]
    n_base = len(remap([1.0] * k)) if remap else k

    t_sorted = np.asarray(t_sorted, np.float64)
    seg_dt = np.asarray(seg_dt, np.float64)
    rank = np.asarray(rank, np.float64)
    real = t_sorted < BIG_TIME / 2
    t_real_max = np.max(np.where(real, t_sorted, -np.inf), axis=1)
    t_real_max = np.where(np.isfinite(t_real_max), t_real_max, 0.0)

    # a real zero-amount bolus is a seq-reset event the pending mechanism
    # can never fire on (same restriction as the lag_depth path)
    b_t = np.asarray(grid.rows.bolus_t, np.float64)
    b_a = np.asarray(grid.rows.bolus_amt, np.float64)
    if np.any((b_t < BIG_TIME / 2) & (b_a == 0.0)):
        raise PharmsolError(
            "engine='pallas' lag with a time-varying seq does not support "
            "zero-amount bolus records — use the default XLA engine"
        )

    # static chain events: obs(1)/inf-start(3) reset, inf-end(0) compounds;
    # bolus columns (2) are phantom (their event moved with the lag).
    # Prepend the grid start as a reset so pre-fire spans chain from raw.
    stat_mask = real & (rank != 2.0)
    E1 = int(stat_mask.sum(axis=1).max()) + 1
    stat_t = np.full((R, E1), BIG_TIME, np.float64)
    stat_code = np.ones((R, E1), np.float64)
    for r in range(R):
        idx = np.nonzero(stat_mask[r])[0]
        stat_t[r, 0] = t_sorted[r, 0] if real[r].any() else 0.0
        stat_t[r, 1:1 + len(idx)] = t_sorted[r, idx]
        stat_code[r, 1:1 + len(idx)] = np.where(rank[r, idx] == 0.0, 0.0, 1.0)

    # doses: per-row bolus columns; fire = t + lag[r, s]
    dose_mask = real & (rank == 2.0)
    ND = max(int(dose_mask.sum(axis=1).max()), 1)
    dose_t = np.full((R, ND), BIG_TIME, np.float64)
    dose_col = np.zeros((R, ND), np.int64)
    has_dose = np.zeros((R, ND), bool)
    for r in range(R):
        idx = np.nonzero(dose_mask[r])[0]
        dose_t[r, : len(idx)] = t_sorted[r, idx]
        dose_col[r, : len(idx)] = idx
        has_dose[r, : len(idx)] = True

    E = E1 + ND
    if M * n_base * R * S > _MAX_PLANE_FLOATS \
            or E * R * S * sp.shape[1] > _MAX_PLANE_FLOATS:
        raise PharmsolError(
            "engine='pallas' lag+tv-seq column planes would exceed the "
            f"memory cap ({M}x{n_base}x{R}x{S} cells) — use the default "
            "XLA engine"
        )

    names = list(grid.cov_names)
    kt = np.asarray(grid.rows.cov_t, np.float64)
    kv = np.asarray(grid.rows.cov_v, np.float64)
    fx = np.asarray(grid.rows.cov_fixed)
    if fx.ndim == 1 and kt.ndim == 3:
        fx = np.broadcast_to(fx[None, :], kt.shape[:2])
    if not names:
        kt = np.zeros((R, 0, 1), np.float64)
        kv = np.zeros((R, 0, 1), np.float64)
        fx = np.zeros((R, 0), bool)

    # lag per (row, support, dose): static closures broadcast one [R, S]
    # plane over every dose; DYNAMIC closures (time-dependent / reading a
    # time-varying covariate) pass a dict {column m: [R, S]} of exact
    # per-dose-column planes — each dose's fire time is still a
    # host-known scalar, so the walk is unchanged
    if isinstance(lag_probe, dict):
        lag_nd = np.zeros((R, S, ND), np.float64)
        for r in range(R):
            for jd in range(ND):
                if has_dose[r, jd]:
                    lag_nd[r, :, jd] = lag_probe[int(dose_col[r, jd])][r, :]
    else:
        lag_np2 = np.asarray(lag_probe, np.float64)  # [R, S]
        lag_nd = np.broadcast_to(
            lag_np2[:, :, None], (R, S, ND)).copy()

    def lane_walk(raw, lag_rs, st_t, st_c, d_t, trm, kt_r, kv_r, fx_r):
        # one lane: merged schedule walk -> seg values [E, ncols];
        # lag_rs [ND] = this lane's per-dose lag
        cv = CovView(kt_r, kv_r, fx_r, names)
        fire_t = d_t + lag_rs  # [ND] (pads stay ~BIG_TIME)
        times = jnp.concatenate([st_t, fire_t])
        codes = jnp.concatenate([st_c, jnp.ones_like(fire_t)])
        order = jnp.argsort(times, stable=True)  # static-first tie order
        times = times[order]
        codes = codes[order]
        ends = jnp.concatenate([times[1:], times[-1:]])
        t_eval = jnp.minimum(ends, trm)

        def step(p_cur, xs_i):
            t0, t1, te_i, code = xs_i
            base = jnp.where(code == 1.0, raw, p_cur)
            p_new = jnp.asarray(seq(base, te_i, cv), jnp.float64)
            span = t1 > t0
            p_seg = jnp.where(span, p_new, base)
            return p_seg, p_seg

        _, seg_vals = jax.lax.scan(
            step, raw, (times, ends, t_eval, codes)
        )
        return times, seg_vals  # [E], [E, ncols]

    try:
        with _host_cpu_device():
            sp_j = jnp.asarray(sp, jnp.float64)

            def per_row(st_t, st_c, d_t, trm, kt_r, kv_r, fx_r, lag_row):
                return jax.vmap(
                    lambda p, lg: lane_walk(p, lg, st_t, st_c, d_t, trm,
                                            kt_r, kv_r, fx_r)
                )(sp_j, lag_row)

            times_all, seg_vals = jax.vmap(per_row)(
                jnp.asarray(stat_t), jnp.asarray(stat_code),
                jnp.asarray(dose_t), jnp.asarray(t_real_max),
                jnp.asarray(kt), jnp.asarray(kv), jnp.asarray(fx),
                jnp.asarray(lag_nd),
            )  # [R, S, E], [R, S, E, ncols]
            times_all = np.asarray(times_all, np.float64)
            seg_vals = np.asarray(seg_vals, np.float64)
    except PharmsolError:
        raise
    except Exception as e:
        raise PharmsolError(
            f"engine='pallas' could not walk the lag+seq chain: {e}"
        ) from e
    if seg_vals.shape[3] != sp.shape[1]:
        # the engine scan carries the seq output as the next p_base
        # (engine/sim.py step), so exact support width is the contract —
        # enforced identically across all seq tiers
        raise PharmsolError(
            "engine='pallas' seq must return exactly the support width "
            "for lag+tv-seq column planes — use the default XLA engine"
        )

    # main[m]: segment containing column m's start (post-all-ties)
    t_cols = t_sorted  # [R, M]
    idx_main = (times_all[:, :, None, :] <= t_cols[:, None, :, None]) \
        .sum(axis=3) - 1  # [R, S, M]
    idx_main = np.clip(idx_main, 0, times_all.shape[2] - 1)
    main_vals = np.take_along_axis(
        seg_vals, idx_main[..., None], axis=2
    )  # [R, S, M, ncols]

    # post[m]: the segment STARTING at the fire, scattered to fire columns
    post_vals = main_vals.copy()
    for j in range(ND):
        fire = dose_t[:, j][:, None] + lag_nd[:, :, j]  # [R, S]
        live = has_dose[:, j][:, None] & (fire < BIG_TIME / 2)
        if not live.any():
            continue
        col_j = (t_cols[:, None, :] <= fire[:, :, None]).sum(axis=2) - 1
        col_j = np.clip(col_j, 0, M - 1)  # [R, S]
        idx_af = (times_all <= fire[:, :, None]).sum(axis=2) - 1
        idx_af = np.clip(idx_af, 0, times_all.shape[2] - 1)
        val_j = np.take_along_axis(
            seg_vals, idx_af[:, :, None, None], axis=2
        )[:, :, 0, :]  # [R, S, ncols]
        r_ix, s_ix = np.nonzero(live)
        post_vals[r_ix, s_ix, col_j[r_ix, s_ix], :] = val_j[r_ix, s_ix, :]

    def to_base(vals_rsm):  # [R, S, ncols] -> [n_base, R, S]
        rows = [vals_rsm[:, :, i] for i in range(k)]
        rows = remap(rows) if remap else rows
        return np.stack(rows, axis=0)

    span_np = seg_dt > 0.0
    depth = np.zeros((R, M), np.float64)
    postdepth = np.zeros((R, M), np.float64)
    slot_maps = [{} for _ in range(R)]
    planes_rows = [[] for _ in range(R)]

    def slot_of(r, content):
        key = content.tobytes()
        sm = slot_maps[r]
        sl = sm.get(key)
        if sl is None:
            sl = len(sm)
            sm[key] = sl
            planes_rows[r].append(content)
        return sl + 1

    for m in range(M):
        main_m = to_base(main_vals[:, :, m, :])  # [n_base, R, S]
        post_m = to_base(post_vals[:, :, m, :])
        for r in np.nonzero(span_np[:, m])[0]:
            depth[r, m] = slot_of(r, main_m[:, r, :])
            postdepth[r, m] = slot_of(r, post_m[:, r, :])
    L = max([len(x) for x in planes_rows] + [1])
    if L > _MAX_SEQ_COLPLANES:
        raise PharmsolError(
            f"engine='pallas' lag+tv-seq column planes need {L} slots "
            f"(> {_MAX_SEQ_COLPLANES}) — use the default XLA engine"
        )
    if L * n_base * R * S > _MAX_PLANE_FLOATS:
        raise PharmsolError(
            "engine='pallas' lag+tv-seq column planes would exceed the "
            f"memory cap ({L}x{n_base}x{R}x{S} cells) — use the default "
            "XLA engine"
        )
    fill_rows = [np.asarray(sp[:, i], np.float64) for i in range(k)]
    fill_rows = remap(fill_rows) if remap else fill_rows
    fill = np.stack(fill_rows, axis=0)
    param_planes = np.empty((L, n_base, R, S), np.float64)
    for r in range(R):
        lst = planes_rows[r] or [fill]
        for l in range(L):
            param_planes[l, :, r, :] = lst[min(l, len(lst) - 1)]
    if not np.all(np.isfinite(param_planes)):
        raise PharmsolError(
            "engine='pallas' lag+tv-seq column planes are non-finite — "
            "use the default XLA engine"
        )
    return (np.ascontiguousarray(param_planes),
            np.ascontiguousarray(depth), np.ascontiguousarray(postdepth))
