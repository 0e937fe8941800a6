"""Fused analytical psi plan (`_PallasPsiPlan`).

Owns validation/padding for BOTH analytical pallas drivers (local and
sharded) — never duplicate that logic elsewhere.  Split out of
likelihood/matrix.py in round 5 as pure code movement.
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

class _PallasPsiPlan:
    """Validated, padded inputs for a fused pallas psi evaluation.

    Shared by the unsharded driver here and the shard_map driver in
    parallel/mesh.py so validation and stream layout cannot diverge.

    Covers every structure in engine.analytical.KERNELS (CL variants via the
    XLA-side support remap) and any output equations linear in the state —
    the coefficients are extracted from the model's ``out`` closure by basis
    evaluation per support point (see pallas_psi.extract_linear_out), so
    multi-output models stream per-observation outeq indices into the kernel.

    Covariates & seq tiers (cheapest first, see __init__): per-row
    affine factors (_decompose_seq), per-segment affine streams for
    time-varying covariates / infusion compounding (_decompose_seq_tv),
    chain-depth level tables for covariate-free seq of any form
    (_decompose_seq_levels), per-(row, support) parameter planes for
    time-constant-covariate seq of any form (_decompose_seq_planes),
    exact SEGMENT-indexed planes for seq reading t and/or a
    time-varying covariate in any form (_decompose_seq_segplanes), and
    exact per-COLUMN main/post planes for lag combined with a tv /
    time-dependent seq — the lag plane (static, or exact per-dose-COLUMN
    planes for DYNAMIC closures) makes the per-(row, support, dose)
    fire times host-known, so the full engine chain including the
    moving reset is walked host-side and the kernel runs a true split
    march selecting main and post slots per column
    (_decompose_seq_colplanes). Remaining fallbacks to the general XLA
    engine (clear errors): colplane slot-cap / memory-cap overflow,
    zero-amount bolus records under lag+seq, and exact-zero fa support
    cells in the split-march tiers.
    """

    def __init__(self, equation, grid, sp, lowered, row_multiple: int):
        from ...engine.grid import CovView
        from ...ops.pallas_psi import (
            SP_TILE, STRUCTURES, extract_linear_out, streams_from_grid,
        )

        self.structure = _pallas_structure_name(equation)
        sdef = STRUCTURES[self.structure]
        n_kernel_params = sdef["n_params"]
        kernel_inputs = getattr(equation, "_kernel_inputs", None)
        if kernel_inputs is None and sp.shape[1] < n_kernel_params:
            # declarative models map declared columns onto kernel params, so
            # the width constraint applies only to raw kernel-order supports
            raise PharmsolError(
                f"engine='pallas' with `{self.structure}` needs support columns "
                f"[{n_kernel_params} kernel params..., out params...], got "
                f"{sp.shape[1]} columns"
            )
        if kernel_inputs is not None:
            dest = getattr(equation, "_bolus_dest", None)
            if dest and int(dest[0]) != int(sdef["dose_state"]):
                raise PharmsolError(
                    f"engine='pallas' with `{self.structure}` expects the "
                    f"bolus route to target state {sdef['dose_state']}, "
                    f"this model doses state {dest[0]} — use the default "
                    "XLA engine"
                )
        # init equation: covariate-independent init evaluates to per-support
        # initial-state rows, applied by the kernel on occasion-0 rows via
        # the init-mask stream (same scheme as the ODE tier);
        # covariate-dependent init rides per-(row, support) planes
        self.init_rows = None
        self.init_planes = None
        if equation._init is not None:
            init_fn = equation._init
            cov_vals0, _ = (_classify_covariates(grid)
                            if grid.cov_names else ({}, set()))
            icov0 = {n: float(np.asarray(v)[0])
                     for n, v in cov_vals0.items()}
            icov1 = {n: v * 1.31 + 0.17 for n, v in icov0.items()}

            def init_at(p, covd):
                return jnp.asarray(
                    init_fn(p, jnp.asarray(0.0, jnp.float64),
                            _RowCov(covd)),
                    jnp.float64,
                )

            try:
                with _host_cpu_device():
                    i_ref = np.asarray(jax.vmap(
                        lambda p: init_at(p, icov0))(
                            jnp.asarray(sp, jnp.float64)), np.float64)
                    i_cov = (np.asarray(jax.vmap(
                        lambda p: init_at(p, icov1))(
                            jnp.asarray(sp, jnp.float64)), np.float64)
                        if icov0 else i_ref)
            except PharmsolError:
                raise
            except Exception as e:
                raise PharmsolError(
                    f"engine='pallas' could not probe the init equation: {e}"
                ) from e
            iscale = np.maximum(np.abs(i_ref).max(), 1e-12)
            if not np.all(np.isfinite(i_ref)):
                raise PharmsolError(
                    "engine='pallas' init probe produced non-finite values"
                )
            if i_ref.shape[1] != sdef["n_states"]:
                raise PharmsolError(
                    f"engine='pallas' with `{self.structure}` expects init "
                    f"to return {sdef['n_states']} states, got "
                    f"{i_ref.shape[1]}"
                )
            if icov0 and np.abs(i_cov - i_ref).max() > 1e-6 * iscale:
                # covariate-dependent init: evaluate exactly per (row,
                # support) at t=0 and ride per-state [R, S] planes
                # (engine/sim.py:147-152 applies init at t=0.0)
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
                        f"covariate-dependent init per row: {e}"
                    ) from e
                if not np.all(np.isfinite(pl_)):
                    raise PharmsolError(
                        "engine='pallas' covariate-dependent init "
                        "evaluation produced non-finite values"
                    )
                if np.any(pl_ != 0.0):
                    self.init_planes = np.transpose(pl_, (2, 0, 1))
            elif np.any(i_ref != 0.0):
                self.init_rows = i_ref.T  # [n_states, S]
        self.mult = None
        self.mult_off = None
        self.mult_seg = None
        self.mult_seg_off = None
        self.param_levels = None
        self.param_planes = None
        self.seg_depth = None
        self.seg_evcode = None
        self.seg_postdepth = None
        self.sp_kernel = None
        cov_values = {}
        # probe the lag closure FIRST: an active lag moves the seq-reset
        # breakpoints to per-(row, support) fire times, which changes how
        # the seq chain depth must be decomposed below (lag_mode)
        ninput = int(equation.ndrugs())
        lag_probe = None
        lag_fa_dynamic = False
        lag_active = False
        if equation._lag is not None:
            try:
                lag_probe = _decompose_input_plane(
                    equation._lag, sp, grid, ninput, 0.0, "lag"
                )
            except _InputPlaneDynamic:
                lag_fa_dynamic = True
                lag_active = True
            else:
                lag_active = bool(np.any(lag_probe != 0.0))
        if kernel_inputs is not None:
            (self.sp_kernel, self.mult, self.mult_off, self.mult_seg,
             self.mult_seg_off) = _decompose_kernel_inputs(
                kernel_inputs, sp, grid, n_kernel_params,
                allow_mult=sdef["prep_xla"] is None,
            )
        elif equation._seq is not None:
            from ...config import BIG_TIME

            affine_err = None
            if sdef["prep_xla"] is None:
                has_real_inf = bool(
                    np.any(np.asarray(grid.rows.inf_t) < BIG_TIME / 2)
                )
                cov_v = np.asarray(grid.rows.cov_v, dtype=np.float64)
                time_varying = bool(
                    grid.cov_names and cov_v.ndim == 3
                    and not np.all(cov_v == cov_v[..., :1])
                )
                try:
                    if time_varying or has_real_inf:
                        # per-segment factors: time-varying covariates,
                        # and/or the engine's seq compounding across
                        # infusion-end sub-splits (a single per-row
                        # multiplier is wrong there). With an active lag
                        # the baked chain cannot express the moving reset
                        # — fall through to the levels/planes tier, whose
                        # in-kernel depth counter can (lag_mode).
                        if not lag_active:
                            self.mult_seg, self.mult_seg_off = \
                                _decompose_seq_tv(
                                    equation._seq, sp, grid, n_kernel_params
                                )
                    else:
                        cov_values = (
                            _constant_covariate_values(grid)
                            if grid.cov_names else {}
                        )
                        try:
                            self.mult, self.mult_off = _decompose_seq(
                                equation._seq, sp, cov_values,
                                n_kernel_params, n_rows_total=grid.n_rows,
                            )
                        except PharmsolError as e:
                            if "time-independent" not in str(e) or lag_active:
                                raise
                            # time-dependent but (potentially) affine:
                            # per-segment factors at each segment end
                            self.mult_seg, self.mult_seg_off = \
                                _decompose_seq_tv(
                                    equation._seq, sp, grid, n_kernel_params
                                )
                except PharmsolError as e:
                    affine_err = e
            if self.mult is None and self.mult_seg is None:
                # covariate-free time-independent seq of ANY form (incl.
                # parameter mixing and 3-cmt structures): chain-depth levels
                try:
                    self.param_levels, seq_stream = _decompose_seq_levels(
                        equation._seq, sp, grid, sdef, n_kernel_params,
                        lag_mode=lag_active,
                    )
                except PharmsolError as level_err:
                    # covariate-DEPENDENT time-independent seq of any form
                    # over time-constant covariates: exact per-(row, support)
                    # parameter planes, one set per chain depth
                    try:
                        self.param_planes, seq_stream = \
                            _decompose_seq_planes(
                                equation._seq, sp, grid, sdef,
                                n_kernel_params, lag_mode=lag_active,
                            )
                    except PharmsolError as plane_err:
                        if lag_active:
                            # lag + tv/time-dependent seq: per-COLUMN
                            # exact planes + the split march — the fire
                            # times must be host-known. Static closures
                            # give one [R, S] lag plane; DYNAMIC closures
                            # (time-dependent / reading a tv covariate)
                            # give exact per-dose-COLUMN planes via the
                            # seg-planes evaluator — every fire time is
                            # still a host-known scalar per (row,
                            # support, dose)
                            lag_arg = lag_probe
                            if lag_fa_dynamic:
                                try:
                                    lag_arg = _colplanes_dynamic_lag(
                                        equation, sp, grid, ninput
                                    )
                                except PharmsolError:
                                    raise (affine_err or plane_err
                                           or level_err)
                            if lag_arg is None:
                                raise affine_err or plane_err or level_err
                            try:
                                (self.param_planes, self.seg_depth,
                                 self.seg_postdepth) = \
                                    _decompose_seq_colplanes(
                                        equation._seq, sp, grid, sdef,
                                        n_kernel_params, lag_arg,
                                    )
                            except PharmsolError:
                                raise affine_err or plane_err or level_err
                            seq_stream = None
                        else:
                            # time-dependent and/or time-varying-covariate
                            # seq of ANY form: exact segment-indexed planes
                            try:
                                self.param_planes, seq_stream = \
                                    _decompose_seq_segplanes(
                                        equation._seq, sp, grid, sdef,
                                        n_kernel_params,
                                    )
                            except PharmsolError:
                                raise affine_err or plane_err or level_err
                n_lv = (self.param_levels if self.param_levels is not None
                        else self.param_planes).shape[0]
                if self.seg_postdepth is not None:
                    pass  # colplanes: both slot streams already set
                elif lag_active and n_lv > 1:
                    # lag + depth > 1: in-kernel depth counter on evcodes
                    self.seg_evcode = seq_stream
                elif lag_active:
                    # depth never exceeds 1 even without fires: every
                    # spanned segment uses seq^1 regardless of where the
                    # dose lands — the plain (cheaper, superposition-fire)
                    # lag path is exact; rebuild the ordinary depth stream
                    self.seg_depth, _ = _seq_depth_stream(grid)
                else:
                    self.seg_depth = seq_stream
        # lag/fa: per-(row, support) planes via the kernel's pending-dose /
        # amount-scale mechanism (structs.rs:611-666). Time-dependent
        # closures and closures that READ a time-varying covariate switch
        # to exact per-DOSE-SEGMENT planes (built after the streams below,
        # same mechanism as the ODE tier's slot tables).
        self.lag_plane = None
        self.fa_plane = None
        self.lag_slots = None
        self.fa_slots = None
        if lag_active:
            # a lag-shifted dose inserts a real-event seq-reset breakpoint.
            # Per-segment affine streams cannot express it (the baked
            # compounding chain would need per-reset-position stream sets);
            # depth-selected levels/planes ride the in-kernel depth counter
            # (seg_evcode above) — and when the chain depth is 1 everywhere
            # the reset is a no-op and the plain superposition path holds.
            if self.mult_seg is not None:
                raise PharmsolError(
                    "engine='pallas' does not support lag together with "
                    "per-segment seq streams (a lag-shifted dose adds a "
                    "seq-reset breakpoint the host-side affine chain "
                    "cannot express) — use the default XLA engine"
                )
            if lag_probe is not None and np.any(lag_probe != 0.0):
                _validate_lag_no_overlap(lag_probe, grid)
                self.lag_plane = lag_probe
        if equation._fa is not None and not lag_fa_dynamic:
            try:
                fp = _decompose_input_plane(
                    equation._fa, sp, grid, ninput, 1.0, "fa"
                )
            except _InputPlaneDynamic:
                # the seg-plane path re-evaluates BOTH closures per dose
                # segment (fa is defined at the lag-shifted time, so the
                # two are coupled)
                lag_fa_dynamic = True
                self.lag_plane = None
            else:
                if np.any(fp != 1.0):
                    self.fa_plane = fp
        if grid.cov_names and equation._out is not None:
            # covariates may only act through seq; the out() closure must be
            # support-only for the per-support linear extraction to hold.
            # For time-varying covariates probe with first-knot values.
            if not cov_values:
                cov_v3 = np.asarray(grid.rows.cov_v, dtype=np.float64)
                if cov_v3.ndim == 3:
                    cov_values = {
                        n: cov_v3[:, c, 0]
                        for c, n in enumerate(grid.cov_names)
                    }
            _check_out_covariate_free(
                equation, sp, cov_values, sdef["n_states"], CovView
            )
        self.n_out = int(equation.nouteqs())
        n_states = sdef["n_states"]
        if int(equation.nstates()) != n_states:
            raise PharmsolError(
                f"engine='pallas' with `{self.structure}` expects nstates="
                f"{n_states}, got {equation.nstates()}"
            )

        streams = streams_from_grid(grid.rows, lowered)
        self.R = streams[0].shape[0]
        self.S = sp.shape[0]
        self.M = streams[0].shape[1]
        lag_seg_planes = None
        fa_seg_planes = None
        if lag_fa_dynamic:
            # exact per-dose-segment planes: evaluate the closures host-side
            # with the engine's CovView at each bolus's breakpoint time
            # (lag at the ORIGINAL time, fa at the lag-shifted time —
            # structs.rs:629 / engine/grid.py:502-512), selected statically
            # in the kernel by (segment) -> plane-slot tables
            from ...config import BIG_TIME
            from ...ops.pallas_psi import segment_schedule

            _, t_sorted, _, _ = segment_schedule(grid.rows)
            real = t_sorted < BIG_TIME / 2
            t_real_max = np.max(np.where(real, t_sorted, -np.inf), axis=1)
            t_real_max = np.where(np.isfinite(t_real_max), t_real_max, 0.0)
            seg_t0_np = np.minimum(t_sorted, t_real_max[:, None])
            bol_np = np.asarray(streams[1], np.float64)
            dose_cols = [m for m in range(self.M)
                         if np.any(bol_np[:, m] != 0.0)]
            seg_pl = _decompose_input_seg_planes(
                equation, sp, grid, ninput, dose_cols, seg_t0_np
            )
            has_lag_dyn = equation._lag is not None and any(
                np.any(seg_pl[m][0][0] != 0.0) for m in dose_cols
            )
            has_fa_dyn = equation._fa is not None and any(
                np.any(seg_pl[m][1][0] != 1.0) for m in dose_cols
            )
            if has_lag_dyn:
                # pairwise no-overlap per row: each dose's lag (max over
                # supports) must elapse before the row's NEXT dose arrives
                # — the kernel holds ONE pending slot
                for r in range(self.R):
                    cols = [m for m in dose_cols if bol_np[r, m] != 0.0]
                    cols.sort(key=lambda m: seg_t0_np[r, m])
                    for m1, m2 in zip(cols, cols[1:]):
                        gap = seg_t0_np[r, m2] - seg_t0_np[r, m1]
                        lag_max = seg_pl[m1][0][0, r, :].max()
                        # strict: lag == gap clobbers the pending slot
                        if lag_max >= gap:
                            raise PharmsolError(
                                f"engine='pallas' lag support requires "
                                f"each dose's lag to elapse strictly "
                                f"before the next dose (row {r}: max lag "
                                f"{lag_max:.4g} >= gap {gap:.4g}) — use "
                                f"the default XLA engine"
                            )
                slots = [-1] * self.M
                lag_seg_planes = []
                for m in dose_cols:
                    slots[m] = len(lag_seg_planes)
                    lag_seg_planes.append(seg_pl[m][0][0])
                self.lag_slots = tuple(slots)
            if has_fa_dyn:
                slots = [-1] * self.M
                fa_seg_planes = []
                for m in dose_cols:
                    slots[m] = len(fa_seg_planes)
                    fa_seg_planes.append(seg_pl[m][1][0])
                self.fa_slots = tuple(slots)
        if (self.seg_evcode is not None and self.lag_plane is None
                and self.lag_slots is None):
            # the lag probe was dynamic but every per-dose lag came back
            # zero: no dose ever fires in-kernel, so boluses DO reset the
            # chain at their original breakpoints — use the ordinary
            # host-side depth stream (levels beyond the engine's max are
            # simply never selected)
            self.seg_evcode = None
            self.seg_depth, _ = _seq_depth_stream(grid)
        if self.seg_evcode is not None or self.seg_postdepth is not None:
            # split-march tiers fire on pend_amt != 0 (ops/pallas_psi.py
            # lag_depth/lag_post): a support cell whose fa evaluates to
            # EXACTLY 0.0 would never fire, silently skipping the seq
            # reset the engine still applies at the lag-shifted dose —
            # reject to XLA like zero-amount bolus records
            fa_all = list(fa_seg_planes or [])
            if self.fa_plane is not None:
                fa_all.append(self.fa_plane)
            for fp in fa_all:
                if np.any(np.asarray(fp, np.float64) == 0.0):
                    raise PharmsolError(
                        "engine='pallas' lag combined with seq does not "
                        "support bioavailability cells that are exactly "
                        "zero (the pending dose would never fire its "
                        "seq reset) — use the default XLA engine"
                    )
        self.Rp = ((self.R + row_multiple - 1) // row_multiple) * row_multiple
        self.Sp = ((self.S + SP_TILE - 1) // SP_TILE) * SP_TILE
        # compiled Mosaic kernels are float32-only; the CPU interpret path
        # keeps the configured float dtype (f64 under the test config)
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

        def pad_rows_fill(a, fill):
            a = np.asarray(a, dtype=np.float64)
            if self.Rp == self.R:
                return jnp.asarray(a, dtype=fd)
            pad = np.full((self.Rp - self.R,) + a.shape[1:], fill)
            return jnp.asarray(np.concatenate([a, pad], axis=0), dtype=fd)

        # padded rows get identity factors: multiplier 1, offset 0
        self.mult_dev = (
            pad_rows_fill(self.mult, 1.0) if self.mult is not None else None
        )
        self.mult_off_dev = (
            pad_rows_fill(self.mult_off, 0.0)
            if self.mult_off is not None else None
        )
        self.mult_seg_dev = (
            pad_rows_fill(self.mult_seg, 1.0)
            if self.mult_seg is not None else None
        )
        self.mult_seg_off_dev = (
            pad_rows_fill(self.mult_seg_off, 0.0)
            if self.mult_seg_off is not None else None
        )
        self.seg_depth_dev = (
            pad_rows_fill(self.seg_depth, 0.0)
            if self.seg_depth is not None else None
        )
        self.seg_evcode_dev = (
            pad_rows_fill(self.seg_evcode, 0.0)
            if self.seg_evcode is not None else None
        )
        self.seg_postdepth_dev = (
            pad_rows_fill(self.seg_postdepth, 0.0)
            if self.seg_postdepth is not None else None
        )

        def pad_plane(a, fill):
            a = np.asarray(a, dtype=np.float64)
            if self.Rp != self.R:
                a = np.concatenate(
                    [a, np.full((self.Rp - self.R, a.shape[1]), fill)], axis=0
                )
            if self.Sp != self.S:
                a = np.concatenate(
                    [a, np.repeat(a[:, -1:], self.Sp - self.S, axis=1)], axis=1
                )
            return jnp.asarray(a, dtype=fd)

        # lag/fa ride as tuples of [Rp, Sp] planes: one plane (constant
        # closures, slots None) or one per dose segment (slot tables)
        if lag_seg_planes is not None:
            self.lag_plane_dev = tuple(
                pad_plane(p, 0.0) for p in lag_seg_planes)
        elif self.lag_plane is not None:
            self.lag_plane_dev = (pad_plane(self.lag_plane, 0.0),)
        else:
            self.lag_plane_dev = None
        if fa_seg_planes is not None:
            self.fa_plane_dev = tuple(
                pad_plane(p, 1.0) for p in fa_seg_planes)
        elif self.fa_plane is not None:
            self.fa_plane_dev = (pad_plane(self.fa_plane, 1.0),)
        else:
            self.fa_plane_dev = None

        def pad_support(a):
            if self.Sp == self.S:
                return a
            return np.concatenate(
                [a, np.repeat(a[-1:], self.Sp - self.S, axis=0)], axis=0
            )

        sp_padded = pad_support(sp)
        # declarative models: the kernel consumes the anchored kernel-order
        # support; the out-coefficient extraction below keeps the DECLARED
        # support (out closures index declared parameters)
        self.sp_dev = jnp.asarray(
            pad_support(self.sp_kernel) if self.sp_kernel is not None
            else sp_padded,
            dtype=fd,
        )
        self.param_levels_dev = None
        if self.param_levels is not None:
            lv = np.asarray(self.param_levels, np.float64)  # [L, n_base, S]
            if self.Sp != self.S:
                lv = np.concatenate(
                    [lv, np.repeat(lv[..., -1:], self.Sp - self.S, axis=-1)],
                    axis=-1,
                )
            self.param_levels_dev = jnp.asarray(lv, dtype=fd)
        self.param_planes_dev = None
        if self.param_planes is not None:
            pp = np.asarray(self.param_planes, np.float64)  # [L, nb, R, S]
            if self.Rp != self.R:
                # padded rows are dead (depth 0) but ride prepare(): fill
                # with 1.0 so eigen/ratio math stays finite
                pp = np.concatenate(
                    [pp, np.ones(pp.shape[:2] + (self.Rp - self.R,
                                                 pp.shape[3]))],
                    axis=2,
                )
            if self.Sp != self.S:
                pp = np.concatenate(
                    [pp, np.repeat(pp[..., -1:], self.Sp - self.S, axis=-1)],
                    axis=-1,
                )
            self.param_planes_dev = jnp.asarray(pp, dtype=fd)
        self.init_mask_dev = None
        self.init_rows_dev = None
        self.init_planes_dev = None
        if self.init_rows is not None or self.init_planes is not None:
            im = np.asarray(grid.rows.init_mask, np.float64).reshape(-1)
            init_mask_rm = np.zeros((self.R, self.M))
            init_mask_rm[:, 0] = im
            self.init_mask_dev = jnp.asarray(
                pad_rows(init_mask_rm), dtype=fd
            )
        if self.init_rows is not None:
            ir = np.asarray(self.init_rows, np.float64)  # [n_states, S]
            if self.Sp != self.S:
                ir = np.concatenate(
                    [ir, np.repeat(ir[:, -1:], self.Sp - self.S, axis=1)],
                    axis=1,
                )
            self.init_rows_dev = jnp.asarray(ir, dtype=fd)
        if self.init_planes is not None:
            self.init_planes_dev = jnp.stack([
                pad_plane(self.init_planes[s], 0.0)
                for s in range(n_states)
            ])
        # output coefficients: y_k = C_k(p) . x + b_k(p), per support point
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
                f"engine='pallas' could not extract linear output "
                f"coefficients for `{self.structure}` (support columns "
                f"mismatch or non-linear output): {e}"
            ) from e
        # [n_out, n_states, Sp] rows for the kernel
        self.out_coef = jnp.asarray(np.transpose(C, (1, 2, 0)), dtype=fd)
        self.out_bias = jnp.asarray(b.T, dtype=fd) if np.any(b) else None
        # all-zero optional streams are passed as None so psi_oral's static
        # has_inf/has_cens flags survive jit tracing and the lean kernel
        # variants compile
        self.pass_inf = bool(np.any(streams[2]))
        self.pass_cens = bool(np.any(streams[6]))
        self.pass_outeq = self.n_out > 1

    def cache_key(self, *extra):
        lv = self.param_levels_dev
        pp = self.param_planes_dev
        return ("pallas", self.structure, self.Rp, self.Sp, self.M,
                self.pass_inf, self.pass_cens, self.pass_outeq, self.n_out,
                self.out_bias is not None, self.mult_dev is not None,
                self.mult_off_dev is not None,
                self.mult_seg_dev is not None,
                self.mult_seg_off_dev is not None,
                None if lv is None else int(lv.shape[0]),
                None if pp is None else tuple(int(d) for d in pp.shape[:2]),
                self.init_rows_dev is not None,
                self.init_planes_dev is not None,
                None if self.lag_plane_dev is None
                else len(self.lag_plane_dev),
                None if self.fa_plane_dev is None
                else len(self.fa_plane_dev),
                self.seg_evcode_dev is not None,
                self.seg_postdepth_dev is not None,
                self.lag_slots, self.fa_slots, str(self.fd)) + extra

    def stream_args(self):
        """The row-axis streams ([Rp, M] segments + [Rp, ...] seq factors
        and [Rp, Sp] lag/fa planes)."""
        p = self.padded
        include = [True, True, self.pass_inf, True, True, True,
                   self.pass_cens, self.pass_outeq]
        out = tuple(a for a, inc in zip(p, include) if inc)
        for a in (self.mult_dev, self.mult_off_dev, self.mult_seg_dev,
                  self.mult_seg_off_dev, self.seg_depth_dev,
                  self.seg_evcode_dev, self.seg_postdepth_dev,
                  self.init_mask_dev):
            if a is not None:
                out = out + (a,)
        for planes in (self.lag_plane_dev, self.fa_plane_dev):
            if planes is not None:
                out = out + tuple(planes)
        if self.init_planes_dev is not None:
            # one [Rp, Sp] plane per state (rows leading, so the sharded
            # driver's subjects-axis specs apply uniformly)
            out = out + tuple(
                self.init_planes_dev[s]
                for s in range(self.init_planes_dev.shape[0])
            )
        if self.param_planes_dev is not None:
            # flattened [Rp, Sp] parameter planes, level-major then
            # base-row (rows leading for the sharded driver)
            pp = self.param_planes_dev
            out = out + tuple(
                pp[l, i]
                for l in range(pp.shape[0]) for i in range(pp.shape[1])
            )
        return out

    def rep_args(self):
        """Support-axis arrays (replicated under sharding): support,
        coef[, bias][, seq level tables]."""
        out = [self.sp_dev, self.out_coef]
        if self.out_bias is not None:
            out.append(self.out_bias)
        if self.param_levels_dev is not None:
            out.append(self.param_levels_dev)
        if self.init_rows_dev is not None:
            out.append(self.init_rows_dev)
        return tuple(out)

    def runner(self):
        """A (streams..., rep...) -> psi rows function around psi_oral."""
        from ...ops.pallas_psi import psi_oral

        structure = self.structure
        pass_inf, pass_cens = self.pass_inf, self.pass_cens
        pass_outeq = self.pass_outeq
        pass_mult = self.mult_dev is not None
        pass_mult_off = self.mult_off_dev is not None
        pass_mult_seg = self.mult_seg_dev is not None
        pass_mult_seg_off = self.mult_seg_off_dev is not None
        pass_depth = self.seg_depth_dev is not None
        pass_evcode = self.seg_evcode_dev is not None
        pass_postdepth = self.seg_postdepth_dev is not None
        pass_levels = self.param_levels_dev is not None
        plane_dims = (tuple(int(d) for d in self.param_planes_dev.shape[:2])
                      if self.param_planes_dev is not None else None)
        n_param_planes = plane_dims[0] * plane_dims[1] if plane_dims else 0
        n_init_planes = (int(self.init_planes_dev.shape[0])
                         if self.init_planes_dev is not None else 0)
        pass_init_rows = self.init_rows_dev is not None
        pass_init = pass_init_rows or n_init_planes > 0
        pass_lag = self.lag_plane_dev is not None
        pass_fa = self.fa_plane_dev is not None
        n_lag_pl = len(self.lag_plane_dev) if pass_lag else 0
        n_fa_pl = len(self.fa_plane_dev) if pass_fa else 0
        lag_slots, fa_slots = self.lag_slots, self.fa_slots
        has_bias = self.out_bias is not None
        n_streams = (5 + int(pass_inf) + int(pass_cens) + int(pass_outeq)
                     + int(pass_mult) + int(pass_mult_off)
                     + int(pass_mult_seg) + int(pass_mult_seg_off)
                     + int(pass_depth) + int(pass_evcode)
                     + int(pass_postdepth) + int(pass_init)
                     + n_lag_pl + n_fa_pl + n_init_planes
                     + n_param_planes)

        def run(*args):
            it = iter(args[:n_streams])
            dt, bol = next(it), next(it)
            inf = next(it) if pass_inf else None
            mask, val, sig = next(it), next(it), next(it)
            cens = next(it) if pass_cens else None
            outeq = next(it) if pass_outeq else None
            mult = next(it) if pass_mult else None
            mult_off = next(it) if pass_mult_off else None
            mult_seg = next(it) if pass_mult_seg else None
            mult_seg_off = next(it) if pass_mult_seg_off else None
            depth = next(it) if pass_depth else None
            evc = next(it) if pass_evcode else None
            postd = next(it) if pass_postdepth else None
            initm = next(it) if pass_init else None
            lagp = (tuple(next(it) for _ in range(n_lag_pl))
                    if pass_lag else None)
            fap = (tuple(next(it) for _ in range(n_fa_pl))
                   if pass_fa else None)
            ipl = (jnp.stack([next(it) for _ in range(n_init_planes)])
                   if n_init_planes else None)
            ppl = None
            if plane_dims:
                flat = [next(it) for _ in range(n_param_planes)]
                ppl = jnp.stack(flat).reshape(
                    plane_dims + flat[0].shape
                )
            rep = iter(args[n_streams:])
            sp_dev, coef = next(rep), next(rep)
            bias = next(rep) if has_bias else None
            levels = next(rep) if pass_levels else None
            init_r = next(rep) if pass_init_rows else None
            return psi_oral(dt, bol, inf, mask, val, sig, cens, sp_dev,
                            structure=structure, obs_outeq=outeq,
                            out_coef=coef, out_bias=bias, param_mult=mult,
                            param_mult_seg=mult_seg, param_offset=mult_off,
                            param_offset_seg=mult_seg_off,
                            param_levels=levels, param_planes=ppl,
                            seg_depth=depth, seg_evcode=evc,
                            seg_postdepth=postd,
                            lag_plane=lagp, fa_plane=fap,
                            lag_slots=lag_slots, fa_slots=fa_slots,
                            init_rows=init_r, init_planes=ipl,
                            init_mask=initm)

        run.n_streams = n_streams
        return run

    def finalize(self, psi_rows, grid) -> np.ndarray:
        """Unpad and aggregate occasion rows -> subjects."""
        psi_rows = np.asarray(psi_rows, dtype=np.float64)[: self.R, : self.S]
        psi = np.zeros((grid.n_subjects, self.S), dtype=np.float64)
        np.add.at(psi, np.asarray(grid.row_subject), psi_rows)
        return psi
