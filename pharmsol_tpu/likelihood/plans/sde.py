"""Fused SDE particle-filter psi plan (`_PallasSdePsiPlan`).

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

class _PallasSdePsiPlan:
    """Validated, padded inputs for a fused pallas SDE particle-filter psi.

    Same contract as _PallasPsiPlan/_PallasOdePsiPlan. Scope: multi-input
    boluses (each active input doses its mapped destination state —
    inject-to-destination, sde/mod.rs:46-79) and infusions (per-input rate
    streams), time-constant covariates plus time-varying ones via
    per-segment affine (a, b) streams (knot-free spans, like the ODE
    tier), lag/fa via per-(row, support) planes + the in-kernel
    pending-dose split march — dynamic (time-dependent /
    tv-cov-reading) closures ride exact per-dose-segment planes with
    static (input, segment) -> slot tables like the ODE tier — linear
    outputs, stratified resampling, BLOQ/ALOQ censoring (normcdf/ccdf
    particle weights, reference parity). Noise draws are
    per-(row, support, trial) — statistically
    equivalent to ``independent`` mode; XLA-vs-pallas parity is therefore
    statistical (exact only at zero diffusion).
    """

    def __init__(self, equation, grid, sp, lowered, row_multiple: int):
        from ...config import BIG_TIME
        from ...engine.grid import CovView
        from ...ops.pallas_ode import make_lane_rhs
        from ...ops.pallas_psi import (
            SP_TILE, extract_linear_out, segment_schedule, streams_from_grid,
        )

        spec = equation.spec
        if getattr(equation, "_resampling", "stratified") != "stratified":
            raise PharmsolError(
                "engine='pallas' SDE psi implements stratified resampling "
                "(the reference scheme) — use the default XLA engine for "
                "systematic resampling"
            )
        self.n_states = int(spec.nstates)
        self.n_out = int(spec.nout)
        self.n_particles = int(spec.nparticles)
        self.seed = int(getattr(equation, "_seed", 0))
        self.em_control = str(getattr(spec, "em_control", "independent"))
        self.ninput = int(spec.ninput)
        ninput = self.ninput
        n_states = self.n_states
        self.n_params = sp.shape[1]
        self.drift = spec.drift
        self.diffusion = spec.diffusion
        self.cov_names = tuple(grid.cov_names)
        cov_values, varying_covs = _classify_covariates(grid)
        self.cov_modes = tuple(
            "affine" if n in varying_covs else "const"
            for n in self.cov_names
        )
        cov0 = {n: float(np.asarray(v)[0]) for n, v in cov_values.items()}
        cov1 = {n: v * 1.31 + 0.17 for n, v in cov0.items()}

        # --- active dose inputs (same discovery as the ODE plan) ---------
        bt_ = np.asarray(grid.rows.bolus_t, np.float64)
        ba_ = np.asarray(grid.rows.bolus_amt, np.float64)
        bi_ = np.asarray(grid.rows.bolus_input)
        real_b = (bt_ < BIG_TIME / 2) & (ba_ != 0.0)
        bolus_inputs = tuple(sorted(
            {int(j) for j in bi_[real_b]})) or (0,)
        it_ = np.asarray(grid.rows.inf_t, np.float64)
        rate_inputs = (0,)
        if it_.size:
            ia_ = np.asarray(grid.rows.inf_amt, np.float64)
            ii_ = np.asarray(grid.rows.inf_input)
            real_i = (it_ < BIG_TIME / 2) & (ia_ != 0.0)
            rate_inputs = tuple(sorted(
                {int(j) for j in ii_[real_i]})) or (0,)
        if max(bolus_inputs + rate_inputs) >= ninput:
            raise PharmsolError(
                f"engine='pallas' SDE psi: a dose targets input "
                f">= ndrugs ({ninput})"
            )
        self.bolus_inputs = bolus_inputs
        self.rate_inputs = rate_inputs
        # inject-to-destination mapping (identity unless metadata declares
        # a destination — engine/sde.py:216-218, sde/mod.rs:46-79)
        dest = spec.bolus_dest
        self.dose_states = tuple(
            int(dest[j]) if dest is not None else int(j)
            for j in bolus_inputs
        )
        if max(self.dose_states) >= n_states:
            raise PharmsolError(
                "engine='pallas' SDE psi: a bolus destination state is out "
                f"of range (nstates={n_states})"
            )

        # --- lag/fa planes -------------------------------------------------
        # static closures: one [R, S] plane per input. Dynamic closures
        # (time-dependent / reading a time-varying covariate): exact
        # per-DOSE-SEGMENT planes with static (input, segment) -> slot
        # tables, built after the streams below (same mechanism as the
        # ODE tier)
        lag_planes = None
        fa_planes = None
        lag_slots = None
        fa_slots = None
        sel = list(bolus_inputs)
        lag_fa_dynamic = False
        if spec.lag is not None or spec.fa is not None:
            try:
                if spec.lag is not None:
                    lp = _decompose_input_planes(
                        spec.lag, sp, grid, ninput, 0.0, "lag")[sel]
                    if np.any(lp != 0.0):
                        for k, j in enumerate(bolus_inputs):
                            if np.any(lp[k] != 0.0):
                                _validate_lag_no_overlap(
                                    lp[k], grid, input_j=j)
                        lag_planes = lp
                if spec.fa is not None:
                    fp = _decompose_input_planes(
                        spec.fa, sp, grid, ninput, 1.0, "fa")[sel]
                    if not np.all(fp == 1.0):
                        fa_planes = fp
            except _InputPlaneDynamic:
                lag_fa_dynamic = True
                lag_planes = fa_planes = None

        # init rows per support (cov-independence probed); covariate-
        # dependent init rides per-(row, support) planes evaluated at the
        # covariate's t=0 value (engine/sim.py:147-152 semantics)
        init_rows = None
        init_planes = None
        if spec.init is not None:
            init_fn = spec.init

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
                    f"engine='pallas' could not probe the SDE init "
                    f"equation: {e}"
                ) from e
            iscale = np.maximum(np.abs(i_ref).max(), 1e-12)
            if np.abs(i_cov - i_ref).max() > 1e-6 * iscale:
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
                        f"covariate-dependent SDE init per row: {e}"
                    ) from e
                if not np.all(np.isfinite(pl_)):
                    raise PharmsolError(
                        "engine='pallas' covariate-dependent SDE init "
                        "evaluation produced non-finite values"
                    )
                init_planes = np.transpose(pl_, (2, 0, 1))  # [n, R, S]
            else:
                init_rows = i_ref.T

        # drift/diffusion must trace through the lane shims (the SDE drift
        # signature has no bolus argument — adapt to the diffeq shim shape)
        drift_fn = spec.drift
        rhs = make_lane_rhs(
            lambda x, p, t, b, rateiv, cov: drift_fn(x, p, t, rateiv, cov),
            n_states, self.n_params, self.ninput,
            rate_inputs=rate_inputs,
        )

        def lane_probe():
            shape = (2, 2)
            z = jnp.zeros((2, 1), jnp.float64)
            xs = [jnp.zeros(shape, jnp.float64) for _ in range(n_states)]
            p_lanes = [jnp.zeros((1, 2), jnp.float64)
                       for _ in range(self.n_params)]
            covd = {
                n: ((z, z) if m == "affine" else z)
                for n, m in zip(self.cov_names, self.cov_modes)
            }
            d = rhs(xs, p_lanes, jnp.zeros(shape, jnp.float64),
                    [z] * len(rate_inputs), covd, shape, jnp.float64)
            from ...ops.pallas_ode import LaneCov, LaneVec

            g = spec.diffusion(LaneVec(p_lanes),
                               jnp.zeros((), jnp.float64), LaneCov(covd))
            comps = (list(g) if isinstance(g, (list, tuple, LaneVec))
                     else [g[i] for i in range(n_states)])
            if len(comps) != n_states:
                raise PharmsolError(
                    f"SDE diffusion returned {len(comps)} components, "
                    f"expected {n_states}"
                )
            return d

        try:
            jax.eval_shape(lane_probe)
        except PharmsolError:
            raise
        except Exception as e:
            raise PharmsolError(
                f"engine='pallas' SDE psi could not trace drift/diffusion "
                f"with lane shims: {e}"
            ) from e

        try:
            streams = streams_from_grid(grid.rows, lowered, inputs=ninput)
        except ValueError as e:
            raise PharmsolError(f"engine='pallas' SDE psi: {e}") from e
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

        if lag_fa_dynamic:
            # exact per-dose-segment planes (engine CovView evaluation at
            # each bolus's original / lag-shifted time), selected by
            # static (input, segment) -> slot tables — ODE-tier mechanism
            nb_ = len(bolus_inputs)
            M_ = streams[0].shape[1]
            dose_cols = [
                m for m in range(M_)
                if any(np.any(np.asarray(streams[1 + k],
                                         np.float64)[:, m] != 0.0)
                       for k in range(nb_))
            ]
            seg_pl = _decompose_input_seg_planes(
                equation, sp, grid, ninput, dose_cols, seg_t0
            )
            has_lag_dyn = spec.lag is not None and any(
                np.any(seg_pl[m][0][sel] != 0.0) for m in dose_cols
            )
            has_fa_dyn = spec.fa is not None and any(
                not np.all(seg_pl[m][1][sel] == 1.0) for m in dose_cols
            )
            if has_lag_dyn:
                for k, j in enumerate(bolus_inputs):
                    bstream = np.asarray(streams[1 + k], np.float64)
                    for r in range(bstream.shape[0]):
                        cols = [m for m in dose_cols
                                if bstream[r, m] != 0.0]
                        cols.sort(key=lambda m: seg_t0[r, m])
                        for m1, m2 in zip(cols, cols[1:]):
                            gap = seg_t0[r, m2] - seg_t0[r, m1]
                            lag_max = seg_pl[m1][0][j, r, :].max()
                            if lag_max >= gap:
                                raise PharmsolError(
                                    f"engine='pallas' SDE lag support "
                                    f"requires each dose's lag to elapse "
                                    f"strictly before the input's next "
                                    f"dose (row {r}, input {j}: max lag "
                                    f"{lag_max:.4g} >= gap {gap:.4g}) — "
                                    "use the default XLA engine"
                                )
                lag_slot_rows = [[-1] * M_ for _ in range(nb_)]
                lag_list = []
                for m in dose_cols:
                    for k in range(nb_):
                        lag_slot_rows[k][m] = len(lag_list)
                        lag_list.append(seg_pl[m][0][sel][k])
                lag_slots = tuple(tuple(rw) for rw in lag_slot_rows)
                lag_planes = np.stack(lag_list)
            if has_fa_dyn:
                fa_slot_rows = [[-1] * M_ for _ in range(nb_)]
                fa_list = []
                for m in dose_cols:
                    for k in range(nb_):
                        fa_slot_rows[k][m] = len(fa_list)
                        fa_list.append(seg_pl[m][1][sel][k])
                fa_slots = tuple(tuple(rw) for rw in fa_slot_rows)
                fa_planes = np.stack(fa_list)
        self.lag_slots = lag_slots
        self.fa_slots = fa_slots

        self.R = streams[0].shape[0]
        self.S = sp.shape[0]
        self.M = streams[0].shape[1]
        # the kernel processes 8 rows per grid step (Mosaic sublane blocks)
        rm = max(8, row_multiple)
        self.Rp = ((self.R + rm - 1) // rm) * rm
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
        # the kernel's fa planes are only consulted together with a lag or
        # standalone; a model with fa but no lag still scales arrivals —
        # but a lagged model WITHOUT fa planes needs none (scale 1)

        def pad_support_cols(a):
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
        self.init_rows = (
            jnp.asarray(pad_support_cols(init_rows), dtype=fd)
            if init_rows is not None else None
        )
        self.init_planes_dev = None
        if init_planes is not None:
            ipl = np.stack(
                [pad_rows(init_planes[s]) for s in range(n_states)]
            )  # [n, Rp, S]
            self.init_planes_dev = jnp.asarray(
                pad_support_cols(ipl), dtype=fd
            )
        out_fn = spec.out
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
                f"engine='pallas' SDE psi could not extract linear output "
                f"coefficients (non-linear output?): {e}"
            ) from e
        self.out_coef = jnp.asarray(np.transpose(C, (1, 2, 0)), dtype=fd)
        self.out_bias = jnp.asarray(b.T, dtype=fd) if np.any(b) else None
        self.pass_inf = bool(np.any(seg_rate3))
        i_cens = 1 + self.n_bolus_in + self.n_rate_in + 3
        self.pass_cens = bool(np.any(np.asarray(streams[i_cens])))
        self.pass_outeq = self.n_out > 1

    def cache_key(self, *extra):
        return ("pallas_sde", self.n_states, self.n_params, self.ninput,
                self.n_particles, self.seed, self.Rp, self.Sp, self.M,
                self.bolus_inputs, self.rate_inputs, self.dose_states,
                self.pass_inf, self.pass_cens, self.pass_outeq, self.n_out,
                self.out_bias is not None, self.init_rows is not None,
                self.init_planes_dev is not None,
                self.cov_names, self.cov_modes,
                self.lag_planes_dev is not None,
                self.fa_planes_dev is not None,
                self.lag_slots, self.fa_slots,
                str(self.fd),
                self.em_control) + extra

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
        if self.init_rows is not None:
            out.append(self.init_rows)
        out.append(self.out_coef)
        if self.out_bias is not None:
            out.append(self.out_bias)
        return tuple(out)

    def runner(self):
        from ...ops.pallas_sde import psi_sde

        n_states = self.n_states
        n_particles = self.n_particles
        ninput = self.ninput
        dose_states = self.dose_states
        rate_inputs = self.rate_inputs
        seed = self.seed
        em_control = self.em_control
        drift, diffusion = self.drift, self.diffusion
        pass_inf = self.pass_inf
        pass_cens = self.pass_cens
        pass_outeq = self.pass_outeq
        nb, nr = self.n_bolus_in, self.n_rate_in
        n_init_planes = (int(self.init_planes_dev.shape[0])
                         if self.init_planes_dev is not None else 0)
        has_init_rows = self.init_rows is not None
        has_init = has_init_rows or n_init_planes > 0
        has_bias = self.out_bias is not None
        cov_names = self.cov_names
        cov_modes = self.cov_modes
        n_lag_pl = len(self.lag_planes_dev) if self.lag_planes_dev else 0
        n_fa_pl = len(self.fa_planes_dev) if self.fa_planes_dev else 0
        lag_slots, fa_slots = self.lag_slots, self.fa_slots
        # dt + mask + val + sig + t0 = 5 fixed streams
        n_streams = (5 + nb + (nr if pass_inf else 0) + int(pass_cens)
                     + int(pass_outeq)
                     + int(has_init) + n_lag_pl + n_fa_pl + n_init_planes
                     + sum(2 if m == "affine" else 1 for m in cov_modes))

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
                    if n_lag_pl else None)
            fap = (tuple(next(it) for _ in range(n_fa_pl))
                   if n_fa_pl else None)
            ipl = (jnp.stack([next(it) for _ in range(n_init_planes)])
                   if n_init_planes else None)
            rep = iter(args[n_streams:])
            sp_dev = next(rep)
            irows = next(rep) if has_init_rows else None
            coef = next(rep)
            bias = next(rep) if has_bias else None
            return psi_sde(
                dt, bols, infs, mask, val, sig, t0, sp_dev, drift, diffusion,
                obs_cens=cens,
                n_states=n_states, n_particles=n_particles, ninput=ninput,
                dose_states=dose_states, rate_inputs=rate_inputs,
                seed=seed, obs_outeq=outeq,
                out_coef=coef, out_bias=bias, init_rows=irows,
                init_planes=ipl,
                init_mask=imask, cov_streams=covs, cov_names=cov_names,
                cov_modes=dict(zip(cov_names, cov_modes)),
                lag_planes=lagp, fa_planes=fap,
                lag_slots=lag_slots, fa_slots=fa_slots,
                em_control=em_control,
            )

        run.n_streams = n_streams
        return run

    def finalize(self, psi_rows, grid) -> np.ndarray:
        psi_rows = np.asarray(psi_rows, dtype=np.float64)[: self.R, : self.S]
        psi = np.zeros((grid.n_subjects, self.S), dtype=np.float64)
        np.add.at(psi, np.asarray(grid.row_subject), psi_rows)
        return psi
