"""Pallas TPU kernel: fused psi tile for the 2-cmt oral analytical model.

The flagship workload (BASELINE: 2-compartment oral, one dose schedule per
subject, psi over subjects x support points) gets a hand-scheduled kernel:

- grid tiles of (SUB_TILE subjects) x (SP_TILE support points) live in VMEM;
- support-dependent eigen quantities are computed once per tile (the
  "prepared" split), states are held as [SUB_TILE, SP_TILE] lanes, and the
  segment loop is fully unrolled (M is small and static);
- per-segment work is exactly three exponentials plus the affine propagator,
  and the log-likelihood accumulates in VMEM — nothing round-trips to HBM
  until the final [SUB_TILE, SP_TILE] psi tile is written.

Mosaic-friendliness notes: every intermediate stays 2-D (column slices use
``ref[:, m:m+1]``), the support matrix is passed transposed ([5, S] so a
parameter row is a [1, SP_TILE] lane vector), and segment streams are
lane-padded to 128.

This is an optional accelerator for common regimen shapes (multi-dose bolus
and constant-rate infusions into central, additive/proportional error with
shared sigma inputs); the general engine remains the reference path.
Infusion segments propagate via the steady-state offset
``x(dt) = ss + expm(A dt)(x - ss)``; for bolus-only streams the infusion
compute and its input stream are statically compiled out (``has_inf``).
``psi_2cmt_oral`` runs in interpret mode off-TPU, which is also how the
parity tests run on CPU.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

LOG_2PI = math.log(2.0 * math.pi)

SUB_TILE = 8  # minimum row-padding unit (callers pad R to a multiple of this)
SP_TILE = 128
SEG_PAD = 128  # segment streams are lane-padded to this width
# Kernel tile sizes: the largest row/support blocks dividing R/S are used
# per call, capped so row_block * sp_block stays within the known-compiling
# VMEM budget. Bigger tiles amortize grid-step overhead dramatically
# (measured on v5e at 16384x512: (8,128) -> 3.9 B sims/s, (512,256) ->
# 13-26 B sims/s depending on chip hour, bit-identical output); tiles with
# row_block * sp_block > 512*256 fail to compile (VMEM).
ROW_BLOCKS = (512, 256, 128, 64, 32, 16, 8)
SP_BLOCKS = (256, 128)
TILE_BUDGET = 512 * 256


def _log_ndtr(x):
    """Mosaic-compatible log of the standard normal CDF.

    Mosaic lowers neither acos nor erf, so: Abramowitz-Stegun 7.1.26 erf for
    x >= -3 (abs err 1.5e-7) and the Laplace continued fraction for the Mills
    ratio in the left tail. Max abs error ~6e-5 over [-30, 8] in float32 —
    well inside assay-likelihood noise. The engine's exact log_ndtr remains
    the reference path.
    """
    sqrt2 = math.sqrt(2.0)
    u = x / sqrt2
    a = jnp.abs(u)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    erf_abs = 1.0 - poly * jnp.exp(-a * a)
    erf = jnp.where(u >= 0.0, erf_abs, -erf_abs)
    log_direct = jnp.log(jnp.maximum(0.5 * (1.0 + erf), 1e-38))
    # tail: logPhi(x) = logpdf(x) - log(cf), cf = Laplace continued fraction
    z = jnp.maximum(-x, 3.0)
    cf = z + 9.0
    for k in range(8, 0, -1):
        cf = z + k / cf
    log_tail = -0.5 * x * x - 0.5 * LOG_2PI - jnp.log(cf)
    return jnp.where(x < -3.0, log_tail, log_direct)


def _obs_ll(val, pred, sig, mask, s, has_cens: bool):
    """Per-observation log-likelihood lane: normal pdf, or log CDF/CCDF for
    censored rows (s = +1 BLOQ, -1 ALOQ, 0 none; loglik.py parity)."""
    z = (val - pred) / sig
    normal = -0.5 * LOG_2PI - jnp.log(sig) - 0.5 * z * z
    if not has_cens:
        return mask * normal
    return mask * jnp.where(s == 0.0, normal, _log_ndtr(s * z))


def _psi_kernel(seg_dt_ref, seg_bolus_ref, seg_rateiv_ref, obs_mask_ref,
                obs_value_ref, obs_sigma_ref, obs_cens_ref, ke_ref, ka_ref,
                kcp_ref, kpc_ref, v_ref, out_ref, *, n_seg: int,
                has_inf: bool = True, has_cens: bool = False):
    """One (SUB_TILE, SP_TILE) psi tile.

    seg_*:  [SUB_TILE, SEG_PAD]  per-subject segment streams (cols >= n_seg unused)
    ke..v:  [1, SP_TILE]         support parameter rows
    out:    [SUB_TILE, SP_TILE]  log-likelihood

    Mosaic note: per-segment scalars are extracted with one-hot lane
    reductions instead of strided slices (sub-tile slicing fails to
    legalize on some Mosaic versions).
    """
    ke = ke_ref[:, :]  # [1, SP_TILE]
    ka = ka_ref[:, :]
    kcp = kcp_ref[:, :]
    kpc = kpc_ref[:, :]
    v = v_ref[:, :]

    # prepare: eigenvalues + ratios once per tile
    disc = (ke + kcp + kpc) ** 2 - 4.0 * ke * kpc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    l1 = (ke + kcp + kpc + sq) * 0.5
    l2 = (ke + kcp + kpc - sq) * 0.5
    inv_denom = 1.0 / (l1 - l2)
    inv_ka_l1 = 1.0 / (ka - l1)
    inv_ka_l2 = 1.0 / (ka - l2)
    inv_ke = 1.0 / ke
    ss_ratio2 = kcp / (ke * kpc)

    shape = (out_ref.shape[0], out_ref.shape[1])
    zeros = jnp.zeros(shape, dtype=out_ref.dtype)
    x0 = zeros  # depot
    x1 = zeros  # central
    x2 = zeros  # peripheral
    ll = zeros

    dts = seg_dt_ref[:, :]
    bols = seg_bolus_ref[:, :]
    rates = seg_rateiv_ref[:, :] if has_inf else None
    masks = obs_mask_ref[:, :]
    vals = obs_value_ref[:, :]
    sigs = obs_sigma_ref[:, :]
    censs = obs_cens_ref[:, :] if has_cens else None
    lane = jax.lax.broadcasted_iota(jnp.int32, dts.shape, 1)

    one = jnp.ones(shape, dtype=out_ref.dtype)
    for m in range(n_seg):
        sel = (lane == np.int32(m)).astype(dts.dtype)

        def col(a):
            return jnp.sum(a * sel, axis=1, keepdims=True)  # [SUB_TILE, 1]

        dt = col(dts)
        bol = col(bols)
        mask = col(masks)
        val = col(vals)
        sig = col(sigs) + (1.0 - col(masks))  # padded sigma lanes were zeroed

        # observation before dose: central/v vs value
        s_c = col(censs) if has_cens else None
        ll = ll + _obs_ll(val, x1 / v, sig, mask, s_c, has_cens)

        # bolus into depot
        x0 = x0 + bol

        # propagate over dt (2-cmt oral closed form, prepared quantities)
        e1 = jnp.exp(-l1 * dt)
        e2 = jnp.exp(-l2 * dt)
        eka = jnp.exp(-ka * dt)
        # infusion into central: steady-state offset, hom propagates (x - ss);
        # compiled out entirely for bolus-only workloads (has_inf static)
        if has_inf:
            r = col(rates)
            ss1 = r * inv_ke
            ss2 = r * ss_ratio2
            y1 = x1 - ss1
            y2 = x2 - ss2
        else:
            y1, y2 = x1, x2
        hom0 = ((l1 - kpc) * e1 + (kpc - l2) * e2) * y1 + kpc * (e2 - e1) * y2
        hom1 = kcp * (e2 - e1) * y1 + ((l1 - ke - kcp) * e1 + (ke + kcp - l2) * e2) * y2
        abs0 = (l1 - kpc) * inv_ka_l1 * (e1 - eka) + (kpc - l2) * inv_ka_l2 * (e2 - eka)
        abs1 = kcp * (inv_ka_l2 * (e2 - eka) - inv_ka_l1 * (e1 - eka))
        scale = ka * x0 * inv_denom
        nx1 = hom0 * inv_denom + abs0 * scale
        nx2 = hom1 * inv_denom + abs1 * scale
        if has_inf:
            nx1 = nx1 + ss1
            nx2 = nx2 + ss2
        live = dt > 0.0
        x1 = jnp.where(live, nx1, x1)
        x2 = jnp.where(live, nx2, x2)
        x0 = jnp.where(live, x0 * eka, x0)

    out_ref[:, :] = ll


def _psi_kernel_1cmt(seg_dt_ref, seg_bolus_ref, seg_rateiv_ref, obs_mask_ref,
                     obs_value_ref, obs_sigma_ref, obs_cens_ref, ka_ref,
                     ke_ref, v_ref, out_ref, *, n_seg: int,
                     has_inf: bool = True, has_cens: bool = False):
    """1-cmt oral psi tile: states [depot, central], p rows [ka, ke, v]."""
    ka = ka_ref[:, :]
    ke = ke_ref[:, :]
    v = v_ref[:, :]
    ratio = ka / (ka - ke)
    inv_ke = 1.0 / ke

    shape = (out_ref.shape[0], out_ref.shape[1])
    zeros = jnp.zeros(shape, dtype=out_ref.dtype)
    x0 = zeros  # depot
    x1 = zeros  # central
    ll = zeros
    one = jnp.ones(shape, dtype=out_ref.dtype)

    dts = seg_dt_ref[:, :]
    bols = seg_bolus_ref[:, :]
    rates = seg_rateiv_ref[:, :] if has_inf else None
    masks = obs_mask_ref[:, :]
    vals = obs_value_ref[:, :]
    sigs = obs_sigma_ref[:, :]
    censs = obs_cens_ref[:, :] if has_cens else None
    lane = jax.lax.broadcasted_iota(jnp.int32, dts.shape, 1)

    for m in range(n_seg):
        sel = (lane == np.int32(m)).astype(dts.dtype)

        def col(a):
            return jnp.sum(a * sel, axis=1, keepdims=True)

        dt = col(dts)
        bol = col(bols)
        mask = col(masks)
        val = col(vals)
        sig = col(sigs) + (1.0 - col(masks))

        s_c = col(censs) if has_cens else None
        ll = ll + _obs_ll(val, x1 / v, sig, mask, s_c, has_cens)

        x0 = x0 + bol
        eka = jnp.exp(-ka * dt)
        eke = jnp.exp(-ke * dt)
        nx1 = x1 * eke + ratio * x0 * (eke - eka)
        if has_inf:
            nx1 = nx1 + col(rates) * inv_ke * (1.0 - eke)
        live = dt > 0.0
        x1 = jnp.where(live, nx1, x1)
        x0 = jnp.where(live, x0 * eka, x0)

    out_ref[:, :] = ll


def _psi_kernel_3cmt(seg_dt_ref, seg_bolus_ref, seg_rateiv_ref, obs_mask_ref,
                     obs_value_ref, obs_sigma_ref, obs_cens_ref, ka_ref,
                     k10_ref, k12_ref, k13_ref, k21_ref, k31_ref, v_ref,
                     l1_ref, l2_ref, l3_ref, out_ref, *, n_seg: int,
                     has_inf: bool = True, has_cens: bool = False):
    """3-cmt oral psi tile: states [depot, central, p2, p3].

    Support rows: [ka, k10, k12, k13, k21, k31, v]. The mammillary rate
    matrix's three decay constants come from the classic trigonometric cubic
    solution (all roots real positive for mammillary models); the matrix
    exponential uses Lagrange spectral projectors
    ``P_k = prod_{j!=k}(A + l_j I) / (l_j - l_k)``, prepared once per tile.
    Degenerate (repeated-eigenvalue) supports are the caller's concern — the
    general engine path handles those.
    """
    ka = ka_ref[:, :]
    k10 = k10_ref[:, :]
    k12 = k12_ref[:, :]
    k13 = k13_ref[:, :]
    k21 = k21_ref[:, :]
    k31 = k31_ref[:, :]
    v = v_ref[:, :]
    # decay constants are prepared OUTSIDE the kernel (Mosaic has no acos
    # lowering, and the cubic solve is support-only work) — see
    # _prep_3cmt_eigenvalues
    l1 = l1_ref[:, :]
    l2 = l2_ref[:, :]
    l3 = l3_ref[:, :]

    # rate matrix (central, p2, p3) and its square, as [1, SP_TILE] lanes
    a11 = -(k10 + k12 + k13)
    m11 = a11 * a11 + k21 * k12 + k31 * k13
    m12 = k21 * (a11 - k21)
    m13 = k31 * (a11 - k31)
    m21 = k12 * (a11 - k21)
    m22 = k12 * k21 + k21 * k21
    m23 = k12 * k31
    m31 = k13 * (a11 - k31)
    m32 = k13 * k21
    m33 = k13 * k31 + k31 * k31

    lam = (l1, l2, l3)
    # per-eigenvalue projector entries and depot columns, prepared per tile
    proj = []
    for k in range(3):
        lk = lam[k]
        lj, ll_ = lam[(k + 1) % 3], lam[(k + 2) % 3]
        s = lj + ll_
        pr = lj * ll_
        invd = 1.0 / ((lj - lk) * (ll_ - lk))
        P = (
            (m11 + s * a11 + pr) * invd,
            (m12 + s * k21) * invd,
            (m13 + s * k31) * invd,
            (m21 + s * k12) * invd,
            (m22 + s * (-k21) + pr) * invd,
            m23 * invd,
            (m31 + s * k13) * invd,
            m32 * invd,
            (m33 + s * (-k31) + pr) * invd,
        )
        inv_ka_lk = 1.0 / (ka - lk)
        proj.append((lk, P, inv_ka_lk))
    inv_k10 = 1.0 / k10
    ss_ratio2 = k12 / (k10 * k21)
    ss_ratio3 = k13 / (k10 * k31)

    shape = (out_ref.shape[0], out_ref.shape[1])
    zeros = jnp.zeros(shape, dtype=out_ref.dtype)
    x0 = zeros  # depot
    x1 = zeros  # central
    x2 = zeros  # p2
    x3 = zeros  # p3
    ll = zeros
    one = jnp.ones(shape, dtype=out_ref.dtype)

    dts = seg_dt_ref[:, :]
    bols = seg_bolus_ref[:, :]
    rates = seg_rateiv_ref[:, :] if has_inf else None
    masks = obs_mask_ref[:, :]
    vals = obs_value_ref[:, :]
    sigs = obs_sigma_ref[:, :]
    censs = obs_cens_ref[:, :] if has_cens else None
    lane = jax.lax.broadcasted_iota(jnp.int32, dts.shape, 1)

    for m in range(n_seg):
        sel = (lane == np.int32(m)).astype(dts.dtype)

        def col(a):
            return jnp.sum(a * sel, axis=1, keepdims=True)

        dt = col(dts)
        bol = col(bols)
        r = col(rates) if has_inf else None
        mask = col(masks)
        val = col(vals)
        sig = col(sigs) + (1.0 - col(masks))

        s_c = col(censs) if has_cens else None
        ll = ll + _obs_ll(val, x1 / v, sig, mask, s_c, has_cens)

        x0 = x0 + bol
        eka = jnp.exp(-ka * dt)
        # infusion into central: steady-state of the mammillary block
        if has_inf:
            ss1 = r * inv_k10
            ss2 = r * ss_ratio2
            ss3 = r * ss_ratio3
            y1 = x1 - ss1
            y2 = x2 - ss2
            y3 = x3 - ss3
            nx1 = ss1
            nx2 = ss2
            nx3 = ss3
        else:
            y1, y2, y3 = x1, x2, x3
            nx1 = zeros
            nx2 = zeros
            nx3 = zeros
        for lk, P, inv_ka_lk in proj:
            ek = jnp.exp(-lk * dt)
            # homogeneous part: ek * (P @ (x - ss))
            nx1 = nx1 + ek * (P[0] * y1 + P[1] * y2 + P[2] * y3)
            nx2 = nx2 + ek * (P[3] * y1 + P[4] * y2 + P[5] * y3)
            nx3 = nx3 + ek * (P[6] * y1 + P[7] * y2 + P[8] * y3)
            # depot forcing: ka*x0 * (ek - eka)/(ka - lk) * (P @ e1)
            f = ka * x0 * (ek - eka) * inv_ka_lk
            nx1 = nx1 + f * P[0]
            nx2 = nx2 + f * P[3]
            nx3 = nx3 + f * P[6]
        live = dt > 0.0
        x1 = jnp.where(live, nx1, x1)
        x2 = jnp.where(live, nx2, x2)
        x3 = jnp.where(live, nx3, x3)
        x0 = jnp.where(live, x0 * eka, x0)

    out_ref[:, :] = ll


def _psi_kernel_1cmt_iv(seg_dt_ref, seg_bolus_ref, seg_rateiv_ref, obs_mask_ref,
                        obs_value_ref, obs_sigma_ref, obs_cens_ref, ke_ref,
                        v_ref, out_ref, *, n_seg: int,
                        has_inf: bool = True, has_cens: bool = False):
    """1-cmt IV bolus psi tile: state [central], p rows [ke, v]."""
    ke = ke_ref[:, :]
    v = v_ref[:, :]
    inv_ke = 1.0 / ke

    shape = (out_ref.shape[0], out_ref.shape[1])
    zeros = jnp.zeros(shape, dtype=out_ref.dtype)
    x1 = zeros
    ll = zeros
    one = jnp.ones(shape, dtype=out_ref.dtype)

    dts = seg_dt_ref[:, :]
    bols = seg_bolus_ref[:, :]
    rates = seg_rateiv_ref[:, :] if has_inf else None
    masks = obs_mask_ref[:, :]
    vals = obs_value_ref[:, :]
    sigs = obs_sigma_ref[:, :]
    censs = obs_cens_ref[:, :] if has_cens else None
    lane = jax.lax.broadcasted_iota(jnp.int32, dts.shape, 1)

    for m in range(n_seg):
        sel = (lane == np.int32(m)).astype(dts.dtype)

        def col(a):
            return jnp.sum(a * sel, axis=1, keepdims=True)

        dt = col(dts)
        bol = col(bols)
        r = col(rates) if has_inf else None
        mask = col(masks)
        val = col(vals)
        sig = col(sigs) + (1.0 - col(masks))

        s_c = col(censs) if has_cens else None
        ll = ll + _obs_ll(val, x1 / v, sig, mask, s_c, has_cens)

        x1 = x1 + bol  # bolus into central
        live = dt > 0.0
        if has_inf:
            ss = r * inv_ke
            x1 = jnp.where(live, ss + (x1 - ss) * jnp.exp(-ke * dt), x1)
        else:
            x1 = jnp.where(live, x1 * jnp.exp(-ke * dt), x1)

    out_ref[:, :] = ll


def _psi_kernel_2cmt_iv(seg_dt_ref, seg_bolus_ref, seg_rateiv_ref, obs_mask_ref,
                        obs_value_ref, obs_sigma_ref, obs_cens_ref, ke_ref,
                        kcp_ref, kpc_ref, v_ref, out_ref, *, n_seg: int,
                        has_inf: bool = True, has_cens: bool = False):
    """2-cmt IV bolus psi tile: states [central, peripheral], p rows
    [ke, kcp, kpc, v] (the reference's "Repeat" workload shape,
    benches/common/mod.rs:7)."""
    ke = ke_ref[:, :]
    kcp = kcp_ref[:, :]
    kpc = kpc_ref[:, :]
    v = v_ref[:, :]

    disc = (ke + kcp + kpc) ** 2 - 4.0 * ke * kpc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    l1 = (ke + kcp + kpc + sq) * 0.5
    l2 = (ke + kcp + kpc - sq) * 0.5
    inv_denom = 1.0 / (l1 - l2)
    inv_ke = 1.0 / ke
    ss_ratio2 = kcp / (ke * kpc)

    shape = (out_ref.shape[0], out_ref.shape[1])
    zeros = jnp.zeros(shape, dtype=out_ref.dtype)
    x1 = zeros  # central
    x2 = zeros  # peripheral
    ll = zeros
    one = jnp.ones(shape, dtype=out_ref.dtype)

    dts = seg_dt_ref[:, :]
    bols = seg_bolus_ref[:, :]
    rates = seg_rateiv_ref[:, :] if has_inf else None
    masks = obs_mask_ref[:, :]
    vals = obs_value_ref[:, :]
    sigs = obs_sigma_ref[:, :]
    censs = obs_cens_ref[:, :] if has_cens else None
    lane = jax.lax.broadcasted_iota(jnp.int32, dts.shape, 1)

    for m in range(n_seg):
        sel = (lane == np.int32(m)).astype(dts.dtype)

        def col(a):
            return jnp.sum(a * sel, axis=1, keepdims=True)

        dt = col(dts)
        bol = col(bols)
        r = col(rates) if has_inf else None
        mask = col(masks)
        val = col(vals)
        sig = col(sigs) + (1.0 - col(masks))

        s_c = col(censs) if has_cens else None
        ll = ll + _obs_ll(val, x1 / v, sig, mask, s_c, has_cens)

        x1 = x1 + bol  # bolus into central
        if has_inf:
            ss1 = r * inv_ke
            ss2 = r * ss_ratio2
            y1 = x1 - ss1
            y2 = x2 - ss2
        else:
            y1, y2 = x1, x2
        e1 = jnp.exp(-l1 * dt)
        e2 = jnp.exp(-l2 * dt)
        nx1 = (((l1 - kpc) * e1 + (kpc - l2) * e2) * y1
               + kpc * (e2 - e1) * y2) * inv_denom
        nx2 = (kcp * (e2 - e1) * y1
               + ((l1 - ke - kcp) * e1 + (ke + kcp - l2) * e2) * y2) * inv_denom
        if has_inf:
            nx1 = nx1 + ss1
            nx2 = nx2 + ss2
        live = dt > 0.0
        x1 = jnp.where(live, nx1, x1)
        x2 = jnp.where(live, nx2, x2)

    out_ref[:, :] = ll


def _prep_3cmt_eigenvalues(sp_rows):
    """Decay constants of the mammillary 3-cmt rate matrix, per support row.

    Trigonometric solution of the monic cubic l^3 - A l^2 + B l - C with the
    symmetric sums of the three (real, positive) decay constants. Runs in
    XLA before the pallas_call — support-only work, one cubic per support
    point.
    """
    _, k10, k12, k13, k21, k31, _ = sp_rows
    A = k10 + k12 + k13 + k21 + k31
    B = k10 * k21 + k10 * k31 + k12 * k31 + k13 * k21 + k21 * k31
    C = k10 * k21 * k31
    p = B - A * A / 3.0
    q = -2.0 * A * A * A / 27.0 + A * B / 3.0 - C
    mp3 = jnp.maximum(-p / 3.0, 1e-30)
    rt = jnp.sqrt(mp3)
    arg = jnp.clip(3.0 * q / (2.0 * jnp.minimum(p, -1e-30)) / rt, -1.0, 1.0)
    phi = jnp.arccos(arg) / 3.0
    two_pi_3 = 2.0 * math.pi / 3.0
    l1 = 2.0 * rt * jnp.cos(phi) + A / 3.0
    l2 = 2.0 * rt * jnp.cos(phi - two_pi_3) + A / 3.0
    l3 = 2.0 * rt * jnp.cos(phi - 2.0 * two_pi_3) + A / 3.0
    return [l1, l2, l3]


STRUCTURES = {
    # name -> (kernel fn, n support params, prep fn -> extra p rows)
    "two_compartments_with_absorption": (_psi_kernel, 5, None),
    "one_compartment_with_absorption": (_psi_kernel_1cmt, 3, None),
    "three_compartments_with_absorption": (_psi_kernel_3cmt, 7, _prep_3cmt_eigenvalues),
    "one_compartment": (_psi_kernel_1cmt_iv, 2, None),
    "two_compartments": (_psi_kernel_2cmt_iv, 4, None),
}


def _pad_lanes(a, width: int):
    pad = width - a.shape[1]
    if pad <= 0:
        return a
    return jnp.concatenate([a, jnp.zeros((a.shape[0], pad), dtype=a.dtype)], axis=1)


def psi_oral(
    seg_dt, seg_bolus, seg_rateiv, obs_mask, obs_value, obs_sigma, obs_cens,
    support,
    structure: str = "two_compartments_with_absorption",
    interpret: Optional[bool] = None,
):
    """Fused psi for bolus/infusion analytical structures.

    Arguments are per-subject segment streams [R, M] (sorted breakpoints,
    observation-before-bolus semantics baked in; ``seg_rateiv`` is the
    infusion rate into central active during each segment, or None;
    ``obs_cens`` is the per-segment censoring sign, +1 BLOQ / -1 ALOQ / 0,
    or None) and the
    support matrix in kernel parameter order ([ke, ka, kcp, kpc, v] for
    2-cmt oral, [ka, ke, v] for 1-cmt oral). Returns psi [R, S].

    R must be a multiple of SUB_TILE and S a multiple of SP_TILE (pad rows
    with dt=0/mask=0 and supports by repetition).
    """
    from jax.experimental import pallas as pl

    if structure not in STRUCTURES:
        raise ValueError(
            f"unknown pallas psi structure `{structure}` "
            f"(available: {', '.join(sorted(STRUCTURES))})"
        )
    kernel_fn, n_params, prep_fn = STRUCTURES[structure]
    R, M = seg_dt.shape
    S = support.shape[0]
    if support.shape[1] != n_params:
        raise ValueError(f"{structure} needs {n_params} support columns")
    if R % SUB_TILE or S % SP_TILE:
        raise ValueError(
            f"R ({R}) must be a multiple of {SUB_TILE} and S ({S}) of {SP_TILE}"
        )
    if M > SEG_PAD:
        raise ValueError(f"segment stream too long ({M} > {SEG_PAD})")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    dtype = seg_dt.dtype
    if not interpret and dtype != jnp.float32:
        raise ValueError(
            f"compiled pallas psi kernels are float32-only (got {dtype}); "
            "cast the streams/support to float32 or pass interpret=True"
        )

    def _static_any(a):
        if a is None:
            return False
        try:  # concrete host arrays: compile the feature out when all-zero
            return bool(np.any(np.asarray(a)))
        except Exception:
            return True  # traced value: keep the general path

    has_inf = _static_any(seg_rateiv)
    has_cens = _static_any(obs_cens)
    zeros_like_dt = None
    if seg_rateiv is None:
        seg_rateiv = zeros_like_dt = jnp.zeros_like(jnp.asarray(seg_dt, dtype))
    if obs_cens is None:
        obs_cens = zeros_like_dt if zeros_like_dt is not None else (
            jnp.zeros_like(jnp.asarray(seg_dt, dtype))
        )
    full = [
        _pad_lanes(jnp.asarray(a, dtype), SEG_PAD)
        for a in (seg_dt, seg_bolus, seg_rateiv, obs_mask, obs_value,
                  obs_sigma, obs_cens)
    ]
    # zero out sigma where masked; the kernel re-adds 1.0 on masked lanes so
    # log() stays finite
    full[5] = full[5] * full[3]
    sp = jnp.asarray(support, dtype)
    sp_rows = [sp[:, i].reshape(1, S) for i in range(n_params)]
    if prep_fn is not None:
        sp_rows = sp_rows + [jnp.asarray(r, dtype) for r in prep_fn(sp_rows)]

    inner = functools.partial(
        kernel_fn, n_seg=M, has_inf=has_inf, has_cens=has_cens
    )
    # all-zero optional streams are dropped from the pipeline entirely
    # (no DMA, no VMEM block); the kernel never reads those refs
    include = [True, True, has_inf, True, True, True, has_cens]
    streams = [a for a, inc in zip(full, include) if inc]
    n_streams = len(streams)
    if all(include):
        kernel = inner
    else:
        def kernel(*refs):
            it = iter(refs[:n_streams])
            stream_refs = [next(it) if inc else None for inc in include]
            inner(*stream_refs, *refs[n_streams:])
    row_block = next(b for b in ROW_BLOCKS if R % b == 0)
    sp_block = next(b for b in SP_BLOCKS if S % b == 0)
    while row_block * sp_block > TILE_BUDGET and row_block > 8:
        row_block //= 2
    row_spec = pl.BlockSpec((row_block, SEG_PAD), lambda i, j: (i, 0))
    p_spec = pl.BlockSpec((1, sp_block), lambda i, j: (0, j))
    def call():
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, S), dtype),
            grid=(R // row_block, S // sp_block),
            in_specs=[row_spec] * n_streams + [p_spec] * len(sp_rows),
            out_specs=pl.BlockSpec((row_block, sp_block), lambda i, j: (i, j)),
            interpret=interpret,
        )(*streams, *sp_rows)

    if dtype == jnp.float32:
        # Trace with x64 disabled: under jax_enable_x64 the grid pipeline
        # picks up an i64 scalar that this environment's Mosaic toolchain
        # cannot legalize ("func.return (i32, i64)"). All operands are
        # explicitly 32-bit, so disabling x64 changes nothing else.
        with jax.enable_x64(False):
            return call()
    return call()


def segment_stream_from_schedule(obs_times, obs_values, obs_sigmas, dose: float):
    """Build the [M] segment stream for one bolus-at-0 oral schedule.

    Breakpoints: bolus@0 then each observation; segment m spans to the next
    breakpoint. Returns (seg_dt, seg_bolus, seg_rateiv, obs_mask, obs_value,
    obs_sigma, obs_cens) each [M] with M = n_obs + 1.
    """
    obs_times = np.asarray(obs_times, dtype=np.float64)
    n = obs_times.shape[0]
    times = np.concatenate([[0.0], obs_times])
    seg_dt = np.concatenate([np.diff(times), [0.0]])
    seg_bolus = np.zeros(n + 1)
    seg_bolus[0] = dose
    seg_rateiv = np.zeros(n + 1)
    obs_mask = np.concatenate([[0.0], np.ones(n)])
    obs_value = np.concatenate([[0.0], np.asarray(obs_values, dtype=np.float64)])
    obs_sigma = np.concatenate([[1.0], np.asarray(obs_sigmas, dtype=np.float64)])
    obs_cens = np.zeros(n + 1)
    return seg_dt, seg_bolus, seg_rateiv, obs_mask, obs_value, obs_sigma, obs_cens


def psi_2cmt_oral(seg_dt, seg_bolus, seg_rateiv, obs_mask, obs_value, obs_sigma,
                  obs_cens, support, interpret: Optional[bool] = None):
    """Back-compat alias for the 2-cmt oral structure."""
    return psi_oral(seg_dt, seg_bolus, seg_rateiv, obs_mask, obs_value, obs_sigma,
                    obs_cens, support,
                    structure="two_compartments_with_absorption",
                    interpret=interpret)


def streams_from_grid(rows, lowered_em):
    """Convert stacked OccasionArrays rows into kernel segment streams.

    Requirements of the fused kernel's model shape: a single bolus route into
    the structure's dose compartment (depot for *_with_absorption, central
    for IV structures), infusions into central only, single output central/v,
    no covariates/lag/fa/seq, additive or proportional assay error.
    BLOQ/ALOQ-censored observations contribute log CDF/CCDF terms.
    Multi-dose schedules like the reference's "Repeat" workload
    (benches/common/mod.rs:7) and mixed bolus+infusion regimens are
    supported; the per-segment infusion rate uses the same midpoint
    containment as the general engine (grid.build_segments).

    Returns (seg_dt, seg_bolus, seg_rateiv, obs_mask, obs_value, obs_sigma,
    obs_cens), each [R, M].
    """
    from ..config import BIG_TIME

    bolus_t = np.asarray(rows.bolus_t, dtype=np.float64)
    inf_t = np.asarray(rows.inf_t, dtype=np.float64)
    valid_rows = np.asarray(rows.obs_valid) & np.asarray(rows.obs_has_value)
    real_bolus = bolus_t < BIG_TIME / 2
    if np.any(np.asarray(rows.bolus_input)[real_bolus] != 0):
        raise ValueError(
            "pallas psi fast path supports boluses into input 0 (the "
            "structure's dose compartment) only"
        )
    NI = inf_t.shape[1]
    if NI:
        real_inf = inf_t < BIG_TIME / 2
        if np.any(np.asarray(rows.inf_input)[real_inf] != 0):
            raise ValueError(
                "pallas psi fast path supports infusions into input 0 (central) only"
            )
    obs_t = np.asarray(rows.obs_t, dtype=np.float64)
    R, NO = obs_t.shape
    inf_dur = np.asarray(rows.inf_dur, dtype=np.float64)
    inf_end = np.where(inf_t < BIG_TIME / 2, inf_t + inf_dur, inf_t)
    # breakpoints: [obs..., bolus..., inf-start..., inf-end...]; sort by
    # (time, rank) with engine ranks inf-end 0 < obs 1 < bolus 2 < inf-start 3
    times = np.concatenate([obs_t, bolus_t, inf_t, inf_end], axis=1)
    ranks = np.concatenate(
        [
            np.ones_like(obs_t),
            2.0 * np.ones_like(bolus_t),
            3.0 * np.ones_like(inf_t),
            np.zeros_like(inf_end),
        ],
        axis=1,
    )
    order = np.lexsort((ranks, times), axis=1)
    t_sorted = np.take_along_axis(times, order, axis=1)
    M = t_sorted.shape[1]
    t_next = np.concatenate([t_sorted[:, 1:], t_sorted[:, -1:]], axis=1)
    live = t_next < BIG_TIME / 2
    seg_dt = np.where(live, np.maximum(t_next - t_sorted, 0.0), 0.0)

    def scatter(unsorted):
        return np.take_along_axis(unsorted, order, axis=1)

    def with_zero_pads(obs_col, bolus_col):
        return np.concatenate(
            [obs_col, bolus_col, np.zeros((R, 2 * NI))], axis=1
        )

    # padded bolus slots (time >= BIG_TIME) must contribute zero dose — the
    # kernel applies the bolus column even on dt==0 terminal segments
    bolus_amt = np.where(
        bolus_t < BIG_TIME / 2, np.asarray(rows.bolus_amt, dtype=np.float64), 0.0
    )
    seg_bolus = scatter(with_zero_pads(np.zeros_like(obs_t), bolus_amt))
    # per-segment infusion rate: midpoint containment (engine parity)
    if NI:
        rate = np.where(
            (inf_t < BIG_TIME / 2) & (inf_dur > 0),
            np.asarray(rows.inf_amt, dtype=np.float64) / np.maximum(inf_dur, 1e-300),
            0.0,
        )
        mid = t_sorted + 0.5 * seg_dt  # [R, M]
        contained = (
            (mid[:, :, None] >= inf_t[:, None, :])
            & (mid[:, :, None] < inf_end[:, None, :])
            & (seg_dt[:, :, None] > 0)
        )
        seg_rateiv = np.einsum("rmi,ri->rm", contained.astype(np.float64), rate)
    else:
        seg_rateiv = np.zeros_like(seg_dt)
    valid = valid_rows
    obs_value_u = np.asarray(rows.obs_value, dtype=np.float64)
    # observation-based sigma from the lowered error model (single outeq 0);
    # per-observation errorpoly overrides replace the poly, keeping
    # kind/factor (loglik.observation_sigmas parity)
    kind = int(lowered_em.kind[0])
    factor = float(lowered_em.factor[0])
    shared_poly = np.asarray(lowered_em.poly[0], dtype=np.float64)
    poly = np.where(
        np.asarray(rows.obs_has_poly)[:, :, None],
        np.asarray(rows.obs_poly, dtype=np.float64),
        shared_poly,
    )
    alpha = (poly[..., 0] + poly[..., 1] * obs_value_u
             + poly[..., 2] * obs_value_u**2 + poly[..., 3] * obs_value_u**3)
    sigma_u = np.sqrt(alpha**2 + factor**2) if kind == 1 else factor * alpha
    seg_mask = scatter(with_zero_pads(valid.astype(np.float64), np.zeros_like(bolus_t)))
    seg_value = scatter(with_zero_pads(obs_value_u, np.zeros_like(bolus_t)))
    seg_sigma = scatter(with_zero_pads(sigma_u, np.zeros_like(bolus_t)))
    seg_sigma = np.where(seg_mask > 0, seg_sigma, 1.0)
    # censoring sign: +1 BLOQ (logCDF), -1 ALOQ (logCCDF), 0 uncensored
    cens_code = np.asarray(rows.obs_cens, dtype=np.int64)
    cens_sign = np.where(cens_code == 1, 1.0, np.where(cens_code == 2, -1.0, 0.0))
    cens_sign = np.where(valid_rows, cens_sign, 0.0)
    seg_cens = scatter(with_zero_pads(cens_sign, np.zeros_like(bolus_t)))
    return (seg_dt, seg_bolus, seg_rateiv, seg_mask, seg_value, seg_sigma,
            seg_cens)
