"""Per-observation and per-occasion log-likelihood (traced, array-based).

Combines the lowered assay error models (per-outeq kind/factor/poly arrays)
with censoring-aware normal densities:

- Censor NONE -> lognormpdf, BLOQ -> lognormcdf, ALOQ -> lognormccdf
  (prediction.rs:105-125);
- sigma is observation-based: alpha = poly(obs);
  additive sigma = sqrt(alpha² + lambda²), proportional sigma = gamma·alpha
  (error_model.rs:1060-1072);
- per-observation ErrorPoly overrides beat the model default;
- missing observations contribute 0 (log 1), as does padding.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import float_dtype
from ..data.error_model import KIND_ADDITIVE, KIND_PROPORTIONAL
from .distributions import lognormccdf, lognormcdf, lognormpdf


def observation_sigmas(occ, em_kind, em_factor, em_poly):
    """Vectorized observation-based sigma for one occasion row.

    occ: OccasionArrays (or a batched slice); em_*: lowered error-model
    arrays [nout] / [nout,4]. Returns sigma [NO] (1.0 on missing/padded rows
    so downstream math stays finite; those rows are masked out of the sum).
    """
    fd = float_dtype()
    outeq = occ.obs_outeq.astype(jnp.int32)
    kind = em_kind[outeq]  # [NO]
    factor = em_factor[outeq].astype(fd)
    poly = jnp.where(
        occ.obs_has_poly[:, None], occ.obs_poly.astype(fd), em_poly[outeq].astype(fd)
    )  # [NO, 4]
    v = occ.obs_value.astype(fd)
    alpha = poly[:, 0] + poly[:, 1] * v + poly[:, 2] * v**2 + poly[:, 3] * v**3
    sigma_add = jnp.sqrt(alpha**2 + factor**2)
    sigma_prop = factor * alpha
    sigma = jnp.where(kind == KIND_ADDITIVE, sigma_add, sigma_prop)
    active = occ.obs_valid & occ.obs_has_value & (kind != 0)
    return jnp.where(active, sigma, 1.0), active


def occasion_log_likelihood(occ, pred, em_kind, em_factor, em_poly):
    """Sum of per-observation log-likelihoods for one occasion row.

    ``pred`` [NO] are the simulated predictions. Observations with no value,
    padding rows, and outeqs with error model None contribute zero.
    """
    fd = float_dtype()
    sigma, active = observation_sigmas(occ, em_kind, em_factor, em_poly)
    obs = occ.obs_value.astype(fd)
    cens = occ.obs_cens
    ll_none = lognormpdf(obs, pred, sigma)
    ll_bloq = lognormcdf(obs, pred, sigma)
    ll_aloq = lognormccdf(obs, pred, sigma)
    ll = jnp.where(cens == 1, ll_bloq, jnp.where(cens == 2, ll_aloq, ll_none))
    return jnp.sum(jnp.where(active, ll, 0.0))
