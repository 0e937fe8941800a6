"""Numerically stable normal log-densities for likelihood calculations.

Parity with /root/reference/src/simulator/likelihood/distributions.rs:31-102.
The reference patches statrs' CDF with an asymptotic tail expansion below
z = -37; here ``jax.scipy.special.log_ndtr`` is stable over the whole range,
which subsumes (and improves on) that hack. Values agree to well below 1e-6
everywhere the reference returns finite numbers.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax.scipy.special import log_ndtr

LOG_2PI = math.log(2.0 * math.pi)


def lognormpdf(obs, pred, sigma):
    """log N(obs; pred, sigma) — distributions.rs:31-35."""
    diff = obs - pred
    return -0.5 * LOG_2PI - jnp.log(sigma) - diff * diff / (2.0 * sigma * sigma)


def lognormcdf(obs, pred, sigma):
    """log Phi((obs-pred)/sigma): BLOQ likelihood — distributions.rs:53-73."""
    return log_ndtr((obs - pred) / sigma)


def lognormccdf(obs, pred, sigma):
    """log (1 - Phi(z)): ALOQ likelihood — distributions.rs:86-102."""
    return log_ndtr(-(obs - pred) / sigma)
