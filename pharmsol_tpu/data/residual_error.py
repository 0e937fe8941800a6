"""Residual (prediction-based) error models for parametric algorithms.

Parity with /root/reference/src/data/residual_error.rs:69-220:

- Constant:     sigma = a
- Proportional: sigma = b * |f|
- Combined:     sigma = sqrt(a² + b²·f²)
- Exponential:  sigma = s (log scale)

sigma is floored at sqrt(machine eps) (residual_error.rs cutoff), and
``log_likelihood`` is the plain normal log-density. These are the surfaces a
SAEM/FOCE layer consumes; they are vectorization-friendly (pure formulas) and
also exposed as jnp-ready callables.
"""

from __future__ import annotations

import enum
import math
from dataclasses import dataclass
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

_CUTOFF = math.sqrt(np.finfo(np.float64).eps)
_LOG_TAU = math.log(2.0 * math.pi)


class ResidualKind(enum.Enum):
    CONSTANT = "constant"
    PROPORTIONAL = "proportional"
    COMBINED = "combined"
    EXPONENTIAL = "exponential"


@dataclass(frozen=True)
class ResidualErrorModel:
    kind: ResidualKind
    a: float = 0.0
    b: float = 0.0

    # -- constructors ------------------------------------------------------
    @staticmethod
    def constant(a: float) -> "ResidualErrorModel":
        return ResidualErrorModel(ResidualKind.CONSTANT, a=a)

    @staticmethod
    def proportional(b: float) -> "ResidualErrorModel":
        return ResidualErrorModel(ResidualKind.PROPORTIONAL, b=b)

    @staticmethod
    def combined(a: float, b: float) -> "ResidualErrorModel":
        return ResidualErrorModel(ResidualKind.COMBINED, a=a, b=b)

    @staticmethod
    def exponential(sigma: float) -> "ResidualErrorModel":
        return ResidualErrorModel(ResidualKind.EXPONENTIAL, a=sigma)

    @staticmethod
    def default() -> "ResidualErrorModel":
        return ResidualErrorModel.constant(1.0)

    # -- math (works on scalars and jnp arrays) -----------------------------
    def sigma(self, prediction):
        if self.kind is ResidualKind.CONSTANT:
            raw = self.a
        elif self.kind is ResidualKind.PROPORTIONAL:
            raw = self.b * jnp.abs(prediction)
        elif self.kind is ResidualKind.COMBINED:
            raw = jnp.sqrt(self.a**2 + self.b**2 * prediction**2)
        else:  # exponential: constant on log scale
            raw = self.a
        return jnp.maximum(raw, _CUTOFF)

    def variance(self, prediction):
        s = self.sigma(prediction)
        return s * s

    def weighted_squared_residual(self, observation, prediction):
        """Normalized residual for SAEM M-step sigma updates."""
        r2 = (observation - prediction) ** 2
        if self.kind is ResidualKind.CONSTANT:
            return r2
        if self.kind is ResidualKind.PROPORTIONAL:
            return r2 / jnp.maximum(prediction**2, np.finfo(np.float64).eps)
        if self.kind is ResidualKind.COMBINED:
            var = jnp.maximum(
                self.a**2 + self.b**2 * prediction**2, np.finfo(np.float64).eps
            )
            return r2 / var
        return r2

    def log_likelihood(self, observation, prediction):
        s = self.sigma(prediction)
        z = (observation - prediction) / s
        return -0.5 * (_LOG_TAU + 2.0 * jnp.log(s) + z * z)

    def with_updated_sigma(self, new_sigma: float) -> "ResidualErrorModel":
        if self.kind is ResidualKind.CONSTANT:
            return ResidualErrorModel.constant(new_sigma)
        if self.kind is ResidualKind.PROPORTIONAL:
            return ResidualErrorModel.proportional(new_sigma)
        if self.kind is ResidualKind.COMBINED:
            return ResidualErrorModel.combined(new_sigma, self.b)
        return ResidualErrorModel.exponential(new_sigma)


class ResidualErrorModels:
    """Per-outeq residual error models with total-log-likelihood helpers."""

    def __init__(self):
        self._models: Dict[str, ResidualErrorModel] = {}

    def add(self, outeq, model: ResidualErrorModel) -> "ResidualErrorModels":
        self._models[str(outeq)] = model
        return self

    def get(self, outeq) -> Optional[ResidualErrorModel]:
        return self._models.get(str(outeq))

    def labels(self) -> List[str]:
        return list(self._models.keys())

    def total_log_likelihood(self, observations, predictions, outeq_labels) -> float:
        total = 0.0
        for obs, pred, label in zip(observations, predictions, outeq_labels):
            m = self._models.get(str(label))
            if m is None or obs is None:
                continue
            total += float(m.log_likelihood(obs, pred))
        return total
