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


# Dense kind codes for the lowered arrays.
RESIDUAL_KIND_CODE = {
    ResidualKind.CONSTANT: 1,
    ResidualKind.PROPORTIONAL: 2,
    ResidualKind.COMBINED: 3,
    ResidualKind.EXPONENTIAL: 4,
}


@dataclass
class LoweredResidualModels:
    """Dense per-outeq arrays for the jitted batch-likelihood path."""

    kind: "np.ndarray"  # [nout] int32; 0 = no model (-> -inf, parity with mod.rs:132)
    a: "np.ndarray"  # [nout]
    b: "np.ndarray"  # [nout]


class ResidualErrorModels:
    """Per-outeq residual error models with total-log-likelihood helpers.

    An observation whose outeq has no model makes the total -inf
    (residual_error.rs:124-136).
    """

    def __init__(self):
        self._models: Dict[str, ResidualErrorModel] = {}

    def add(self, outeq, model: ResidualErrorModel) -> "ResidualErrorModels":
        self._models[str(outeq)] = model
        return self

    def get(self, outeq) -> Optional[ResidualErrorModel]:
        return self._models.get(str(outeq))

    def __len__(self) -> int:
        """Number of bound output models (residual_error.rs ``len``)."""
        return len(self._models)

    def sigma(self, outeq, prediction):
        """Sigma for one output at a prediction (residual_error.rs
        ``sigma``); raises KeyError for an unbound output."""
        m = self._models.get(str(outeq))
        if m is None:
            raise KeyError(f"no residual error model for output {outeq!r}")
        return m.sigma(prediction)

    def labels(self) -> List[str]:
        return list(self._models.keys())

    def total_log_likelihood(self, obs_pred_pairs) -> float:
        """``obs_pred_pairs``: iterable of (outeq_label, observation, prediction)."""
        total = 0.0
        for label, obs, pred in obs_pred_pairs:
            m = self._models.get(str(label))
            if m is None:
                return float("-inf")
            if obs is None:
                continue
            total += float(m.log_likelihood(obs, pred))
        return total

    def lower(self, output_resolver, nout: int) -> LoweredResidualModels:
        kind = np.zeros((nout,), dtype=np.int32)
        a = np.zeros((nout,), dtype=np.float64)
        b = np.zeros((nout,), dtype=np.float64)
        for label, m in self._models.items():
            idx = output_resolver(label)
            if idx is None or idx < 0 or idx >= nout:
                raise ValueError(
                    f"residual-model label `{label}` does not resolve to an output slot"
                )
            kind[idx] = RESIDUAL_KIND_CODE[m.kind]
            a[idx] = m.a
            b[idx] = m.b
        return LoweredResidualModels(kind=kind, a=a, b=b)


def residual_sigma_array(kind, a, b, pred):
    """Vectorized residual sigma over dense arrays (jnp-traced).

    kind/a/b are per-observation (already gathered by outeq); pred [NO].
    """
    raw = jnp.where(
        kind == 1,
        a,
        jnp.where(
            kind == 2,
            b * jnp.abs(pred),
            jnp.where(kind == 3, jnp.sqrt(a**2 + b**2 * pred**2), a),
        ),
    )
    return jnp.maximum(raw, _CUTOFF)
