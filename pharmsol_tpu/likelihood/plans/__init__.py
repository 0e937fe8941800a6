"""Fused-psi plan package: analytical / ODE / SDE plans + shared decomposition.

Round-5 split of the former 4,281-line likelihood/matrix.py monolith
(VERDICT item 5).  Import surface is re-exported by likelihood.matrix for
backward compatibility; plan cache keys and routing behavior are pinned
by the parity suites.
"""

from .analytical import _PallasPsiPlan  # noqa: F401
from .ode import _ODE_MERGE_MAX_SPAN, _PallasOdePsiPlan, _ode_merge_runs  # noqa: F401
from .sde import _PallasSdePsiPlan  # noqa: F401
