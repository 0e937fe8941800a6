"""Drive the standalone C++ `.pkm` host (src/pkm_host.cpp).

The reference proves its portable tier by executing models in a non-Rust
host (WASM in a browser, browser-compile-bridge/ + tests/browser-e2e);
this module is the rebuild's equivalent proof: it builds the C++ host
binary on demand (g++, hash-cached like loader.py) and runs `.pkm`
artifacts through it. ``tests/test_pkm_host.py`` asserts three-way parity
(C++ host vs dsl/pure.py vs the jitted engine) across the model kinds.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import tempfile
import threading
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

_HERE = Path(__file__).parent
_SRC = _HERE / "src" / "pkm_host.cpp"
_BUILD = _HERE / "_build"

_lock = threading.Lock()
_binary: Optional[Path] = None
_tried = False


def _source_hash() -> str:
    return hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]


def _compile() -> Optional[Path]:
    _BUILD.mkdir(exist_ok=True)
    out = _BUILD / f"pkm_host_{_source_hash()}"
    if out.exists():
        return out
    cxx = os.environ.get("CXX", "g++")
    cmd = [cxx, "-O2", "-std=c++17", "-o", str(out), str(_SRC)]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=180)
    except (OSError, subprocess.TimeoutExpired):
        return None
    if proc.returncode != 0:
        import sys

        sys.stderr.write(f"pkm_host build failed:\n{proc.stderr}\n")
        return None
    return out


def get_host_binary() -> Optional[Path]:
    """Path to the pkm_host binary, building on first use; None if no g++."""
    global _binary, _tried
    with _lock:
        if _binary is not None or _tried:
            return _binary
        _tried = True
        if os.environ.get("PHARMSOL_TPU_NO_NATIVE") == "1":
            return None
        _binary = _compile()
        return _binary


def pkm_host_available() -> bool:
    return get_host_binary() is not None


def _covariate_json(cov) -> dict:
    out = {}
    for name, c in (cov or {}).items():
        if isinstance(c, dict):
            out[name] = {"fixed": bool(c.get("fixed", False)),
                         "knots": [[float(t), float(v)]
                                   for t, v in c["knots"]]}
        else:  # PureCovariate-shaped: .knots / .fixed
            out[name] = {"fixed": bool(getattr(c, "fixed", False)),
                         "knots": [[float(t), float(v)] for t, v in c.knots]}
    return out


def run_pkm_host(
    model_path: str,
    params: Sequence[float],
    boluses: Sequence[Tuple[float, float, int]],
    obs_times: Sequence[float],
    cov: Optional[Dict] = None,
    dt: float = 0.01,
    nparticles: Optional[int] = None,
    seed: int = 0,
) -> List[List[float]]:
    """Simulate a `.pkm` artifact in the C++ host; returns per-obs outputs.

    The scenario mirrors :meth:`dsl.pure.PureModel.simulate`'s signature;
    ``cov`` maps names to PureCovariate instances or
    ``{"fixed": bool, "knots": [(t, v), ...]}`` dicts.
    """
    binary = get_host_binary()
    if binary is None:
        raise RuntimeError(
            "the pkm_host binary is unavailable (no C++ toolchain, or "
            "PHARMSOL_TPU_NO_NATIVE=1)"
        )
    scenario = {
        "params": [float(p) for p in params],
        "boluses": [[float(t), float(a), int(i)] for t, a, i in boluses],
        "obs_times": [float(t) for t in obs_times],
        "covariates": _covariate_json(cov),
        "dt": float(dt),
        "nparticles": None if nparticles is None else int(nparticles),
        "seed": int(seed),
    }
    with tempfile.NamedTemporaryFile(
        "w", suffix=".json", delete=False
    ) as f:
        json.dump(scenario, f)
        sc_path = f.name
    try:
        proc = subprocess.run(
            [str(binary), str(model_path), sc_path],
            capture_output=True, text=True, timeout=300,
        )
    finally:
        os.unlink(sc_path)
    if proc.returncode != 0:
        raise RuntimeError(f"pkm_host failed: {proc.stderr.strip()}")
    return json.loads(proc.stdout)
