"""Plan-decision goldens: `engine='auto'` routing is pinned (quick tier).

Round-5 follow-through on the likelihood/plans/ split (VERDICT item 5):
the routing logic stayed in matrix.py and these goldens pin it without
running any psi — `_auto_engine` is pure host logic over (platform,
model kind, cell count). A TPU platform is simulated by monkeypatching
the single probe `_auto_engine` makes.
"""

import types

import numpy as np
import pytest

import pharmsol_tpu as pst
from pharmsol_tpu import Analytical, Subject
from pharmsol_tpu.likelihood import matrix as M


class _Grid:
    def __init__(self, n_rows):
        self.n_rows = n_rows


class _Eq:
    def __init__(self, kind):
        self.kind = kind


def _sp(n):
    return np.zeros((n, 3))


def _with_platform(monkeypatch, platform):
    dev = types.SimpleNamespace(platform=platform)
    monkeypatch.setattr(M.jax, "devices", lambda *a, **k: [dev])


def test_cpu_always_routes_xla(monkeypatch):
    _with_platform(monkeypatch, "cpu")
    eng, reason = M._auto_engine(_Eq("analytical"), _Grid(10**9), _sp(1024))
    assert eng == "xla"
    assert "TPU only" in reason


@pytest.mark.parametrize("kind", ["analytical", "ode", "sde"])
def test_tpu_small_matrix_routes_xla(monkeypatch, kind):
    _with_platform(monkeypatch, "tpu")
    min_cells = M.AUTO_PALLAS_MIN_CELLS_BY_KIND.get(
        kind, M.AUTO_PALLAS_MIN_CELLS)
    rows = max(1, (min_cells - 1) // 64)
    eng, reason = M._auto_engine(_Eq(kind), _Grid(rows), _sp(64))
    assert eng == "xla"
    assert "too small" in reason


@pytest.mark.parametrize("kind", ["analytical", "ode", "sde"])
def test_tpu_large_matrix_routes_pallas(monkeypatch, kind):
    _with_platform(monkeypatch, "tpu")
    min_cells = M.AUTO_PALLAS_MIN_CELLS_BY_KIND.get(
        kind, M.AUTO_PALLAS_MIN_CELLS)
    rows = min_cells // 64 + 1
    eng, reason = M._auto_engine(_Eq(kind), _Grid(rows), _sp(64))
    assert eng == "pallas"
    assert "crossover" in reason


def test_crossover_constants_are_the_committed_ones():
    # the per-kind thresholds are perf-tuned artifacts (round 3); a
    # silent change shifts routing for every user at once
    assert M.AUTO_PALLAS_MIN_CELLS == 262_144
    assert M.AUTO_PALLAS_MIN_CELLS_BY_KIND["sde"] < M.AUTO_PALLAS_MIN_CELLS


def test_last_engine_decision_records_fallback_reason():
    # end-to-end on CPU: auto -> xla with the platform reason retrievable
    model = Analytical(
        pst.one_compartment, out=lambda x, p, t, cov: x[:1] / p[1],
        nstates=1, ndrugs=1, nout=1,
    )
    subs = [Subject.builder("s").bolus(0, 100, 0)
            .observation(1.0, 3.0, 0).build()]
    from pharmsol_tpu import AssayErrorModel, AssayErrorModels, ErrorPoly

    ems = AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0))
    M.log_likelihood_matrix(model, subs, np.array([[0.2, 10.0]]), ems)
    d = M.last_engine_decision(model)
    assert d["engine"] == "xla"
    assert "TPU only" in d["reason"]
