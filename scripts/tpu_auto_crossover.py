"""Measure the pallas/XLA crossover for engine='auto' on the device.

Runs the flagship analytical psi END TO END (plan build + padding +
dispatch + fetch — the user-visible cost, not just device time) through
both engines across matrix sizes, and reports the cell count where the
pallas tier starts winning. AUTO_PALLAS_MIN_CELLS in likelihood/matrix.py
is calibrated from this.

    python scripts/tpu_auto_crossover.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax

    from pharmsol_tpu.config import set_float_dtype

    if jax.devices()[0].platform == "tpu":
        set_float_dtype(np.float32)

    import pharmsol_tpu as pst
    from pharmsol_tpu import (
        Analytical, AssayErrorModel, AssayErrorModels, Data, ErrorPoly,
        Subject,
    )
    from pharmsol_tpu.likelihood.matrix import log_likelihood_matrix

    ems = AssayErrorModels().add(
        0, AssayErrorModel.additive(ErrorPoly(0.5, 0.1), 1.0)
    )
    obs_times = [0.5, 1.0, 2.0, 3.0, 4.0, 6.0, 8.0, 10.0, 12.0]
    rng = np.random.RandomState(0)

    def subjects(n):
        out = []
        for i in range(n):
            b = Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
            for t in obs_times:
                b = b.observation(t, float(np.abs(5 + rng.randn())), 0)
            out.append(b.build())
        return Data(out)

    results = []
    for n_sub, n_sp in ((64, 32), (128, 64), (256, 128), (512, 128),
                        (1024, 128), (2048, 256), (4096, 256)):
        model = Analytical(
            pst.two_compartments_with_absorption,
            out=lambda x, p, t, cov: x[1:2] / p[4],
            nstates=3, ndrugs=1, nout=1,
        )
        data = subjects(n_sub)
        center = np.array([0.15, 1.2, 0.3, 0.2, 10.0])
        sp = np.abs(center[None, :] * (1.0 + 0.2 * rng.randn(n_sp, 5)))

        times = {}
        for engine in ("xla", "pallas"):
            # warm (compile) then best-of-3 END-TO-END
            log_likelihood_matrix(model, data, sp, ems, engine=engine)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                log_likelihood_matrix(model, data, sp, ems, engine=engine)
                ts.append(time.perf_counter() - t0)
            times[engine] = min(ts)
        cells = n_sub * n_sp
        results.append({
            "cells": cells, "subjects": n_sub, "supports": n_sp,
            "xla_s": round(times["xla"], 4),
            "pallas_s": round(times["pallas"], 4),
            "pallas_wins": times["pallas"] < times["xla"],
        })
        print(json.dumps(results[-1]))

    crossover = next((r["cells"] for r in results if r["pallas_wins"]), None)
    print(json.dumps({"crossover_cells": crossover}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
