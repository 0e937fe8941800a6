"""Case-resampling bootstrap confidence intervals around any fitter.

The Rust reference leaves uncertainty quantification to external tools
(PsN's ``bootstrap`` resamples subjects and re-launches NONMEM runs).
Here the same workflow is one call: resample SUBJECTS with replacement,
refit every replicate with whatever fitter closure you hand in, and read
standard errors / percentile CIs / bias off the replicate estimates.

The fitter below is a deliberately cheap two-stage estimator (per-subject
terminal log-linear slope -> population mean) so the example runs in
seconds; the replicate SE then has a textbook oracle (sd/sqrt(n)) the
assertion checks. For production population fits, wrap
``optimize.fit_saem`` / ``fit_population`` the same way — or use
``optimize.bootstrap_laplace``, which refits EVERY replicate as one
vmapped device program over frequency-weighted Laplace objectives
(docs/API.md "Optimization & estimation").

Run: python examples/bootstrap_ci.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from pharmsol_tpu import Data, Subject
from pharmsol_tpu.optimize import bootstrap

TRUE_KE, V = 0.25, 12.0
TIMES = (2.0, 4.0, 8.0, 12.0, 24.0)


class TwoStage:
    """theta = mean over subjects of the per-subject terminal slope."""

    def __init__(self, kes):
        self.theta = np.atleast_1d(np.mean(kes))
        self.parameter_names = ("ke",)


def fit(d: Data) -> TwoStage:
    kes = []
    for s in d.subjects():
        occ = s.occasions()[0]
        t = np.array([o.time for o in occ.observations()])
        y = np.array([o.value for o in occ.observations()])
        slope = np.polyfit(t, np.log(y), 1)[0]
        kes.append(-slope)
    return TwoStage(np.asarray(kes))


def main() -> int:
    rng = np.random.default_rng(11)
    subjects = []
    kes = []
    for i in range(24):
        ke = TRUE_KE * np.exp(0.25 * rng.standard_normal())
        kes.append(ke)
        sb = Subject.builder(f"pt{i}").bolus(0.0, 100.0, 0)
        for t in TIMES:
            c = 100.0 * np.exp(-ke * t) / V
            sb = sb.observation(float(t), float(c), 0)
        subjects.append(sb.build())
    data = Data(subjects)

    res = bootstrap(data, fit, n_boot=400, seed=3)
    print(res.summary())
    lo, hi = res.ci()["theta"]
    print(f"  true mean ke of this sample: {np.mean(kes):.4f}")

    # oracle: noiseless exponential profiles -> the per-subject slope IS
    # that subject's ke, so the bootstrap SE of the mean must match the
    # classic sd/sqrt(n) within resampling noise
    se = res.se()["theta"][0]
    expect = np.std(kes, ddof=1) / np.sqrt(len(kes))
    print(f"  bootstrap SE {se:.4f} vs analytic sd/sqrt(n) {expect:.4f}")
    assert 0.7 * expect < se < 1.4 * expect, (se, expect)
    assert lo[0] < np.mean(kes) < hi[0]
    return 0


if __name__ == "__main__":
    main()
