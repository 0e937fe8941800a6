"""Covariate model-building workflow: fit -> scm -> llp -> VPC.

The full parametric workflow the reference leaves to external drivers
(SURVEY §3.2): simulate a small population whose clearance parameter
carries an allometric weight effect, then

1. fit the base model with ``fit_laplace`` (exact-gradient L-BFGS on
   the Laplace marginal),
2. run stepwise covariate search (``scm``, PsN-style forward/backward
   by 1-dof LRT — all candidates at a step screened as ONE vmapped
   program),
3. profile-likelihood CIs for the selected model's parameters
   (``llp``, all grid refits as one vmapped program),
4. a visual predictive check from the final fit (the replicate
   simulator applies the fitted covariate shifts per subject).

Sized to finish in ~a minute on CPU; scale n/subjects up on real runs.
"""

import numpy as np

import pharmsol_tpu as pst
from pharmsol_tpu import Analytical, Data, Subject
from pharmsol_tpu.data.residual_error import (
    ResidualErrorModel,
    ResidualErrorModels,
)
from pharmsol_tpu.optimize import llp, scm, vpc

KE, V, BETA = 0.25, 10.0, 0.75

rng = np.random.default_rng(7)
subjects = []
for i in range(14):
    wt = float(rng.uniform(45.0, 110.0))
    junk = float(rng.uniform(0.5, 2.0))          # pure-noise covariate
    ke = KE * np.exp(BETA * np.log(wt / 70.0) + 0.10 * rng.standard_normal())
    v = V * np.exp(0.15 * rng.standard_normal())
    sb = (Subject.builder(f"s{i}").bolus(0.0, 100.0, 0)
          .covariate("wt", 0.0, wt).covariate("junk", 0.0, junk))
    for t in (0.5, 2.0, 6.0, 12.0, 24.0):
        c = 100.0 * np.exp(-ke * t) / v
        sb = sb.observation(float(t), float(c * (1 + 0.06 * rng.standard_normal())), 0)
    subjects.append(sb.build())
data = Data(subjects)

model = Analytical(
    pst.one_compartment,
    out=lambda x, p, t, cov: x[0:1] / p[1],
    nstates=1, ndrugs=1, nout=1,
)
rems = ResidualErrorModels().add(0, ResidualErrorModel.proportional(0.06))

# -- stepwise covariate search ------------------------------------------
search = scm(
    model, data, rems, [0.3, 9.0],
    candidates=[(0, "wt", "power", 70.0), (0, "junk", "power", 1.0)],
    compute_se=False,
)
print(search.summary())
assert search.effects == ((0, "wt", "power", 70.0),), search.effects

# -- profile-likelihood CIs on the selected model ------------------------
prof = llp(
    model, data, rems, [0.3, 9.0],
    covariate_effects=list(search.effects),
    parameters=["p[0]", "p[1]"],
    n_grid=6, compute_se=False,
)
print(prof.summary())
for pp in prof.parameters.values():
    assert pp.bracketed and pp.lower < pp.estimate < pp.upper

# -- VPC from the final fit (covariate shifts applied per subject) --------
check = vpc(model, data, rems, search.final, n_rep=200, seed=1)
print(check.summary())
assert check.coverage() >= 0.6, check.coverage()
print("covariate workflow complete: effect recovered, CIs bracketed, "
      f"VPC coverage {check.coverage():.2f}")
