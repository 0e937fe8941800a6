"""On-chip check: lag/fa + time-varying-covariate ODE kernels compile and
match the XLA engine at f32 tolerance."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp

from pharmsol_tpu.config import set_float_dtype
set_float_dtype(np.float32)

from pharmsol_tpu import (ODE, AssayErrorModel, AssayErrorModels, Data,
                          ErrorPoly, SubjectBuilder)
from pharmsol_tpu.likelihood.matrix import log_likelihood_matrix

print("platform:", jax.devices()[0].platform)

def rel(a, b):
    return np.max(np.abs(a - b) / np.maximum(np.abs(b), 1.0))

# --- lag/fa ---
model = ODE(
    lambda x, p, t, b, rateiv, cov: jnp.stack([
        -p[0] * x[0] + b[0],
        p[0] * x[0] - p[1] * x[1],
    ]),
    lag=lambda p, t, cov: {0: p[3]},
    fa=lambda p, t, cov: {0: p[4]},
    out=lambda x, p, t, cov: x[1:2] / p[2],
    nstates=2, ndrugs=1, nout=1,
)
subjects = []
for i in range(16):
    sb = SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0).bolus(6.0, 80.0, 0)
    for t in (0.5, 1.0, 2.0, 4.0, 7.0, 10.0):
        sb = sb.observation(t, float(4 * np.exp(-0.25 * t) + 0.05 * i), 0)
    subjects.append(sb.build())
rng = np.random.default_rng(17)
sp = np.column_stack([
    rng.uniform(0.5, 2.0, 32), rng.uniform(0.05, 0.5, 32),
    rng.uniform(30, 90, 32), rng.uniform(0.0, 1.5, 32),
    rng.uniform(0.3, 1.0, 32),
])
t0 = time.time()
pp = log_likelihood_matrix(model, Data(subjects), sp,
                           AssayErrorModels().add(0, AssayErrorModel.additive(
                               ErrorPoly(0.5, 0.1), 1.0)), engine="pallas")
px = log_likelihood_matrix(model, Data(subjects), sp,
                           AssayErrorModels().add(0, AssayErrorModel.additive(
                               ErrorPoly(0.5, 0.1), 1.0)), engine="xla")
print(f"lag/fa: rel {rel(pp, px):.2e}  ({time.time()-t0:.0f}s)")
assert rel(pp, px) < 5e-4, rel(pp, px)

# --- time-varying covariate ---
model2 = ODE(
    lambda x, p, t, b, rateiv, cov: jnp.stack([
        -p[0] * (cov("wt", t) / 70.0) * x[0] + b[0],
    ]),
    out=lambda x, p, t, cov: x[0:1] / p[1],
    nstates=1, ndrugs=1, nout=1,
)
subjects2 = []
for i in range(16):
    sb = (SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0)
          .covariate("wt", 0.0, 55.0 + 2.0 * i)
          .covariate("wt", 2.0, 80.0 - 1.5 * i)
          .covariate("wt", 8.0, 60.0 + 1.0 * i))
    for t in (1.0, 2.0, 4.0, 8.0):
        sb = sb.observation(t, float(4 * np.exp(-0.25 * t)), 0)
    subjects2.append(sb.build())
sp2 = np.column_stack([
    rng.uniform(0.1, 0.6, 32), rng.uniform(10, 40, 32),
])
t0 = time.time()
pp2 = log_likelihood_matrix(model2, Data(subjects2), sp2,
                            AssayErrorModels().add(0, AssayErrorModel.additive(
                                ErrorPoly(0.5, 0.1), 1.0)), engine="pallas")
px2 = log_likelihood_matrix(model2, Data(subjects2), sp2,
                            AssayErrorModels().add(0, AssayErrorModel.additive(
                                ErrorPoly(0.5, 0.1), 1.0)), engine="xla")
print(f"tv-cov: rel {rel(pp2, px2):.2e}  ({time.time()-t0:.0f}s)")
assert rel(pp2, px2) < 5e-4, rel(pp2, px2)

# --- lag/fa combined with a time-varying covariate ---
model3 = ODE(
    lambda x, p, t, b, rateiv, cov: jnp.stack([
        -p[0] * (cov("wt", t) / 70.0) * x[0] + b[0],
        p[0] * (cov("wt", t) / 70.0) * x[0] - p[1] * x[1],
    ]),
    lag=lambda p, t, cov: {0: p[3]},
    fa=lambda p, t, cov: {0: p[4]},
    out=lambda x, p, t, cov: x[1:2] / p[2],
    nstates=2, ndrugs=1, nout=1,
)
subjects3 = []
for i in range(16):
    sb = (SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0).bolus(6.0, 80.0, 0)
          .covariate("wt", 0.0, 55.0 + 2.0 * i)
          .covariate("wt", 2.0, 80.0 - 1.5 * i)
          .covariate("wt", 10.0, 60.0 + 1.0 * i))
    for t in (0.5, 1.0, 2.0, 4.0, 7.0, 10.0):
        sb = sb.observation(t, float(4 * np.exp(-0.25 * t) + 0.05 * i), 0)
    subjects3.append(sb.build())
sp3 = np.column_stack([
    rng.uniform(0.5, 2.0, 32), rng.uniform(0.05, 0.5, 32),
    rng.uniform(30, 90, 32), rng.uniform(0.0, 1.5, 32),
    rng.uniform(0.3, 1.0, 32),
])
t0 = time.time()
pp3 = log_likelihood_matrix(model3, Data(subjects3), sp3,
                            AssayErrorModels().add(0, AssayErrorModel.additive(
                                ErrorPoly(0.5, 0.1), 1.0)), engine="pallas")
px3 = log_likelihood_matrix(model3, Data(subjects3), sp3,
                            AssayErrorModels().add(0, AssayErrorModel.additive(
                                ErrorPoly(0.5, 0.1), 1.0)), engine="xla")
print(f"lag+tv-cov: rel {rel(pp3, px3):.2e}  ({time.time()-t0:.0f}s)")
assert rel(pp3, px3) < 5e-4, rel(pp3, px3)

# --- multi-input dosing (two drugs, per-input bolus/rate streams) ---
model4 = ODE(
    lambda x, p, t, b, rateiv, cov: jnp.stack([
        -p[0] * x[0] + b[0] + rateiv[1],
        -p[1] * x[1] + b[1],
        p[0] * x[0] + p[1] * x[1] - p[2] * x[2] + rateiv[0],
    ]),
    out=lambda x, p, t, cov: x[2:3] / p[3],
    nstates=3, ndrugs=2, nout=1,
)
subjects4 = []
for i in range(16):
    sb = (SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0).bolus(1.0, 60.0, 1)
          .infusion(2.0, 40.0, 1, 1.5))
    for t in (0.5, 1.5, 3.0, 5.0, 8.0):
        sb = sb.observation(t, float(4 * np.exp(-0.25 * t) + 0.05 * i), 0)
    subjects4.append(sb.build())
sp4 = np.column_stack([
    rng.uniform(0.5, 2.0, 32), rng.uniform(0.3, 1.2, 32),
    rng.uniform(0.05, 0.5, 32), rng.uniform(20, 60, 32),
])
t0 = time.time()
pp4 = log_likelihood_matrix(model4, Data(subjects4), sp4,
                            AssayErrorModels().add(0, AssayErrorModel.additive(
                                ErrorPoly(0.5, 0.1), 1.0)), engine="pallas")
px4 = log_likelihood_matrix(model4, Data(subjects4), sp4,
                            AssayErrorModels().add(0, AssayErrorModel.additive(
                                ErrorPoly(0.5, 0.1), 1.0)), engine="xla")
print(f"multi-input: rel {rel(pp4, px4):.2e}  ({time.time()-t0:.0f}s)")
assert rel(pp4, px4) < 5e-4, rel(pp4, px4)

# --- lag/fa with TWO bolus inputs (per-input pending-dose slots) ---
model5 = ODE(
    lambda x, p, t, b, rateiv, cov: jnp.stack([
        -p[0] * x[0] + b[0],
        -p[1] * x[1] + b[1],
        p[0] * x[0] + p[1] * x[1] - p[2] * x[2],
    ]),
    lag=lambda p, t, cov: {0: p[4], 1: p[5]},
    fa=lambda p, t, cov: {0: p[6], 1: 0.85},
    out=lambda x, p, t, cov: x[2:3] / p[3],
    nstates=3, ndrugs=2, nout=1,
)
subjects5 = []
for i in range(16):
    sb = (SubjectBuilder(f"s{i}")
          .bolus(0.0, 100.0, 0).bolus(0.3, 60.0, 1)
          .bolus(8.0, 100.0, 0).bolus(8.3, 60.0, 1))
    for t in (0.5, 1.0, 2.0, 4.0, 7.0, 10.0, 14.0):
        sb = sb.observation(t, float(3 * np.exp(-0.2 * t) + 0.04 * i), 0)
    subjects5.append(sb.build())
sp5 = np.column_stack([
    rng.uniform(0.5, 2.0, 32), rng.uniform(0.8, 3.0, 32),
    rng.uniform(0.05, 0.5, 32), rng.uniform(30, 90, 32),
    rng.uniform(0.0, 1.4, 32), rng.uniform(0.0, 0.9, 32),
    rng.uniform(0.3, 1.0, 32),
])
t0 = time.time()
pp5 = log_likelihood_matrix(model5, Data(subjects5), sp5,
                            AssayErrorModels().add(0, AssayErrorModel.additive(
                                ErrorPoly(0.5, 0.1), 1.0)), engine="pallas")
px5 = log_likelihood_matrix(model5, Data(subjects5), sp5,
                            AssayErrorModels().add(0, AssayErrorModel.additive(
                                ErrorPoly(0.5, 0.1), 1.0)), engine="xla")
print(f"multi-input lag/fa: rel {rel(pp5, px5):.2e}  ({time.time()-t0:.0f}s)")
assert rel(pp5, px5) < 5e-4, rel(pp5, px5)

# --- dynamic lag/fa: closures reading a time-varying covariate ---------
# (per-dose-segment slot tables; exercises the static slot codegen)
model6 = ODE(
    lambda x, p, t, b, rateiv, cov: jnp.stack([
        -p[0] * x[0] + b[0],
        p[0] * x[0] - p[1] * x[1],
    ]),
    lag=lambda p, t, cov: {0: p[3] * cov("wt", t) / 70.0},
    fa=lambda p, t, cov: {0: p[4] / (1.0 + 0.05 * t)},
    out=lambda x, p, t, cov: x[1:2] / p[2],
    nstates=2, ndrugs=1, nout=1,
)
subjects6 = []
for i in range(16):
    sb = (SubjectBuilder(f"s{i}").bolus(0.0, 100.0, 0).bolus(6.0, 80.0, 0)
          .covariate("wt", 0.0, 55.0 + 2.0 * i)
          .covariate("wt", 2.0, 80.0 - 1.5 * i)
          .covariate("wt", 10.0, 60.0 + 1.0 * i))
    for t in (0.5, 1.0, 2.0, 4.0, 7.0, 10.0):
        sb = sb.observation(t, float(4 * np.exp(-0.25 * t) + 0.05 * i), 0)
    subjects6.append(sb.build())
sp6 = np.column_stack([
    rng.uniform(0.5, 2.0, 32), rng.uniform(0.05, 0.5, 32),
    rng.uniform(30, 90, 32), rng.uniform(0.0, 1.1, 32),
    rng.uniform(0.3, 1.0, 32),
])
t0 = time.time()
pp6 = log_likelihood_matrix(model6, Data(subjects6), sp6,
                            AssayErrorModels().add(0, AssayErrorModel.additive(
                                ErrorPoly(0.5, 0.1), 1.0)), engine="pallas")
px6 = log_likelihood_matrix(model6, Data(subjects6), sp6,
                            AssayErrorModels().add(0, AssayErrorModel.additive(
                                ErrorPoly(0.5, 0.1), 1.0)), engine="xla")
print(f"dynamic lag/fa: rel {rel(pp6, px6):.2e}  ({time.time()-t0:.0f}s)")
assert rel(pp6, px6) < 5e-4, rel(pp6, px6)
print("TPU NEW PATHS OK")
