"""A miniature stochastic-EM (SAEM-style) parametric estimation loop.

The parametric twin of examples/npag_lite.py: where NPAG drives the psi
matrix (observation-based assay error), parametric algorithms drive
``log_likelihood_batch`` — one parameter row per subject, prediction-based
residual error (the reference's residual_error.rs surface). This demo
recovers log-normal population parameters of a 1-cmt oral model with a
Metropolis-within-EM scheme:

  E-ish step: propose per-subject parameters, accept by the batch
              log-likelihood plus the population prior;
  M step:     update the population mean/sd from accepted individual
              parameters, and the residual sigma from weighted residuals
              (ResidualErrorModel.with_updated_sigma).

For production use, the framework ships the full algorithm as
``pharmsol_tpu.optimize.fit_saem`` (one jitted lax.scan over all
iterations: vmapped MH E-step, two-phase SA, sigma M-steps); this file
stays as the pedagogical version.

Run: python examples/saem_lite.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import pharmsol_tpu as pst
from pharmsol_tpu import (
    Analytical,
    Data,
    ResidualErrorModel,
    ResidualErrorModels,
    Subject,
)
from pharmsol_tpu.likelihood.matrix import log_likelihood_batch

TRUE_MU = np.log([1.2, 0.15, 20.0])  # ka, ke, v (log scale)
TRUE_SD = np.array([0.2, 0.25, 0.15])
TRUE_SIGMA = 0.30  # proportional residual error


def simulate_population(n=80, seed=5):
    rng = np.random.RandomState(seed)
    theta = np.exp(TRUE_MU[None, :] + TRUE_SD[None, :] * rng.randn(n, 3))
    model = _model()
    subjects = []
    for i in range(n):
        b = Subject.builder(f"pt{i:02d}").bolus(0.0, 100.0, 0)
        for t in (0.5, 1.0, 2.0, 4.0, 8.0, 12.0, 24.0):
            b = b.missing_observation(t, 0)
        clean = model.estimate_predictions(b.build(), theta[i]).flat_predictions()
        b2 = Subject.builder(f"pt{i:02d}").bolus(0.0, 100.0, 0)
        for t, c in zip((0.5, 1.0, 2.0, 4.0, 8.0, 12.0, 24.0), clean):
            b2 = b2.observation(float(t), float(c * (1 + TRUE_SIGMA * rng.randn())), 0)
        subjects.append(b2.build())
    return Data(subjects), theta


def _model():
    return Analytical(
        pst.one_compartment_with_absorption,
        out=lambda x, p, t, cov: x[1:2] / p[2],
        nstates=2,
        ndrugs=1,
        nout=1,
    )


def main():
    rng = np.random.RandomState(0)
    data, theta_true = simulate_population()
    n = len(data)
    model = _model()

    mu = np.log([2.0, 0.3, 10.0])  # deliberately wrong start
    sd = np.full(3, 0.5)
    sigma = 0.6
    eta = mu[None, :] + 0.0 * rng.randn(n, 3)  # per-subject log-params

    def batch_ll(eta_mat, sig):
        rems = ResidualErrorModels().add(0, ResidualErrorModel.proportional(sig))
        return log_likelihood_batch(model, data, np.exp(eta_mat), rems)

    ll = batch_ll(eta, sigma)
    step = 0.5
    for it in range(120):
        # Metropolis E-step on the individual parameters
        prop = eta + step * rng.randn(n, 3) * sd[None, :]
        ll_prop = batch_ll(prop, sigma)
        prior = -0.5 * np.sum(((eta - mu) / sd) ** 2, axis=1)
        prior_prop = -0.5 * np.sum(((prop - mu) / sd) ** 2, axis=1)
        accept = np.log(rng.rand(n)) < (ll_prop + prior_prop) - (ll + prior)
        eta = np.where(accept[:, None], prop, eta)
        ll = np.where(accept, ll_prop, ll)

        # M-step: population moments + residual sigma from weighted residuals
        mu = eta.mean(axis=0)
        sd = np.maximum(eta.std(axis=0), 0.05)
        if (it + 1) % 5 == 0:
            resid2 = []
            for i, s in enumerate(data.subjects()):
                preds = model.estimate_predictions(s, np.exp(eta[i]))
                for pr in preds.predictions():
                    if pr.observation is not None and pr.prediction > 0:
                        resid2.append(
                            ((pr.observation - pr.prediction) / pr.prediction) ** 2
                        )
            sigma = float(np.sqrt(np.mean(resid2)))
        rate = float(accept.mean())
        step *= 1.1 if rate > 0.4 else 0.9
        if (it + 1) % 30 == 0:
            print(
                f"iter {it+1:2d}: mu={np.round(np.exp(mu), 3)} "
                f"sd={np.round(sd, 2)} sigma={sigma:.3f} accept={rate:.2f}"
            )

    est = np.exp(mu)
    truth = np.exp(TRUE_MU)
    rel = np.abs(est - truth) / truth
    print(f"estimated population medians: {np.round(est, 3)} (truth {truth})")
    print(f"residual sigma: {sigma:.3f} (truth {TRUE_SIGMA})")
    assert np.all(rel < 0.25), f"population medians off by {rel}"
    assert abs(sigma - TRUE_SIGMA) < 0.12, "residual sigma not recovered"
    print("SAEM-lite recovered the population parameters.")


if __name__ == "__main__":
    main()
