"""Hypothesis-driven active learning (arXiv:2112.06649 workflow).

Script equivalent of the reference's gpax_hypo.ipynb: compete multiple physical
hypotheses (parametric models) in a bandit loop, rewarding hypotheses whose
posterior converges and reduces predictive uncertainty.  Set SMOKE=1 for tiny budgets.
"""

import os

import jax.numpy as jnp
import numpy as np

import gpax_tpu.distributions as dist
from gpax_tpu import ppl
from gpax_tpu.hypo import sample_next, step, update_record

SMOKE = bool(int(os.environ.get("SMOKE", "0")))
BUDGET = dict(num_warmup=100, num_samples=100) if SMOKE else dict(num_warmup=1000, num_samples=1000)


# competing hypotheses about the measured system
def linear(x, p):
    return p["a"] * x + p["b"]


def quadratic(x, p):
    return p["a"] * x**2 + p["b"]


def linear_prior():
    return {"a": ppl.sample("a", dist.Normal(0, 2)), "b": ppl.sample("b", dist.Normal(0, 2))}


def quadratic_prior():
    return {"a": ppl.sample("a", dist.Normal(0, 2)), "b": ppl.sample("b", dist.Normal(0, 2))}


def main():
    rng = np.random.default_rng(0)
    truth = lambda x: 1.5 * x**2 - 0.5  # quadratic is the correct hypothesis
    X_all = np.linspace(-1, 1, 25)
    measured_idx = list(rng.choice(25, 5, replace=False))

    models = [(linear, linear_prior), (quadratic, quadratic_prior)]
    record = np.zeros((len(models), 2))

    steps = 3 if SMOKE else 10
    for it in range(steps):
        k = sample_next(record[:, 1], "eps-greedy", eps=0.3)
        model, prior = models[k]
        X_m = jnp.asarray(X_all[measured_idx], jnp.float32)
        y_m = jnp.asarray(truth(X_all[measured_idx]) + 0.05 * rng.normal(size=len(measured_idx)), jnp.float32)
        unmeasured = [i for i in range(25) if i not in measured_idx]
        X_u = jnp.asarray(X_all[unmeasured], jnp.float32)
        obj, fitted = step(model, prior, X_m, y_m, X_u,
                           num_restarts=1, print_summary=False, **BUDGET)
        # reward = negative mean predictive variance (confident hypotheses win)
        reward = -float(np.mean(np.asarray(obj)))
        record = update_record(record, k, reward)
        nxt = unmeasured[int(np.argmax(np.asarray(obj)))]
        measured_idx.append(nxt)
        print(f"step {it}: hypothesis={'linear' if k == 0 else 'quadratic'} "
              f"reward={reward:+.4f} next_x={X_all[nxt]:+.2f}")

    print("final running rewards:", np.round(record[:, 1], 4),
          "-> winner:", "quadratic" if record[1, 1] > record[0, 1] else "linear")
    return record


if __name__ == "__main__":
    main()
