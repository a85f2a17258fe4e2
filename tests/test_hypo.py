"""Hypothesis learning: step/sample_next/update_record."""

import jax.numpy as jnp
import numpy as np
import pytest

import gpax_tpu.distributions as dist
from gpax_tpu import ppl
from gpax_tpu import hypo
from gpax_tpu.hypo import sample_next, step, update_record


def quadratic(x, params):
    return params["a"] * x**2


def quadratic_prior():
    return {"a": ppl.sample("a", dist.Normal(2.0, 1.0))}


def test_step_spm():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-1, 1, 15), jnp.float32)
    y = 2.0 * X**2 + 0.05 * jnp.asarray(rng.normal(size=15), jnp.float32)
    X_un = jnp.linspace(-1.5, 1.5, 9)
    obj, model = step(quadratic, quadratic_prior, X, y, X_un,
                      num_warmup=100, num_samples=100, num_restarts=2,
                      print_summary=False)
    assert obj.shape == (9,)
    assert (np.asarray(obj) >= 0).all()
    means = model.get_param_means()
    assert abs(means["a"] - 2.0) < 0.5


def test_step_gp_wrap():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-1, 1, 12), jnp.float32)
    y = 2.0 * X**2 + 0.05 * jnp.asarray(rng.normal(size=12), jnp.float32)
    X_un = jnp.linspace(-1, 1, 7)
    obj, model = step(lambda x, p: p["a"] * x.squeeze() ** 2, quadratic_prior,
                      X, y, X_un, gp_wrap=True, gp_kernel="RBF",
                      num_warmup=80, num_samples=80, print_summary=False)
    assert obj.shape == (7,)


def test_sample_next_policies():
    rewards = np.array([0.1, 0.9, 0.3])
    np.random.seed(0)
    picks = [sample_next(rewards, "softmax", temperature=0.1) for _ in range(20)]
    assert np.bincount(picks, minlength=3).argmax() == 1
    picks = [sample_next(rewards, "eps-greedy", eps=0.0) for _ in range(5)]
    assert all(p == 1 for p in picks)
    with pytest.raises(NotImplementedError):
        sample_next(rewards, "banana")


def test_update_record():
    record = np.zeros((3, 2))
    record = update_record(record, 1, 4.0)
    assert record[1, 0] == 1 and record[1, 1] == 4.0
    record = update_record(record, 1, 2.0)
    assert record[1, 0] == 2 and record[1, 1] == 3.0
