import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpax_tpu.distributions as dist
from gpax_tpu import ppl


def simple_model(X, y=None):
    w = ppl.sample("w", dist.Normal(0.0, 1.0))
    b = ppl.sample("b", dist.Normal(0.0, 1.0))
    sig = ppl.sample("sig", dist.LogNormal(0.0, 1.0))
    mu = ppl.deterministic("mu", w * X + b)
    ppl.sample("y", dist.Normal(mu, sig), obs=y)


def plate_model():
    with ppl.plate("outer", 3):
        with ppl.plate("inner", 4):
            z = ppl.sample("z", dist.Normal(0.0, 1.0))
    return z


def test_seed_and_trace():
    tr = ppl.trace(ppl.seed(simple_model, 0)).get_trace(jnp.ones(5))
    assert set(tr) == {"w", "b", "sig", "mu", "y"}
    assert not tr["w"]["is_observed"]
    assert tr["mu"]["type"] == "deterministic"
    assert tr["y"]["value"].shape == (5,)


def test_seed_reproducible():
    t1 = ppl.trace(ppl.seed(simple_model, 42)).get_trace(jnp.ones(3))
    t2 = ppl.trace(ppl.seed(simple_model, 42)).get_trace(jnp.ones(3))
    np.testing.assert_allclose(np.asarray(t1["w"]["value"]), np.asarray(t2["w"]["value"]))


def test_plate_shapes():
    tr = ppl.trace(ppl.seed(plate_model, 0)).get_trace()
    assert tr["z"]["value"].shape == (3, 4)


def test_plate_no_double_expand():
    def model():
        X = jnp.zeros((5, 2))
        with ppl.plate("n", 5):
            with ppl.plate("d", 2):
                # distribution already has batch shape (5, 2): no extra dims
                xp = ppl.sample("xp", dist.Normal(X, 0.1))
        return xp

    tr = ppl.trace(ppl.seed(model, 0)).get_trace()
    assert tr["xp"]["value"].shape == (5, 2)


def test_substitute_and_condition():
    sub = ppl.substitute(simple_model, data={"w": jnp.asarray(2.0), "b": jnp.asarray(0.5)})
    tr = ppl.trace(ppl.seed(sub, 0)).get_trace(jnp.ones(2))
    np.testing.assert_allclose(np.asarray(tr["mu"]["value"]), 2.5)
    cond = ppl.condition(simple_model, data={"sig": jnp.asarray(1.0)})
    tr2 = ppl.trace(ppl.seed(cond, 0)).get_trace(jnp.ones(2))
    assert tr2["sig"]["is_observed"]


def test_log_density_matches_manual():
    X = jnp.array([0.0, 1.0, 2.0])
    y = jnp.array([0.1, 1.1, 2.3])
    params = {"w": jnp.asarray(1.0), "b": jnp.asarray(0.1), "sig": jnp.asarray(0.5)}
    ld, sites = ppl.log_density(simple_model, (X, y), {}, params)
    manual = (
        dist.Normal(0, 1).log_prob(params["w"])
        + dist.Normal(0, 1).log_prob(params["b"])
        + dist.LogNormal(0, 1).log_prob(params["sig"])
        + dist.Normal(params["w"] * X + params["b"], params["sig"]).log_prob(y).sum()
    )
    np.testing.assert_allclose(np.asarray(ld), np.asarray(manual), rtol=1e-6)


def test_log_density_jit_grad():
    X = jnp.array([0.0, 1.0, 2.0])
    y = jnp.array([0.1, 1.1, 2.3])

    @jax.jit
    def f(w):
        ld, _ = ppl.log_density(
            simple_model, (X, y), {},
            {"w": w, "b": jnp.asarray(0.0), "sig": jnp.asarray(1.0)},
        )
        return ld

    g = jax.grad(f)(jnp.asarray(1.0))
    assert np.isfinite(np.asarray(g))


def test_factor():
    def model():
        ppl.factor("pen", jnp.asarray(-3.0))

    ld, _ = ppl.log_density(model, (), {}, {})
    np.testing.assert_allclose(np.asarray(ld), -3.0)


def test_param_default_and_substituted():
    def model():
        return ppl.param("xu", jnp.ones(3))

    assert np.allclose(np.asarray(ppl.trace(model).get_trace()["xu"]["init_value"]), 1.0)
    sub = ppl.substitute(model, data={"xu": jnp.zeros(3)})
    with ppl.trace() as tr:
        out = sub()
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_initialize_model_and_potential():
    X = jnp.linspace(0, 1, 8)
    y = 2 * X + 0.3
    info = ppl.initialize_model(simple_model, jax.random.PRNGKey(0), (X, y))
    assert set(info.init_unconstrained) == {"w", "b", "sig"}
    u = info.potential_fn(info.init_unconstrained)
    assert np.isfinite(np.asarray(u))
    g = jax.grad(info.potential_fn)(info.init_unconstrained)
    assert all(np.isfinite(np.asarray(v)).all() for v in g.values())


def test_predictive_prior_and_posterior():
    X = jnp.linspace(0, 1, 8)
    pred = ppl.Predictive(simple_model, num_samples=11)
    out = pred(jax.random.PRNGKey(0), X)
    assert out["y"].shape == (11, 8)
    post = {"w": jnp.ones(5), "b": jnp.zeros(5), "sig": 0.1 * jnp.ones(5)}
    pred2 = ppl.Predictive(simple_model, posterior_samples=post)
    out2 = pred2(jax.random.PRNGKey(0), X)
    assert out2["y"].shape == (5, 8)
    np.testing.assert_allclose(np.asarray(out2["mu"]), np.asarray(jnp.tile(X, (5, 1))), atol=1e-6)


def test_vmapped_log_density():
    X = jnp.linspace(0, 1, 4)
    y = X
    ws = jnp.linspace(-1, 1, 6)

    def ld(w):
        out, _ = ppl.log_density(
            simple_model, (X, y), {},
            {"w": w, "b": jnp.asarray(0.0), "sig": jnp.asarray(1.0)},
        )
        return out

    vals = jax.vmap(ld)(ws)
    assert vals.shape == (6,)
    # analytic max of the log-joint: w* = Σx² / (Σx² + 1) with this prior/likelihood
    sx2 = float(jnp.sum(X * X))
    w_star = sx2 / (sx2 + 1.0)
    assert np.argmax(np.asarray(vals)) == np.argmin(np.abs(np.asarray(ws) - w_star))
