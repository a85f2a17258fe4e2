"""In-house NN module system: init/apply shapes, Bayesian/MLE registration."""

import jax
import jax.numpy as jnp
import numpy as np

from gpax_tpu import ppl
from gpax_tpu.nn import MLP, ConvNet, module_param, random_module


def test_mlp_shapes():
    m = MLP(embedim=3, hidden_dim=(16, 8))
    x = jnp.ones((5, 10))
    params = m.init(jax.random.PRNGKey(0), x)
    assert params["linear_0"]["w"].shape == (10, 16)
    assert params["linear_2"]["w"].shape == (8, 3)
    out = m.apply(params, x)
    assert out.shape == (5, 3)


def test_mlp_flattens_inputs():
    m = MLP(embedim=2)
    x = jnp.ones((4, 8, 8))  # image-like input flattened internally
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == (4, 2)


def test_convnet():
    m = ConvNet(embedim=2, channels=(4, 8), dense_dim=16)
    x = jnp.ones((3, 16, 16, 1))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (3, 2)
    x3 = jnp.ones((3, 16, 16))  # channelless images get a channel dim
    assert m.apply(params, x3).shape == (3, 2)


def test_random_module_sites():
    m = MLP(embedim=2, hidden_dim=(4,))

    def model(x):
        fe = random_module("feature_extractor", m, (1, 6))
        return fe(x)

    x = jnp.ones((3, 6))
    tr = ppl.trace(ppl.seed(lambda: model(x), 0)).get_trace()
    names = sorted(tr)
    assert "feature_extractor/linear_0/w" in names
    assert "feature_extractor/linear_1/b" in names
    assert tr["feature_extractor/linear_0/w"]["value"].shape == (6, 4)


def test_module_param_site():
    m = MLP(embedim=2, hidden_dim=(4,))

    def model(x):
        fe = module_param("feature_extractor", m, (1, 6))
        return fe(x)

    x = jnp.ones((3, 6))
    tr = ppl.trace(lambda: model(x)).get_trace()
    assert "feature_extractor$params" in tr
    assert tr["feature_extractor$params"]["type"] == "param"


def test_random_module_substitution_deterministic():
    """Substituting weight sites reproduces a deterministic forward pass."""
    m = MLP(embedim=1, hidden_dim=(4,))
    proto = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    subs = {
        "feature_extractor/linear_0/w": proto["linear_0"]["w"],
        "feature_extractor/linear_0/b": proto["linear_0"]["b"],
        "feature_extractor/linear_1/w": proto["linear_1"]["w"],
        "feature_extractor/linear_1/b": proto["linear_1"]["b"],
    }
    x = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)), jnp.float32)

    def model():
        fe = random_module("feature_extractor", m, (1, 3))
        return fe(x)

    with ppl.trace() as tr:
        out = ppl.substitute(model, data=subs)()
    np.testing.assert_allclose(np.asarray(out), np.asarray(m.apply(proto, x)), rtol=1e-6)
