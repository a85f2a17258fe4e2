"""HMC building blocks: dual averaging, Welford, leapfrog reversibility,
step-size search, warmup schedule."""

import jax
import jax.numpy as jnp
import numpy as np

from gpax_tpu.infer.hmc_util import (
    da_init,
    da_update,
    find_reasonable_step_size,
    kinetic_energy,
    leapfrog,
    sample_momentum,
    warmup_schedule,
    welford_init,
    welford_update,
    welford_variance,
)


def test_dual_averaging_converges_to_target():
    """If accept_prob is a decreasing function of step size, DA drives it to target."""
    da = da_init(jnp.asarray(1.0))
    eps_star = 0.3

    def accept_model(eps):
        # accept decreases as eps grows; equals 0.8 at eps_star
        return jnp.clip(0.8 * eps_star / eps, 0.0, 1.0)

    for _ in range(200):
        eps = jnp.exp(da.log_step)
        da = da_update(da, accept_model(eps), target_accept=0.8)
    eps_final = float(jnp.exp(da.log_step_avg))
    assert abs(eps_final - eps_star) / eps_star < 0.2


def test_welford_matches_numpy():
    rng = np.random.default_rng(0)
    xs = rng.normal(2.0, 3.0, size=(500, 4)).astype(np.float32)
    st = welford_init(4)
    for x in xs:
        st = welford_update(st, jnp.asarray(x))
    var = np.asarray(welford_variance(st, regularize=False))
    np.testing.assert_allclose(var, xs.var(0, ddof=1), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(st.mean), xs.mean(0), rtol=1e-4)


def test_leapfrog_reversible():
    """Forward steps then negated-momentum backward steps return to start."""

    def pot(z):
        return 0.5 * jnp.sum(z * z)

    pg = jax.value_and_grad(pot)
    inv_mass = jnp.ones(3)
    z = jnp.asarray([1.0, -0.5, 0.3])
    r = jnp.asarray([0.2, 0.1, -0.4])
    _, g = pg(z)
    eps = jnp.asarray(0.1)
    z1, r1, _, g1 = leapfrog(lambda zz: pg(zz), z, r, eps, inv_mass, g)
    # reverse
    z2, r2, _, _ = leapfrog(lambda zz: pg(zz), z1, -r1, eps, inv_mass, g1)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-6)
    np.testing.assert_allclose(np.asarray(-r2), np.asarray(r), atol=1e-6)


def test_leapfrog_energy_conservation():
    def pot(z):
        return 0.5 * jnp.sum(z * z)

    pg = jax.value_and_grad(pot)
    inv_mass = jnp.ones(2)
    z = jnp.asarray([1.0, 0.0])
    r = jnp.asarray([0.0, 1.0])
    u, g = pg(z)
    h0 = float(u + kinetic_energy(r, inv_mass))
    eps = jnp.asarray(0.05)
    for _ in range(100):
        z, r, u, g = leapfrog(lambda zz: pg(zz), z, r, eps, inv_mass, g)
    h1 = float(u + kinetic_energy(r, inv_mass))
    assert abs(h1 - h0) < 1e-3


def test_find_reasonable_step_size_scales_with_curvature():
    inv_mass = jnp.ones(1)
    key = jax.random.PRNGKey(0)
    eps_narrow = float(find_reasonable_step_size(
        jax.value_and_grad(lambda z: 0.5 * jnp.sum(z * z) * 10000.0),
        jnp.asarray([0.1]), inv_mass, key))
    eps_wide = float(find_reasonable_step_size(
        jax.value_and_grad(lambda z: 0.5 * jnp.sum(z * z) * 0.01),
        jnp.asarray([0.1]), inv_mass, key))
    assert eps_narrow < eps_wide


def test_warmup_schedule_structure():
    in_win, win_end = warmup_schedule(500)
    in_win, win_end = np.asarray(in_win), np.asarray(win_end)
    assert in_win.shape == (500,)
    assert not in_win[:75].any()          # init buffer
    assert not in_win[-50:].any()         # terminal buffer
    assert win_end.sum() >= 2             # at least two mass-matrix updates
    # window ends must occur inside the adaptation window
    assert (in_win[np.where(win_end)[0]]).all()
    # tiny warmup: no mass adaptation
    iw, we = warmup_schedule(10)
    assert not np.asarray(iw).any() and not np.asarray(we).any()


def test_warmup_schedule_small_budget_term_buffer():
    # Every mass update restarts dual averaging, whose early iterates are
    # biased toward 10x the step size — a window may only close if >= 20
    # recovery steps remain.  At 50 the old schedule closed a window at step
    # 44 (5 recovery steps -> frozen step size inflated, accept 0.39 at
    # n=8192); now 50 degrades to step-size-only adaptation.
    iw, we = warmup_schedule(50)
    assert not np.asarray(iw).any() and not np.asarray(we).any()
    # where a window does fit, the final update leaves >= 20 recovery steps
    for n in (60, 100, 150, 500):
        iw, we = warmup_schedule(n)
        ends = np.where(np.asarray(we))[0]
        assert ends.size >= 1
        assert n - 1 - ends[-1] >= 20, (n, ends)


def test_sample_momentum_respects_mass():
    key = jax.random.PRNGKey(0)
    inv_mass = jnp.asarray([0.25, 4.0])
    rs = jax.vmap(lambda k: sample_momentum(k, inv_mass))(jax.random.split(key, 20000))
    var = np.asarray(rs).var(0)
    # r ~ N(0, M) with M = 1/inv_mass
    np.testing.assert_allclose(var, [4.0, 0.25], rtol=0.1)
