"""Scheduler math: table parity with diffusers' formulas, inversion
round-trip identities, DirectInversion difference scale."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnpinversion_tpu.schedulers.ddim import (
    add_noise,
    classifier_free_guidance,
    ddim_inverse_step,
    ddim_step,
    ddim_step_recon_guided,
    ddim_step_with_scale,
    make_ddim_schedule,
)


@pytest.fixture(scope="module")
def sched():
    return make_ddim_schedule(num_steps=50)


def test_timestep_grid(sched):
    ts = np.asarray(sched.timesteps)
    assert ts.shape == (50,)
    assert ts[0] == 980 and ts[-1] == 0
    assert np.all(np.diff(ts) == -20)


def test_alphas_match_torch_formula(sched):
    import torch

    betas = torch.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=torch.float64) ** 2
    alphas = torch.cumprod(1.0 - betas, dim=0).numpy()
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), alphas, rtol=1e-5)
    # set_alpha_to_one=False => final alpha is alphas_cumprod[0]
    assert float(sched.final_alpha_cumprod) == pytest.approx(float(alphas[0]), rel=1e-6)


def test_inversion_roundtrip_identity(sched):
    """next_step then prev_step with the same eps must return the input
    exactly (up to fp32 error) — the algebra the whole inversion stack rests on."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 8, 8, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    for i in [0, 10, 49]:
        t = sched.timesteps[i]
        x_next = ddim_inverse_step(sched, eps, t, x)
        x_back = ddim_step(sched, eps, t, x_next)
        np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=2e-5)


def test_difference_scale_is_derivative(sched):
    """difference_scale == d(prev_sample)/d(eps) (inversion.py:247-260)."""
    x = jnp.ones((1, 4, 4, 4))
    eps = jnp.full((1, 4, 4, 4), 0.3)
    t = sched.timesteps[5]
    _, scale = ddim_step_with_scale(sched, eps, t, x)
    f = lambda e: ddim_step(sched, e, t, x).sum()
    grad = jax.grad(f)(eps)
    np.testing.assert_allclose(np.asarray(grad), np.full((1, 4, 4, 4), float(scale)), rtol=1e-4)


def test_boundary_step_uses_final_alpha(sched):
    """At t=0 the previous timestep is negative -> final_alpha_cumprod."""
    x = jnp.ones((1, 2, 2, 4))
    eps = jnp.zeros((1, 2, 2, 4))
    t = jnp.int32(0)
    out = ddim_step(sched, eps, t, x)
    a_t = float(sched.alphas_cumprod[0])
    expected = (a_t**0.5) * (x / a_t**0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-5)


def test_recon_guided_step_pulls_to_ref(sched):
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 4))
    eps = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 4, 4))
    ref = jnp.zeros((1, 4, 4, 4))
    t = sched.timesteps[10]
    plain, x0_plain = ddim_step_recon_guided(sched, eps, t, x)
    guided, x0_guided = ddim_step_recon_guided(sched, eps, t, x, ref_image=ref, recon_lr=1.0)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(ddim_step(sched, eps, t, x)), atol=1e-6)
    # with recon_lr=1 and ref=0 the guided x0 is exactly 0
    np.testing.assert_allclose(np.asarray(x0_guided), 0.0, atol=1e-6)
    assert not np.allclose(np.asarray(plain), np.asarray(guided))

    mask = jnp.zeros((1, 4, 4, 4)).at[:, :2].set(1.0)
    masked, _ = ddim_step_recon_guided(sched, eps, t, x, ref_image=ref, recon_lr=1.0, recon_mask=mask)
    np.testing.assert_allclose(np.asarray(masked[:, 2:]), np.asarray(plain[:, 2:]), atol=1e-6)


def test_add_noise_matches_closed_form(sched):
    x0 = jnp.ones((1, 2, 2, 4))
    noise = jnp.full((1, 2, 2, 4), 2.0)
    t = jnp.int32(400)
    a = float(sched.alphas_cumprod[400])
    out = add_noise(sched, x0, noise, t)
    np.testing.assert_allclose(np.asarray(out), a**0.5 + 2.0 * (1 - a) ** 0.5, rtol=1e-5)


def test_cfg_combinator():
    u = jnp.array(1.0)
    c = jnp.array(3.0)
    assert float(classifier_free_guidance(u, c, 7.5)) == pytest.approx(1 + 7.5 * 2)


def test_scan_compatible(sched):
    """One jitted scan over all 50 steps — the shape the edit loops use."""

    def body(x, i):
        t = sched.timesteps[i]
        x = ddim_step(sched, jnp.zeros_like(x), t, x)
        return x, ()

    x0 = jnp.ones((1, 4, 4, 4))
    out, _ = jax.jit(lambda x: jax.lax.scan(body, x, jnp.arange(50)))(x0)
    assert np.isfinite(np.asarray(out)).all()
