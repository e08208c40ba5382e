"""The null-text / null-latent loops compute the cond UNet rows once per
outer step and reuse them wherever the reference recomputes them (the
UNet is batch-pointwise, so cond rows don't depend on the optimized
uncond embedding). The savings differ by method: the reference's
null-latent ablation (/root/reference/models/p2p/inversion.py:419-460)
runs fat b=2B [uncond, cond] batches in the inner Adam loop AND both
post-loop reconstructions — 10+ redundant cond rows per outer step —
while the reference's null-text loop (:196-225) already hoists the cond
prediction out of the inner loop under no_grad (:207-208), so only its
once-per-step advance (:222-224) carries a redundant cond row (~3%).
These tests pin the split-batch implementations against verbatim
fat-batch transcriptions."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pnpinversion_tpu.configs import TINY
from pnpinversion_tpu.inversion.ddim_inversion import (
    _eps,
    ddim_invert_loop,
    null_latent_offsets,
    null_text_optimization,
)
from pnpinversion_tpu.pipeline import SDPipeline
from pnpinversion_tpu.schedulers.ddim import classifier_free_guidance, ddim_step


@pytest.fixture(scope="module")
def pipe():
    return SDPipeline.create(TINY, rng=jax.random.PRNGKey(11), num_ddim_steps=4)


@pytest.fixture(scope="module")
def setup(pipe):
    rng = np.random.RandomState(5)
    size = pipe.config.vae.sample_size
    image = (rng.rand(size, size, 3) * 255).astype(np.uint8)
    from pnpinversion_tpu.models.vae import image_to_latent

    latent = image_to_latent(pipe.params["vae"], jnp.asarray(image), pipe.config.vae)
    cond = pipe.encode_prompt(["a cat on a mat", "a dog on a mat"])
    uncond = pipe.encode_prompt(["", ""])
    traj = ddim_invert_loop(pipe.params["unet"], pipe.schedule, latent, cond[:1],
                            pipe.config.unet)
    return traj, cond, uncond


def _fat_null_text(params, schedule, trajectory, uncond_embedding, cond_embedding,
                   guidance_scale, config, num_inner_steps, epsilon=1e-5):
    """Straight transcription of inversion.py:196-225: every call is the
    reference's concatenated b=2 [uncond, cond] UNet batch."""
    T = schedule.num_steps

    def outer(carry, i):
        latent_cur, uncond = carry
        t = schedule.timesteps[i]
        latent_prev = trajectory[T - 1 - i]
        eps_cond = _eps(params, latent_cur, t, cond_embedding, config)
        lr = 1e-2 * (1.0 - i.astype(jnp.float32) / 100.0)
        opt = optax.adam(learning_rate=1.0)
        thr = epsilon + i.astype(jnp.float32) * 2e-5

        def loss_fn(u):
            eps_uncond = _eps(params, latent_cur, t, u, config)
            eps = classifier_free_guidance(eps_uncond, eps_cond, guidance_scale)
            rec = ddim_step(schedule, eps, t, latent_cur)
            d = (rec - latent_prev).astype(jnp.float32)
            return jnp.mean(d * d)

        def cond_fn(st):
            _, _, j, last_loss = st
            return (j < num_inner_steps) & (last_loss >= thr)

        def body_fn(st):
            u, opt_state, j, _ = st
            loss, grad = jax.value_and_grad(loss_fn)(u)
            updates, opt_state = opt.update(grad, opt_state, u)
            u = optax.apply_updates(u, jax.tree.map(lambda g: g * lr, updates))
            return (u, opt_state, j + 1, loss)

        init = (uncond, opt.init(uncond), jnp.int32(0), jnp.float32(jnp.inf))
        uncond, _, _, _ = jax.lax.while_loop(cond_fn, body_fn, init)

        ctx = jnp.concatenate([uncond, cond_embedding], axis=0)
        eps2 = _eps(params, jnp.concatenate([latent_cur] * 2, axis=0), t, ctx, config)
        eps = classifier_free_guidance(eps2[:1], eps2[1:], guidance_scale)
        latent_cur = ddim_step(schedule, eps, t, latent_cur)
        return (latent_cur, uncond), uncond

    (_, _), uncond_list = jax.lax.scan(
        outer, (trajectory[-1], uncond_embedding), jnp.arange(T))
    return uncond_list


def _fat_null_latent(params, schedule, trajectory, context, guidance_scale,
                     config, num_inner_steps, epsilon=1e-5):
    """Straight transcription of inversion.py:419-460: the inner loop and
    both post-loop reconstructions run fat b=2B [uncond, cond] batches."""
    T = schedule.num_steps
    B = context.shape[0] // 2
    uncond0, cond = context[:B], context[B:]
    latent0 = jnp.broadcast_to(trajectory[-1], (B,) + trajectory.shape[2:])

    def outer(carry, i):
        latent_cur, uncond = carry
        t = schedule.timesteps[i]
        latent_prev = jnp.broadcast_to(trajectory[T - 1 - i], latent_cur.shape)
        lr = 1e-2 * (1.0 - i.astype(jnp.float32) / 100.0)
        opt = optax.adam(learning_rate=1.0)
        thr = epsilon + i.astype(jnp.float32) * 2e-5

        def loss_fn(u):
            ctx = jnp.concatenate([u, cond], axis=0)
            eps2 = _eps(params, jnp.concatenate([latent_cur] * 2, axis=0), t, ctx,
                        config)
            eps = classifier_free_guidance(eps2[:B], eps2[B:], guidance_scale)
            rec = ddim_step(schedule, eps, t, latent_cur)
            d = (rec[:1] - latent_prev[:1]).astype(jnp.float32)
            return jnp.mean(d * d)

        def cond_fn(st):
            _, _, j, last_loss = st
            return (j < num_inner_steps) & (last_loss >= thr)

        def body_fn(st):
            u, opt_state, j, _ = st
            loss, grad = jax.value_and_grad(loss_fn)(u)
            updates, opt_state = opt.update(grad, opt_state, u)
            u = optax.apply_updates(u, jax.tree.map(lambda g: g * lr, updates))
            return (u, opt_state, j + 1, loss)

        init = (uncond, opt.init(uncond), jnp.int32(0), jnp.float32(jnp.inf))
        uncond, _, _, _ = jax.lax.while_loop(cond_fn, body_fn, init)

        eps2 = _eps(params, jnp.concatenate([latent_cur] * 2, axis=0), t, context,
                    config)
        eps = classifier_free_guidance(eps2[:B], eps2[B:], guidance_scale)
        prev_rec = ddim_step(schedule, eps, t, latent_cur)
        # :454 — get_noise_pred(...)[0] indexes prev_step's
        # (prev_sample, difference_scale) tuple (:247-260,:287): the FULL
        # batch optimized-context reconstruction, not batch row 0.
        ctx_opt = jnp.concatenate([uncond, cond], axis=0)
        eps2o = _eps(params, jnp.concatenate([latent_cur] * 2, axis=0), t, ctx_opt,
                     config)
        epso = classifier_free_guidance(eps2o[:B], eps2o[B:], guidance_scale)
        lat_opt = ddim_step(schedule, epso, t, latent_cur)
        loss = lat_opt - prev_rec
        return (prev_rec + loss, uncond), loss

    (_, _), losses = jax.lax.scan(outer, (latent0, uncond0), jnp.arange(T))
    return losses


def test_null_text_split_matches_fat(pipe, setup):
    traj, cond, uncond = setup
    g = jnp.asarray(7.5)
    got = null_text_optimization(
        pipe.params["unet"], pipe.schedule, traj, uncond[:1], cond[:1], g,
        pipe.config.unet, num_inner_steps=2)
    want = _fat_null_text(
        pipe.params["unet"], pipe.schedule, traj, uncond[:1], cond[:1], g,
        pipe.config.unet, num_inner_steps=2)
    # identical math; only fusion/batching differ (ulp-level, amplified by
    # the chaotic random tiny UNet across 4 outer steps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_null_latent_split_matches_fat(pipe, setup):
    traj, cond, uncond = setup
    g = jnp.asarray(7.5)
    context = jnp.concatenate([uncond, cond], axis=0)
    got = null_latent_offsets(
        pipe.params["unet"], pipe.schedule, traj, context, g,
        pipe.config.unet, num_inner_steps=2)
    want = _fat_null_latent(
        pipe.params["unet"], pipe.schedule, traj, context, g,
        pipe.config.unet, num_inner_steps=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
