"""Multi-chip PIE-Bench sweep: data-parallel image batches over a device mesh.

The reference parallelizes the 700-image sweep by launching multiple
processes on disjoint categories (SURVEY.md §2.14); here the editing phases
are ``jax.vmap``-ped over an image axis and sharded across a ``('dp',)``
mesh, so a v5e-8 runs 8 images per step with zero cross-device traffic
(metrics reduce with a single psum at the end).

Pattern:
  sweep = BatchedDirectInversionP2P(pipe, mesh)
  strips = sweep.edit(images_u8, src_embs, tgt_embs, tensors_batch)

Images whose controller *spec* differs (replace vs refine, blend on/off)
compile to different programs; group_items_by_spec buckets them first.
"""
from __future__ import annotations

import dataclasses
import re
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pnpinversion_tpu.control.p2p import P2PControl, P2PSpec
from pnpinversion_tpu.inversion.ddim_inversion import (
    ddim_invert_loop,
    direct_inversion_offsets,
)
from pnpinversion_tpu.models.vae import image_to_latent, latent_to_image
from pnpinversion_tpu.pipeline import SDPipeline

Array = jax.Array


def make_dp_mesh(n_devices: Optional[int] = None) -> Mesh:
    # multi-host: each process runs an independent sweep over its LOCAL
    # chips (items are process-sharded upstream), so the mesh is local
    devs = jax.local_devices() if jax.process_count() > 1 else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("dp",))


def make_dp_tp_mesh(n_devices: Optional[int] = None, tp: int = 1) -> Mesh:
    """(dp, tp) mesh: images shard over dp, UNet matmul output dims over tp
    (SURVEY.md §2.14's optional tensor parallelism — lowers per-image latency
    when there are more chips than in-flight images)."""
    devs = jax.local_devices() if jax.process_count() > 1 else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    assert len(devs) % tp == 0, (len(devs), tp)
    return Mesh(np.array(devs).reshape(len(devs) // tp, tp), ("dp", "tp"))


def param_shardings(mesh: Mesh, params):
    """Tensor-parallel param placement: shard linear kernels' output dim and
    conv kernels' output-channel dim over ``tp``; everything else replicated
    (GSPMD propagates the activation shardings + collectives from these)."""
    if "tp" not in mesh.axis_names or mesh.shape["tp"] == 1:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
    tp = mesh.shape["tp"]

    def spec(leaf):
        nd = getattr(leaf, "ndim", 0)
        if nd in (2, 4) and leaf.shape[-1] % tp == 0 and leaf.shape[-1] >= 2 * tp:
            return P(*([None] * (nd - 1) + ["tp"]))
        return P()

    return jax.tree.map(lambda l: NamedSharding(mesh, spec(l)), params)


def _cached_embed(obj, prompts, dtype=None):
    """Encode-once-per-sweep-instance prompt embeddings: constant prompts
    ("" etc.) must be jit ARGUMENTS (a closure capture bakes them into the
    executable as constants — see pipeline._encode_ids) but should not pay
    one text-encoder dispatch per chunk either."""
    key = ("emb", tuple(prompts), dtype)
    if key not in obj._cache:
        e = obj.pipe.encode_prompt(list(prompts))
        obj._cache[key] = e if dtype is None else e.astype(dtype)
    return obj._cache[key]


def group_items_by_spec(items: Sequence[dict], keyfn: Callable[[dict], Any]) -> Dict[Any, List[dict]]:
    groups: Dict[Any, List[dict]] = {}
    for it in items:
        groups.setdefault(keyfn(it), []).append(it)
    return groups


def pad_batch(arrays: List[np.ndarray], multiple: int) -> Tuple[np.ndarray, int]:
    """Stack and pad the leading axis up to a multiple (repeating the last
    element); returns (batch, real_count)."""
    n = len(arrays)
    rem = (-n) % multiple
    padded = list(arrays) + [arrays[-1]] * rem
    return np.stack(padded), n


class BatchedDirectInversionP2P:
    """P2P-family inversion variants over a dp-sharded image batch:
    directinversion+p2p, ddim+p2p, negative-prompt-inversion+p2p and
    null-text-inversion+p2p.

    The per-image pipelines mirror editors/p2p_editor.py's
    edit_direct_inversion / edit_ddim / edit_negative_prompt /
    edit_null_text; vmap adds the image axis. For every variant the
    controller never modifies the source row of the edit scan (P2P edits
    target rows; LocalBlend is a no-op on row 0), so the edit pass's row 0
    IS the reconstruction pass — each image costs one batch-2 scan, with no
    separate recon replay. The ``uncond2`` input is per-image so
    negative-prompt inversion can feed its "fake uncond" (= source cond,
    optionally slerped — p2p_editor.py:324-414) through the same program.
    """

    VARIANTS = ("directinversion+p2p", "ddim+p2p",
                "negative-prompt-inversion+p2p", "null-text-inversion+p2p",
                "negative-prompt-inversion+proximal-guidance",
                "null-text-inversion+proximal-guidance")

    ABLATIONS = ("ablation_directinversion_04+p2p",
                 "ablation_directinversion_08+p2p",
                 "ablation_directinversion_add-source+p2p",
                 "ablation_directinversion_add-target+p2p",
                 "ablation_null-latent-inversion+p2p",
                 "ablation_null-text-inversion_single_branch+p2p")

    @classmethod
    def supports(cls, method: str) -> bool:
        """True for the fixed variants plus the group-3 guidance grid
        (directinversion+p2p_guidance_<inv>_<fwd>, p2p_editor.py:270-277)
        and the group 5-8 ablations (incl. interval_<k> and step_<n>)."""
        return (method in cls.VARIANTS or method in cls.ABLATIONS
                or method.startswith("directinversion+p2p_guidance_")
                or method.startswith("ablation_directinversion_interval_")
                or cls.step_ablation_steps(method) is not None)

    @staticmethod
    def step_ablation_steps(method: str) -> Optional[int]:
        """Group-7 step-count ablation (evaluate.py:167-170): the method IS
        plain directinversion+p2p run at a different DDIM step count; the
        pipeline must be created with num_ddim_steps=<n> and the output folder
        keeps the ablation name."""
        m = re.fullmatch(r"ablation_directinversion_step_(\d+)\+p2p", method)
        return int(m.group(1)) if m else None

    def __init__(self, pipe: SDPipeline, mesh: Optional[Mesh] = None,
                 num_inner_steps: int = 10, proximal: str = "l0",
                 quantile: float = 0.75, recon_lr: float = 1.0,
                 recon_t: int = 400, dilate_mask: int = 1):
        self.pipe = pipe
        self.mesh = mesh if mesh is not None else make_dp_mesh()
        self.num_inner_steps = num_inner_steps  # null-text Adam inner steps
        # ProxEdit statics (benchmark values, run_editing_p2p.py:133-138:
        # proximal=l0, quantile=.75, use_inversion_guidance, recon_lr=1,
        # recon_t=400)
        self.prox = (proximal, quantile, recon_lr, recon_t, dilate_mask)
        self._cache: Dict[Any, Any] = {}

    def _sharding(self):
        return NamedSharding(self.mesh, P("dp"))

    def _replicated(self):
        return NamedSharding(self.mesh, P())

    def _fn(self, spec: P2PSpec, method: str = "directinversion+p2p"):
        key = (spec, method)
        if key in self._cache:
            return self._cache[key]
        from pnpinversion_tpu.control.base import NO_CONTROL
        from pnpinversion_tpu.inversion.ddim_inversion import (
            direct_inversion_offsets,
            make_step_gate,
            null_latent_offsets,
            null_text_optimization,
        )
        from pnpinversion_tpu.sampling.p2p_forward import (
            fused_direct_inversion_edit,
            fused_direct_inversion_edit_srcfree,
            guidance_forward,
            guidance_forward_single_branch,
            proximal_guidance_forward,
        )

        pipe = self.pipe
        sched, ucfg, vcfg = pipe.schedule, pipe.config.unet, pipe.config.vae
        control = P2PControl(spec)
        srcfree_control = P2PControl(
            dataclasses.replace(spec, uncond_rows=spec.batch_size - 1))
        inner = self.num_inner_steps
        prox, quantile, recon_lr, recon_t, dilate = self.prox
        inv_g = None
        if method.startswith("directinversion+p2p_guidance_"):
            from pnpinversion_tpu.editors.p2p_editor import GUIDANCE_GRID

            inv_g = GUIDANCE_GRID[method.split("_")[-2]]

        def one_image(params, image_u8, cond, uncond2, g, tensors):
            """image_u8 (H,W,3); cond/uncond2 (2,77,D); tensors per-image
            pytree. directinversion uses the fused offsets+edit scan and the
            exact-reconstruction shortcut (recon = decode(traj[0]))."""
            vae_p, unet_p = params["vae"], params["unet"]
            latent = image_to_latent(vae_p, image_u8, vcfg, dtype=pipe.dtype)
            if inv_g is not None:
                from pnpinversion_tpu.inversion.ddim_inversion import (
                    ddim_invert_loop_cfg,
                )

                traj = ddim_invert_loop_cfg(
                    unet_p, sched, latent, uncond2[:1], cond[:1],
                    jnp.asarray(inv_g, pipe.dtype), ucfg)
            else:
                traj = ddim_invert_loop(unet_p, sched, latent, cond[:1], ucfg)
            if method.startswith("ablation_"):
                # groups 5-8: explicit offsets replay + controlled edit scan
                # (editor edit_direct_inversion slow path / edit_null_latent /
                # edit_null_text single_branch). The controller never touches
                # row 0, so the edit scan's row 0 IS the recon pass.
                T = sched.num_steps
                if method == "ablation_null-text-inversion_single_branch+p2p":
                    uncond_steps = null_text_optimization(
                        unet_p, sched, traj, uncond2[:1], cond[:1], g, ucfg,
                        num_inner_steps=inner)
                    rows = guidance_forward_single_branch(
                        unet_p, sched, ucfg, traj[-1], cond, uncond_steps,
                        uncond2, g, control, tensors)
                else:
                    ctx = jnp.concatenate([uncond2, cond], axis=0)
                    if method == "ablation_null-latent-inversion+p2p":
                        noise_loss = null_latent_offsets(
                            unet_p, sched, traj, ctx, g, ucfg,
                            num_inner_steps=inner)
                        row_mask = jnp.array([1.0, 0.0], pipe.dtype)
                    else:
                        scale, skip = 1.0, 1
                        if method.startswith("ablation_directinversion_interval_"):
                            skip = int(method.split("+")[0].split("_")[-1])
                        elif method in ("ablation_directinversion_04+p2p",
                                        "ablation_directinversion_08+p2p"):
                            scale = float(
                                method.split("+")[0].split("_")[-1]) / 10
                        gate = make_step_gate(T, scale, skip, pipe.dtype)
                        noise_loss, _ = direct_inversion_offsets(
                            unet_p, sched, traj, ctx, g, ucfg, gate)
                        if method == "ablation_directinversion_add-source+p2p":
                            # source offsets applied to both rows (:930-933)
                            noise_loss = jnp.broadcast_to(
                                noise_loss[:, :1], noise_loss.shape)
                            row_mask = jnp.array([1.0, 1.0], pipe.dtype)
                        elif method == "ablation_directinversion_add-target+p2p":
                            row_mask = jnp.array([1.0, 1.0], pipe.dtype)
                        else:
                            row_mask = jnp.array([1.0, 0.0], pipe.dtype)
                    rows = guidance_forward(
                        unet_p, sched, ucfg, traj[-1], cond, uncond2, g,
                        control, tensors, noise_loss, row_mask)
                recon_lat = rows[:1]
            elif method.endswith("proximal-guidance"):
                # ProxEdit: the shrunk CFG delta makes the edit pass's source
                # row diverge from a plain replay, so the recon pass is a
                # separate batch-1 scan (editor edit_*_proximal phases)
                if method.startswith("null-text"):
                    unc = null_text_optimization(
                        unet_p, sched, traj, uncond2[:1], cond[:1], g, ucfg,
                        num_inner_steps=inner)
                    unc_r = unc
                else:
                    unc, unc_r = uncond2, uncond2[:1]
                recon_lat = proximal_guidance_forward(
                    unet_p, sched, ucfg, traj[-1], cond[:1], unc_r, g,
                    NO_CONTROL, None, edit_stage=False, prox=None,
                    quantile=quantile, recon_lr=recon_lr, recon_t=recon_t,
                    dilate_mask=dilate)
                rows = proximal_guidance_forward(
                    unet_p, sched, ucfg, traj[-1], cond, unc, g, control,
                    tensors, edit_stage=True, prox=prox, quantile=quantile,
                    recon_lr=recon_lr, recon_t=recon_t,
                    inversion_guidance=True, x_stars=traj,
                    dilate_mask=dilate)
            elif method == "null-text-inversion+p2p":
                uncond_steps = null_text_optimization(
                    unet_p, sched, traj, uncond2[:1], cond[:1], g, ucfg,
                    num_inner_steps=inner)
                rows = guidance_forward(
                    unet_p, sched, ucfg, traj[-1], cond, uncond_steps, g,
                    control, tensors)
                recon_lat = rows[:1]
            else:
                is_direct = method.startswith("directinversion+p2p")
                if is_direct:
                    # full offsets: source row re-snaps to the trajectory, so
                    # the dead uncond-source UNet row is dropped (3-row scan)
                    rows = fused_direct_inversion_edit_srcfree(
                        unet_p, sched, ucfg, traj, cond, uncond2, g,
                        srcfree_control, tensors)
                    recon_lat = traj[0]
                else:
                    row_mask = jnp.zeros((2,), pipe.dtype)
                    gate = jnp.ones((sched.num_steps,), pipe.dtype)
                    rows = fused_direct_inversion_edit(
                        unet_p, sched, ucfg, traj, cond, uncond2, g, control,
                        tensors, row_mask, gate)
                    recon_lat = rows[:1]
            recon_img = latent_to_image(vae_p, recon_lat, vcfg)[0]
            edit_img = latent_to_image(vae_p, rows[-1:], vcfg)[0]
            return recon_img, edit_img

        batched = jax.vmap(one_image, in_axes=(None, 0, 0, 0, None, 0))

        fn = jax.jit(
            batched,
            in_shardings=(param_shardings(self.mesh, self.pipe.params),
                          self._sharding(), self._sharding(),
                          self._sharding(), self._replicated(), self._sharding()),
            out_shardings=(self._sharding(), self._sharding()),
        )
        self._cache[key] = fn
        return fn

    def edit_batch(self, spec: P2PSpec, images_u8: Array, cond: Array,
                   uncond: Array, guidance_scale: float, tensors,
                   method: str = "directinversion+p2p") -> Tuple[Array, Array]:
        """images_u8 (N,H,W,3); cond (N,2,77,D); uncond (2,77,D) shared or
        (N,2,77,D) per-image; tensors: pytree with leading N.
        Returns (recon_imgs, edit_imgs) uint8 (N,H,W,3)."""
        if self.step_ablation_steps(method) is not None:
            # group 7: same program as the flagship, just a different step
            # count baked into the pipeline's schedule at creation time
            method = "directinversion+p2p"
        uncond = jnp.asarray(uncond)
        if uncond.ndim == 3:
            uncond = jnp.broadcast_to(
                uncond[None], (images_u8.shape[0],) + uncond.shape)
        with self.mesh:
            return self._fn(spec, method)(
                self.pipe.params, images_u8, cond, uncond,
                jnp.asarray(guidance_scale, self.pipe.dtype), tensors)


class BatchedMasaCtrl:
    """MasaCtrl (ddim+ / directinversion+) over a dp-sharded image batch.

    The per-image pipeline is exactly editors/masactrl_editor.py's phases
    (invert with the empty prompt, optional DirectInversion offsets, one
    batch-2 mutual-self-attention sampling pass); vmap adds the image axis.
    """

    def __init__(self, pipe: SDPipeline, mesh: Optional[Mesh] = None,
                 start_step: int = 4, start_layer: int = 10):
        self.pipe = pipe
        self.mesh = mesh if mesh is not None else make_dp_mesh()
        self.start_step = start_step
        self.start_layer = start_layer
        self._cache: Dict[Any, Any] = {}

    def _fn(self, use_offsets: bool):
        key = ("masactrl", use_offsets)
        if key in self._cache:
            return self._cache[key]
        from pnpinversion_tpu.control.masactrl import MasaCtrlControl, MasaCtrlSpec
        from pnpinversion_tpu.sampling.p2p_forward import (
            fused_direct_inversion_edit,
        )

        pipe = self.pipe
        sched, ucfg, vcfg = pipe.schedule, pipe.config.unet, pipe.config.vae
        T = sched.num_steps
        control = MasaCtrlControl(MasaCtrlSpec(start_step=self.start_step,
                                               start_layer=self.start_layer))

        def one_image(params, image_u8, cond, uncond, g):
            """cond: (2, 77, D) = ["", target]. The offsets variant computes
            the DirectInversion loss from the sampling pass's own source row
            (editors/masactrl_editor._sample_fused algebra); ddim+ zeroes the
            row mask, which degenerates the same scan to plain sampling."""
            latent = image_to_latent(params["vae"], image_u8, vcfg,
                                     dtype=pipe.dtype)
            traj = ddim_invert_loop(params["unet"], sched, latent, cond[:1], ucfg)
            row_mask = (jnp.array([1.0, 0.0], pipe.dtype) if use_offsets
                        else jnp.zeros((2,), pipe.dtype))
            lat = fused_direct_inversion_edit(
                params["unet"], sched, ucfg, traj, cond, uncond, g, control,
                {}, row_mask, jnp.ones((T,), pipe.dtype))
            imgs = latent_to_image(params["vae"], lat, vcfg)
            return imgs[0], imgs[1]

        batched = jax.vmap(one_image, in_axes=(None, 0, 0, None, None))
        repl = NamedSharding(self.mesh, P())
        shard = NamedSharding(self.mesh, P("dp"))
        fn = jax.jit(batched,
                     in_shardings=(param_shardings(self.mesh, self.pipe.params),
                                   shard, shard, repl, repl),
                     out_shardings=(shard, shard))
        self._cache[key] = fn
        return fn

    def edit_batch(self, use_offsets: bool, images_u8: Array, cond: Array,
                   guidance_scale: float) -> Tuple[Array, Array]:
        """images_u8 (N,H,W,3); cond (N,2,77,D) rows ["", target]."""
        uncond = _cached_embed(self, ["", ""])
        with self.mesh:
            return self._fn(use_offsets)(
                self.pipe.params, images_u8, cond, uncond,
                jnp.asarray(guidance_scale, self.pipe.dtype))


class BatchedPix2PixZero:
    """pix2pix-zero (ddim+ / directinversion+) over a dp-sharded image batch
    (per-image pipeline = editors/pix2pix_zero_editor.py: posterior-sampled
    VAE encode, regularized inversion, fused two-pass map-guided edit).
    Captions are host-side inputs (BLIP or a caption file), pre-encoded to
    embeddings by the caller."""

    def __init__(self, pipe: SDPipeline, mesh: Optional[Mesh] = None,
                 steps_offset: int = 1, seed: int = 1234,
                 xa_guidance: float = 0.1):
        from pnpinversion_tpu.schedulers.ddim import make_ddim_schedule

        self.pipe = pipe
        self.mesh = mesh if mesh is not None else make_dp_mesh()
        self.schedule = make_ddim_schedule(
            num_steps=pipe.schedule.num_steps, steps_offset=steps_offset)
        self.seed = seed
        self.xa_guidance = xa_guidance
        self._cache: Dict[Any, Any] = {}

    def _fn(self, use_offsets: bool):
        if use_offsets in self._cache:
            return self._cache[use_offsets]
        from pnpinversion_tpu.inversion.pix2pix_zero import p2z_edit, p2z_invert
        from pnpinversion_tpu.models.vae import vae_encode

        pipe = self.pipe
        sched, ucfg, vcfg = self.schedule, pipe.config.unet, pipe.config.vae
        xa = self.xa_guidance

        def one_image(params, image_u8, cond_caption, edit_dir, g, rng):
            """cond_caption (1,77,D); edit_dir (1,77,D)."""
            k_enc, k_inv = jax.random.split(rng)
            img01 = image_u8.astype(pipe.dtype) / 127.5 - 1.0
            latent = vae_encode(params["vae"], img01[None], vcfg, rng=k_enc)
            traj = p2z_invert(params["unet"], sched, latent, cond_caption,
                              ucfg, k_inv)
            prompt_embeds = jnp.concatenate([cond_caption, cond_caption], axis=0)
            rec, edit = p2z_edit(params["unet"], sched, traj[-1], prompt_embeds,
                                 edit_dir, g, xa, ucfg,
                                 latent_list=traj if use_offsets else None)
            recon_img = latent_to_image(params["vae"], rec, vcfg)[0]
            edit_img = latent_to_image(params["vae"], edit, vcfg)[0]
            return recon_img, edit_img

        batched = jax.vmap(one_image, in_axes=(None, 0, 0, 0, None, None))
        repl = NamedSharding(self.mesh, P())
        shard = NamedSharding(self.mesh, P("dp"))
        fn = jax.jit(batched,
                     in_shardings=(param_shardings(self.mesh, self.pipe.params),
                                   shard, shard, shard, repl, repl),
                     out_shardings=(shard, shard))
        self._cache[use_offsets] = fn
        return fn

    def edit_batch(self, method: str, images_u8: Array, cond_caption: Array,
                   edit_dir: Array, guidance_scale: float = 7.5
                   ) -> Tuple[Array, Array]:
        """images_u8 (N,H,W,3); cond_caption/edit_dir (N,1,77,D)."""
        use_offsets = method == "directinversion+pix2pix-zero"
        with self.mesh:
            return self._fn(use_offsets)(
                self.pipe.params, images_u8, cond_caption, edit_dir,
                jnp.asarray(guidance_scale, self.pipe.dtype),
                jax.random.PRNGKey(self.seed))


class BatchedInstruct:
    """InstructPix2Pix / InstructDiffusion over a dp-sharded image batch
    (per-image pipeline = editors/instruct_editor.py, vmapped). The pipe
    must carry the 8-in-channel UNet (configs.IP2P)."""

    VARIANTS = {"instruct-pix2pix": ("ip2p", 7.5, 1.5),
                "instruct-diffusion": ("instructdiff", 5.0, 1.25)}

    def __init__(self, pipe: SDPipeline, mesh: Optional[Mesh] = None,
                 steps: Optional[int] = None, seed: int = 1234):
        self.pipe = pipe
        self.mesh = mesh if mesh is not None else make_dp_mesh()
        self.steps = steps if steps is not None else pipe.schedule.num_steps
        self.seed = seed
        self._cache: Dict[Any, Any] = {}

    def _fn(self, method: str):
        if method in self._cache:
            return self._cache[method]
        from pnpinversion_tpu.editors.instruct_editor import instruct_sample
        from pnpinversion_tpu.models.vae import vae_encode

        pipe = self.pipe
        sched, ucfg, vcfg = pipe.schedule, pipe.config.unet, pipe.config.vae
        variant, cfg_text, cfg_image = self.VARIANTS[method]
        steps = self.steps

        def one_image(params, image_u8, text_cond, text_uncond, ct, ci, rng):
            """text_cond (1,77,D) instruction embedding."""
            img01 = image_u8.astype(pipe.dtype) / 127.5 - 1.0
            image_cond = vae_encode(params["vae"], img01[None], vcfg, scale=False)
            lat = instruct_sample(params["unet"], sched, ucfg, image_cond,
                                  text_cond, text_uncond, steps, ct, ci, rng,
                                  variant)
            return latent_to_image(params["vae"], lat, vcfg)[0]

        batched = jax.vmap(one_image,
                           in_axes=(None, 0, 0, None, None, None, None))
        repl = NamedSharding(self.mesh, P())
        shard = NamedSharding(self.mesh, P("dp"))
        fn = jax.jit(batched,
                     in_shardings=(param_shardings(self.mesh, self.pipe.params),
                                   shard, shard, repl, repl, repl, repl),
                     out_shardings=shard)
        self._cache[method] = fn
        return fn

    def edit_batch(self, method: str, images_u8: Array, text_cond: Array,
                   cfg_text: Optional[float] = None,
                   cfg_image: Optional[float] = None) -> Array:
        """images_u8 (N,H,W,3); text_cond (N,1,77,D). Returns edit images."""
        _, ct0, ci0 = self.VARIANTS[method]
        with self.mesh:
            return self._fn(method)(
                self.pipe.params, images_u8, text_cond,
                _cached_embed(self, [""]),
                jnp.asarray(cfg_text if cfg_text is not None else ct0, self.pipe.dtype),
                jnp.asarray(cfg_image if cfg_image is not None else ci0, self.pipe.dtype),
                jax.random.PRNGKey(self.seed))


class BatchedBLD:
    """Blended Latent Diffusion over a dp-sharded image batch (per-image
    pipeline = editors/bld_editor.py's phases, vmapped). The reference runs
    SD2.1-base (run_editing_blended_latent_diffusion.py:43); pass a pipe
    built from configs.SD21 for parity."""

    def __init__(self, pipe: SDPipeline, mesh: Optional[Mesh] = None,
                 blending_percentage: float = 0.25, seed: int = 42):
        self.pipe = pipe
        self.mesh = mesh if mesh is not None else make_dp_mesh()
        self.blending_percentage = blending_percentage
        self.seed = seed
        self._fn_cache = None
        self._cache = {}

    def _fn(self):
        if self._fn_cache is not None:
            return self._fn_cache
        from pnpinversion_tpu.editors.bld_editor import bld_sample

        pipe = self.pipe
        sched, ucfg, vcfg = pipe.schedule, pipe.config.unet, pipe.config.vae

        def one_image(params, image_u8, latent_mask, cond, uncond, g, rng):
            """cond (1,77,D) target prompt; latent_mask (h,w,1)."""
            src = image_to_latent(params["vae"], image_u8, vcfg, dtype=pipe.dtype)
            ctx = jnp.concatenate([uncond, cond], axis=0)
            lat = bld_sample(params["unet"], sched, ucfg, src, latent_mask,
                             ctx, g, rng, self.blending_percentage)
            return latent_to_image(params["vae"], lat, vcfg)[0]

        batched = jax.vmap(one_image,
                           in_axes=(None, 0, 0, 0, None, None, None))
        repl = NamedSharding(self.mesh, P())
        shard = NamedSharding(self.mesh, P("dp"))
        self._fn_cache = jax.jit(
            batched,
            in_shardings=(param_shardings(self.mesh, self.pipe.params),
                          shard, shard, shard, repl, repl, repl),
            out_shardings=shard)
        return self._fn_cache

    def edit_batch(self, images_u8: Array, latent_masks: Array, cond: Array,
                   guidance_scale: float = 7.5) -> Array:
        """images_u8 (N,H,W,3); latent_masks (N,h,w,1); cond (N,1,77,D).
        Returns edit images (N,H,W,3) uint8 (BLD's recon panel is zeros)."""
        with self.mesh:
            return self._fn()(
                self.pipe.params, images_u8,
                jnp.asarray(latent_masks, self.pipe.dtype), cond,
                _cached_embed(self, [""]),
                jnp.asarray(guidance_scale, self.pipe.dtype),
                jax.random.PRNGKey(self.seed))


class BatchedEDICT:
    """EDICT (direct_forward / +p2p) over a dp-sharded image batch
    (per-image pipeline = editors/edict_editor.py's phases, vmapped;
    UNet runs f32 — coupled-scan exactness is precision-critical)."""

    def __init__(self, pipe: SDPipeline, mesh: Optional[Mesh] = None,
                 precision: str = "f32", steps_offset: int = 0,
                 mix_weight: float = 0.93, init_image_strength: float = 0.8):
        from pnpinversion_tpu.schedulers.ddim import make_ddim_schedule

        assert precision in ("f32", "df64"), precision
        self.pipe = pipe
        self.mesh = mesh if mesh is not None else make_dp_mesh()
        self.precision = precision
        self.schedule = make_ddim_schedule(
            num_steps=pipe.schedule.num_steps, steps_offset=steps_offset)
        self.mix_weight = mix_weight
        self.init_image_strength = init_image_strength
        self._params_f32 = jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x,
            pipe.params)
        self._cache: Dict[Any, Any] = {}

    def _fn(self, use_p2p: bool):
        if use_p2p in self._cache:
            return self._cache[use_p2p]
        from pnpinversion_tpu.editors.edict_editor import coupled_scan

        pipe = self.pipe
        sched, ucfg, vcfg = self.schedule, pipe.config.unet, pipe.config.vae
        T = sched.num_steps
        mw, prec = self.mix_weight, self.precision
        t_limit = T - int(T * self.init_image_strength)
        df = prec == "df64"

        from pnpinversion_tpu.control.base import NO_CONTROL

        def roundtrip(unet_p, pair0, ctx_in, ctx_out, g, lim,
                      control=NO_CONTROL, tensors=None, edit_ctx=None):
            inv = coupled_scan(unet_p, sched, ucfg, pair0, ctx_in, g, T, lim,
                               True, mw, precision=prec, return_lo=df)
            inv_hi, inv_lo = inv if df else (inv, None)
            out = coupled_scan(unet_p, sched, ucfg, inv_hi, ctx_out, g, T, lim,
                               False, mw, control=control, tensors=tensors,
                               edit_context=edit_ctx, precision=prec,
                               pair_lo=inv_lo, return_lo=df)
            return (out[0] + out[1]) if df else out

        def one_image(params, image_u8, cond_src, cond_tar, uncond, g3, g7,
                      tensors):
            latent = image_to_latent(params["vae"], image_u8, vcfg,
                                     dtype=jnp.float32)
            pair0 = jnp.stack([latent, latent], axis=0)
            ctx_src = jnp.concatenate([uncond, cond_src], axis=0)
            ctx_tar = jnp.concatenate([uncond, cond_tar], axis=0)
            rec = roundtrip(params["unet"], pair0, ctx_src, ctx_src, g7, 0)
            if use_p2p:
                from pnpinversion_tpu.control.edict_p2p import EdictP2PControl

                out = roundtrip(params["unet"], pair0, ctx_src, ctx_src, g3,
                                t_limit, control=EdictP2PControl(num_steps=T),
                                tensors=tensors, edit_ctx=cond_tar)
            else:
                out = roundtrip(params["unet"], pair0, ctx_src, ctx_tar, g3,
                                t_limit)
            recon = latent_to_image(params["vae"], rec[0], vcfg)[0]
            edit = latent_to_image(params["vae"], out[0], vcfg)[0]
            return recon, edit

        batched = jax.vmap(one_image,
                           in_axes=(None, 0, 0, 0, None, None, None, 0))
        repl = NamedSharding(self.mesh, P())
        shard = NamedSharding(self.mesh, P("dp"))
        fn = jax.jit(batched,
                     in_shardings=(param_shardings(self.mesh, self._params_f32),
                                   shard, shard, shard, repl, repl,
                                   repl, shard),
                     out_shardings=(shard, shard))
        self._cache[use_p2p] = fn
        return fn

    def edit_batch(self, method: str, images_u8: Array, cond_src: Array,
                   cond_tar: Array, tensors=None, guidance_scale: float = 3.0,
                   recon_guidance_scale: float = 7.0) -> Tuple[Array, Array]:
        """images_u8 (N,H,W,3); cond_src/cond_tar (N,1,77,D); tensors: p2p
        tensors pytree with leading N (edict+p2p only)."""
        use_p2p = method == "edict+p2p"
        uncond = _cached_embed(self, [""], dtype=jnp.float32)
        if tensors is None:
            n = images_u8.shape[0]
            tensors = jnp.zeros((n, 0), jnp.float32)
        with self.mesh:
            return self._fn(use_p2p)(
                self._params_f32, images_u8, cond_src.astype(jnp.float32),
                cond_tar.astype(jnp.float32), uncond,
                jnp.asarray(guidance_scale, jnp.float32),
                jnp.asarray(recon_guidance_scale, jnp.float32), tensors)


class BatchedEditFriendly:
    """edit-friendly-inversion+p2p over a dp-sharded image batch.

    Per-image pipeline = editors/ef_editor.py's phases (noise-map extraction
    with the source prompt at eta=1, then the controlled batch-2 reverse pass
    from xts[T-skip] with the stored zs); vmap adds the image axis. Items
    whose controller spec differs (Replace when word counts match, else
    Refine — run_editing_edit_friendly_p2p.py:92-96) compile separately;
    group with group_items_by_spec first.
    """

    def __init__(self, pipe: SDPipeline, mesh: Optional[Mesh] = None,
                 eta: float = 1.0, skip: int = 12, steps_offset: int = 1,
                 seed: int = 1234):
        from pnpinversion_tpu.schedulers.ddim import make_ddim_schedule

        self.pipe = pipe
        self.mesh = mesh if mesh is not None else make_dp_mesh()
        self.schedule = make_ddim_schedule(
            num_steps=pipe.schedule.num_steps, steps_offset=steps_offset)
        self.eta = eta
        self.skip = min(skip, self.schedule.num_steps - 1)
        self.seed = seed
        self._cache: Dict[Any, Any] = {}

    def _fn(self, spec):
        if spec in self._cache:
            return self._cache[spec]
        from pnpinversion_tpu.control.p2p import P2PControl
        from pnpinversion_tpu.inversion.ef_ddpm import (
            ef_forward_process,
            ef_reverse_process,
        )

        pipe = self.pipe
        sched, ucfg, vcfg = self.schedule, pipe.config.unet, pipe.config.vae
        T, Z, eta = sched.num_steps, sched.num_steps - self.skip, self.eta
        control = P2PControl(spec)

        def one_image(params, image_u8, cond, uncond, scales, tensors, rng):
            """cond (2,77,D) = [source, target]; scales (2,) per-row cfg."""
            x0 = image_to_latent(params["vae"], image_u8, vcfg, dtype=pipe.dtype)
            zs, xts = ef_forward_process(
                params["unet"], sched, x0, cond[:1], uncond[:1], scales[0],
                ucfg, rng, eta=eta)
            w = ef_reverse_process(
                params["unet"], sched, xts[T - self.skip], zs[:Z], cond,
                uncond, scales, ucfg, eta=eta, control=control,
                tensors=tensors, num_zs=Z)
            imgs = latent_to_image(params["vae"], w, vcfg)
            return imgs[0], imgs[1]

        batched = jax.vmap(one_image, in_axes=(None, 0, 0, None, None, 0, None))
        repl = NamedSharding(self.mesh, P())
        shard = NamedSharding(self.mesh, P("dp"))
        fn = jax.jit(batched,
                     in_shardings=(param_shardings(self.mesh, self.pipe.params),
                                   shard, shard, repl, repl, shard, repl),
                     out_shardings=(shard, shard))
        self._cache[spec] = fn
        return fn

    def edit_batch(self, spec, images_u8: Array, cond: Array,
                   source_guidance_scale: float = 1.0,
                   target_guidance_scale: float = 7.5, tensors=None
                   ) -> Tuple[Array, Array]:
        """images_u8 (N,H,W,3); cond (N,2,77,D); tensors pytree with leading N.
        Returns (source_row_imgs, edit_imgs) uint8 — the reference's strip
        uses the edit pass's source row as the reconstruction panel."""
        uncond = _cached_embed(self, ["", ""])
        scales = jnp.asarray([source_guidance_scale, target_guidance_scale],
                             self.pipe.dtype)
        with self.mesh:
            return self._fn(spec)(
                self.pipe.params, images_u8, cond, uncond, scales, tensors,
                jax.random.PRNGKey(self.seed))


class BatchedPnP:
    """Plug-and-Play (ddim+ / directinversion+) over a dp-sharded image batch
    (per-image pipeline = editors/pnp_editor.py phases, vmapped)."""

    def __init__(self, pipe: SDPipeline, mesh: Optional[Mesh] = None,
                 steps_offset: int = 1):
        from pnpinversion_tpu.schedulers.ddim import make_ddim_schedule

        self.pipe = pipe
        self.mesh = mesh if mesh is not None else make_dp_mesh()
        self.schedule = make_ddim_schedule(
            num_steps=pipe.schedule.num_steps, steps_offset=steps_offset)
        self._cache: Dict[Any, Any] = {}

    def _fn(self, method: str):
        if method in self._cache:
            return self._cache[method]
        from pnpinversion_tpu.control.pnp import PnPControl, make_pnp_control
        from pnpinversion_tpu.editors.pnp_editor import (
            NEGATIVE_PROMPT,
            ddim_sample_trajectory,
            pnp_sample_loop,
        )

        pipe = self.pipe
        sched, ucfg, vcfg = self.schedule, pipe.config.unet, pipe.config.vae
        control = PnPControl(make_pnp_control(ucfg, sched.num_steps).spec)

        def one_image(params, image_u8, cond_src, cond_tar, fixed, g):
            """cond_src/cond_tar: (1, 77, D)."""
            latent = image_to_latent(params["vae"], image_u8, vcfg,
                                     dtype=pipe.dtype)
            traj = ddim_invert_loop(params["unet"], sched, latent, cond_src, ucfg)
            embeds = jnp.concatenate([fixed, cond_tar], axis=0)
            if method == "ddim+pnp":
                src_traj = ddim_sample_trajectory(params["unet"], sched, ucfg,
                                                  traj[-1], cond_src)
                recon_lat = src_traj[-1]
                edited = pnp_sample_loop(params["unet"], sched, ucfg, control,
                                         src_traj, src_traj[0], embeds, g)
            else:  # directinversion+pnp
                src_latents = traj[::-1][:-1]
                recon_lat = traj[1]
                edited = pnp_sample_loop(params["unet"], sched, ucfg, control,
                                         src_latents, traj[-1], embeds, g)
            recon = latent_to_image(params["vae"], recon_lat, vcfg)[0]
            edit = latent_to_image(params["vae"], edited, vcfg)[0]
            return recon, edit

        batched = jax.vmap(one_image, in_axes=(None, 0, 0, 0, None, None))
        repl = NamedSharding(self.mesh, P())
        shard = NamedSharding(self.mesh, P("dp"))
        fn = jax.jit(batched,
                     in_shardings=(param_shardings(self.mesh, self.pipe.params),
                                   shard, shard, shard, repl, repl),
                     out_shardings=(shard, shard))
        self._cache[method] = fn
        return fn

    def edit_batch(self, method: str, images_u8: Array, cond_src: Array,
                   cond_tar: Array, guidance_scale: float) -> Tuple[Array, Array]:
        """images_u8 (N,H,W,3); cond_src/cond_tar (N,1,77,D)."""
        from pnpinversion_tpu.editors.pnp_editor import NEGATIVE_PROMPT

        with self.mesh:
            return self._fn(method)(
                self.pipe.params, images_u8, cond_src, cond_tar,
                _cached_embed(self, ["", NEGATIVE_PROMPT]),
                jnp.asarray(guidance_scale, self.pipe.dtype))


class BatchedStyleDiffusion:
    """stylediffusion+p2p over a dp-sharded image batch.

    The per-image pipeline is exactly editors/stylediffusion_editor.py's
    phases (CLIP image tokens, inversion with supervision maps, per-step
    mapper training, v_replace recon pass, tau-controlled edit pass); vmap
    adds the image axis, so the per-image mapper *training* also runs
    data-parallel across the mesh. The reference runs the whole method
    strictly per image (run_editing_stylediffusion.py:229-270) — this was
    the last PIE-Bench family without a batched multi-chip path.
    """

    def __init__(self, pipe: SDPipeline, clip_vision_params=None,
                 clip_vision_cfg=None, mesh: Optional[Mesh] = None,
                 num_inner_steps: int = 100, tau_v: float = 0.5,
                 tau_c: float = 0.6, tau_s: float = 0.6, tau_u: float = 0.0,
                 rng: Optional[Array] = None):
        from pnpinversion_tpu.editors.stylediffusion_editor import CLIP_VIT_B16
        from pnpinversion_tpu.models import vit

        self.pipe = pipe
        self.mesh = mesh if mesh is not None else make_dp_mesh()
        self.clip_cfg = clip_vision_cfg if clip_vision_cfg is not None else CLIP_VIT_B16
        rng = rng if rng is not None else jax.random.PRNGKey(42)
        self.clip_params = (clip_vision_params if clip_vision_params is not None
                            else vit.init_vit_params(rng, self.clip_cfg))
        self.num_inner_steps = num_inner_steps
        self.taus = (tau_v, tau_c, tau_s, tau_u)
        self._cache: Dict[Any, Any] = {}

    def _fn(self, p2p_spec):
        if p2p_spec in self._cache:
            return self._cache[p2p_spec]
        from pnpinversion_tpu.control.stylediffusion import (
            StyleDiffusionControl,
            StyleDiffusionSpec,
        )
        from pnpinversion_tpu.evaluation.metrics import (
            center_crop_resize_224,
            clip_normalize,
        )
        from pnpinversion_tpu.inversion.stylediffusion import (
            ddim_invert_with_maps,
            train_mappers,
        )
        from pnpinversion_tpu.models import vit
        from pnpinversion_tpu.models.stylediffusion import (
            init_mapper_params,
            mapper_at_step,
        )
        from pnpinversion_tpu.sampling.p2p_forward import guidance_forward

        pipe = self.pipe
        sched, ucfg, vcfg = pipe.schedule, pipe.config.unet, pipe.config.vae
        T = sched.num_steps
        clip_cfg = self.clip_cfg
        tau_v, _, _, tau_u = self.taus
        inner = self.num_inner_steps
        n_tokens = (clip_cfg.image_size // clip_cfg.patch_size) ** 2 + 1
        mapper0 = mapper_at_step(
            init_mapper_params(jax.random.PRNGKey(0), 1, tokens_in=n_tokens,
                               width=clip_cfg.width), 0)
        recon_spec = StyleDiffusionSpec(batch_size=2, num_steps=T,
                                        v_replace_end=T)
        edit_spec = StyleDiffusionSpec(
            batch_size=2, num_steps=T, v_replace_end=int(tau_v * T),
            uncond_self_start=0, uncond_self_end=int(tau_u * T))
        recon_ctrl = StyleDiffusionControl(recon_spec)
        edit_ctrl = StyleDiffusionControl(edit_spec, P2PControl(p2p_spec))

        def one_image(params, clip_params, image_u8, cond_src, cond2, uncond1,
                      uncond2, g, p2p_tensors):
            """cond_src (1,77,D); cond2 (2,77,D) = [src, tar]."""
            latent = image_to_latent(params["vae"], image_u8, vcfg,
                                     dtype=pipe.dtype)
            x = image_u8.astype(jnp.float32) / 255.0
            x = clip_normalize(center_crop_resize_224(x, clip_cfg.image_size))
            img_tokens, _ = vit.vit_apply(clip_params, x[None], clip_cfg,
                                          return_tokens=True)
            traj, gt_maps = ddim_invert_with_maps(
                params["unet"], sched, latent, cond_src, ucfg, pipe.num_lb_slots)
            mappers = train_mappers(
                params["unet"], sched, traj, gt_maps, img_tokens, uncond1,
                cond_src, g, mapper0, ucfg, num_inner_steps=inner)
            x_t = traj[-1]
            zeros = jnp.zeros((T, 2) + x_t.shape[1:], pipe.dtype)
            rm = jnp.zeros((2,), pipe.dtype)
            tensors_recon = {"img_tokens": img_tokens, "sd_mapper": mappers}
            recon_lat = guidance_forward(
                params["unet"], sched, ucfg, x_t, cond2, uncond2, g,
                recon_ctrl, tensors_recon, zeros, rm)
            tensors_edit = dict(p2p_tensors)
            tensors_edit.update(tensors_recon)
            edit_lat = guidance_forward(
                params["unet"], sched, ucfg, x_t, cond2, uncond2, g,
                edit_ctrl, tensors_edit, zeros, rm)
            recon_img = latent_to_image(params["vae"], recon_lat[:1], vcfg)[0]
            edit_img = latent_to_image(params["vae"], edit_lat[-1:], vcfg)[0]
            return recon_img, edit_img

        batched = jax.vmap(one_image,
                           in_axes=(None, None, 0, 0, 0, None, None, None, 0))
        repl = NamedSharding(self.mesh, P())
        shard = NamedSharding(self.mesh, P("dp"))
        fn = jax.jit(batched,
                     in_shardings=(param_shardings(self.mesh, self.pipe.params),
                                   param_shardings(self.mesh, self.clip_params),
                                   shard, shard, shard, repl,
                                   repl, repl, shard),
                     out_shardings=(shard, shard))
        self._cache[p2p_spec] = fn
        return fn

    def edit_batch(self, p2p_spec, images_u8: Array, cond_src: Array,
                   cond2: Array, tensors, guidance_scale: float = 7.5
                   ) -> Tuple[Array, Array]:
        """images_u8 (N,H,W,3); cond_src (N,1,77,D); cond2 (N,2,77,D);
        tensors: p2p tensors pytree with leading N."""
        uncond1 = _cached_embed(self, [""])
        uncond2 = _cached_embed(self, ["", ""])
        with self.mesh:
            return self._fn(p2p_spec)(
                self.pipe.params, self.clip_params, images_u8, cond_src,
                cond2, uncond1, uncond2,
                jnp.asarray(guidance_scale, self.pipe.dtype), tensors)
