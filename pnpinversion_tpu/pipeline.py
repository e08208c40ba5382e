"""StableDiffusion pipeline bundle: params + config + tokenizer + schedule.

The reference keeps 6 conflicting diffusers environments (SURVEY.md §0); here
one functional pipeline object serves every editor family. It owns no device
loops — the editors call the jitted scans in ``inversion/`` and ``sampling/``
with ``pipeline.params`` as an explicit argument.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pnpinversion_tpu.configs import SD14, StableDiffusionConfig
from pnpinversion_tpu.models.clip_text import clip_text_apply, init_clip_text_params
from pnpinversion_tpu.models.unet import init_unet_params, lb_resolution, num_lb_slots
from pnpinversion_tpu.models.vae import init_vae_params
from pnpinversion_tpu.schedulers.ddim import DDIMSchedule, make_ddim_schedule
from pnpinversion_tpu.utils.tokenizer import default_tokenizer

Array = jax.Array


def fast_random_like(key, init_fn):
    """Random params with ``init_fn``'s tree/shape/dtype structure drawn
    from ONE flat uniform.

    The per-leaf init functions issue one RNG chain per leaf (~3000 for
    SD1.4), and the resulting HLO takes ~90s to compile on the remote TPU
    service; a single flat uniform plus static slices compiles ~10x faster
    (measured 2.9s vs 31s at 600 leaves). Leaf distributions are
    shape/name-derived: norm ``scale``->ones, ``bias``->zeros, kernels
    (ndim>=2) -> uniform(+-1/sqrt(fan_in)), everything else a small
    uniform. The draw differs from ``init_fn``'s stream — fine for random
    scaffolding weights (real runs load checkpoints); CPU tests keep the
    exact per-leaf init for stability.
    """
    from pnpinversion_tpu.models.layers import _fan_in

    shapes = jax.eval_shape(init_fn, key)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    total = sum(int(np.prod(l.shape)) for _, l in leaves) or 1
    flat = jax.random.uniform(key, (total,), jnp.float32, -1.0, 1.0)
    out, off = [], 0
    for path, l in leaves:
        n = int(np.prod(l.shape))
        k = path[-1]
        name = str(getattr(k, "key", getattr(k, "name", k)))
        if name == "scale":
            v = jnp.ones(l.shape, jnp.float32)
        elif name == "bias":
            v = jnp.zeros(l.shape, jnp.float32)
        else:
            seg = flat[off : off + n].reshape(l.shape)
            off += n
            scale = (1.0 / np.sqrt(_fan_in(l.shape))) if l.ndim >= 2 else 0.02
            v = seg * scale
        out.append(v.astype(l.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


@dataclasses.dataclass
class SDPipeline:
    config: StableDiffusionConfig
    params: Dict[str, Any]  # {'unet', 'vae', 'text'}
    tokenizer: Any
    schedule: DDIMSchedule
    dtype: Any = jnp.float32

    # ---------------------------------------------------------------- factory
    @classmethod
    def create(
        cls,
        config: StableDiffusionConfig = SD14,
        rng: Optional[Array] = None,
        num_ddim_steps: int = 50,
        tokenizer=None,
        checkpoint_dir: Optional[str] = None,
        dtype=jnp.float32,
        quantize: Optional[str] = None,
    ) -> "SDPipeline":
        """Random-weight pipeline, or load a converted checkpoint when given.

        quantize="w8" (or env PNPI_QUANT=w8) rewrites the UNet's weights
        into the opt-in weight-only int8 layout (ops/quant.py): halved
        weight HBM traffic (-4.5% device time on the 512px fused scan,
        more at batch 1), <1% per-weight rounding error that must still be
        validated on real weights. The VAE / text encoder stay float.
        Dynamic w8a8 int8-MXU quantization was measured SLOWER end to end
        and removed (ops/quant.py module docstring has the numbers).
        """
        # the init jit below is the first compile of a runner process; make
        # sure the CPU persistent cache is configured before it (runners used
        # to rely on standard_argparser doing this, which broke multi-host)
        from pnpinversion_tpu.cli import setup_compile_cache

        setup_compile_cache()

        def _cast(p):
            if dtype == jnp.float32:
                return p
            return jax.tree.map(
                lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
                p,
            )

        if checkpoint_dir is not None:
            from pnpinversion_tpu.convert.checkpoint import load_pipeline_params

            params, tokenizer = load_pipeline_params(checkpoint_dir, config, tokenizer)
            params = _cast(params)
        else:
            rng = rng if rng is not None else jax.random.PRNGKey(0)

            # ONE jitted dispatch for the whole random init: the naive path
            # issues hundreds of small per-leaf RNG ops, which on a
            # high-latency TPU tunnel costs minutes of round trips (and the
            # single fused executable lands in the persistent compile cache)
            def _init(key):
                k1, k2, k3 = jax.random.split(key, 3)
                return _cast({
                    "unet": init_unet_params(k1, config.unet),
                    "vae": init_vae_params(k2, config.vae),
                    "text": init_clip_text_params(k3, config.text),
                })

            if jax.default_backend() == "cpu":
                params = jax.jit(_init)(rng)
            else:
                # remote-compile the tiny flat-uniform program (~10s)
                # instead of the ~3000-RNG-chain per-leaf one (~90s)
                params = jax.jit(
                    lambda k: fast_random_like(k, _init))(rng)
        import os

        quant = quantize or os.environ.get("PNPI_QUANT", "").lower() or None
        if quant not in (None, "none", ""):
            if quant != "w8":
                raise ValueError(f"unknown quantize mode {quant!r} "
                                 "(only 'w8'; dynamic 'int8' w8a8 measured "
                                 "slower end to end and was removed)")
            from pnpinversion_tpu.ops.quant import quantize_unet_dots

            # one jitted dispatch for the whole rewrite (hundreds of
            # per-layer quantize ops otherwise each pay a tunnel round trip)
            params = dict(params)
            params["unet"] = jax.jit(quantize_unet_dots)(params["unet"])
        tokenizer = tokenizer or default_tokenizer()
        schedule = make_ddim_schedule(num_steps=num_ddim_steps)
        return cls(config=config, params=params, tokenizer=tokenizer,
                   schedule=schedule, dtype=dtype)

    # ------------------------------------------------------------------ text
    def tokenize(self, prompts: Sequence[str]) -> Array:
        ids = self.tokenizer(
            list(prompts), padding="max_length",
            max_length=self.config.text.max_length, truncation=True,
        )["input_ids"]
        return jnp.asarray(np.asarray(ids, dtype=np.int32))

    def encode_prompt(self, prompts: Sequence[str]) -> Array:
        """(B, 77, width) final hidden states, like text_encoder(...)[0]."""
        ids = self.tokenize(prompts)
        return self._encode_ids(ids)

    @functools.cached_property
    def _encode_ids(self):
        cfg = self.config.text
        # params must be an ARGUMENT, not a closure capture: captured params
        # become jit constants, which bloats the compile (the executable
        # embeds all 123M text weights) and defeats the persistent compile
        # cache (every fresh random init is a different constant -> miss)
        f = jax.jit(lambda p, ids: clip_text_apply(p, ids, cfg, dtype=self.dtype))
        return lambda ids: f(self.params["text"], ids)

    # -------------------------------------------------------------- misc meta
    @property
    def num_lb_slots(self) -> int:
        return num_lb_slots(self.config.unet)

    @property
    def lb_res(self) -> int:
        return lb_resolution(self.config.unet)

    @property
    def latent_size(self) -> int:
        return self.config.unet.sample_size
