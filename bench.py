#!/usr/bin/env python
"""Benchmark: full directinversion+p2p edit (50 DDIM steps, 512x512, SD1.4
architecture) on one chip. Prints ONE JSON line.

Metric: effective seconds of device wall-clock per edited image — the best
of (a) the single-image editor latency and (b) the dp-batched sweep path
(parallel/sweep.BatchedDirectInversionP2P) at 4 images per chip (the best
point of the 1/2/4/8 probe, scripts/bench_batched.py), which is how the
700-image PIE-Bench sweep actually runs. Extra keys disclose both numbers
and a per-phase breakdown of the single-image path. All timed dispatches
use fresh inputs (the tunnel elides repeated identical dispatches).

What is measured per image (vs the reference's four 50-step loops,
models/p2p/inversion.py:308-391 + p2p_guidance_forward.py:135-173):
  1. DDIM inversion          — 50 x UNet(b=1)   (same as reference)
  2. offsets + edit          — 50 x UNet(b=3) ONE fused scan: with full
     offsets the replay re-snaps to the trajectory and the controller never
     touches the source row, so the edit pass's source row IS the offset
     replay and the reconstruction equals decode(traj[0]) exactly (the
     paper's exact-reconstruction property); the uncond-source row's eps
     cancels out of that re-snap, so it is dropped from the batch entirely.
     The reference pays ~650 UNet-row forwards for the same math; this
     path pays ~200.
plus VAE encode/decode and CLIP prompt encoding.

vs_baseline compares against REF_A100_SECONDS, a derived estimate of the
reference PyTorch pipeline on A100 (no machine-readable number is published;
see BASELINE.md): 650 UNet sample-forwards/image at fp32 ~23ms each ≈ 15s,
plus VAE/text/Python-controller overhead ≈ 18s/image.

Extra keys also report the opt-in weight-only int8 mode (PNPI_QUANT=w8,
ops/quant.py) on the batched path — faster, but excluded from the headline
because it deviates from the reference's fp numerics (disable with
PNPI_BENCH_W8=0).
"""
import json
import os
import time

os.environ.setdefault("XLA_FLAGS", "")

import jax
import jax.numpy as jnp
import numpy as np

REF_A100_SECONDS = 18.0
STEPS = 50

# Plausibility band for the secondary w8 number, as a fraction of the bf16
# headline. w8 only changes matmul weight traffic (~2x less HBM on ~60% of
# device time) so anything below 0.25x the bf16 time is physically
# impossible for the same ~200 UNet row-forwards; r4 shipped 0.0137 s
# (165x "speedup") because the tunnel acked the dispatch without the
# output ever being fetched (docs/PERFORMANCE.md timing pitfalls).
W8_BAND = (0.25, 1.5)


def w8_keys(s_w8: float, s_headline: float, nb: int) -> dict:
    """Return the JSON keys for the secondary w8 measurement.

    Refuses to report a w8 number outside W8_BAND x the headline: emits a
    loud ``w8_invalid`` key with both raw values instead, so a measurement
    artifact can never pollute the official record again (VERDICT r4 #1).
    """
    lo, hi = W8_BAND
    if not (lo * s_headline <= s_w8 <= hi * s_headline):
        return {"w8_invalid": (f"measured {s_w8:.4f}s/image outside "
                               f"[{lo}x,{hi}x] of headline "
                               f"{s_headline:.4f}s — not reported")}
    return {f"w8_batch{nb}_s_per_image": round(s_w8, 4),
            "w8_vs_baseline": round(REF_A100_SECONDS / s_w8, 3)}


def fetch(out) -> None:
    """Force every output buffer to actually exist, round-tripping real
    bytes to the HOST (the tunneled backend can ack a dispatch without
    completing it — block_until_ready alone read 1000x too fast in r4).

    A full np.asarray of the outputs would also work, but it bills the dev
    tunnel's ~20 MB/s host link (~340 ms for a batch-4 image set) as device
    time; production hosts are co-located (PCIe/DMA, negligible). Instead,
    reduce each leaf ON DEVICE — the sum cannot run before its producer
    completes and touches every byte — and ship only the scalar."""
    for leaf in jax.tree.leaves(out):
        np.asarray(jnp.sum(jnp.asarray(leaf, jnp.float32)))


def main():
    # persistent compile cache on CPU only: on the tunneled TPU backend a
    # cache hit re-uploads the serialized executable (>100MB) through the
    # tunnel, which measures slower than the server-side remote compile
    if jax.default_backend() == "cpu":
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pnpinversion_tpu.configs import SD14
    from pnpinversion_tpu.control.p2p import make_p2p_control
    from pnpinversion_tpu.editors.p2p_editor import P2PEditor
    from pnpinversion_tpu.parallel.sweep import (
        BatchedDirectInversionP2P,
        make_dp_mesh,
    )
    from pnpinversion_tpu.pipeline import SDPipeline

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    # quantize="none" pins the headline to reference-fp numerics even if
    # the caller exported PNPI_QUANT=w8 (the w8 number is measured below)
    pipe = SDPipeline.create(SD14, rng=jax.random.PRNGKey(0),
                             num_ddim_steps=STEPS, dtype=dtype,
                             quantize="none")
    editor = P2PEditor(pipe)

    rng = np.random.RandomState(1234)
    img = (rng.rand(512, 512, 3) * 255).astype(np.uint8)
    src = "a round cake with orange frosting on a wooden plate"
    tar = "a square cake with orange frosting on a wooden plate"
    kwargs = dict(
        guidance_scale=7.5,
        blend_word=(("cake",), ("cake",)),
        eq_params={"words": ("square",), "values": (2.0,)},
    )

    # ---- single-image editor latency
    editor("directinversion+p2p", img, src, tar, **kwargs)  # compile
    n_iters = 3 if on_tpu else 1
    t0 = time.perf_counter()
    for _ in range(n_iters):
        # fresh pixels per call (tunnel elision pitfall, docs/PERFORMANCE.md)
        img_i = (rng.rand(512, 512, 3) * 255).astype(np.uint8)
        editor("directinversion+p2p", img_i, src, tar, **kwargs)
    s_single = (time.perf_counter() - t0) / n_iters

    # per-phase breakdown of the single-image path (device timings)
    latent = editor._encode_image(pipe.params["vae"], jnp.asarray(img))
    cond, uncond = editor._embeds([src, tar])
    t0 = time.perf_counter()
    traj = jax.block_until_ready(
        editor._invert(pipe.params["unet"], latent, cond[:1]))
    t_invert = time.perf_counter() - t0
    spec, tensors = editor._make_control([src, tar], 0.4, 0.6,
                                         kwargs["blend_word"],
                                         kwargs["eq_params"], False)
    g = jnp.asarray(7.5, pipe.dtype)
    t0 = time.perf_counter()
    edit_latents = jax.block_until_ready(editor._fused_direct(spec)(
        pipe.params["unet"], traj, cond, uncond, g, tensors))
    t_fused = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(editor._decode_image(
        pipe.params["vae"],
        jnp.concatenate([traj[0], edit_latents[-1:]], axis=0)))
    t_vae = time.perf_counter() - t0

    # ---- dp-batched sweep path at 2 images per chip (the production sweep)
    sweep = BatchedDirectInversionP2P(pipe, make_dp_mesh(1))
    ctrl, tensors1 = make_p2p_control(
        [src, tar], pipe.tokenizer, num_steps=STEPS,
        cross_replace_steps=0.4, self_replace_steps=0.6,
        is_replace_controller=False, blend_words=kwargs["blend_word"],
        eq_params={"words": ("square",), "values": (2,)},
        num_lb_slots=pipe.num_lb_slots, lb_res=pipe.lb_res,
        latent_size=pipe.latent_size)
    nb = int(os.environ.get("PNPI_BENCH_BATCH", "4"))
    cond_b = jnp.asarray(np.stack([np.asarray(pipe.encode_prompt([src, tar]))] * nb))
    tens_b = jax.tree.map(lambda x: jnp.stack([x] * nb), tensors1)
    uncond2 = pipe.encode_prompt(["", ""])

    def fresh_imgs():
        # fresh pixels every dispatch: the tunnel elides repeated identical
        # dispatches (docs/PERFORMANCE.md timing pitfalls)
        return jnp.asarray((rng.rand(nb, 512, 512, 3) * 255).astype(np.uint8))

    jax.block_until_ready(sweep.edit_batch(
        ctrl.spec, fresh_imgs(), cond_b, uncond2, 7.5, tens_b))  # compile
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = sweep.edit_batch(ctrl.spec, fresh_imgs(), cond_b, uncond2, 7.5, tens_b)
        fetch(out)
    s_batched = (time.perf_counter() - t0) / n_iters / nb

    # ---- secondary: opt-in weight-only int8 (PNPI_QUANT=w8) on the same
    # batched path. NOT the headline (it deviates from the reference's fp
    # numerics by <1% per-weight rounding; validate on real weights), but the
    # production sweep can opt in for the extra speed.
    extra = {}
    s_w8 = None
    if on_tpu and os.environ.get("PNPI_BENCH_W8", "1") != "0":
        pipe_w8 = SDPipeline.create(SD14, rng=jax.random.PRNGKey(0),
                                    num_ddim_steps=STEPS, dtype=dtype,
                                    quantize="w8")
        sweep_w8 = BatchedDirectInversionP2P(pipe_w8, make_dp_mesh(1))
        fetch(sweep_w8.edit_batch(
            ctrl.spec, fresh_imgs(), cond_b, uncond2, 7.5, tens_b))  # compile
        t0 = time.perf_counter()
        for _ in range(n_iters):
            fetch(sweep_w8.edit_batch(
                ctrl.spec, fresh_imgs(), cond_b, uncond2, 7.5, tens_b))
        s_w8 = (time.perf_counter() - t0) / n_iters / nb

    best = min(s_single, s_batched)
    if s_w8 is not None:
        extra = w8_keys(s_w8, best, nb)
    print(json.dumps({
        "metric": "directinversion+p2p_seconds_per_image",
        "value": round(best, 4),
        "unit": f"s/image effective (50 steps, 512px, {backend}, "
                f"{'bf16' if dtype == jnp.bfloat16 else 'f32'}, "
                f"best of single-image / batch-{nb} sweep per chip)",
        "vs_baseline": round(REF_A100_SECONDS / best, 3),
        "single_image_s": round(s_single, 4),
        f"batch{nb}_s_per_image": round(s_batched, 4),
        "phases_single_s": {"invert_50xb1": round(t_invert, 4),
                            "fused_offsets_edit_50xb3": round(t_fused, 4),
                            "vae_decode_x2": round(t_vae, 4)},
        **extra,
    }))


if __name__ == "__main__":
    main()
