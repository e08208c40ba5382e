#!/usr/bin/env python
"""Multi-chip sharded PIE-Bench sweep (directinversion+p2p, MasaCtrl, PnP).

Replaces the reference's manual multi-process category split
(SURVEY.md §2.14) with dp-sharded image-batched pipelines: items are grouped
by compiled program (controller spec / method variant), padded to the device
count, and edited N-per-step across the mesh. Outputs keep the reference's
4-panel-strip / skip-existing contract, so the sweep is restartable and
evaluable by evaluation/evaluate.py unchanged.

Multi-host: --num_processes/--process_id/--coordinator_address join a
jax.distributed cluster; items are process-sharded and each process sweeps
its local chips.
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os

import jax
import jax.numpy as jnp
import numpy as np

from pnpinversion_tpu.cli import standard_argparser
from pnpinversion_tpu.configs import SD14
from pnpinversion_tpu.control.p2p import make_p2p_control
from pnpinversion_tpu.data.pie_bench import PieBenchDataset, load_image
from pnpinversion_tpu.parallel.sweep import (
    BatchedBLD,
    BatchedDirectInversionP2P,
    BatchedEDICT,
    BatchedEditFriendly,
    BatchedInstruct,
    BatchedMasaCtrl,
    BatchedPix2PixZero,
    BatchedPnP,
    group_items_by_spec,
    make_dp_mesh,
    pad_batch,
)
from pnpinversion_tpu.pipeline import SDPipeline
from pnpinversion_tpu.utils.image import make_strip, txt_draw
from pnpinversion_tpu.utils.observability import RunLogger

METHODS = ["directinversion+p2p", "ddim+p2p", "negative-prompt-inversion+p2p",
           "null-text-inversion+p2p",
           "negative-prompt-inversion+proximal-guidance",
           "null-text-inversion+proximal-guidance",
           "directinversion+masactrl", "ddim+masactrl",
           "directinversion+pnp", "ddim+pnp", "edit-friendly-inversion+p2p",
           "blended-latent-diffusion", "edict+direct_forward", "edict+p2p",
           "instruct-pix2pix", "instruct-diffusion",
           "ddim+pix2pix-zero", "directinversion+pix2pix-zero",
           "stylediffusion+p2p"] + [
           f"directinversion+p2p_guidance_{a}_{b}"  # group-3 guidance grid
           for a in ("0", "1", "25", "5", "75") for b in ("1", "5", "25", "75")
           ] + [  # group 5-8 ablations
           "ablation_directinversion_04+p2p", "ablation_directinversion_08+p2p",
           "ablation_directinversion_add-source+p2p",
           "ablation_directinversion_add-target+p2p",
           "ablation_null-latent-inversion+p2p",
           "ablation_null-text-inversion_single_branch+p2p"] + [
           f"ablation_directinversion_interval_{k}+p2p" for k in (2, 5, 10, 24, 49)] + [
           # group-7 step-count ablations (evaluate.py:167-170): plain
           # directinversion+p2p with num_ddim_steps baked from the name
           f"ablation_directinversion_step_{k}+p2p" for k in (20, 100, 500)]

# reference output-folder names that differ from the method string
# (run_editing_stylediffusion.py preserves this typo)
FOLDERS = {"stylediffusion+p2p": "styleidffusion+p2p"}


def _encode_chunk(pipe, chunk, fields):
    """One batched text-encode dispatch per chunk (vs per item — each call
    pays a tunnel round trip): fields maps item -> list of prompt strings.
    Returns (N, rows, 77, D) numpy."""
    texts = [t for e in chunk for t in fields(e["item"])]
    rows = len(fields(chunk[0]["item"]))
    embs = np.asarray(pipe.encode_prompt(texts))
    return embs.reshape(len(chunk), rows, *embs.shape[1:])


def _pad_tensors(chunk, batch, n_real):
    """Stack per-item controller tensors, padding to the batch size."""
    tb = [e["tensors"] for e in chunk] + [chunk[-1]["tensors"]] * (batch - n_real)
    return jax.tree.map(lambda *xs: jnp.stack(xs), *tb)


class _PipelinedSaver:
    """Defer the host-side strip decode/save by one chunk so it overlaps the
    device compute of the next chunk: JAX dispatch is async — the block
    happens at np.asarray inside _save_strips, so saving chunk i only after
    chunk i+1 is dispatched keeps the device busy during PIL encode + disk
    I/O (~0.3-0.4 s/chunk at 512px). main() flushes after the sweep."""

    def __init__(self):
        self._prev = None

    def push(self, *a):
        prev, self._prev = self._prev, a
        if prev is not None:
            _save_strips(*prev)

    def flush(self):
        prev, self._prev = self._prev, None
        if prev is not None:
            _save_strips(*prev)


_SAVER = _PipelinedSaver()


def _save_strips(chunk, images, recon, edit, size, logger, method):
    recon, edit = np.asarray(recon), np.asarray(edit)
    for i, e in enumerate(chunk):
        item = e["item"]
        instruct = txt_draw(
            f"source prompt: {item.source_prompt}\n"
            f"target prompt: {item.target_prompt}", target_size=(size, size))
        strip = make_strip([instruct, images[i], recon[i], edit[i]])
        os.makedirs(os.path.dirname(e["save_path"]), exist_ok=True)
        strip.save(e["save_path"])
        logger.log("image_done", key=item.key, method=method)
        print(f"saved {e['save_path']}")


def _sweep_p2p(pipe, mesh, pending, batch, size, logger,
               method="directinversion+p2p"):
    sweep = BatchedDirectInversionP2P(pipe, mesh)
    for e in pending:
        blended = e["item"].blended_word
        ctrl, tensors = make_p2p_control(
            [e["item"].source_prompt, e["item"].target_prompt], pipe.tokenizer,
            num_steps=pipe.schedule.num_steps,
            cross_replace_steps=0.4, self_replace_steps=0.6,
            is_replace_controller=False,
            blend_words=(((blended[0],), (blended[1],)) if blended else None),
            eq_params=({"words": (blended[1],), "values": (2,)} if blended else None),
            num_lb_slots=pipe.num_lb_slots, lb_res=pipe.lb_res,
            latent_size=pipe.latent_size)
        e["spec"], e["tensors"] = ctrl.spec, tensors
    uncond = np.asarray(pipe.encode_prompt(["", ""]))
    for spec, group in group_items_by_spec(pending, lambda e: e["spec"]).items():
        for lo in range(0, len(group), batch):
            chunk = group[lo : lo + batch]
            images = [load_image(e["item"].image_path, size) for e in chunk]
            imgs, n_real = pad_batch(images, batch)
            conds = list(_encode_chunk(
                pipe, chunk, lambda it: [it.source_prompt, it.target_prompt]))
            cond, _ = pad_batch(conds, batch)
            if method.startswith("negative-prompt-inversion"):
                # fake uncond = source cond, both rows (npi_interp=0,
                # run_editing_p2p.py:335)
                uncond_b = np.stack([np.stack([c[0], c[0]]) for c in cond])
            else:
                uncond_b = np.stack([uncond] * len(cond))
            tensors_b = _pad_tensors(chunk, batch, n_real)
            g = 7.5
            if method.startswith("directinversion+p2p_guidance_"):
                from pnpinversion_tpu.editors.p2p_editor import GUIDANCE_GRID

                g = GUIDANCE_GRID[method.split("_")[-1]]
            recon, edit = sweep.edit_batch(
                spec, jnp.asarray(imgs), jnp.asarray(cond),
                jnp.asarray(uncond_b), g, tensors_b, method=method)
            _SAVER.push(chunk, images, recon, edit, size, logger, method)


def _sweep_masactrl(pipe, mesh, pending, batch, size, logger, method):
    sweep = BatchedMasaCtrl(pipe, mesh)
    use_offsets = method == "directinversion+masactrl"
    for lo in range(0, len(pending), batch):
        chunk = pending[lo : lo + batch]
        images = [load_image(e["item"].image_path, size) for e in chunk]
        imgs, _ = pad_batch(images, batch)
        conds = list(_encode_chunk(pipe, chunk,
                                   lambda it: ["", it.target_prompt]))
        cond, _ = pad_batch(conds, batch)
        recon, edit = sweep.edit_batch(use_offsets, jnp.asarray(imgs),
                                       jnp.asarray(cond), 7.5)
        _SAVER.push(chunk, images, recon, edit, size, logger, method)


def _sweep_pnp(pipe, mesh, pending, batch, size, logger, method):
    sweep = BatchedPnP(pipe, mesh)
    for lo in range(0, len(pending), batch):
        chunk = pending[lo : lo + batch]
        images = [load_image(e["item"].image_path, size) for e in chunk]
        imgs, _ = pad_batch(images, batch)
        both = _encode_chunk(pipe, chunk,
                             lambda it: [it.source_prompt, it.target_prompt])
        cond_src, _ = pad_batch(list(both[:, :1]), batch)
        cond_tar, _ = pad_batch(list(both[:, 1:]), batch)
        recon, edit = sweep.edit_batch(method, jnp.asarray(imgs),
                                       jnp.asarray(cond_src),
                                       jnp.asarray(cond_tar), 7.5)
        _SAVER.push(chunk, images, recon, edit, size, logger, method)


def _sweep_ef(pipe, mesh, pending, batch, size, logger):
    method = "edit-friendly-inversion+p2p"
    sweep = BatchedEditFriendly(pipe, mesh)
    T = sweep.schedule.num_steps
    for e in pending:
        src, tar = e["item"].source_prompt, e["item"].target_prompt
        ctrl, tensors = make_p2p_control(
            [src, tar], pipe.tokenizer, num_steps=T,
            cross_replace_steps=0.4, self_replace_steps=0.6,
            is_replace_controller=len(src.split(" ")) == len(tar.split(" ")),
            num_lb_slots=pipe.num_lb_slots, lb_res=pipe.lb_res,
            latent_size=pipe.latent_size, self_edit_max_seq=16 * 16)
        e["spec"], e["tensors"] = ctrl.spec, tensors
    for spec, group in group_items_by_spec(pending, lambda e: e["spec"]).items():
        for lo in range(0, len(group), batch):
            chunk = group[lo : lo + batch]
            images = [load_image(e["item"].image_path, size) for e in chunk]
            imgs, n_real = pad_batch(images, batch)
            conds = list(_encode_chunk(
                pipe, chunk, lambda it: [it.source_prompt, it.target_prompt]))
            cond, _ = pad_batch(conds, batch)
            tensors_b = _pad_tensors(chunk, batch, n_real)
            recon, edit = sweep.edit_batch(
                spec, jnp.asarray(imgs), jnp.asarray(cond), 1.0, 7.5, tensors_b)
            _SAVER.push(chunk, images, recon, edit, size, logger, method)


def _sweep_bld(pipe, mesh, pending, batch, size, logger):
    method = "blended-latent-diffusion"
    sweep = BatchedBLD(pipe, mesh)
    lat = pipe.latent_size
    from PIL import Image as PILImage

    for lo in range(0, len(pending), batch):
        chunk = pending[lo : lo + batch]
        # BLD resizes without the load_512 crop
        # (run_editing_blended_latent_diffusion.py:58-60)
        images = [np.array(PILImage.open(e["item"].image_path).resize(
            (size, size), PILImage.BILINEAR))[:, :, :3] for e in chunk]
        imgs, _ = pad_batch(images, batch)
        masks = []
        for e in chunk:
            m = np.asarray(e["item"].mask, np.float32)
            if m.ndim == 3:
                m = m[:, :, 0]
            m = PILImage.fromarray(m.astype(np.uint8)).resize(
                (lat, lat), PILImage.NEAREST)
            masks.append((np.array(m) >= 0.5).astype(np.float32)[..., None])
        masks_b, _ = pad_batch(masks, batch)
        conds = list(_encode_chunk(pipe, chunk,
                                   lambda it: [it.target_prompt]))
        cond, _ = pad_batch(conds, batch)
        edit = sweep.edit_batch(jnp.asarray(imgs), masks_b, jnp.asarray(cond))
        zeros = np.zeros((len(chunk), size, size, 3), np.uint8)
        _SAVER.push(chunk, images, zeros, edit, size, logger, method)


def _sweep_edict(pipe, mesh, pending, batch, size, logger, method):
    from pnpinversion_tpu.control.edict_p2p import make_edict_p2p_tensors

    sweep = BatchedEDICT(pipe, mesh, precision="df64")
    use_p2p = method == "edict+p2p"
    for lo in range(0, len(pending), batch):
        chunk = pending[lo : lo + batch]
        images = [load_image(e["item"].image_path, size) for e in chunk]
        imgs, n_real = pad_batch(images, batch)
        both = _encode_chunk(pipe, chunk,
                             lambda it: [it.source_prompt, it.target_prompt])
        cond_src, _ = pad_batch(list(both[:, :1]), batch)
        cond_tar, _ = pad_batch(list(both[:, 1:]), batch)
        tensors_b = None
        if use_p2p:
            tl = [make_edict_p2p_tensors(e["item"].source_prompt,
                                         e["item"].target_prompt,
                                         pipe.tokenizer,
                                         pipe.config.text.max_length)
                  for e in chunk]
            tl += [tl[-1]] * (batch - n_real)
            tensors_b = jax.tree.map(lambda *xs: jnp.stack(xs), *tl)
        recon, edit = sweep.edit_batch(method, jnp.asarray(imgs),
                                       jnp.asarray(cond_src),
                                       jnp.asarray(cond_tar), tensors_b)
        _SAVER.push(chunk, images, recon, edit, size, logger, method)


def _sweep_instruct(pipe, mesh, pending, batch, size, logger, method):
    from PIL import Image as PILImage

    sweep = BatchedInstruct(pipe, mesh)
    for lo in range(0, len(pending), batch):
        chunk = pending[lo : lo + batch]
        # instruct models resize with LANCZOS, no crop
        # (run_editing_instructpix2pix.py:115-118)
        images = [np.array(PILImage.open(e["item"].image_path).convert("RGB")
                           .resize((size, size), PILImage.Resampling.LANCZOS))
                  for e in chunk]
        imgs, _ = pad_batch(images, batch)
        conds = list(_encode_chunk(pipe, chunk,
                                   lambda it: [it.editing_instruction]))
        cond, _ = pad_batch(conds, batch)
        edit = sweep.edit_batch(method, jnp.asarray(imgs), jnp.asarray(cond))
        zeros = np.zeros((len(chunk), size, size, 3), np.uint8)
        _SAVER.push(chunk, images, zeros, edit, size, logger, method)


def _sweep_p2z(pipe, mesh, pending, batch, size, logger, method, args):
    from PIL import Image as PILImage

    captions = {}
    if getattr(args, "caption_file", None):
        import json

        with open(args.caption_file) as f:
            captions = json.load(f)
    captioner = None
    if args.checkpoint_dir is not None:
        try:
            from pnpinversion_tpu.models.blip import make_blip_captioner

            captioner = make_blip_captioner(args.checkpoint_dir)
        except (ImportError, FileNotFoundError):
            captioner = None

    sweep = BatchedPix2PixZero(pipe, mesh)
    for lo in range(0, len(pending), batch):
        chunk = pending[lo : lo + batch]
        # pix2pix-zero resizes with LANCZOS, no crop (edit_pipeline semantics)
        images = [np.array(PILImage.open(e["item"].image_path).convert("RGB")
                           .resize((size, size), PILImage.Resampling.LANCZOS))
                  for e in chunk]
        imgs, _ = pad_batch(images, batch)
        caps = [captions.get(e["item"].key) for e in chunk]
        missing = [i for i, c in enumerate(caps) if c is None]
        if missing:
            if captioner is None:
                raise ValueError(
                    "pix2pix-zero needs captions: pass --caption_file or "
                    "converted BLIP weights via --checkpoint_dir")
            if hasattr(captioner, "caption_batch"):
                # one device dispatch for the whole chunk's beam decodes
                new = captioner.caption_batch(
                    np.stack([images[i] for i in missing]))
            else:
                new = [captioner(images[i]) for i in missing]
            for i, c in zip(missing, new):
                caps[i] = c
        texts = [t for e, cap in zip(chunk, caps)
                 for t in (cap, e["item"].source_prompt, e["item"].target_prompt)]
        embs = np.asarray(pipe.encode_prompt(texts))
        embs = embs.reshape(len(chunk), 3, *embs.shape[1:])
        conds = list(embs[:, 0:1])
        dirs = list(embs[:, 2:3] - embs[:, 1:2])
        cond, _ = pad_batch(conds, batch)
        edit_dir, _ = pad_batch(dirs, batch)
        recon, edit = sweep.edit_batch(method, jnp.asarray(imgs),
                                       jnp.asarray(cond),
                                       jnp.asarray(edit_dir, pipe.dtype))
        _SAVER.push(chunk, images, recon, edit, size, logger, method)


# test hooks: tiny configs override these module globals
STYLEDIFFUSION_CLIP_CFG = None
STYLEDIFFUSION_INNER_STEPS = 100


def _sweep_stylediffusion(pipe, mesh, pending, batch, size, logger,
                          clip_vision_cfg=None, num_inner_steps=None):
    from pnpinversion_tpu.parallel.sweep import BatchedStyleDiffusion

    if clip_vision_cfg is None:
        clip_vision_cfg = STYLEDIFFUSION_CLIP_CFG
    if num_inner_steps is None:
        num_inner_steps = STYLEDIFFUSION_INNER_STEPS
    sweep = BatchedStyleDiffusion(pipe, mesh=mesh,
                                  clip_vision_cfg=clip_vision_cfg,
                                  num_inner_steps=num_inner_steps)
    # reference passes blend_word=None/eq_params=None
    # (run_editing_stylediffusion.py:249-258); taus v=.5 c=.6 s=.6 u=.0;
    # Replace-vs-Refine is the char-length rule at :181
    from pnpinversion_tpu.editors.stylediffusion_editor import (
        stylediffusion_is_replace,
    )

    for e in pending:
        src, tar = e["item"].source_prompt, e["item"].target_prompt
        ctrl, tensors = make_p2p_control(
            [src, tar], pipe.tokenizer,
            num_steps=pipe.schedule.num_steps,
            cross_replace_steps={"default_": 0.6}, self_replace_steps=0.6,
            is_replace_controller=stylediffusion_is_replace(src, tar),
            num_lb_slots=pipe.num_lb_slots,
            lb_res=pipe.lb_res, latent_size=pipe.latent_size)
        e["spec"], e["tensors"] = ctrl.spec, tensors
    for spec, group in group_items_by_spec(pending, lambda e: e["spec"]).items():
        for lo in range(0, len(group), batch):
            chunk = group[lo : lo + batch]
            images = [load_image(e["item"].image_path, size) for e in chunk]
            imgs, n_real = pad_batch(images, batch)
            both = _encode_chunk(
                pipe, chunk, lambda it: [it.source_prompt, it.target_prompt])
            csrc, _ = pad_batch(list(both[:, :1]), batch)
            c2, _ = pad_batch(list(both), batch)
            tensors_b = _pad_tensors(chunk, batch, n_real)
            recon, edit = sweep.edit_batch(
                spec, jnp.asarray(imgs), jnp.asarray(csrc), jnp.asarray(c2),
                tensors_b, 7.5)
            _SAVER.push(chunk, images, recon, edit, size, logger,
                         "stylediffusion+p2p")


def main(argv=None):
    parser = standard_argparser(["directinversion+p2p"])
    parser.add_argument("--caption_file", type=str, default=None,
                        help="pix2pix-zero: JSON {image key: caption} instead of BLIP")
    parser.add_argument("--method", choices=METHODS,
                        default="directinversion+p2p")
    parser.add_argument("--batch_per_device", type=int, default=0,
                        help="images per device per dispatch; 0 = auto "
                             "(4 on TPU for the light fused-scan family — "
                             "the probed optimum — 1 otherwise)")
    parser.add_argument("--n_devices", type=int, default=None)
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel factor: shard UNet matmul "
                             "output dims over a (dp, tp) mesh")
    parser.add_argument("--num_processes", type=int, default=None,
                        help="multi-host: total process count")
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--coordinator_address", type=str, default=None,
                        help="multi-host: host:port of process 0")
    args = parser.parse_args(argv)
    method = args.method

    from pnpinversion_tpu.parallel import multihost

    multihost.initialize(args.coordinator_address, args.num_processes,
                         args.process_id)
    # only after distributed init: setup_compile_cache may initialize the
    # backend (jax.default_backend fallback), which would make a later
    # jax.distributed.initialize raise
    from pnpinversion_tpu.cli import setup_compile_cache

    setup_compile_cache()

    # BLD runs SD2.1-base (run_editing_blended_latent_diffusion.py:43); the
    # instruct models an 8-in-channel ldm UNet; everything else SD1.4
    from pnpinversion_tpu.configs import IP2P, SD21

    if method == "blended-latent-diffusion":
        sd_config = SD21
    elif method.startswith("instruct"):
        sd_config = IP2P
    else:
        sd_config = SD14
    ablation_steps = BatchedDirectInversionP2P.step_ablation_steps(method)
    if ablation_steps is not None:
        args.num_ddim_steps = ablation_steps
    pipe = SDPipeline.create(sd_config, num_ddim_steps=args.num_ddim_steps,
                             checkpoint_dir=args.checkpoint_dir,
                             dtype=jnp.bfloat16 if jax.default_backend() != "cpu"
                             else jnp.float32,
                             quantize=getattr(args, "quant", None))
    if args.tp > 1:
        from pnpinversion_tpu.parallel.sweep import make_dp_tp_mesh

        mesh = make_dp_tp_mesh(args.n_devices, args.tp)
        n_dev = mesh.shape["dp"]  # image batch scales with the dp axis only
    else:
        mesh = make_dp_mesh(args.n_devices)
        n_dev = mesh.devices.size
    logger = RunLogger(args.run_log)
    dataset = PieBenchDataset(args.data_path,
                              mapping_file=getattr(args, "mapping_file", None))
    size = pipe.config.vae.sample_size

    # collect pending items; in multi-host mode each process takes a
    # deterministic disjoint slice (the file-based skip-existing contract
    # keeps overlap harmless on restarts)
    items = list(dataset.items(args.edit_category_list))
    if jax.process_count() > 1:
        items = multihost.process_shard(items)
    pending = []
    for item in items:
        rel = item.rel_output_path(
            os.path.join(args.data_path, "annotation_images"))
        save_path = os.path.join(args.output_path, FOLDERS.get(method, method),
                                 "annotation_images", rel)
        if os.path.exists(save_path) and not args.rerun_exist_images:
            logger.log("image_skip", key=item.key, method=method)
            continue
        # isolate unreadable inputs up front (header-only check): a corrupt
        # file would otherwise crash every restart of a long sweep at the
        # same chunk forever (the skip-existing contract can't get past it)
        try:
            from PIL import Image as _PILImage

            _PILImage.open(item.image_path).verify()
        except Exception as exc:  # noqa: BLE001 - log & drop the one item
            logger.log("image_error", key=item.key, method=method,
                       error=f"unreadable input: {exc!r}"[:300])
            print(f"skipping unreadable input [{item.image_path}]: {exc!r}")
            continue
        pending.append({"item": item, "save_path": save_path})

    # NOTE: no early return on empty `pending` — in multi-host mode every
    # process must still reach the final allreduce collective below, or
    # a process whose slice is already complete (common on restarts) would
    # exit and deadlock the rest of the cluster.
    if not pending:
        print("nothing to do")

    bpd = args.batch_per_device
    if bpd <= 0:
        # auto: the on-chip 1/2/4/8 probe (scripts/bench_batched.py) puts the
        # light fused-scan family at 4 images/device; heavier programs
        # (inner optimization loops, SD2.1 shapes) stay at 1. CPU (tests,
        # virtual meshes) stays at 1 — the probe is TPU-specific.
        light = (method.startswith("directinversion+p2p")
                 or method in ("ddim+p2p", "negative-prompt-inversion+p2p")
                 or BatchedDirectInversionP2P.step_ablation_steps(method)
                 is not None)
        bpd = 4 if light and jax.default_backend() != "cpu" else 1
    batch = n_dev * bpd
    try:
        if not pending:
            pass
        elif BatchedDirectInversionP2P.supports(method):
            _sweep_p2p(pipe, mesh, pending, batch, size, logger, method)
        elif method.endswith("masactrl"):
            _sweep_masactrl(pipe, mesh, pending, batch, size, logger, method)
        elif method == "edit-friendly-inversion+p2p":
            _sweep_ef(pipe, mesh, pending, batch, size, logger)
        elif method == "blended-latent-diffusion":
            _sweep_bld(pipe, mesh, pending, batch, size, logger)
        elif method.startswith("edict"):
            _sweep_edict(pipe, mesh, pending, batch, size, logger, method)
        elif method.startswith("instruct"):
            _sweep_instruct(pipe, mesh, pending, batch, size, logger, method)
        elif method.endswith("pix2pix-zero"):
            _sweep_p2z(pipe, mesh, pending, batch, size, logger, method, args)
        elif method == "stylediffusion+p2p":
            _sweep_stylediffusion(pipe, mesh, pending, batch, size, logger)
        else:
            _sweep_pnp(pipe, mesh, pending, batch, size, logger, method)
    finally:
        _SAVER.flush()

    if jax.process_count() > 1:
        per_proc = multihost.allreduce_metrics(
            np.array([float(len(pending))], np.float32), 1)
        total = float(per_proc[0]) * jax.process_count()
        logger.log("sweep_done", images_total=int(round(total)),
                   process_index=jax.process_index())
        print(f"sweep done: {int(round(total))} images across "
              f"{jax.process_count()} processes")


if __name__ == "__main__":
    main()
