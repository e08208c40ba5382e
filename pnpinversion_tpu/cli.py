"""Shared benchmark-runner loop (the L6 driver layer).

Mirrors the reference's per-runner loop (run_editing_p2p.py:95-146): walk
mapping_file.json, filter categories, skip existing outputs (idempotent,
restartable), seed per image, save 4-panel strips under
output/<method>/annotation_images/<relative image path>.
"""
from __future__ import annotations

import argparse
import os
from typing import Callable, Dict, Sequence

import numpy as np

from pnpinversion_tpu.data.pie_bench import PieBenchDataset


def setup_compile_cache() -> None:
    """Persistent XLA compile cache for CPU (tests / tiny-config drives),
    where a cold 512px compile costs minutes of single-core CPU.

    NOT enabled for the tunneled TPU backend: there compilation happens
    server-side (a fresh 512px text-encoder compile measures ~4s), while a
    persistent-cache HIT must ship the serialized executable (>100MB for
    the fused sweep scans) back through the tunnel — measured 2-20 minutes,
    i.e. strictly slower than just recompiling remotely.

    Decides CPU-vs-TPU from jax_platforms config / JAX_PLATFORMS env when
    set, WITHOUT initializing the XLA backend: jax.distributed.initialize
    raises once backends exist, so this must stay safe to call before
    multihost.initialize (advisor r2, high)."""
    import jax

    platforms = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    if platforms:
        first = str(platforms).split(",")[0].strip().lower()
        if first != "cpu":
            return
    elif jax.default_backend() != "cpu":
        return
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def standard_argparser(default_methods: Sequence[str]) -> argparse.ArgumentParser:
    # NOTE: must not touch the XLA backend here — run_sweep_sharded builds
    # its parser before jax.distributed.initialize, which raises once
    # backends are initialized. setup_compile_cache() is called by
    # run_benchmark and by run_sweep_sharded.main after multihost init.
    p = argparse.ArgumentParser()
    p.add_argument("--rerun_exist_images", action="store_true")
    p.add_argument("--data_path", type=str, default="data")
    p.add_argument("--mapping_file", type=str, default=None,
                   help="override the mapping file, e.g. "
                        "data/mapping_file_ti2i_benchmark.json for the "
                        "55-image TI2I benchmark")
    p.add_argument("--output_path", type=str, default="output")
    p.add_argument("--edit_category_list", nargs="+", type=str,
                   default=[str(i) for i in range(10)])
    p.add_argument("--edit_method_list", nargs="+", type=str,
                   default=list(default_methods))
    p.add_argument("--checkpoint_dir", type=str, default=None,
                   help="converted SD weights (orbax/safetensors dir)")
    p.add_argument("--num_ddim_steps", type=int, default=50)
    p.add_argument("--run_log", type=str, default=None,
                   help="JSONL run log (per-image timings/errors)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="xprof trace dir (profiles the first edited image)")
    # plumbed explicitly to SDPipeline.create(quantize=args.quant) by every
    # runner (no process-global side channel; PNPI_QUANT env remains as a
    # fallback read inside create for non-CLI embedders)
    p.add_argument("--quant", type=str, default=None, choices=["none", "w8"],
                   help="opt-in weight-only int8 UNet weights (halved "
                        "weight HBM traffic, -4.5%% device time on the "
                        "fused scan; <1%% per-weight rounding error — "
                        "validate metrics on real weights before "
                        "production use). Also settable via PNPI_QUANT=w8.")
    return p


def run_benchmark(
    args,
    edit_fn: Callable,  # (edit_method, item) -> PIL.Image
    image_save_paths: Dict[str, str],
) -> None:
    from pnpinversion_tpu.utils.observability import RunLogger, profile_trace

    setup_compile_cache()
    logger = RunLogger(getattr(args, "run_log", None))
    profile_dir = getattr(args, "profile_dir", None)
    profiled = False
    dataset = PieBenchDataset(args.data_path,
                              mapping_file=getattr(args, "mapping_file", None))
    for item in dataset.items(args.edit_category_list):
        for edit_method in args.edit_method_list:
            rel = item.rel_output_path(
                os.path.join(args.data_path, "annotation_images"))
            save_path = os.path.join(args.output_path, image_save_paths[edit_method],
                                     "annotation_images", rel)
            if os.path.exists(save_path) and not args.rerun_exist_images:
                print(f"skip image [{item.image_path}] with [{edit_method}]")
                logger.log("image_skip", key=item.key, method=edit_method)
                continue
            print(f"editing image [{item.image_path}] with [{edit_method}]")
            np.random.seed(1234)
            with logger.image(item.key, edit_method):
                with profile_trace(profile_dir if not profiled else None):
                    edited = edit_fn(edit_method, item)
                profiled = profiled or bool(profile_dir)
            os.makedirs(os.path.dirname(save_path), exist_ok=True)
            edited.save(save_path)
            print("finish")
