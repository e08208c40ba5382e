"""pnpinversion_tpu — a TPU-native (JAX/XLA/Pallas) diffusion image-editing framework.

Re-implements the full capability surface of cure-lab/PnPInversion (PIE-Bench
harness: 8 editing-method families x 6+ inversion techniques + 7-metric
evaluation) as a single unified framework designed for TPU:

- Functional Stable-Diffusion model core (CLIP text / VAE / UNet) with an
  explicit attention-control dispatch point instead of runtime monkey-patching
  (reference: models/p2p/attention_control.py:12-81).
- Pure-function scheduler math over precomputed alpha tables
  (reference: models/p2p/scheduler_dev.py, models/p2p/inversion.py:247-270).
- One `lax.scan` per diffusion phase (inversion / offset / edit), with
  controller state threaded through the carry.
- Pallas fused-attention kernels for the uncontrolled hot paths.
- `shard_map`-based sharding of the PIE-Bench sweep over a device mesh.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level exports (keeps bare `import pnpinversion_tpu` light)."""
    if name == "SDPipeline":
        from pnpinversion_tpu.pipeline import SDPipeline

        return SDPipeline
    if name in ("SD14", "SD21", "IP2P", "TINY"):
        import pnpinversion_tpu.configs as configs

        return getattr(configs, name)
    if name == "P2PEditor":
        from pnpinversion_tpu.editors.p2p_editor import P2PEditor

        return P2PEditor
    if name == "MetricsCalculator":
        from pnpinversion_tpu.evaluation.calculator import MetricsCalculator

        return MetricsCalculator
    raise AttributeError(name)
