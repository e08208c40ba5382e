"""TPU-native training subsystem.

The reference ships two trainers for its instruction-editing models — the
InstructPix2Pix PyTorch-Lightning trainer
(``models/instructpix2pix/main.py``) and the InstructDiffusion
torch.distributed/DeepSpeed trainer (``models/InstructDiffusion/main.py``,
``utils/deepspeed.py``, ``scripts/run_multinode.sh``) — plus the
P2P-generation + CLIP-filtering dataset-creation pipeline
(``models/instructpix2pix/dataset_creation/``).

Here both collapse into one JAX/pjit trainer:

- ``data``: the ``seeds.json`` edit-pair dataset layout, host-side numpy
  augmentation, and the weighted multi-dataset sampler.
- ``trainer``: the edit-conditioned latent-diffusion objective
  (``ddpm_edit.py`` semantics) as a single jitted, dp(x tp)-sharded train
  step with gradient accumulation, EMA, warmup LR, optional ZeRO-style
  sharded optimizer state, and orbax checkpointing.
- ``runners/run_training_instructpix2pix.py`` is the CLI;
  ``runners/run_dataset_creation.py`` covers dataset creation.
"""
