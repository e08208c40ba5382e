from pnpinversion_tpu.schedulers.ddim import (
    DDIMSchedule,
    make_ddim_schedule,
    ddim_step,
    ddim_step_with_scale,
    ddim_inverse_step,
    ddim_step_recon_guided,
)
