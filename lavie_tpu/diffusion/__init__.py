from lavie_tpu.diffusion.schedule import NoiseSchedule, make_beta_schedule
from lavie_tpu.diffusion.samplers import (
    ddpm_timesteps,
    ddim_timesteps,
    euler_sigmas,
    ddpm_step,
    ddim_step,
    euler_step,
    add_noise,
    get_velocity,
    classifier_free_guidance,
)

__all__ = [
    "NoiseSchedule",
    "make_beta_schedule",
    "ddpm_timesteps",
    "ddim_timesteps",
    "euler_sigmas",
    "ddpm_step",
    "ddim_step",
    "euler_step",
    "add_noise",
    "get_velocity",
    "classifier_free_guidance",
]
