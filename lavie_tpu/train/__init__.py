from lavie_tpu.train.step import (
    TrainState,
    conditioned_diffusion_loss,
    diffusion_loss,
    make_train_step,
)
from lavie_tpu.train.timestep_sampler import (
    LossSecondMomentResampler,
    ScheduleSampler,
    UniformSampler,
    create_named_schedule_sampler,
)

__all__ = [
    "TrainState",
    "conditioned_diffusion_loss",
    "diffusion_loss",
    "make_train_step",
    "ScheduleSampler",
    "UniformSampler",
    "LossSecondMomentResampler",
    "create_named_schedule_sampler",
]
