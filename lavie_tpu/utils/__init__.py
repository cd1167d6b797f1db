from lavie_tpu.utils.masks import mask_generation
from lavie_tpu.utils.ema import ema_init, ema_update
from lavie_tpu.utils.logging import MetricLogger, create_logger

__all__ = [
    "mask_generation",
    "ema_init",
    "ema_update",
    "MetricLogger",
    "create_logger",
]
