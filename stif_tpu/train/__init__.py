from stif_tpu.train.losses import charbonnier_loss, lap_loss, make_pixel_criterion
from stif_tpu.train.schedules import (
    cosine_annealing_restart,
    multistep_restart,
    warmup_wrap,
)

__all__ = [
    "charbonnier_loss",
    "lap_loss",
    "make_pixel_criterion",
    "cosine_annealing_restart",
    "multistep_restart",
    "warmup_wrap",
]
