from stif_tpu.convert.torch_import import (
    flax_params_to_torch_state,
    torch_state_to_flax_params,
    load_pth_checkpoint,
)

__all__ = [
    "flax_params_to_torch_state",
    "torch_state_to_flax_params",
    "load_pth_checkpoint",
]
