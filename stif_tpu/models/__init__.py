from stif_tpu.models.luna_tokis import LunaTokis
from stif_tpu.models.luna_tokis_variants import (
    LunaTokisTrain,
    LunaTokisZSM,
    LunaTokisS,
    LunaTokisNoFlow,
)
from stif_tpu.models.tmnet import TMNet
from stif_tpu.models import ablations as _ablations  # registers LIIF_* presets
from stif_tpu.models.registry import register_model, make_model
from stif_tpu.nn.mlp import MLP

register_model("mlp")(MLP)  # liif_models.py:7-23 registry parity

__all__ = [
    "LunaTokis",
    "LunaTokisTrain",
    "LunaTokisZSM",
    "LunaTokisS",
    "LunaTokisNoFlow",
    "TMNet",
    "MLP",
    "register_model",
    "make_model",
]
