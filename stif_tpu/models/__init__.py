from stif_tpu.models.luna_tokis import LunaTokis
from stif_tpu.models.tmnet import TMNet
from stif_tpu.models.registry import register_model, make_model

__all__ = ["LunaTokis", "TMNet", "register_model", "make_model"]
