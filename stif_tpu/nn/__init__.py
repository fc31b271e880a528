from stif_tpu.nn.blocks import Conv, ResidualBlockNoBN, ResidualTrunk, lrelu
from stif_tpu.nn.siren import Siren
from stif_tpu.nn.dcn import DCNSep
from stif_tpu.nn.pcd import PCDAlign, EasyPCD
from stif_tpu.nn.convlstm import ConvLSTMCell, BiDeformableConvLSTM
from stif_tpu.nn.mlp import MLP

__all__ = [
    "MLP",
    "Conv",
    "ResidualBlockNoBN",
    "ResidualTrunk",
    "lrelu",
    "Siren",
    "DCNSep",
    "PCDAlign",
    "EasyPCD",
    "ConvLSTMCell",
    "BiDeformableConvLSTM",
]
