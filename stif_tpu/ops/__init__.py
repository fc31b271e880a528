from stif_tpu.ops.coords import make_coord, make_coord_demo
from stif_tpu.ops.grid_sample import grid_sample
from stif_tpu.ops.resize import imresize, resize_bilinear
from stif_tpu.ops.warp import backward_warp, warp_grid, warp_grid_coords
from stif_tpu.ops.deform_conv import deform_conv2d
from stif_tpu.ops.pixel_shuffle import pixel_shuffle
from stif_tpu.ops.fold import fold3x3

__all__ = [
    "make_coord",
    "make_coord_demo",
    "grid_sample",
    "imresize",
    "resize_bilinear",
    "backward_warp",
    "warp_grid",
    "warp_grid_coords",
    "deform_conv2d",
    "pixel_shuffle",
    "fold3x3",
]
