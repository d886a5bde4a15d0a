from . import checkpoint
from .logger import get_logger
from .metrics import huber, img2mse, mse2psnr, psnr, ssim, to8b

__all__ = [
    "checkpoint",
    "get_logger",
    "img2mse",
    "mse2psnr",
    "psnr",
    "ssim",
    "to8b",
    "huber",
]
