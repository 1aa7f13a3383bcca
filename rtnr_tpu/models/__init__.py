from rtnr_tpu.models.unet import UNet, DoubleConv

__all__ = ["UNet", "DoubleConv"]
