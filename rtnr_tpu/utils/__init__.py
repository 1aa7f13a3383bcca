from rtnr_tpu.utils.image import read_png, write_png

__all__ = ["read_png", "write_png"]
