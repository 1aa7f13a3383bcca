"""rtnr_tpu — Real-Time Neural Rendering of LiDAR Point Clouds, TPU-native.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
CUDA/C++/libtorch implementation (EDM-Research/Real-time-Neural-Rendering-of-
LiDAR-Point-Clouds): 1x1-pixel splat projection with z-buffer, depth-based
background-leak prefilter, and U-Net refinement — redesigned TPU-first:

- The CUDA atomic scatter-min/scatter-add rasterizer (reference
  src/RTRenderer/src/render.cu) becomes a sort-based raster: one lexicographic
  (pixel, depth) sort + segment reductions + unique-index scatters. TPUs have
  no global atomics; sorted segment reduction is the idiomatic XLA formulation
  and is fully differentiable.
- The coarse-to-fine depth prefilter (reference project_cloud.cu:28-187)
  becomes fused vectorized image ops under jit.
- The TorchScript/TensorRT U-Net (reference model/model.py) becomes a Flax
  U-Net, jitted end-to-end WITH the rasterizer in one XLA program.
- Scale-out is first-class: points sharded over a device mesh with
  pmin/psum z-buffer merge, frame batching, and psum'd training gradients
  (the reference is strictly single-GPU).
"""

__version__ = "0.1.0"

from rtnr_tpu.config import RenderConfig
from rtnr_tpu.camera import Camera, Trajectory
from rtnr_tpu.scene import Scene

__all__ = ["RenderConfig", "Camera", "Trajectory", "Scene", "__version__"]
