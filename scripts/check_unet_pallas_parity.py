"""Parity: UNet conv_impl=pallas vs xla on TPU at the bench shape."""
import numpy as np
import jax, jax.numpy as jnp
from rtnr_tpu.models.fold_bn import fold_batchnorm
from rtnr_tpu.models.unet import UNet, init_unet

features = (64, 128, 256, 512)
H, W = 1088, 1920
with jax.default_device(jax.devices("cpu")[0]):
    _, raw = init_unet(jax.random.PRNGKey(0), 64, 64, features=features)
variables = jax.device_put(fold_batchnorm(raw))
x = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, 5), jnp.bfloat16) * 0.5

def run(impl):
    net = UNet(features=features, dtype=jnp.bfloat16, fold_bn=True,
               skip_concat="split", conv_impl=impl)
    return np.asarray(jax.jit(net.apply)(variables, x), np.float32)

ya = run("xla")
yb = run("pallas")
d = np.abs(ya - yb)
rel = d / (np.abs(ya) + 1e-3)
print(f"max abs diff {d.max():.5f}  mean abs {d.mean():.6f}  max rel {rel.max():.4f}", flush=True)
print("PASS" if d.max() < 0.1 and d.mean() < 2e-3 else "FAIL", flush=True)
