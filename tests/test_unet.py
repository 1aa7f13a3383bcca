"""U-Net architecture + torch->flax conversion parity tests.

The torch model here is an independently-written structural twin of the
reference architecture (reference model/model.py:5-69) used purely as a
conversion oracle: random torch weights -> convert -> outputs must match.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from rtnr_tpu.models.unet import UNet, init_unet  # noqa: E402
from rtnr_tpu.models.convert import convert_state_dict  # noqa: E402


def build_torch_unet(in_ch=5, out_ch=3, features=(8, 16)):
    """Structural twin of the reference UNet for conversion testing."""

    def double_conv(ci, co):
        return tnn.Sequential(
            tnn.Conv2d(ci, co, 3, 1, 1, bias=False),
            tnn.BatchNorm2d(co),
            tnn.ReLU(inplace=True),
            tnn.Conv2d(co, co, 3, 1, 1, bias=False),
            tnn.BatchNorm2d(co),
            tnn.ReLU(inplace=True),
        )

    def named_block(ci, co):
        blk = tnn.Module()
        blk.conv = double_conv(ci, co)
        return blk

    class Twin(tnn.Module):
        def __init__(self):
            super().__init__()
            self.downs = tnn.ModuleList()
            self.ups = tnn.ModuleList()
            self.pool = tnn.MaxPool2d(2, 2)
            ci = in_ch
            for f in features:
                self.downs.append(named_block(ci, f))
                ci = f
            for f in reversed(features):
                self.ups.append(tnn.ConvTranspose2d(f * 2, f, 2, 2))
                self.ups.append(named_block(f * 2, f))
            self.bottleneck = named_block(features[-1], features[-1] * 2)
            self.final_conv = tnn.Conv2d(features[0], out_ch, 1)

        def forward(self, x):
            skips = []
            for d in self.downs:
                x = d.conv(x)
                skips.append(x)
                x = self.pool(x)
            x = self.bottleneck.conv(x)
            skips = skips[::-1]
            for i in range(0, len(self.ups), 2):
                x = self.ups[i](x)
                sk = skips[i // 2]
                if x.shape != sk.shape:
                    x = torch.nn.functional.interpolate(x, size=sk.shape[2:], mode="bilinear")
                x = torch.cat((sk, x), dim=1)
                x = self.ups[i + 1].conv(x)
            return self.final_conv(x)

    return Twin()


@pytest.fixture(scope="module")
def torch_and_flax():
    torch.manual_seed(0)
    features = (8, 16)
    tm = build_torch_unet(features=features).eval()
    # randomize batchnorm stats so conversion of running stats is exercised
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.uniform_(-0.2, 0.2)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_state_dict(sd, features=features)
    fm = UNet(features=features, dtype=jnp.float32)
    return tm, fm, variables


def test_conversion_parity(torch_and_flax):
    tm, fm, variables = torch_and_flax
    x = np.random.default_rng(1).normal(size=(1, 5, 32, 32)).astype(np.float32)
    with torch.no_grad():
        yt = tm(torch.from_numpy(x)).numpy()
    yf = fm.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
    )
    yf = np.transpose(np.asarray(yf), (0, 3, 1, 2))
    np.testing.assert_allclose(yf, yt, rtol=1e-4, atol=1e-4)


def test_conversion_parity_rect_input(torch_and_flax):
    tm, fm, variables = torch_and_flax
    x = np.random.default_rng(2).normal(size=(2, 5, 16, 48)).astype(np.float32)
    with torch.no_grad():
        yt = tm(torch.from_numpy(x)).numpy()
    yf = fm.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    yf = np.transpose(np.asarray(yf), (0, 3, 1, 2))
    np.testing.assert_allclose(yf, yt, rtol=1e-4, atol=1e-4)


def test_unet_shapes_default_arch():
    # reference model.py:72-82 self-check analog: output shape == input shape
    model, variables = init_unet(jax.random.PRNGKey(0), 32, 32, features=(4, 8))
    y = model.apply(variables, jnp.zeros((1, 32, 32, 5)))
    assert y.shape == (1, 32, 32, 3)


def test_unet_bf16_close_to_f32():
    features = (8, 16)
    model, variables = init_unet(jax.random.PRNGKey(1), 32, 32, features=features)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 5), jnp.float32)
    y32 = model.apply(variables, x)
    bf = UNet(features=features, dtype=jnp.bfloat16)
    y16 = bf.apply(variables, x).astype(jnp.float32)
    assert np.mean(np.abs(np.asarray(y16) - np.asarray(y32))) < 0.05


def test_unet_train_mode_updates_stats():
    model, variables = init_unet(jax.random.PRNGKey(3), 16, 16, features=(4, 8))
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 5))
    y, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = variables["batch_stats"]["down0"]["bn0"]["mean"]
    after = mutated["batch_stats"]["down0"]["bn0"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_convtranspose_matmul_parity():
    """ConvTranspose2x2MatMul == nn.ConvTranspose bit-for-bit on shared
    parameters (the "matmul" up_impl is an exact lowering, incl. the
    spatial kernel flip of lax.conv_transpose)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from rtnr_tpu.models.unet import ConvTranspose2x2MatMul

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 6, 8, 12))
    ref = nn.ConvTranspose(10, kernel_size=(2, 2), strides=(2, 2), padding="VALID")
    v = ref.init(key, x)
    y_ref = ref.apply(v, x)
    y_mm = ConvTranspose2x2MatMul(10).apply(v, x)
    assert y_mm.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y_mm), np.asarray(y_ref), atol=1e-5)


def test_unet_up_impl_equivalence():
    """Whole-net outputs agree between up_impl variants on one variable set."""
    import jax
    import jax.numpy as jnp

    from rtnr_tpu.models.unet import UNet

    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 32, 48, 5))
    a = UNet(features=(8, 16), dtype=jnp.float32, up_impl="convt")
    b = UNet(features=(8, 16), dtype=jnp.float32, up_impl="matmul")
    v = a.init(key, x)
    ya = a.apply(v, x)
    yb = b.apply(v, x)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=1e-5)


def test_unet_lowering_variants_equivalence():
    """All lowering flags (pool_impl / skip_concat / tiny_cin_im2col) are
    exact rewrites: same variables -> same outputs (f32, tight tol)."""
    import itertools

    import jax
    import jax.numpy as jnp

    from rtnr_tpu.models.unet import UNet

    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (1, 32, 48, 5))
    base = UNet(features=(8, 16))
    v = base.init(key, x)
    y0 = np.asarray(base.apply(v, x))
    for pool, skip, im2col in itertools.product(
        ("reduce_window", "slice_max"), ("concat", "split"), ("im2col", "pad8", "native")
    ):
        m = UNet(features=(8, 16), pool_impl=pool, skip_concat=skip,
                 tiny_cin_impl=im2col)
        y = np.asarray(m.apply(v, x))
        np.testing.assert_allclose(
            y, y0, atol=5e-6, err_msg=f"pool={pool} skip={skip} im2col={im2col}"
        )


def test_unet_variants_equivalence_folded_bn():
    """Variant parity also holds for the folded-BN inference config."""
    import jax
    import jax.numpy as jnp

    from rtnr_tpu.models.fold_bn import fold_batchnorm
    from rtnr_tpu.models.unet import UNet, init_unet

    _, raw = init_unet(jax.random.PRNGKey(4), 32, 48, features=(8, 16))
    v = fold_batchnorm(raw)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 32, 48, 5))
    a = UNet(features=(8, 16), fold_bn=True)
    b = UNet(features=(8, 16), fold_bn=True, pool_impl="slice_max",
             skip_concat="split", tiny_cin_impl="pad8")
    np.testing.assert_allclose(
        np.asarray(a.apply(v, x)), np.asarray(b.apply(v, x)), atol=5e-6
    )
