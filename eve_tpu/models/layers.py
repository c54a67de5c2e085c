"""Shared layers: instance norm, torch-compatible initializers, MLP helpers.

All spatial tensors are NHWC (TPU-native layout). Initializer semantics match
torch defaults so that training-from-scratch dynamics are comparable to the
reference (torchvision convs: kaiming-normal fan_out/relu; torch Linear:
kaiming-uniform a=sqrt(5) with matching bias bounds).
"""

import jax
import jax.numpy as jnp
import flax.linen as nn

# kaiming_normal_(mode='fan_out', nonlinearity='relu')
kaiming_normal_out = nn.initializers.variance_scaling(
    2.0, 'fan_out', 'normal')

# torch.nn.Linear default weight init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
torch_linear_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, 'fan_in', 'uniform')


def torch_linear_bias_init(key, shape, dtype=jnp.float32, fan_in=None):
    """torch Linear/Conv bias default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    assert fan_in is not None
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def instance_norm(x, weight=None, bias=None, eps=1e-5):
    """InstanceNorm2d over NHWC input (normalize per-sample, per-channel).

    Matches ``torch.nn.InstanceNorm2d`` (biased variance, no running stats).
    Statistics are always float32 (the bf16 stability island, SURVEY.md
    section 7 item 5). For float32 inputs the centered two-pass form is kept
    (bit-stable for the torch parity suite). For bf16 inputs the elementwise
    math runs in bf16 as ``x * scale + shift`` with f32-accumulated one-pass
    statistics: the f32 centered intermediate the two-pass form materializes
    doubles the HBM traffic of this bandwidth-bound model — the fused form
    measured 1.13x on the RefineNet encoder/decoder band with zero output
    delta in bf16 (BASELINE.md).
    """
    if x.dtype == jnp.float32:
        mean = jnp.mean(x, axis=(-3, -2), keepdims=True, dtype=jnp.float32)
        xc = x - mean
        var = jnp.mean(jnp.square(xc), axis=(-3, -2), keepdims=True)
        y = xc * jax.lax.rsqrt(var + eps)
        if weight is not None:
            y = y * weight
        if bias is not None:
            y = y + bias
        return y
    mean = jnp.mean(x, axis=(-3, -2), keepdims=True, dtype=jnp.float32)
    ex2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(-3, -2),
                   keepdims=True)
    var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    scale = jax.lax.rsqrt(var + eps)
    if weight is not None:
        scale = scale * weight
    shift = -mean * scale
    if bias is not None:
        shift = shift + bias
    return x * scale.astype(x.dtype) + shift.astype(x.dtype)


class InstanceNorm(nn.Module):
    """InstanceNorm2d module; ``affine`` adds learnable scale/offset."""
    features: int
    affine: bool = False
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w = b = None
        if self.affine:
            w = self.param('scale', nn.initializers.ones, (self.features,))
            b = self.param('bias', nn.initializers.zeros, (self.features,))
        return instance_norm(x, w, b, self.eps)


class TorchLinear(nn.Module):
    """Dense layer with torch-default initialization."""
    features: int
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = None
    zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        if self.zero_init:
            kinit = nn.initializers.zeros
        elif self.kernel_init is not None:
            kinit = self.kernel_init
        else:
            kinit = torch_linear_kernel_init
        kernel = self.param('kernel', kinit, (in_features, self.features))
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            binit = lambda k, s: torch_linear_bias_init(k, s, fan_in=in_features)
            bias = self.param('bias', binit, (self.features,))
            y = y + bias.astype(x.dtype)
        return y


class Conv(nn.Module):
    """2D convolution (NHWC) with torch-style kaiming/fan-out init."""
    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    use_bias: bool = True
    zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        k = self.kernel_size
        kinit = nn.initializers.zeros if self.zero_init else kaiming_normal_out
        kernel = self.param('kernel', kinit, (k, k, in_features, self.features))
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype),
            window_strides=(self.strides, self.strides),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        )
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros, (self.features,))
            y = y + bias.astype(x.dtype)
        return y


def adaptive_max_pool(x, out_hw):
    """AdaptiveMaxPool2d for NHWC input, matching torch window semantics.

    Window for output index i over input size n: [floor(i*n/o), ceil((i+1)*n/o)).
    Uniform cases (n divisible by o) lower to a single reduce_window; the
    uneven cases (e.g. 9 -> 5) unroll over the small static output grid.
    """
    oh, ow = out_hw
    h, w = x.shape[-3], x.shape[-2]
    if h % oh == 0 and w % ow == 0:
        kh, kw = h // oh, w // ow
        identity = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
                    else jnp.iinfo(x.dtype).min)
        return jax.lax.reduce_window(
            x, identity, jax.lax.max,
            window_dimensions=(1, kh, kw, 1) if x.ndim == 4 else (kh, kw, 1),
            window_strides=(1, kh, kw, 1) if x.ndim == 4 else (kh, kw, 1),
            padding='VALID')
    rows = []
    for i in range(oh):
        h0, h1 = (i * h) // oh, -(-(i + 1) * h // oh)
        cols = []
        for j in range(ow):
            w0, w1 = (j * w) // ow, -(-(j + 1) * w // ow)
            cols.append(jnp.max(x[..., h0:h1, w0:w1, :], axis=(-3, -2)))
        rows.append(jnp.stack(cols, axis=-2))
    return jnp.stack(rows, axis=-3)


def resize_bilinear(x, out_hw):
    """Bilinear resize (align_corners=False semantics) over NHWC input.

    ``antialias=False`` matches ``torch.nn.functional.interpolate``.
    """
    oh, ow = out_hw
    if (oh, ow) == (x.shape[-3], x.shape[-2]):
        return x
    shape = x.shape[:-3] + (oh, ow, x.shape[-1])
    return jax.image.resize(x, shape, method='bilinear', antialias=False)


def depth_to_space(x, block: int):
    """Sub-pixel reshape: (..., H, W, b*b*C) -> (..., H*b, W*b, C).

    The channel axis is interpreted as (bh, bw, C) so each feature vector
    paints a contiguous bh x bw output tile — the learned-upsampling head of
    the TPU-native RefineNet (one lane-friendly conv instead of low-channel
    decoder levels).
    """
    *lead, h, w, c = x.shape
    assert c % (block * block) == 0, (c, block)
    c_out = c // (block * block)
    x = x.reshape(*lead, h, w, block, block, c_out)
    x = jnp.swapaxes(x, -4, -3)  # (..., h, bh, w, bw, c_out)
    return x.reshape(*lead, h * block, w * block, c_out)


def selu(x):
    return jax.nn.selu(x)


def leaky_relu(x, negative_slope=0.01):
    return jax.nn.leaky_relu(x, negative_slope)
