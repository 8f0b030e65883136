"""Shared conv/attention building blocks (Flax, NHWC, bf16-ready).

TPU-native re-implementations of the reference's block zoo
(/root/reference/twig/model/cod.py:355-683): BasicConv2d (conv+BN, note the
reference's forward applies BN but NOT the defined ReLU — cod.py:365-368),
CBAM channel/spatial attention, MPRNet-style CALayer/CAB, and the SAM
squeeze-excitation fusion (cod.py:454-506).

Initializer parity: modules under the PVT backbone use the reference's
``_init_weights`` scheme (trunc_normal(0.02) linears, normal(0, sqrt(2/fan_out))
convs — cod.py:1401-1414); everything else uses torch's default
kaiming-uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)) for both weight and bias.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# ---------------------------------------------------------------------------
# Initializers with torch parity
# ---------------------------------------------------------------------------


def torch_default_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv2d/Linear default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)).

    Flax conv kernels are (kh, kw, in_ch/groups, out_ch); linear (in, out).
    """
    if len(shape) == 2:  # linear
        fan_in = shape[0]
    else:  # conv HWIO
        receptive = 1
        for s in shape[:-2]:
            receptive *= s
        fan_in = shape[-2] * receptive
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def make_torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def make_pvt_conv_kernel_init(groups: int = 1):
    """Reference PVT `_init_weights` conv branch: normal(0, sqrt(2/fan_out))
    with torch's ``fan_out = kh*kw*out_channels // groups`` (cod.py:1410-1412).
    The division matters: a depthwise conv has fan_out = k² (each output
    channel sees k² weights), NOT k²·C — omitting it shrank depthwise init
    std by √C (32× at C=1024), diverging from-scratch training of the
    ConvNeXt tower / MixFFN dwconvs from the reference."""

    def init(key, shape, dtype=jnp.float32):
        receptive = 1
        for s in shape[:-2]:
            receptive *= s
        fan_out = max(shape[-1] * receptive // groups, 1)
        std = math.sqrt(2.0 / fan_out)
        return std * jax.random.normal(key, shape, dtype)

    return init


#: groups=1 convenience (1x1 planes path, ungrouped convs)
pvt_conv_kernel_init = make_pvt_conv_kernel_init(1)


def trunc_normal_init(std: float = 0.02):
    """timm trunc_normal_: truncated to ±2 std."""

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init


zeros_init = nn.initializers.zeros


# ---------------------------------------------------------------------------
# Primitive wrappers
# ---------------------------------------------------------------------------


class Conv(nn.Module):
    """NHWC conv with selectable torch-parity init scheme."""

    features: int
    kernel: int = 1
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    init_scheme: str = "torch"  # "torch" | "pvt"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..parallel.mesh import spatial_constraint

        x = spatial_constraint(x)
        in_ch = x.shape[-1]
        if self.init_scheme == "pvt":
            kinit = make_pvt_conv_kernel_init(self.groups)
            binit = zeros_init
        else:
            kinit = torch_default_kernel_init
            binit = make_torch_bias_init((in_ch // self.groups) * self.kernel * self.kernel)
        y = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=kinit,
            bias_init=binit,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        return spatial_constraint(y)


class _PlaneConv1x1Inner(nn.Module):
    """1x1 conv emitting channel-planes (B, O, H, W) directly from the
    matmul epilogue — parameter names/shapes identical to the nn.Conv inside
    ``Conv`` so checkpoints are interchangeable between layouts."""

    features: int
    init_scheme: str = "torch"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, input_layout: str = "NHWC"):
        in_ch = x.shape[-1] if input_layout == "NHWC" else x.shape[1]
        if self.init_scheme == "pvt":
            kinit, binit = pvt_conv_kernel_init, zeros_init
        else:
            kinit, binit = torch_default_kernel_init, make_torch_bias_init(in_ch)
        kernel = self.param("kernel", kinit, (1, 1, in_ch, self.features), jnp.float32)
        bias = self.param("bias", binit, (self.features,), jnp.float32)
        k = kernel[0, 0].astype(self.dtype)
        xd = x.astype(self.dtype)
        if input_layout == "NHWC":
            y = jnp.einsum("bhwi,io->bohw", xd, k)
        else:  # NCHW planes in, planes out
            y = jnp.einsum("bihw,io->bohw", xd, k)
        return y + bias.astype(self.dtype)[None, :, None, None]


class PlaneConv1x1(nn.Module):
    """Drop-in 1x1 ``Conv`` variant with NCHW (plane) output for the
    large-grid diffusion serving path; param tree matches ``Conv``
    (``<name>/Conv_0/kernel|bias``)."""

    features: int
    init_scheme: str = "torch"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, input_layout: str = "NHWC"):
        return _PlaneConv1x1Inner(
            self.features, self.init_scheme, self.dtype, name="Conv_0"
        )(x, input_layout)


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    init_scheme: str = "trunc"  # "trunc" (PVT linears) | "torch"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        if self.init_scheme == "trunc":
            kinit = trunc_normal_init(0.02)
            binit = zeros_init
        else:
            kinit = torch_default_kernel_init
            binit = make_torch_bias_init(in_f)
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=kinit,
            bias_init=binit,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class LayerNorm(nn.Module):
    """Channel-last layer norm (torch nn.LayerNorm parity, fp32 stats).

    A fused single-pass Pallas variant (ops/layernorm_pallas.py) was
    flag-gated here through round 2 and benched NEUTRAL end-to-end on v5e in
    both regimes (train bs32: 76.7 vs 78.5 img/s; inference bs8: 231.7 vs
    230.2) — XLA's convert_reduce fusions already run at HBM bandwidth. The
    flag is retired; the kernel stays as a tested example."""

    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..parallel.mesh import spatial_constraint

        # anchor input AND output sharding under a 2-D data×space mesh (exact
        # no-op otherwise) — see parallel/mesh.py::spatial_constraint
        x = spatial_constraint(x)
        y = nn.LayerNorm(
            epsilon=self.eps, dtype=self.dtype, param_dtype=jnp.float32
        )(x)
        return spatial_constraint(y)


class PReLU(nn.Module):
    """torch nn.PReLU(): single learnable slope, init 0.25."""

    init_value: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(self.init_value), (1,), jnp.float32)
        a = a.astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath parity)."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None):
        det = nn.merge_param("deterministic", self.deterministic, deterministic)
        if det or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


# ---------------------------------------------------------------------------
# Reference block zoo
# ---------------------------------------------------------------------------


class BasicConv2d(nn.Module):
    """conv(no bias) -> BatchNorm. The reference defines ReLU but does not
    apply it in forward (cod.py:365-368) — replicated: no activation."""

    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(
            self.features,
            self.kernel,
            self.stride,
            self.padding,
            self.dilation,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        return x


class ChannelAttention(nn.Module):
    """CBAM channel attention (cod.py:371-387). // 16 reduction, bias-free."""

    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        # floor 1: identical to the reference for its c >= 16 configs; keeps
        # tiny test configs free of zero-size (orbax-unsaveable) params
        fc1 = Conv(max(1, c // self.reduction), 1, use_bias=False, dtype=self.dtype)
        fc2 = Conv(c, 1, use_bias=False, dtype=self.dtype)
        out = fc2(nn.relu(fc1(avg))) + fc2(nn.relu(fc1(mx)))
        return nn.sigmoid(out)


class SpatialAttention(nn.Module):
    """CBAM spatial attention (cod.py:390-405)."""

    kernel: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        y = jnp.concatenate([avg, mx], axis=-1)
        y = Conv(1, self.kernel, padding=self.kernel // 2, use_bias=False, dtype=self.dtype)(y)
        return nn.sigmoid(y)


class CALayer(nn.Module):
    """MPRNet channel attention layer (cod.py:415-431)."""

    reduction: int = 16
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = Conv(max(1, c // self.reduction), 1, use_bias=self.use_bias, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = Conv(c, 1, use_bias=self.use_bias, dtype=self.dtype)(y)
        y = nn.sigmoid(y)
        return x * y


class CAB(nn.Module):
    """Channel attention block: conv-act-conv + CA, residual (cod.py:436-451).

    The act is PReLU (Hitnet default, cod.py:686)."""

    kernel: int = 3
    reduction: int = 4
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        res = Conv(c, self.kernel, padding=self.kernel // 2, use_bias=self.use_bias, dtype=self.dtype)(x)
        res = PReLU()(res)
        res = Conv(c, self.kernel, padding=self.kernel // 2, use_bias=self.use_bias, dtype=self.dtype)(res)
        res = CALayer(self.reduction, self.use_bias, dtype=self.dtype)(res)
        return res + x


class CABStack(nn.Module):
    """``n`` chained CABs with ``cab{i}`` child naming (one definition for
    the HitNet decoder levels AND the MPRNet encoder/decoder stacks — the
    param trees must stay converter-stable across both users)."""

    n: int = 2
    kernel: int = 3
    reduction: int = 4
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.n):
            x = CAB(self.kernel, self.reduction, self.use_bias, dtype=self.dtype, name=f"cab{i}")(x)
        return x


class SAMFusion(nn.Module):
    """Dual squeeze-excitation gated fusion (reference ``SAM``, cod.py:454-506):
    each input gets channel attention + a learned scalar gate, then summed."""

    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_h, x_l):
        c = x_h.shape[-1]
        squeeze = max(1, c // self.reduction)
        fc_a = Dense(squeeze, use_bias=False, init_scheme="torch", dtype=self.dtype)
        fc_b = Dense(c, use_bias=False, init_scheme="torch", dtype=self.dtype)
        fcw_a = Dense(squeeze, use_bias=False, init_scheme="torch", dtype=self.dtype)
        fcw_b = Dense(1, use_bias=False, init_scheme="torch", dtype=self.dtype)

        def branch(x):
            y = jnp.mean(x, axis=(1, 2))  # (B, C)
            w = nn.sigmoid(fcw_b(nn.relu(fcw_a(y))))  # (B, 1)
            g = nn.sigmoid(fc_b(nn.relu(fc_a(y))))  # (B, C)
            return x * g[:, None, None, :] * w[:, None, None, :]

        return branch(x_h) + branch(x_l)
