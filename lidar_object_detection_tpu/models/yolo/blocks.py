"""YOLOv11 building blocks in Flax (NHWC, TPU-native).

A from-scratch Flax implementation of the block zoo used by the ultralytics
YOLO11 models the reference drives via ``model.predict`` (yolo11x-seg,
V1_BBox_Pointwise_filtering.py:14,57).  Blocks follow the published YOLO11
architecture (Conv+BN+SiLU, C3k2/C3k/Bottleneck CSP blocks, SPPF, C2PSA
position-sensitive attention) so converted ``.pt`` weights drop in, but the
code is written for XLA: NHWC layout, ``nn.Conv`` lowering to MXU convs,
attention as batched einsums, no channel-first reshuffling.

Module/field names deliberately mirror the ultralytics state-dict layout
(``cv1``, ``cv2``, ``m0``.. , ``conv``/``bn``) so the weight converter in
:mod:`lidar_object_detection_tpu.models.yolo.weights` is a mechanical key
mapping.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvBNAct(nn.Module):
    """Conv2d (no bias) + BatchNorm + SiLU -- ultralytics ``Conv``.

    BN uses the ultralytics epsilon/momentum (1e-3 / 0.03).
    """

    out: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.k // 2
        x = nn.Conv(self.out, (self.k, self.k), strides=(self.s, self.s),
                    padding=[(p, p), (p, p)], feature_group_count=self.g,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        return nn.silu(x) if self.act else x


class DWConv(nn.Module):
    """Depthwise ``Conv`` -- groups = gcd(c_in, c_out)."""

    out: int
    k: int = 3
    s: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = math.gcd(x.shape[-1], self.out)
        return ConvBNAct(self.out, self.k, self.s, g=g, act=self.act,
                         dtype=self.dtype, name="dw")(x, train)


class Bottleneck(nn.Module):
    """Standard bottleneck: cv1 (k1) -> cv2 (k2) with optional residual."""

    out: int
    shortcut: bool = True
    k: Tuple[int, int] = (3, 3)
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.out * self.e)
        y = ConvBNAct(c_, self.k[0], dtype=self.dtype, name="cv1")(x, train)
        y = ConvBNAct(self.out, self.k[1], dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.out:
            return x + y
        return y


class C3k(nn.Module):
    """CSP block with 3 convs and ``n`` inner bottlenecks (kernel ``k``)."""

    out: int
    n: int = 2
    shortcut: bool = True
    e: float = 0.5
    k: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.out * self.e)
        a = ConvBNAct(c_, 1, dtype=self.dtype, name="cv1")(x, train)
        b = ConvBNAct(c_, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, (self.k, self.k), 1.0,
                           dtype=self.dtype, name=f"m{i}")(a, train)
        return ConvBNAct(self.out, 1, dtype=self.dtype,
                         name="cv3")(jnp.concatenate([a, b], -1), train)


class C3k2(nn.Module):
    """YOLO11's C2f-style split block; inner blocks are C3k (c3k=True, the
    m/l/x scales) or plain Bottlenecks (n/s scales)."""

    out: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.out * self.e)
        y = ConvBNAct(2 * c, 1, dtype=self.dtype, name="cv1")(x, train)
        parts = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            if self.c3k:
                nxt = C3k(c, 2, self.shortcut, dtype=self.dtype,
                          name=f"m{i}")(parts[-1], train)
            else:
                nxt = Bottleneck(c, self.shortcut, (3, 3), 0.5,
                                 dtype=self.dtype, name=f"m{i}")(parts[-1], train)
            parts.append(nxt)
        return ConvBNAct(self.out, 1, dtype=self.dtype,
                         name="cv2")(jnp.concatenate(parts, -1), train)


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained 5x5 max-pools."""

    out: int
    k: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = ConvBNAct(c_, 1, dtype=self.dtype, name="cv1")(x, train)
        outs = [y]
        pad = self.k // 2
        for _ in range(3):
            outs.append(nn.max_pool(
                outs[-1], (self.k, self.k), strides=(1, 1),
                padding=[(pad, pad), (pad, pad)]))
        return ConvBNAct(self.out, 1, dtype=self.dtype,
                         name="cv2")(jnp.concatenate(outs, -1), train)


class Attention(nn.Module):
    """PSA attention: qkv 1x1 conv, per-head softmax attention over the
    flattened spatial axis, depthwise positional-encoding conv on v."""

    dim: int
    num_heads: int = 8
    attn_ratio: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        n = h * w
        head_dim = self.dim // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        scale = key_dim ** -0.5
        qkv = ConvBNAct(self.num_heads * (2 * key_dim + head_dim), 1,
                        act=False, dtype=self.dtype, name="qkv")(x, train)
        qkv = qkv.reshape(b, n, self.num_heads, 2 * key_dim + head_dim)
        q = qkv[..., :key_dim]
        k = qkv[..., key_dim:2 * key_dim]
        v = qkv[..., 2 * key_dim:]
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                          preferred_element_type=jnp.float32) * scale
        attn = nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(b, h, w, self.dim)
        pe = ConvBNAct(self.dim, 3, g=self.dim, act=False, dtype=self.dtype,
                       name="pe")(v.reshape(b, h, w, self.dim), train)
        return ConvBNAct(self.dim, 1, act=False, dtype=self.dtype,
                         name="proj")(out + pe, train)


class PSABlock(nn.Module):
    """Attention + 2-layer conv FFN, both residual."""

    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + Attention(self.dim, self.num_heads, dtype=self.dtype,
                          name="attn")(x, train)
        y = ConvBNAct(self.dim * 2, 1, dtype=self.dtype, name="ffn0")(x, train)
        y = ConvBNAct(self.dim, 1, act=False, dtype=self.dtype,
                      name="ffn1")(y, train)
        return x + y


class C2PSA(nn.Module):
    """C2-style wrapper around ``n`` PSA blocks (YOLO11 layer 10)."""

    out: int
    n: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.out * self.e)
        y = ConvBNAct(2 * c, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        heads = max(c // 64, 1)
        for i in range(self.n):
            b = PSABlock(c, heads, dtype=self.dtype, name=f"m{i}")(b, train)
        return ConvBNAct(self.out, 1, dtype=self.dtype,
                         name="cv2")(jnp.concatenate([a, b], -1), train)


class TransposedUpsample2x(nn.Module):
    """Exact ``torch.nn.ConvTranspose2d(c, c, 2, 2, 0)``: with stride ==
    kernel == 2 every output pixel (2h+a, 2w+b) is
    ``sum_i x[h, w, i] * W[i, o, a, b] + bias[o]`` -- one einsum + reshape.
    The kernel parameter keeps the torch (in, out, kh, kw) layout so the
    weight converter copies it verbatim."""

    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (c_in, self.out, 2, 2))
        bias = self.param("bias", nn.initializers.zeros, (self.out,))
        b, h, wid, _ = x.shape
        y = jnp.einsum("bhwi,ioac->bhawco", x.astype(self.dtype),
                       w.astype(self.dtype))
        return y.reshape(b, 2 * h, 2 * wid, self.out) + bias.astype(self.dtype)


class Proto(nn.Module):
    """Segmentation prototype head: conv -> 2x transposed-conv upsample ->
    conv -> 1x1 to ``nm`` mask channels."""

    c_hidden: int = 256
    nm: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(self.c_hidden, 3, dtype=self.dtype, name="cv1")(x, train)
        x = TransposedUpsample2x(self.c_hidden, dtype=self.dtype,
                                 name="upsample")(x)
        x = ConvBNAct(self.c_hidden, 3, dtype=self.dtype, name="cv2")(x, train)
        return ConvBNAct(self.nm, 1, dtype=self.dtype, name="cv3")(x, train)


def upsample2x(x):
    """Nearest-neighbour 2x upsample (the head's ``nn.Upsample``)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def make_divisible(v: float, divisor: int = 8) -> int:
    """ultralytics ``make_divisible``: round up to the nearest multiple."""
    return int(math.ceil(v / divisor) * divisor)
