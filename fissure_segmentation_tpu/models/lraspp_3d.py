"""LR-ASPP MobileNetV3-large inflated to 3-D (seg CNN "v3").

Counterpart of reference models/lraspp_3d.py:59-124, which performs layer
surgery on torchvision's 2-D lraspp_mobilenet_v3_large (Conv2d->Conv3d,
hardswish->LeakyReLU(0.01)). Here the network is built natively for 3-D:
a MobileNetV3-large backbone (inverted residuals with squeeze-excitation,
last stage dilated instead of strided, as in torchvision's segmentation
reduction) and the LR-ASPP head (lraspp_3d.py:14-40: 1x1 conv-bn-relu on the
high-level feature, global-pool sigmoid gating, low+high classifiers).

Input (B, D, H, W, 1), output (B, D, H, W, num_classes) logits.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .seg_cnn import kaiming_out


def _bn(train):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5)


def _act(x, hs: bool):
    # the reference replaces hardswish with LeakyReLU(1e-2) (lraspp_3d.py:98-102)
    return nn.leaky_relu(x, 0.01) if hs else nn.relu(x)


class SqueezeExcite(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        squeeze = max(self.channels // 4, 8)
        s = jnp.mean(x, axis=(-4, -3, -2), keepdims=True)
        s = nn.Conv(squeeze, (1, 1, 1), kernel_init=kaiming_out)(s)
        s = nn.relu(s)
        s = nn.Conv(self.channels, (1, 1, 1), kernel_init=kaiming_out)(s)
        s = nn.hard_sigmoid(s)
        return x * s


class InvertedResidualV3(nn.Module):
    exp: int
    out: int
    kernel: int
    stride: int
    use_se: bool
    hs: bool
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        h = x
        if self.exp != inp:
            h = nn.Conv(self.exp, (1, 1, 1), use_bias=False,
                        kernel_init=kaiming_out)(h)
            h = _act(_bn(train)(h), self.hs)
        k = (self.kernel,) * 3
        h = nn.Conv(self.exp, k, strides=(self.stride,) * 3,
                    kernel_dilation=(self.dilation,) * 3,
                    padding=[(self.dilation * (self.kernel // 2),) * 2] * 3,
                    feature_group_count=self.exp, use_bias=False,
                    kernel_init=kaiming_out)(h)
        h = _act(_bn(train)(h), self.hs)
        if self.use_se:
            h = SqueezeExcite(self.exp)(h)
        h = nn.Conv(self.out, (1, 1, 1), use_bias=False,
                    kernel_init=kaiming_out)(h)
        h = _bn(train)(h)
        if self.stride == 1 and inp == self.out:
            h = h + x
        return h


# (kernel, exp, out, SE, hardswish, stride) — torchvision MobileNetV3-large
_V3_LARGE = [
    (3, 16, 16, False, False, 1),
    (3, 64, 24, False, False, 2),
    (3, 72, 24, False, False, 1),
    (5, 72, 40, True, False, 2),
    (5, 120, 40, True, False, 1),
    (5, 120, 40, True, False, 1),   # <- low-level feature (40 ch, stride 8)
    (3, 240, 80, False, True, 2),
    (3, 200, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 480, 112, True, True, 1),
    (3, 672, 112, True, True, 1),
    (5, 672, 160, True, True, 2),   # dilated in segmentation mode
    (5, 960, 160, True, True, 1),
    (5, 960, 160, True, True, 1),
]
_LOW_INDEX = 5


class MobileNetV3Large3D(nn.Module):
    """Backbone returning (low (stride 8, 40ch), high (stride 16, 960ch))."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(16, (3, 3, 3), strides=(2, 2, 2), padding=1,
                    use_bias=False, kernel_init=kaiming_out)(x)
        h = _act(_bn(train)(h), True)
        low = None
        dilation = 1
        for i, (k, exp, out, se, hs, stride) in enumerate(_V3_LARGE):
            if i == len(_V3_LARGE) - 3 and stride == 2:
                # keep stride 16: dilate the last stage instead (torchvision
                # segmentation reduction)
                stride, dilation = 1, 2
            h = nn.remat(InvertedResidualV3)(exp, out, k, stride, se, hs,
                                             dilation)(h, train)
            if i == _LOW_INDEX:
                low = h
        h = nn.Conv(960, (1, 1, 1), use_bias=False, kernel_init=kaiming_out)(h)
        high = _act(_bn(train)(h), True)
        return low, high


class LRASPPHead(nn.Module):
    """(lraspp_3d.py:14-40)"""
    num_classes: int
    inter_channels: int = 128

    @nn.compact
    def __call__(self, low, high, train: bool = False):
        x = nn.Conv(self.inter_channels, (1, 1, 1), use_bias=False,
                    kernel_init=kaiming_out)(high)
        x = nn.relu(_bn(train)(x))
        s = jnp.mean(high, axis=(-4, -3, -2), keepdims=True)
        s = nn.Conv(self.inter_channels, (1, 1, 1), use_bias=False,
                    kernel_init=kaiming_out)(s)
        s = nn.sigmoid(s)
        x = x * s
        b, d, h, w, _ = low.shape
        x = jax.image.resize(x, (b, d, h, w, x.shape[-1]), "trilinear")
        return (nn.Conv(self.num_classes, (1, 1, 1))(low)
                + nn.Conv(self.num_classes, (1, 1, 1))(x))


class LRASPPMobileNetV33D(nn.Module):
    """Seg CNN v3 (lraspp_3d.py:59-124). Input (B, D, H, W, 1) -> logits at
    input resolution."""
    num_classes: int
    patch_size: Sequence[int] = (128, 128, 128)

    @nn.compact
    def __call__(self, x, train: bool = False):
        low, high = MobileNetV3Large3D()(x, train)
        out = LRASPPHead(self.num_classes)(low, high, train)
        b, d, h, w, _ = x.shape
        return jax.image.resize(out, (b, d, h, w, self.num_classes), "trilinear")
