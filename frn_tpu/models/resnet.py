"""ResNet backbone (NHWC, frozen BN) for the detector.

Re-implements the reference backbone semantics (retinanet/utils.py:12-80 blocks,
model.py:171-268 stem + stages) TPU-first: NHWC layout, explicit torch padding,
frozen batch stats. The stem input width is a parameter (3 for RGB, 5 for event
voxels — model.py:177 vs :198).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from frn_tpu.models.layers import Conv, FrozenBatchNorm, max_pool_3x3_s2


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Optional[jnp.dtype] = None

    expansion = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        out = Conv(self.planes, 3, self.stride, 1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = Conv(self.planes, 3, 1, 1, use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn2")(out)
        if self.downsample:
            residual = Conv(
                self.planes * self.expansion, 1, self.stride, 0, use_bias=False,
                dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = FrozenBatchNorm(dtype=self.dtype, name="downsample_bn")(residual)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Optional[jnp.dtype] = None

    expansion = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        out = Conv(self.planes, 1, 1, 0, use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = Conv(self.planes, 3, self.stride, 1, use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = Conv(self.planes * 4, 1, 1, 0, use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            residual = Conv(
                self.planes * 4, 1, self.stride, 0, use_bias=False,
                dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = FrozenBatchNorm(dtype=self.dtype, name="downsample_bn")(residual)
        return nn.relu(out + residual)


class ResNetBackbone(nn.Module):
    """Stem + 4 stages; returns (C2, C3, C4, C5) NHWC feature maps.

    Stage channel plan matches torchvision ResNet: stage strides (1,2,2,2),
    planes (64,128,256,512), expansion 4 for Bottleneck -> C sizes
    (256,512,1024,2048) at strides (4,8,16,32).
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    bottleneck: bool = True
    dtype: Optional[jnp.dtype] = None
    # Evaluate the stem with the Pallas implicit-GEMM kernel (ops/stem.py)
    # instead of the XLA conv. Same params/checkpoints; f32 accumulation with a
    # single rounding (the XLA path rounds twice in bf16: conv out, then BN).
    stem_kernel: bool = False

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        block = Bottleneck if self.bottleneck else BasicBlock
        # NOTE: a space-to-depth rewrite of this stem (layers._SpaceToDepthConv)
        # measured SLOWER on v5e (3.43 vs 2.44 ms/op slope at b8) — XLA's plain
        # lowering wins despite the tiny input channel count; keep it plain
        use_kernel = (
            self.stem_kernel
            and not self.is_initializing()
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        )
        if use_kernel:
            import jax

            from frn_tpu.ops.stem import stem_conv_bn_relu

            p = self.variables["params"]
            bs = self.variables["batch_stats"]
            k = p["conv1"]["Conv_0"]["kernel"]
            inv = jax.lax.rsqrt(bs["bn1"]["var"] + 1e-5) * p["bn1"]["scale"]
            x = stem_conv_bn_relu(
                x, k.astype(x.dtype), inv,
                p["bn1"]["bias"] - bs["bn1"]["mean"] * inv,
            )
        else:
            x = Conv(64, 7, 2, 3, use_bias=False, dtype=self.dtype, name="conv1")(x)
            x = FrozenBatchNorm(dtype=self.dtype, name="bn1")(x)
            x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        feats = []
        in_planes = 64
        for stage, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if stage == 0 else 2
            for i in range(blocks):
                need_down = i == 0 and (stride != 1 or in_planes != planes * block.expansion)
                x = block(
                    planes=planes,
                    stride=stride if i == 0 else 1,
                    downsample=need_down,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(x)
            in_planes = planes * block.expansion
            feats.append(x)
        return tuple(feats)

    @property
    def stage_channels(self) -> Tuple[int, ...]:
        e = 4 if self.bottleneck else 1
        return tuple(p * e for p in (64, 128, 256, 512))
