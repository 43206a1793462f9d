"""Feature Pyramid Network + extra-level blocks — Flax, NHWC.

Parity with the torchvision FPN used by the reference:
- FRCNN: C2..C5 laterals + LastLevelMaxPool -> P2..P5 + 'pool' (stride 64)
  (reference fasterrcnn.py:317 resnet_fpn_backbone defaults).
- FCOS: C3..C5 laterals + LastLevelP6P7(256,256) -> P3..P7
  (reference fcos.py:780-783).
Top-down pathway uses nearest-neighbour upsampling then 3x3 smoothing convs.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# torchvision FPN conv init: kaiming_uniform(a=1)
FPN_INIT = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _upsample_nearest(x: jnp.ndarray, target_hw) -> jnp.ndarray:
    """Nearest-neighbour upsample NHWC to target (h, w).

    torchvision uses F.interpolate(mode='nearest') with arbitrary target
    sizes; index map is floor(i * in/out) which `jax.image.resize` matches
    for integer factors and we reproduce generally via gather.
    """
    h, w = x.shape[1], x.shape[2]
    th, tw = target_hw
    rows = (jnp.arange(th) * h // th).astype(jnp.int32)
    cols = (jnp.arange(tw) * w // tw).astype(jnp.int32)
    return x[:, rows][:, :, cols]


class FPN(nn.Module):
    """Build P-levels from backbone C-levels (lowest stride first)."""

    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]) -> List[jnp.ndarray]:
        n = len(feats)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), kernel_init=FPN_INIT, name=f"lateral{i}",
                    dtype=self.dtype)(f)
            for i, f in enumerate(feats)
        ]
        # top-down
        merged = [None] * n
        merged[n - 1] = laterals[n - 1]
        for i in range(n - 2, -1, -1):
            up = _upsample_nearest(merged[i + 1], laterals[i].shape[1:3])
            merged[i] = laterals[i] + up
        outs = [
            nn.Conv(
                self.out_channels,
                (3, 3),
                padding=[(1, 1), (1, 1)],
                kernel_init=FPN_INIT,
                name=f"output{i}",
                dtype=self.dtype,
            )(m)
            for i, m in enumerate(merged)
        ]
        return outs


class LastLevelMaxPool(nn.Module):
    """Extra 'pool' level: stride-2 1x1 max pool of the last P level."""

    @nn.compact
    def __call__(self, p_last: jnp.ndarray) -> jnp.ndarray:
        return nn.max_pool(p_last, (1, 1), strides=(2, 2))


class LastLevelP6P7(nn.Module):
    """P6/P7 from P5 via stride-2 3x3 convs (relu between), FCOS-style."""

    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, p5: jnp.ndarray):
        p6 = nn.Conv(
            self.out_channels,
            (3, 3),
            strides=(2, 2),
            padding=[(1, 1), (1, 1)],
            kernel_init=FPN_INIT,
            name="p6",
            dtype=self.dtype,
        )(p5)
        p7 = nn.Conv(
            self.out_channels,
            (3, 3),
            strides=(2, 2),
            padding=[(1, 1), (1, 1)],
            kernel_init=FPN_INIT,
            name="p7",
            dtype=self.dtype,
        )(nn.relu(p6))
        return p6, p7
