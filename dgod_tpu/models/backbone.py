"""Backbone assemblies: ResNet-50 + FPN variants for each detector."""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .fpn import FPN, LastLevelMaxPool, LastLevelP6P7
from .resnet import ResNet50


class FRCNNBackbone(nn.Module):
    """ResNet50-FPN producing P2..P5 + pool (strides 4,8,16,32,64).

    Matches reference fasterrcnn.py:317 (`resnet_fpn_backbone`, returned
    layers 1-4 + LastLevelMaxPool). Also exposes the raw C-levels so the DG
    image-level classifier can tap P2 (reference DGFRCNN.py:93-94 hooks the
    whole FPN dict; ImageDAFPN consumes level '0' == P2, DGFRCNN.py:149).
    """

    out_channels: int = 256
    dtype: Any = jnp.float32
    block_counts: Tuple[int, ...] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x) -> Tuple[List[jnp.ndarray], Dict[str, jnp.ndarray]]:
        c = ResNet50(name="body", dtype=self.dtype,
                     block_counts=self.block_counts)(x)
        ps = FPN(self.out_channels, name="fpn", dtype=self.dtype)(
            [c["c2"], c["c3"], c["c4"], c["c5"]])
        pool = LastLevelMaxPool(name="pool")(ps[-1])
        return ps + [pool], c


class FCOSBackbone(nn.Module):
    """ResNet50-FPN producing P3..P7 (strides 8..128).

    Matches reference fcos.py:780-783 (returned layers 2-4 + LastLevelP6P7).
    Returns both pyramid levels and the raw C-levels (C5 feeds the DG
    image-level classifier, reference DGFCOS.py:129-130).
    """

    out_channels: int = 256
    dtype: Any = jnp.float32
    block_counts: Tuple[int, ...] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x) -> Tuple[List[jnp.ndarray], Dict[str, jnp.ndarray]]:
        c = ResNet50(name="body", dtype=self.dtype,
                     block_counts=self.block_counts)(x)
        ps = FPN(self.out_channels, name="fpn", dtype=self.dtype)(
            [c["c3"], c["c4"], c["c5"]])
        p6, p7 = LastLevelP6P7(self.out_channels, name="p6p7", dtype=self.dtype)(ps[-1])
        return ps + [p6, p7], c
