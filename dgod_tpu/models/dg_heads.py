"""Domain-generalisation auxiliary heads.

Gradient Reversal Layer (GRL) + image-level and instance-level domain
classifiers, matching the reference architecture exactly:
- GRL: identity forward, backward multiplies by -0.1 (DGcommon.py:33-45)
- ImageDAFPN (FRCNN image-level, on P2): 4 convs 256ch stride
  (2,4)/4/4/3 valid padding -> flatten -> 256->128->D, sigmoid
  (DGcommon.py:48-81, weights init N(0, 0.001), zero bias)
- ImageDA (FCOS image-level, on C5): convs 2048->1024->512->256 stride
  (2,4)/2/2 -> flatten -> 256->128->D, sigmoid (DGcommon.py:84-113)
- FRCNN instance heads on 1024-d RoI features: InstanceDA
  (GRL, 1024->512 relu ->256 ->D sigmoid — no relu on layer 2,
  DGFRCNN.py:4-23), InsClsPrime (GRL, 1024->512->256->C), InsCls (no GRL)
  (DGFRCNN.py:25-64)
- FCOS instance heads on 256-d per-location features: InstanceDA
  (256->128 relu ->D sigmoid, DGFCOS.py:4-17), InsClsPrime / InsCls
  (256->128->64->C, DGFCOS.py:19-58)

Per-domain InsCls/InsClsPrime banks are realised as a single module with a
leading domain axis on every param (vmapped apply) instead of the
reference's nn.ModuleList (DGFRCNN.py:78-79) — one gather selects an
image's head, all heads evaluate in one batched matmul when needed (mode 4).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

DA_CONV_INIT = nn.initializers.normal(0.001)


@jax.custom_vjp
def grad_reverse(x, alpha: float = 0.1):
    return x


def _grad_reverse_fwd(x, alpha):
    return x, alpha


def _grad_reverse_bwd(alpha, g):
    return (-alpha * g, None)


grad_reverse.defvjp(_grad_reverse_fwd, _grad_reverse_bwd)


def _pad_to_min(x, min_hw):
    """Zero-pad spatial dims up to `min_hw`.

    The DA conv stacks are sized to reduce the reference canvas (608x1216)
    to exactly 1x1 (DGcommon.py:48-113); at that scale this is a no-op. It
    only fires for the reduced canvases used in CPU tests.
    """
    ph = max(0, min_hw[0] - x.shape[1])
    pw = max(0, min_hw[1] - x.shape[2])
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return x


class ImageDAFPN(nn.Module):
    """Image-level domain classifier over the FPN P2 map (FRCNN variant)."""

    num_domains: int

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, 256] (P2)
        x = _pad_to_min(x, (87, 171))  # smallest input reducing to 1x1
        x = grad_reverse(x)
        x = nn.relu(nn.Conv(256, (3, 3), strides=(2, 4), padding="VALID",
                            kernel_init=DA_CONV_INIT, name="conv1")(x))
        x = nn.relu(nn.Conv(256, (3, 3), strides=(4, 4), padding="VALID",
                            kernel_init=DA_CONV_INIT, name="conv2")(x))
        x = nn.relu(nn.Conv(256, (3, 3), strides=(4, 4), padding="VALID",
                            kernel_init=DA_CONV_INIT, name="conv3")(x))
        x = nn.relu(nn.Conv(256, (3, 3), strides=(3, 3), padding="VALID",
                            kernel_init=DA_CONV_INIT, name="conv4")(x))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(128, name="linear1")(x))
        return jax.nn.sigmoid(nn.Dense(self.num_domains, name="linear2")(x))


class ImageDA(nn.Module):
    """Image-level domain classifier over C5 (FCOS variant)."""

    num_domains: int

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, 2048] (C5)
        x = _pad_to_min(x, (19, 35))  # smallest input reducing to 1x1
        x = grad_reverse(x)
        x = nn.relu(nn.Conv(1024, (3, 3), strides=(2, 4), padding="VALID",
                            kernel_init=DA_CONV_INIT, name="conv1")(x))
        x = nn.relu(nn.Conv(512, (3, 3), strides=(2, 2), padding="VALID",
                            kernel_init=DA_CONV_INIT, name="conv2")(x))
        x = nn.relu(nn.Conv(256, (3, 3), strides=(2, 2), padding="VALID",
                            kernel_init=DA_CONV_INIT, name="conv3")(x))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(128, name="linear1")(x))
        return jax.nn.sigmoid(nn.Dense(self.num_domains, name="linear2")(x))


class MLPHead(nn.Module):
    """Generic instance head: Dense stack, relu only where the reference
    applies it, optional GRL, sigmoid output."""

    widths: Sequence[int]  # hidden widths then output width
    relu_mask: Sequence[bool]  # apply relu after layer i?
    use_grl: bool

    @nn.compact
    def __call__(self, x):
        if self.use_grl:
            x = grad_reverse(x)
        for i, (w, r) in enumerate(zip(self.widths, self.relu_mask)):
            x = nn.Dense(w, name=f"fc{i}")(x)
            if r:
                x = nn.relu(x)
        return jax.nn.sigmoid(x)


def frcnn_instance_da(num_domains: int) -> MLPHead:
    # 1024->512 (relu) ->256 (no relu) ->D, GRL (DGFRCNN.py:4-23)
    return MLPHead((512, 256, num_domains), (True, False, False), True)


def frcnn_ins_cls(num_classes: int, prime: bool) -> MLPHead:
    # 1024->512 (relu) ->256 (no relu) ->C; prime adds GRL (DGFRCNN.py:25-64)
    return MLPHead((512, 256, num_classes), (True, False, False), prime)


def fcos_instance_da(num_domains: int) -> MLPHead:
    # 256->128 (relu) ->D, GRL (DGFCOS.py:4-17)
    return MLPHead((128, num_domains), (True, False), True)


def fcos_ins_cls(num_classes: int, prime: bool) -> MLPHead:
    # 256->128 (relu) ->64 (no relu) ->C; prime adds GRL (DGFCOS.py:19-58)
    return MLPHead((128, 64, num_classes), (True, False, False), prime)


class _StackedDense(nn.Module):
    """Dense layer with a leading domain axis on kernel/bias.

    gather path (domain given): select each image's kernel FIRST, then one
    batched matmul — D x cheaper than evaluating every head and selecting
    the output (the reference's ModuleList indexing, DGFRCNN.py:78-79,
    touches one head per image too).
    all path (domain None): x is [D, B, ..., in]; one einsum over all heads.
    """

    features: int
    num_domains: int

    @nn.compact
    def __call__(self, x, domain=None):
        # batch_axis marks the leading domain axis so fan_in = in (not D*in):
        # each domain head gets the same init scale as an independent
        # nn.Dense / the reference's per-head Linear
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(
                1.0, "fan_in", "truncated_normal", batch_axis=(0,)
            ),
            (self.num_domains, x.shape[-1], self.features),
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.num_domains, self.features)
        )
        if domain is None:  # x: [D, B, ..., in]
            y = jnp.einsum("db...i,dio->db...o", x, kernel)
            b = bias.reshape((self.num_domains,) + (1,) * (y.ndim - 2)
                             + (self.features,))
        else:  # x: [B, ..., in], domain: [B]
            y = jnp.einsum("b...i,bio->b...o", x, kernel[domain])
            b = bias[domain].reshape((x.shape[0],) + (1,) * (y.ndim - 2)
                                     + (self.features,))
        return y + b


class _StackedMLP(nn.Module):
    """MLPHead with stacked per-domain params (same tree layout as the
    former nn.vmap bank: fc{i}/kernel [D, in, out])."""

    widths: Sequence[int]
    relu_mask: Sequence[bool]
    use_grl: bool
    num_domains: int

    @nn.compact
    def __call__(self, x, domain=None):
        if self.use_grl:
            x = grad_reverse(x)
        if domain is None:  # 'all' mode: broadcast over the domain axis
            x = jnp.broadcast_to(x[None], (self.num_domains,) + x.shape)
        for i, (w, r) in enumerate(zip(self.widths, self.relu_mask)):
            x = _StackedDense(w, self.num_domains, name=f"fc{i}")(x, domain)
            if r:
                x = nn.relu(x)
        return jax.nn.sigmoid(x)


class DomainBank(nn.Module):
    """A bank of `num_domains` identical heads with stacked params.

    apply modes:
      gather(x, domain): apply each image's own-domain head — x [B, ..., F],
        domain [B] int — params gathered per image, ONE matmul (not D).
      all(x): apply every head to every image — returns [D, B, ..., out].
    """

    head: MLPHead
    num_domains: int

    @nn.compact
    def __call__(self, x, domain=None, mode: str = "gather"):
        mlp = _StackedMLP(
            self.head.widths, self.head.relu_mask, self.head.use_grl,
            self.num_domains, name="bank",
        )
        if mode == "all":
            return mlp(x, None)  # [D, B, ..., out]
        return mlp(x, domain)
