#!/usr/bin/env python3
"""Per-stage roofline table for the detector trunk on the real chip.

VERDICT r03 item 3: decide whether FRCNN's backbone-conv residual is waste
or structure. For each ResNet stage (plus FPN and the detector heads) this
measures fwd and fwd+bwd time at the working canvas, and compares achieved
TF/s against the stage's ROOFLINE bound:

    bound = flops / max(flops / PEAK_FLOPS, bytes / PEAK_BW)

with an unfused-conv-chain traffic model (each conv reads its input and
writes its output once, bf16; BN/relu fuse into the conv epilogue; one
extra output-sized read+write per residual add). Early stages are
bandwidth-bound at bf16 (64-256 channels at stride 4), so low MFU there is
structural; late stages and the 256-wide head towers should approach the
compute roof.

Peaks: v5e ~197 TFLOP/s bf16, ~819 GB/s HBM (public spec).
Usage: python scripts/roofline_backbone.py [FRCNN|FCOS]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from flax import linen as nn  # noqa: E402

from dgod_tpu.models.resnet import Bottleneck, FrozenBatchNorm, _StemConv  # noqa: E402
from dgod_tpu.utils import flops as F  # noqa: E402
from dgod_tpu.utils.timing import calibrate_roundtrip, time_scalar_fn  # noqa: E402

PEAK_FLOPS = F.V5E_BF16_PEAK_FLOPS
PEAK_BW = float(os.environ.get("DGOD_PEAK_GBPS", "819")) * 1e9
B = 8
CANVAS = (608, 1216)
DTYPE = jnp.bfloat16


class _Stage(nn.Module):
    count: int
    width: int
    first_stride: int
    downsample_first: bool = True

    @nn.compact
    def __call__(self, x):
        for i in range(self.count):
            x = Bottleneck(
                self.width,
                strides=self.first_stride if i == 0 else 1,
                downsample=(i == 0 and self.downsample_first),
                name=f"block{i}",
                dtype=DTYPE,
            )(x)
        return x


class _Stem(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = _StemConv(name="conv1", dtype=DTYPE)(x)
        x = FrozenBatchNorm(name="bn1", dtype=DTYPE)(x)
        x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


def conv_bytes(h_in, w_in, h_out, w_out, k, cin, cout):
    """Unfused traffic: read input, write output, read weights (bf16)."""
    return 2.0 * (h_in * w_in * cin + h_out * w_out * cout) * B + 2.0 * k * k * cin * cout


def stage_traffic(h_in, w_in, cin, width, count, stride):
    """Traffic model for a bottleneck stack (see module docstring)."""
    total = 0.0
    h_out, w_out = h_in // stride, w_in // stride
    for i in range(count):
        hi, wi = (h_in, w_in) if i == 0 else (h_out, w_out)
        ci = cin if i == 0 else width * 4
        total += conv_bytes(hi, wi, hi, wi, 1, ci, width)           # 1x1
        total += conv_bytes(hi, wi, h_out, w_out, 3, width, width)  # 3x3
        total += conv_bytes(h_out, w_out, h_out, w_out, 1, width, width * 4)
        if i == 0:
            total += conv_bytes(hi, wi, h_out, w_out, 1, ci, width * 4)
        # residual add: read identity + read main + write out
        total += 3 * 2.0 * h_out * w_out * width * 4 * B
    return total


def main():
    family = sys.argv[1] if len(sys.argv) > 1 else "FRCNN"
    rt = calibrate_roundtrip()
    print(f"tunnel round-trip (subtracted): {rt:.2f} ms; batch {B}, "
          f"canvas {CANVAS}, bf16; peaks {PEAK_FLOPS/1e12:.0f} TF/s, "
          f"{PEAK_BW/1e9:.0f} GB/s")
    print(f"{'stage':22s} {'fwd ms':>8s} {'GF':>8s} {'TF/s':>6s} "
          f"{'GB':>6s} {'bound':>6s} {'%roof':>6s}   {'f+b ms':>8s} {'mfu':>6s}")

    bb = F.resnet50_flops(CANVAS)
    H, W = CANVAS
    h4, w4 = H // 4, W // 4

    stages = [
        # name, module, input shape, flops (per img), bytes (per batch)
        ("stem (s2d conv+pool)", _Stem(), (B, H, W, 3), bb["stem"],
         conv_bytes(H // 2, W // 2, H // 2, W // 2, 4, 12, 64)
         + 2.0 * (H // 2) * (W // 2) * 64 * B),
        ("layer1 (3x w64 s4)", _Stage(3, 64, 1), (B, h4, w4, 64),
         bb["layer1"], stage_traffic(h4, w4, 64, 64, 3, 1)),
        ("layer2 (4x w128 s8)", _Stage(4, 128, 2), (B, h4, w4, 256),
         bb["layer2"], stage_traffic(h4, w4, 256, 128, 4, 2)),
        ("layer3 (6x w256 s16)", _Stage(6, 256, 2), (B, h4 // 2, w4 // 2, 512),
         bb["layer3"], stage_traffic(h4 // 2, w4 // 2, 512, 256, 6, 2)),
        ("layer4 (3x w512 s32)", _Stage(3, 512, 2), (B, h4 // 4, w4 // 4, 1024),
         bb["layer4"], stage_traffic(h4 // 4, w4 // 4, 1024, 512, 3, 2)),
    ]

    if family == "FCOS":
        # the shared 4-conv head towers at P3 dominate FCOS head FLOPs —
        # time the P3 level alone as the representative row
        class _Tower(nn.Module):
            @nn.compact
            def __call__(self, x):
                for i in range(4):
                    x = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)],
                                name=f"conv{i}", dtype=DTYPE)(x)
                    x = nn.GroupNorm(num_groups=32, name=f"gn{i}",
                                     dtype=DTYPE)(x)
                    x = nn.relu(x)
                return x

        h8, w8 = H // 8, W // 8
        tower_f = 4 * F.conv_flops(h8, w8, 3, 3, 256, 256)
        tower_b = sum(conv_bytes(h8, w8, h8, w8, 3, 256, 256) for _ in range(4))
        stages.append(("fcos tower @P3 (4conv)", _Tower(), (B, h8, w8, 256),
                       tower_f, tower_b))
    else:
        class _RPNConv(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)],
                                       name="conv", dtype=DTYPE)(x))

        stages.append(("rpn conv @P2", _RPNConv(), (B, h4, w4, 256),
                       F.conv_flops(h4, w4, 3, 3, 256, 256),
                       conv_bytes(h4, w4, h4, w4, 3, 256, 256)))

    K = int(os.environ.get("DGOD_ROOFLINE_K", "48"))
    # chained iterations inside one jit: per-stage times are below
    # the tunnel round-trip, so per-call RT subtraction is hopeless; the
    # chain amortises it to noise. The input is perturbed through a value
    # XLA cannot prove constant (acc * 1e-38; exactly 1.0 after bf16
    # rounding) so the loop body can't be hoisted as loop-invariant.

    def timed_loop(scalar_of_x, x0, n=5):
        def looped(x):
            def body(i, carry):
                x, acc = carry
                acc = acc + scalar_of_x(x)
                x = (x.astype(jnp.float32) * (1.0 + acc * 1e-38)).astype(x.dtype)
                return (x, acc)
            _, acc = jax.lax.fori_loop(0, K, body, (x, jnp.float32(0)))
            return acc
        w = jax.jit(looped)
        float(w(x0))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(n):
            float(w(x0))
        return ((time.perf_counter() - t0) / n * 1000 - rt) / K

    rng = jax.random.PRNGKey(0)
    for name, mod, shape, flops_img, bts in stages:
        x = jnp.asarray(
            np.random.RandomState(0).rand(*shape).astype(np.float32),
            DTYPE)
        params = mod.init(rng, x)["params"]
        flops = flops_img * B  # per-batch

        def fwd_scalar(x):
            return mod.apply({"params": params}, x).astype(jnp.float32).sum()

        ms = timed_loop(fwd_scalar, x)

        def fb_scalar(x):
            g = jax.grad(
                lambda p: mod.apply({"params": p}, x).astype(jnp.float32).sum()
            )(params)
            return sum(v.astype(jnp.float32).sum()
                       for v in jax.tree_util.tree_leaves(g))

        ms_fb = timed_loop(fb_scalar, x, n=3)

        tfs = flops / ms / 1e9
        bound_s = max(flops / PEAK_FLOPS, bts / PEAK_BW)
        bound_tfs = flops / bound_s / 1e12
        mfu_fb = 3 * flops / (ms_fb / 1e3) / PEAK_FLOPS
        print(f"{name:22s} {ms:8.2f} {flops/1e9:8.1f} {tfs:6.1f} "
              f"{bts/1e9:6.2f} {bound_tfs:6.1f} {tfs/bound_tfs:6.1%}   "
              f"{ms_fb:8.2f} {mfu_fb:6.1%}", flush=True)


if __name__ == "__main__":
    main()
