"""torchvision -> dgod_tpu weight conversion.

Maps a torchvision detection checkpoint state_dict (as produced by the
models the reference builds: `fasterrcnn_resnet50_fpn` at reference
fasterrcnn.py:307-329 and `fcos_resnet50_fpn` at fcos.py:717-788) onto our
Flax param trees:

- conv kernels: OIHW -> HWIO transpose,
- linear weights: [out, in] -> [in, out] transpose,
- BatchNorm (frozen): weight/bias/running_mean/running_var ->
  scale/bias/mean/var,
- resnet layout: layerL.B.convN/bnN/downsample.{0,1} ->
  layer{L}_block{B}.{convN,bnN,downsample_conv,downsample_bn},
- FPN inner/layer blocks -> lateral{i}/output{i},
- detection heads per the name tables below.

Works on a plain dict of numpy arrays — no torch import required (pass
`{k: v.numpy() for k, v in torch.load(...).items()}`). The environment here
has no network access so COCO/ImageNet checkpoints cannot be fetched; when
a checkpoint file is available locally this converter ports it. Random init
otherwise (parity caveat recorded in README).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _dense(w):
    return np.transpose(w, (1, 0))


def _set(tree: Dict, path: str, value):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = np.asarray(value)


def _convert_resnet_body(sd: Dict[str, np.ndarray], prefix: str, out: Dict, body_path: str):
    """prefix: e.g. 'backbone.body.' -> our '{body_path}/...'."""
    for key, val in sd.items():
        if not key.startswith(prefix):
            continue
        rest = key[len(prefix):]
        m = re.match(r"layer(\d)\.(\d+)\.(.*)", rest)
        if m:
            stage, block, tail = int(m.group(1)), int(m.group(2)), m.group(3)
            base = f"{body_path}/layer{stage}_block{block}"
            if tail.startswith("conv"):
                n = tail[4]
                _set(out, f"{base}/Conv_{int(n)-1}/kernel", _conv(val))
            elif tail.startswith("bn"):
                n, p = tail[2], tail.split(".")[-1]
                name = {"weight": "scale", "bias": "bias",
                        "running_mean": "mean", "running_var": "var"}[p]
                _set(out, f"{base}/bn{n}/{name}", val)
            elif tail.startswith("downsample.0"):
                _set(out, f"{base}/downsample_conv/kernel", _conv(val))
            elif tail.startswith("downsample.1"):
                p = tail.split(".")[-1]
                name = {"weight": "scale", "bias": "bias",
                        "running_mean": "mean", "running_var": "var"}[p]
                _set(out, f"{base}/downsample_bn/{name}", val)
        elif rest.startswith("conv1.weight"):
            _set(out, f"{body_path}/conv1/kernel", _conv(val))
        elif rest.startswith("bn1."):
            p = rest.split(".")[-1]
            name = {"weight": "scale", "bias": "bias",
                    "running_mean": "mean", "running_var": "var"}[p]
            _set(out, f"{body_path}/bn1/{name}", val)


def _convert_fpn(sd, prefix: str, out: Dict, fpn_path: str):
    for key, val in sd.items():
        if not key.startswith(prefix):
            continue
        rest = key[len(prefix):]
        m = re.match(r"inner_blocks\.(\d+)\.(?:0\.)?(weight|bias)", rest)
        if m:
            i, p = int(m.group(1)), m.group(2)
            _set(out, f"{fpn_path}/lateral{i}/" +
                 ("kernel" if p == "weight" else "bias"),
                 _conv(val) if p == "weight" else val)
            continue
        m = re.match(r"layer_blocks\.(\d+)\.(?:0\.)?(weight|bias)", rest)
        if m:
            i, p = int(m.group(1)), m.group(2)
            _set(out, f"{fpn_path}/output{i}/" +
                 ("kernel" if p == "weight" else "bias"),
                 _conv(val) if p == "weight" else val)


def convert_frcnn_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """torchvision fasterrcnn_resnet50_fpn state_dict -> FRCNNDetector params."""
    out: Dict = {}
    _convert_resnet_body(sd, "backbone.body.", out, "backbone/body")
    _convert_fpn(sd, "backbone.fpn.", out, "backbone/fpn")
    name_map = {
        "rpn.head.conv.weight": ("rpn_head/conv/kernel", _conv),
        "rpn.head.conv.bias": ("rpn_head/conv/bias", None),
        # newer torchvision nests rpn conv as conv.0.0
        "rpn.head.conv.0.0.weight": ("rpn_head/conv/kernel", _conv),
        "rpn.head.conv.0.0.bias": ("rpn_head/conv/bias", None),
        "rpn.head.cls_logits.weight": ("rpn_head/cls_logits/kernel", _conv),
        "rpn.head.cls_logits.bias": ("rpn_head/cls_logits/bias", None),
        "rpn.head.bbox_pred.weight": ("rpn_head/bbox_pred/kernel", _conv),
        "rpn.head.bbox_pred.bias": ("rpn_head/bbox_pred/bias", None),
        "roi_heads.box_head.fc6.weight": ("box_head/fc6/kernel", "fc6"),
        "roi_heads.box_head.fc6.bias": ("box_head/fc6/bias", None),
        "roi_heads.box_head.fc7.weight": ("box_head/fc7/kernel", _dense),
        "roi_heads.box_head.fc7.bias": ("box_head/fc7/bias", None),
        "roi_heads.box_predictor.cls_score.weight": ("predictor/cls_score/kernel", _dense),
        "roi_heads.box_predictor.cls_score.bias": ("predictor/cls_score/bias", None),
        "roi_heads.box_predictor.bbox_pred.weight": ("predictor/bbox_pred/kernel", _dense),
        "roi_heads.box_predictor.bbox_pred.bias": ("predictor/bbox_pred/bias", None),
    }
    for key, (path, fn) in name_map.items():
        if key not in sd:
            continue
        val = sd[key]
        if fn == "fc6":
            # fc6 input is the flattened 7x7x256 RoI patch: torch flattens
            # CHW, we flatten HWC -> permute the input dim accordingly
            w = np.asarray(val)  # [1024, 12544]
            w = w.reshape(w.shape[0], 256, 7, 7).transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
            val = _dense(w)
        elif fn is not None:
            val = fn(val)
        _set(out, path, val)
    return out


def convert_fcos_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """torchvision fcos_resnet50_fpn state_dict -> FCOS params."""
    out: Dict = {}
    _convert_resnet_body(sd, "backbone.body.", out, "backbone/body")
    _convert_fpn(sd, "backbone.fpn.", out, "backbone/fpn")
    # P6/P7 extra blocks
    for src, dst in (("backbone.fpn.extra_blocks.p6", "backbone/p6p7/p6"),
                     ("backbone.fpn.extra_blocks.p7", "backbone/p6p7/p7")):
        if f"{src}.weight" in sd:
            _set(out, f"{dst}/kernel", _conv(sd[f"{src}.weight"]))
            _set(out, f"{dst}/bias", sd[f"{src}.bias"])
    # head towers: conv.{0,3,6,9} are convs, {1,4,7,10} GroupNorms
    for tower, ours in (("classification_head", "cls"), ("regression_head", "reg")):
        for i in range(4):
            c = f"head.{tower}.conv.{i*3}"
            g = f"head.{tower}.conv.{i*3+1}"
            if f"{c}.weight" in sd:
                _set(out, f"head/{ours}_conv{i}/kernel", _conv(sd[f"{c}.weight"]))
                _set(out, f"head/{ours}_conv{i}/bias", sd[f"{c}.bias"])
                _set(out, f"head/{ours}_gn{i}/scale", sd[f"{g}.weight"])
                _set(out, f"head/{ours}_gn{i}/bias", sd[f"{g}.bias"])
    finals = {
        "head.classification_head.cls_logits": "head/cls_logits",
        "head.regression_head.bbox_reg": "head/bbox_reg",
        "head.regression_head.bbox_ctrness": "head/bbox_ctrness",
    }
    for src, dst in finals.items():
        if f"{src}.weight" in sd:
            _set(out, f"{dst}/kernel", _conv(sd[f"{src}.weight"]))
            _set(out, f"{dst}/bias", sd[f"{src}.bias"])
    return out


def merge_into(params: Dict, converted: Dict, strict_shapes: bool = True) -> int:
    """Overwrite matching leaves of `params` with `converted`. Returns the
    number of leaves replaced."""
    n = 0

    def rec(dst, src):
        nonlocal n
        for k, v in src.items():
            if k not in dst:
                continue
            if isinstance(v, dict):
                rec(dst[k], v)
            else:
                if strict_shapes and tuple(dst[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch for {k}: {dst[k].shape} vs {v.shape}"
                    )
                dst[k] = v.astype(np.asarray(dst[k]).dtype)
                n += 1

    rec(params, converted)
    return n
