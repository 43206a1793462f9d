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
`{k: v.numpy() for k, v in torch.load(...).items()}`).

The audited production entry point is `port_torchvision`: it converts,
merges, and FAILS LOUDLY on any source key it did not consume or any
converted leaf the destination tree does not have — a renamed torchvision
key can never be skipped silently. The one sanctioned exception mirrors the
reference's own warm-start: class-count-dependent final layers are
re-initialised when shapes differ (the reference swaps `box_predictor`
after loading COCO weights, fasterrcnn.py:325-327).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Set

import numpy as np

# source keys a torch state_dict legitimately carries that have no
# destination leaf: BN step counters (unused by FrozenBatchNorm) and the
# torchvision classifier head of a plain ImageNet resnet50 (the detectors
# discard it, reference fcos.py:780 resnet50(...) -> backbone body only).
IGNORABLE = re.compile(r"(num_batches_tracked$)|(^fc\.(weight|bias)$)")


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


_BN_PARAM = {"weight": "scale", "bias": "bias",
             "running_mean": "mean", "running_var": "var"}


def _convert_resnet_body(sd: Dict[str, np.ndarray], prefix: str, out: Dict,
                         body_path: str, consumed: Optional[Set[str]] = None):
    """prefix: e.g. 'backbone.body.' -> our '{body_path}/...'."""
    consumed = set() if consumed is None else consumed

    def take(key, val):
        consumed.add(key)
        return val

    for key, val in sd.items():
        if not key.startswith(prefix):
            continue
        rest = key[len(prefix):]
        m = re.match(r"layer(\d)\.(\d+)\.(.*)", rest)
        if m:
            stage, block, tail = int(m.group(1)), int(m.group(2)), m.group(3)
            base = f"{body_path}/layer{stage}_block{block}"
            if re.fullmatch(r"conv\d\.weight", tail):
                n = tail[4]
                _set(out, f"{base}/Conv_{int(n)-1}/kernel", take(key, _conv(val)))
            elif tail.startswith("bn") and tail.split(".")[-1] in _BN_PARAM:
                n, p = tail[2], tail.split(".")[-1]
                _set(out, f"{base}/bn{n}/{_BN_PARAM[p]}", take(key, val))
            elif tail == "downsample.0.weight":
                _set(out, f"{base}/downsample_conv/kernel", take(key, _conv(val)))
            elif tail.startswith("downsample.1") and tail.split(".")[-1] in _BN_PARAM:
                p = tail.split(".")[-1]
                _set(out, f"{base}/downsample_bn/{_BN_PARAM[p]}", take(key, val))
        elif rest == "conv1.weight":
            _set(out, f"{body_path}/conv1/kernel", take(key, _conv(val)))
        elif rest.startswith("bn1.") and rest.split(".")[-1] in _BN_PARAM:
            p = rest.split(".")[-1]
            _set(out, f"{body_path}/bn1/{_BN_PARAM[p]}", take(key, val))


def _convert_fpn(sd, prefix: str, out: Dict, fpn_path: str,
                 consumed: Optional[Set[str]] = None):
    consumed = set() if consumed is None else consumed
    for key, val in sd.items():
        if not key.startswith(prefix):
            continue
        rest = key[len(prefix):]
        m = re.match(r"inner_blocks\.(\d+)\.(?:0\.)?(weight|bias)$", rest)
        if m:
            i, p = int(m.group(1)), m.group(2)
            _set(out, f"{fpn_path}/lateral{i}/" +
                 ("kernel" if p == "weight" else "bias"),
                 _conv(val) if p == "weight" else val)
            consumed.add(key)
            continue
        m = re.match(r"layer_blocks\.(\d+)\.(?:0\.)?(weight|bias)$", rest)
        if m:
            i, p = int(m.group(1)), m.group(2)
            _set(out, f"{fpn_path}/output{i}/" +
                 ("kernel" if p == "weight" else "bias"),
                 _conv(val) if p == "weight" else val)
            consumed.add(key)


def convert_imagenet_resnet_state_dict(sd: Dict[str, np.ndarray],
                                       consumed: Optional[Set[str]] = None) -> Dict:
    """Plain torchvision resnet50 (ImageNet) state_dict -> backbone body.

    The FCOS factory initialises only the backbone from ImageNet
    (reference fcos.py:776-783); `fc.*` is discarded.
    """
    out: Dict = {}
    _convert_resnet_body(sd, "", out, "backbone/body", consumed)
    return out


def convert_frcnn_state_dict(sd: Dict[str, np.ndarray],
                             consumed: Optional[Set[str]] = None) -> Dict:
    """torchvision fasterrcnn_resnet50_fpn state_dict -> FRCNNDetector params."""
    consumed = set() if consumed is None else consumed
    out: Dict = {}
    _convert_resnet_body(sd, "backbone.body.", out, "backbone/body", consumed)
    _convert_fpn(sd, "backbone.fpn.", out, "backbone/fpn", consumed)
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
        consumed.add(key)
    return out


def convert_fcos_state_dict(sd: Dict[str, np.ndarray],
                            consumed: Optional[Set[str]] = None) -> Dict:
    """torchvision fcos_resnet50_fpn state_dict -> FCOS params."""
    consumed = set() if consumed is None else consumed
    out: Dict = {}
    _convert_resnet_body(sd, "backbone.body.", out, "backbone/body", consumed)
    _convert_fpn(sd, "backbone.fpn.", out, "backbone/fpn", consumed)
    # P6/P7 extra blocks
    for src, dst in (("backbone.fpn.extra_blocks.p6", "backbone/p6p7/p6"),
                     ("backbone.fpn.extra_blocks.p7", "backbone/p6p7/p7")):
        if f"{src}.weight" in sd:
            _set(out, f"{dst}/kernel", _conv(sd[f"{src}.weight"]))
            _set(out, f"{dst}/bias", sd[f"{src}.bias"])
            consumed.update((f"{src}.weight", f"{src}.bias"))
    # head towers: conv.{0,3,6,9} are convs, {1,4,7,10} GroupNorms
    # (reference fcos.py:226-233, 300-307: Conv2d,GroupNorm,ReLU per layer)
    for tower, ours in (("classification_head", "cls"), ("regression_head", "reg")):
        for i in range(4):
            c = f"head.{tower}.conv.{i*3}"
            g = f"head.{tower}.conv.{i*3+1}"
            if f"{c}.weight" in sd:
                _set(out, f"head/{ours}_conv{i}/kernel", _conv(sd[f"{c}.weight"]))
                _set(out, f"head/{ours}_conv{i}/bias", sd[f"{c}.bias"])
                _set(out, f"head/{ours}_gn{i}/scale", sd[f"{g}.weight"])
                _set(out, f"head/{ours}_gn{i}/bias", sd[f"{g}.bias"])
                consumed.update((f"{c}.weight", f"{c}.bias",
                                 f"{g}.weight", f"{g}.bias"))
    finals = {
        "head.classification_head.cls_logits": "head/cls_logits",
        "head.regression_head.bbox_reg": "head/bbox_reg",
        "head.regression_head.bbox_ctrness": "head/bbox_ctrness",
    }
    for src, dst in finals.items():
        if f"{src}.weight" in sd:
            _set(out, f"{dst}/kernel", _conv(sd[f"{src}.weight"]))
            _set(out, f"{dst}/bias", sd[f"{src}.bias"])
            consumed.update((f"{src}.weight", f"{src}.bias"))
    return out


def unconsumed_keys(sd: Dict[str, np.ndarray], consumed: Set[str]) -> List[str]:
    """Source keys the converter did not map, minus the ignorable ones."""
    return sorted(k for k in sd
                  if k not in consumed and not IGNORABLE.search(k))


def tree_paths(tree: Dict, prefix: str = "") -> List[str]:
    out = []
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.extend(tree_paths(v, p))
        else:
            out.append(p)
    return sorted(out)


def merge_into(params: Dict, converted: Dict, strict_shapes: bool = True,
               missing: Optional[List[str]] = None) -> int:
    """Overwrite matching leaves of `params` with `converted`.

    Returns the number of leaves replaced. Converted paths with no
    destination leaf are appended to `missing` when a list is given
    (callers that must not skip silently assert it stays empty).
    """
    n = 0

    def rec(dst, src, prefix):
        nonlocal n
        for k, v in src.items():
            path = f"{prefix}/{k}" if prefix else k
            if k not in dst or isinstance(v, dict) != isinstance(dst.get(k), dict):
                if missing is not None:
                    if isinstance(v, dict):
                        missing.extend(tree_paths(v, path))
                    else:
                        missing.append(path)
                continue
            if isinstance(v, dict):
                rec(dst[k], v, path)
            else:
                if strict_shapes and tuple(dst[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch for {path}: {dst[k].shape} vs {v.shape}"
                    )
                dst[k] = v.astype(np.asarray(dst[k]).dtype)
                n += 1

    rec(params, converted, "")
    return n


def _leaf(tree: Dict, path: str):
    node = tree
    for k in path.split("/"):
        if not isinstance(node, dict) or k not in node:
            return None
        node = node[k]
    return node


def _drop(tree: Dict, path: str):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.get(k, {})
    node.pop(keys[-1], None)


# Final layers whose shapes depend on the class count. The reference
# re-initialises these after loading COCO weights (fasterrcnn.py:325-327
# swaps box_predictor to num_classes+1 outputs; an FCOS COCO checkpoint's
# cls_logits likewise has 91*A outputs vs our 9*A).
_CLASS_DEPENDENT = {
    "FRCNN": ("predictor",),
    "FCOS": ("head/cls_logits",),
}


def port_torchvision(params: Dict, sd: Dict[str, np.ndarray], family: str) -> Dict:
    """Audited production port of a torchvision checkpoint into `params`.

    `family`: 'FRCNN' | 'FCOS' | 'resnet' (plain ImageNet resnet50 —
    backbone-body-only init, the FCOS factory's pretrained_backbone path,
    reference fcos.py:776-783).

    Mutates `params` in place. Raises ValueError if any non-ignorable source
    key was not consumed, if any converted leaf has no destination, or on
    any shape mismatch outside the class-dependent final layers (which are
    dropped and reported, mirroring the reference's predictor swap).

    Returns stats: {merged, dropped_class_dependent, total_leaves}.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    consumed: Set[str] = set()
    if family == "FRCNN":
        converted = convert_frcnn_state_dict(sd, consumed)
    elif family == "FCOS":
        converted = convert_fcos_state_dict(sd, consumed)
    elif family == "resnet":
        converted = convert_imagenet_resnet_state_dict(sd, consumed)
    else:
        raise ValueError(f"unknown family {family!r}")

    leftover = unconsumed_keys(sd, consumed)
    if leftover:
        raise ValueError(
            f"converter did not consume {len(leftover)} source keys "
            f"(renamed upstream?): {leftover[:8]}{'...' if len(leftover) > 8 else ''}"
        )

    dropped = []
    for path in _CLASS_DEPENDENT.get(family, ()):
        src, dst = _leaf(converted, path), _leaf(params, path)
        if src is None or dst is None:
            continue
        # compare leaf-by-leaf: drop the subtree iff ANY leaf shape differs
        src_paths = tree_paths(src) if isinstance(src, dict) else [""]
        for lp in src_paths:
            s = _leaf(converted, f"{path}/{lp}" if lp else path)
            d = _leaf(params, f"{path}/{lp}" if lp else path)
            if d is None or tuple(np.shape(s)) != tuple(np.shape(d)):
                _drop(converted, path)
                dropped.append(path)
                break

    missing: List[str] = []
    n = merge_into(params, converted, strict_shapes=True, missing=missing)
    if missing:
        raise ValueError(
            f"{len(missing)} converted leaves have no destination in the "
            f"param tree: {missing[:8]}{'...' if len(missing) > 8 else ''}"
        )
    return {
        "merged": n,
        "dropped_class_dependent": dropped,
        "total_leaves": len(tree_paths(params)),
    }


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.pt state_dict (or Lightning ckpt) into numpy arrays."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        # Lightning prefixes the detector attribute name (e.g. 'detector.')
        k = re.sub(r"^(model|detector)\.", "", k)
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out
