"""Import reference (PyTorch) checkpoints into frn_tpu parameter trees.

The reference saves torch state_dicts with the module names of
retinanet/model.py (conv1, bn1, layer{1..4}[.i], *_event, fus.{0..3}, fpn.P*_*,
regressionModel/classificationModel towers). This module maps those names onto the
flax tree produced by frn_tpu.models.detector.FRNDetector:

  torch conv weight (out,in,kh,kw)  -> flax kernel (kh,kw,in,out)
  torch BN weight/bias              -> FrozenBatchNorm params scale/bias
  torch BN running_mean/var         -> batch_stats mean/var

The mapping is generated FROM the flax tree, so coverage is verifiable in both
directions (missing/unused keys are reported).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def _flatten(tree: Dict, prefix=()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Dict:
    tree: Dict = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def _module_to_torch(path: Tuple[str, ...], variant: str) -> str:
    """Map a flax module path (without the trailing param leaf) to the torch name."""
    parts = list(path)
    # drop flax's inner nn.Conv wrapper
    parts = [p for p in parts if p != "Conv_0"]

    head = parts[0]
    rest = parts[1:]

    def block_path(names: List[str], suffix: str) -> str:
        # layer{s}_{i} -> layer{s}.{i}; downsample_conv -> downsample.0 etc.
        out = []
        for n in names:
            if n.startswith("layer") and "_" in n:
                stage, idx = n[5:].split("_")
                out.append(f"layer{stage}{suffix}.{idx}")
            elif n == "downsample_conv":
                out.append("downsample.0")
            elif n == "downsample_bn":
                out.append("downsample.1")
            else:
                out.append(n)
        return ".".join(out)

    if head == "rgb_backbone":
        return block_path(rest, "")
    if head == "event_backbone":
        # stem names carry the _event suffix; stage names become layerN_event.i
        mapped = block_path(rest, "_event")
        if mapped.split(".")[0] in ("conv1", "bn1"):
            first, *others = mapped.split(".")
            mapped = ".".join([first + "_event"] + others)
        return mapped
    if head == "backbone":  # single-stream variants use unsuffixed names
        return block_path(rest, "")
    if head.startswith("fus_"):
        idx = head.split("_")[1]
        return f"fus.{idx}." + ".".join(rest)
    if head == "fpn":
        return "fpn." + ".".join(rest)
    if head in ("regressionModel", "classificationModel"):
        return head + "." + ".".join(rest)
    raise KeyError(f"unmapped flax module path: {path}")


_PARAM_LEAF_TO_TORCH = {
    "kernel": "weight",
    "bias": "bias",
    "scale": "weight",  # FrozenBatchNorm gamma
}
_STATS_LEAF_TO_TORCH = {"mean": "running_mean", "var": "running_var"}


def torch_key_for(path: Tuple[str, ...], collection: str, variant: str) -> str:
    *module, leaf = path
    torch_mod = _module_to_torch(tuple(module), variant)
    if collection == "params":
        # BN bias vs conv bias share the leaf name 'bias'; torch name is 'bias' both ways
        return f"{torch_mod}.{_PARAM_LEAF_TO_TORCH[leaf]}"
    return f"{torch_mod}.{_STATS_LEAF_TO_TORCH[leaf]}"


def convert_state_dict(
    torch_sd: Dict[str, np.ndarray],
    template_variables: Dict[str, Any],
    variant: str = "fusion",
    strict: bool = True,
) -> Dict[str, Any]:
    """Fill a flax variables template from a torch state_dict.

    Returns {'params': ..., 'batch_stats': ...}. With strict=True, raises if any
    template leaf lacks a torch tensor or shapes mismatch.
    """
    used = set()
    out = {}
    report_missing = []
    for collection in ("params", "batch_stats"):
        flat = _flatten(template_variables.get(collection, {}))
        new_flat = {}
        for path, leaf in flat.items():
            tkey = torch_key_for(path, collection, variant)
            if tkey not in torch_sd:
                report_missing.append(tkey)
                new_flat[path] = leaf
                continue
            arr = np.asarray(torch_sd[tkey])
            used.add(tkey)
            if path[-1] == "kernel":
                if arr.ndim == 4:
                    arr = np.transpose(arr, (2, 3, 1, 0))
                else:
                    raise ValueError(f"{tkey}: expected 4D conv weight, got {arr.shape}")
            want = tuple(np.shape(leaf))
            if tuple(arr.shape) != want:
                raise ValueError(f"{tkey}: shape {arr.shape} != template {want}")
            new_flat[path] = arr.astype(np.asarray(leaf).dtype)
        out[collection] = _unflatten(new_flat)

    if strict and report_missing:
        raise KeyError(f"torch checkpoint missing {len(report_missing)} keys, e.g. {report_missing[:5]}")
    unused = [k for k in torch_sd if k not in used and "num_batches_tracked" not in k]
    out["_unused_torch_keys"] = unused
    out["_filled_keys"] = sorted(used)
    out["_missing_template_keys"] = report_missing
    return out


def imagenet_backbone_init(
    torch_sd: Dict[str, np.ndarray],
    template_variables: Dict[str, Any],
    variant: str = "fusion",
) -> Tuple[Dict[str, Any], Dict[str, List[str]]]:
    """Out-of-the-box ImageNet-pretrained initialization (model.py:690-701).

    Replicates the reference's ``model.load_state_dict(torchvision_resnet_sd,
    strict=False)`` (model.py:700): every template leaf whose torch name
    exists in the state dict is filled — for 'fusion'/'rgb' that is the 3-ch
    RGB stem plus all four RGB stages (conv1/bn1/layer1..4 match torchvision's
    names exactly) — while the event stem/backbone (*_event names, absent from
    torchvision), fusion blocks, FPN, and heads keep their current init.
    Unexpected torch keys (fc.*) are ignored; a present key with a mismatched
    shape raises, exactly as torch does even under strict=False (the 'event'
    variant's 5-channel conv1 therefore cannot take ImageNet weights — same
    as the reference).

    Recipe (given torchvision resnet50 weights at PATH):
        sd = load_torch_checkpoint(PATH)
        model, variables = init_detector(cfg, rng)
        variables, report = imagenet_backbone_init(sd, variables, cfg.model.variant)

    Returns (variables, report) with report keys 'filled' (torch names
    copied), 'left_at_init' (template leaves not in the state dict), and
    'ignored' (torch keys with no template target, e.g. fc.*).
    """
    out = convert_state_dict(torch_sd, template_variables, variant=variant, strict=False)
    report = {
        "filled": out.pop("_filled_keys"),
        "left_at_init": out.pop("_missing_template_keys"),
        "ignored": out.pop("_unused_torch_keys"),
    }
    variables = dict(template_variables)
    variables.update({k: out[k] for k in ("params", "batch_stats")})
    return variables, report


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference checkpoint file -> {name: np.ndarray}.

    Accepts either a raw state_dict or the reference trainer's
    {'model_state_dict': ...} wrapper (train_dsec.py:198-200). Strips
    DataParallel's 'module.' prefix.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module.") :]
        out[k] = v.detach().cpu().numpy()
    return out
