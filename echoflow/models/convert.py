"""PyTorch checkpoint -> flax variables converter.

The reference distributes trained weights as
`torch.save({"model": state_dict, "optimizer": ...})` where the model keys
carry a DataParallel `module.` prefix and the torchvision backbone lives
under `module.r2plus1d_model.*` (reference motion_segment.py:72, train
notebook cell 10). This module maps that layout onto
echoflow.models.r2plus1d.R2Plus1DMotionSegNet's variable tree.

Layout conversions:
  - Conv3d weight (O, I, D, H, W)  -> flax kernel (D, H, W, I, O)
  - Linear weight (O, I)           -> (I, O)
  - BatchNorm weight/bias/running_mean/running_var
                                   -> params.{scale,bias} / batch_stats.{mean,var}
  - comb_1_layer stays a single (1,1,1,1024,64) kernel (the model splits it
    per-tap at apply time).
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np

# torchvision sequential indices inside a BasicBlock's conv path:
#   convN.0.0 spatial conv, convN.0.1 mid BN, convN.0.3 temporal conv,
#   convN.1 output BN; downsample.0 conv, downsample.1 BN.
_BN_PARTS = {"weight": ("params", "scale"), "bias": ("params", "bias"),
             "running_mean": ("batch_stats", "mean"),
             "running_var": ("batch_stats", "var")}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _set(tree: dict, collection: str, path: tuple[str, ...], leaf: str, value):
    node = tree.setdefault(collection, {})
    for key in path:
        node = node.setdefault(key, {})
    node[leaf] = np.asarray(value)


def convert_state_dict(state_dict: Mapping[str, "np.ndarray"]) -> dict:
    """Convert a reference model state dict into {'params': ..., 'batch_stats': ...}.

    Accepts tensors or numpy arrays; `module.` prefixes are stripped.
    Raises on unrecognized keys so silent drift is impossible.
    """
    tree: dict = {"params": {}, "batch_stats": {}}

    def to_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    for key, value in state_dict.items():
        name = key[len("module."):] if key.startswith("module.") else key
        if name.endswith("num_batches_tracked"):
            continue
        v = to_np(value)

        m = re.match(r"r2plus1d_model\.(.*)", name)
        if m:
            _convert_backbone_key(tree, m.group(1), v)
            continue

        head_map = {
            "comb_1_layer.weight": ("params", (), "comb1_kernel", lambda x: _conv_kernel(x)),
            "comb_1_layer.bias": ("params", (), "comb1_bias", lambda x: x),
            "comb_2_layer.weight": ("params", ("comb2",), "kernel", _conv_kernel),
            "comb_2_layer.bias": ("params", ("comb2",), "bias", lambda x: x),
            "segmentation_head.weight": ("params", ("seg_head",), "kernel", _conv_kernel),
            "segmentation_head.bias": ("params", ("seg_head",), "bias", lambda x: x),
            "motion_head.weight": ("params", ("motion_head",), "kernel", _conv_kernel),
            "motion_head.bias": ("params", ("motion_head",), "bias", lambda x: x),
        }
        if name in head_map:
            coll, path, leaf, fn = head_map[name]
            _set(tree, coll, path, leaf, fn(v))
            continue

        bn = re.match(r"comb_batch_norm_([12])\.(\w+)", name)
        if bn:
            idx, part = bn.groups()
            coll, leaf = _BN_PARTS[part]
            _set(tree, coll, (f"comb_bn{idx}",), leaf, v)
            continue

        raise KeyError(f"unrecognized reference checkpoint key: {key}")

    return tree


def _convert_backbone_key(tree: dict, name: str, v: np.ndarray):
    base = ("backbone",)

    stem = re.match(r"stem\.(\d)\.(\w+)", name)
    if stem:
        idx, part = int(stem.group(1)), stem.group(2)
        mod = {0: "stem_conv_s", 1: "stem_bn_s", 3: "stem_conv_t", 4: "stem_bn_t"}[idx]
        if part == "weight" and idx in (0, 3):
            _set(tree, "params", base + (mod,), "kernel", _conv_kernel(v))
        else:
            coll, leaf = _BN_PARTS[part]
            _set(tree, coll, base + (mod,), leaf, v)
        return

    if name == "fc.weight":
        _set(tree, "params", (), "fc_kernel", v.T)
        return
    if name == "fc.bias":
        _set(tree, "params", (), "fc_bias", v)
        return

    blk = re.match(r"layer(\d)\.(\d)\.(.*)", name)
    if not blk:
        raise KeyError(f"unrecognized backbone key: {name}")
    layer, block, rest = blk.groups()
    prefix = base + (f"layer{layer}_block{block}",)

    conv = re.match(r"conv([12])\.0\.([013])\.(\w+)", rest)
    if conv:
        cidx, sub, part = conv.groups()
        sub = int(sub)
        if sub == 0:
            _set(tree, "params", prefix + (f"conv{cidx}", "spatial"), "kernel", _conv_kernel(v))
        elif sub == 3:
            _set(tree, "params", prefix + (f"conv{cidx}", "temporal"), "kernel", _conv_kernel(v))
        else:  # sub == 1: mid BN
            coll, leaf = _BN_PARTS[part]
            _set(tree, coll, prefix + (f"conv{cidx}", "bn_mid"), leaf, v)
        return

    outbn = re.match(r"conv([12])\.1\.(\w+)", rest)
    if outbn:
        cidx, part = outbn.groups()
        coll, leaf = _BN_PARTS[part]
        _set(tree, coll, prefix + (f"bn{cidx}",), leaf, v)
        return

    down = re.match(r"downsample\.([01])\.(\w+)", rest)
    if down:
        idx, part = down.groups()
        if idx == "0":
            _set(tree, "params", prefix + ("down_conv",), "kernel", _conv_kernel(v))
        else:
            coll, leaf = _BN_PARTS[part]
            _set(tree, coll, prefix + ("down_bn",), leaf, v)
        return

    raise KeyError(f"unrecognized block key: layer{layer}.{block}.{rest}")


def _leaf_paths(tree: dict, prefix=()) -> dict:
    out = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(_leaf_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(np.shape(v))
    return out


def _overlay(base, over, path=()):
    """Recursively overlay converted leaves onto a copy of `base`,
    validating every path exists with an identical shape."""
    out = dict(base)
    for k, v in over.items():
        if k not in out:
            raise KeyError(f"converted path {'/'.join(path + (k,))} is not "
                           "in the model's variable tree")
        if isinstance(v, Mapping):
            out[k] = _overlay(out[k], v, path + (k,))
        else:
            if tuple(np.shape(out[k])) != tuple(np.shape(v)):
                raise ValueError(
                    f"shape mismatch at {'/'.join(path + (k,))}: "
                    f"checkpoint {np.shape(v)} vs model {np.shape(out[k])}")
            out[k] = np.asarray(v, dtype=np.float32)
    return out


def convert_kinetics_backbone(state_dict: Mapping[str, "np.ndarray"],
                              base_variables: Mapping) -> dict:
    """Backbone-only initialization from a STOCK torchvision `r2plus1d_18`
    Kinetics-400 state dict (keys `stem.*`, `layer{1-4}.*`, `fc.*` — no
    `module.` prefix, no decoder/head keys).

    This is the reference's actual training recipe: it constructs
    `r2plus1d_18(pretrained=True)` and fine-tunes from Kinetics-400
    weights with fresh decoder/heads (reference
    src/model/R2plus1D_18_MotionNet.py:13). Returns a NEW variable tree:
    `base_variables` (a fresh `init_variables` tree, supplying the
    fresh-init comb/seg/motion heads) with the entire backbone —
    stem, layer1-4, and the dead Kinetics fc — replaced by the
    checkpoint's weights. Raises if the state dict contains non-backbone
    keys (use `convert_state_dict` for a full reference checkpoint) or
    doesn't cover the whole backbone.
    """
    tree: dict = {"params": {}, "batch_stats": {}}

    def to_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    for key, value in state_dict.items():
        name = key[len("module."):] if key.startswith("module.") else key
        if name.endswith("num_batches_tracked"):
            continue
        try:
            _convert_backbone_key(tree, name, to_np(value))
        except KeyError:
            raise KeyError(
                f"non-backbone key {key!r} in state dict — this looks like "
                "a full reference checkpoint; use convert_state_dict / "
                "load_reference_checkpoint for those") from None

    # The checkpoint must cover the ENTIRE backbone: a partial overlay
    # would silently mix pretrained and random backbone weights.
    for coll in ("params", "batch_stats"):
        want = {p for p in _leaf_paths(dict(base_variables[coll]))
                if p[0] == "backbone" or p[0] in ("fc_kernel", "fc_bias")}
        got = set(_leaf_paths(tree[coll]))
        missing = want - got
        if missing:
            raise ValueError(
                f"Kinetics state dict does not cover the full backbone; "
                f"missing e.g. {sorted(missing)[:5]}")

    return {
        "params": _overlay(base_variables["params"], tree["params"]),
        "batch_stats": _overlay(base_variables["batch_stats"],
                                tree["batch_stats"]),
    }


def load_kinetics_backbone(path: str, base_variables: Mapping) -> dict:
    """Load a stock torchvision r2plus1d_18 Kinetics `.pth` (a bare state
    dict, or wrapped under 'state_dict'/'model') and graft its backbone
    onto `base_variables` (heads stay fresh). Host-side, one-off."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=True)
    for wrapper in ("state_dict", "model"):
        if isinstance(payload, dict) and wrapper in payload:
            payload = payload[wrapper]
    return convert_kinetics_backbone(payload, base_variables)


def load_reference_checkpoint(path: str) -> dict:
    """Load a reference `.pth` checkpoint ({'model': state_dict, ...}) into
    flax variables. Requires torch (host-side, one-off conversion)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=True)
    state_dict = payload["model"] if "model" in payload else payload
    return convert_state_dict(state_dict)


def assert_tree_matches_model(converted: dict, model_variables: dict):
    """Validate the converted tree is structurally identical (same paths,
    same shapes) to a freshly initialized model's variables."""
    import jax

    ref_paths = {
        tuple(str(k.key) for k in path): leaf.shape
        for path, leaf in jax.tree_util.tree_flatten_with_path(model_variables)[0]
    }
    got_paths = {
        tuple(str(k.key) for k in path): leaf.shape
        for path, leaf in jax.tree_util.tree_flatten_with_path(converted)[0]
    }
    missing = set(ref_paths) - set(got_paths)
    extra = set(got_paths) - set(ref_paths)
    if missing or extra:
        raise ValueError(f"tree mismatch; missing={sorted(missing)[:5]} extra={sorted(extra)[:5]}")
    for p, shape in ref_paths.items():
        if tuple(got_paths[p]) != tuple(shape):
            raise ValueError(f"shape mismatch at {p}: {got_paths[p]} vs {shape}")
