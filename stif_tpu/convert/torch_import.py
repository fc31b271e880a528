"""PyTorch checkpoint interop.

Maps between this framework's flax parameter tree and the reference's
``latest_G.pth`` state-dict schema (SURVEY.md §2.3; module tree defined by
``codes/models/modules/Sakuya_arch_test.py:282-311``), including the unused
legacy x4 head and the SIREN ``net.{i}.linear`` nesting.

Layout transforms:
  conv weights  OIHW (torch)  <-> HWIO (flax)
  linear weights (out, in)    <-> (in, out)
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

# flax module names that mirror torch nn.Sequential containers
_SEQ_RE = re.compile(
    r"^(t_process|f_process|layersAtBOffset|layersCtBOffset|layersFusion)_\d+$"
)


def _imnet_depths(flat_paths) -> Dict[str, int]:
    """Per-imnet ``net`` length, discovered from the param tree.

    Model variants differ in imnet depth (flagship feat_imnet has 4 net
    entries, the train variant's has 5 — ``Sakuya_arch.py:303-308``); the
    final entry is a plain Linear keyed ``net.{last}`` (no ``.linear``)."""
    depths: Dict[str, int] = {}
    for path in flat_paths:
        for i in range(1, len(path) - 1):
            if path[i].startswith("layer") and path[i - 1].endswith("imnet"):
                li = int(path[i][len("layer"):])
                name = path[i - 1]
                depths[name] = max(depths.get(name, 0), li + 1)
    return depths


def _flax_path_to_torch(path: Tuple[str, ...],
                        imnet_depths: Dict[str, int] = None
                        ) -> Tuple[str, str]:
    """Map a flax param path (module names + leaf) to (torch_key, kind).

    kind in {"conv", "linear", "bias"} controls the layout transform.
    ``imnet_depths``: per-imnet net length (from ``_imnet_depths``).
    """
    imnet_depths = imnet_depths or {}
    *mods, leaf = path
    out = []
    kind = None
    i = 0
    while i < len(mods):
        m = mods[i]
        if m.startswith("block"):
            out.append(m[len("block"):])
        elif (
            m == "forward_net"
            and i + 1 < len(mods)
            and mods[i + 1] == "step"
        ):
            # flax's scanned step module is anonymous in torch's tree:
            # forward_net/step/cell/conv -> forward_net.cell_list.0.conv
            # forward_net/step/pcd_{h,c} -> forward_net.pcd_{h,c}
            if mods[i + 2] == "cell":
                out += ["forward_net", "cell_list", "0"]
                i += 2
            else:
                out.append("forward_net")
                i += 1  # skip 'step'
        elif m in imnet_depths and i + 1 < len(mods) and mods[i + 1].startswith("layer"):
            n_layers = imnet_depths[m]
            li = int(mods[i + 1][len("layer"):])
            out.append(m)
            out.append("net")
            if li == n_layers - 1:
                out.append(str(li))  # final plain Linear
            else:
                out += [str(li), "linear"]
            i += 1
            kind = "linear"
        elif _SEQ_RE.match(m):
            # flax `t_process_0` etc. mirror torch nn.Sequential indices
            base, idx = m.rsplit("_", 1)
            out += [base, idx]
        else:
            out.append(m)
        i += 1
    if leaf == "kernel":
        torch_leaf = "weight"
        kind = kind or "conv"
    elif leaf == "weight":  # DCN raw weight param
        torch_leaf = "weight"
        kind = "conv"
    else:
        torch_leaf = "bias"
        kind = "bias"
    return ".".join(out + [torch_leaf]), kind


def _flatten(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict) or hasattr(v, "items"):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def flax_params_to_torch_state(params) -> Dict[str, np.ndarray]:
    """flax params (the ``{'params': ...}`` dict or its inner tree) ->
    torch-style state dict of numpy arrays."""
    tree = params.get("params", params) if hasattr(params, "get") else params
    entries = list(_flatten(tree))
    depths = _imnet_depths([p for p, _ in entries])
    state = {}
    for path, value in entries:
        v = np.asarray(value)
        if "blocks" in path:  # scanned trunk: leading stacked block axis
            j = path.index("blocks")
            pre, post = path[:j], path[j + 2:]
            for i in range(v.shape[0]):
                key, kind = _flax_path_to_torch(pre + (f"block{i}",) + post,
                                                depths)
                vi = v[i]
                if kind == "conv" and vi.ndim == 4:
                    vi = vi.transpose(3, 2, 0, 1)
                elif kind == "linear" and vi.ndim == 2:
                    vi = vi.T
                state[key] = vi
            continue
        key, kind = _flax_path_to_torch(path, depths)
        if kind == "conv" and v.ndim == 4:
            v = v.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        elif kind == "linear" and v.ndim == 2:
            v = v.T
        state[key] = v
    return state


def torch_state_to_flax_params(state: Dict[str, np.ndarray], example_params):
    """torch state dict -> flax param tree shaped like ``example_params``.

    ``example_params``: an initialized param tree (from ``model.init``) that
    provides the target structure and shapes. Raises on missing/mismatched
    entries so checkpoint conversion is strict, like the reference's
    ``load_state_dict(strict=True)`` (``custom_video_test.py:36``).
    """
    import jax

    inner = example_params.get("params", example_params)
    flat = {path: v for path, v in _flatten(inner)}
    depths = _imnet_depths(list(flat))
    new_flat = {}
    used = set()

    def fetch(path, old_shape):
        key, kind = _flax_path_to_torch(path, depths)
        if key not in state:
            raise KeyError(f"checkpoint missing key {key} (for {'/'.join(path)})")
        v = np.asarray(state[key], dtype=np.float32)
        if kind == "conv" and v.ndim == 4:
            v = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        elif kind == "linear" and v.ndim == 2:
            v = v.T
        if v.shape != old_shape:
            raise ValueError(
                f"shape mismatch for {key}: checkpoint {v.shape} vs model "
                f"{old_shape}"
            )
        used.add(key)
        return v

    for path, old in flat.items():
        if "blocks" in path:  # scanned trunk: stack the per-block torch keys
            j = path.index("blocks")
            pre, post = path[:j], path[j + 2:]
            n = np.shape(old)[0]
            new_flat[path] = np.stack([
                fetch(pre + (f"block{i}",) + post, np.shape(old)[1:])
                for i in range(n)
            ])
        else:
            new_flat[path] = fetch(path, np.shape(old))
    unused = set(state) - used
    if unused:
        # The reference checkpoint has no extra keys; report strictly.
        raise KeyError(f"unconverted checkpoint keys: {sorted(unused)[:8]} ...")

    def rebuild(tree, prefix=()):
        return {
            k: rebuild(v, prefix + (k,)) if isinstance(v, dict) else new_flat[prefix + (k,)]
            for k, v in tree.items()
        }

    rebuilt = rebuild(inner)
    if hasattr(example_params, "get") and "params" in example_params:
        return {"params": rebuilt}
    return rebuilt


def load_pth_checkpoint(path: str, example_params):
    """Load a reference ``.pth`` (torch state dict) into a flax param tree.

    Strips a leading ``module.`` DataParallel prefix like the reference loader
    (``codes/models/base_model.py:93-98``).
    """
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    state = {}
    for k, v in raw.items():
        if k.startswith("module."):
            k = k[len("module."):]
        state[k] = v.numpy()
    return torch_state_to_flax_params(state, example_params)
