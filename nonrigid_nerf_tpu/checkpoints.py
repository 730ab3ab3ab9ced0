"""Self-describing experiment checkpoints with auto-resume.

Mirrors the reference's torch.save archive (reference: train.py:1668-1705):
step, all network params, optimizer state, the stacked latent codes, the
per-view intrinsics, scene metadata (near/far/volume extent), and the
dataset mappings — so inference needs only the experiment folder
(reference: free_viewpoint_rendering.py:18-74).

Formats (selected by path extension; `load_checkpoint` dispatches, so call
sites never care which one wrote a checkpoint):

- `<name>.npz` (default): every array leaf under a flattened key, plus a
  `__meta__` JSON payload with the tree structure and the non-array extras.
- `<name>.orbax` (opt-in, train.py `--checkpoint_format orbax`): the SAME
  flattened leaves stored through Orbax/TensorStore (the JAX-ecosystem
  checkpoint layer — zarr chunked storage, natively extendable to sharded
  global arrays), with the same meta JSON as a sidecar. Both formats
  restore bit-identically because they share the flatten/unflatten layer.

`latest.<ext>` is rewritten at every save; numbered `{step:06d}.<ext>`
archives are kept at major milestones — matching the reference's
latest.tar / numbered-tar policy.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree, prefix="") -> Dict[str, Any]:
    out = {}
    if isinstance(tree, dict):
        for key in sorted(tree):
            out.update(_flatten(tree[key], f"{prefix}d:{key}/"))
    elif isinstance(tree, (list, tuple)):
        tag = "l" if isinstance(tree, list) else "t"
        if hasattr(tree, "_fields"):  # namedtuple
            out[prefix + "__namedtuple__"] = {
                "cls": type(tree).__name__, "fields": list(tree._fields)}
            for name, val in zip(tree._fields, tree):
                out.update(_flatten(val, f"{prefix}n:{name}/"))
        else:
            out[prefix + "__len__"] = {"tag": tag, "n": len(tree)}
            for i, val in enumerate(tree):
                out.update(_flatten(val, f"{prefix}{tag}:{i}/"))
    else:
        out[prefix.rstrip("/")] = tree
    return out


def _split_tree(step, params, opt_state, extras):
    tree = {"params": params}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    flat = _flatten(tree)

    arrays = {}
    structure = {}
    for key, val in flat.items():
        if isinstance(val, dict):          # structural marker
            structure[key] = val
        else:
            arrays[key] = np.asarray(val)

    meta = {
        "step": int(step),
        "structure": structure,
        "extras": extras or {},
        "format_version": 1,
    }
    return arrays, meta


def save_checkpoint(path: str, step: int, params, opt_state=None,
                    extras: Optional[dict] = None) -> None:
    """Write one checkpoint (atomically via rename). `.orbax` paths go
    through the Orbax/TensorStore backend, anything else is an npz file."""
    if path.endswith(".orbax"):
        return _save_orbax(path, step, params, opt_state, extras)
    arrays, meta = _split_tree(step, params, opt_state, extras)
    tmp = path + ".tmp.npz"
    np.savez(tmp, __meta__=np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8), **arrays)
    os.replace(tmp, path)


def _save_orbax(path: str, step: int, params, opt_state=None,
                extras: Optional[dict] = None) -> None:
    """Orbax-backed save: one `<path>/tree` Orbax checkpoint holding the
    flattened leaves + `<path>/meta.json`. The flat keys use '/' as the
    separator, which Orbax would treat as nesting — stored as '.' (no tree
    key of ours contains a dot; asserted)."""
    import shutil

    import orbax.checkpoint as ocp

    arrays, meta = _split_tree(step, params, opt_state, extras)
    for key in arrays:
        assert "." not in key, f"flat key {key!r} clashes with the " \
                               "orbax separator substitution"

    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    ocp.PyTreeCheckpointer().save(
        os.path.join(tmp, "tree"),
        {k.replace("/", "."): v for k, v in arrays.items()})
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta, f)
    # directory swap: os.replace cannot atomically replace a non-empty
    # directory, so retire the old one first (numbered archives and the
    # auto-resume scan cover the tiny crash window)
    old = path + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(path):
        os.replace(path, old)
    os.replace(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def _unflatten(arrays: Dict[str, np.ndarray], structure: Dict[str, dict]):
    # reassemble the tree from the flattened keys
    root: Dict[str, Any] = {}

    def insert(container, parts, value):
        head = parts[0]
        if len(parts) == 1:
            container[head] = value
            return
        container = container.setdefault(head, {})
        insert(container, parts[1:], value)

    for key, val in list(arrays.items()) + list(structure.items()):
        insert(root, key.split("/"), val)

    def materialize(node):
        if not isinstance(node, dict):
            return node
        if "__namedtuple__" in node:
            info = node.pop("__namedtuple__")
            children = {k.split(":", 1)[1]: materialize(v)
                        for k, v in node.items()}
            # generic namedtuple reconstruction as a tuple-like; optax states
            # accept plain tuples structurally via tree_unflatten at restore
            import collections
            nt = collections.namedtuple(info["cls"], info["fields"])
            return nt(*[children[f] for f in info["fields"]])
        if "__len__" in node:
            info = node.pop("__len__")
            items = [None] * info["n"]
            for k, v in node.items():
                items[int(k.split(":", 1)[1])] = materialize(v)
            return items if info["tag"] == "l" else tuple(items)
        return {k.split(":", 1)[1]: materialize(v) for k, v in node.items()}

    return materialize(root)


def load_checkpoint(path: str) -> Tuple[int, Any, Any, dict]:
    """Returns (step, params, opt_state_tree_or_None, extras).

    The optimizer state is returned as a plain pytree with the same
    *structure values*; use `restore_opt_state` to rebuild the exact optax
    state classes against a template.
    """
    if path.endswith(".orbax"):
        import orbax.checkpoint as ocp
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        restored = ocp.PyTreeCheckpointer().restore(
            os.path.join(path, "tree"))
        arrays = {k.replace(".", "/"): np.asarray(v)
                  for k, v in restored.items()}
    else:
        with np.load(path, allow_pickle=False) as data:
            meta = json.loads(bytes(data["__meta__"].tobytes()).decode())
            arrays = {k: data[k] for k in data.files if k != "__meta__"}
    tree = _unflatten(arrays, meta["structure"])
    params = tree.get("params")
    opt_state = tree.get("opt_state")
    return meta["step"], params, opt_state, meta.get("extras", {})


def restore_opt_state(template, loaded):
    """Pour loaded leaves into the exact optax state structure of `template`."""
    leaves_t, treedef = jax.tree_util.tree_flatten(template)
    leaves_l = jax.tree_util.tree_leaves(loaded)
    if len(leaves_t) != len(leaves_l):
        raise ValueError(
            f"optimizer state mismatch: {len(leaves_t)} leaves expected, "
            f"{len(leaves_l)} found in checkpoint")
    return jax.tree_util.tree_unflatten(treedef, leaves_l)


def find_checkpoints(logdir: str):
    """All checkpoints in a log dir, sorted so the newest is last
    (reference auto-resume scan: train.py:666-694)."""
    if not os.path.isdir(logdir):
        return []
    ckpts = [f for f in os.listdir(logdir)
             if (f.endswith(".npz") and not f.endswith(".tmp.npz"))
             or (f.endswith(".orbax")
                 and os.path.isdir(os.path.join(logdir, f)))]

    def sort_key(name):
        stem = name.rsplit(".", 1)[0]
        if stem == "latest":
            return (1, 0)
        m = re.match(r"(\d+)$", stem)
        return (0, int(m.group(1))) if m else (-1, 0)

    return [os.path.join(logdir, f) for f in sorted(ckpts, key=sort_key)]


def latest_checkpoint(logdir: str) -> Optional[str]:
    ckpts = find_checkpoints(logdir)
    if not ckpts:
        return None
    # prefer latest.npz if present, else highest numbered
    return ckpts[-1]
