"""Checkpoint interop with the PyTorch reference implementation.

The reference persists experiments as torch.save archives
(reference train.py:1668-1705):

    {"global_step", "network_fn_state_dict", "network_fine_state_dict",
     "ray_bender_state_dict", "optimizer_state_dict",
     "ray_bending_latent_codes",            # (timesteps, latent) tensor
     "intrinsics", "scripts_dict", "dataset_extras"}

This module converts those archives to/from our self-describing npz
checkpoints (checkpoints.py) — including the Adam moments, so a user of
the reference can move a half-trained experiment here and *continue
training* (or render with free_viewpoint_rendering.py), and can take an
experiment trained here back to the reference's tooling.

Weight-layout contract: torch nn.Linear stores (out, in) weights; our
dense layers store w as (in, out) — every weight transposes on the way
through. The reference's optimizer flattens parameters in grad_vars
order (reference train.py:560-633): per-timestep latents, then
ray_bender.parameters(), then model.parameters(), then
model_fine.parameters(); within an nn.Module, registration order
(pts_linears, views_linears, feature/alpha/rgb or output_linear — note
views_linears is registered even when use_viewdirs=False, an unused
Linear that still occupies optimizer slots).

torch is imported lazily: the module is importable (and everything but
the tar codec usable) without it.
"""

from __future__ import annotations

import os
import warnings
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def _require_torch():
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "reference-checkpoint interop needs torch (CPU is enough) to "
            "read/write the reference's torch.save archives") from e
    return torch


# ---------------------------------------------------------------------------
# structure inference


def describe_reference_tar(ckpt: dict) -> dict:
    """Infer the model configuration from a reference checkpoint's state-dict
    shapes. Returns a dict of the config-relevant facts; heuristics that can
    be ambiguous (time_conditioned_baseline) are resolved by integer
    divisibility of the positional-encoding width and flagged in the result.
    """
    sd = ckpt["network_fn_state_dict"]
    depth = max(int(k.split(".")[1])
                for k in sd if k.startswith("pts_linears.")) + 1
    width = int(sd["pts_linears.0.weight"].shape[0])
    in_total = int(sd["pts_linears.0.weight"].shape[1])
    skips = [i for i in range(depth - 1)
             if int(sd[f"pts_linears.{i + 1}.weight"].shape[1]) != width]

    use_viewdirs = "feature_linear.weight" in sd
    input_ch_views = 0
    if use_viewdirs:
        input_ch_views = int(sd["views_linears.0.weight"].shape[1]) - width

    latents = ckpt.get("ray_bending_latent_codes")
    n_timesteps, latent_size = (0, 0) if latents is None else (
        int(latents.shape[0]), int(latents.shape[1]))
    has_bender = ckpt.get("ray_bender_state_dict") is not None

    # positional encoding width: 3 raw + 3*2*multires. If (in_total-3) is not
    # divisible by 6, the latent must be concatenated into the MLP input —
    # the time-conditioned naive baseline (reference run_nerf_helpers.py:
    # 207-209). If both readings divide evenly the plain reading wins (the
    # baseline is an ablation mode; ambiguity is flagged).
    def _multires(embed_width):
        return (embed_width - 3) // 6 if (embed_width - 3) % 6 == 0 else None

    time_conditioned = False
    ambiguous = False
    multires = _multires(in_total)
    if not has_bender and latent_size > 0:
        plain, baseline = _multires(in_total), _multires(
            in_total - latent_size)
        if plain is None and baseline is not None:
            time_conditioned, multires = True, baseline
        elif plain is not None and baseline is not None:
            ambiguous = True
            multires = plain
        elif plain is None and baseline is None:
            raise ValueError(
                f"cannot interpret pts_linears input width {in_total} as "
                f"positional encoding (with or without a {latent_size}-wide "
                "latent)")

    info = {
        "netdepth": depth, "netwidth": width, "skips": skips,
        "use_viewdirs": use_viewdirs, "input_ch_views": input_ch_views,
        "multires": multires,
        "multires_views": ((input_ch_views - 3) // 6 if use_viewdirs else 4),
        "has_fine": ckpt.get("network_fine_state_dict") is not None,
        "has_bender": has_bender,
        "n_timesteps": n_timesteps, "latent_size": latent_size,
        "time_conditioned_baseline": time_conditioned,
        "baseline_ambiguous": ambiguous,
        "output_ch": (None if use_viewdirs
                      else int(sd["output_linear.weight"].shape[0])),
        "global_step": int(ckpt.get("global_step", 0)),
    }
    if info["has_fine"]:
        fsd = ckpt["network_fine_state_dict"]
        info["netdepth_fine"] = max(
            int(k.split(".")[1])
            for k in fsd if k.startswith("pts_linears.")) + 1
        info["netwidth_fine"] = int(fsd["pts_linears.0.weight"].shape[0])
    if has_bender:
        bsd = ckpt["ray_bender_state_dict"]
        info["bending_depth"] = max(
            int(k.split(".")[1])
            for k in bsd if k.startswith("network.")) + 1
        info["bending_width"] = int(bsd["network.0.weight"].shape[0])
        info["rigidity_depth"] = max(
            int(k.split(".")[1])
            for k in bsd if k.startswith("rigidity_network.")) + 1
    return info


# ---------------------------------------------------------------------------
# tar -> params


def _lin_from_sd(sd, name: str) -> dict:
    """One torch Linear -> our {'w': (in,out), 'b': (out,)} layer dict."""
    layer = {"w": np.ascontiguousarray(
        sd[f"{name}.weight"].detach().cpu().numpy().T)}
    bkey = f"{name}.bias"
    if bkey in sd:
        layer["b"] = sd[bkey].detach().cpu().numpy().copy()
    return layer


def _net_from_sd(sd, depth: int, use_viewdirs: bool) -> dict:
    net = {"pts": [_lin_from_sd(sd, f"pts_linears.{i}")
                   for i in range(depth)]}
    if use_viewdirs:
        net["feature"] = _lin_from_sd(sd, "feature_linear")
        net["alpha"] = _lin_from_sd(sd, "alpha_linear")
        net["views"] = [_lin_from_sd(sd, "views_linears.0")]
        net["rgb"] = _lin_from_sd(sd, "rgb_linear")
    else:
        net["output"] = _lin_from_sd(sd, "output_linear")
    return net


def params_from_reference_tar(ckpt: dict) -> Tuple[dict, dict]:
    """Convert a loaded reference tar dict to our params pytree.

    Returns (params, info). Weights come out bit-exact (transpose only).
    """
    import jax.numpy as jnp

    info = describe_reference_tar(ckpt)
    params: Dict[str, Any] = {
        "coarse": _net_from_sd(ckpt["network_fn_state_dict"],
                               info["netdepth"], info["use_viewdirs"])}
    if info["has_fine"]:
        params["fine"] = _net_from_sd(ckpt["network_fine_state_dict"],
                                      info["netdepth_fine"],
                                      info["use_viewdirs"])
    if info["has_bender"]:
        bsd = ckpt["ray_bender_state_dict"]
        params["bender"] = {
            "bend": [_lin_from_sd(bsd, f"network.{i}")
                     for i in range(info["bending_depth"])],
            "rigidity": [_lin_from_sd(bsd, f"rigidity_network.{i}")
                         for i in range(info["rigidity_depth"])],
        }
    lat = ckpt.get("ray_bending_latent_codes")
    params["latents"] = (
        np.zeros((0, 0), np.float32) if lat is None
        else lat.detach().cpu().numpy().copy())
    params = {k: _tree_to_jnp(v, jnp) for k, v in params.items()}
    return params, info


def _tree_to_jnp(tree, jnp):
    if isinstance(tree, dict):
        return {k: _tree_to_jnp(v, jnp) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_tree_to_jnp(v, jnp) for v in tree]
    return jnp.asarray(tree)


# ---------------------------------------------------------------------------
# optimizer-slot ordering


def _net_slot_paths(prefix: str, depth: int, use_viewdirs: bool,
                    has_bias=lambda path: True) -> List[Optional[tuple]]:
    """Tree paths of one NeRF net's parameters in torch registration order.
    None marks a torch slot with no counterpart in our tree (the unused
    views_linears when use_viewdirs=False)."""
    paths: List[Optional[tuple]] = []
    for i in range(depth):
        paths += [(prefix, "pts", i, "w"), (prefix, "pts", i, "b")]
    if use_viewdirs:
        paths += [(prefix, "views", 0, "w"), (prefix, "views", 0, "b")]
        paths += [(prefix, "feature", "w"), (prefix, "feature", "b"),
                  (prefix, "alpha", "w"), (prefix, "alpha", "b"),
                  (prefix, "rgb", "w"), (prefix, "rgb", "b")]
    else:
        paths += [None, None]  # views_linears.0.{weight,bias}: unused slots
        paths += [(prefix, "output", "w"), (prefix, "output", "b")]
    return paths


def reference_optimizer_slots(params: dict, info: dict
                              ) -> List[Optional[tuple]]:
    """Tree paths in the reference's optimizer-slot order (grad_vars,
    reference train.py:560-633). Latent t is ('latents', t) — one slot per
    timestep row. A path's last element 'w' means the torch tensor is the
    transpose of our leaf."""
    slots: List[Optional[tuple]] = [
        ("latents", t) for t in range(info["n_timesteps"])]
    if info["has_bender"]:
        for i, layer in enumerate(params["bender"]["bend"]):
            slots.append(("bender", "bend", i, "w"))
            if "b" in layer:
                slots.append(("bender", "bend", i, "b"))
        for i, layer in enumerate(params["bender"]["rigidity"]):
            slots.append(("bender", "rigidity", i, "w"))
            if "b" in layer:
                slots.append(("bender", "rigidity", i, "b"))
    slots += _net_slot_paths("coarse", info["netdepth"],
                             info["use_viewdirs"])
    if info["has_fine"]:
        slots += _net_slot_paths("fine", info["netdepth_fine"],
                                 info["use_viewdirs"])
    return slots


def _get_leaf(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def _set_leaf(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


# ---------------------------------------------------------------------------
# tar -> optax state


def opt_state_from_reference_tar(ckpt: dict, params: dict, info: dict,
                                 optimizer):
    """Rebuild the optax Adam state from the reference's torch Adam state.

    torch Adam stores per-parameter (step, exp_avg, exp_avg_sq); optax
    scale_by_adam keeps one shared count plus mu/nu trees. The moments map
    one-to-one (both sides store pre-bias-correction EMAs with the same
    b1/b2/eps); count is taken from global_step. Parameters whose torch
    state differs in per-param step (latents only receive gradients on
    steps that sample their timestep, so their torch step lags
    global_step) resume with a slightly larger bias-correction
    denominator than the reference would apply — the difference decays
    geometrically (b2^step) and is zero for any checkpoint trained past
    ~10k steps. Missing torch state (parameters that never received a
    gradient, e.g. untouched latents) becomes zero moments — exactly
    torch's lazy-init behavior.
    """
    import jax
    import jax.numpy as jnp

    opt_state = optimizer.init(params)
    torch_state = ckpt["optimizer_state_dict"]["state"]
    slots = reference_optimizer_slots(params, info)

    mu = jax.tree_util.tree_map(lambda x: np.zeros_like(np.asarray(x)),
                                params)
    nu = jax.tree_util.tree_map(lambda x: np.zeros_like(np.asarray(x)),
                                params)

    def to_np(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else \
            np.asarray(t)

    n_orphan = 0
    for idx, path in enumerate(slots):
        st = torch_state.get(idx, torch_state.get(str(idx)))
        if st is None:
            continue
        if path is None:
            # the reference's unused views_linears slots: their state is
            # all-zero unless something unexpected trained them
            if float(np.abs(to_np(st["exp_avg"])).max()) > 0:
                n_orphan += 1
            continue
        m, v = to_np(st["exp_avg"]), to_np(st["exp_avg_sq"])
        if path[0] == "latents":
            mu["latents"][path[1]] = m
            nu["latents"][path[1]] = v
        elif path[-1] == "w":
            _set_leaf(mu, path, np.ascontiguousarray(m.T))
            _set_leaf(nu, path, np.ascontiguousarray(v.T))
        else:
            _set_leaf(mu, path, m)
            _set_leaf(nu, path, v)
    if n_orphan:
        warnings.warn(
            f"{n_orphan} torch optimizer slot(s) with nonzero moments have "
            "no counterpart here (the reference's unused views_linears); "
            "their state was dropped")

    count = jnp.asarray(info["global_step"], jnp.int32)
    new_states = []
    for st in opt_state:
        fields = getattr(st, "_fields", ())
        rep = {}
        if "count" in fields:
            rep["count"] = count
        if "mu" in fields:
            rep["mu"] = jax.tree_util.tree_map(
                lambda z, src: jnp.asarray(src, z.dtype), st.mu, mu)
        if "nu" in fields:
            rep["nu"] = jax.tree_util.tree_map(
                lambda z, src: jnp.asarray(src, z.dtype), st.nu, nu)
        new_states.append(st._replace(**rep) if rep else st)
    return tuple(new_states)


# ---------------------------------------------------------------------------
# params -> tar (export)


def _sd_from_net(net: dict, use_viewdirs: bool, torch):
    """Our net tree -> a torch state_dict, synthesizing the reference's
    always-registered views_linears for non-viewdirs nets (unused by its
    forward pass; fresh default-init values, required only so
    load_state_dict(strict=True) succeeds)."""
    sd = {}

    def put(name, layer):
        sd[f"{name}.weight"] = torch.tensor(
            np.ascontiguousarray(np.asarray(layer["w"], np.float32).T))
        if "b" in layer:
            sd[f"{name}.bias"] = torch.tensor(
                np.asarray(layer["b"], np.float32))

    for i, layer in enumerate(net["pts"]):
        put(f"pts_linears.{i}", layer)
    if use_viewdirs:
        put("views_linears.0", net["views"][0])
        put("feature_linear", net["feature"])
        put("alpha_linear", net["alpha"])
        put("rgb_linear", net["rgb"])
    else:
        width = int(np.asarray(net["pts"][0]["w"]).shape[1])
        filler = torch.nn.Linear(width, width // 2)
        sd["views_linears.0.weight"] = filler.weight.detach()
        sd["views_linears.0.bias"] = filler.bias.detach()
        put("output_linear", net["output"])
    return sd


def export_reference_tar(path: str, params: dict, step: int,
                         opt_state=None, extras: Optional[dict] = None,
                         lrate: Optional[float] = None) -> dict:
    """Write our training state as a reference-compatible torch archive.

    The produced tar loads into the reference's create_nerf
    (load_state_dict strict, optimizer.load_state_dict) so an experiment
    trained here can be rendered — or continued — with the reference's
    own tooling. Returns the dict that was saved (for tests).
    """
    torch = _require_torch()
    info = _info_from_params(params)
    out = {
        "global_step": int(step),
        "network_fn_state_dict": _sd_from_net(
            params["coarse"], info["use_viewdirs"], torch),
        "network_fine_state_dict": (
            _sd_from_net(params["fine"], info["use_viewdirs"], torch)
            if info["has_fine"] else None),
        "ray_bender_state_dict": None,
        "ray_bending_latent_codes": torch.tensor(
            np.asarray(params["latents"], np.float32)),
    }
    if info["has_bender"]:
        bsd = {}
        for group, prefix in (("bend", "network"),
                              ("rigidity", "rigidity_network")):
            for i, layer in enumerate(params["bender"][group]):
                bsd[f"{prefix}.{i}.weight"] = torch.tensor(
                    np.ascontiguousarray(
                        np.asarray(layer["w"], np.float32).T))
                if "b" in layer:
                    bsd[f"{prefix}.{i}.bias"] = torch.tensor(
                        np.asarray(layer["b"], np.float32))
        out["ray_bender_state_dict"] = bsd

    out["optimizer_state_dict"] = _torch_opt_state(
        params, info, opt_state, step, lrate, torch)

    extras = extras or {}
    intr = extras.get("intrinsics", {})
    out["intrinsics"] = ({int(k): dict(v) for k, v in intr.items()}
                         if isinstance(intr, dict) else intr)
    out["scripts_dict"] = dict(extras.get("scripts_dict", {}))
    out["dataset_extras"] = dict(extras.get("dataset_extras", {}))
    torch.save(out, path)
    return out


def _info_from_params(params: dict) -> dict:
    """The slot-ordering facts, derived from our own params tree."""
    coarse = params["coarse"]
    info = {
        "netdepth": len(coarse["pts"]),
        "use_viewdirs": "views" in coarse,
        "has_fine": "fine" in params,
        "has_bender": "bender" in params,
        "n_timesteps": int(np.asarray(params["latents"]).shape[0]),
    }
    if info["has_fine"]:
        info["netdepth_fine"] = len(params["fine"]["pts"])
    return info


def _torch_opt_state(params, info, opt_state, step, lrate, torch):
    """Our optax Adam state -> a torch Adam state_dict (zeros if None)."""
    import jax

    mu = nu = None
    if opt_state is not None:
        for st in jax.tree_util.tree_leaves(
                opt_state, is_leaf=lambda x: hasattr(x, "_fields")):
            if hasattr(st, "_fields") and "mu" in st._fields:
                mu, nu = st.mu, st.nu
                break
    slots = reference_optimizer_slots(params, info)
    state = {}
    for idx, path in enumerate(slots):
        if path is None:
            continue  # unused views_linears: torch lazily inits if needed
        if mu is None:
            m = v = np.zeros_like(np.asarray(_get_leaf(params, path)
                                             if path[0] != "latents"
                                             else params["latents"][path[1]],
                                             dtype=np.float32))
        elif path[0] == "latents":
            m = np.asarray(mu["latents"][path[1]], np.float32)
            v = np.asarray(nu["latents"][path[1]], np.float32)
        else:
            m = np.asarray(_get_leaf(mu, path), np.float32)
            v = np.asarray(_get_leaf(nu, path), np.float32)
        if path[-1] == "w":
            m, v = np.ascontiguousarray(m.T), np.ascontiguousarray(v.T)
        state[idx] = {
            "step": torch.tensor(float(step)),
            "exp_avg": torch.tensor(m),
            "exp_avg_sq": torch.tensor(v),
        }
    group = {
        "params": list(range(len(slots))),
        "lr": (5e-4 if lrate is None else float(lrate)),
        "betas": (0.9, 0.999), "eps": 1e-8, "weight_decay": 0,
        "amsgrad": False, "maximize": False, "foreach": None,
        "capturable": False, "differentiable": False, "fused": None,
    }
    return {"state": state, "param_groups": [group]}


# ---------------------------------------------------------------------------
# experiment-level drivers


def load_reference_tar(path: str) -> dict:
    """torch.load the reference archive (CPU). The tar embeds pickled
    python metadata (intrinsics/scripts_dict), so weights_only must stay
    off — only convert checkpoints you trained or trust."""
    torch = _require_torch()
    return torch.load(path, map_location="cpu", weights_only=False)


def find_reference_checkpoint(exp_dir: str) -> str:
    """Newest tar under <exp_dir>/logs (the reference resumes from the
    last of the sorted list, train.py:666-679; its numbered saves also
    copy to latest.tar, making lexicographic max correct)."""
    logdir = os.path.join(exp_dir, "logs")
    tars = sorted(f for f in os.listdir(logdir) if ".tar" in f)
    if not tars:
        raise FileNotFoundError(f"no .tar checkpoints under {logdir}")
    return os.path.join(logdir, tars[-1])


def convert_reference_args(src_path: str, overrides: Optional[dict] = None
                           ) -> "Any":
    """Reference logs/args.txt -> our Args. Flag names are shared by
    design (config.py mirrors the reference's parser); reference-only
    keys (dead flags like no_batching) are dropped with a warning."""
    from nonrigid_nerf_tpu.config import DEFAULTS, Args, parse_config_file

    raw = parse_config_file(src_path)
    dropped = sorted(k for k in raw if k not in DEFAULTS)
    kept = {k: v for k, v in raw.items() if k in DEFAULTS}
    if dropped:
        warnings.warn("dropped reference-only args: " + ", ".join(dropped))
    kept.update(overrides or {})
    return Args(**kept)


def _json_safe_extras(ckpt: dict) -> dict:
    """The tar's metadata payload, filtered to what our npz meta can hold
    (mirrors train.py checkpoint_extras: scalars/strings/lists only)."""
    def clean(v):
        if isinstance(v, (bool, int, float, str)) or v is None:
            return v
        if isinstance(v, (np.integer, np.floating)):
            return v.item()
        if isinstance(v, (list, tuple)):
            out = [clean(x) for x in v]
            return out if all(x is not None for x in out) else None
        if isinstance(v, dict):
            return {str(k): clean(vv) for k, vv in v.items()
                    if clean(vv) is not None}
        if isinstance(v, np.ndarray) and v.size <= 64:
            return v.tolist()
        return None

    extras = {}
    intr = ckpt.get("intrinsics")
    if intr is not None:
        items = intr.items() if isinstance(intr, dict) else enumerate(intr)
        extras["intrinsics"] = {
            str(k): {kk: clean(vv) for kk, vv in v.items()}
            for k, v in items}
    for key in ("scripts_dict", "dataset_extras"):
        val = ckpt.get(key)
        if isinstance(val, dict):
            extras[key] = {k: clean(v) for k, v in val.items()
                           if clean(v) is not None}
    return extras


def import_reference_experiment(src: str, out_dir: str,
                                with_optimizer: bool = True,
                                overrides: Optional[dict] = None) -> dict:
    """Convert a reference experiment folder (or a single tar) into an
    experiment folder ours can resume/render:

        <out_dir>/logs/args.txt   (converted flags, rootdir/expname
                                   rewritten to out_dir)
        <out_dir>/logs/latest.npz (params [+ Adam state] + metadata)

    Returns a summary dict (step, info, paths).
    """
    from nonrigid_nerf_tpu.checkpoints import save_checkpoint
    from nonrigid_nerf_tpu.config import train_config_from_args
    from nonrigid_nerf_tpu.engine.train_state import make_optimizer

    if os.path.isdir(src):
        tar_path = find_reference_checkpoint(src)
        args_path = os.path.join(src, "logs", "args.txt")
    else:
        tar_path, args_path = src, None

    ckpt = load_reference_tar(tar_path)
    params, info = params_from_reference_tar(ckpt)
    if info.get("baseline_ambiguous"):
        warnings.warn(
            "latent width divides evenly into the MLP input either way; "
            "assuming NOT time_conditioned_baseline (pass args.txt or "
            "overrides={'time_conditioned_baseline': True} to force)")

    out_logs = os.path.join(out_dir, "logs")
    os.makedirs(out_logs, exist_ok=True)

    ov = dict(overrides or {})
    ov.setdefault("rootdir", os.path.dirname(os.path.abspath(out_dir)))
    ov.setdefault("expname", os.path.basename(os.path.abspath(out_dir)))
    # the source args.txt often carries the flags its ORIGINAL launch used
    # (no_reload=True for a fresh run, ft_path=... for fine-tuning); an
    # imported experiment must load the converted checkpoint, not skip it
    ov.setdefault("no_reload", False)
    ov.setdefault("ft_path", None)
    if args_path is not None and os.path.exists(args_path):
        args = convert_reference_args(args_path, ov)
        if info.get("baseline_ambiguous") and getattr(
                args, "time_conditioned_baseline", False):
            # args.txt resolves the width ambiguity the other way
            info["time_conditioned_baseline"] = True
            info["multires"] = (info["multires"] * 6 + 3
                                - info["latent_size"] - 3) // 6
        _check_args_against_info(args, info)
    else:
        args = _args_from_info(info, ov)
    args.dump(os.path.join(out_logs, "args.txt"))

    opt_state = None
    if with_optimizer and ckpt.get("optimizer_state_dict") is not None:
        optimizer = make_optimizer(train_config_from_args(args))
        opt_state = opt_state_from_reference_tar(ckpt, params, info,
                                                 optimizer)

    npz_path = os.path.join(out_logs, "latest.npz")
    save_checkpoint(npz_path, info["global_step"], params, opt_state,
                    _json_safe_extras(ckpt))
    return {"step": info["global_step"], "info": info,
            "checkpoint": npz_path, "args": args,
            "source_tar": tar_path}


def _check_args_against_info(args, info) -> None:
    """args.txt and the state-dict shapes must describe the same model."""
    checks = [
        ("netdepth", args.netdepth, info["netdepth"]),
        ("netwidth", args.netwidth, info["netwidth"]),
        ("use_viewdirs", bool(args.use_viewdirs), info["use_viewdirs"]),
        ("multires", args.multires, info["multires"]),
        ("N_importance>0", args.N_importance > 0, info["has_fine"]),
        ("ray_bending", args.ray_bending not in (None, "None"),
         info["has_bender"]),
        # skips is not a reference flag (hard-coded [4]); compare the
        # EFFECTIVE skip set (entries beyond the layer count never fire)
        ("skips",
         sorted(s for s in getattr(args, "skips", (4,))
                if 0 <= s < args.netdepth - 1),
         info["skips"]),
    ]
    bad = [f"{name}: args={a!r} checkpoint={b!r}"
           for name, a, b in checks if a != b]
    if bad:
        raise ValueError("args.txt does not match the checkpoint: "
                         + "; ".join(bad))


def _args_from_info(info, overrides):
    """Synthesize a minimal Args when no args.txt accompanies the tar."""
    from nonrigid_nerf_tpu.config import Args

    kw = {
        "netdepth": info["netdepth"], "netwidth": info["netwidth"],
        "use_viewdirs": info["use_viewdirs"],
        "multires": info["multires"] or 10,
        "multires_views": info["multires_views"],
        "N_importance": (64 if info["has_fine"] else 0),
        "ray_bending": ("simple_neural" if info["has_bender"] else None),
        "ray_bending_latent_size": info["latent_size"],
        "time_conditioned_baseline": info["time_conditioned_baseline"],
    }
    if info["has_fine"]:
        kw["netdepth_fine"] = info["netdepth_fine"]
        kw["netwidth_fine"] = info["netwidth_fine"]
    kw.update(overrides)
    return Args(**kw)


def export_experiment(exp_dir: str, out_tar: str,
                      with_optimizer: bool = True) -> dict:
    """Our experiment folder -> a reference-format tar (+ the reference's
    args.txt next to it if out_tar sits in a logs/ directory)."""
    from nonrigid_nerf_tpu.checkpoints import (latest_checkpoint,
                                               load_checkpoint)
    from nonrigid_nerf_tpu.config import (Args, parse_config_file,
                                          train_config_from_args)
    from nonrigid_nerf_tpu.engine.train_state import lr_schedule

    logdir = os.path.join(exp_dir, "logs")
    ckpt_path = latest_checkpoint(logdir)
    if ckpt_path is None:
        raise FileNotFoundError(f"no checkpoint under {logdir}")
    step, params, opt_state, extras = load_checkpoint(ckpt_path)
    params.pop("quant", None)  # inference-only int8 pack, not a reference leaf

    lrate = None
    args_path = os.path.join(logdir, "args.txt")
    if os.path.exists(args_path):
        args = Args(**parse_config_file(args_path))
        # the lr the reference would have set after its last completed step
        lrate = float(lr_schedule(train_config_from_args(args))(step))
    export_reference_tar(out_tar, params, step,
                         opt_state if with_optimizer else None,
                         extras, lrate)
    return {"step": step, "tar": out_tar, "source": ckpt_path}
