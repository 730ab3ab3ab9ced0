"""Export a trained experiment's renderer as a self-contained StableHLO
serving artifact (see nonrigid_nerf_tpu/serving.py).

    python tools/export_serving.py --input experiments/my_scene \
        --out my_scene.stablehlo [--chunk 32768] [--platforms cpu,tpu]

The artifact bakes the trained weights into the graph; `<out>.meta.json`
carries the calling convention and the per-timestep latent table. Serving
needs only jax:

    from jax import export
    fn = export.deserialize(open("my_scene.stablehlo","rb").read()).call
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="experiment folder")
    p.add_argument("--out", required=True, help="output .stablehlo path")
    p.add_argument("--chunk", type=int, default=32768,
                   help="rays per call (fixed block shape)")
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering targets, e.g. cpu,tpu "
                        "(default: current backend)")
    # scene edits baked into the artifact (same semantics as the FVR CLI)
    p.add_argument("--forced_background_stabilization", type=float,
                   default=None)
    p.add_argument("--motion_factor", type=float, default=None)
    p.add_argument("--foreground_removal", type=float, default=None)
    p.add_argument("--render_canonical", action="store_true")
    args = p.parse_args(argv)

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from free_viewpoint_rendering import load_experiment
    from nonrigid_nerf_tpu.config import (EditConfig,
                                          model_config_from_args,
                                          render_settings_from_args)
    from nonrigid_nerf_tpu.serving import export_renderer, save_exported

    exp_args, params, extras = load_experiment(args.input)
    near = float(extras["scripts_dict"]["near"])
    far = float(extras["scripts_dict"]["far"])
    cfg = model_config_from_args(exp_args)
    rs = render_settings_from_args(exp_args, near, far)
    edit = EditConfig(
        rigidity_test_time_cutoff=args.forced_background_stabilization,
        test_time_scaling=args.motion_factor,
        nonrigid_object_removal_threshold=args.foreground_removal,
        render_canonical=args.render_canonical)

    platforms = args.platforms.split(",") if args.platforms else None
    blob, meta = export_renderer(
        params, cfg, rs, chunk=args.chunk, platforms=platforms, edit=edit,
        extra_meta={"experiment": os.path.abspath(args.input),
                    "edit": {k: v for k, v in vars(edit).items()
                             if v not in (None, False)}})
    save_exported(args.out, blob, meta)
    print(json.dumps({"out": args.out, "bytes": len(blob),
                      "chunk": meta["chunk"],
                      "latent_size": meta["latent_size"],
                      "platforms": meta["platforms"]}))


if __name__ == "__main__":
    main()
