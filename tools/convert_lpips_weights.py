#!/usr/bin/env python
"""Convert the official `lpips` package checkpoint (AlexNet backbone) into
the framework's `data/lpips_alex.npz` weight file.

Run once on any machine that has the torch `lpips` package installed
(`pip install lpips`); the output file is what
`nonrigid_nerf_tpu.utils.lpips_jax` loads (schema: `weight_spec()` there).

    python tools/convert_lpips_weights.py [--out data/lpips_alex.npz]

Reference eval protocol analog: free_viewpoint_rendering.py:790-797,846-855
(the reference clones PerceptualSimilarity for the same weights).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def convert(out_path: str) -> None:
    import lpips  # noqa: requires `pip install lpips` (torch)
    model = lpips.LPIPS(net="alex")

    from nonrigid_nerf_tpu.utils.lpips_jax import weight_spec

    weights = {}
    slices = [model.net.slice1, model.net.slice2, model.net.slice3,
              model.net.slice4, model.net.slice5]
    for i, sl in enumerate(slices):
        convs = [m for m in sl.modules()
                 if m.__class__.__name__ == "Conv2d"]
        assert len(convs) == 1, f"slice{i + 1}: expected 1 conv, got {convs}"
        weights[f"conv{i}_w"] = convs[0].weight.detach().numpy()
        weights[f"conv{i}_b"] = convs[0].bias.detach().numpy()
    for i, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()     # (1, C, 1, 1)
        weights[f"lin{i}_w"] = w.reshape(-1)

    for key, shape in weight_spec().items():
        assert weights[key].shape == tuple(shape), \
            f"{key}: {weights[key].shape} != {shape}"

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    np.savez(out_path, **{k: v.astype(np.float32)
                          for k, v in weights.items()})
    print(f"wrote {out_path} "
          f"({sum(v.size for v in weights.values()) * 4 / 1e6:.1f} MB)")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "data", "lpips_alex.npz"))
    convert(parser.parse_args().out)
