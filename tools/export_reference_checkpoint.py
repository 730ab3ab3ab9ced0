#!/usr/bin/env python
"""Export an experiment trained here as a PyTorch-reference checkpoint tar
(the torch.save schema of reference train.py:1668-1705), loadable by the
reference's create_nerf / free_viewpoint_rendering tooling.

    python tools/export_reference_checkpoint.py OUR_EXPDIR OUT_TAR
        [--no_optimizer]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nonrigid_nerf_tpu.interop import export_experiment  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("exp", help="experiment dir (with logs/latest.npz)")
    p.add_argument("out", help="output .tar path")
    p.add_argument("--no_optimizer", action="store_true",
                   help="export weights only (zero Adam state)")
    a = p.parse_args(argv)

    summary = export_experiment(a.exp, a.out,
                                with_optimizer=not a.no_optimizer)
    print(f"exported step {summary['step']} from {summary['source']}")
    print(f"  -> {summary['tar']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
