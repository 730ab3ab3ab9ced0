import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nonrigid_nerf_tpu.preprocessing.poses import gen_poses  # noqa: F401
