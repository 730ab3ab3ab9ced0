from nonrigid_nerf_tpu.ops.pallas.fused_query import (
    fused_point_query, fused_point_query_split, pack_fused_weights,
    supports_fused_query)

__all__ = ["fused_point_query", "fused_point_query_split",
           "pack_fused_weights", "supports_fused_query"]
