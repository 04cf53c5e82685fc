"""Distribution layer: spatial tiling, multi-host, disparity sharding."""

from fsgm_tpu.parallel.tiled import stereo_sgm_sharded
from fsgm_tpu.parallel.tiled_flow import flow_fsgm_sharded
from fsgm_tpu.parallel.disparity_sharded import stereo_sgm_dsharded
from fsgm_tpu.parallel.multihost import (init_distributed, global_mesh,
                                         weak_scaling_report)

__all__ = [
    "stereo_sgm_sharded", "flow_fsgm_sharded", "stereo_sgm_dsharded",
    "init_distributed", "global_mesh", "weak_scaling_report",
]
