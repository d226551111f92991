from loner_tpu.tracking.icp import (
    IcpConfig,
    IcpStage,
    build_voxel_grid,
    estimate_normals,
    icp_point_to_plane,
    nearest_neighbor,
)
from loner_tpu.tracking.tracker import Tracker, TrackerConfig
from loner_tpu.tracking.frame_synthesis import FrameSynthesis, FrameSynthesisConfig
