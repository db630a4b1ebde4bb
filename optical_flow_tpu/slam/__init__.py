"""Tracking/SLAM backend (north-star extension, SURVEY.md section 7.7).

The pipeline the reference could never reach: dense/sparse LK -> feature
tracks -> pose estimation (track/pose.py) -> keyframes + 3D map -> bundle
adjustment, with the map point blocks sharded across devices and the
reduced camera system assembled by `psum` over the mesh (the classic
distributed Schur-complement pattern).
"""

from optical_flow_tpu.slam.ba import (
    BAProblem,
    bundle_adjust,
    project,
    reprojection_rmse,
    sharded_bundle_adjust,
)
from optical_flow_tpu.slam.descriptors import (
    match_descriptors,
    ncc_scores,
    patch_descriptors,
    verify_tracks,
)
from optical_flow_tpu.slam.epipolar import (
    EssentialRansacConfig,
    estimate_essential,
    five_point,
    five_point_batch,
    normalize_pixels,
    ransac_essential_5pt,
    recover_pose,
    refine_pose,
    triangulate,
)
from optical_flow_tpu.slam.frontend import TwoViewReconstruction, two_view_reconstruct
from optical_flow_tpu.slam.incremental import SlamResult, incremental_slam
from optical_flow_tpu.slam.pnp import pnp_dlt, pnp_ransac
from optical_flow_tpu.slam.pose_graph import (
    PoseGraph,
    Sim3PoseGraph,
    measure_loop_sim3,
    place_descriptor,
    propose_loop_candidates,
    relative_pose,
    relocalize,
    thumbnail_descriptor,
    umeyama_alignment,
    verify_loop_closure,
)
from optical_flow_tpu.slam.imu import (
    preintegrate,
    visual_inertial_alignment,
)
from optical_flow_tpu.slam.vi_ba import (
    VIBAProblem,
    group_imu_by_keyframes,
    refine_slam_with_imu,
    refine_with_imu,
    sharded_vi_bundle_adjust,
    vi_bundle_adjust,
    vi_problem_from_ba,
)
from optical_flow_tpu.slam.stereo import (
    dense_depth,
    dense_disparity,
    split_sbs,
    stereo_backproject,
    stereo_match,
)
from optical_flow_tpu.slam.window import WindowedBA

__all__ = [
    "preintegrate",
    "visual_inertial_alignment",
    "VIBAProblem",
    "group_imu_by_keyframes",
    "refine_slam_with_imu",
    "refine_with_imu",
    "sharded_vi_bundle_adjust",
    "vi_bundle_adjust",
    "vi_problem_from_ba",
    "dense_depth",
    "dense_disparity",
    "split_sbs",
    "stereo_backproject",
    "stereo_match",
    "WindowedBA",
    "BAProblem",
    "bundle_adjust",
    "project",
    "reprojection_rmse",
    "sharded_bundle_adjust",
    "match_descriptors",
    "ncc_scores",
    "patch_descriptors",
    "verify_tracks",
    "EssentialRansacConfig",
    "estimate_essential",
    "five_point",
    "five_point_batch",
    "ransac_essential_5pt",
    "normalize_pixels",
    "recover_pose",
    "refine_pose",
    "triangulate",
    "TwoViewReconstruction",
    "SlamResult",
    "incremental_slam",
    "two_view_reconstruct",
    "pnp_dlt",
    "pnp_ransac",
    "PoseGraph",
    "Sim3PoseGraph",
    "measure_loop_sim3",
    "place_descriptor",
    "propose_loop_candidates",
    "relative_pose",
    "relocalize",
    "thumbnail_descriptor",
    "umeyama_alignment",
    "verify_loop_closure",
]
