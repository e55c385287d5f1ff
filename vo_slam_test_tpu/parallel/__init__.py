from .sharded import (
    make_obs_mesh,
    sharded_ba_normal_equations,
    sharded_ba_schur_step,
    sharded_pose_gn_step,
)

__all__ = [
    "make_obs_mesh",
    "sharded_pose_gn_step",
    "sharded_ba_normal_equations",
    "sharded_ba_schur_step",
]
