from .sharded import make_obs_mesh, sharded_pose_gn_step, sharded_ba_normal_equations

__all__ = ["make_obs_mesh", "sharded_pose_gn_step", "sharded_ba_normal_equations"]
