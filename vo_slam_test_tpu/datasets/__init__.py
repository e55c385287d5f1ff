from .tum import TumDataset, read_associate, write_trajectory_tum
from .synthetic import SyntheticRGBD

__all__ = ["TumDataset", "read_associate", "write_trajectory_tum", "SyntheticRGBD"]
