from . import pattern, pyramid, fast, gaussian, orientation, brief, undistort, hamming

__all__ = ["pattern", "pyramid", "fast", "gaussian", "orientation", "brief", "undistort", "hamming"]
