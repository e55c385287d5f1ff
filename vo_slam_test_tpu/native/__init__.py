"""Native (C++) runtime components, consumed via ctypes.

Currently: the threaded RGB-D dataset loader (dataloader.cpp) — the only
host-side compute in the pipeline worth taking off the Python thread.
"""

from .loader import NativeTumLoader, native_available

__all__ = ["NativeTumLoader", "native_available"]
