"""Extract the public-domain ORB rBRIEF sampling pattern (bit_pattern_31_,
originally from OpenCV, vendored by the reference at ORBextractor.cpp:154-412)
into a .npy data table. Data constants only — no code is copied.

Usage: python tools/extract_orb_pattern.py /root/reference/src/ORBextractor.cpp
"""
import re
import sys

import numpy as np

src = open(sys.argv[1]).read()
start = src.index("bit_pattern_31_")
end = src.index("};", start)
body = src[start:end].split("=", 1)[1]
body = re.sub(r"/\*.*?\*/", "", body, flags=re.S)  # strip block comments
body = re.sub(r"//.*", "", body)                     # strip line comments
nums = [int(n) for n in re.findall(r"-?\d+", body)]
assert len(nums) == 1024, len(nums)
arr = np.array(nums, dtype=np.int32).reshape(256, 4)
assert arr.min() >= -13 and arr.max() <= 13, (arr.min(), arr.max())
np.save("vo_slam_test_tpu/ops/data/orb_pattern.npy", arr)
print("saved", arr.shape, "first rows:", arr[:3].tolist(), "range", arr.min(), arr.max())
