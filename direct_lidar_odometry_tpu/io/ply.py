"""Minimal binary PLY point-cloud writer/reader for map export.

The reference publishes its map as a ROS PointCloud2 for RViz
(``map.cc:100-114``); offline, PLY is the interoperable equivalent
(CloudCompare/meshlab/Open3D all read it).
"""

from __future__ import annotations

import numpy as np

_HEADER = """ply
format binary_little_endian 1.0
element vertex {n}
property float x
property float y
property float z
end_header
"""


def write_ply(path: str, points: np.ndarray) -> None:
    points = np.ascontiguousarray(points[:, :3], dtype="<f4")
    with open(path, "wb") as f:
        f.write(_HEADER.format(n=len(points)).encode())
        f.write(points.tobytes())


def read_ply(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        n = int(
            [ln for ln in header.decode().splitlines() if ln.startswith("element vertex")][0]
            .split()[-1]
        )
        return np.frombuffer(f.read(n * 12), dtype="<f4").reshape(n, 3).copy()
