"""Trajectory export/import in TUM format (timestamp tx ty tz qx qy qz qw).

The reference only publishes TF transforms to ROS (lidar_odometry.cc:596-602);
for offline evaluation (ATE vs a baseline) a file format is needed — TUM is the
standard consumed by evo/rpg trajectory evaluation tools.
"""

from __future__ import annotations

import numpy as np


def save_tum(path: str, trajectory) -> None:
    """trajectory: iterable of (t, pos (3,), quat wxyz (4,))."""
    with open(path, "w") as f:
        for t, pos, q in trajectory:
            f.write(
                f"{t:.9f} {pos[0]:.9f} {pos[1]:.9f} {pos[2]:.9f} "
                f"{q[1]:.9f} {q[2]:.9f} {q[3]:.9f} {q[0]:.9f}\n"
            )


def load_tum(path: str):
    """Returns list of (t, pos (3,), quat wxyz (4,))."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.split()]
            out.append((v[0], np.array(v[1:4]), np.array([v[7], v[4], v[5], v[6]])))
    return out
