"""Dataset readers and trajectory IO (TUM / EuRoC / KITTI formats).

Counterpart of the reference's dataset plumbing: utils/dirreader.h +
inputreader for image streams, tests/kitti2tum_log.cpp for KITTI ground
truth conversion, and the TUM-format trajectory logs consumed by
tests/logtools.cpp. Parsers are format-faithful so real benchmark data
drops in unchanged; `write_synthetic_tum` renders a synthetic sequence
into an on-disk TUM-style dataset so the CLI apps can be exercised
end-to-end without network access.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np


# ----------------------------------------------------------------------
# Trajectory IO (TUM format: t tx ty tz qx qy qz qw)
# ----------------------------------------------------------------------


def _rot_to_quat(R: np.ndarray) -> np.ndarray:
    """(3,3) -> (qx, qy, qz, qw)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        qw = 0.25 * s
        qx = (R[2, 1] - R[1, 2]) / s
        qy = (R[0, 2] - R[2, 0]) / s
        qz = (R[1, 0] - R[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
        q = np.zeros(4)
        q[i] = 0.25 * s
        q[3] = (R[k, j] - R[j, k]) / s
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        qx, qy, qz, qw = q
    return np.asarray([qx, qy, qz, qw])


def _quat_to_rot(q: np.ndarray) -> np.ndarray:
    x, y, z, w = q
    n = x * x + y * y + z * z + w * w
    s = 2.0 / n if n > 0 else 0.0
    return np.asarray(
        [
            [1 - s * (y * y + z * z), s * (x * y - z * w), s * (x * z + y * w)],
            [s * (x * y + z * w), 1 - s * (x * x + z * z), s * (y * z - x * w)],
            [s * (x * z - y * w), s * (y * z + x * w), 1 - s * (x * x + y * y)],
        ]
    )


def save_trajectory_tum(path: str, stamps, poses_f2g) -> None:
    """Write camera-to-world poses in TUM format (the evaluation format)."""
    with open(path, "w") as f:
        for t, T in zip(stamps, poses_f2g):
            R = T[:3, :3]
            tr = T[:3, 3]
            c = -R.T @ tr  # camera center
            q = _rot_to_quat(R.T)  # camera-to-world rotation
            f.write(
                f"{t:.6f} {c[0]:.6f} {c[1]:.6f} {c[2]:.6f} "
                f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n"
            )


def load_trajectory_tum(path: str):
    """-> (stamps (N,), centers (N, 3), quats (N, 4))."""
    stamps, centers, quats = [], [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = line.split()
            if len(v) < 8:
                continue
            stamps.append(float(v[0]))
            centers.append([float(x) for x in v[1:4]])
            quats.append([float(x) for x in v[4:8]])
    return np.asarray(stamps), np.asarray(centers), np.asarray(quats)


def associate_trajectories(stamps_a, stamps_b, max_dt: float = 0.02):
    """Nearest-stamp association (the TUM benchmark associate step)."""
    pairs = []
    j = 0
    for i, ta in enumerate(stamps_a):
        while j + 1 < len(stamps_b) and abs(stamps_b[j + 1] - ta) <= abs(stamps_b[j] - ta):
            j += 1
        if len(stamps_b) and abs(stamps_b[j] - ta) <= max_dt:
            pairs.append((i, j))
    return pairs


# ----------------------------------------------------------------------
# TUM RGB-D directory layout
# ----------------------------------------------------------------------


@dataclass
class TumSequence:
    root: str
    rgb: list  # (stamp, relpath)
    depth: list  # (stamp, relpath)
    gt: tuple | None  # (stamps, centers, quats)

    @classmethod
    def open(cls, root: str) -> "TumSequence":
        def read_list(name):
            out = []
            p = os.path.join(root, name)
            if not os.path.exists(p):
                return out
            with open(p) as f:
                for line in f:
                    line = line.strip()
                    if not line or line.startswith("#"):
                        continue
                    v = line.split()
                    out.append((float(v[0]), v[1]))
            return out

        gt = None
        gtp = os.path.join(root, "groundtruth.txt")
        if os.path.exists(gtp):
            gt = load_trajectory_tum(gtp)
        return cls(root, read_list("rgb.txt"), read_list("depth.txt"), gt)

    def __len__(self):
        return len(self.rgb)

    def read_rgb(self, i: int) -> np.ndarray:
        import cv2

        return cv2.imread(os.path.join(self.root, self.rgb[i][1]), cv2.IMREAD_UNCHANGED)

    def read_depth_for(self, i: int) -> np.ndarray | None:
        if not self.depth:
            return None
        import cv2

        stamp = self.rgb[i][0]
        j = int(np.argmin([abs(s - stamp) for s, _ in self.depth]))
        if abs(self.depth[j][0] - stamp) > 0.05:
            return None
        return cv2.imread(
            os.path.join(self.root, self.depth[j][1]), cv2.IMREAD_UNCHANGED
        )


def write_synthetic_tum(seq, root: str, depth: bool = False) -> None:
    """Render a SyntheticSequence into a TUM-style dataset directory."""
    import cv2

    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    if depth:
        os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(seq.n_frames):
        stamp = i / 30.0
        img = np.clip(seq.render(i), 0, 255).astype(np.uint8)
        rel = f"rgb/{stamp:.6f}.png"
        cv2.imwrite(os.path.join(root, rel), img)
        rgb_lines.append(f"{stamp:.6f} {rel}")
        T = seq.gt_pose(i)
        c = -T[:3, :3].T @ T[:3, 3]
        q = _rot_to_quat(T[:3, :3].T)
        gt_lines.append(
            f"{stamp:.6f} {c[0]:.6f} {c[1]:.6f} {c[2]:.6f} "
            f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}"
        )
    with open(os.path.join(root, "rgb.txt"), "w") as f:
        f.write("# synthetic\n" + "\n".join(rgb_lines) + "\n")
    with open(os.path.join(root, "groundtruth.txt"), "w") as f:
        f.write("# synthetic gt\n" + "\n".join(gt_lines) + "\n")


# ----------------------------------------------------------------------
# KITTI odometry poses (kitti2tum_log.cpp equivalent)
# ----------------------------------------------------------------------


def load_kitti_poses(path: str) -> np.ndarray:
    """KITTI pose file (N lines x 12 floats, row-major 3x4 cam-to-world)."""
    rows = []
    with open(path) as f:
        for line in f:
            v = [float(x) for x in line.split()]
            if len(v) == 12:
                rows.append(np.asarray(v).reshape(3, 4))
    return np.stack(rows)


def kitti_to_tum(poses: np.ndarray, stamps=None):
    """(N, 3, 4) cam-to-world -> TUM tuple (stamps, centers, quats)."""
    n = len(poses)
    stamps = np.arange(n) * 0.1 if stamps is None else stamps
    centers = poses[:, :, 3]
    quats = np.stack([_rot_to_quat(P[:, :3]) for P in poses])
    return np.asarray(stamps), centers, quats
