"""Map inspection / export tool.

Counterpart of utils/ucoslam_map_export.cpp (+ the
ucoslam_map_removeunusedkeypoint tool): load a .slm map, print a summary,
export the point cloud (ply/pcd), optionally strip unused keypoints and
re-save.

Usage:
  python -m ucoslam_tpu.apps.map_export map.slm [--ply out.ply] [--pcd out.pcd]
      [--strip-unused resaved.slm]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    from ucoslam_tpu.io.serialize import load_map, save_map

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("map")
    ap.add_argument("--ply")
    ap.add_argument("--pcd")
    ap.add_argument("--strip-unused")
    args = ap.parse_args(argv)

    m = load_map(args.map)
    print(
        f"map: {m.n_points} points, {m.n_keyframes} keyframes, "
        f"{m.markers.n_active} markers, signature {m.signature():016x}"
    )
    if args.ply:
        m.export_pointcloud(args.ply)
        print(f"ply -> {args.ply}")
    if args.pcd:
        m.export_pointcloud(args.pcd)
        print(f"pcd -> {args.pcd}")
    if args.strip_unused:
        n = m.remove_unused_keypoints()
        save_map(m, args.strip_unused)
        print(f"stripped {n} unused keypoints -> {args.strip_unused}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
