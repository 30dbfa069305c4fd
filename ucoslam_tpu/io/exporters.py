"""Map exporters: ArUco marker-map YAML and PMVS2 reconstruction input.

Counterparts of Map::saveToMarkerMap (map.cpp:1269-1286, writing the aruco
MarkerMap FileStorage layout, 3rdparty/aruco/aruco/markermap.cpp:66-93) and
utils/ucoslam_pmvs2.cpp (projection-matrix txt files + vis.dat covisibility
lists + option.txt for the CMVS-PMVS pipeline).
"""

from __future__ import annotations

import os

import numpy as np


def export_marker_map(world_map, path: str, dictionary: str = "ARUCO_MIP_36h12") -> int:
    """Write valid-pose markers as an aruco MarkerMap YAML (METERS).

    Returns the number of markers exported. Layout matches
    MarkerMap::saveToFile so the file loads in the reference aruco library.
    """
    import jax.numpy as jnp

    from ucoslam_tpu.markers.ippe import marker_object_points

    import cv2

    st = world_map.state
    mk_valid = np.asarray(st.mk_pose_valid)
    mk_id = np.asarray(st.mk_id)
    mk_pose = np.asarray(st.mk_pose)
    mk_size = np.asarray(st.mk_size)
    slots = np.nonzero(mk_valid & (mk_id >= 0))[0]

    fs = cv2.FileStorage(path, cv2.FILE_STORAGE_WRITE)
    fs.write("aruco_bc_dict", dictionary)
    fs.write("aruco_bc_nmarkers", int(len(slots)))
    fs.write("aruco_bc_mInfoType", 1)  # METERS
    fs.startWriteStruct("aruco_bc_markers", cv2.FILE_NODE_SEQ)
    for s in slots:
        obj = np.asarray(marker_object_points(jnp.float32(mk_size[s])))
        T = mk_pose[s]
        corners = obj @ T[:3, :3].T + T[:3, 3]  # get3DPoints (marker.h:44)
        fs.startWriteStruct("", cv2.FILE_NODE_MAP)
        fs.write("id", int(mk_id[s]))
        fs.startWriteStruct("corners", cv2.FILE_NODE_SEQ)
        for c in corners:
            fs.write("", c.astype(np.float64).reshape(1, 3))
        fs.endWriteStruct()
        fs.endWriteStruct()
    fs.endWriteStruct()
    fs.release()
    return len(slots)


def export_pmvs(world_map, cam, out_dir: str, images: dict | None = None) -> int:
    """Write PMVS2 input (txt/ projection matrices, vis.dat, option.txt,
    visualize/ undistorted keyframe images when `images` maps fseq->array).

    Counterpart utils/ucoslam_pmvs2.cpp: P = K[3x4] @ pose_f2g per keyframe,
    vis.dat from covisibility neighbours. Returns keyframe count.
    """
    os.makedirs(os.path.join(out_dir, "txt"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "visualize"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "models"), exist_ok=True)

    st = world_map.state
    slots = world_map.keyframes.active_slots()
    poses = np.asarray(st.kf_pose)[slots]
    fseqs = np.asarray(st.kf_fseq)[slots]
    K34 = np.zeros((3, 4), np.float32)
    K34[:3, :3] = np.asarray(cam.K)
    covis = world_map.covis_matrix()
    idx_of = {int(s): i for i, s in enumerate(slots)}

    for i, s in enumerate(slots):
        P = K34 @ poses[i]
        with open(os.path.join(out_dir, "txt", f"{i:08d}.txt"), "w") as f:
            f.write("CONTOUR\n")
            for r in range(3):
                f.write(" ".join(f"{P[r, c]:.9g}" for c in range(4)) + "\n")
        if images is not None and int(fseqs[i]) in images:
            import cv2

            img = images[int(fseqs[i])]
            if cam.has_distortion():
                img = cv2.undistort(
                    img, np.asarray(cam.K), np.asarray(cam.dist)
                )
            cv2.imwrite(os.path.join(out_dir, "visualize", f"{i:08d}.jpg"), img)

    with open(os.path.join(out_dir, "vis.dat"), "w") as f:
        f.write(f"VISDATA {len(slots)}\n")
        for i, s in enumerate(slots):
            nbrs = [
                idx_of[int(n)]
                for n in np.nonzero(covis[int(s)] > 0)[0]
                if int(n) != int(s) and int(n) in idx_of
            ]
            f.write(f"{i} " + " ".join(str(n) for n in nbrs) + "\n")

    with open(os.path.join(out_dir, "option.txt"), "w") as f:
        f.write(
            "level 2\ncsize 2\nthreshold 0.7\nwsize 7\nminImageNum 3\n"
            "CPU 4\nuseVisData 1\nsequence 1\n"
            f"timages -1 0 {len(slots)}\noimages 0\n"
        )
    return len(slots)
