"""Whole-system checkpointing: save/load maps and session state.

Counterpart of the reference serialization (SURVEY.md §3.5):
Map::saveToFile with magic number (map.cpp:342-354), symmetric load
validating the magic, UcoSlam::saveToFile of full session state —
documented safe only in sequential mode (ucoslam.h:73). Content is stored
as an .npz of the MapState arrays + JSON metadata (params, arenas,
counters); signatures survive the roundtrip.
"""

from __future__ import annotations

import io
import json
import zipfile

import numpy as np
import jax.numpy as jnp

from ucoslam_tpu.config import Params
from ucoslam_tpu.mapping.map import Map, MapState

MAGIC = 225237123  # same magic as the reference map files (map.cpp:342)
FORMAT_VERSION = 1


def save_map(
    world_map: Map,
    path: str,
    extra_meta: dict | None = None,
    extra_arrays: dict | None = None,
) -> None:
    """`extra_meta` (JSON) and `extra_arrays` (npz under extra/) carry the
    session state the reference serializes beyond the map itself
    (system.cpp:2865-3102: motion model, counters, KF database, extractor
    config)."""
    meta = {
        "magic": MAGIC,
        "version": FORMAT_VERSION,
        "params": world_map.params.to_dict(),
        "signature": world_map.signature(),
    }
    if extra_meta:
        meta["extra"] = extra_meta
    arrays = {f"state/{k}": np.asarray(v) for k, v in world_map.state._asdict().items()}
    arrays["arena/points"] = world_map.points.active
    arrays["arena/keyframes"] = world_map.keyframes.active
    arrays["arena/markers"] = world_map.markers.active
    for k, v in (extra_arrays or {}).items():
        arrays[f"extra/{k}"] = np.asarray(v)
    buf = io.BytesIO()
    np.savez_compressed(buf, **arrays)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as z:
        z.writestr("meta.json", json.dumps(meta))
        z.writestr("arrays.npz", buf.getvalue())


def load_map(path: str) -> Map:
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
        if meta.get("magic") != MAGIC:
            raise ValueError(f"not a map file (bad magic): {path}")
        npz = np.load(io.BytesIO(z.read("arrays.npz")))
        params = Params.from_dict(meta["params"])
        m = Map(params)
        state_kwargs = {
            k.split("/", 1)[1]: jnp.asarray(npz[k])
            for k in npz.files
            if k.startswith("state/")
        }
        m.state = MapState(**state_kwargs)
        m.points.sync_from_mask(npz["arena/points"])
        m.keyframes.sync_from_mask(npz["arena/keyframes"])
        m.markers.sync_from_mask(npz["arena/markers"])
        if m.signature() != meta["signature"]:
            raise ValueError("map signature mismatch after load")
        return m


def load_map_meta(path: str) -> dict:
    with zipfile.ZipFile(path) as z:
        return json.loads(z.read("meta.json"))


def load_map_extra_arrays(path: str) -> dict:
    """Session-state arrays stored under extra/ (empty for map-only files)."""
    with zipfile.ZipFile(path) as z:
        npz = np.load(io.BytesIO(z.read("arrays.npz")))
        return {
            k.split("/", 1)[1]: npz[k] for k in npz.files if k.startswith("extra/")
        }
