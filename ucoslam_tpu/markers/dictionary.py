"""ArUco dictionary codewords + marker bitmap synthesis.

Counterpart of the reference's dictionary tables
(3rdparty/aruco/aruco/dictionary.cpp): codewords are loaded from the same
public dictionary data that backs the native detector
(native/aruco_mip_36h12.h) so rendering and detection agree bit-for-bit.
Used by the synthetic renderer to draw real, detectable markers into
images (the SPM marker-suite stand-in) without requiring cv2.aruco.
"""

from __future__ import annotations

import os
import re
from functools import lru_cache

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native"
)

#: dictionary name -> (header file, bits per side)
_DICTS = {
    "ARUCO_MIP_36h12": ("aruco_mip_36h12.h", 6),
    "ARUCO_MIP_16h3": ("aruco_mip_16h3.h", 4),
}


@lru_cache(maxsize=None)
def load_codewords(name: str = "ARUCO_MIP_36h12") -> np.ndarray:
    """(N,) uint64 codewords, row-major bits, MSB = top-left."""
    fname, _ = _DICTS[name]
    path = os.path.join(_NATIVE_DIR, fname)
    with open(path) as f:
        text = f.read()
    words = re.findall(r"0x([0-9a-fA-F]+)ULL", text)
    if not words:
        raise ValueError(f"no codewords found in {path}")
    return np.asarray([int(w, 16) for w in words], np.uint64)


def dict_bits(name: str = "ARUCO_MIP_36h12") -> int:
    return _DICTS[name][1]


def marker_bitmap(mid: int, name: str = "ARUCO_MIP_36h12") -> np.ndarray:
    """(n+2, n+2) uint8 0/1 grid: black border + n x n code bits.

    1 = white cell. Row 0 is the TOP of the marker.
    """
    words = load_codewords(name)
    n = dict_bits(name)
    code = int(words[mid])
    grid = np.zeros((n + 2, n + 2), np.uint8)
    for r in range(n):
        for c in range(n):
            bit = (code >> (n * n - 1 - (r * n + c))) & 1
            grid[r + 1, c + 1] = bit
    return grid


def marker_image(
    mid: int,
    px_per_cell: int = 8,
    quiet_cells: int = 1,
    name: str = "ARUCO_MIP_36h12",
) -> np.ndarray:
    """uint8 image of marker `mid`: white quiet zone + black border + bits.

    The *black border extent* is the physical marker size; the quiet zone
    extends it by `quiet_cells` white cells on each side (needed by any
    threshold-based detector to see the outer edge).
    """
    grid = marker_bitmap(mid, name)
    cells = np.pad(grid, quiet_cells, constant_values=1)
    img = np.kron(cells, np.ones((px_per_cell, px_per_cell), np.uint8)) * 255
    return img


def marker_texture(mid: int, px_per_cell: int = 8, quiet_cells: int = 1,
                   name: str = "ARUCO_MIP_36h12") -> tuple[np.ndarray, float]:
    """(texture float32 0..255, extent_ratio) for plane rasterization.

    extent_ratio = (total cells incl. quiet zone) / (marker cells): the
    rendered quad must be `extent_ratio` times the marker's physical size
    so the quiet zone has physical extent too.
    """
    n = dict_bits(name) + 2
    tex = marker_image(mid, px_per_cell, quiet_cells, name).astype(np.float32)
    return tex, (n + 2 * quiet_cells) / n
