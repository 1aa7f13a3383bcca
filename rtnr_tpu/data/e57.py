"""E57 LiDAR-scan ingest.

Capability parity with the reference's libE57Format reader
(reference src/RTRenderer/src/PointCloudReader.cpp): multi-scan reads with
per-scan rigid transforms to world, cartesian AND spherical coordinates,
invalid-state filtering, color normalization against the scan's color
limits, and optional random skip decimation. Two deliberate divergences:

- The reference normalizes green and blue by the wrong ranges
  (colorBlueRange/colorRedRange mixups at PointCloudReader.cpp:262-263,
  281-282); we normalize each channel by its own range.
- Colors are RGB, not OpenCV BGR.

This environment has no E57 library; parsing the full ASTM E2807 binary
format (XML section + CRC-protected binary blobs + compressed vectors) is
out of scope for a from-scratch build, so this module defines the ingest
interface and converts the *decoded* per-scan arrays; `read_e57` raises a
clear error unless `pye57` is installed. The scan-level math
(spherical->cartesian, pose composition, color limits, invalid masks) is
implemented and tested here.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from rtnr_tpu.camera import pose_from_quat_trans


def spherical_to_cartesian(
    azimuth: np.ndarray, elevation: np.ndarray, rng: np.ndarray
) -> np.ndarray:
    """E57 spherical -> cartesian (reference PointCloudReader.cpp:275-277)."""
    ce = np.cos(elevation)
    return np.stack(
        [rng * np.cos(azimuth) * ce, rng * np.sin(azimuth) * ce, rng * np.sin(elevation)],
        axis=1,
    )


def normalize_colors(
    red: np.ndarray,
    green: np.ndarray,
    blue: np.ndarray,
    limits: Optional[Dict[str, float]] = None,
) -> np.ndarray:
    """Scale scanner color channels to uint8 against their recorded limits
    (reference PointCloudReader.cpp:207-213, 261-263 — with the per-channel
    range bug fixed: each channel divides by ITS OWN range)."""
    if limits is None:
        limits = {}

    def norm(c, lo_key, hi_key):
        lo = float(limits.get(lo_key, 0.0))
        hi = float(limits.get(hi_key, 255.0))
        rngv = hi - lo if hi > lo else 1.0
        return np.clip((c.astype(np.float64) - lo) * 255.0 / rngv, 0, 255)

    return np.stack(
        [
            norm(red, "colorRedMinimum", "colorRedMaximum"),
            norm(green, "colorGreenMinimum", "colorGreenMaximum"),
            norm(blue, "colorBlueMinimum", "colorBlueMaximum"),
        ],
        axis=1,
    ).astype(np.uint8)


def assemble_scan(
    scan: Dict[str, np.ndarray],
    color_limits: Optional[Dict[str, float]] = None,
    skip: int = 0,
    rng_seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode one scan's field arrays to filtered world-frame points+colors.

    ``scan`` fields (all optional unless noted): cartesianX/Y/Z or
    sphericalAzimuth/Elevation/Range, cartesianInvalidState,
    sphericalInvalidState, colorRed/Green/Blue, and ``pose`` as
    (qw,qx,qy,qz,tx,ty,tz). ``skip`` reproduces the reference's random
    decimation stride (PointCloudReader.cpp:256).
    """
    if "cartesianX" in scan:
        pts = np.stack(
            [scan["cartesianX"], scan["cartesianY"], scan["cartesianZ"]], axis=1
        ).astype(np.float64)
        inv = scan.get("cartesianInvalidState")
    elif "sphericalAzimuth" in scan:
        pts = spherical_to_cartesian(
            np.asarray(scan["sphericalAzimuth"], np.float64),
            np.asarray(scan["sphericalElevation"], np.float64),
            np.asarray(scan["sphericalRange"], np.float64),
        )
        inv = scan.get("sphericalInvalidState")
    else:
        raise ValueError("Scan has neither cartesian nor spherical coordinates")

    n = pts.shape[0]
    keep = np.ones(n, bool) if inv is None else (np.asarray(inv) == 0)

    if skip > 0:
        # random stride decimation (reference: i += rand() % skip + 1)
        r = np.random.default_rng(rng_seed)
        sel = np.zeros(n, bool)
        i = 0
        while i < n:
            sel[i] = True
            i += int(r.integers(1, skip + 1))
        keep &= sel

    if "colorRed" in scan:
        cols = normalize_colors(
            np.asarray(scan["colorRed"]),
            np.asarray(scan["colorGreen"]),
            np.asarray(scan["colorBlue"]),
            color_limits,
        )
    else:
        cols = np.zeros((n, 3), np.uint8)

    pose = scan.get("pose")
    if pose is not None:
        P = pose_from_quat_trans(*pose)
        pts = pts @ P[:3, :3].T + P[:3, 3]

    return pts[keep].astype(np.float32), cols[keep]


def read_e57(path: Union[str, Path]) -> Tuple[np.ndarray, np.ndarray]:
    """Read all scans of an .e57 file to world-frame (points, colors).

    Requires the optional ``pye57`` package for the low-level container
    decoding; everything above the raw field arrays goes through
    ``assemble_scan`` (tested without pye57).
    """
    try:
        import pye57  # type: ignore
    except ImportError as e:
        raise ImportError(
            "Reading .e57 requires the optional 'pye57' package, which is not "
            "installed in this environment. Convert the cloud to .ply, or use "
            "the npz scene cache."
        ) from e

    f = pye57.E57(str(path))
    all_pts: List[np.ndarray] = []
    all_cols: List[np.ndarray] = []
    for i in range(f.scan_count):
        header = f.get_header(i)
        data = f.read_scan_raw(i)
        scan = dict(data)
        try:
            rot = header.rotation  # quaternion (w, x, y, z)
            tr = header.translation
            scan["pose"] = (rot[0], rot[1], rot[2], rot[3], tr[0], tr[1], tr[2])
        except Exception:
            pass
        pts, cols = assemble_scan(scan)
        all_pts.append(pts)
        all_cols.append(cols)
    return np.concatenate(all_pts), np.concatenate(all_cols)
