"""Mesh extraction + export (host side).

Reference: utils.py:224-288 (tsdf2mesh / tsdf_panoptic2mesh via marching
cubes) and utils.py:318-388 (SaveScene incremental/eval export). Marching
cubes stays on host (skimage), as in the reference.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

# 20-class color palette for panoptic meshes (stable hues per class)
_PALETTE = np.array([
    [200, 200, 200], [174, 199, 232], [152, 223, 138], [31, 119, 180],
    [255, 187, 120], [188, 189, 34], [140, 86, 75], [255, 152, 150],
    [214, 39, 40], [197, 176, 213], [148, 103, 189], [196, 156, 148],
    [23, 190, 207], [247, 182, 210], [219, 219, 141], [255, 127, 14],
    [158, 218, 229], [44, 160, 44], [112, 128, 144], [227, 119, 194],
    [82, 84, 163],
], np.uint8)


def marching_cubes(tsdf: np.ndarray, level: float = 0.0):
    """verts, faces, normals from a TSDF volume (skimage)."""
    from skimage import measure

    verts, faces, norms, _ = measure.marching_cubes(tsdf, level=level)
    return verts, faces, norms


def tsdf_to_mesh(tsdf: np.ndarray, origin: np.ndarray, voxel_size: float):
    """World-space mesh from a dense TSDF (reference utils.py:224-230)."""
    verts, faces, norms = marching_cubes(tsdf)
    verts = verts * voxel_size + origin[None, :]
    return verts, faces, norms


def panoptic_vertex_colors(verts_vox: np.ndarray, labels: np.ndarray,
                           kind: str = "semantic") -> np.ndarray:
    """Color mesh vertices by nearest-voxel semantic/instance label
    (reference utils.py:232-288 tsdf_panoptic2mesh)."""
    idx = np.clip(np.round(verts_vox).astype(int), 0,
                  np.array(labels.shape) - 1)
    lab = labels[idx[:, 0], idx[:, 1], idx[:, 2]]
    if kind == "semantic":
        return _PALETTE[np.clip(lab, 0, len(_PALETTE) - 1)]
    # instance: hash ids to palette
    return _PALETTE[1 + (lab * 2654435761 % (len(_PALETTE) - 1)).astype(int)]


def write_ply(path: str, verts: np.ndarray, faces: np.ndarray,
              colors: Optional[np.ndarray] = None):
    """Minimal binary-less PLY writer (reference fusion.py meshwrite)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for i, v in enumerate(verts):
            if colors is not None:
                c = colors[i]
                f.write(f"{v[0]:.4f} {v[1]:.4f} {v[2]:.4f} {c[0]} {c[1]} {c[2]}\n")
            else:
                f.write(f"{v[0]:.4f} {v[1]:.4f} {v[2]:.4f}\n")
        for face in faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")


def save_scene(result, out_dir: str, save_mesh: bool = True,
               save_npz: bool = True):
    """Persist a finished scene (reference utils.py:362-388 save_scene_eval):
    .npz volumes + plain/semantic/instance-colored meshes."""
    os.makedirs(out_dir, exist_ok=True)
    if save_npz:
        np.savez_compressed(
            os.path.join(out_dir, f"{result.name}.npz"),
            origin=result.origin, voxel_size=result.voxel_size,
            tsdf=result.tsdf, instance=result.instance,
            semantic=result.semantic)
    if save_mesh and (np.abs(result.tsdf) < 1).any():
        verts_vox, faces, _ = marching_cubes(result.tsdf)
        verts = verts_vox * result.voxel_size + result.origin[None, :]
        write_ply(os.path.join(out_dir, f"{result.name}.ply"), verts, faces)
        sem_c = panoptic_vertex_colors(verts_vox, result.semantic, "semantic")
        write_ply(os.path.join(out_dir, f"{result.name}_semantic.ply"),
                  verts, faces, sem_c)
        ins_c = panoptic_vertex_colors(verts_vox, result.instance, "instance")
        write_ply(os.path.join(out_dir, f"{result.name}_instance.ply"),
                  verts, faces, ins_c)
