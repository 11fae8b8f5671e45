"""ScanNet .sens binary extraction: color/depth/pose/intrinsics per frame.

Reference: datasets/scannet/reader.py:30-94 + SensorData.py — parses the
ScanNet SensorData binary and writes color jpgs, depth pngs, pose txts and
intrinsic txts in the layout the dataset loader expects.
"""
from __future__ import annotations

import argparse
import os
import struct
import zlib
from typing import BinaryIO, Iterator, Tuple

import numpy as np

COMPRESSION_COLOR = {-1: "unknown", 0: "raw", 1: "png", 2: "jpeg"}
COMPRESSION_DEPTH = {-1: "unknown", 0: "raw_ushort", 1: "zlib_ushort",
                     2: "occi_ushort"}


def _read_matrix(f: BinaryIO) -> np.ndarray:
    return np.asarray(struct.unpack("f" * 16, f.read(16 * 4)),
                      np.float32).reshape(4, 4)


class SensReader:
    """Streaming .sens parser (version 4)."""

    def __init__(self, path: str):
        self.f = open(path, "rb")
        f = self.f
        self.version = struct.unpack("I", f.read(4))[0]
        strlen = struct.unpack("Q", f.read(8))[0]
        self.sensor_name = f.read(strlen).decode("ascii", "ignore")
        self.intrinsic_color = _read_matrix(f)
        self.extrinsic_color = _read_matrix(f)
        self.intrinsic_depth = _read_matrix(f)
        self.extrinsic_depth = _read_matrix(f)
        self.color_compression = COMPRESSION_COLOR[
            struct.unpack("i", f.read(4))[0]]
        self.depth_compression = COMPRESSION_DEPTH[
            struct.unpack("i", f.read(4))[0]]
        self.color_width, self.color_height = struct.unpack("II", f.read(8))
        self.depth_width, self.depth_height = struct.unpack("II", f.read(8))
        self.depth_shift = struct.unpack("f", f.read(4))[0]
        self.num_frames = struct.unpack("Q", f.read(8))[0]

    def frames(self) -> Iterator[Tuple[np.ndarray, bytes, np.ndarray]]:
        """Yields (pose 4x4, color bytes (jpeg), depth uint16 [H, W])."""
        for _ in range(self.num_frames):
            pose = _read_matrix(self.f)
            _ts_color, _ts_depth = struct.unpack("QQ", self.f.read(16))
            color_len, depth_len = struct.unpack("QQ", self.f.read(16))
            color = self.f.read(color_len)
            depth_raw = self.f.read(depth_len)
            if self.depth_compression == "zlib_ushort":
                depth_raw = zlib.decompress(depth_raw)
            depth = np.frombuffer(depth_raw, np.uint16).reshape(
                self.depth_height, self.depth_width)
            yield pose, color, depth

    def close(self):
        self.f.close()


def extract(path: str, out_dir: str, frame_skip: int = 1):
    """Write the standard layout: color/N.jpg, depth/N.png, pose/N.txt,
    intrinsic/intrinsic_{color,depth}.txt."""
    import cv2

    r = SensReader(path)
    for sub in ("color", "depth", "pose", "intrinsic"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    np.savetxt(os.path.join(out_dir, "intrinsic", "intrinsic_color.txt"),
               r.intrinsic_color)
    np.savetxt(os.path.join(out_dir, "intrinsic", "intrinsic_depth.txt"),
               r.intrinsic_depth)
    for i, (pose, color, depth) in enumerate(r.frames()):
        if i % frame_skip:
            continue
        with open(os.path.join(out_dir, "color", f"{i}.jpg"), "wb") as f:
            f.write(color)
        cv2.imwrite(os.path.join(out_dir, "depth", f"{i}.png"), depth)
        np.savetxt(os.path.join(out_dir, "pose", f"{i}.txt"), pose)
    r.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--filename", required=True)
    ap.add_argument("--output_path", required=True)
    ap.add_argument("--frame_skip", type=int, default=1)
    args = ap.parse_args()
    extract(args.filename, args.output_path, args.frame_skip)


if __name__ == "__main__":
    main()
