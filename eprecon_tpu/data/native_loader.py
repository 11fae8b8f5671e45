"""ctypes bindings for the native fragment loader (runtime/fragment_loader.cpp).

Threaded C++ JPEG/PNG decode + resize replacing the reference's
multiprocess DataLoader workers (reference main.py:130-151). Falls back to
cv2 decoding when the shared library hasn't been built
(`make -C runtime`).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "runtime",
                         "libfragment_loader.so")


def _load_lib() -> Optional[ctypes.CDLL]:
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path):
        # try building on the fly (toolchain is available in dev images)
        try:
            subprocess.run(["make", "-C", os.path.dirname(path)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.frag_loader_create.restype = ctypes.c_void_p
    lib.frag_loader_create.argtypes = [ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_float]
    lib.frag_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.frag_loader_submit.restype = ctypes.c_long
    lib.frag_loader_submit.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p)]
    lib.frag_loader_fetch.restype = ctypes.c_int
    lib.frag_loader_fetch.argtypes = [
        ctypes.c_void_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int]
    return lib


class NativeFragmentLoader:
    """Prefetching fragment image loader. submit() fragments ahead; fetch()
    returns (imgs [V,H,W,3] f32 BGR, depths [V,H,W] f32 m)."""

    def __init__(self, n_threads: int = 8, out_size: Tuple[int, int] = (640, 480),
                 max_depth: float = 3.0):
        self.out_w, self.out_h = out_size
        self.max_depth = max_depth
        self.lib = _load_lib()
        self.native = self.lib is not None
        if self.native:
            self.handle = self.lib.frag_loader_create(
                n_threads, self.out_w, self.out_h, ctypes.c_float(max_depth))
        self._py_tickets = {}
        self._next = 1

    def close(self):
        if self.native and self.handle:
            self.lib.frag_loader_destroy(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def submit(self, img_paths: List[str], depth_paths: Optional[List[str]] = None) -> int:
        n = len(img_paths)
        if self.native:
            arr_i = (ctypes.c_char_p * n)(*[p.encode() for p in img_paths])
            if depth_paths:
                arr_d = (ctypes.c_char_p * n)(*[p.encode() for p in depth_paths])
            else:
                arr_d = (ctypes.c_char_p * n)(*([b""] * n))
            return int(self.lib.frag_loader_submit(self.handle, n, arr_i, arr_d))
        ticket = self._next
        self._next += 1
        self._py_tickets[ticket] = (img_paths, depth_paths)
        return ticket

    def fetch(self, ticket: int, n_views: int) -> Tuple[np.ndarray, np.ndarray]:
        imgs = np.empty((n_views, self.out_h, self.out_w, 3), np.float32)
        depths = np.empty((n_views, self.out_h, self.out_w), np.float32)
        if self.native:
            rc = self.lib.frag_loader_fetch(
                self.handle, ticket,
                imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                depths.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                n_views)
            if rc != 0:
                raise IOError(f"fragment decode failed (rc={rc})")
            return imgs, depths
        # python fallback
        import cv2

        img_paths, depth_paths = self._py_tickets.pop(ticket)
        for i, p in enumerate(img_paths):
            im = cv2.imread(p).astype(np.float32)
            imgs[i] = cv2.resize(im, (self.out_w, self.out_h),
                                 interpolation=cv2.INTER_LINEAR)
            if depth_paths:
                d = cv2.imread(depth_paths[i], cv2.IMREAD_UNCHANGED)
                d = d.astype(np.float32) / 1000.0
                d[d > self.max_depth] = 0.0
                depths[i] = cv2.resize(d, (self.out_w, self.out_h),
                                       interpolation=cv2.INTER_NEAREST)
        return imgs, depths
