"""Label-transfer panoptic evaluation protocol (reference parity).

The reference exports predicted mesh labels per vertex
(/root/reference/tools/generate_semantic_instance.py:54-80) and the ScanNet
benchmark transfers them onto GT geometry by nearest neighbour before PQ.
transfer_labels_to_gt implements that transfer for voxel volumes; these tests
pin the protocol property that a geometrically offset but otherwise perfect
prediction still scores PQ ~= 1 (direct grid-intersection IoU scores ~0).
"""
import numpy as np
from eprecon_tpu.tools.evaluation_utils import (panoptic_quality,
                                                transfer_labels_to_gt)


def _scene():
    dim = (40, 40, 20)
    sem = np.zeros(dim, np.int32)
    ins = np.zeros(dim, np.int32)
    occ = np.zeros(dim, bool)
    occ[:, :, 2] = True          # floor slab: stuff, instance id = class id
    sem[:, :, 2] = 2
    ins[:, :, 2] = 2
    occ[5:12, 5:12, 3:8] = True  # thing A
    sem[5:12, 5:12, 3:8] = 4
    ins[5:12, 5:12, 3:8] = 3
    occ[20:30, 20:28, 3:10] = True  # thing B
    sem[20:30, 20:28, 3:10] = 6
    ins[20:30, 20:28, 3:10] = 4
    return occ, sem, ins


def _cls_map(seg, sem):
    return {int(i): int(np.bincount(sem[seg == i]).argmax())
            for i in np.setdiff1d(np.unique(seg), [0])}


def _pq(pred_sem, pred_ins, pred_origin, occ, ins, sem, gt_origin, vsz):
    sel = occ & (ins > 0)
    ps, pi = transfer_labels_to_gt(pred_sem, pred_ins, pred_origin, sel,
                                   gt_origin, vsz)
    gi, gs = ins[sel], sem[sel]
    return panoptic_quality(pi, _cls_map(pi, ps), gi, _cls_map(gi, gs))


def test_offset_prediction_scores_high():
    occ, sem, ins = _scene()
    # prediction: identical labels shifted one voxel in +x, thing ids renamed
    psem = np.zeros_like(sem)
    pins = np.zeros_like(ins)
    psem[1:] = sem[:-1]
    pins[1:] = np.where(ins[:-1] >= 3, ins[:-1] + 40, ins[:-1])
    m = _pq(psem, pins, np.zeros(3), occ, ins, sem, np.zeros(3), 0.1)
    assert m["tp"] == 3 and m["fp"] == 0 and m["fn"] == 0
    assert m["PQ"] > 0.9

    # same prediction expressed in a shifted volume frame (origin offset)
    m2 = _pq(psem, pins, np.array([0.5, 0.0, 0.0]), occ, ins, sem,
             np.array([0.3, 0.0, 0.0]), 0.1)
    assert m2["tp"] == 3


def test_wrong_class_is_not_matched():
    occ, sem, ins = _scene()
    psem = np.where(sem == 4, 6, sem)  # thing A predicted as wrong class
    m = _pq(psem, ins, np.zeros(3), occ, ins, sem, np.zeros(3), 0.1)
    assert m["tp"] == 2 and m["fn"] == 1 and m["fp"] == 1


def test_empty_prediction_scores_zero():
    occ, sem, ins = _scene()
    m = _pq(np.zeros_like(sem), np.zeros_like(ins), np.zeros(3),
            occ, ins, sem, np.zeros(3), 0.1)
    assert m["PQ"] == 0.0 and m["tp"] == 0


def test_far_prediction_is_void():
    occ, sem, ins = _scene()
    # one labeled voxel far above the scene: every GT voxel is beyond
    # max_dist, so the transferred labels stay void
    psem = np.zeros_like(sem)
    pins = np.zeros_like(ins)
    psem[0, 0, 19] = 4
    pins[0, 0, 19] = 9
    sel = occ & (ins > 0)
    ps, pi = transfer_labels_to_gt(psem, pins, np.zeros(3), sel,
                                   np.zeros(3), 0.1, max_dist=3.0)
    far = np.linalg.norm(np.argwhere(sel) - np.array([0, 0, 19]),
                         axis=1) > 3.0
    assert not (pi[far] > 0).any()
