"""Training / evaluation CLI (reference main.py:25-449 equivalent).

  python -m eprecon_tpu.main --cfg config/train.yaml [KEY VALUE ...]
  python -m eprecon_tpu.main --cfg config/test.yaml  [KEY VALUE ...]
"""
from __future__ import annotations

import argparse
import os
import sys


def build_dataset(cfg, mode: str, epoch: int = 0):
    from eprecon_tpu.data.scannet import find_dataset_def
    from eprecon_tpu.data.transforms import (Compose, IntrinsicsPoseToProjection,
                                             RandomTransformSpace, ResizeImage)

    n_views = cfg.train.n_views if mode == "train" else cfg.test.n_views
    transforms = Compose([
        ResizeImage((640, 480)),
        RandomTransformSpace(
            cfg.model.n_vox, cfg.model.voxel_size,
            random_rotation=cfg.train.random_rotation_3d and mode == "train",
            random_translation=cfg.train.random_translation_3d and mode == "train",
            paddingXY=cfg.train.pad_xy_3d, paddingZ=cfg.train.pad_z_3d),
        IntrinsicsPoseToProjection(n_views, stride=4),
    ])
    ds_cls = find_dataset_def(cfg.dataset)
    path = cfg.train.path if mode == "train" else cfg.test.path
    return ds_cls(path, mode, transforms, n_views, cfg.model.n_scales,
                  epoch=epoch)


def _resolve_auto_extent(cfg, mode: str):
    """model.global_extent_auto: size the dense global volume from the
    dataset's actual window placements (data/extent.py) before building
    anything shape-dependent."""
    if not cfg.model.global_extent_auto:
        return cfg
    import dataclasses

    from eprecon_tpu.data.extent import fit_global_extent

    ext, margin = fit_global_extent(cfg, mode)
    print(f"auto global_extent ({mode}): {list(ext)}, origin_margin {margin}")
    return dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, global_extent=ext, origin_margin=margin))


def run_train(cfg):
    import jax

    cfg = _resolve_auto_extent(cfg, "train")

    from eprecon_tpu.data.sampler import ContiguousDistributedSampler
    from eprecon_tpu.models.eprecon import make_recurrent_state
    from eprecon_tpu.parallel.mesh import initialize_distributed, make_mesh
    from eprecon_tpu.train import checkpoint as ckpt
    from eprecon_tpu.train.loop import (fragment_to_device_args, _scene_origin,
                                        train_epochs, train_epochs_sharded)
    from eprecon_tpu.train.state import create_train_state, make_train_step

    initialize_distributed()
    dataset = build_dataset(cfg, "train")
    n_devices = jax.device_count()
    steps_per_epoch = max(len(dataset) // max(n_devices, 1), 1)

    # init from the first sample
    sample = dataset[0]
    imgs, frag, targets = fragment_to_device_args(cfg, sample,
                                                  _scene_origin(cfg, sample))
    rec = make_recurrent_state(cfg.model)
    tstate, model, tx = create_train_state(cfg, jax.random.PRNGKey(cfg.seed),
                                           (imgs, frag, rec, targets),
                                           steps_per_epoch)

    if cfg.resume:
        latest = ckpt.latest_checkpoint(cfg.logdir)
        if latest:
            tstate = ckpt.restore_checkpoint(latest, tstate)
            print(f"resumed from {latest}")
    elif cfg.loadckpt:
        tstate = ckpt.restore_checkpoint(cfg.loadckpt, tstate)

    if n_devices > 1 and len(dataset) >= n_devices:
        # data-parallel mesh: one contiguous scene stream per device
        # (reference main.py:155-162 DDP + datasets/sampler.py)
        mesh = make_mesh(n_devices)
        step_fn = make_train_step(model, tx, cfg, mesh=mesh)
        train_epochs_sharded(cfg, model, tstate, step_fn, dataset, n_devices)
        return

    step_fn = make_train_step(model, tx, cfg)
    sampler = ContiguousDistributedSampler(len(dataset), 1, 0)
    prefetcher = _make_prefetcher(cfg, dataset, cfg.train.n_workers)

    def iter_epoch(epoch):
        dataset.epoch = epoch
        if prefetcher is not None:
            yield from prefetcher.iterate(list(sampler))
        else:
            for i in sampler:
                yield dataset[i]

    train_epochs(cfg, model, tstate, step_fn, iter_epoch)


def _make_prefetcher(cfg, dataset, n_workers: int):
    """Native decode-ahead loader (reference main.py:130-151 num_workers
    analogue); None when disabled or the dataset has no path API."""
    if n_workers <= 0 or not hasattr(dataset, "image_paths"):
        return None
    from eprecon_tpu.data.prefetch import FragmentPrefetcher

    return FragmentPrefetcher(dataset, n_threads=n_workers)


def run_test(cfg):
    import jax
    import numpy as np

    cfg = _resolve_auto_extent(cfg, "test")

    from eprecon_tpu.inference.pipeline import StreamingReconstructor
    from eprecon_tpu.models.eprecon import EPRecon, make_recurrent_state
    from eprecon_tpu.train import checkpoint as ckpt
    from eprecon_tpu.train.loop import evaluate, fragment_to_device_args

    dataset = build_dataset(cfg, "test")
    sample = dataset[0]
    imgs, frag, _ = fragment_to_device_args(
        cfg, sample, np.asarray(sample["vol_origin"], np.float32))
    model = EPRecon(cfg.model)
    rec = make_recurrent_state(cfg.model)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs, frag, rec, None)
    if cfg.loadckpt:
        restored = ckpt.restore_checkpoint(cfg.loadckpt, None)
        variables = {"params": restored["params"],
                     **restored.get("batch_stats", {})}
    recon = StreamingReconstructor(cfg, variables)
    prefetcher = _make_prefetcher(cfg, dataset, cfg.test.n_workers)

    def iter_all():
        if prefetcher is not None:
            yield from prefetcher.iterate(range(len(dataset)))
        else:
            for i in range(len(dataset)):
                yield dataset[i]

    out_dir = os.path.join(cfg.logdir, "scenes")
    gt_dir = os.path.join(cfg.test.path, "all_tsdf_9")
    evaluate(cfg, recon, iter_all(), out_dir=out_dir,
             gt_dir=gt_dir if os.path.isdir(gt_dir) else None)
    if cfg.test.eval_depth_frames > 0:
        # full depth protocol over the saved scenes (reference
        # tools/evaluation.py:161-208): held-out frames come from the same
        # prepared tree the dataset read
        from eprecon_tpu.tools.evaluation import main as eval_main

        eval_main(["--result_dir", out_dir, "--data_path", cfg.test.path,
                   "--max_frames", str(cfg.test.eval_depth_frames)])


def main(argv=None):
    ap = argparse.ArgumentParser("EPRecon-TPU")
    ap.add_argument("--cfg", required=True)
    ap.add_argument("opts", nargs=argparse.REMAINDER,
                    help="KEY VALUE config overrides")
    args = ap.parse_args(argv)
    # EPRECON_PLATFORM=cpu|tpu is honored in eprecon_tpu/__init__.py

    # persistent compile cache (per-backend — AOT results don't transfer
    # across machine types): without it every CLI start pays the full cold
    # relay compile (~15 min at production extents), which multiplies the
    # cost of RSS-restart resumes (train/loop.py) and phase-per-process
    # runners. bench.py sets the same dirs.
    import os as _os

    import jax as _jax

    _cache = _os.path.expanduser(
        f"~/.cache/jax_compilation_{_jax.default_backend()}")
    _os.makedirs(_cache, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from eprecon_tpu.config import load_config, parse_cli_overrides

    cfg = load_config(args.cfg, parse_cli_overrides(args.opts))
    if cfg.mode == "train":
        run_train(cfg)
    else:
        run_test(cfg)


if __name__ == "__main__":
    main()
