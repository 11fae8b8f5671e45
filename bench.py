"""End-to-end inference benchmark on real TPU hardware.

Measures keyframes/second through the full EPRecon forward (dual backbones,
occupancy init, 3-level coarse-to-fine with GRU fusion, panoptic decoder) at
the reference's production shapes: 9-view fragments, 640x480 images, 96^3
fragment window at 4 cm voxels.

Prints ONE JSON line:
  {"metric": "keyframes_per_sec", "value": N, "unit": "kf/s", "vs_baseline": N/33}
Baseline: 33 keyframes/s (NeuralRecon-class on RTX 2080 Ti; BASELINE.md).
"""
import json
import sys
import time


def _arm_init_watchdog():
    """Fail fast if TPU backend init hangs (dead axon relay).

    A wedged relay makes jax.devices() block forever with no listener on the
    relay ports; exiting with a clear error beats hanging through the
    driver's whole timeout. Disarmed after the first device computation.
    """
    import os
    import socket
    import threading

    # Definitive dead-relay check: the axon relay (/root/.tpu_init.py)
    # listens on 127.0.0.1:8082; connection refused means it is not
    # running and jax.devices() would block forever.
    if os.environ.get("JAX_PLATFORMS", "axon") == "axon":
        try:
            socket.create_connection(("127.0.0.1", 8082), timeout=5).close()
        except OSError:
            print("# FATAL: axon relay is not listening on 127.0.0.1:8082 — "
                  "TPU unreachable, refusing to hang", file=sys.stderr,
                  flush=True)
            sys.exit(2)

    budget = float(os.environ.get("EPRECON_BENCH_INIT_BUDGET_S", "600"))
    disarm = threading.Event()

    def watch():
        if not disarm.wait(budget):
            print(f"# FATAL: TPU backend init exceeded {budget:.0f}s — "
                  "axon relay is likely dead (no listener on relay ports)",
                  file=sys.stderr, flush=True)
            os._exit(2)

    threading.Thread(target=watch, daemon=True).start()
    return disarm


def main():
    import os

    _init_ok = _arm_init_watchdog()
    import jax

    jax.devices()  # force backend init under the watchdog
    _init_ok.set()

    cache = os.path.expanduser(f"~/.cache/jax_compilation_{jax.default_backend()}")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import jax.numpy as jnp
    import numpy as np

    from eprecon_tpu.config import default_config
    from eprecon_tpu.data.synthetic import make_fragment
    from eprecon_tpu.models.eprecon import (EPRecon, FragmentInputs,
                                            make_recurrent_state)
    from eprecon_tpu.utils.benchmark import time_fn

    cfg = default_config()
    n_views = cfg.train.n_views

    # cache the synthetic fragment INCLUDING training targets (the train-step
    # benchmark below needs tsdf/occ/label windows; regenerate a pre-target
    # cache once)
    frag_cache = os.path.expanduser("~/.cache/eprecon_bench_fragment.npz")
    d = None
    if os.path.exists(frag_cache):
        z = np.load(frag_cache)
        if "semantic" in z.files:
            d = {k: z[k] for k in z.files}
    if d is None:
        d = make_fragment(n_views=n_views, image_hw=(480, 640),
                          n_vox=cfg.model.n_vox,
                          voxel_size=cfg.model.voxel_size, seed=0)
        # flatten to the cache's key schema (the train-step bench below
        # reads d["tsdf_i"]; a cache-miss run must see the same keys a
        # cache-hit run does)
        d = {"imgs": d["imgs"], "proj_matrices": d["proj_matrices"],
             "vol_origin_partial": d["vol_origin_partial"],
             "world_to_aligned_camera": d["world_to_aligned_camera"],
             "semantic": d["semantic"], "instance": d["instance"],
             **{f"tsdf_{i}": t for i, t in enumerate(d["tsdf_levels"])},
             **{f"occ_{i}": o for i, o in enumerate(d["occ_levels"])}}
        np.savez_compressed(frag_cache, **d)
    frag = FragmentInputs(
        proj_matrices=jnp.asarray(d["proj_matrices"]),
        vol_origin_partial=jnp.asarray(d["vol_origin_partial"]),
        world_to_aligned_camera=jnp.asarray(d["world_to_aligned_camera"]),
        rel_origins=jnp.zeros((cfg.model.n_layer, 3), jnp.int32))
    state = make_recurrent_state(cfg.model)
    imgs = jnp.asarray(d["imgs"])

    model = EPRecon(cfg.model)
    variables = jax.jit(model.init, static_argnames=())(
        jax.random.PRNGKey(0), imgs, frag, state, None)

    import functools

    @functools.partial(jax.jit, donate_argnums=(3,))
    def fwd(variables, imgs, frag, state):
        (outputs, _, new_state), _ = model.apply(
            variables, imgs, frag, state, None, mutable=["batch_stats"])
        return outputs["tsdf"], outputs["pred_masks"], new_state

    t0 = time.time()
    tsdf, masks, state = fwd(variables, imgs, frag, state)
    print(f"# compile+first: {time.time() - t0:.0f}s", file=sys.stderr)

    # streaming benchmark: thread the (donated) recurrent state through
    # back-to-back fragments, force completion with one scalar readback
    for _ in range(3):  # warmup
        tsdf, masks, state = fwd(variables, imgs, frag, state)
    float(tsdf.reshape(-1)[0])
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        tsdf, masks, state = fwd(variables, imgs, frag, state)
    float(tsdf.reshape(-1)[0])
    ms = (time.perf_counter() - t0) * 1e3 / iters
    kfps = n_views / (ms / 1e3)

    # p50 fragment latency: time individual fragments with a completion
    # readback each, then subtract the measured relay readback floor
    # (a scalar fetch through the axon tunnel costs ~30 ms, PERF_NOTES.md)
    lats = []
    for i in range(10):
        t0 = time.perf_counter()
        tsdf, masks, state = fwd(variables, imgs, frag, state)
        float(tsdf.reshape(-1)[i])
        lats.append(time.perf_counter() - t0)
    relays = []
    for i in range(5):
        t0 = time.perf_counter()
        float(tsdf.reshape(-1)[100 + i])  # fresh fetch of a ready buffer
        relays.append(time.perf_counter() - t0)
    import statistics

    relay_ms = statistics.median(relays) * 1e3
    # clamp: when compute is short relative to relay jitter the subtraction
    # can go negative, which would corrupt the driver's recorded metric
    p50_ms = max(0.0, statistics.median(lats) * 1e3 - relay_ms)

    # full-scale training-step throughput (VERDICT r2 #6). Guarded: a train
    # OOM/compile failure must never take down the headline metric.
    train_ms = None
    if os.environ.get("EPRECON_BENCH_TRAIN", "1") == "1":
        import signal

        def _alarm(signum, frame):
            raise TimeoutError("train-step bench exceeded its time budget")

        signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(int(os.environ.get("EPRECON_BENCH_TRAIN_BUDGET_S",
                                        "1500")))
        try:
            from eprecon_tpu.models.eprecon import FragmentTargets
            from eprecon_tpu.train.state import (create_train_state,
                                                 make_train_step)

            targets = FragmentTargets(
                tsdf=tuple(jnp.asarray(d[f"tsdf_{i}"]) for i in range(3)),
                occ=tuple(jnp.asarray(d[f"occ_{i}"]) for i in range(3)),
                semantic=jnp.asarray(d["semantic"]),
                instance=jnp.asarray(d["instance"]))
            rec = make_recurrent_state(cfg.model)
            tstate, tmodel, tx = create_train_state(
                cfg, jax.random.PRNGKey(0), (imgs, frag, rec, targets))
            tstep = make_train_step(tmodel, tx, cfg)
            for _ in range(3):
                tstate, rec, tmetrics = tstep(tstate, imgs, frag, targets, rec)
            float(tmetrics["total_loss"])
            t0 = time.perf_counter()
            for _ in range(5):
                tstate, rec, tmetrics = tstep(tstate, imgs, frag, targets, rec)
            float(tmetrics["total_loss"])
            train_ms = (time.perf_counter() - t0) * 1e3 / 5
        except Exception as e:  # pragma: no cover - diagnostic path
            print(f"# train-step bench failed: {e}", file=sys.stderr)
        finally:
            signal.alarm(0)

    result = {"metric": "keyframes_per_sec",
              "value": round(kfps, 2), "unit": "kf/s",
              "vs_baseline": round(kfps / 33.0, 3),
              "p50_fragment_latency_ms": round(p50_ms, 1),
              "relay_readback_floor_ms": round(relay_ms, 1)}
    if train_ms is not None:
        result["train_step_ms"] = round(train_ms, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
