"""A/B-time the back-projection gather adjoint on the TPU (VERDICT r2 #6).

The fine-stage BP backward scatter-adds 884,736 cotangent rows/view into a
[19200, 96] quad table (9 x 6.5 ms measured in the round-2 trace);
bp_backward='sorted' (ops/back_project.gather_rows_segsum) argsorts the
rows by destination and segment-sums so the scatter sees each of the 19,200
destinations once. Whether the on-device argsort of 884k keys beats the 46x
scatter redundancy is exactly what this measures. Gradients are identical
(tests/test_back_project.py::test_sorted_backward_matches_scatter).

  python tools_dev/bench_bp_backward.py [iters]

Run on the real TPU; prints per-mode grad-step latency at production shapes
(96^3 window / interval 1 / 9 views / 120x160x24 feats — the fine stage) and
at the coarse stage (24^3 / interval 4 / 30x40x80). Params are passed as jit
ARGUMENTS (closure capture inlines them as constants — PERF_NOTES).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from eprecon_tpu.ops.back_project import back_project_window

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
rng = np.random.default_rng(0)


def bench(dim, interval, h, w, c, n_views=9):
    feats = jnp.asarray(rng.standard_normal((n_views, 1, h, w, c)),
                        jnp.float32)
    projs = []
    for v in range(n_views):
        kmat = np.array([[0.25 * w, 0, w / 2], [0, 0.25 * w, h / 2],
                         [0, 0, 1]], np.float32)
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.1 * v
        pm = np.eye(4, dtype=np.float32)
        pm[:3, :4] = kmat @ np.linalg.inv(pose)[:3, :4]
        projs.append(pm)
    proj = jnp.asarray(np.stack(projs)[:, None])
    origin = jnp.asarray([[-1.0, -1.0, 0.5]], jnp.float32)

    def make_grad(mode):
        def loss(f):
            mean, _ = back_project_window(dim, interval, origin, 0.04, f,
                                          proj, bp_backward=mode)
            return jnp.sum(mean.astype(jnp.float32) ** 2)
        return jax.jit(jax.grad(loss))

    out = {}
    for mode in ("scatter", "sorted"):
        g = make_grad(mode)
        r = g(feats)
        jax.block_until_ready(r)
        # completion-forced timing: read one scalar back per iteration so
        # relay pipelining can't hide the tail (PERF_NOTES measurement rules)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = g(feats)
            float(r[0, 0, 0, 0, 0])
        dt = (time.perf_counter() - t0) / iters * 1e3
        out[mode] = dt
        print(f"  {dim} interval={interval} {h}x{w}x{c}: {mode:8s} "
              f"{dt:7.2f} ms/grad-step", flush=True)
    return out


print("fine stage (96^3, 1/4-res feats):", flush=True)
fine = bench((96, 96, 96), 1, 120, 160, 24)
print("coarse stage (24^3, 1/16-res feats):", flush=True)
coarse = bench((24, 24, 24), 4, 30, 40, 80)
print(f"fine delta: {fine['scatter'] - fine['sorted']:+.2f} ms "
      f"(positive = sorted wins)")
