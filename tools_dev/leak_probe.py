"""Probe: does per-step host->device transfer leak host RSS via the relay?

The 40-epoch production quality run's trainer grew ~3 GB/epoch (~100
MB/step, ~= the per-step fragment transfer volume) and was OOM-killed at
130 GB. This feeds a jitted reduction a FRESH ~33 MB host array per step
(same shape as a fragment's 9-view image stack) and prints RSS every 20
steps. Flat RSS = our loop leaks elsewhere; linear RSS ~ 33 MB/step = the
relay client retains transferred literals.

  python tools_dev/leak_probe.py [n_steps] [--reuse | --mutate]

--reuse sends the SAME numpy array each step (tests identity-keyed
caching: if RSS is flat with --reuse but grows without, the client keys
retention on buffer identity).
--mutate reuses ONE buffer but rewrites its contents in place each step and
CHECKS the device result — distinguishes "identity-keyed cache that
re-reads contents" (flat RSS, correct values → pinned-buffer reuse is a
valid leak fix) from "identity-keyed dedup" (stale values → reuse would
corrupt training).
"""
import resource
import sys

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 200
REUSE = "--reuse" in sys.argv
MUTATE = "--mutate" in sys.argv


def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


@jax.jit
def f(x):
    return x.sum()


def main():
    print("devices:", jax.devices(), flush=True)
    base = np.random.default_rng(0).standard_normal(
        (9, 480, 640, 3)).astype(np.float32)  # 33.2 MB
    base_sum = float(base.sum())
    n_el = base.size
    _ = float(f(jnp.asarray(base)))  # compile
    r0 = rss_mb()
    print(f"step 0: maxrss {r0:.0f} MB", flush=True)
    for i in range(1, N + 1):
        if MUTATE:
            base += np.float32(1.0)
            x = base
        else:
            x = base if REUSE else base + np.float32(i)
        got = float(f(jnp.asarray(x)))
        if MUTATE:
            want = base_sum + i * n_el
            if abs(got - want) > abs(want) * 1e-5 + 1.0:
                print(f"step {i}: STALE VALUE — got {got:.1f}, want "
                      f"{want:.1f}; identity reuse is NOT safe", flush=True)
                return
        if i % 20 == 0:
            print(f"step {i}: maxrss {rss_mb():.0f} MB "
                  f"(+{(rss_mb()-r0)/i*1024:.1f} KB/step avg)", flush=True)
    if MUTATE:
        print("mutate: all values correct", flush=True)


if __name__ == "__main__":
    main()
