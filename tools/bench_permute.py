"""Microbench: ways to apply a data-dependent permutation to ray SoA rows.

a) argsort keys, then gather rows by perm (current _sorted_tracers)
b) lax.sort with the rows as payload operands (sort network moves data)
c) unsort via second payload sort keyed by original index
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, reps=5):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / reps


def main():
    n = 1 << 20
    rng = np.random.RandomState(0)
    key = jnp.asarray(rng.randint(0, 1 << 18, size=n), jnp.int32)
    o = jnp.asarray(rng.rand(n, 3), jnp.float32)
    d = jnp.asarray(rng.rand(n, 3), jnp.float32)

    @jax.jit
    def argsort_gather(key, o, d):
        perm = jnp.argsort(key)
        return o[perm], d[perm]

    @jax.jit
    def payload_sort(key, o, d):
        ops = (key, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
               jnp.arange(n, dtype=jnp.int32))
        r = jax.lax.sort(ops, dimension=0, num_keys=1)
        return (jnp.stack(r[1:4], axis=-1), jnp.stack(r[4:7], axis=-1),
                r[7])

    @jax.jit
    def unsort_payload(orig_idx, t, hit, vis):
        r = jax.lax.sort((orig_idx, t, hit, vis), dimension=0, num_keys=1)
        return r[1], r[2], r[3]

    @jax.jit
    def unsort_gather(orig_idx, t, hit, vis):
        inv = jnp.zeros_like(orig_idx).at[orig_idx].set(
            jnp.arange(n, dtype=orig_idx.dtype))
        return t[inv], hit[inv], vis[inv]

    print(f"n={n}")
    dt = bench(argsort_gather, key, o, d)
    print(f"argsort + gather rows:   {dt*1e3:8.2f} ms")
    dt = bench(payload_sort, key, o, d)
    print(f"payload lax.sort:        {dt*1e3:8.2f} ms")

    os_, ds_, idx = payload_sort(key, o, d)
    t = os_[:, 0]
    hit = idx
    vis = idx
    dt = bench(unsort_payload, idx, t, hit, vis)
    print(f"unsort via payload sort: {dt*1e3:8.2f} ms")
    dt = bench(unsort_gather, idx, t, hit, vis)
    print(f"unsort via inv gather:   {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
