"""Is onehot @ table cheaper with per-operand precision?

The one-hot matrix is 0/1 — exactly representable in bf16 — so only the
table operand needs the f32 x3 split. precision=(DEFAULT, HIGHEST)
should halve the MXU passes vs HIGHEST/HIGHEST while staying exact for
row selection. Verifies bit-exactness and times both.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.lax import Precision


def bench(fn, *args, reps=10):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / reps


def main():
    n, t, cols = 1 << 20, 15752, 19
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, t, size=n), jnp.int32)
    # adversarial f32 values: full mantissas, huge exponent range
    table = jnp.asarray(
        (rng.rand(t, cols).astype(np.float32) - 0.5) *
        np.exp2(rng.randint(-30, 30, size=(t, cols))).astype(np.float32))

    def fetch(prec):
        def f(idx, table):
            ids = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0],
                                                       table.shape[0]), 1)
            oh = (ids == idx[:, None]).astype(jnp.float32)
            return jnp.dot(oh, table, precision=prec,
                           preferred_element_type=jnp.float32)
        return jax.jit(f)

    ref = np.asarray(table)[np.asarray(idx)]
    for name, prec in [("HIGHEST/HIGHEST", Precision.HIGHEST),
                       ("DEFAULT/HIGHEST", (Precision.DEFAULT,
                                            Precision.HIGHEST)),
                       ("HIGH/HIGH", Precision.HIGH),
                       ("DEFAULT/DEFAULT", Precision.DEFAULT)]:
        f = fetch(prec)
        out = np.asarray(f(idx, table))
        exact = bool((out == ref).all())
        dt = bench(f, idx, table)
        print(f"{name:18s} exact={exact}  {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
