"""Minimal repro: Mosaic executables HANG when reloaded from the jax
persistent compilation cache through the axon TPU plugin.

DANGER — run only when you accept a ~10-minute tunnel outage:
a hung reload wedges the axon tunnel for EVERY process on this host
(observed round 2/3). Because of that, this script refuses to run
without `--yes-i-accept-tunnel-wedge`. It is never invoked by tests,
benches, or the driver; it exists so the bug report is reproducible
(VERDICT r3 item 3).

Repro shape (two fresh subprocesses, same tiny Pallas kernel, same
cache dir):

  1. subprocess A: jax_compilation_cache_dir=<tmp>, compile+run a
     2-line Pallas copy kernel on the TPU -> works, writes the cache
     entry (the kernel is made trivially unique per invocation so a
     pre-existing entry can't mask the repro).
  2. subprocess B: same cache dir, same kernel -> XLA deserializes the
     executable instead of compiling; the device program waits forever
     on the Mosaic custom-call target that is only registered
     server-side during a REAL compile. B never returns (killed here
     by timeout).

Expected output: "A: ok ... B: HUNG (timeout) -> repro confirmed".
If B completes, the plugin bug is fixed and the CPU-only cache guard in
bench.py / apps/cli.py / apps/optimize.py can be lifted.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

CHILD = r"""
import sys, time
import jax
jax.config.update("jax_compilation_cache_dir", sys.argv[1])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl

SALT = float(sys.argv[2])  # makes this run's kernel unique in the cache

def kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + SALT

x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
t0 = time.perf_counter()
y = pl.pallas_call(
    kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)
print(f"done sum={float(jnp.sum(y)):.1f} in {time.perf_counter()-t0:.1f}s",
      flush=True)
"""


def main():
    if "--yes-i-accept-tunnel-wedge" not in sys.argv:
        print(__doc__)
        print("refusing to run without --yes-i-accept-tunnel-wedge")
        return 2
    cache = tempfile.mkdtemp(prefix="mosaic_cache_repro_")
    salt = str(time.time() % 1000.0)
    env = dict(os.environ)

    def run(tag, timeout):
        t0 = time.perf_counter()
        try:
            r = subprocess.run(
                [sys.executable, "-c", CHILD, cache, salt], env=env,
                capture_output=True, text=True, timeout=timeout)
            print(f"{tag}: rc={r.returncode} {r.stdout.strip()} "
                  f"({time.perf_counter()-t0:.1f}s)")
            return r.returncode == 0
        except subprocess.TimeoutExpired:
            print(f"{tag}: HUNG (killed after {timeout}s)")
            return None

    ok_a = run("A (cold compile, writes cache)", timeout=600)
    if not ok_a:
        print("A failed — no verdict (tunnel already unhealthy?)")
        return 1
    ok_b = run("B (reloads cached executable)", timeout=180)
    if ok_b is None:
        print("-> repro CONFIRMED: cached Mosaic executable hangs on "
              "reload. Tunnel is likely wedged for ~10 min now.")
        return 0
    print("-> repro NOT reproduced: reload completed; the CPU-only "
          "cache guard may be liftable.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
