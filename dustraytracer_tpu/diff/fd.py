"""Finite-difference gradient oracle for differentiable rendering.

The BASELINE gate (`/root/repo/BASELINE.json`: "pixel-grad allclose pass
rate" vs an FD oracle). The renderer is made differentiable by
construction — traversal returns stop-gradiented discrete hit ids, and
every continuous quantity is recomputed from them (`ops/traverse.py`,
`render/integrator.py::shade_hits`) — so for a *fixed RNG seed* the
sample estimate is a piecewise-smooth deterministic function of scene
parameters, and central differences must match `jax.grad` away from
visibility discontinuities.

Visibility (silhouette) gradients are the known exception: moving a
vertex across a pixel's ray flips the discrete hit id, a jump the AD
gradient does not see. Those are handled separately (edge-aware
estimators); the FD harness here takes an interior-only scene
configuration so the oracle is valid.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def fd_grad(f, x, eps: float = 1e-3) -> np.ndarray:
    """Central finite differences of scalar f w.r.t. array x (elementwise).

    O(2 * x.size) evaluations of f — use only on small parameter arrays.
    """
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    flat = x.reshape(-1)
    gflat = g.reshape(-1)
    for i in range(flat.size):
        xp = flat.copy()
        xm = flat.copy()
        xp[i] += eps
        xm[i] -= eps
        fp = float(f(jnp.asarray(xp.reshape(x.shape), jnp.float32)))
        fm = float(f(jnp.asarray(xm.reshape(x.shape), jnp.float32)))
        gflat[i] = (fp - fm) / (2.0 * eps)
    return g


def check_grads_vs_fd(f, x, eps: float = 1e-3, rtol: float = 5e-2,
                      atol: float = 1e-4):
    """Assert jit(grad(f))(x) ~= central differences. Returns (ad, fd).

    The gradient is jitted (the production path): eagerly-executed
    backward passes evaluate masked-out branches op-by-op, where inf
    intermediates that XLA would fold away become NaNs.
    """
    ad = np.asarray(jax.jit(jax.grad(f))(jnp.asarray(x, jnp.float32)),
                    np.float64)
    fd = fd_grad(f, x, eps)
    scale = np.maximum(np.abs(fd), np.abs(ad))
    err = np.abs(ad - fd)
    ok = err <= atol + rtol * scale
    if not ok.all():
        bad = np.argwhere(~ok)
        raise AssertionError(
            f"AD/FD mismatch at {bad[:5].tolist()}: ad={ad[~ok][:5]} "
            f"fd={fd[~ok][:5]} (rtol={rtol}, eps={eps})")
    return ad, fd
