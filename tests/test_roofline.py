"""Speed-of-light tooling: volume efficiency + timing guards.

The r3 verdict flagged that sol_pct could only pass (clipped at 100,
rates calibrated as upper bounds) and that the benches published
negative throughputs when delta timing failed. These tests pin the new
guarantees: volume_efficiency produces a metric that CAN fail, and the
timing helpers raise on non-positive measurements instead of returning
them.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dustraytracer_tpu.scene.scene import build_scene
from dustraytracer_tpu.utils import roofline
from tests.util_scenes import make_random_tri_doc


def test_volume_efficiency_bounds():
    scene = build_scene(make_random_tri_doc(600, seed=3), use_native=False)
    rng = np.random.default_rng(1)
    o = rng.uniform(-10, 10, (4096, 3)).astype(np.float32)
    tgt = rng.uniform(-4, 4, (4096, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    vol = roofline.volume_efficiency(scene.cluster, jnp.asarray(o),
                                     jnp.asarray(d), max_tiles=2)
    # the kernel cannot execute LESS than the useful union (f32-vs-f64
    # replay noise aside); a ratio far above 100 means the replay or the
    # counters are broken
    assert 0.0 < vol["vol_eff_window_pct"] <= 115.0, vol
    assert 0.0 < vol["vol_eff_leaf_pct"] <= 115.0, vol
    assert vol["useful_node_steps"] > 0
    assert vol["exec_node_substeps"] >= vol["useful_node_steps"] * 0.85
    # priced combination present when rates given
    rates = {"window_ns": 900.0, "leaf_ns": 4000.0,
             "leaf_serial_ns": 4000.0}
    vol2 = roofline.volume_efficiency(scene.cluster, jnp.asarray(o),
                                      jnp.asarray(d), rates=rates,
                                      max_tiles=2)
    assert 0.0 < vol2["vol_eff_pct"] <= 115.0


def test_delta_time_dispatch_raises_on_nonpositive(monkeypatch):
    """A shrinking wall clock (2R segment faster than the R segment)
    must raise after the doubled-reps retry, never return a negative
    per-dispatch time (r3: cornell_256 shipped -3.65 ms/sample)."""
    state = {"t": 0.0, "call": 0, "run": 0}

    def fake_perf():
        # perf_counter is called twice per run() (start, end). Runs
        # arrive as [warm, R, 2R, R, 2R, ...]; give every R segment a
        # LONGER fake duration than its 2R partner so each round's
        # delta is negative.
        state["call"] += 1
        if state["call"] % 2 == 0:  # end of a run
            state["run"] += 1
            k = state["run"]
            state["t"] += 5.0 if (k > 1 and k % 2 == 0) else 1.0
        return state["t"]

    monkeypatch.setattr(roofline.time, "perf_counter", fake_perf)
    with pytest.raises(RuntimeError, match="non-positive delta"):
        roofline.delta_time_dispatch(lambda: None, lambda _o: None,
                                     reps=2, rounds=3)


def test_packed_texel_fetch_matches_reference_semantics():
    """The flat-u32 texel gather (render/texture.py packed_texels) must
    reproduce the reference's point-sample + gamma-2 decode exactly
    (`Texture.cu:33-58`) — byte order and index math included."""
    import dataclasses

    from dustraytracer_tpu.render.texture import sample_texture
    from dustraytracer_tpu.scene.scene import build_scene
    from tests.util_scenes import make_random_tri_doc

    rng = np.random.default_rng(3)
    scene = build_scene(make_random_tri_doc(10, seed=1), use_native=False)
    stack = rng.integers(0, 255, (3, 8, 16, 4), dtype=np.uint8)
    hw = np.array([[8, 16], [5, 7], [8, 16]], np.int32)  # ragged dims
    scene = dataclasses.replace(
        scene, tex_stack=jnp.asarray(stack), tex_hw=jnp.asarray(hw))

    n = 257
    tex = rng.integers(0, 3, (n,)).astype(np.int32)
    uv = rng.uniform(-1.5, 2.5, (n, 2)).astype(np.float32)  # wraps
    got = np.asarray(sample_texture(scene, jnp.asarray(tex),
                                    jnp.asarray(uv)))

    # numpy reference: wrap, scale by the texture's TRUE dims, clip,
    # point sample, /255, square
    fu = uv[:, 0] - np.floor(uv[:, 0])
    fv = uv[:, 1] - np.floor(uv[:, 1])
    h = hw[tex, 0].astype(np.float32)
    w = hw[tex, 1].astype(np.float32)
    xi = np.clip((fu * w).astype(np.int32), 0, hw[tex, 1] - 1)
    yi = np.clip((fv * h).astype(np.int32), 0, hw[tex, 0] - 1)
    ref = stack[tex, yi, xi, :3].astype(np.float32) / 255.0
    ref = ref * ref
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
