"""Regression tests for BASELINE.json configs 4-5 (inverse rendering).

Scaled-down versions of the recorded runs in results/BASELINE_CONFIGS.md;
each pins that the end-to-end optimize pipeline (scramble -> render ->
grad -> adam -> project) actually learns on the real bundled scenes.
"""

import json
import os

import numpy as np
import pytest

MODELS = "/root/reference/models"


def _run_optimize(args):
    from dustraytracer_tpu.apps import optimize

    rc = optimize.main(args)
    assert rc == 0


@pytest.mark.slow
def test_config4_room_pbr_materials(tmp_path, capsys):
    """room.glb: gradient descent on albedo + metallic (+ roughness).

    Albedo and metallic must recover; roughness is documented-unobservable
    in this scene (true metallic == 0 -> the metal lobe, roughness's only
    consumer, is never taken at the optimum) so it is only required to
    stay in [0, 1] (projection)."""
    scene = os.path.join(MODELS, "room.glb")
    if not os.path.exists(scene):
        pytest.skip("room.glb not bundled")
    _run_optimize(["--scene", scene, "--self-test",
                   "--optimize", "albedo", "roughness", "metallic",
                   "--size", "48x48", "--bounces", "2", "--steps", "45",
                   "--lr", "4e-2", "--out", str(tmp_path)])
    out = json.loads(capsys.readouterr().out)
    assert out["history"][0]["loss"] > 50 * out["final_loss"]
    assert out["param_mae"]["mat_albedo"] < 0.05
    assert out["param_mae"]["mat_metallic"] < 0.08
    assert 0.0 <= out["param_mae"]["mat_roughness"] <= 1.0


@pytest.mark.slow
def test_config5_katana_vertex_grads_sharded(tmp_path, capsys):
    """valorant_katana.glb (90,726 tris): vertex gradients through the
    cluster traversal, tile-sharded over the 8-device mesh. The gate is
    a real loss decrease — global vertex MAE is not meaningful when only
    visible triangles receive gradients (results/BASELINE_CONFIGS.md).

    Default-suite budget (VERDICT r3 item 8: this test alone took 735 s,
    half the suite): a few steps at 24x24 gate that descent HAPPENS;
    DUST_HEAVY=1 restores the recorded 16-step 32x32 configuration with
    the strong 15%-decrease gate.
    """
    scene = os.path.join(MODELS, "valorant_katana.glb")
    if not os.path.exists(scene):
        pytest.skip("valorant_katana.glb not bundled")
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest)")
    heavy = os.environ.get("DUST_HEAVY") == "1"
    # default-suite budget: ONE bounce, two steps — the gate is only
    # that sharded vertex descent on the real 90k-tri scene decreases
    # the loss; the CPU compile of the 8-device grad graph dominates
    # this test (148 s at b=2), and halving the scan body is the one
    # lever that actually shrinks it
    size, steps, bounces = (("32x32", 16, 2) if heavy
                            else ("24x24", 2, 1))
    _run_optimize(["--scene", scene, "--self-test",
                   "--optimize", "vertices", "--perturb-vertices", "0.03",
                   "--nee-cosine", "--size", size, "--bounces",
                   str(bounces), "--steps", str(steps), "--lr", "3e-3",
                   "--devices", "8", "--out", str(tmp_path)])
    out = json.loads(capsys.readouterr().out)
    first, last = out["history"][0]["loss"], out["final_loss"]
    assert np.isfinite(last)
    assert last < (0.85 if heavy else 1.0) * first, (first, last)


@pytest.mark.slow
def test_config5_texture_grads(tmp_path, capsys):
    """Texture-parameter gradients (config 5's texture leg, on
    cornell_box because the bundled katana export carries no textures):
    texel values must recover to an image match."""
    scene = os.path.join(MODELS, "cornell_box.glb")
    if not os.path.exists(scene):
        pytest.skip("cornell_box.glb not bundled")
    _run_optimize(["--scene", scene, "--self-test",
                   "--optimize", "textures", "--size", "48x48",
                   "--bounces", "2", "--steps", "60", "--lr", "5e-2",
                   "--camera-pos", "0,1.25,1.18",
                   "--look-at", "0,1.1,-1.25", "--vfov", "75",
                   "--out", str(tmp_path)])
    out = json.loads(capsys.readouterr().out)
    assert out["final_loss"] < 1e-4, out["final_loss"]
    assert out["history"][0]["loss"] > 100 * max(out["final_loss"], 1e-9)
