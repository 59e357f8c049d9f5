"""dustraytracer_tpu — a TPU-native, differentiable, progressive path tracer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
DustRayTracer reference (a CUDA megakernel path tracer), re-designed
TPU-first:

- Scene ingest: glTF 2.0 (.glb/.gltf) -> flat SoA arrays (scene/).
- Acceleration: binned-SAH BVH built on host (numpy + native C++), flat
  SoA node arrays laid out for batched, masked traversal (accel/).
- Compute path: pure-functional wavefront rendering. Rays are (N, ...)
  arrays, the bounce loop is `lax.fori_loop` with live-ray masking, the
  BVH walk is a batched stack traversal in vectorized form (ops/), with
  Pallas TPU kernels for the hot paths.
- Rendering: progressive accumulation carried as explicit state,
  sun NEE, gradient sky, alpha cutout, Uncharted2 filmic + gamma,
  debug view heads (render/).
- Differentiability: pixel gradients w.r.t. materials / camera / vertices
  with traversal decisions stop-gradiented (diff/).
- Scale: tile-sharded data parallelism over a `jax.sharding.Mesh`,
  scene/BVH replicated, gradient psum over ICI (parallel/).
"""

__version__ = "0.1.0"

from dustraytracer_tpu.scene.settings import RenderSettings, RenderMode, DebugMode

__all__ = ["RenderSettings", "RenderMode", "DebugMode", "__version__"]
