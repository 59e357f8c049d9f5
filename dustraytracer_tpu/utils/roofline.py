"""Speed-of-light model for the traversal kernels (BASELINE.json:5).

"sol_pct" answers: of the time the min-sweep kernel
(ops/traverse_sweep.py) takes per ray wave, how much is accounted for by
the arithmetic it actually executes, priced at *measured* machine peaks?

The model has three parts:

1. `measure_peaks` — empirical single-chip ceilings, measured on the
   attached device rather than assumed from datasheets: f32
   Precision.HIGHEST matmul TFLOP/s (what the kernels' one-hot selects
   run at — ~1/6 of the bf16 peak because HIGHEST decomposes each f32
   operand into bf16 passes), VPU f32 TFLOP/s (fused multiply-add
   chain on VMEM-resident data), and HBM copy bandwidth.

2. `walk_stats` — an exact host-side (numpy) replay of the threaded
   sweep traversal on a ray sample, reproducing the integrator's ray
   sort and 512-lane tiling. For each tile it records the number of
   node steps the uniform cursor makes (= the union over lanes of
   visited nodes — the quantity the kernel's wall time follows) and how
   many of those are leaf steps; per ray it records the useful visit
   counts.

3. `sweep_sol` — prices the executed work:
     per node step : TILE lanes x ~35 VPU f32 ops (slab test + advance)
     per leaf step : one (10K, C) f32-HIGHEST matvec on the MXU
                     + TILE x K x ~60 VPU f32 ops (Möller–Trumbore)
   The speed-of-light time per wave is the max of the VPU-, MXU- and
   HBM-bound times (rays in/out only — node/tri tables are grid-
   invariant and stay resident in SMEM/VMEM across tiles).

   sol_pct        = sol_time / measured_time for the kernel's EXECUTED
                    work (how efficiently the kernel runs what it runs).
   sol_pct_ideal  = the same, but pricing only per-ray USEFUL work
                    (perfect lane coherence) — the gap between the two
                    is divergence: lanes parked while the cursor serves
                    other lanes' nodes.

Reference hot loop this prices against:
`/root/reference/DustRayTracer/src/Core/BVH/BVHTraversal.cuh:14-73` +
`Shaders/Intersection.cu:4-36` (per-thread stack walk on a GTX 1650).
"""

from __future__ import annotations

import time

import numpy as np

from dustraytracer_tpu.ops.traverse_sweep import TILE  # kernel tile size
SLAB_OPS = 35.0   # VPU f32 ops per lane per node step (slab + bookkeeping)
MT_OPS = 60.0     # VPU f32 ops per (K-lane, ray) pair per leaf step
OUT_BYTES_PER_RAY = (8 + 8) * 4.0  # rays in (8,T) + packed out (8,T), f32


def measure_peaks(repeats: int = 3) -> dict:
    """Empirically measure the attached chip's ceilings. ~20 s.

    Every measurement uses DELTA timing — the same kernel at two
    iteration counts, rate = extra work / extra time — because a single
    dispatch through the axon tunnel carries ~10-30 ms of fixed latency
    that would otherwise swamp the device time (observed: a naive
    single-matmul 'peak' of 5 TFLOP/s on a 197 TFLOP/s chip).
    """
    import jax
    import jax.numpy as jnp
    from functools import partial

    peaks = {"backend": jax.default_backend(),
             "device": str(jax.devices()[0])}

    def _time(f, *args):
        # fetch a SCALAR to synchronize: through the axon tunnel,
        # block_until_ready returns before device completion (observed:
        # 160 chained 2048^3 matmuls "finishing" in 0.07 ms); a host
        # fetch of the result is the only reliable fence
        float(f(*args))  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    def _delta_rate(make_fn, work_per_iter, n1, n2, *args):
        t1 = _time(jax.jit(partial(make_fn, n1)), *args)
        t2 = _time(jax.jit(partial(make_fn, n2)), *args)
        dt = max(t2 - t1, 1e-9)
        return (n2 - n1) * work_per_iter / dt

    n = 2048
    a = jnp.full((n, n), 1.0 / n, jnp.float32)
    b = jnp.ones((n, n), jnp.float32)

    def mm_chain(iters, a, b, *, precision):
        def body(_, acc):
            # rows of acc sum to 1, b is all-ones -> dot(acc, b) == 1s;
            # rescale keeps values stable across iterations
            return jax.lax.dot(acc, b, precision=precision,
                               preferred_element_type=jnp.float32) * (1.0 / n)

        return jnp.sum(jax.lax.fori_loop(0, iters, body, a))

    hi = jax.lax.Precision.HIGHEST
    peaks["mxu_f32_highest_tflops"] = _delta_rate(
        partial(mm_chain, precision=hi), 2.0 * n**3, 8, 40, a, b) / 1e12

    def mm_chain_bf(iters, a, b):
        def body(_, acc):
            out = jax.lax.dot(acc, b, preferred_element_type=jnp.float32)
            return (out * (1.0 / n)).astype(jnp.bfloat16)

        return jnp.sum(jax.lax.fori_loop(0, iters, body, a)
                       .astype(jnp.float32))

    peaks["mxu_bf16_tflops"] = _delta_rate(
        mm_chain_bf, 2.0 * n**3, 8, 40,
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)) / 1e12

    x = jnp.ones((4096, 512), jnp.float32)

    def vpu_chain(iters, x):
        def body(_, x):
            return x * 1.0000001 + 1e-7  # one FMA per element per iter

        return jax.lax.fori_loop(0, iters, body, x)[0, 0]

    peaks["vpu_f32_tflops"] = _delta_rate(
        vpu_chain, 2.0 * x.size, 1024, 9216, x) / 1e12

    big = jnp.ones((96 * 1024 * 1024,), jnp.float32)  # 384 MB: HBM-resident

    def copy_chain(iters, v):
        def body(_, v):
            return v + 1.0  # read + write the full buffer per iter

        return jax.lax.fori_loop(0, iters, body, v)[0]

    peaks["hbm_gbps"] = _delta_rate(
        copy_chain, 2.0 * big.size * 4, 2, 18, big) / 1e9
    return peaks


def measure_sweep_rates(k: int = 64, c_pad: int = 256,
                        m: int = 512, repeats: int = 5) -> dict:
    """Calibrate the sweep kernel's OWN best-case step rates by running
    the real kernel on synthetic always-enter chain scenes:

    - internal chain: every node is internal with an everything-box, so
      every ray walks all m nodes -> per-NODE-step cost with zero
      divergence (the kernel skeleton's speed of light),
    - leaf chain: every node is an always-hit leaf -> per-LEAF-step cost
      (adds the one-hot matvec + K-wide Möller–Trumbore).

    These are exact upper bounds for the kernel as built: a real workload
    whose tiles execute S node steps and L leaf steps cannot run faster
    than (S-L)*step_ns + L*leaf_ns. sol_pct measured against this is
    workload efficiency (divergence + paging + sort quality), cleanly
    separated from "is the skeleton itself fast" (step_ns, reported).
    """
    import jax
    import jax.numpy as jnp

    from dustraytracer_tpu.accel.cluster import ClusterBvh
    from dustraytracer_tpu.ops.traverse_sweep import traverse_cluster_sweep

    big = 1e30
    # enough tiles that the m2-m1 step-count delta dwarfs the ~10-30 ms
    # tunnel timing jitter (32 tiles x 896 steps x O(us) >> jitter)
    n_rays = 32 * TILE

    def chain(leaf: bool):
        node_min = np.full((m, 3), -big, np.float32)
        node_max = np.full((m, 3), big, np.float32)
        skip = np.arange(1, m + 1, dtype=np.int32)  # i -> i+1; last -> m
        if leaf:
            cluster = np.zeros(m, np.int32)  # all leaves, cluster 0
        else:
            cluster = np.full(m, -1, np.int32)  # all internal
        v0 = np.zeros((c_pad, k, 3), np.float32)
        e1 = np.zeros((c_pad, k, 3), np.float32)
        e2 = np.zeros((c_pad, k, 3), np.float32)
        # degenerate triangles: det == 0 -> never a hit, so rays never
        # terminate early and every node is stepped
        tri_idx = np.full((c_pad, k), -1, np.int32)
        return ClusterBvh(
            node_min=jnp.asarray(node_min), node_max=jnp.asarray(node_max),
            node_skip=jnp.asarray(skip), node_cluster=jnp.asarray(cluster),
            v0=jnp.asarray(v0), e1=jnp.asarray(e1), e2=jnp.asarray(e2),
            tri_idx=jnp.asarray(tri_idx), n_nodes=m, n_clusters=1, k=k)

    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-1, 1, (n_rays, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(n_rays, 3)).astype(np.float32))

    def _time(cb):
        trav = jax.jit(lambda o, d: jnp.sum(
            traverse_cluster_sweep(cb, o, d)["t"]))
        float(trav(o, d))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(trav(o, d))
            best = min(best, time.perf_counter() - t0)
        return best

    n_tiles = n_rays // TILE
    m1, m2 = 64, m  # delta cancels the fixed dispatch latency

    def rate(leaf):
        nonlocal m
        m_save = m
        m = m1
        t1 = _time(chain(leaf))
        m = m2
        t2 = _time(chain(leaf))
        m = m_save
        return max(t2 - t1, 1e-9) / ((m2 - m1) * n_tiles)

    step_s = rate(leaf=False)
    leaf_s = rate(leaf=True)
    return {"step_ns": step_s * 1e9,
            "leaf_step_ns": max(leaf_s, step_s) * 1e9}


def _sorted_rays(cluster, origin, direction):
    """Sort rays exactly as the integrator's _sorted_tracers does."""
    import jax.numpy as jnp

    from dustraytracer_tpu.render.integrator import ray_sort_key

    lo = jnp.asarray(cluster.node_min[0])
    hi = jnp.asarray(cluster.node_max[0])
    key = np.asarray(ray_sort_key(lo, hi, jnp.asarray(origin),
                                  jnp.asarray(direction)))
    perm = np.argsort(key, kind="stable")
    return origin[perm], direction[perm]


def _sim_tile(tabs, o, d):
    """Numpy replay of the sweep walk for ONE tile of rays. Returns
    (visited (T, m) bool, leaf_visits (T,))."""
    node_min, node_max, skip, ncl, v0, e1, e2, tri_idx, m = tabs
    n = o.shape[0]
    inv_d = 1.0 / d
    node = np.zeros(n, np.int64)
    hit_t = np.full(n, 3.4e38)
    visited = np.zeros((n, m), bool)
    leaf_visits = np.zeros(n, np.int64)

    while True:
        active = node < m
        if not active.any():
            break
        nd = np.where(active, node, 0)
        visited[active, nd[active]] = True

        bmin = node_min[nd]
        bmax = node_max[nd]
        t0 = (bmin - o) * inv_d
        t1 = (bmax - o) * inv_d
        tlo = np.fmin(t0, t1).max(axis=1)
        thi = np.fmax(t0, t1).min(axis=1)
        t_enter = np.maximum(tlo, 0.0)
        box_hit = (t_enter <= thi) & (thi >= 0.0)
        enter = active & box_hit & (t_enter < hit_t)
        is_leaf = ncl[nd] >= 0

        # leaf: intersect the cluster's K triangles (for distance culling)
        lf = enter & is_leaf
        if lf.any():
            leaf_visits[lf] += 1
            cl = ncl[nd[lf]]
            lv0, le1, le2 = v0[cl], e1[cl], e2[cl]  # (L, K, 3)
            ld = d[lf][:, None, :]
            lo_ = o[lf][:, None, :]
            p = np.cross(ld, le2)
            det = (le1 * p).sum(-1)
            par = np.abs(det) < 1e-6
            inv = 1.0 / np.where(par, 1.0, det)
            tv = lo_ - lv0
            u = inv * (tv * p).sum(-1)
            q = np.cross(tv, le1)
            v = inv * (ld * q).sum(-1)
            tt = inv * (le2 * q).sum(-1)
            ok = (~par) & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) \
                & (tt > 1e-6) & (tri_idx[cl] >= 0)
            tt = np.where(ok, tt, 3.4e38)
            best = tt.min(axis=1)
            hit_t[lf] = np.minimum(hit_t[lf], best)

        nxt = np.where(enter & ~is_leaf, nd + 1, skip[nd])
        node = np.where(active, nxt, node)
    return visited, leaf_visits


def walk_stats(cluster, origin, direction, max_tiles: int = 64) -> dict:
    """Exact numpy replay of the sweep traversal on the FULL sorted wave,
    simulating a uniform sample of whole 512-lane tiles (tile composition
    — the thing kernel wall time follows — is preserved exactly).

    Returns per-tile executed step counts (union of visited nodes) and
    per-ray useful visit counts. `cluster` is a ClusterBvh."""
    o_all = np.asarray(origin, np.float32)
    d_all = np.asarray(direction, np.float32)
    o_all, d_all = _sorted_rays(cluster, o_all, d_all)
    n = o_all.shape[0]
    n_tiles = max(n // TILE, 1)
    stride = max(n_tiles // max_tiles, 1)
    pick = list(range(0, n_tiles, stride))[:max_tiles]

    node_min = np.asarray(cluster.node_min, np.float64)
    node_max = np.asarray(cluster.node_max, np.float64)
    skip = np.asarray(cluster.node_skip)
    ncl = np.asarray(cluster.node_cluster)
    m = cluster.n_nodes
    skip = np.where(skip < 0, m, skip)
    tabs = (node_min, node_max, skip, ncl,
            np.asarray(cluster.v0, np.float64),
            np.asarray(cluster.e1, np.float64),
            np.asarray(cluster.e2, np.float64),
            np.asarray(cluster.tri_idx), m)

    is_leaf_node = ncl[:m] >= 0  # node tables are padded past n_nodes
    tile_steps = np.zeros(len(pick), np.int64)
    tile_leaf_steps = np.zeros(len(pick), np.int64)
    visits_sum = 0.0
    leaf_sum = 0.0
    n_sim = 0
    for j, t in enumerate(pick):
        o = o_all[t * TILE:(t + 1) * TILE].astype(np.float64)
        d = d_all[t * TILE:(t + 1) * TILE].astype(np.float64)
        visited, leaf_visits = _sim_tile(tabs, o, d)
        uni = visited.any(axis=0)
        tile_steps[j] = int(uni.sum())
        tile_leaf_steps[j] = int((uni & is_leaf_node).sum())
        visits_sum += float(visited.sum())
        leaf_sum += float(leaf_visits.sum())
        n_sim += o.shape[0]

    return {
        "n_rays": n_sim,
        "tile_steps": tile_steps,
        "tile_leaf_steps": tile_leaf_steps,
        "mean_visits_per_ray": visits_sum / max(n_sim, 1),
        "mean_leaf_visits_per_ray": leaf_sum / max(n_sim, 1),
    }


def sweep_sol(stats: dict, peaks: dict, k: int, c_pad: int) -> dict:
    """Price the sweep kernel's work at measured peaks -> SoL rays/s.

    Units: SLAB_OPS/MT_OPS count VPU *operations* (mul, sub, min, max,
    cmp, select — one issue slot each). The measured vpu peak is in
    FLOP/s where one fused multiply-add = 2 FLOPs = ONE op, so the op
    rate is flops/2. (Before this correction the model under-priced VPU
    work 2x and measured kernels "exceeded" speed-of-light.)"""
    vpu = peaks["vpu_f32_tflops"] * 1e12 / 2.0  # ops/s, see docstring
    mxu = peaks["mxu_f32_highest_tflops"] * 1e12
    hbm = peaks["hbm_gbps"] * 1e9
    n = stats["n_rays"]

    steps = float(stats["tile_steps"].sum())
    leaf_steps = float(stats["tile_leaf_steps"].sum())

    # executed work (what the kernel actually runs)
    vpu_flops = steps * TILE * SLAB_OPS + leaf_steps * TILE * k * MT_OPS
    mxu_flops = leaf_steps * 2.0 * (10 * k) * c_pad
    io_bytes = n * OUT_BYTES_PER_RAY
    t_exec = max(vpu_flops / vpu, mxu_flops / mxu, io_bytes / hbm)

    # ideal work (perfect lane coherence: every lane busy every step)
    u_vpu = n * (stats["mean_visits_per_ray"] * SLAB_OPS
                 + stats["mean_leaf_visits_per_ray"] * k * MT_OPS)
    u_mxu = (n * stats["mean_leaf_visits_per_ray"] / TILE
             * 2.0 * (10 * k) * c_pad)
    t_ideal = max(u_vpu / vpu, u_mxu / mxu, io_bytes / hbm)

    bound = ["vpu", "mxu", "hbm"][int(np.argmax(
        [vpu_flops / vpu, mxu_flops / mxu, io_bytes / hbm]))]
    return {
        "sol_rays_per_s": n / t_exec,
        "sol_rays_per_s_ideal": n / t_ideal,
        "bound": bound,
        "executed_vpu_gflops_per_mray": vpu_flops / n / 1e3,
        "executed_mxu_gflops_per_mray": mxu_flops / n / 1e3,
        "mean_tile_steps": float(stats["tile_steps"].mean()),
        "mean_visits_per_ray": stats["mean_visits_per_ray"],
        "lane_occupancy": (n * stats["mean_visits_per_ray"]
                           / max(stats["tile_steps"].sum() * TILE, 1)),
    }


def sol_report(measured_rays_per_s: float, stats: dict, peaks: dict,
               k: int, c_pad: int, rates: dict | None = None) -> dict:
    """sol_pct definitions:

    - with `rates` (from measure_sweep_rates, same k/c_pad): measured
      throughput vs the kernel's OWN calibrated zero-divergence step
      rates applied to the exact executed step counts — a true upper
      bound for the kernel as built, so sol_pct <= ~100 by construction.
      This is the headline number.
    - analytic_* : the raw-arithmetic model priced at measured machine
      peaks (kept as a diagnostic; its VPU-op pricing carries real
      calibration uncertainty on small (1, TILE) vectors).
    """
    s = sweep_sol(stats, peaks, k, c_pad)
    s["measured_rays_per_s"] = measured_rays_per_s
    s["analytic_sol_pct"] = 100.0 * measured_rays_per_s / s["sol_rays_per_s"]
    s["analytic_sol_pct_ideal"] = (100.0 * measured_rays_per_s
                                   / s["sol_rays_per_s_ideal"])
    if rates is not None:
        steps = stats["tile_steps"].astype(np.float64)
        leafs = stats["tile_leaf_steps"].astype(np.float64)
        t_model = ((steps - leafs).sum() * rates["step_ns"]
                   + leafs.sum() * rates["leaf_step_ns"]) * 1e-9
        model_rays_per_s = stats["n_rays"] / max(t_model, 1e-12)
        s["kernel_step_ns"] = round(rates["step_ns"], 1)
        s["kernel_leaf_step_ns"] = round(rates["leaf_step_ns"], 1)
        s["sol_rays_per_s_kernel"] = model_rays_per_s
        s["sol_pct"] = 100.0 * measured_rays_per_s / model_rays_per_s
    else:
        s["sol_pct"] = s["analytic_sol_pct"]
    s["sol_pct_ideal"] = s["analytic_sol_pct_ideal"]
    return s
