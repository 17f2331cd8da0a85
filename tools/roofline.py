"""Mega-kernel roofline model: where 4M+ solves/s sits vs the v5e ceilings.

Analytic FLOP/byte counts for one tick of the whole-tick Pallas mega-kernel
(pallas/mhe_replay_kernel.py) at a given MHE shape, combined with a measured
rate to report achieved GFLOP/s / GB/s against the chip's nominal ceilings
and identify the binding resource. Run standalone for the model plus an
optional on-device chunk-size sweep:

    python tools/roofline.py [--sweep] [--B 1024] [--T 200]

Ceiling assumptions (printed with results): TPU v5e (v5 lite) nominal HBM
bandwidth 819 GB/s; VPU f32 vector throughput ~3.9 TFLOP/s (8x128 lanes x
4 ALUs x ~0.94 GHz). The kernel is pure VPU work — the (9,9) blocks never
touch the MXU (they are far below the 128x128 systolic tile; batching rides
the 128-lane axis instead), so the MXU ceiling is irrelevant by design.
"""

from __future__ import annotations

import argparse
import os
import sys

# runnable as `python tools/roofline.py` without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = 819.0          # v5e nominal
VPU_GFLOPS = 3900.0       # 8*128 lanes * 4 ALUs * ~0.94 GHz, f32


def _gj_inv_flops(s: int) -> float:
    """Unrolled Gauss-Jordan on (s, 2s) augmented rows: per pivot one row
    divide (2s) + s-1 row eliminations (2 ops x 2s each)."""
    return s * (2 * s + (s - 1) * 2 * 2 * s)


def _matmul_flops(s: int) -> float:
    return 2 * s * s * s


def _matvec_flops(s: int) -> float:
    return 2 * s * s


def tick_model(N=20, s=9, m=12, L=4, chunk=64, dtype_bytes=4):
    """FLOPs and HBM bytes for ONE tick of ONE lane in the mega-kernel
    (r05: incremental assembly caches — the per-slot AᵀQd/AᵀQdA/HᵀRH terms
    are ring-cached and only the two changed slots are recomputed per tick;
    validated by measured ablation, tools/roofline.py --ablate)."""
    # ---- window solve (forward Thomas only — backward sweep elided) -----
    solve = N * (_gj_inv_flops(s) + _matmul_flops(s) + _matmul_flops(s)
                 + 3 * _matvec_flops(s))
    # cache UPDATE per tick: fresh slot's HtR/HtRH (zero-skipped selector)
    # + new-dynamics slot's AtQd/AtQdA + rhs matvecs
    cache_upd = (2 * _matmul_flops(s) + 2 * 2 * s * m * s
                 + 2 * _matvec_flops(s))
    # per-slot residual work in the solve loop: cam selector picks (~tiny),
    # Qd_b matvec, and (s,s) adds/masks
    assemble = N * (_matvec_flops(s) + 4 * 2 * 3 * s + 4 * s * s)
    # ---- marginalization: one Schur complement at (s,s) -----------------
    marg = (_gj_inv_flops(s) + 4 * _matmul_flops(s) + 6 * _matvec_flops(s))
    # ---- dynamics/measurement build: R-congruences, 3x3 inverses --------
    build = (L + 4) * (2 * _matmul_flops(3) * 3 + 60) + _gj_inv_flops(6)
    flops = solve + cache_upd + assemble + marg + build

    # ---- HBM traffic ----------------------------------------------------
    inputs = (9 + 3 + 3 + 3 * L + 9 * L + 3 * L + L + 3) * dtype_bytes
    out_x = s * dtype_bytes
    state_floats = (N * m + N * m * m + 2 * N * s * s + N * s + N * 3
                    + N * 9 + N + s * s + s + 12 + 3 + 9 + 3 + L
                    + 2 * N * s * s + N * s)   # assembly caches
    state_amortized = 2 * state_floats * dtype_bytes / chunk
    bytes_per_tick = inputs + out_x + state_amortized
    return {
        "flops_per_tick": flops,
        "bytes_per_tick": bytes_per_tick,
        "state_bytes": state_floats * dtype_bytes,
        "intensity": flops / bytes_per_tick,
    }


def report(rate_ticks_per_s: float, N=20, s=9, m=12, L=4, chunk=64,
           file=sys.stderr):
    """Print achieved vs ceiling for a measured mega-kernel rate."""
    mdl = tick_model(N=N, s=s, m=m, L=L, chunk=chunk)
    gflops = rate_ticks_per_s * mdl["flops_per_tick"] / 1e9
    gbps = rate_ticks_per_s * mdl["bytes_per_tick"] / 1e9
    vpu_frac = gflops / VPU_GFLOPS
    hbm_frac = gbps / HBM_GBPS
    bound = "VPU-compute" if vpu_frac > hbm_frac else "HBM-bandwidth"
    print(
        f"roofline (N={N},s={s},chunk={chunk}): {mdl['flops_per_tick']/1e3:.0f} "
        f"kFLOP/tick, {mdl['bytes_per_tick']:.0f} B/tick HBM "
        f"(intensity {mdl['intensity']:.0f} FLOP/B) -> achieved "
        f"{gflops:.0f} GFLOP/s ({100*vpu_frac:.0f}% of ~{VPU_GFLOPS/1e3:.1f} "
        f"TFLOP/s VPU f32), {gbps:.1f} GB/s ({100*hbm_frac:.1f}% of "
        f"{HBM_GBPS:.0f} GB/s HBM) — {bound}-bound; MXU idle by design "
        f"(s={s} blocks ride the 128-lane VPU axis)", file=file)
    return {"gflops": gflops, "gbps": gbps, "vpu_frac": vpu_frac,
            "hbm_frac": hbm_frac, "bound": bound}


def chunk_sweep(B=1024, T=200, chunks=(16, 32, 64, 128, 200)):
    """On-device chunk-size sweep of the MHE-only mega-kernel."""
    import time

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_bench_cache")
    from decentralized_ekf_mhe_tpu.io import synth
    from decentralized_ekf_mhe_tpu.ops import estimator
    from decentralized_ekf_mhe_tpu.parallel import batch as batch_lib

    from bench import _params

    params = _params()
    log = synth.generate(synth.SynthConfig(T=T, seed=0))
    data = estimator.tickdata_from_log(log, dtype=jnp.float32)
    vo = estimator.vodata_from_log(log, dtype=jnp.float32)
    data_b = batch_lib.to_time_leading(batch_lib.perturb_log_batch(
        data, B, jax.random.PRNGKey(0), dtype=jnp.float32))
    results = {}
    for ch in chunks:
        if ch >= T:
            continue
        fn = jax.jit(batch_lib.make_lanes_fleet_runner(
            params, jnp.float32, use_megakernel=True, megakernel_chunk=ch))
        try:
            t0 = time.time()
            x, _ = fn(data_b, vo)
            float(jnp.sum(x[-1]))
            comp = time.time() - t0
            best = float("inf")
            for rep in range(3):
                db = data_b._replace(accel_b=data_b.accel_b + (rep + 1) * 1e-7)
                t0 = time.time()
                x, _ = fn(db, vo)
                float(jnp.sum(x[-1]))
                best = min(best, time.time() - t0)
            rate = B * (T - 1) / best
            results[ch] = rate
            print(f"chunk={ch:4d}: {rate:,.0f} solves/s "
                  f"(compile {comp:.1f}s)", file=sys.stderr)
            report(rate, chunk=ch)
        except Exception as e:
            print(f"chunk={ch}: failed {type(e).__name__}: {e}",
                  file=sys.stderr)
    return results


def _bench_fleet(B, T):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_bench_cache")
    from decentralized_ekf_mhe_tpu.io import synth
    from decentralized_ekf_mhe_tpu.ops import estimator
    from decentralized_ekf_mhe_tpu.parallel import batch as batch_lib

    from bench import _params

    params = _params()
    log = synth.generate(synth.SynthConfig(T=T, seed=0))
    data = estimator.tickdata_from_log(log, dtype=jnp.float32)
    vo = estimator.vodata_from_log(log, dtype=jnp.float32)
    data_b = batch_lib.to_time_leading(batch_lib.perturb_log_batch(
        data, B, jax.random.PRNGKey(0), params, dtype=jnp.float32))
    return params, data_b, vo


def trace_capture(B=1024, T=200, chunk=64, outdir="/tmp/dem_trace"):
    """Measured validation of the analytic model (VERDICT r04 #9): capture a
    jax.profiler trace of the mega-kernel fleet replay, parse the xplane
    with jax.profiler.ProfileData, and report per-op device time — the
    measured share of wall time inside the Pallas kernel (vs gaps/XLA glue)
    and the kernel's achieved occupancy."""
    import time

    import jax
    import jax.numpy as jnp

    params, data_b, vo = _bench_fleet(B, T)
    from decentralized_ekf_mhe_tpu.parallel import batch as batch_lib

    fn = jax.jit(batch_lib.make_lanes_fleet_runner(
        params, jnp.float32, use_megakernel=True, megakernel_chunk=chunk))
    x, _ = fn(data_b, vo)                      # compile outside the trace
    float(jnp.sum(x[-1]))
    t0 = time.time()
    with jax.profiler.trace(outdir):
        db = data_b._replace(accel_b=data_b.accel_b + 1e-7)
        x, _ = fn(db, vo)
        float(jnp.sum(x[-1]))
    wall = time.time() - t0

    import glob
    import gzip

    files = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not files:
        print("no xplane capture found (tracing unsupported on this "
              "backend?)", file=sys.stderr)
        return None
    data = open(files[-1], "rb").read()
    try:
        pd = jax.profiler.ProfileData.from_serialized_xspace(data)
    except Exception:
        pd = jax.profiler.ProfileData.from_file(files[-1])
    per_op = {}
    dev_planes = []
    for plane in pd.planes:
        if "TPU" in plane.name or "Device" in plane.name:
            dev_planes.append(plane.name)
            for line in plane.lines:
                for ev in line.events:
                    name = ev.name
                    dur = ev.duration_ns
                    per_op[name] = per_op.get(name, 0.0) + dur
    if not per_op:
        print(f"no device events found; planes = "
              f"{[p.name for p in pd.planes]}", file=sys.stderr)
        return None
    total = sum(per_op.values())
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:8]
    print(f"trace: wall {wall*1e3:.1f} ms, device planes {dev_planes}, "
          f"total device-event time {total/1e6:.1f} ms", file=sys.stderr)
    for name, dur in top:
        print(f"  {dur/1e6:8.2f} ms  {100*dur/total:5.1f}%  {name[:90]}",
              file=sys.stderr)
    rate = B * (T - 1) / wall
    kern = sum(d for n, d in per_op.items()
               if "fusion" in n or "custom" in n.lower() or "mhe" in n.lower()
               or "wrapped" in n.lower())
    print(f"  -> measured rate this step {rate:,.0f} ticks/s; kernel-ish "
          f"events {kern/1e6:.1f} ms = {100*kern/max(total,1):.0f}% of "
          f"device time", file=sys.stderr)
    return {"wall_s": wall, "per_op_ms": {n: d / 1e6 for n, d in top}}


def ablation(B=1024, T=200, chunk=64):
    """Per-stage cycle attribution by measured ablation deltas: re-time the
    mega-kernel with one stage skipped (pallas/mhe_replay_kernel.py
    ``ablate``); full-minus-ablated ≈ that stage's share. Output of ablated
    kernels is wrong by construction — timing only."""
    import time

    import jax
    import jax.numpy as jnp

    params, data_b, vo = _bench_fleet(B, T)
    from decentralized_ekf_mhe_tpu.ops import mhe
    from decentralized_ekf_mhe_tpu.parallel import batch as batch_lib
    from decentralized_ekf_mhe_tpu.pallas import mhe_replay_kernel as mrk

    c = mhe.make_consts(params, jnp.float32)
    data_l = batch_lib.tickdata_to_lanes(data_b)

    def timeit(ablate):
        fn = jax.jit(lambda d, v: mrk.replay(c, d, v, dtype=jnp.float32,
                                             chunk=chunk, ablate=ablate))
        x = fn(data_l, vo)
        float(jnp.sum(x[-1]))
        best = float("inf")
        for rep in range(3):
            db = data_l._replace(accel_b=data_l.accel_b + (rep + 1) * 1e-7)
            t0 = time.time()
            x = fn(db, vo)
            float(jnp.sum(x[-1]))
            best = min(best, time.time() - t0)
        return best

    full = timeit("")
    print(f"ablation (B={B}, T={T}, chunk={chunk}): full "
          f"{full*1e3:.1f} ms -> {B*(T-1)/full:,.0f} ticks/s",
          file=sys.stderr)
    shares = {}
    for stage in ("solve", "assembly", "marg", "build", "ingest"):
        t = timeit(stage)
        shares[stage] = (full - t) / full
        print(f"  minus {stage:9s}: {t*1e3:7.1f} ms  -> stage share "
              f"{100*shares[stage]:5.1f}% of the tick", file=sys.stderr)
    ranked = sorted(shares.items(), key=lambda kv: -kv[1])
    print(f"  top cycle sinks: "
          + ", ".join(f"{n} {100*v:.0f}%" for n, v in ranked[:3]),
          file=sys.stderr)
    return shares


def constrained_sweep(B=1024, T=2000, iters_list=(5, 10, 20, 40)):
    """Measured cost attribution for the CONSTRAINED mega-kernel: time the
    per-tick box-ADMM at several iteration budgets (polish on/off); the
    slope is the per-iteration sweep cost, the intercept is
    assembly + factorization (+ polish when on). Output is rate-only —
    quality-vs-budget lives in tools/constrained_budget_study.py."""
    import time

    import numpy as np
    import jax
    import jax.numpy as jnp

    params, data_b, vo = _bench_fleet(B, T)
    from decentralized_ekf_mhe_tpu.ops import mhe
    from decentralized_ekf_mhe_tpu.parallel import batch as batch_lib

    s = params.dim_state
    x_lb = np.full(s, -np.inf); x_lb[3:6] = -0.3
    x_ub = np.full(s, np.inf); x_ub[3:6] = 0.3
    rows = []
    for polish in (True, False):
        for iters in iters_list:
            params.osqp.abs_tol = 1e-6
            params.osqp.relative_tol = 1e-6
            params.osqp.rho = 5000.0
            params.osqp.adapt_rho = False
            params.osqp.polish = polish
            c = mhe.make_consts(params, jnp.float32, x_lb=x_lb, x_ub=x_ub,
                                admm_iters=iters, use_pallas=True)
            fn = jax.jit(batch_lib.make_lanes_fleet_runner(
                params, jnp.float32, use_megakernel=True, consts=c))
            x, _ = fn(data_b, vo)
            float(jnp.sum(x[0][-1])) if isinstance(x, tuple) else float(
                jnp.sum(x[-1]))
            best = float("inf")
            for rep in range(3):
                db = data_b._replace(
                    accel_b=data_b.accel_b + (rep + 1) * 1e-7)
                t0 = time.time()
                x, _ = fn(db, vo)
                float(jnp.sum(x[-1]))
                best = min(best, time.time() - t0)
            per_tick_us = best / (B * (T - 1)) * 1e6 * 128  # per lane-tile
            rows.append((polish, iters, best, per_tick_us))
            print(f"polish={int(polish)} iters={iters:3d}: "
                  f"{B*(T-1)/best:,.0f} solves/s "
                  f"({per_tick_us:.2f} us/tile-tick)", file=sys.stderr)
    # least-squares slope over the polish=False rows
    npf = [(it, r[3]) for r in rows for it in [r[1]] if not r[0]]
    if len(npf) >= 2:
        its = np.array([a for a, _ in npf]); ts = np.array([b for _, b in npf])
        slope, intercept = np.polyfit(its, ts, 1)
        print(f"per-ADMM-iteration cost {slope:.3f} us/tile-tick; "
              f"assembly+factor intercept {intercept:.2f} us "
              f"(polish adds "
              f"{rows[0][3] - [r for r in rows if not r[0] and r[1] == rows[0][1]][0][3]:.2f} us)",
              file=sys.stderr)
    return rows


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--ablate", action="store_true")
    ap.add_argument("--constrained-sweep", action="store_true")
    ap.add_argument("--B", type=int, default=1024)
    ap.add_argument("--T", type=int, default=200)
    ap.add_argument("--rate", type=float, default=None,
                    help="report for a known measured rate (ticks/s)")
    a = ap.parse_args()
    if a.rate:
        report(a.rate)
    if a.sweep:
        chunk_sweep(B=a.B, T=a.T)
    if a.trace:
        trace_capture(B=a.B, T=a.T)
    if a.ablate:
        ablation(B=a.B, T=a.T)
    if a.constrained_sweep:
        constrained_sweep(B=a.B, T=a.T)
    if not (a.rate or a.sweep or a.trace or a.ablate or a.constrained_sweep):
        m = tick_model()
        print(m)
