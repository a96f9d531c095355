"""Benchmark: 128^3 APIC dam-break simulation steps/sec on one TPU chip.

This is BASELINE.md config 4 (the primary metric "sim steps/sec at 128^3").
The reference publishes no numbers (BASELINE.md: "published: {}"); the
vs_baseline denominator is a fixed estimate of the reference's single-node
CPU rate at this scale — 1.0 time_step/s for 128^3 with ~2M particles
(extrapolated from its interactive 50^3 default scale and the serial
MIC(0)-PCG dominating at large grids, SURVEY.md §6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Secondary numbers (rays/sec on the Cornell scene) go to stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    """Drain the device queue: under the axon remote backend
    jax.block_until_ready does NOT wait for execution — only a device->host
    fetch does."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[tuple(0 for _ in leaf.shape)])

REFERENCE_CPU_STEPS_PER_SEC = 1.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_sim():
    from libfluid_tpu.config import SimConfig, TransferScheme
    from libfluid_tpu.sim import new_state, seed_box, substep

    cfg = SimConfig(
        grid_size=(128, 128, 128),
        cell_size=1.0,
        gravity=(0.0, -981.0, 0.0),
        particle_capacity=1 << 21,
        scheme=TransferScheme.APIC,
        has_obstacles=False,  # dam break: domain walls only
    )
    state = new_state(cfg, jax.random.PRNGKey(0))
    state = seed_box(state, cfg, (1.0, 1.0, 1.0), (63.0, 63.0, 63.0))
    log(f"seeded {int(jnp.sum(state.active))} particles on {jax.devices()[0]}")

    dt = 0.02
    fn = jax.jit(lambda s: substep(s, cfg, dt))
    t0 = time.time()
    state, diag = fn(state)
    sync(state.position)
    log(f"compile+first step: {time.time()-t0:.1f}s  cg_iters={int(diag.pressure_iterations)}")

    n = 5
    t0 = time.time()
    for _ in range(n):
        state, diag = fn(state)
    sync(state.position)
    dt_wall = (time.time() - t0) / n
    log(
        f"steady: {dt_wall*1e3:.0f} ms/step  cg={int(diag.pressure_iterations)} "
        f"res={float(diag.pressure_residual):.2e} vmax={float(diag.max_velocity):.1f}"
    )
    return 1.0 / dt_wall


def bench_rays():
    from libfluid_tpu.config import RenderConfig
    from libfluid_tpu.renderer import scenes
    from libfluid_tpu.renderer.render import render

    builder, cam = scenes.cornell_box_one_light(1.0)
    scene = builder.finish()
    cfg = RenderConfig(width=256, height=256, samples_per_pixel=32, max_bounces=5)
    fn = jax.jit(render, static_argnums=(2,))
    img = fn(scene, cam, cfg, jax.random.PRNGKey(0))
    sync(img)
    t0 = time.time()
    img = fn(scene, cam, cfg, jax.random.PRNGKey(1))
    sync(img)
    dt_wall = time.time() - t0
    rays = cfg.width * cfg.height * cfg.samples_per_pixel * cfg.max_bounces
    log(f"cornell 256^2x32spp: {dt_wall:.2f}s = {rays/dt_wall/1e6:.1f} Mrays/s")
    return rays / dt_wall


def main():
    # every sub-bench is fenced: a failure in one must not sink the other
    # (VERDICT r1: bench_rays never ran because bench_sim OOM'd the process)
    steps_per_sec = None
    rays_per_sec = None
    try:
        steps_per_sec = bench_sim()
    except Exception as e:
        log(f"sim bench failed: {type(e).__name__}: {str(e)[:500]}")
    try:
        rays_per_sec = bench_rays()
    except Exception as e:
        log(f"rays bench failed: {type(e).__name__}: {str(e)[:500]}")

    if steps_per_sec is not None:
        out = {
            "metric": "sim_steps_per_sec_128c_apic",
            "value": round(steps_per_sec, 4),
            "unit": "steps/s",
            "vs_baseline": round(steps_per_sec / REFERENCE_CPU_STEPS_PER_SEC, 4),
        }
        if rays_per_sec is not None:
            out["rays_per_sec_cornell256"] = round(rays_per_sec)
    elif rays_per_sec is not None:
        out = {
            "metric": "rays_per_sec_cornell256",
            "value": round(rays_per_sec),
            "unit": "rays/s",
            "vs_baseline": 1.0,
        }
    else:
        raise SystemExit(1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
