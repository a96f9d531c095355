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
    jax.block_until_ready(state.position)
    log(f"compile+first step: {time.time()-t0:.1f}s  cg_iters={int(diag.pressure_iterations)}")

    n = 5
    t0 = time.time()
    for _ in range(n):
        state, diag = fn(state)
    jax.block_until_ready(state.position)
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
    img = jax.block_until_ready(fn(scene, cam, cfg, jax.random.PRNGKey(0)))
    t0 = time.time()
    img = jax.block_until_ready(fn(scene, cam, cfg, jax.random.PRNGKey(1)))
    dt_wall = time.time() - t0
    rays = cfg.width * cfg.height * cfg.samples_per_pixel * cfg.max_bounces
    log(f"cornell 256^2x32spp: {dt_wall:.2f}s = {rays/dt_wall/1e6:.1f} Mrays/s")
    return rays / dt_wall


def main():
    steps_per_sec = bench_sim()
    try:
        bench_rays()
    except Exception as e:  # secondary metric must not sink the primary
        log(f"rays bench failed: {e}")
    print(
        json.dumps(
            {
                "metric": "sim_steps_per_sec_128c_apic",
                "value": round(steps_per_sec, 4),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / REFERENCE_CPU_STEPS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
