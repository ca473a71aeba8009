"""Surface solver + implicit gradients: on an analytic sphere SDF with an
analytic (rigid) deformer, the solver must land on ray/surface
intersections, and the implicit adjoint must match finite differences of
the true parametric solution."""

import numpy as np
import jax
import jax.numpy as jnp

from recmv_tpu.core.surface_ps import (
    make_implicit_surface_adjoint,
    optimize_surface_points,
    ray_constraint,
)


def make_sphere_problem(radius=0.7, trans=np.zeros(3)):
    trans = jnp.asarray(trans, jnp.float32)

    def sdf_fn(pts):
        return jnp.linalg.norm(pts, axis=-1) - radius

    def deform_fn(pts):
        return pts + trans

    return sdf_fn, deform_fn


class TestSurfaceSolver:
    def test_converges_to_sphere_ray_intersection(self):
        sdf_fn, deform_fn = make_sphere_problem()
        cam = np.asarray([0.0, 0.0, -3.0])
        rng = np.random.RandomState(0)
        # rays toward the sphere; seeds = true intersections + small noise
        # (the solver refines rasterizer seeds that are already within a
        # pixel of the right ray — it is a local method, like the
        # reference's ≤20 Newton-ish steps)
        targets = rng.randn(64, 3) * 0.15
        rays = targets - cam
        rays = rays / np.linalg.norm(rays, axis=1, keepdims=True)
        # exact ray-sphere intersection (near hit)
        b = 2 * (cam * rays).sum(1)
        cc = (cam * cam).sum() - 0.7**2
        tt = (-b - np.sqrt(b * b - 4 * cc)) / 2
        seeds = cam + tt[:, None] * rays
        seeds = seeds + rng.randn(64, 3) * 2e-3
        rays = jnp.asarray(rays, jnp.float32)
        seeds = jnp.asarray(seeds, jnp.float32)
        cam = jnp.asarray(cam, jnp.float32)
        pts, conv = optimize_surface_points(
            sdf_fn, deform_fn, cam, rays, seeds, jnp.ones(64, bool),
            dthreshold=5e-4, athreshold_deg=0.05, times=20,
        )
        pts = np.asarray(pts)
        conv = np.asarray(conv)
        # the reference's thresholds (5e-5 / camera angThred ≈ 0.023°) also
        # leave a tail unconverged; what matters is surface+ray accuracy
        assert conv.mean() > 0.8, conv.mean()
        np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 0.7, atol=1e-3)
        d = pts - np.asarray(cam)
        ang = np.degrees(
            np.arcsin(np.clip(np.linalg.norm(np.cross(d, np.asarray(rays)), axis=1)
                              / np.linalg.norm(d, axis=1), 0, 1))
        )
        assert np.median(ang) < 0.05 and ang.max() < 0.1, (np.median(ang), ang.max())

    def test_respects_valid_mask(self):
        sdf_fn, deform_fn = make_sphere_problem()
        cam = jnp.asarray([0.0, 0.0, -3.0])
        rays = jnp.asarray([[0.0, 0.0, 1.0]] * 4, jnp.float32)
        seeds = jnp.asarray([[0, 0, -0.7]] * 4, jnp.float32) + 0.01
        valid = jnp.asarray([True, False, True, False])
        pts, conv = optimize_surface_points(
            sdf_fn, deform_fn, cam, rays, seeds, valid, times=10
        )
        conv = np.asarray(conv)
        assert not conv[1] and not conv[3]


class TestImplicitAdjoint:
    def test_matches_analytic_sphere_derivative(self):
        # Parametric problem: sdf_r(p) = |p| - r, deformer identity,
        # camera at origin-side; ray through origin along +z. Solution
        # p*(r) = cam + t r̂ with |p*| = r → for the straight-through-origin
        # ray p* = (0, 0, -3 + (3 - r)) = (0,0,-r). dL/dr for L = p*_z is
        # exactly -(-1) ... analytic: p*_z(r) = -r → dp*_z/dr = -1.
        cam = jnp.asarray([0.0, 0.0, -3.0])
        ray = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)

        def sdf_fn(params, pts):
            return jnp.linalg.norm(pts, axis=-1) - params["r"]

        def constraint_fn(params, pts):
            return ray_constraint(pts + params["shift"], cam, ray)

        attach = make_implicit_surface_adjoint(sdf_fn, constraint_fn)

        def solve(r):
            # closed-form intersection point for the test
            return jnp.asarray([[0.0, 0.0, -r]], jnp.float32)

        def loss(params):
            p_star = jax.lax.stop_gradient(solve(params["r"]))
            p = attach(params, p_star)
            return jnp.sum(p[:, 2])

        params = {"r": jnp.asarray(0.7), "shift": jnp.zeros(3)}
        g = jax.grad(loss)(params)
        # analytic dL/dr = -1
        np.testing.assert_allclose(float(g["r"]), -1.0, atol=1e-4)

    def test_matches_exact_solution_derivative(self):
        # Deformer D(p) = p + s ê_x on a radius-r sphere, off-axis ray.
        # The exact canonical intersection p*(r, s) solves
        # |p| = r and p + s ê_x on the ray — solvable in closed form with
        # brentq, giving exact finite differences to validate the adjoint
        # (FD *through the iterative solver* is too noisy — its residual
        # oscillates at the 1e-4 level).
        from scipy.optimize import brentq

        cam_np = np.array([0.0, 0.0, -3.0])
        v = np.array([0.05, 0.02, 1.0])
        v = v / np.linalg.norm(v)
        x = np.array([1.0, 0.0, 0.0])
        cam = jnp.asarray(cam_np, jnp.float32)
        ray = jnp.asarray(v[None], jnp.float32)
        w = np.array([1.0, 0.7, -0.3])

        def solve_exact(r, s):
            f = lambda t: np.linalg.norm(cam_np + t * v - s * x) - r
            t = brentq(f, 1.5, 2.5)
            return cam_np + t * v - s * x

        def sdf_fn(params, pts):
            return jnp.linalg.norm(pts, axis=-1) - params["r"]

        def deform(params, pts):
            return pts + jnp.stack([params["s"], 0.0 * params["s"], 0.0 * params["s"]])

        def constraint_fn(params, pts):
            return ray_constraint(deform(params, pts), cam, ray)

        attach = make_implicit_surface_adjoint(sdf_fn, constraint_fn)
        r0, s0 = 0.7, 0.0
        p_star = jnp.asarray(solve_exact(r0, s0)[None], jnp.float32)

        def loss(params):
            p = attach(params, p_star)
            return jnp.sum(p * jnp.asarray(w[None], jnp.float32))

        g = jax.grad(loss)({"r": jnp.asarray(r0), "s": jnp.asarray(s0)})

        eps = 1e-6
        fd_r = (w @ solve_exact(r0 + eps, s0) - w @ solve_exact(r0 - eps, s0)) / (2 * eps)
        fd_s = (w @ solve_exact(r0, s0 + eps) - w @ solve_exact(r0, s0 - eps)) / (2 * eps)
        np.testing.assert_allclose(float(g["r"]), fd_r, rtol=1e-3)
        np.testing.assert_allclose(float(g["s"]), fd_s, rtol=1e-3)

    def test_solver_plus_adjoint_end_to_end(self):
        # seeds near the true ray (rasterizer regime) → solver lands close
        # enough that the adjoint is accurate to a few percent
        from scipy.optimize import brentq

        cam_np = np.array([0.0, 0.0, -3.0])
        v = np.array([0.05, 0.02, 1.0])
        v = v / np.linalg.norm(v)
        cam = jnp.asarray(cam_np, jnp.float32)
        ray = jnp.asarray(v[None], jnp.float32)
        w = np.array([1.0, 0.7, -0.3])
        r0 = 0.7
        f = lambda t: np.linalg.norm(cam_np + t * v) - r0
        p_exact = cam_np + brentq(f, 1.5, 2.5) * v

        def sdf_fn(params, pts):
            return jnp.linalg.norm(pts, axis=-1) - params["r"]

        def constraint_fn(params, pts):
            return ray_constraint(pts, cam, ray)

        attach = make_implicit_surface_adjoint(sdf_fn, constraint_fn)
        params = {"r": jnp.asarray(r0)}
        seed = jnp.asarray((p_exact + np.array([1e-3, -5e-4, 2e-3]))[None], jnp.float32)
        pts, conv = optimize_surface_points(
            lambda p: sdf_fn(params, p), lambda p: p, cam, ray, seed,
            jnp.ones(1, bool), times=20,
        )

        def loss(prm):
            return jnp.sum(attach(prm, pts) * jnp.asarray(w[None], jnp.float32))

        g = jax.grad(loss)(params)
        eps = 1e-6
        fs = lambda r: (cam_np + brentq(lambda t: np.linalg.norm(cam_np + t * v) - r, 1.5, 2.5) * v) @ w
        fd_r = (fs(r0 + eps) - fs(r0 - eps)) / (2 * eps)
        np.testing.assert_allclose(float(g["r"]), fd_r, rtol=5e-2)
