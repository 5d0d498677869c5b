"""Branch-free intersection kernels: ray-triangle and ray-AABB.

TPU-native re-expression of the reference's intersection core:

- ``ray_triangle_mt``: classic Möller–Trumbore with the reference's exact
  acceptance semantics (``Hare_Geometry_Polygons.cs:385-510``): determinant
  cutoff ``|det| <= 1e-6`` rejects, u/v bounds tested in det-scaled form.
  The reference flips vertex winding by ``Ray_Side`` (``:589-606``,
  ``:641-648``) and then runs a one-sided test per det sign — the composition
  is exactly a two-sided test, which is what the branch-free form computes:
  both windings collapse to sign-aware bounds checks on one determinant.
- ``ray_triangle_watertight``: Woop/Benthin/Wald 2013 watertight variant —
  the default kernel of :class:`hare_tpu.accel.SpatialPartition` for f32 TPU
  tracing (the reference is f64 everywhere; f32 needs the watertight edge
  tests to avoid cracks along shared edges).  The same test in component-major
  form drives candidate acceptance inside every accel traversal
  (``accel/common.test_windows``).
- ``ray_aabb``: slab test (``AABB_Main.cs:86-260``) in branchless form.
  The reference's second overload advances the ray origin to the box entry
  point in place; here ``ray_aabb`` returns ``(hit, t_near, t_far)`` and the
  caller advances functionally.

All functions broadcast over arbitrary leading batch dims and are pure jnp —
they fuse under jit, vmap cleanly over rays x triangles, and differentiate.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .math import cross, dot

__all__ = [
    "DET_EPS",
    "MIN_T",
    "ray_triangle_mt",
    "ray_triangle_watertight",
    "ray_aabb",
]

# Determinant cutoff: Hare_Geometry_Polygons.cs:406,417 (0.000001).
DET_EPS = 1e-6
# Minimum accepted hit distance: Voxel_Grid.cs:482 (t > 1e-10). In f32 this is
# effectively "t > 0"; self-hits are instead excluded via poly_origin masks.
MIN_T = 1e-10


def ray_triangle_mt(
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    v0: jnp.ndarray,
    v1: jnp.ndarray,
    v2: jnp.ndarray,
    det_eps: float = DET_EPS,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Two-sided Möller–Trumbore. Returns ``(valid, t, u, v)``.

    ``valid`` does NOT include the ``t > MIN_T`` / exclusion masks — those are
    the traversal layer's acceptance policy (as in the reference, where
    ``Voxel_Grid.cs:482`` applies them outside ``RayXtri``).

    u, v are returned normalized (divided by det) for hits; the sign-aware
    bounds tests replicate the det-scaled comparisons of the reference
    (``Hare_Geometry_Polygons.cs:483-505``).
    """
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = cross(direction, e2)
    det = dot(e1, pvec)
    tvec = origin - v0
    qvec = cross(tvec, e1)

    u_s = dot(tvec, pvec)  # u * det
    v_s = dot(direction, qvec)  # v * det
    t_s = dot(e2, qvec)  # t * det

    # det > eps branch: 0 <= u_s, v_s and u_s + v_s <= det
    # det < -eps branch: identical inequalities with signs flipped.
    # Multiplying through by sign(det) unifies both.
    s = jnp.sign(det)
    su, sv, sd = s * u_s, s * v_s, s * det
    in_bounds = (su >= 0.0) & (sv >= 0.0) & (su + sv <= sd)
    valid = (jnp.abs(det) > det_eps) & in_bounds

    # Safe reciprocal: where invalid, value is masked anyway.
    inv_det = jnp.where(valid, 1.0 / jnp.where(valid, det, 1.0), 0.0)
    t = t_s * inv_det
    u = u_s * inv_det
    v = v_s * inv_det
    return valid, t, u, v


def ray_triangle_watertight(
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    v0: jnp.ndarray,
    v1: jnp.ndarray,
    v2: jnp.ndarray,
    det_eps: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Watertight ray/triangle (Woop, Benthin & Wald, JCGT 2013), two-sided.

    Shear-transforms the triangle into ray space picking the dominant
    direction axis, computes 2-D edge functions whose signs are consistent
    across shared edges — no cracks between adjacent triangles in f32.
    Returns ``(valid, t, u, v)`` with the same contract as
    :func:`ray_triangle_mt`.  ``det_eps=0`` accepts edge-on hits that classic
    MT rejects; pass ``DET_EPS`` for reference-parity studies.
    """
    d = direction
    ad = jnp.abs(d)
    # kz = dominant axis; kx, ky follow cyclically, swapped to keep winding.
    kz = jnp.argmax(ad, axis=-1)
    kx = (kz + 1) % 3
    ky = (kx + 1) % 3
    dz = jnp.take_along_axis(d, kz[..., None], axis=-1)[..., 0]
    neg = dz < 0.0
    kx_, ky_ = jnp.where(neg, ky, kx), jnp.where(neg, kx, ky)

    def pick(vec, idx):
        return jnp.take_along_axis(vec, idx[..., None], axis=-1)[..., 0]

    dx, dy = pick(d, kx_), pick(d, ky_)
    dz = pick(d, kz)
    sz = 1.0 / dz
    sx = dx * sz
    sy = dy * sz

    # Vertices relative to ray origin, sheared into ray space.
    def shear(v):
        a = v - origin
        axp, ayp, azp = pick(a, kx_), pick(a, ky_), pick(a, kz)
        return axp - sx * azp, ayp - sy * azp, azp

    ax, ay, az = shear(v0)
    bx, by, bz = shear(v1)
    cx, cy, cz = shear(v2)

    u_s = cx * by - cy * bx
    v_s = ax * cy - ay * cx
    w_s = bx * ay - by * ax

    det = u_s + v_s + w_s
    # Relative-epsilon acceptance band: under jit XLA may contract the edge
    # functions into FMAs, which breaks the exact antisymmetry the
    # strictly-watertight argument relies on (a shared edge's function is the
    # same two products in swapped order) — an edge ray could then be rejected
    # by BOTH adjacent triangles.  Padding the sign test by a few ulps of the
    # edge-function magnitude restores the no-crack guarantee; double-accepts
    # at edges are idempotent under the min-t reduction (Embree's "robust"
    # mode uses the same construction).
    tol = 8.0 * jnp.finfo(u_s.dtype).eps * (
        jnp.abs(u_s) + jnp.abs(v_s) + jnp.abs(w_s)
    )
    same_sign = ((u_s >= -tol) & (v_s >= -tol) & (w_s >= -tol)) | (
        (u_s <= tol) & (v_s <= tol) & (w_s <= tol)
    )
    valid = same_sign & (jnp.abs(det) > det_eps)

    t_s = sz * (u_s * az + v_s * bz + w_s * cz)
    inv_det = jnp.where(valid, 1.0 / jnp.where(valid, det, 1.0), 0.0)
    t = t_s * inv_det
    # Match MT's convention: u at v1, v at v2 (barycentric of vert1/vert2).
    u = v_s * inv_det
    v = w_s * inv_det
    return valid, t, u, v


def ray_aabb(
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    box_min: jnp.ndarray,
    box_max: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Branchless slab test. Returns ``(hit, t_near, t_far)``.

    Semantics of ``AABB.Intersect`` (``AABB_Main.cs:86-171``): a ray whose
    origin is inside the box hits with ``t_near <= 0``; parallel rays outside
    a slab miss.  The per-axis ``double.Epsilon`` parallel branch (``:92-95``)
    is subsumed by IEEE inf arithmetic: 1/0 = inf gives the correct +-inf slab
    times, and the NaN from 0 * inf at exactly-on-boundary origins is washed
    out by the min/max ordering below.
    """
    inv_d = 1.0 / direction  # +-inf where parallel — intended
    t1 = (box_min - origin) * inv_d
    t2 = (box_max - origin) * inv_d
    # NaN-robust: min/max pairs then reduce. jnp.minimum propagates NaN from
    # the first arg only; use where-based select to prefer numbers.
    t_lo = jnp.minimum(t1, t2)
    t_hi = jnp.maximum(t1, t2)
    t_near = jnp.max(t_lo, axis=-1)
    t_far = jnp.min(t_hi, axis=-1)
    hit = (t_far >= jnp.maximum(t_near, 0.0)) & (t_far >= 0.0)
    return hit, t_near, t_far
