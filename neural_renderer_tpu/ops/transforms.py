"""Camera / viewpoint transforms.

Reference semantics:
  * ``look_at``  — ``neural_renderer/look_at.py:7-46``
  * ``look``     — ``neural_renderer/look.py:7-45``
  * ``perspective`` — ``neural_renderer/perspective.py:5-19`` (note the
    reference uses the literal ``3.1416``, not ``math.pi``; we reproduce that
    so NDC coordinates — and therefore golden images — match bit-for-bit).
  * ``get_points_from_angles`` — ``neural_renderer/get_points_from_angles.py``

All functions are pure, jit/vmap-able, and differentiable w.r.t. every float
argument (including ``eye`` — used by the camera-pose optimization workload,
reference ``examples/example4.py:40-44``).
"""

import math

import jax
import jax.numpy as jnp

# Camera transforms are tiny [nv,3]x[3,3] contractions: the MXU's default
# bf16 passes would quantize NDC coordinates by ~1e-3 (a full pixel at 256^2)
# and break golden-image parity, so they run at full f32 precision.
_HIGHEST = jax.lax.Precision.HIGHEST

# The reference normalizes with chainer.functions.normalize, which computes
# x / (||x|| + eps) with eps = 1e-5.  We match it exactly.
_NORMALIZE_EPS = 1e-5


def _normalize(x, axis=-1):
    sumsq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    # sqrt has an infinite derivative at 0, and JAX autodiff turns the
    # 0 * inf at a zero vector into nan — which real scanned meshes hit
    # through lighting's face normals on zero-area faces.  The double-
    # where keeps the forward bit-identical and makes the VJP at zero
    # gy / eps, exactly chainer F.normalize's analytic backward limit
    # (the reference's behavior).
    safe = jnp.where(sumsq > 0, sumsq, 1.0)
    norm = jnp.where(sumsq > 0, jnp.sqrt(safe), 0.0)
    return x / (norm + _NORMALIZE_EPS)


def _as_batched_vec3(v, batch_size, dtype=jnp.float32):
    """list/tuple/array -> [batch_size, 3] float array (broadcast 1-D input)."""
    v = jnp.asarray(v, dtype)
    if v.ndim == 1:
        v = jnp.broadcast_to(v[None, :], (batch_size, 3))
    return v


def look_at(vertices, eye, at=None, up=None):
    """'Look at' transform of vertices toward ``at`` (default origin).

    vertices: ``[bs, nv, 3]`` world-space. Returns camera-space ``[bs, nv, 3]``.
    Rotation rows are (x_axis, y_axis, z_axis) built from two cross products
    (reference ``look_at.py:30-35``); applied as ``(v - eye) @ R^T``
    (``look_at.py:43-44``).
    """
    vertices = jnp.asarray(vertices)
    assert vertices.ndim == 3
    bs = vertices.shape[0]
    if at is None:
        at = jnp.array([0.0, 0.0, 0.0], 'float32')
    if up is None:
        up = jnp.array([0.0, 1.0, 0.0], 'float32')
    eye = _as_batched_vec3(eye, bs)
    at = _as_batched_vec3(at, bs)
    up = _as_batched_vec3(up, bs)

    z_axis = _normalize(at - eye)
    x_axis = _normalize(jnp.cross(up, z_axis))
    y_axis = _normalize(jnp.cross(z_axis, x_axis))

    # rotation matrix rows = new axes: [bs, 3, 3]
    r = jnp.stack([x_axis, y_axis, z_axis], axis=1)

    vertices = vertices - eye[:, None, :]
    vertices = jnp.einsum('bvj,bij->bvi', vertices, r, precision=_HIGHEST)
    return vertices


def look(vertices, eye, direction=None, up=None):
    """Camera transform oriented by a view ``direction`` instead of a target.

    Reference ``look.py:7-45``.
    """
    vertices = jnp.asarray(vertices)
    assert vertices.ndim == 3
    bs = vertices.shape[0]
    if direction is None:
        direction = jnp.array([0.0, 0.0, 1.0], 'float32')
    if up is None:
        up = jnp.array([0.0, 1.0, 0.0], 'float32')
    eye = _as_batched_vec3(eye, bs)
    direction = _as_batched_vec3(direction, bs)
    up = _as_batched_vec3(up, bs)

    z_axis = _normalize(direction)
    x_axis = _normalize(jnp.cross(up, z_axis))
    y_axis = _normalize(jnp.cross(z_axis, x_axis))

    r = jnp.stack([x_axis, y_axis, z_axis], axis=1)

    vertices = vertices - eye[:, None, :]
    vertices = jnp.einsum('bvj,bij->bvi', vertices, r, precision=_HIGHEST)
    return vertices


def perspective(vertices, angle=30.0):
    """Pinhole perspective divide: x' = x / (z tan(angle)), z preserved.

    Reference ``perspective.py:5-19``: angle in degrees, converted with the
    literal 3.1416 (reproduced deliberately — golden-image parity).
    """
    vertices = jnp.asarray(vertices)
    assert vertices.ndim == 3
    angle = jnp.asarray(angle, 'float32')
    angle = angle / 180.0 * 3.1416
    width = jnp.tan(angle)
    # broadcast over [bs, nv]
    width = jnp.broadcast_to(jnp.reshape(width, (-1, 1)), vertices.shape[:2])
    z = vertices[:, :, 2]
    x = vertices[:, :, 0] / z / width
    y = vertices[:, :, 1] / z / width
    return jnp.stack([x, y, z], axis=2)


def get_points_from_angles(distance, elevation, azimuth, degrees=True):
    """Spherical -> Cartesian eye position.

    Returns ``(d cosE sinA, d sinE, -d cosE cosA)``
    (reference ``get_points_from_angles.py:11-14``).  Python floats in, tuple
    of floats out (matching the reference's scalar branch); array inputs get
    the differentiable array branch stacked as ``[..., 3]``.
    """
    if isinstance(distance, (float, int)) and isinstance(elevation, (float, int)) \
            and isinstance(azimuth, (float, int)):
        if degrees:
            elevation = math.radians(elevation)
            azimuth = math.radians(azimuth)
        return (
            distance * math.cos(elevation) * math.sin(azimuth),
            distance * math.sin(elevation),
            -distance * math.cos(elevation) * math.cos(azimuth),
        )
    distance = jnp.asarray(distance, 'float32')
    elevation = jnp.asarray(elevation, 'float32')
    azimuth = jnp.asarray(azimuth, 'float32')
    if degrees:
        elevation = jnp.radians(elevation)
        azimuth = jnp.radians(azimuth)
    return jnp.stack([
        distance * jnp.cos(elevation) * jnp.sin(azimuth),
        distance * jnp.sin(elevation),
        -distance * jnp.cos(elevation) * jnp.cos(azimuth),
    ], axis=-1)
