"""Ambient + directional face lighting baked into texture cubes.

Reference ``neural_renderer/lighting.py:8-52``: face normal =
normalize(cross(v0 - v1, v2 - v1)), cos = relu(dot(normal, direction)),
``light = Ia*Ca + Id*Cd*cos`` broadcast over the whole per-face texture cube.
Per-face (flat) shading, not per-pixel — matching the reference exactly.
"""

import jax.numpy as jnp

from neural_renderer_tpu.ops.transforms import _normalize


def _as_batched(v, bs):
    v = jnp.asarray(v, 'float32')
    if v.ndim == 1:
        v = jnp.broadcast_to(v[None, :], (bs, 3))
    return v


def lighting(
        faces, textures, intensity_ambient=0.5, intensity_directional=0.5,
        color_ambient=(1, 1, 1), color_directional=(1, 1, 1),
        direction=(0, 1, 0)):
    """Scale ``textures`` by per-face ambient + directional light.

    faces: ``[bs, nf, 3, 3]`` world-space per-face vertex coords.
    textures: ``[bs, nf, ts, ts, ts, 3]``.
    """
    faces = jnp.asarray(faces)
    textures = jnp.asarray(textures)
    bs, nf = faces.shape[:2]

    color_ambient = _as_batched(color_ambient, bs)
    color_directional = _as_batched(color_directional, bs)
    direction = _as_batched(direction, bs)

    light = jnp.zeros((bs, nf, 3), 'float32')

    if not (isinstance(intensity_ambient, (int, float)) and intensity_ambient == 0):
        light = light + intensity_ambient * color_ambient[:, None, :]

    if not (isinstance(intensity_directional, (int, float)) and intensity_directional == 0):
        v10 = faces[:, :, 0] - faces[:, :, 1]
        v12 = faces[:, :, 2] - faces[:, :, 1]
        normals = _normalize(jnp.cross(v10, v12))
        cos = jax_relu(jnp.sum(normals * direction[:, None, :], axis=2))
        light = light + (intensity_directional
                         * color_directional[:, None, :] * cos[:, :, None])

    light = light[:, :, None, None, None, :]
    return textures * light


def jax_relu(x):
    return jnp.maximum(x, 0.0)
