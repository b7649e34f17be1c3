"""Gather per-face vertex coordinates.

Reference ``neural_renderer/vertices_to_faces.py:4-21``: flattens the batch and
fancy-indexes.  In JAX a batched ``take`` does the same; autodiff gives the
scatter-add backward (the reference relied on Chainer's ``get_item`` backward)
for free, and XLA lowers it to an efficient TPU gather.
"""

import jax.numpy as jnp


def vertices_to_faces(vertices, faces):
    """``[bs, nv, 3]`` vertices + ``[bs, nf, 3]`` int faces -> ``[bs, nf, 3, 3]``.

    ``out[b, f, k] = vertices[b, faces[b, f, k]]``.
    """
    vertices = jnp.asarray(vertices)
    faces = jnp.asarray(faces)
    assert vertices.ndim == 3
    assert faces.ndim == 3
    assert vertices.shape[0] == faces.shape[0]
    assert vertices.shape[2] == 3
    assert faces.shape[2] == 3

    bs, nv = vertices.shape[:2]
    nf = faces.shape[1]
    # Batched gather: index with per-batch offsets into the flattened vertex
    # table (same layout trick as the reference, vertices_to_faces.py:19-21).
    offsets = (jnp.arange(bs, dtype=faces.dtype) * nv)[:, None, None]
    flat_idx = (faces + offsets).reshape(-1)
    flat_vertices = vertices.reshape(bs * nv, 3)
    return jnp.take(flat_vertices, flat_idx, axis=0).reshape(bs, nf, 3, 3)
