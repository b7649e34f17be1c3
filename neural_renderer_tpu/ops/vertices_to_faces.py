"""Gather per-face vertex coordinates.

Reference ``neural_renderer/vertices_to_faces.py:4-21``: flattens the batch and
fancy-indexes.  In JAX a batched ``take`` does the same; the forward lowers to
an efficient TPU gather.

The BACKWARD is where TPU costs live: autodiff of the gather is a
scatter-add over ``bs*nf*3`` rows, and TPU scatters cost ~15-20 ns per row
regardless of row width (measured, NOTES.md) — ~7 ms/step at 512^2 bench
shapes, while the MXU sits idle.  So this op carries a custom VJP: when
every batch element shares one face list (the ubiquitous case — ``Mesh``
broadcasts a single topology; checked at RUN time with a ``lax.cond``) and
the one-hot fits a static budget, the gradient is computed as one
incidence-matrix contraction

    grad_vertices[v, (b,c)] = sum_F onehot[v, F] * g[F, (b,c)]

i.e. a ``[nv, 3nf] x [3nf, 3bs]`` matmul (HIGHEST precision — f32-accurate).
Values equal the scatter path up to f32 summation order (each vertex sums
its ~6 incident faces' contributions); per-element reductions are
deterministic per shape.  Meshes with per-batch topologies or beyond the
one-hot budget take the scatter path unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np

# one-hot budget: nv * nf * 3 f32 elements (teapot: 19M = 76 MB; a
# fill_back-doubled 164k-face scan at nv~41k would need 80 GB -> scatter)
_ONEHOT_MAX_ELEMS = 48 * 1024 * 1024


def _gather(vertices, faces):
    bs, nv = vertices.shape[:2]
    nf = faces.shape[1]
    # Batched gather: index with per-batch offsets into the flattened vertex
    # table (same layout trick as the reference, vertices_to_faces.py:19-21).
    offsets = (jnp.arange(bs, dtype=faces.dtype) * nv)[:, None, None]
    flat_idx = (faces + offsets).reshape(-1)
    flat_vertices = vertices.reshape(bs * nv, 3)
    return jnp.take(flat_vertices, flat_idx, axis=0).reshape(bs, nf, 3, 3)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _v2f(nv, vertices_vma, vertices, faces):
    return _gather(vertices, faces)


def _v2f_fwd(nv, vertices_vma, vertices, faces):
    return _gather(vertices, faces), faces


def _grad_scatter(nv, faces, g):
    bs, nf = faces.shape[:2]
    offsets = (jnp.arange(bs, dtype=faces.dtype) * nv)[:, None, None]
    flat_idx = (faces + offsets).reshape(-1)
    gv = jnp.zeros((bs * nv, 3), g.dtype).at[flat_idx].add(
        g.reshape(-1, 3))
    return gv.reshape(bs, nv, 3)


def _grad_matmul(nv, faces, g):
    """Incidence-matrix contraction using batch element 0's face list
    (only run under the all-batches-share-faces cond)."""
    bs, nf = faces.shape[:2]
    f0 = faces[0].reshape(nf * 3)
    onehot = (f0[None, :]
              == jnp.arange(nv, dtype=faces.dtype)[:, None]).astype(g.dtype)
    gt = g.reshape(bs, nf * 3, 3).transpose(1, 0, 2).reshape(nf * 3, bs * 3)
    out = jax.lax.dot_general(
        onehot, gt, (((1,), (0,)), ((), ())),
        preferred_element_type=g.dtype,
        precision=jax.lax.Precision.HIGHEST)       # [nv, bs*3]
    return out.reshape(nv, bs, 3).transpose(1, 0, 2)


def _v2f_bwd(nv, vertices_vma, faces, g):
    bs, nf = faces.shape[:2]
    if nv * nf * 3 <= _ONEHOT_MAX_ELEMS:
        if bs == 1:
            gv = _grad_matmul(nv, faces, g)
        else:
            shared = jnp.all(faces == faces[:1])
            gv = jax.lax.cond(
                shared,
                lambda gg: _grad_matmul(nv, faces, gg),
                lambda gg: _grad_scatter(nv, faces, gg), g)
    else:
        gv = _grad_scatter(nv, faces, g)
    # shard_map vma reconciliation: when faces (hence g) vary over a mesh
    # axis the vertices are replicated on (face-axis model parallelism),
    # the per-device partial gradients must be psummed over that axis —
    # exactly what autodiff's transpose would have inserted for the plain
    # gather.  (The reverse direction uses pvary.)
    actual = frozenset(getattr(jax.typeof(gv), 'vma', frozenset()))
    missing = tuple(sorted(actual - vertices_vma))
    if missing:
        gv = jax.lax.psum(gv, missing)
    extra = tuple(sorted(vertices_vma - actual))
    if extra:
        gv = jax.lax.pvary(gv, extra)
    return gv, np.zeros(faces.shape, jax.dtypes.float0)


_v2f.defvjp(_v2f_fwd, _v2f_bwd)


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
    vma = frozenset(getattr(jax.typeof(vertices), 'vma', frozenset()))
    return _v2f(vertices.shape[1], vma, vertices, faces)
