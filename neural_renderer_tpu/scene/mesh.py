"""Trainable mesh: vertices + per-face texture cubes as a JAX pytree.

Mirrors the reference ``Mesh`` chainer.Link (mesh.py:8-38): vertices and
textures are the trainable leaves, faces are a *static* int buffer (scene
topology — a constant of the program, never differentiated), ``get_batch``
broadcasts to a minibatch and sigmoid-squashes the textures (mesh.py:33),
and per-parameter learning rates feed the custom Adam (optimizers.py).

Pytree layout: children = (vertices, textures); faces and the LR
multipliers live in hashable aux data, so ``jax.grad(loss)(mesh)`` works
directly (int leaves would make grad raise) and jit treats the topology as
a compile-time constant.
"""

import jax
import jax.numpy as jnp
import numpy as np

from neural_renderer_tpu.io.obj import load_obj


class _StaticArray:
    """Hashable ndarray wrapper for pytree aux data (compile-time constant)."""

    __slots__ = ('value', '_key')

    def __init__(self, value):
        self.value = np.asarray(value)
        self.value.setflags(write=False)
        self._key = (self.value.shape, self.value.dtype.str,
                     self.value.tobytes())

    def __eq__(self, other):
        return isinstance(other, _StaticArray) and self._key == other._key

    def __hash__(self):
        return hash(self._key)


class Mesh:
    """vertices [nv, 3] f32 (trainable), textures [nf, ts, ts, ts, 3] f32
    (trainable), faces [nf, 3] int32 (static topology)."""

    def __init__(self, vertices, textures=None, faces=None,
                 texture_size=4, normalization=True,
                 lr_vertices=1.0, lr_textures=1.0, spatial_order=False,
                 face_order=None):
        # Reference-compatible constructor: Mesh(filename_obj, ...)
        if isinstance(vertices, str):
            m = Mesh.from_obj(vertices, texture_size, normalization)
            vertices, textures, faces = m.vertices, m.textures, m._faces
        if spatial_order:
            # one-time host-side Morton reorder of the faces (and their
            # texture cubes) — a preprocessing utility (ops/spatial.py):
            # spatially local face ids help downstream pipelines that
            # slice or shard face lists.  (The r3 windowed feature fetch
            # this originally fed was removed in r4 after measuring a
            # regression on-chip.)  Opt-in: z-ties between EXACTLY
            # coincident faces resolve in the new list order.
            from neural_renderer_tpu.ops.spatial import face_spatial_order
            fa = (faces.value if isinstance(faces, _StaticArray)
                  else np.asarray(faces, np.int32))
            perm = face_spatial_order(np.asarray(vertices), fa)
            faces = fa[perm]
            if textures is not None:
                textures = jnp.asarray(np.asarray(textures)[perm])
            face_order = perm             # new slot -> original face index
        # static aux (survives pytree round-trips: set_lr, tree_map, jit)
        self._face_order = (
            face_order if face_order is None or isinstance(
                face_order, _StaticArray) else _StaticArray(face_order))
        self.vertices = vertices
        self.textures = textures
        self._faces = (faces if isinstance(faces, _StaticArray)
                       else _StaticArray(np.asarray(faces, np.int32)))
        self.lr_vertices = lr_vertices
        self.lr_textures = lr_textures

    @classmethod
    def from_obj(cls, filename_obj, texture_size=4, normalization=True,
                 seed=0):
        """Load an OBJ and initialize textures ~ Normal(0, 0.05) like
        chainer.initializers.Normal (mesh.py:20-22)."""
        vertices, faces = load_obj(filename_obj, normalization)
        nf = faces.shape[0]
        rng = np.random.RandomState(seed)
        textures = rng.normal(
            0.0, 0.05, (nf, texture_size, texture_size, texture_size, 3)
        ).astype('float32')
        return cls(vertices=jnp.asarray(vertices),
                   textures=jnp.asarray(textures),
                   faces=np.asarray(faces, np.int32))

    @property
    def faces(self):
        return jnp.asarray(self._faces.value)

    @property
    def face_order(self):
        """[nf] int32 new-slot -> original-face-index permutation when the
        mesh was built with ``spatial_order=True``; None otherwise.  Use to
        map optimized per-face data back to the source OBJ's face order:
        ``original[perm] = reordered`` i.e. ``original = np.empty_like(r);
        original[...] = r[np.argsort(perm)]``."""
        return None if self._face_order is None else self._face_order.value

    @property
    def num_vertices(self):
        return self.vertices.shape[0]

    @property
    def num_faces(self):
        return self._faces.value.shape[0]

    @property
    def texture_size(self):
        return self.textures.shape[1]

    def get_batch(self, batch_size):
        """Broadcast to a minibatch; sigmoid-squash textures (mesh.py:29-34).

        Returns (vertices [bs,nv,3], faces [bs,nf,3], textures
        [bs,nf,ts,ts,ts,3]).
        """
        vertices = jnp.broadcast_to(
            self.vertices, (batch_size,) + self.vertices.shape)
        faces = jnp.broadcast_to(
            self.faces, (batch_size,) + self._faces.value.shape)
        textures = jax.nn.sigmoid(jnp.broadcast_to(
            self.textures, (batch_size,) + self.textures.shape))
        return vertices, faces, textures

    def set_lr(self, lr_vertices, lr_textures):
        """Per-parameter LR multipliers for the custom Adam (mesh.py:36-38).

        Returns a new Mesh (pytrees are immutable-style)."""
        return Mesh(vertices=self.vertices, textures=self.textures,
                    faces=self._faces, lr_vertices=lr_vertices,
                    lr_textures=lr_textures, face_order=self._face_order)

    def lr_scales(self):
        """Mesh-shaped pytree of per-leaf LR multipliers for ``nr.adam``."""
        return Mesh(vertices=self.lr_vertices, textures=self.lr_textures,
                    faces=self._faces, lr_vertices=self.lr_vertices,
                    lr_textures=self.lr_textures,
                    face_order=self._face_order)

    def trainables(self):
        """The trainable leaves as a dict pytree."""
        return dict(vertices=self.vertices, textures=self.textures)

    def with_trainables(self, params):
        return Mesh(vertices=params['vertices'], textures=params['textures'],
                    faces=self._faces, lr_vertices=self.lr_vertices,
                    lr_textures=self.lr_textures,
                    face_order=self._face_order)

    def tree_flatten(self):
        children = (self.vertices, self.textures)
        aux = (self._faces, self.lr_vertices, self.lr_textures,
               self._face_order)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        faces, lr_vertices, lr_textures, face_order = aux
        return cls(vertices=children[0], textures=children[1], faces=faces,
                   lr_vertices=lr_vertices, lr_textures=lr_textures,
                   face_order=face_order)


jax.tree_util.register_pytree_node(
    Mesh, lambda m: m.tree_flatten(), Mesh.tree_unflatten)
