"""Trainable mesh: vertices + per-face texture cubes as a JAX pytree.

Mirrors the reference ``Mesh`` chainer.Link (mesh.py:8-38): vertices and
textures are the trainable leaves, faces are a static int buffer,
``get_batch`` broadcasts to a minibatch and sigmoid-squashes the textures
(mesh.py:33), and per-parameter learning rates feed the custom Adam
(optimizers.py).  Registered as a pytree so it passes straight through
``jax.grad`` / ``jax.jit`` / optax.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from neural_renderer_tpu.io.obj import load_obj


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Mesh:
    vertices: jax.Array                      # [nv, 3] float32 (trainable)
    textures: jax.Array                      # [nf, ts, ts, ts, 3] (trainable)
    faces: jax.Array = dataclasses.field(metadata=dict(static=False))  # [nf,3] int32
    lr_vertices: float = dataclasses.field(
        default=1.0, metadata=dict(static=True))
    lr_textures: float = dataclasses.field(
        default=1.0, metadata=dict(static=True))

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
                   faces=jnp.asarray(faces, jnp.int32))

    # Reference-compatible constructor: Mesh(filename_obj, ...)
    def __init__(self, vertices, textures=None, faces=None,
                 texture_size=4, normalization=True,
                 lr_vertices=1.0, lr_textures=1.0):
        if isinstance(vertices, str):
            m = Mesh.from_obj(vertices, texture_size, normalization)
            vertices, textures, faces = m.vertices, m.textures, m.faces
        object.__setattr__(self, 'vertices', vertices)
        object.__setattr__(self, 'textures', textures)
        object.__setattr__(self, 'faces', faces)
        object.__setattr__(self, 'lr_vertices', lr_vertices)
        object.__setattr__(self, 'lr_textures', lr_textures)

    @property
    def num_vertices(self):
        return self.vertices.shape[0]

    @property
    def num_faces(self):
        return self.faces.shape[0]

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
            self.faces, (batch_size,) + self.faces.shape)
        textures = jax.nn.sigmoid(jnp.broadcast_to(
            self.textures, (batch_size,) + self.textures.shape))
        return vertices, faces, textures

    def set_lr(self, lr_vertices, lr_textures):
        """Per-parameter LR multipliers for the custom Adam (mesh.py:36-38).

        Returns a new Mesh (pytrees are immutable-style)."""
        return Mesh(vertices=self.vertices, textures=self.textures,
                    faces=self.faces, lr_vertices=lr_vertices,
                    lr_textures=lr_textures)

    def lr_scales(self):
        """Pytree of per-leaf LR multipliers, aligned with trainables()."""
        return dict(vertices=self.lr_vertices, textures=self.lr_textures)

    def trainables(self):
        """The trainable leaves as a dict pytree."""
        return dict(vertices=self.vertices, textures=self.textures)

    def with_trainables(self, params):
        return Mesh(vertices=params['vertices'], textures=params['textures'],
                    faces=self.faces, lr_vertices=self.lr_vertices,
                    lr_textures=self.lr_textures)
