"""The Renderer scene object.

Field-for-field mirror of the reference ``Renderer`` (renderer.py:9-33):
mutable attributes holding camera / light / raster configuration, with the
three entry points ``render_silhouettes`` / ``render_depth`` / ``render``.

All three methods are pure functions of (attributes, inputs) — attributes may
hold JAX tracers (e.g. ``renderer.eye = camera_position`` inside a jitted
loss, the camera-pose-optimization workload of reference example4.py:40-44),
so whole optimization steps compile to single XLA programs.
"""

import math

import jax.numpy as jnp

import neural_renderer_tpu as nr_mod  # late-bound to avoid import cycles
from neural_renderer_tpu.ops.lighting import lighting
from neural_renderer_tpu.ops.transforms import look, look_at, perspective
from neural_renderer_tpu.ops.vertices_to_faces import vertices_to_faces
from neural_renderer_tpu.rasterize.api import (
    rasterize,
    rasterize_depth,
    rasterize_rgbad,
    rasterize_silhouettes,
)


class Renderer(object):
    def __init__(self):
        # rendering
        self.image_size = 256
        # True = the reference's 2x supersample + mean-pool; 'approx' =
        # identical rendered VALUES but gradients from a 1x render (the
        # whole backward runs at a quarter of the pixels — see
        # rasterize_rgbad); False = no anti-aliasing.
        self.anti_aliasing = True
        self.background_color = [0, 0, 0]
        self.fill_back = True

        # camera
        self.perspective = True
        self.viewing_angle = 30
        self.eye = [0, 0,
                    -(1.0 / math.tan(math.radians(self.viewing_angle)) + 1)]
        self.camera_mode = 'look_at'
        self.camera_direction = [0, 0, 1]
        self.near = 0.1
        self.far = 100

        # light
        self.light_intensity_ambient = 0.5
        self.light_intensity_directional = 0.5
        self.light_color_ambient = [1, 1, 1]      # white
        self.light_color_directional = [1, 1, 1]  # white
        self.light_direction = [0, 1, 0]          # up-to-down

        # rasterization
        self.rasterizer_eps = 1e-3

        # TPU performance knobs forwarded to RasterizeSettings (no reference
        # counterpart; defaults are exact).
        self.perf_overrides = {}

    # ------------------------------------------------------------------
    def _transform(self, vertices):
        """Viewpoint + perspective transform (renderer.py:39-48,92-100)."""
        if self.camera_mode == 'look_at':
            vertices = look_at(vertices, self.eye)
        elif self.camera_mode == 'look':
            vertices = look(vertices, self.eye, self.camera_direction)
        if self.perspective:
            vertices = perspective(vertices, angle=self.viewing_angle)
        return vertices

    def _transform_faces(self, face_coords):
        """_transform applied to gathered face coords [bs, nf, 3, 3] —
        pointwise-identical to transforming the vertices first."""
        bs, nf = face_coords.shape[:2]
        flat = self._transform(face_coords.reshape(bs, nf * 3, 3))
        return flat.reshape(bs, nf, 3, 3)

    @staticmethod
    def _fill_back_faces(faces):
        """Duplicate every face back-to-front (renderer.py:37,57,77)."""
        return jnp.concatenate([faces, faces[:, :, ::-1]], axis=1)

    @staticmethod
    def _fill_back_textures(textures):
        """Texture-cube counterpart (renderer.py:79)."""
        return jnp.concatenate(
            [textures, textures.transpose(0, 1, 4, 3, 2, 5)], axis=1)

    def _perf(self, faces):
        del faces
        return self.perf_overrides

    # ------------------------------------------------------------------
    def render_silhouettes(self, vertices, faces):
        faces = jnp.asarray(faces)
        if self.fill_back:
            faces = self._fill_back_faces(faces)
        vertices = self._transform(jnp.asarray(vertices, jnp.float32))
        face_coords = vertices_to_faces(vertices, faces)
        return rasterize_silhouettes(
            face_coords, self.image_size, self.anti_aliasing,
            **self._perf(faces))

    def render_depth(self, vertices, faces):
        faces = jnp.asarray(faces)
        if self.fill_back:
            faces = self._fill_back_faces(faces)
        vertices = self._transform(jnp.asarray(vertices, jnp.float32))
        face_coords = vertices_to_faces(vertices, faces)
        return rasterize_depth(
            face_coords, self.image_size, self.anti_aliasing,
            **self._perf(faces))

    def render(self, vertices, faces, textures):
        faces = jnp.asarray(faces)
        vertices = jnp.asarray(vertices, jnp.float32)
        textures = jnp.asarray(textures, jnp.float32)
        if self.fill_back:
            faces = self._fill_back_faces(faces)
            textures = self._fill_back_textures(textures)

        # lighting on world-space face coords (renderer.py:82-90)
        faces_lighting = vertices_to_faces(vertices, faces)
        textures = lighting(
            faces_lighting,
            textures,
            self.light_intensity_ambient,
            self.light_intensity_directional,
            self.light_color_ambient,
            self.light_color_directional,
            self.light_direction)

        # the camera transform is pointwise, so applying it to the already
        # gathered world-space face coords is exact — and its VJP then
        # scatters into the vertices ONCE instead of twice (the reference
        # gathers twice, renderer.py:82,103; each gather's backward is a
        # ~0.5M-index scatter-add at batch 32)
        face_coords = self._transform_faces(faces_lighting)
        return rasterize(
            face_coords, textures, self.image_size, self.anti_aliasing,
            self.near, self.far, self.rasterizer_eps, self.background_color,
            **self._perf(faces))

    def render_rgbad(self, vertices, faces, textures):
        """All three channels in one pass (no reference Renderer method, but
        rasterize_rgbad exists there; exposed for the batched multi-view
        workload)."""
        faces = jnp.asarray(faces)
        vertices = jnp.asarray(vertices, jnp.float32)
        textures = jnp.asarray(textures, jnp.float32)
        if self.fill_back:
            faces = self._fill_back_faces(faces)
            textures = self._fill_back_textures(textures)
        faces_lighting = vertices_to_faces(vertices, faces)
        textures = lighting(
            faces_lighting, textures,
            self.light_intensity_ambient, self.light_intensity_directional,
            self.light_color_ambient, self.light_color_directional,
            self.light_direction)
        face_coords = self._transform_faces(faces_lighting)
        return rasterize_rgbad(
            face_coords, textures, self.image_size, self.anti_aliasing,
            self.near, self.far, self.rasterizer_eps, self.background_color,
            True, True, True, **self._perf(faces))
