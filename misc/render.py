"""Batch multi-view renderer for mesh datasets (ShapeNet-style).

TPU-native counterpart of the reference's Blender batch renderer
(``misc/render.py:119-159``, used for the author's downstream 3D
reconstruction datasets): renders every OBJ under a directory from a ring of
viewpoints and saves PNGs — but here through this framework's own renderer,
jitted once and reused across meshes (per mesh-size bucket) and views.

Usage:
  python misc/render.py -i <dir-with-obj-subdirs> -o <out-dir> \
      [-n 24] [-is 256] [-d 2.732] [-e 30]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..'))

import jax
import jax.numpy as jnp
import numpy as np

import neural_renderer_tpu as nr
from neural_renderer_tpu.io.image import imsave01


def run():
    parser = argparse.ArgumentParser()
    parser.add_argument('-i', '--input_dir', type=str, required=True)
    parser.add_argument('-o', '--output_dir', type=str, required=True)
    parser.add_argument('-n', '--num_views', type=int, default=24)
    parser.add_argument('-is', '--image_size', type=int, default=256)
    parser.add_argument('-d', '--distance', type=float, default=2.732)
    parser.add_argument('-e', '--elevation', type=float, default=30.0)
    parser.add_argument('-ts', '--texture_size', type=int, default=2)
    args = parser.parse_args()

    renderer = nr.Renderer()
    renderer.image_size = args.image_size

    @jax.jit
    def render(vertices, faces, textures, eye):
        renderer.eye = eye
        return renderer.render(vertices, faces, textures)

    os.makedirs(args.output_dir, exist_ok=True)
    paths = sorted(glob.glob(os.path.join(args.input_dir, '**', '*.obj'),
                             recursive=True))
    azimuths = np.linspace(0, 360, args.num_views, endpoint=False)

    for path in paths:
        name = os.path.splitext(os.path.relpath(path, args.input_dir)
                                )[0].replace(os.sep, '_')
        try:
            vertices, faces, textures = nr.load_obj(
                path, load_texture=True, texture_size=args.texture_size)
        except Exception:
            vertices, faces = nr.load_obj(path)
            textures = np.ones(
                (faces.shape[0],) + (args.texture_size,) * 3 + (3,),
                'float32')
        vertices = jnp.asarray(vertices[None])
        faces = jnp.asarray(faces[None])
        textures = jnp.asarray(textures[None])
        for vi, az in enumerate(azimuths):
            eye = jnp.asarray(nr.get_points_from_angles(
                np.float32(args.distance), np.float32(args.elevation),
                np.float32(az)))
            image = np.asarray(render(vertices, faces, textures, eye))
            imsave01(os.path.join(args.output_dir, f'{name}_{vi:02d}.png'),
                     image[0].transpose(1, 2, 0))
        print(name, flush=True)


if __name__ == '__main__':
    run()
