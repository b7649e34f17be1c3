"""Example 1. Drawing a teapot from multiple viewpoints.

Reference: examples/example1.py — 360-degree textured sweep -> GIF.  The
render is jitted once (azimuth enters as a traced argument), so all 90 frames
reuse one XLA executable.
"""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..'))

import argparse

import jax
import numpy as np
import tqdm

import neural_renderer_tpu as nr
from neural_renderer_tpu.io.image import imsave01, make_gif


def run():
    parser = argparse.ArgumentParser()
    parser.add_argument('-i', '--filename_input', type=str,
                        default=os.path.join(os.path.dirname(__file__),
                                             'data/teapot.obj'))
    parser.add_argument('-o', '--filename_output', type=str,
                        default=os.path.join(os.path.dirname(__file__),
                                             'data/example1.gif'))
    args = parser.parse_args()
    working_directory = os.path.dirname(args.filename_output)

    camera_distance = 2.732
    elevation = 30
    texture_size = 2

    vertices, faces = nr.load_obj(args.filename_input)
    vertices = vertices[None, :, :]
    faces = faces[None, :, :]
    textures = np.ones(
        (1, faces.shape[1], texture_size, texture_size, texture_size, 3),
        'float32')

    renderer = nr.Renderer()

    @jax.jit
    def render(eye):
        renderer.eye = eye
        return renderer.render(vertices, faces, textures)

    frames = []
    loop = tqdm.tqdm(range(0, 360, 4))
    for num, azimuth in enumerate(loop):
        loop.set_description('Drawing')
        eye = nr.get_points_from_angles(
            np.float32(camera_distance), np.float32(elevation),
            np.float32(azimuth))
        images = np.asarray(render(jax.numpy.asarray(eye)))
        image = images[0].transpose(1, 2, 0)
        frame = '%s/_tmp_%04d.png' % (working_directory, num)
        imsave01(frame, image)
        frames.append(frame)

    make_gif(frames, args.filename_output)
    for f in frames:
        os.remove(f)


if __name__ == '__main__':
    run()
