"""Example 4. Finding camera parameters.

Reference: examples/example4.py — optimize the camera position so the
rendered silhouette matches a reference image.  The camera position is the
trainable parameter; gradients flow through look_at / perspective / the
rasterizer's approximate backward into it, all in one jitted step.
"""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..'))

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import tqdm

import neural_renderer_tpu as nr
from neural_renderer_tpu.io.image import imread, imsave01, make_gif


def make_reference_image(filename_ref, filename_obj):
    vertices, faces = nr.load_obj(filename_obj)
    vertices, faces = vertices[None], faces[None]
    textures = np.ones((1, faces.shape[1], 2, 2, 2, 3), 'float32')
    renderer = nr.Renderer()
    renderer.eye = nr.get_points_from_angles(2.732, 30, -15)
    images = np.asarray(
        jax.jit(renderer.render)(vertices, faces, np.tanh(textures)))
    imsave01(filename_ref, images[0].transpose(1, 2, 0))


def run():
    data = os.path.join(os.path.dirname(__file__), 'data')
    parser = argparse.ArgumentParser()
    parser.add_argument('-io', '--filename_obj', type=str,
                        default=os.path.join(data, 'teapot.obj'))
    parser.add_argument('-ir', '--filename_ref', type=str,
                        default=os.path.join(data, 'example4_ref.png'))
    parser.add_argument('-or', '--filename_output', type=str,
                        default=os.path.join(data, 'example4_result.gif'))
    parser.add_argument('-mr', '--make_reference_image', type=int, default=0)
    parser.add_argument('-n', '--num_steps', type=int, default=1000)
    args = parser.parse_args()
    working_directory = os.path.dirname(args.filename_output)

    if args.make_reference_image:
        make_reference_image(args.filename_ref, args.filename_obj)

    vertices, faces = nr.load_obj(args.filename_obj)
    vertices = jnp.asarray(vertices[None, :, :])
    faces = jnp.asarray(faces[None, :, :])
    textures = np.ones((1, faces.shape[1], 2, 2, 2, 3), 'float32')
    image_ref = jnp.asarray(
        (imread(args.filename_ref).max(-1) != 0).astype('float32'))

    camera_position = jnp.array([6.0, 10.0, -14.0], jnp.float32)

    renderer = nr.Renderer()

    def loss_fn(cam):
        renderer.eye = cam
        image = renderer.render_silhouettes(vertices, faces)
        return jnp.sum(jnp.square(image - image_ref[None]))

    init_fn, update_fn = nr.adam(alpha=0.1)
    opt_state = init_fn(camera_position)

    @jax.jit
    def step(cam, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(cam)
        updates, opt_state = update_fn(grads, opt_state)
        return cam + updates, opt_state, loss

    @jax.jit
    def render_rgb(cam):
        renderer.eye = cam
        return renderer.render(vertices, faces, jnp.tanh(textures))

    frames = []
    loop = tqdm.tqdm(range(args.num_steps))
    for i in loop:
        camera_position, opt_state, loss = step(camera_position, opt_state)
        images = np.asarray(render_rgb(camera_position))
        frame = '%s/_tmp_%04d.png' % (working_directory, i)
        imsave01(frame, images[0].transpose(1, 2, 0))
        frames.append(frame)
        loop.set_description('Optimizing (loss %.4f)' % float(loss))
        if float(loss) < 70:
            break
    make_gif(frames, args.filename_output)
    for f in frames:
        os.remove(f)


if __name__ == '__main__':
    run()
