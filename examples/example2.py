"""Example 2. Optimizing vertices.

Reference: examples/example2.py — fit teapot vertices to a target silhouette.
The whole optimization step (render + L2 loss + backward + Adam update)
compiles to ONE XLA program via jit.
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


def run():
    data = os.path.join(os.path.dirname(__file__), 'data')
    parser = argparse.ArgumentParser()
    parser.add_argument('-io', '--filename_obj', type=str,
                        default=os.path.join(data, 'teapot.obj'))
    parser.add_argument('-ir', '--filename_ref', type=str,
                        default=os.path.join(data, 'example2_ref.png'))
    parser.add_argument('-oo', '--filename_output_optimization', type=str,
                        default=os.path.join(data,
                                             'example2_optimization.gif'))
    parser.add_argument('-or', '--filename_output_result', type=str,
                        default=os.path.join(data, 'example2_result.gif'))
    parser.add_argument('-n', '--num_steps', type=int, default=300)
    args = parser.parse_args()
    working_directory = os.path.dirname(args.filename_output_result)

    # Mesh pytree as the trainable model (reference mesh.py:8-38):
    # vertices train through the silhouette loss; textures are constant
    # white (they get exactly-zero grads here, which the custom Adam's
    # zero-grad skip leaves untouched — reference optimizers.py:23-28).
    vertices, faces = nr.load_obj(args.filename_obj)
    texture_size = 2
    textures = np.ones(
        (faces.shape[0], texture_size, texture_size, texture_size, 3),
        'float32')
    mesh = nr.Mesh(vertices=jnp.asarray(vertices),
                   textures=jnp.asarray(textures), faces=faces)
    image_ref = jnp.asarray(
        imread(args.filename_ref).astype('float32').mean(-1) / 255.0)

    renderer = nr.Renderer()
    renderer.eye = nr.get_points_from_angles(2.732, 0, 90)

    def loss_fn(m):
        image = renderer.render_silhouettes(m.vertices[None], m.faces[None])
        return jnp.sum(jnp.square(image - image_ref[None]))

    init_fn, update_fn = nr.adam(lr_scales=mesh.lr_scales())
    opt_state = init_fn(mesh)

    @jax.jit
    def step(m, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(m)
        updates, opt_state = update_fn(grads, opt_state)
        return jax.tree.map(lambda p, u: p + u, m, updates), opt_state, loss

    render_sil = jax.jit(
        lambda m: renderer.render_silhouettes(m.vertices[None],
                                              m.faces[None]))

    frames = []
    loop = tqdm.tqdm(range(args.num_steps))
    for i in loop:
        mesh, opt_state, loss = step(mesh, opt_state)
        loop.set_description('Optimizing (loss %.4f)' % float(loss))
        image = np.asarray(render_sil(mesh))[0]
        frame = '%s/_tmp_%04d.png' % (working_directory, i)
        imsave01(frame, image)
        frames.append(frame)
    make_gif(frames, args.filename_output_optimization)
    for f in frames:
        os.remove(f)

    # result sweep
    @jax.jit
    def render_rgb(m, eye):
        renderer.eye = eye
        return renderer.render(m.vertices[None], m.faces[None],
                               m.textures[None])

    frames = []
    loop = tqdm.tqdm(range(0, 360, 4))
    for num, azimuth in enumerate(loop):
        loop.set_description('Drawing')
        eye = nr.get_points_from_angles(
            np.float32(2.732), np.float32(0), np.float32(azimuth))
        images = np.asarray(render_rgb(mesh, jnp.asarray(eye)))
        frame = '%s/_tmp_%04d.png' % (working_directory, num)
        imsave01(frame, images[0].transpose(1, 2, 0))
        frames.append(frame)
    make_gif(frames, args.filename_output_result)
    for f in frames:
        os.remove(f)


if __name__ == '__main__':
    run()
