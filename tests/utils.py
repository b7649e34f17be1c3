"""Shared fixtures mirroring reference tests/utils.py.

``to_minibatch`` embeds the single real sample at batch index 2 of a zeros
batch of 4 — a deliberate batch-independence probe (leakage across batch rows
corrupts the compared row).
"""

import os

import numpy as np

import neural_renderer_tpu as nr

DATA_DIR = os.path.join(os.path.dirname(__file__), 'data')


def to_minibatch(data, batch_size=4, target_num=2):
    ret = []
    for d in data:
        d = np.asarray(d)
        d2 = np.repeat(np.expand_dims(np.zeros_like(d), 0), batch_size,
                       axis=0)
        d2[target_num] = d
        ret.append(d2)
    return ret


def load_teapot_batch(batch_size=4, target_num=2):
    vertices, faces = nr.load_obj(os.path.join(DATA_DIR, 'teapot.obj'))
    textures = np.ones((faces.shape[0], 4, 4, 4, 3), 'float32')
    vertices, faces, textures = to_minibatch(
        (vertices, faces, textures), batch_size, target_num)
    return vertices, faces, textures


def load_blender_silhouette():
    """tests/data/teapot_blender.png -> binary [256,256] float mask."""
    from neural_renderer_tpu.io.image import imread
    ref = imread(os.path.join(DATA_DIR, 'teapot_blender.png'))
    ref = ref.astype('float32')
    return (ref.min(-1) != 255).astype('float32')
