"""Minimal image I/O helpers (PIL-backed).

Stand-ins for the reference's scipy.misc.imread / imsave / toimage usage
(removed from scipy long ago).  ``imread`` returns uint8 arrays like
scipy.misc.imread did; ``imsave01`` maps float [0,1] -> uint8 like
``scipy.misc.toimage(x, cmin=0, cmax=1)``.
"""

import numpy as np
from PIL import Image


def imread(path):
    return np.asarray(Image.open(path))


def imsave(path, array):
    array = np.asarray(array)
    if array.dtype != np.uint8:
        array = np.clip(array, 0, 255).astype(np.uint8)
    Image.fromarray(array).save(path)


def imsave01(path, array):
    """Save float array scaled from [0, 1] (clipped) to uint8."""
    array = np.asarray(array, np.float32)
    imsave(path, (np.clip(array, 0.0, 1.0) * 255.0).round().astype(np.uint8))


def make_gif(filenames, output_path, fps=12):
    """Assemble PNG frames into a GIF (replaces the reference's ImageMagick
    ``convert`` subprocess, examples/example1.py:57-58).

    Uses imageio when installed (better palette handling), else Pillow."""
    try:
        import imageio
        frames = [imageio.v2.imread(f) for f in filenames]
        imageio.mimsave(output_path, frames, duration=1.0 / fps, loop=0)
    except ImportError:
        frames = [Image.open(f).convert('P') for f in filenames]
        frames[0].save(output_path, save_all=True, append_images=frames[1:],
                       duration=int(1000 / fps), loop=0)
