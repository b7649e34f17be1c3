"""Host-side spatial face ordering (Morton / Z-order of face centroids).

The Pallas forward streams per-patch face chunks and fetches each chunk's
features with a one-hot MXU contraction over the face axis.  The fetch
(and its one-hot compare) contracts over a dynamic tile window when the
chunk's member-face id span is small (``forward_pallas._FWT`` tiles, gated
at run time per patch-chunk — exact for any order).  File order rarely has
that locality (teapot at 512^2: mean id span 21 of 39 tiles, measured);
a one-time Morton sort of face centroids gives neighboring faces
neighboring ids from ANY viewpoint, activating the windowed fetch.

This is a pure preprocessing reorder with no reference counterpart (the
reference's per-thread face loop has no locality preference,
rasterize.py:300).  Rendering results are identical except where two faces
of EXACTLY equal depth fight for a pixel: the z-buffer's first-wins rule
follows list order (rasterize.py:334), so tie resolution follows the new
order.  Generic scenes have no exact-z ties (coincident front faces);
hence ``Mesh(spatial_order=True)`` is opt-in and documented.
"""

import numpy as np


def _morton3(q):
    """Interleave 3 x 10-bit coords into a 30-bit Morton code.  q: [n, 3]
    integer array with values in [0, 1024)."""

    def spread(x):
        x = x.astype(np.uint32)
        x = (x | (x << np.uint32(16))) & np.uint32(0x030000FF)
        x = (x | (x << np.uint32(8))) & np.uint32(0x0300F00F)
        x = (x | (x << np.uint32(4))) & np.uint32(0x030C30C3)
        x = (x | (x << np.uint32(2))) & np.uint32(0x09249249)
        return x

    x, y, z = (spread(q[:, i]) for i in range(3))
    return x | (y << np.uint32(1)) | (z << np.uint32(2))


def face_spatial_order(vertices, faces):
    """Permutation [nf] int32 ordering faces by the Morton code of their
    centroid (camera-independent 3D locality).

    vertices: [nv, 3]; faces: [nf, 3] int.  Apply as ``faces[perm]`` (and
    ``textures[perm]`` to keep per-face data aligned).
    """
    v = np.asarray(vertices, np.float64)
    f = np.asarray(faces, np.int64)
    c = v[f].mean(axis=1)                       # [nf, 3] centroids
    lo = c.min(axis=0)
    span = np.maximum(c.max(axis=0) - lo, 1e-12)
    q = np.clip((c - lo) / span * 1023.0, 0.0, 1023.0).astype(np.uint32)
    return np.argsort(_morton3(q), kind='stable').astype(np.int32)


def spatial_sort(vertices, faces, textures=None):
    """Convenience wrapper: returns (faces[perm], textures[perm], perm).

    ``vertices`` are returned untouched by construction (the permutation
    only reorders faces and their per-face attributes).
    """
    perm = face_spatial_order(vertices, faces)
    f = np.asarray(faces)[perm]
    t = None if textures is None else np.asarray(textures)[perm]
    return f, t, perm
