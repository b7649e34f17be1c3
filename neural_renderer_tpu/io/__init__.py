"""Asset I/O: Wavefront OBJ/MTL parsing, texture loading, atlas export.

The reference's L4 layer (``load_obj.py``, ``save_obj.py``) runs two CUDA
kernels (K8 texture-cube fill, K9/K10 atlas bake) at asset-load scale; here
everything is vectorized host-side numpy — these paths are I/O-bound, not
compute-bound, and keeping them off-device avoids polluting jit caches with
one-shot shapes.
"""
