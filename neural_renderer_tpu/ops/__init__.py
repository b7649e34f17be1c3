"""Pure-JAX differentiable math ops (camera transforms, lighting, gathers).

These replace the reference's L2 "functional ops layer"
(reference ``neural_renderer/{cross,look,look_at,perspective,lighting,
vertices_to_faces,get_points_from_angles}.py``) with jit/vmap-able functions.
No custom gradients are needed anywhere in this package — JAX autodiff of the
closed-form math reproduces the reference's hand-written backwards exactly
(e.g. d(cross)/da = b x g, reference ``cross.py:50-55``).
"""
