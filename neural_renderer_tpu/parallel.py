"""Multi-device parallelism over a TPU mesh.

The reference is single-GPU (SURVEY.md section 2.3): its only parallel axis is
the leading batch dimension carried by every kernel.  Here two mesh axes are
first-class:

* **batch** (data parallel): rendering is embarrassingly batch-parallel
  (``shard_map`` with no collectives); training steps all-reduce gradients
  over ICI with ``psum``.
* **faces** (model parallel — the scaling axis for huge meshes, SURVEY
  §2.3.3): the face list and texture cubes shard over devices, each device
  rasterizes its slice, and the per-device z-buffers merge with a
  lexicographic (depth, global id) ``pmin`` that reproduces the reference's
  sequential first-wins rule over the concatenated list exactly
  (``rasterize/core._merge_face_axis``).  The backward stays local to each
  device's slice; vertex gradients sum across shards via ``shard_map``'s
  own transpose.

The two compose on a 2-D mesh (batch x faces).  No custom communication
backend — XLA collectives over ICI only.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

BATCH_AXIS = 'batch'


def default_mesh(devices=None, axis_name=BATCH_AXIS):
    """1-D device mesh over all (or the given) devices."""
    import numpy as np
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh, *arrays):
    """Device-put arrays sharded on their leading (batch) axis."""
    sharding = NamedSharding(mesh, P(BATCH_AXIS))
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out[0] if len(out) == 1 else out


def make_sharded_render(renderer, mesh, mode='rgb'):
    """Build a REUSABLE jitted sharded-render callable.

    mode: 'rgb' | 'silhouettes' | 'depth' | 'rgbad'.  Each device renders
    its local batch shard — zero inter-chip communication.  Renderer
    attributes (camera, lights, perf knobs) are captured at trace time;
    re-make after changing them.  For per-call camera poses, set
    ``renderer.eye`` to a sharded ``[bs, 3]`` array before making (it is a
    traced constant of the compiled program) or thread it through your own
    jitted step like the examples do.

    Returns ``f(vertices, faces[, textures])``.
    """
    spec = P(BATCH_AXIS)

    if mode in ('rgb', 'rgbad'):
        fn = renderer.render if mode == 'rgb' else renderer.render_rgbad
        out_specs = spec if mode == 'rgb' else dict(
            rgb=spec, alpha=spec, depth=spec)

        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(spec, spec, spec), out_specs=out_specs)
        def f(v, fc, tx):
            return fn(v, fc, tx)

        return jax.jit(f)

    fn = (renderer.render_silhouettes if mode == 'silhouettes'
          else renderer.render_depth)

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec, spec),
                       out_specs=spec)
    def f(v, fc):
        return fn(v, fc)

    return jax.jit(f)


def sharded_render(renderer, mesh, vertices, faces, textures=None,
                   mode='rgb'):
    """One-shot convenience wrapper over ``make_sharded_render``.

    NOTE: builds (and traces) a fresh program per call — hold on to
    ``make_sharded_render``'s callable for loops."""
    f = make_sharded_render(renderer, mesh, mode)
    if mode in ('rgb', 'rgbad'):
        return f(vertices, faces, textures)
    return f(vertices, faces)


FACE_AXIS = 'faces'


def shard_faces(mesh, faces, textures=None, axis_name=FACE_AXIS,
                pad_face=None):
    """Device-put ``faces`` [bs, nf, 3] (+ per-face ``textures``) sharded on
    the face axis, padding nf up to a multiple of the axis size with
    degenerate faces (repeats of ``pad_face`` or vertex 0) that rasterize
    to nothing."""
    import numpy as np
    n = mesh.shape[axis_name]
    faces = np.asarray(faces)
    nf = faces.shape[1]
    pad = (-nf) % n
    if pad:
        filler = (np.zeros((faces.shape[0], pad, 3), faces.dtype)
                  if pad_face is None
                  else np.tile(np.asarray(pad_face, faces.dtype)
                               .reshape(1, 1, 3), (faces.shape[0], pad, 1)))
        faces = np.concatenate([faces, filler], axis=1)
    fspec = NamedSharding(mesh, P(None, axis_name))
    out_faces = jax.device_put(faces, fspec)
    if textures is None:
        return out_faces
    textures = np.asarray(textures)
    if pad:
        textures = np.concatenate(
            [textures, np.zeros((textures.shape[0], pad)
                                + textures.shape[2:], textures.dtype)],
            axis=1)
    return out_faces, jax.device_put(textures, fspec)


def make_face_sharded_render(renderer, mesh, mode='rgb',
                             axis_name=FACE_AXIS, batch_axis=None):
    """Build a jitted render callable with the FACE axis sharded over
    ``mesh[axis_name]`` (optionally composed with batch sharding over
    ``mesh[batch_axis]`` on a 2-D mesh).

    vertices are replicated over the face axis; ``faces`` [bs, nf, 3] (and
    ``textures`` [bs, nf, ts...]) must be sharded on axis 1 (see
    ``shard_faces``).  Each device rasterizes its slice and the z-buffers
    merge across the axis inside the rasterizer (``RasterizeSettings.
    face_axis``).  Rendering is exact for the SHARD-ORDER face list; note
    ``fill_back`` doubles each local slice in place, so z-ties between
    exactly coincident faces of *different* shards may resolve differently
    than the reference's global [faces, reversed] order (a face still
    always beats its own mirror copy).

    Returns ``f(vertices, faces[, textures])``.
    """
    import copy

    r = copy.copy(renderer)
    r.perf_overrides = dict(renderer.perf_overrides, face_axis=axis_name)

    b = batch_axis
    v_spec = P(b)                      # vertices [bs, nv, 3]
    f_spec = P(b, axis_name)           # faces / textures [bs, nf, ...]
    out_spec = P(b)

    if mode in ('rgb', 'rgbad'):
        fn = r.render if mode == 'rgb' else r.render_rgbad
        out_specs = out_spec if mode == 'rgb' else dict(
            rgb=out_spec, alpha=out_spec, depth=out_spec)

        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(v_spec, f_spec, f_spec),
                           out_specs=out_specs)
        def f(v, fc, tx):
            return fn(v, fc, tx)

        return jax.jit(f)

    fn = (r.render_silhouettes if mode == 'silhouettes'
          else r.render_depth)

    @functools.partial(shard_map, mesh=mesh, in_specs=(v_spec, f_spec),
                       out_specs=out_spec)
    def f(v, fc):
        return fn(v, fc)

    return jax.jit(f)


def make_data_parallel_train_step(loss_fn, opt_update, mesh):
    """Build a jitted DP train step: params replicated, batch sharded.

    loss_fn(params, batch_slice) -> scalar loss for the local shard.
    opt_update(grads, opt_state) -> (updates, new_opt_state)
    Returns step(params, opt_state, batch) -> (params, opt_state, loss) with
    gradients mean-reduced over the batch axis via psum (rides ICI).
    """
    def local_step(params, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        grads = jax.lax.pmean(grads, BATCH_AXIS)
        loss = jax.lax.pmean(loss, BATCH_AXIS)
        return loss, grads

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(BATCH_AXIS)),
        out_specs=(P(), P()))

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = sharded(params, batch)
        updates, opt_state = opt_update(grads, opt_state)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return step
