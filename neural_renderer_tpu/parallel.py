"""Multi-device batch parallelism over a TPU mesh.

The reference is single-GPU (SURVEY.md section 2.3): its only parallel axis is
the leading batch dimension carried by every kernel.  Here that axis becomes a
first-class ``jax.sharding.Mesh`` axis: rendering is embarrassingly
batch-parallel (``shard_map`` with no collectives), and training steps
all-reduce gradients over ICI with ``psum`` — the standard data-parallel
recipe, no custom communication backend needed.
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
