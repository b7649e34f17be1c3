"""Static tail attribution: walk the bench step's jaxpr and cost every
non-Pallas op with the measured TPU performance model (NOTES.md):

  * elementwise / transpose / reshape / select ...: HBM traffic at ~540 GB/s
    (sum of operand + result bytes; TPU fuses producers, so this is an
    UPPER bound per op and an honest bound for materialization points)
  * gather (random per-index): ~40 ns/index
  * scatter-add (segment_sum): ~20 ns/index (post-CSR fused-channel rate)
  * dot_general: max(MXU flops at ~200 Tf/s bf16 / ~100 Tf/s f32, traffic)
  * pallas_call: listed separately (measured on-chip, not modeled)

The device step's kernel time is known from the trace; everything else is
"the tail".  This script ranks where the tail bytes/indices actually are,
so tail work can be targeted before the chip is reachable.  Run on CPU:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python misc/jaxpr_cost.py

The TPU code path (auto fast: Pallas kernels + CSR reduction + runtime
guards) is selected by monkeypatching jax.default_backend during TRACING
only — nothing is compiled or run.
"""

import collections
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..'))

import jax
import jax.numpy as jnp
import numpy as np

BATCH_SIZE = int(os.environ.get('BENCH_BATCH_SIZE', 32))
IMAGE_SIZE = int(os.environ.get('BENCH_IMAGE_SIZE', 256))

HBM_GBPS = 540.0
GATHER_NS = 40.0
SCATTER_NS = 20.0
MXU_F32_TFLOPS = 100.0

_ELEMENTWISE_EXTRA = {
    'div': 3.0,       # divides are multi-pass on the VPU
    'rsqrt': 3.0, 'sqrt': 3.0, 'exp': 3.0, 'log': 3.0, 'tanh': 4.0,
}


def _bytes(v):
    aval = v.aval
    if not hasattr(aval, 'shape'):
        return 0
    return int(np.prod(aval.shape, dtype=np.int64)) * aval.dtype.itemsize


def _cost_eqn(eqn):
    """Return (category, est_ms, note) for one jaxpr eqn."""
    p = eqn.primitive.name
    in_b = sum(_bytes(v) for v in eqn.invars if hasattr(v, 'aval'))
    out_b = sum(_bytes(v) for v in eqn.outvars)
    traffic_ms = (in_b + out_b) / (HBM_GBPS * 1e6)

    if p == 'pallas_call':
        return ('KERNEL', 0.0, eqn.params.get('name', ''))
    if p in ('gather', 'take', 'dynamic_slice'):
        # cost model: one random row fetch per output row (row width is
        # nearly free); approximate indices by output elements / trailing
        out_aval = eqn.outvars[0].aval
        n_idx = int(np.prod(out_aval.shape[:-1], dtype=np.int64)) \
            if out_aval.shape else 1
        if p == 'dynamic_slice':
            return ('copy', traffic_ms, '')
        return ('gather', max(n_idx * GATHER_NS / 1e6, traffic_ms),
                f'{n_idx} idx')
    if p in ('scatter-add', 'scatter_add', 'scatter'):
        upd = eqn.invars[2].aval if len(eqn.invars) > 2 else eqn.outvars[0].aval
        n_idx = int(np.prod(upd.shape[:1], dtype=np.int64))
        return ('scatter', max(n_idx * SCATTER_NS / 1e6, traffic_ms),
                f'{n_idx} rows')
    if p == 'dot_general':
        a, b = eqn.invars[0].aval, eqn.invars[1].aval
        dims = eqn.params['dimension_numbers']
        (lc, rc), _ = dims
        m = int(np.prod([d for i, d in enumerate(a.shape) if i not in lc]))
        k = int(np.prod([a.shape[i] for i in lc]))
        n = int(np.prod([d for i, d in enumerate(b.shape) if i not in rc]))
        flops_ms = 2.0 * m * n * k / (MXU_F32_TFLOPS * 1e9)
        return ('dot', max(flops_ms, traffic_ms), f'{m}x{k}x{n}')
    if p in ('transpose', 'rev', 'concatenate', 'pad', 'copy',
             'reshape', 'squeeze', 'broadcast_in_dim', 'slice',
             'convert_element_type', 'dynamic_update_slice',
             'optimization_barrier', 'select_n'):
        return ('copy', traffic_ms, '')
    if p in ('reduce_sum', 'reduce_max', 'reduce_min', 'reduce_and',
             'reduce_or', 'argmax', 'argmin', 'reduce_window_sum',
             'cumsum', 'cumlogsumexp', 'cummax', 'sort'):
        return ('reduce', traffic_ms, '')
    mult = _ELEMENTWISE_EXTRA.get(p, 1.0)
    return ('elementwise', traffic_ms * mult, '')


def walk(jaxpr, agg, kernels, depth=0, branch=''):
    for eqn in jaxpr.eqns:
        p = eqn.primitive.name
        subs = []
        if p == 'cond':
            # auto fast path: branch 1 (index order: false, true) is the
            # Pallas/fits branch for the forward cond; cost ONLY the branch
            # that runs in the steady state (the fits branch) but keep both
            # labeled for inspection.  jax orders branches (false, true).
            brs = eqn.params['branches']
            subs = [(brs[-1].jaxpr, branch + '/cond.true')]
        elif p in ('pjit', 'closed_call', 'core_call', 'remat_call',
                   'custom_jvp_call', 'custom_vjp_call',
                   'custom_vjp_call_jaxpr', 'checkpoint'):
            inner = (eqn.params.get('jaxpr')
                     or eqn.params.get('call_jaxpr')
                     or eqn.params.get('fun_jaxpr'))
            if inner is not None:
                cj = inner.jaxpr if hasattr(inner, 'jaxpr') else inner
                subs = [(cj, branch)]
        elif p == 'scan':
            cj = eqn.params['jaxpr'].jaxpr
            # scan body cost x length
            sub_agg = collections.defaultdict(float)
            sub_items = []
            walk_collect(cj, sub_agg, sub_items, kernels,
                         branch + '/scan')
            n = eqn.params['length']
            for k, v in sub_agg.items():
                agg[k] += v * n
            continue
        elif p == 'while':
            cj = eqn.params['body_jaxpr'].jaxpr
            subs = [(cj, branch + '/while')]

        if subs:
            for cj, br in subs:
                walk(cj, agg, kernels, depth + 1, br)
            continue

        cat, ms, note = _cost_eqn(eqn)
        if cat == 'KERNEL':
            kernels.append((note, branch))
            continue
        src = str(eqn.source_info.name_stack)
        key = (cat, p, src[:60], branch)
        agg[key] += ms


def walk_collect(jaxpr, agg, items, kernels, branch):
    tmp = collections.defaultdict(float)
    walk(jaxpr, tmp, kernels, branch=branch)
    for k, v in tmp.items():
        agg[k] += v


def main():
    import neural_renderer_tpu as nr

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..',
                        'tests', 'data', 'teapot.obj')
    vertices, faces = nr.load_obj(path)
    vertices = jnp.asarray(np.tile(np.asarray(vertices)[None],
                                   (BATCH_SIZE, 1, 1)))
    faces = jnp.asarray(np.tile(np.asarray(faces)[None], (BATCH_SIZE, 1, 1)))
    textures = jnp.ones((BATCH_SIZE, faces.shape[1], 2, 2, 2, 3),
                        jnp.float32)
    eye = jnp.asarray(nr.get_points_from_angles(
        np.float32(2.732), np.float32(30), np.float32(90)))

    renderer = nr.Renderer()
    renderer.image_size = IMAGE_SIZE
    renderer.eye = eye

    def loss(v, tx):
        return jnp.sum(renderer.render(v, faces, tx))

    # trace the TPU-shaped graph (Pallas + auto fast) without a TPU
    orig = jax.default_backend
    jax.default_backend = lambda: 'tpu'
    try:
        jaxpr = jax.make_jaxpr(jax.value_and_grad(loss, argnums=(0, 1)))(
            vertices, textures)
    finally:
        jax.default_backend = orig

    agg = collections.defaultdict(float)
    kernels = []
    walk(jaxpr.jaxpr, agg, kernels)

    print(f'== modeled non-kernel costs, teapot bs{BATCH_SIZE} '
          f'{IMAGE_SIZE}^2+AA (ms, upper bounds — XLA fusion reduces '
          f'elementwise rows) ==')
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    total = sum(agg.values())
    by_cat = collections.defaultdict(float)
    by_src = collections.defaultdict(float)
    for (cat, p, src, br), ms in rows:
        by_cat[cat] += ms
        by_src[src] += ms
    for (cat, p, src, br), ms in rows[:40]:
        if ms < 0.05:
            break
        print(f'{ms:8.2f}  {cat:<11s} {p:<22s} {src}{br}')
    print('-- by category --')
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f'{ms:8.2f}  {cat}')
    print('-- by source (top 15) --')
    for src, ms in sorted(by_src.items(), key=lambda kv: -kv[1])[:15]:
        print(f'{ms:8.2f}  {src}')
    print(f'TOTAL modeled non-kernel: {total:.1f} ms')
    print(f'pallas kernels in graph: '
          f'{collections.Counter(k for k, _ in kernels)}')


if __name__ == '__main__':
    main()
