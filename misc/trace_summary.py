"""Summarize a jax.profiler trace: per-op TPU device time, grouped.

    python misc/trace_summary.py /tmp/nr_trace/plugins/profile/*/vm.trace.json.gz [--steps N]

Aggregates the 'XLA Ops' device track by op name (fusion instances fold
together), prints ms/step so kernel and fusion costs attribute directly
against the bench step budget.
"""

import argparse
import collections
import glob
import gzip
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('path')
    ap.add_argument('--steps', type=int, default=3)
    ap.add_argument('--top', type=int, default=40)
    args = ap.parse_args()

    path = sorted(glob.glob(args.path))[-1]
    with gzip.open(path) as f:
        d = json.load(f)
    ev = d.get('traceEvents', [])

    # device pid + 'XLA Ops' tid
    dev_pids = {e['pid'] for e in ev
                if e.get('ph') == 'M' and e.get('name') == 'process_name'
                and 'TPU' in e['args'].get('name', '')}
    op_tids = {(e['pid'], e['tid']) for e in ev
               if e.get('ph') == 'M' and e.get('name') == 'thread_name'
               and e['args'].get('name') == 'XLA Ops'
               and e['pid'] in dev_pids}

    # events nest (cond encloses its branch computation, which encloses the
    # ops inside): attribute SELF time — duration minus enclosed children —
    # so a cond wrapper shows only its own boundary cost, not its body.
    spans = [e for e in ev
             if e.get('ph') == 'X'
             and (e.get('pid'), e.get('tid')) in op_tids]
    spans.sort(key=lambda e: (e['ts'], -e.get('dur', 0)))
    tot = collections.Counter()
    cnt = collections.Counter()
    # nesting only holds WITHIN one device track — with multiple TPU
    # tracks (multi-core traces) concurrent spans from different tracks
    # would otherwise subtract from unrelated parents, so keep one stack
    # per (pid, tid)
    stacks = collections.defaultdict(list)  # (pid,tid) -> [(end_ts, name)]
    for e in spans:
        ts, dur, name = e['ts'], e.get('dur', 0), e['name']
        stack = stacks[(e['pid'], e['tid'])]
        while stack and stack[-1][0] <= ts:
            stack.pop()
        if stack:
            tot[stack[-1][1]] -= dur
        tot[name] += dur
        cnt[name] += 1
        stack.append((ts + dur, name))

    total = sum(tot.values())
    print(f'total device op time: {total / 1e3 / args.steps:8.2f} ms/step '
          f'({len(tot)} distinct ops, self-time)')
    for name, us in tot.most_common(args.top):
        print(f'{us / 1e3 / args.steps:9.3f} ms/step  x{cnt[name] // args.steps:<3d} '
              f'{name[:110]}')


if __name__ == '__main__':
    main()
