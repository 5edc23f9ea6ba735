"""Per-op device-time attribution from a ``jax.profiler`` trace.

``tools/benchmark.py --trace DIR`` writes a Perfetto trace under
``DIR/plugins/profile/<ts>/*.trace.json.gz``.  This digests it into the
attribution table used in docs/performance.md: total device-lane time per
XLA op (fusion names), sorted, with an optional regex bucketing so related
fusions (e.g. all conv dgrads) report as one line.

    python tools/analyze_trace.py /tmp/nusc_trace --top 40
    python tools/analyze_trace.py /tmp/nusc_trace --steps 8   # per-step ms
    python tools/analyze_trace.py /tmp/nusc_trace --by-source --steps 8

``--by-source`` groups by the ``args.source`` (repo file:line) XLA records
on each op — the fusion-name table answers *which op*, this answers *whose
code*.  A fusion's source is its root instruction's, so elementwise ops
fused into a conv are billed to the conv's line; while-loop self time
(carry copies) carries the loop's own source.

The reference has no tracer at all (SURVEY.md §5); this pairs with the
``--trace`` flag as the profiling story.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re


def load_events(trace_dir):
    pats = (os.path.join(trace_dir, 'plugins/profile/*/*.trace.json.gz'),
            os.path.join(trace_dir, '*.trace.json.gz'))
    files = sorted(f for p in pats for f in glob.glob(p))
    if not files:
        raise SystemExit(f'no *.trace.json.gz under {trace_dir}')
    with gzip.open(files[-1], 'rt') as f:
        data = json.load(f)
    return data['traceEvents']


def device_op_lanes(events):
    """(pid, tid) pairs of the device op lanes.

    A device process carries three lanes: ``Steps``, ``XLA Modules`` (the
    whole-executable spans) and ``XLA Ops`` (the leaf ops).  Summing anything
    other than the op lane double-counts parents.
    """
    pids = set()
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            name = e.get('args', {}).get('name', '')
            if re.search(r'TPU|/device:|Device', name) and \
                    'CPU' not in name.upper():
                pids.add(e['pid'])
    lanes = set()
    for e in events:
        if (e.get('ph') == 'M' and e.get('name') == 'thread_name'
                and e['pid'] in pids
                and e.get('args', {}).get('name') == 'XLA Ops'):
            lanes.add((e['pid'], e['tid']))
    return lanes


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('trace_dir')
    parser.add_argument('--top', type=int, default=30)
    parser.add_argument('--steps', type=int, default=None,
                        help='divide totals by N steps for per-step ms')
    parser.add_argument('--min-ms', type=float, default=0.0)
    parser.add_argument('--bucket', action='append', default=[],
                        help='NAME=REGEX: merge matching ops into NAME '
                             '(repeatable, first match wins)')
    parser.add_argument('--by-source', action='store_true',
                        help='group by args.source (file:line) instead of '
                             'op name')
    parser.add_argument('--by-line', action='store_true',
                        help='with --by-source, keep line numbers instead '
                             'of collapsing to files')
    args = parser.parse_args()

    events = load_events(args.trace_dir)
    lanes = device_op_lanes(events)
    buckets = [b.split('=', 1) for b in args.bucket]

    total = collections.Counter()
    count = collections.Counter()
    lane_total = 0.0
    for e in events:
        if e.get('ph') != 'X' or (e.get('pid'), e.get('tid')) not in lanes:
            continue
        dur = e.get('dur', 0) / 1e3          # us -> ms
        name = e.get('name', '?')
        if args.by_source:
            src = e.get('args', {}).get('source', '')
            name = src.replace('/root/repo/', '') or f'(no source: {name})'
            if not args.by_line:
                name = name.rsplit(':', 1)[0]
        lane_total += dur
        for bname, rx in buckets:
            if re.search(rx, name):
                name = bname
                break
        total[name] += dur
        count[name] += 1

    div = args.steps or 1
    unit = 'ms/step' if args.steps else 'ms total'
    print(f'device-lane events: {sum(count.values())}, '
          f'lane total {lane_total / div:.1f} {unit}')
    print(f'{"op":<64} {unit:>12} {"calls":>7} {"%":>6}')
    shown = 0.0
    for name, ms in total.most_common():
        # --min-ms extends the listing past --top: rows at or above the
        # threshold keep printing (with the default 0 the table stops at
        # --top exactly).
        if shown >= args.top and not (args.min_ms > 0
                                      and ms / div >= args.min_ms):
            break
        print(f'{name[:64]:<64} {ms / div:12.2f} {count[name]:7d} '
              f'{100 * ms / lane_total:6.1f}')
        shown += 1
    rest = lane_total - sum(ms for _, ms in total.most_common(int(shown)))
    print(f'{"(rest)":<64} {rest / div:12.2f}')


if __name__ == '__main__':
    main()
