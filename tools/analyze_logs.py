"""Training-log analysis (parity: ``tools/analyze_logs.py``): summarize or
plot loss curves from the jsonl train log."""

import argparse
import json


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('log', help='train_log.jsonl from tools/train.py')
    parser.add_argument('--keys', nargs='+', default=['loss'])
    parser.add_argument('--plot', default=None, help='output png path')
    args = parser.parse_args()

    records = []
    with open(args.log) as f:
        for line in f:
            if line.strip():
                records.append(json.loads(line))
    if not records:
        print('empty log')
        return

    for key in args.keys:
        vals = [r[key] for r in records if key in r]
        if not vals:
            continue
        print(f'{key}: first={vals[0]:.4f} last={vals[-1]:.4f} '
              f'min={min(vals):.4f} max={max(vals):.4f} n={len(vals)}')

    if args.plot:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        steps = [r.get('step', i) for i, r in enumerate(records)]
        for key in args.keys:
            vals = [r.get(key) for r in records]
            plt.plot(steps, vals, label=key)
        plt.xlabel('step')
        plt.legend()
        plt.savefig(args.plot, dpi=120)
        print(f'saved {args.plot}')


if __name__ == '__main__':
    main()
