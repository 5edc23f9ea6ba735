"""Print the resolved configuration of a preset
(parity: ``tools/print_config.py``)."""

import argparse
import dataclasses
import os
import pprint
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('preset', nargs='?', default=None)
    parser.add_argument('--override', action='append', default=None,
                        metavar='PATH=VALUE',
                        help='preset field override, e.g. '
                             'model.indoor_head.score_thr=0.1 '
                             '(repeatable; the reference --options '
                             'analog)')
    args = parser.parse_args()

    from imvoxelnet_tpu.configs.presets import PRESETS, get_preset

    if args.preset is None:
        print('\n'.join(sorted(PRESETS)))
        return
    preset = get_preset(args.preset)
    if args.override:
        from imvoxelnet_tpu.configs.presets import apply_overrides
        preset = apply_overrides(preset, args.override)
    pprint.pprint(dataclasses.asdict(preset))


if __name__ == '__main__':
    main()
