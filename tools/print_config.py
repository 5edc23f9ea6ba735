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
    args = parser.parse_args()

    from imvoxelnet_tpu.configs.presets import PRESETS, get_preset

    if args.preset is None:
        print('\n'.join(sorted(PRESETS)))
        return
    preset = get_preset(args.preset)
    pprint.pprint(dataclasses.asdict(preset))


if __name__ == '__main__':
    main()
