"""Strip optimizer state from a checkpoint and append a content hash to the
filename (parity: ``tools/publish_model.py``)."""

import argparse
import hashlib
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('in_file')
    parser.add_argument('out_file')
    args = parser.parse_args()

    with open(args.in_file, 'rb') as f:
        payload = pickle.load(f)
    slim = {k: payload[k] for k in ('params', 'batch_stats', 'meta')
            if k in payload}
    blob = pickle.dumps(slim, protocol=4)
    sha = hashlib.sha256(blob).hexdigest()[:8]
    out = args.out_file
    if out.endswith('.ckpt'):
        out = out[:-5] + f'-{sha}.ckpt'
    else:
        out = out + f'-{sha}'
    with open(out, 'wb') as f:
        f.write(blob)
    print(f'published {out}')


if __name__ == '__main__':
    main()
