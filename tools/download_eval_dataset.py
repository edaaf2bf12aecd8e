"""Download eval datasets (wikitext2/c4/ptb test splits) to disk.

Reference analog: tools/download_eval_dataset.py.  Usage:

    python tools/download_eval_dataset.py --name wikitext2 --save_path ./eval
"""

import argparse

SOURCES = {
    'wikitext2': ('wikitext', 'test', 'wikitext-2-raw-v1'),
    'c4': ('allenai/c4', 'validation', 'en'),
    'ptb': ('ptb_text_only', 'test'),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--name', required=True, choices=sorted(SOURCES))
    ap.add_argument('--save_path', required=True)
    args = ap.parse_args()
    import datasets
    spec = SOURCES[args.name]
    repo, split = spec[0], spec[1]
    sub = spec[2] if len(spec) > 2 else None
    ds = datasets.load_dataset(repo, sub, split=split) if sub \
        else datasets.load_dataset(repo, split=split)
    ds.save_to_disk(args.save_path)
    print(f'saved {args.name} ({len(ds)} rows) to {args.save_path}')


if __name__ == '__main__':
    main()
