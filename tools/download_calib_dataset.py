"""Download calibration/eval datasets to disk for offline runs.

Reference analog: tools/download_calib_dataset.py +
tools/download_eval_dataset.py (HF datasets -> save_to_disk).  Usage:

    python tools/download_calib_dataset.py --name pileval --save_path ./calib
    python tools/download_eval_dataset.py  --name wikitext2 --save_path ./eval
"""

import argparse

SOURCES = {
    'calib': {
        'pileval': ('mit-han-lab/pile-val-backup', 'validation'),
        'wikitext2': ('wikitext', 'train', 'wikitext-2-raw-v1'),
        'c4': ('allenai/c4', 'train', 'en'),
        'ptb': ('ptb_text_only', 'train'),
        'ultrachat': ('HuggingFaceH4/ultrachat_200k', 'train_sft'),
    },
    'eval': {
        'wikitext2': ('wikitext', 'test', 'wikitext-2-raw-v1'),
        'c4': ('allenai/c4', 'validation', 'en'),
        'ptb': ('ptb_text_only', 'test'),
    },
}


def run(kind: str):
    ap = argparse.ArgumentParser()
    ap.add_argument('--name', required=True, choices=sorted(SOURCES[kind]))
    ap.add_argument('--save_path', required=True)
    args = ap.parse_args()
    import datasets
    spec = SOURCES[kind][args.name]
    repo, split = spec[0], spec[1]
    sub = spec[2] if len(spec) > 2 else None
    ds = datasets.load_dataset(repo, sub, split=split) if sub \
        else datasets.load_dataset(repo, split=split)
    ds.save_to_disk(args.save_path)
    print(f'saved {args.name} ({len(ds)} rows) to {args.save_path}')


if __name__ == '__main__':
    run('calib')
