"""lm-evaluation-harness CLI on a compressed model.

Reference: /root/reference/tools/llm_eval.py:14-46 (external-process
lm-eval on the transformed checkpoint) + scripts/run_lm_eval.sh.  Here
the pipeline runs in-process: the config is executed (so the model is
transformed/quantized exactly as configured) and the resulting model +
fake-quant QMap are handed to lm_eval through LMEvalAdapter.

    python tools/llm_eval.py --config cfg.yml --tasks lambada_openai
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', required=True)
    ap.add_argument('--tasks', required=True,
                    help='comma-separated lm-eval task names')
    ap.add_argument('--batch_size', type=int, default=8)
    ap.add_argument('--limit', type=int, default=None)
    ap.add_argument('--output_path', default=None)
    args = ap.parse_args()

    from llmc_tpu.eval.harness import run_lm_eval
    from llmc_tpu.main import run_pipeline
    from llmc_tpu.utils import load_config

    res = run_pipeline(load_config(args.config))
    model, opt = res['model'], res['opt']
    qmap = opt.deploy('fake_quant') if opt is not None else None
    out = run_lm_eval(model, args.tasks.split(','), qmap=qmap,
                      batch_size=args.batch_size, limit=args.limit)
    if args.output_path:
        os.makedirs(args.output_path, exist_ok=True)
        with open(os.path.join(args.output_path, 'results.json'), 'w') as f:
            json.dump(out.get('results', out), f, indent=2, default=str)
    print(json.dumps(out.get('results', out), indent=2, default=str))


if __name__ == '__main__':
    main()
