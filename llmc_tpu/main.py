"""Pipeline driver: config -> model -> calib -> blockwise opt -> eval -> save.

Reference: /root/reference/llmc/__main__.py:28-177 (main) — same phases,
functional execution.  Entry points:

    python -m llmc_tpu --config cfg.yml
    run_pipeline(cfg_dict)
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from . import compression  # noqa: F401  (registers ALGO_REGISTRY entries)
from . import serve  # noqa: F401  (registers KV_REGISTRY entries)
from .data import CalibDataset
from .models import build_model
from .utils import (ALGO_REGISTRY, Cfg, check_config, get_modality,
                    load_config, seed_all)


def _eval_ids(config, tokenizer) -> Optional[np.ndarray]:
    ev = config.get('eval')
    if not ev:
        return None
    ev0 = ev[0] if isinstance(ev, list) else ev
    name = ev0.get('name', 'synthetic')
    if name == 'synthetic':
        rng = np.random.RandomState(ev0.get('seed', 0))
        n = ev0.get('num_tokens', 16384)
        vocab = ev0.get('vocab_size', 32000)
        return rng.randint(0, vocab, size=(n,)).astype(np.int32)
    path = ev0.get('path')
    if path and os.path.isfile(path):
        with open(path) as f:
            text = f.read()
        return np.asarray(tokenizer(text)['input_ids'], np.int32)
    import datasets
    ds = datasets.load_from_disk(path)
    text = '\n\n'.join(ds['text'])
    return np.asarray(tokenizer(text)['input_ids'], np.int32)


def _vqa_samples(model, batches, ans_len: int):
    """Build native-VQA samples: each calib batch becomes one
    (prompt, image kwargs, answer) sample whose answer is the PRETRAIN
    model's greedy continuation — eval_vqa's lmms-eval scoring reduces
    to exactly this generate-and-match mechanics (eval_vqa.py:18-302)."""
    import jax.numpy as jnp
    samples = []
    for b in batches:
        # one sample per batch row 0: slice batch-major image arrays to
        # the first row so ids and image kwargs stay batch-aligned
        # (non-batch-major kwargs like qwen2vl pixel_patches pass
        # through — those sources are bs=1)
        bs = int(np.asarray(b['input_ids']).shape[0])
        img_kwargs = {
            k: (v[:1] if bs > 1 and isinstance(v, np.ndarray)
                and v.ndim > 1 and v.shape[0] == bs else v)
            for k, v in b.items()
            if k not in ('input_ids', 'attention_mask')}
        cur = jnp.asarray(np.asarray(b['input_ids'], np.int32))[:1]
        jk = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
              for k, v in img_kwargs.items()}
        ans = []
        for _ in range(ans_len):
            logits = model.forward_logits(cur, **jk)
            nxt = int(np.asarray(jnp.argmax(logits[0, -1])))
            ans.append(nxt)
            cur = jnp.concatenate(
                [cur, jnp.asarray([[nxt]], cur.dtype)], axis=1)
        samples.append(dict({'input_ids': np.asarray(
            b['input_ids'], np.int32)[0], 'answer_ids': ans}, **img_kwargs))
    return samples


def _apply_platform_env():
    """LLMC_PLATFORM=cpu / LLMC_HOST_DEVICES=8: force the JAX platform
    IN-PROCESS.  The axon environment pre-imports jax via sitecustomize
    and scrubs JAX_PLATFORMS/XLA_FLAGS from the inherited env, so shell
    prefixes silently land on the TPU tunnel — jax.config is the only
    reliable switch (must run before first backend use)."""
    plat = os.environ.get('LLMC_PLATFORM')
    if not plat:
        return
    import jax
    n = os.environ.get('LLMC_HOST_DEVICES')
    flags = os.environ.get('XLA_FLAGS', '')
    if n and 'xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + f' --xla_force_host_platform_device_count={n}').strip()
    jax.config.update('jax_platforms', plat)


def run_pipeline(config: Dict) -> Dict:
    """Returns a result dict with eval metrics per position."""
    _apply_platform_env()
    config = Cfg(config)
    check_config(config)
    # fail fast on unknown algorithms / invalid option combos before any
    # heavy work (eval_pretrain can take minutes)
    for _, mcfg in get_modality(config):
        cls = ALGO_REGISTRY[mcfg['method']]
        check = getattr(cls, 'check_special', None)
        if check is not None:
            check(mcfg.get('special', {}) or {})
    seed_all(config.get('base', {}).get('seed', 42))
    results = {}
    t0 = time.time()
    from .utils.profiler import TIMER, trace

    with TIMER.phase('build_model'):
        model = build_model(config)
    ev = config.get('eval')
    ev0 = (ev[0] if isinstance(ev, list) else ev) if ev else None
    eval_pos = list(ev0.get('eval_pos', [])) if ev0 else []
    is_video = (config['model']['type'] in ('WanT2V', 'WanI2V')
                or (ev0 or {}).get('type') == 'video_gen')
    video_eval = None
    if ev0 and is_video:
        from .eval.video import VideoGenerateEval
        vds = CalibDataset(dict(ev0, name=ev0.get('name',
                                                  'synthetic_t2v')),
                           model.tokenizer)
        vsamples, _ = vds.get_calib_dataset()
        video_eval = VideoGenerateEval(vsamples, ev0)
        if 'pretrain' in eval_pos:
            with TIMER.phase('eval_pretrain'):
                results.update({f'video_pretrain_{k}': v for k, v in
                                video_eval.eval(model, 'pretrain').items()
                                if not isinstance(v, str)})
    is_vqa = bool(ev0) and ev0.get('type') == 'vqa'
    ppl_eval = None
    if ev0 and not is_video and not is_vqa:
        ids = _eval_ids(config, model.tokenizer)
        if ids is not None:
            from .eval.ppl import PerplexityEval
            ppl_eval = PerplexityEval(ids, seq_len=ev0.get('seq_len', 2048),
                                      bs=ev0.get('bs', 1))

    if ppl_eval and 'pretrain' in eval_pos:
        with TIMER.phase('eval_pretrain'):
            results['ppl_pretrain'] = ppl_eval.eval(model)

    # VQA eval (reference eval_vqa.py via lmms-eval; here the native
    # evaluator): answers are the PRETRAIN model's greedy continuations,
    # so pretrain accuracy is 1.0 by construction and the transformed /
    # fake_quant positions measure answer consistency under compression
    # (the VLM analog of TokenConsistencyEval).
    vqa_eval = None
    if is_vqa and not is_video:
        from .eval.vqa import VQAEval
        vds = CalibDataset(dict(ev0, name=ev0.get('name', 'synthetic_vlm')),
                           model.tokenizer)
        vbatches, _ = vds.get_calib_dataset()
        ans_len = int(ev0.get('answer_tokens', 4))
        with TIMER.phase('eval_pretrain'):
            samples = _vqa_samples(model, vbatches, ans_len)
            vqa_eval = VQAEval(samples, max_new_tokens=ans_len)
            if 'pretrain' in eval_pos:
                results['vqa_pretrain_acc'] = vqa_eval.eval(
                    model)['accuracy']

    blockwise_opt = None
    for modality, mcfg in get_modality(config):
        if hasattr(model, 'set_modality'):
            model.set_modality(modality)
        calib_cfg = config.get('calib')
        algo_cls = ALGO_REGISTRY[mcfg['method']]
        if calib_cfg and getattr(algo_cls, 'needs_calib', True):
            dataset = CalibDataset(calib_cfg, model.tokenizer)
            batches, padding_mask = dataset.get_calib_dataset()
            jb = [dict(b, **({'input_ids': jnp.asarray(b['input_ids'])}
                             if 'input_ids' in b else {}))
                  for b in batches]
            xs, kws = model.collect_first_block_input(jb)
            inputs = {'data': xs, 'kwargs': kws}
            dp = int((config.get('parallel', {}) or {}).get('dp', 1) or 1)
            if dp > 1:
                # shard the calibration batch over the dp mesh axis: every
                # statistic the engine computes (Hessians, grid losses,
                # clip/static ranges) is a jitted reduction, so GSPMD
                # inserts the cross-device psums the reference does with
                # NCCL all-reduce (gptq.py:292-295, awq.py:255-273)
                from .parallel.dp import dp_calib_mesh, shard_inputs_dict
                inputs = shard_inputs_dict(dp_calib_mesh(dp), inputs)
        else:
            inputs, padding_mask = {'data': [], 'kwargs': []}, None
        blockwise_opt = algo_cls(model, mcfg, inputs, padding_mask, config)
        with TIMER.phase(f"calib_{mcfg['method']}"), \
                trace(config.get('base', {}).get('trace_dir')):
            blockwise_opt.run_block_loop()

    if hasattr(model, 'set_modality'):
        model.set_modality('language')  # evals run on the LM stack
    if ppl_eval and 'transformed' in eval_pos:
        with TIMER.phase('eval_transformed'):
            results['ppl_transformed'] = ppl_eval.eval(model)
    if vqa_eval is not None and 'transformed' in eval_pos:
        with TIMER.phase('eval_transformed'):
            results['vqa_transformed_acc'] = vqa_eval.eval(
                model)['accuracy']
    if vqa_eval is not None and blockwise_opt is not None \
            and 'fake_quant' in eval_pos:
        with TIMER.phase('eval_fake_quant'):
            results['vqa_fake_quant_acc'] = vqa_eval.eval(
                model, qmap=blockwise_opt.deploy('fake_quant'))['accuracy']
    if blockwise_opt is not None and ppl_eval and 'fake_quant' in eval_pos:
        qmap = blockwise_opt.deploy('fake_quant')
        with TIMER.phase('eval_fake_quant'):
            results['ppl_fake_quant'] = ppl_eval.eval(model, qmap=qmap)
        if ev0.get('eval_token_consist'):
            from .eval.ppl import TokenConsistencyEval
            tc = TokenConsistencyEval(_eval_ids(config, model.tokenizer),
                                      seq_len=ev0.get('seq_len', 2048),
                                      bs=ev0.get('bs', 1))
            results['token_consistency'] = tc.eval(model, None, qmap)

    # decode-PPL through the (quantized) KV cache (eval type: decode_ppl)
    if ev0 and ev0.get('type') == 'decode_ppl' and blockwise_opt is not None:
        from .eval.ppl import DecodePerplexityEval
        ids = _eval_ids(config, model.tokenizer)
        dpe = DecodePerplexityEval(ids, seq_len=ev0.get('seq_len', 2048),
                                   num_samples=ev0.get('num_samples', 4))
        qmap = blockwise_opt.deploy('fake_quant')
        results['decode_ppl_fake_quant'] = dpe.eval(
            model, qmap=qmap, kv_policy=getattr(blockwise_opt,
                                                'kv_module', None))
        if 'fake_quant_wo_kv' in eval_pos:
            # reference eval position fake_quant_wo_kv (eval/utils.py:
            # 83-86): fake-quant weights/acts but an FP KV cache —
            # isolates the KV quantizer's contribution to decode PPL
            results['decode_ppl_fake_quant_wo_kv'] = dpe.eval(
                model, qmap=qmap, kv_policy=None)

    if video_eval is not None and blockwise_opt is not None \
            and 'fake_quant' in eval_pos:
        qmap = blockwise_opt.deploy('fake_quant')
        with TIMER.phase('eval_fake_quant'):
            res = video_eval.eval(model, 'fake_quant', qmap=qmap)
            results.update({f'video_fake_quant_{k}': v for k, v in
                            res.items() if not isinstance(v, str)})

    save = config.get('save', {})
    if save.get('save_lightx2v') and blockwise_opt is not None:
        from .export.exporter import export_lightx2v
        out = save.get('save_path', './save_lightx2v')
        export_lightx2v(model, blockwise_opt.wspec, out)
        results['saved_to'] = out
    if save.get('save_trans') or save.get('save_fake'):
        from .models.hf_loader import save_llama_params_to_hf
        out = save.get('save_path', './save')
        if save.get('save_fake') and blockwise_opt is not None:
            blockwise_opt.bake_fake_quant_weights()
        save_llama_params_to_hf(model.params, out, model.hf_config)
        results['saved_to'] = out
    backends = {'save_vllm': 'vllm', 'save_sgl': 'sgl',
                'save_lightllm': 'lightllm', 'save_autoawq': 'autoawq',
                'save_mlcllm': 'mlcllm'}
    for flag, backend in backends.items():
        if save.get(flag) and blockwise_opt is not None:
            from .export import export_real_quant
            out = save.get('save_path', './save_' + backend)
            export_real_quant(model, blockwise_opt.wspec,
                              dict(blockwise_opt.quant_config), out,
                              backend=backend)
            results['saved_to'] = out
    if save.get('save_trtllm'):
        from .export.trtllm import export_trtllm
        out = save.get('save_path', './save_trtllm')
        bits = (blockwise_opt.wspec.bit
                if blockwise_opt is not None else 4)
        export_trtllm(model, out,
                      tp_size=int(save.get('tp_size', 1)),
                      pp_size=int(save.get('pp_size', 1)),
                      quant_algo={4: 'W4A16', 8: 'W8A16'}.get(bits))
        results['saved_to'] = out
    # OpenCompass external-process eval on the saved transformed ckpt
    # (reference __main__.py:164-176 shells out the same way; gated on
    # the binary being installed)
    if 'opencompass' in config:
        oc = config['opencompass']
        if not save.get('save_trans'):
            raise ValueError('opencompass eval requires save.save_trans')
        import shutil
        import subprocess
        cmd = [shutil.which('opencompass') or 'opencompass',
               oc['cfg_path'], '-w', oc['output_path'],
               '--llmc_eval_mode', 'quant',
               '--llmc_model_path',
               os.path.abspath(save.get('save_path', './save'))]
        if shutil.which('opencompass') is None:
            raise RuntimeError(
                'opencompass is not installed; install it and re-run: '
                + ' '.join(cmd))
        results['opencompass_rc'] = subprocess.call(cmd)

    results['wall_s'] = time.time() - t0
    results['phase_times'] = TIMER.as_dict()
    results['model'] = model
    results['opt'] = blockwise_opt
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', required=True)
    ap.add_argument('--task_id', default='0')
    args = ap.parse_args()
    cfg = load_config(args.config)
    results = run_pipeline(cfg)
    for k, v in results.items():
        if isinstance(v, (int, float, str)):
            print(f'{k}: {v}')


if __name__ == '__main__':
    main()
