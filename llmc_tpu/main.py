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
    # join the jax.distributed world when launched multi-host (the
    # reference's init_process_group at entry, __main__.py:192) — no-op
    # single-process; reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    # JAX_PROCESS_ID (scripts/run_llmc.sh sets them per host)
    from .parallel.multihost import init_distributed
    init_distributed()
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
    # config-driven eval orchestration: the eval section is a LIST of
    # entries, each with its own type and eval_pos — the reference's
    # get_eval_list / eval_model (eval/utils.py:12-93)
    from .eval.orchestrate import EvalOrchestrator
    orch = EvalOrchestrator(config, model)
    with TIMER.phase('eval_pretrain'):
        # VQA answers / synthetic-acc labels derive from the pretrain
        # model — build them before calibration mutates weights
        orch.prebuild(model)
        if orch.wants('pretrain'):
            results.update(orch.run('pretrain', model))

    blockwise_opt = None
    for modality, mcfg in get_modality(config):
        if hasattr(model, 'set_modality'):
            model.set_modality(modality)
        calib_cfg = config.get('calib')
        algo_cls = ALGO_REGISTRY[mcfg['method']]
        if calib_cfg and getattr(algo_cls, 'needs_calib', True):
            import jax
            dataset = CalibDataset(calib_cfg, model.tokenizer)
            # multi-host: each process loads only its stride slice of
            # the calibration set (reference samples[RANK::WORLD],
            # base_dataset.py:170-172); shard_inputs_dict later
            # assembles the global batch across hosts
            batches, padding_mask = dataset.get_calib_dataset(
                rank=jax.process_index(),
                world_size=jax.process_count())
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
    if orch.wants('transformed'):
        # sparsification deploys BEFORE the transformed eval: the reference
        # runs deploy_all_modality('origin_float') there, which is where
        # ShortGPT removes its layers (eval/utils.py:83-84, shortgpt.py:86-93)
        from .compression.sparsification import BaseBlockwiseSparsification
        if isinstance(blockwise_opt, BaseBlockwiseSparsification):
            blockwise_opt.deploy('transformed')
        # online-rotate checkpoints still need the hadamard transform in
        # fp evals (reference keeps the rotater in OriginFloatLinear)
        tmap = (blockwise_opt.transform_qmap()
                if hasattr(blockwise_opt, 'transform_qmap') else None)
        with TIMER.phase('eval_transformed'):
            results.update(orch.run('transformed', model, qmap=tmap))
    if blockwise_opt is not None and (orch.wants('fake_quant')
                                      or orch.wants('fake_quant_wo_kv')):
        qmap = blockwise_opt.deploy('fake_quant')
        kvp = getattr(blockwise_opt, 'kv_module', None)
        if orch.wants('fake_quant'):
            with TIMER.phase('eval_fake_quant'):
                results.update(orch.run('fake_quant', model, qmap=qmap,
                                        kv_policy=kvp))
        if orch.wants('fake_quant_wo_kv'):
            # fake-quant weights/acts but an FP KV cache — isolates the
            # KV quantizer's contribution (reference eval/utils.py:83-86)
            with TIMER.phase('eval_fake_quant'):
                results.update(orch.run('fake_quant_wo_kv', model,
                                        qmap=qmap, kv_policy=None))

    save = config.get('save', {})
    if save.get('save_lightx2v') and blockwise_opt is not None:
        from .export.exporter import export_lightx2v
        out = save.get('save_path', './save_lightx2v')
        export_lightx2v(model, blockwise_opt.wspec, out)
        results['saved_to'] = out
    if save.get('save_trans') or save.get('save_fake'):
        from .models.hf_loader import save_llama_params_to_hf
        out = save.get('save_path', './save')
        # skip if a fake_quant deploy already baked the qdq (e.g. w48 +
        # eval): a second pass would recompute minmax qparams on
        # already-quantized weights and shift codes (ADVICE r4)
        if save.get('save_fake') and blockwise_opt is not None \
                and not getattr(blockwise_opt, '_baked', False):
            blockwise_opt.bake_fake_quant_weights()
            blockwise_opt._baked = True
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
