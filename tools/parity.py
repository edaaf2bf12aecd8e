"""End-to-end PPL parity: reference pipeline (torch, /root/reference) vs
llmc_tpu on the SAME checkpoint, tokenizer, calib and eval data.

This is the round-2 acceptance gate (BASELINE.md: quantized-model quality
within 0.1 PPL of the reference).  No real checkpoints are downloadable in
this environment (zero egress), so we build a tiny random-weight OPT/Llama
checkpoint + a locally-trained BPE tokenizer + on-disk calib/eval datasets,
then run BOTH pipelines end-to-end (the reference via tools/ref_pipeline.py,
which executes the reference's actual ``main()``, mirroring its own CPU
ci_check) and diff the PPLs at every eval position.

Usage:
    python tools/parity.py --workdir /tmp/parity --out PARITY.md

Methods covered (20): AWQ, GPTQ, RTN, SmoothQuant, HQQ, QuaRot, OsPlus,
LlmInt8, OmniQuant, TesseraQ, NormTweaking, SpQR, KVQuant (decode-PPL
protocol), AdaDim, QUIK, DGQ, Weight48 (bit: 48 double quantization),
and the sparsifiers Wanda, Magnitude, ShortGPT.
"""

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORDS = ('the of and to in is was he for it with as his on be at by i '
         'this had not are but from or have an they which one you were '
         'her all she there would their we him been has when who will '
         'more no if out so said what up its about into than them can '
         'only other new some could time these two may then do first '
         'any my now such like our over man me even most made after '
         'also did many before must through back years where much your '
         'way well down should because each just those people mr how '
         'too little state good very make world still own see men work '
         'long get here between both life being under never day same '
         'another know while last might us great old year off come '
         'since against go came right used take three').split()


def _text(rng, n_words):
    return ' '.join(rng.choice(WORDS) for _ in range(n_words))


def build_artifacts(workdir, arch='opt', seed=0):
    """Tiny checkpoint + tokenizer + calib/eval datasets under workdir."""
    import random

    import torch
    from datasets import Dataset
    rng = random.Random(seed)
    ckpt = os.path.join(workdir, f'{arch}_tiny')
    calib_dir = os.path.join(workdir, 'calib_pileval')
    eval_dir = os.path.join(workdir, 'eval_wikitext2')
    os.makedirs(workdir, exist_ok=True)

    if not os.path.exists(os.path.join(ckpt, 'config.json')):
        # tokenizer: tiny BPE trained locally (no egress)
        from tokenizers import Tokenizer, models, pre_tokenizers, trainers
        tok = Tokenizer(models.BPE(unk_token='<unk>'))
        tok.pre_tokenizer = pre_tokenizers.Whitespace()
        trainer = trainers.BpeTrainer(
            vocab_size=384,
            special_tokens=['<pad>', '</s>', '<unk>'])
        tok.train_from_iterator((_text(rng, 200) for _ in range(200)),
                                trainer)
        from transformers import PreTrainedTokenizerFast
        fast = PreTrainedTokenizerFast(
            tokenizer_object=tok, pad_token='<pad>', eos_token='</s>',
            bos_token='</s>', unk_token='<unk>')
        vocab = len(fast)

        torch.manual_seed(seed)
        if arch == 'opt':
            from transformers import OPTConfig, OPTForCausalLM
            cfg = OPTConfig(
                vocab_size=vocab, hidden_size=64, ffn_dim=128,
                num_hidden_layers=2, num_attention_heads=4,
                max_position_embeddings=512, word_embed_proj_dim=64,
                do_layer_norm_before=True)
            model = OPTForCausalLM(cfg)
        else:
            from transformers import LlamaConfig, LlamaForCausalLM
            cfg = LlamaConfig(
                vocab_size=vocab, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=512)
            model = LlamaForCausalLM(cfg)
        model = model.to(torch.float32).eval()
        model.save_pretrained(ckpt, safe_serialization=True)
        fast.save_pretrained(ckpt)

    if not os.path.exists(calib_dir):
        # short lines: pileval_awq keeps only lines encoding to <= seq_len
        Dataset.from_dict(
            {'text': [_text(rng, rng.randint(8, 16)) for _ in range(64)]}
        ).save_to_disk(calib_dir)
    if not os.path.exists(eval_dir):
        Dataset.from_dict(
            {'text': [_text(rng, 80) for _ in range(24)]}
        ).save_to_disk(eval_dir)
    return ckpt, calib_dir, eval_dir


def _cfg_awq(ckpt, calib_dir, eval_dir):
    return {
        'base': {'seed': 42},
        'model': {'type': 'Opt', 'path': ckpt, 'torch_dtype': 'auto'},
        'calib': {'name': 'pileval', 'download': False, 'path': calib_dir,
                  'n_samples': 8, 'bs': -1, 'seq_len': 32,
                  'preproc': 'pileval_awq', 'seed': 42},
        'eval': {'eval_pos': ['pretrain', 'transformed', 'fake_quant'],
                 'name': 'wikitext2', 'download': False, 'path': eval_dir,
                 'bs': 1, 'seq_len': 32},
        'quant': {'method': 'Awq',
                  'weight': {'bit': 4, 'symmetric': False,
                             'granularity': 'per_group', 'group_size': 32},
                  'special': {'trans': True, 'trans_version': 'v2',
                              'weight_clip': True, 'clip_sym': False}},
    }


def _cfg_gptq(ckpt, calib_dir, eval_dir):
    return {
        'base': {'seed': 0},
        'model': {'type': 'Opt', 'path': ckpt, 'torch_dtype': 'auto'},
        'calib': {'name': 'wikitext2', 'download': False, 'path': eval_dir,
                  'n_samples': 4, 'bs': 1, 'seq_len': 32,
                  'preproc': 'wikitext2_gptq', 'seed': 0},
        'eval': {'eval_pos': ['pretrain', 'fake_quant'],
                 'name': 'wikitext2', 'download': False, 'path': eval_dir,
                 'bs': 1, 'seq_len': 32},
        'quant': {'method': 'GPTQ',
                  'weight': {'bit': 4, 'symmetric': False,
                             'granularity': 'per_group', 'group_size': 32},
                  'special': {'actorder': True, 'static_groups': False,
                              'percdamp': 0.01, 'blocksize': 32,
                              'true_sequential': True},
                  'quant_out': True},
    }


def _cfg_rtn(ckpt, calib_dir, eval_dir):
    return {
        'base': {'seed': 42},
        'model': {'type': 'Opt', 'path': ckpt, 'torch_dtype': 'auto'},
        'calib': {'name': 'pileval', 'download': False, 'path': calib_dir,
                  'n_samples': 4, 'bs': -1, 'seq_len': 32,
                  'preproc': 'pileval_awq', 'seed': 42},
        'eval': {'eval_pos': ['pretrain', 'fake_quant'],
                 'name': 'wikitext2', 'download': False, 'path': eval_dir,
                 'bs': 1, 'seq_len': 32},
        'quant': {'method': 'RTN',
                  'weight': {'bit': 4, 'symmetric': True,
                             'granularity': 'per_group', 'group_size': 32}},
    }


def _cfg_smoothquant(ckpt, calib_dir, eval_dir):
    return {
        'base': {'seed': 42},
        'model': {'type': 'Opt', 'path': ckpt, 'torch_dtype': 'auto'},
        'calib': {'name': 'pileval', 'download': False, 'path': calib_dir,
                  'n_samples': 8, 'bs': 1, 'seq_len': 32,
                  'preproc': 'pileval_smooth', 'seed': 42},
        'eval': {'eval_pos': ['pretrain', 'transformed', 'fake_quant'],
                 'name': 'wikitext2', 'download': False, 'path': eval_dir,
                 'bs': 1, 'seq_len': 32},
        'quant': {'method': 'SmoothQuant',
                  'weight': {'bit': 8, 'symmetric': True,
                             'granularity': 'per_channel'},
                  'act': {'bit': 8, 'symmetric': True,
                          'granularity': 'per_token'},
                  'special': {'alpha': 0.5}},
    }


def _cfg_hqq(ckpt, calib_dir, eval_dir):
    return {
        'base': {'seed': 42},
        'model': {'type': 'Opt', 'path': ckpt, 'torch_dtype': 'auto'},
        'calib': {'name': 'pileval', 'download': False, 'path': calib_dir,
                  'n_samples': 4, 'bs': -1, 'seq_len': 32,
                  'preproc': 'pileval_awq', 'seed': 42},
        'eval': {'eval_pos': ['pretrain', 'fake_quant'],
                 'name': 'wikitext2', 'download': False, 'path': eval_dir,
                 'bs': 1, 'seq_len': 32},
        'quant': {'method': 'HQQ',
                  'weight': {'bit': 4, 'symmetric': False,
                             'granularity': 'per_group',
                             'group_size': 32, 'round_zp': False},
                  'special': {'lp_norm': 0.7, 'beta': 10.0,
                              'kappa': 1.01, 'iters': 20, 'axis': 1}},
    }


def _cfg_quarot(ckpt, calib_dir, eval_dir):
    return {
        'base': {'seed': 42},
        'model': {'type': 'Llama', 'path': ckpt,
                  'torch_dtype': 'torch.float32'},
        'eval': {'eval_pos': ['pretrain', 'transformed', 'fake_quant'],
                 'name': 'wikitext2', 'download': False, 'path': eval_dir,
                 'bs': 1, 'seq_len': 32},
        'quant': {'method': 'Quarot',
                  'weight': {'bit': 4, 'symmetric': False,
                             'granularity': 'per_channel'},
                  'special': {'rotate_mode': 'hadamard',
                              'online_rotate': False,
                              'fp32_had': True}},
    }


_cfg_quarot.arch = 'llama'


def _cfg_osplus(ckpt, calib_dir, eval_dir):
    return {
        'base': {'seed': 42},
        'model': {'type': 'Llama', 'path': ckpt,
                  'torch_dtype': 'torch.float32'},
        'calib': {'name': 'pileval', 'download': False, 'path': calib_dir,
                  'n_samples': 8, 'bs': 1, 'seq_len': 32,
                  'preproc': 'pileval_smooth', 'seed': 42},
        'eval': {'eval_pos': ['pretrain', 'transformed', 'fake_quant'],
                 'name': 'wikitext2', 'download': False, 'path': eval_dir,
                 'bs': 1, 'seq_len': 32},
        'quant': {'method': 'OsPlus',
                  'weight': {'bit': 8, 'symmetric': True,
                             'granularity': 'per_channel'},
                  'act': {'bit': 8, 'symmetric': True,
                          'granularity': 'per_token'},
                  'special': {'true_sequential': True}},
    }


_cfg_osplus.arch = 'llama'

def _cfg_llmint8(ckpt, calib_dir, eval_dir):
    # On Llama (not OPT): the reference's get_outlier_indices
    # (llmint8.py:25-33) assumes 3-D acts — HF OPT flattens MLP inputs
    # to [B*S, C], which IndexErrors its torch.where(...)[1].  Llama
    # keeps every linear input 3-D, so both pipelines run unmodified.
    return {
        'base': {'seed': 42},
        'model': {'type': 'Llama', 'path': ckpt,
                  'torch_dtype': 'torch.float32'},
        'calib': {'name': 'pileval', 'download': False, 'path': calib_dir,
                  'n_samples': 4, 'bs': 1, 'seq_len': 32,
                  'preproc': 'pileval_awq', 'seed': 42},
        'eval': {'eval_pos': ['pretrain', 'fake_quant'],
                 'name': 'wikitext2', 'download': False, 'path': eval_dir,
                 'bs': 1, 'seq_len': 32},
        'quant': {'method': 'LlmInt8',
                  'weight': {'bit': 8, 'symmetric': True,
                             'granularity': 'per_channel'},
                  'act': {'bit': 8, 'symmetric': True,
                          'granularity': 'per_token'},
                  'special': {'threshold': 6.0}},
    }


_cfg_llmint8.arch = 'llama'


def _cfg_omniq(ckpt, calib_dir, eval_dir):
    # OmniQuant LWC (learnable clip), ref hyperparams scaled to the tiny
    # model (configs/quantization/methods/OmniQuant/omniq_w_only.yml).
    # eval_pos omits 'transformed': the reference's origin_float deploy
    # drops the plain dynamic_quant_weight attr OmniQuant's w_qdq needs
    # (module_utils.py:405-411 copies only buf_* buffers; omniq.py:683
    # then AttributeErrors on the fake_quant re-deploy) — upstream
    # crashes with its own shipped eval_pos list.
    return {
        'base': {'seed': 2},
        'model': {'type': 'Opt', 'path': ckpt, 'torch_dtype': 'auto'},
        'calib': {'name': 'wikitext2', 'download': False, 'path': eval_dir,
                  'n_samples': 4, 'bs': 1, 'seq_len': 32,
                  'preproc': 'wikitext2_gptq', 'seed': 2},
        'eval': {'eval_pos': ['pretrain', 'fake_quant'],
                 'name': 'wikitext2', 'download': False, 'path': eval_dir,
                 'bs': 1, 'seq_len': 32},
        'quant': {'method': 'OmniQuant',
                  'weight': {'bit': 4, 'symmetric': False,
                             'granularity': 'per_group', 'group_size': 32,
                             'calib_algo': 'learnable', 'ste': True},
                  'special': {'aug_loss': False, 'lwc': True, 'let': False,
                              'lwc_lr': 0.01, 'let_lr': 0.005,
                              'use_shift': False, 'alpha': 0.5,
                              'deactive_amp': True, 'epochs': 5, 'wd': 0},
                  'quant_out': True},
    }


_cfg_omniq.positions = ('pretrain', 'fake_quant')


def _cfg_tesseraq(ckpt, calib_dir, eval_dir):
    # TesseraQ progressive adaptive rounding
    # (configs/quantization/methods/Tesseraq/tesseraq_w_only.yml)
    return {
        'base': {'seed': 42},
        'model': {'type': 'Opt', 'path': ckpt, 'torch_dtype': 'auto'},
        'calib': {'name': 'wikitext2', 'download': False, 'path': eval_dir,
                  'n_samples': 4, 'bs': 1, 'seq_len': 32,
                  'preproc': 'wikitext2_gptq', 'seed': 42},
        'eval': {'eval_pos': ['pretrain', 'fake_quant'],
                 'name': 'wikitext2', 'download': False, 'path': eval_dir,
                 'bs': 1, 'seq_len': 32},
        'quant': {'method': 'TesseraQ',
                  'weight': {'bit': 4, 'symmetric': False,
                             'granularity': 'per_group', 'group_size': 32,
                             'calib_algo': 'learnable', 'ste': True},
                  'special': {'lr': 0.0005, 'iterations': 30, 'wd': 0.0,
                              'batch_size': 2, 'deactive_amp': True,
                              'aug_loss': False, 'optimize_scale': False,
                              'thresholds': [0.75, 0.5, 0.25, 0.09, 0.02],
                              'weight_clip': False,
                              'load_transform': False,
                              'reduce_memory': False},
                  'quant_out': True},
    }


def _cfg_ntweak(ckpt, calib_dir, eval_dir):
    # NormTweaking trains LN params per block
    # (configs/quantization/methods/NormTweaking/ntweak_w_only.yml)
    return {
        'base': {'seed': 42},
        'model': {'type': 'Opt', 'path': ckpt, 'torch_dtype': 'auto'},
        # txt_general_preproc keeps only lines >= seq_len tokens; the
        # calib set's short lines would all be skipped -> use eval lines
        'calib': {'name': 'pileval', 'download': False, 'path': eval_dir,
                  'n_samples': 4, 'bs': 1, 'seq_len': 32,
                  'preproc': 'txt_general_preproc', 'seed': 42},
        'eval': {'eval_pos': ['pretrain', 'fake_quant'],
                 'name': 'wikitext2', 'download': False, 'path': eval_dir,
                 'bs': 1, 'seq_len': 32},
        'quant': {'method': 'NormTweaking',
                  'weight': {'bit': 4, 'symmetric': False,
                             'granularity': 'per_group',
                             'group_size': 32},
                  'special': {'ntweak_lr': 0.0001, 'deactive_amp': True,
                              'epochs': 10, 'gamma': 0.001},
                  'quant_out': True},
    }


def _cfg_spqr(ckpt, calib_dir, eval_dir):
    # SpQR exact leave-one-out outliers + double-quantized qparams
    # (configs/quantization/methods/SpQR/spqr_w_only.yml)
    return {
        'base': {'seed': 0},
        'model': {'type': 'Opt', 'path': ckpt, 'torch_dtype': 'auto'},
        'calib': {'name': 'wikitext2', 'download': False, 'path': eval_dir,
                  'n_samples': 4, 'bs': 1, 'seq_len': 32,
                  'preproc': 'wikitext2_gptq', 'seed': 0},
        'eval': {'eval_pos': ['pretrain', 'fake_quant'],
                 'name': 'wikitext2', 'download': False, 'path': eval_dir,
                 'bs': 1, 'seq_len': 32},
        'quant': {'method': 'SpQR',
                  'weight': {'bit': 4, 'symmetric': False,
                             'granularity': 'per_group', 'group_size': 16,
                             'round_zp': False},
                  'special': {'actorder': True, 'percdamp': 1,
                              'blocksize': 32, 'true_sequential': True,
                              'relative_threshold': 0.2,
                              'simplified_outliers': False,
                              'scale': {'bit': 3, 'symmetric': False,
                                        'granularity': 'per_group',
                                        'group_size': 16,
                                        'round_zp': False},
                              'zero': {'bit': 3, 'symmetric': False,
                                       'granularity': 'per_group',
                                       'group_size': 16,
                                       'round_zp': False}},
                  'quant_out': True},
    }


def _cfg_kv_decode(ckpt, calib_dir, eval_dir):
    # RTN W8A8 + Naive int8 KV cache, decode-PPL eval — exercises the
    # quantized-KV decode path vs the reference DecodePerplexityEval
    # (configs/quantization/methods/KVQuant/rtn_w_a_naive_quant_kv.yml)
    # Llama, not OPT: the reference Opt wrapper has no get_attn_in_block,
    # so its KV-cache registration path only supports the Llama tier
    return {
        'base': {'seed': 42},
        'model': {'type': 'Llama', 'path': ckpt,
                  'torch_dtype': 'torch.float32'},
        'eval': {'eval_pos': ['transformed', 'fake_quant',
                              'fake_quant_wo_kv'],
                 'name': 'wikitext2', 'type': 'decode_ppl',
                 'download': False, 'path': eval_dir,
                 'bs': 1, 'seq_len': 32, 'num_samples': 4},
        'quant': {'method': 'RTN',
                  'weight': {'bit': 8, 'symmetric': True,
                             'granularity': 'per_channel',
                             'group_size': -1},
                  'act': {'bit': 8, 'symmetric': True,
                          'granularity': 'per_token'},
                  'kvcache': {'method': 'Naive', 'bit': 8,
                              'symmetric': True,
                              'granularity': 'per_token'}},
    }


_cfg_kv_decode.arch = 'llama'
_cfg_kv_decode.etype = 'decode_ppl'
_cfg_kv_decode.positions = ('transformed', 'fake_quant',
                            'fake_quant_wo_kv')


def _cfg_wanda(ckpt, calib_dir, eval_dir):
    # Wanda pruning (configs/sparsification/methods/Wanda/wanda.yml)
    return {
        'base': {'seed': 42},
        'model': {'type': 'Llama', 'path': ckpt,
                  'torch_dtype': 'torch.float32'},
        # see NormTweaking note: txt_general_preproc needs long lines
        'calib': {'name': 'pileval', 'download': False, 'path': eval_dir,
                  'n_samples': 8, 'bs': -1, 'seq_len': 32,
                  'preproc': 'txt_general_preproc', 'seed': 42},
        'eval': {'eval_pos': ['pretrain', 'transformed'],
                 'name': 'wikitext2', 'download': False, 'path': eval_dir,
                 'bs': 1, 'seq_len': 32},
        'sparse': {'method': 'Wanda',
                   'weight': {'sparsity': 0.5},
                   'sparsity_out': False},
    }


_cfg_wanda.arch = 'llama'
_cfg_wanda.positions = ('pretrain', 'transformed')


def _cfg_adadim(ckpt, calib_dir, eval_dir):
    # per-layer oc/ic dim search (configs/quantization/methods/AdaDim/
    # adadim_w_a.yml: W8A8 per_channel/per_token)
    return {
        'base': {'seed': 0},
        'model': {'type': 'Opt', 'path': ckpt, 'torch_dtype': 'auto'},
        'calib': {'name': 'wikitext2', 'download': False, 'path': eval_dir,
                  'n_samples': 4, 'bs': 1, 'seq_len': 32,
                  'preproc': 'wikitext2_gptq', 'seed': 0},
        'eval': {'eval_pos': ['pretrain', 'fake_quant'],
                 'name': 'wikitext2', 'download': False, 'path': eval_dir,
                 'bs': 1, 'seq_len': 32},
        'quant': {'method': 'AdaDim',
                  'weight': {'bit': 8, 'symmetric': True,
                             'granularity': 'per_channel',
                             'group_size': -1},
                  'act': {'bit': 8, 'symmetric': True,
                          'granularity': 'per_token'},
                  'quant_out': True},
    }


def _cfg_quik(ckpt, calib_dir, eval_dir):
    # mixed int/fp columns by activation absmax (configs/quantization/
    # methods/QUIK/quik.yml; fp_features scaled to the 64-d tiny model).
    # Llama, not OPT: the reference's QUIK a_qdq indexes act[:, :, ids]
    # (quik.py:145-150) and OPT's MLP runs on 2-D flattened activations.
    return {
        'base': {'seed': 0},
        'model': {'type': 'Llama', 'path': ckpt,
                  'torch_dtype': 'torch.float32'},
        'calib': {'name': 'wikitext2', 'download': False, 'path': eval_dir,
                  'n_samples': 4, 'bs': 1, 'seq_len': 32,
                  'preproc': 'wikitext2_gptq', 'seed': 0},
        'eval': {'eval_pos': ['pretrain', 'transformed', 'fake_quant'],
                 'name': 'wikitext2', 'download': False, 'path': eval_dir,
                 'bs': 1, 'seq_len': 32},
        'quant': {'method': 'QUIK',
                  'weight': {'bit': 8, 'symmetric': True,
                             'granularity': 'per_channel',
                             'group_size': -1},
                  'act': {'bit': 8, 'symmetric': True,
                          'granularity': 'per_token'},
                  'special': {'fp_relative': False, 'fp_features': 8,
                              'fp_threshold': 0.0, 'last_fc_bit': 8}},
    }


_cfg_quik.arch = 'llama'


def _cfg_dgq(ckpt, calib_dir, eval_dir):
    # dual-grain W4(A8): int4 per-group scales re-quantized by int8
    # per-channel super-scales (configs/quantization/methods/DGQ/
    # dgq_w_a.yml)
    return {
        'base': {'seed': 0},
        'model': {'type': 'Opt', 'path': ckpt, 'torch_dtype': 'auto'},
        'calib': {'name': 'wikitext2', 'download': False, 'path': eval_dir,
                  'n_samples': 1, 'bs': 1, 'seq_len': 32,
                  'preproc': 'wikitext2_gptq', 'seed': 0},
        'eval': {'eval_pos': ['pretrain', 'fake_quant'],
                 'name': 'wikitext2', 'download': False, 'path': eval_dir,
                 'bs': 1, 'seq_len': 32},
        'quant': {'method': 'DGQ',
                  'weight': {'w_1': {'bit': 4, 'symmetric': False,
                                     'granularity': 'per_group',
                                     'group_size': 16},
                             'w_2': {'bit': 8, 'symmetric': True,
                                     'granularity': 'per_channel'}},
                  'act': {'bit': 8, 'symmetric': True,
                          'granularity': 'per_token'}},
    }


def _cfg_w48(ckpt, calib_dir, eval_dir):
    # Weight48 double quantization: int8 per-channel then the int8 codes
    # to int4 per-group, with scale/zero bit budgets and an int_range
    # clamp (configs/quantization/methods/RTN/rtn_w_a_wint4aint8.yml)
    return {
        'base': {'seed': 42},
        'model': {'type': 'Opt', 'path': ckpt, 'torch_dtype': 'auto'},
        'eval': {'eval_pos': ['pretrain', 'fake_quant'],
                 'name': 'wikitext2', 'download': False, 'path': eval_dir,
                 'bs': 1, 'seq_len': 32},
        'quant': {'method': 'RTN',
                  # top-level granularity: needed by the reference's act
                  # branch (base_blockwise_quantization.py:165) and
                  # dropped from its W48 ctor by ref_pipeline's adapter
                  'weight': {'bit': 48, 'granularity': 'per_channel',
                             'bit4': {'symmetric': False,
                                      'granularity': 'per_group',
                                      'group_size': 16,
                                      'scales_bit': 8,
                                      'scales_symmetric': True,
                                      'zeros_bit': 8,
                                      'zeros_symmetric': True},
                             'bit8': {'symmetric': True,
                                      'granularity': 'per_channel',
                                      'int_range': [-120, 120]}},
                  'act': {'bit': 8, 'symmetric': True,
                          'granularity': 'per_token'}},
    }


def _cfg_magnitude(ckpt, calib_dir, eval_dir):
    # magnitude pruning (configs/sparsification/methods/Magnitude/
    # magnitude.yml)
    return {
        'base': {'seed': 42},
        'model': {'type': 'Llama', 'path': ckpt,
                  'torch_dtype': 'torch.float32'},
        'calib': {'name': 'pileval', 'download': False, 'path': eval_dir,
                  'n_samples': 8, 'bs': -1, 'seq_len': 32,
                  'preproc': 'txt_general_preproc', 'seed': 42},
        'eval': {'eval_pos': ['pretrain', 'transformed'],
                 'name': 'wikitext2', 'download': False, 'path': eval_dir,
                 'bs': 1, 'seq_len': 32},
        'sparse': {'method': 'Magnitude',
                   'weight': {'sparsity': 0.5},
                   'sparsity_out': False},
    }


_cfg_magnitude.arch = 'llama'
_cfg_magnitude.positions = ('pretrain', 'transformed')


def _cfg_shortgpt(ckpt, calib_dir, eval_dir):
    # Block-Influence layer removal (configs/sparsification/methods/
    # ShortGPT/shortgpt.yml; n_prune_layers scaled to the 2-layer tiny
    # model)
    return {
        'base': {'seed': 42},
        'model': {'type': 'Llama', 'path': ckpt,
                  'torch_dtype': 'torch.float32'},
        'calib': {'name': 'pileval', 'download': False, 'path': eval_dir,
                  'n_samples': 8, 'bs': -1, 'seq_len': 32,
                  'preproc': 'txt_general_preproc', 'seed': 42},
        'eval': {'eval_pos': ['pretrain', 'transformed'],
                 'name': 'wikitext2', 'download': False, 'path': eval_dir,
                 'bs': 1, 'seq_len': 32},
        'sparse': {'method': 'ShortGPT',
                   'weight': {'n_prune_layers': 1}},
    }


_cfg_shortgpt.arch = 'llama'
_cfg_shortgpt.positions = ('pretrain', 'transformed')


CONFIGS = {'AWQ-W4A16': _cfg_awq, 'GPTQ-W4A16': _cfg_gptq,
           'RTN-W4A16': _cfg_rtn, 'SmoothQuant-W8A8': _cfg_smoothquant,
           'HQQ-W4A16': _cfg_hqq, 'QuaRot-W4': _cfg_quarot,
           'OsPlus-W8A8': _cfg_osplus, 'LlmInt8-W8A8': _cfg_llmint8,
           'OmniQuant-W4A16': _cfg_omniq, 'TesseraQ-W4A16': _cfg_tesseraq,
           'NormTweaking-W4A16': _cfg_ntweak, 'SpQR-W4A16': _cfg_spqr,
           'KVQuant-decodePPL': _cfg_kv_decode, 'Wanda-50': _cfg_wanda,
           'AdaDim-W8A8': _cfg_adadim, 'QUIK-W8A8': _cfg_quik,
           'DGQ-W4A8': _cfg_dgq, 'RTN-W48A8': _cfg_w48,
           'Magnitude-50': _cfg_magnitude, 'ShortGPT-prune1': _cfg_shortgpt}


def run_reference(cfg_path, out_path):
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools/ref_pipeline.py'),
         '--config', cfg_path, '--out', out_path],
        capture_output=True, text=True, env=env, timeout=1800)
    if r.returncode != 0:
        raise RuntimeError(f'reference pipeline failed:\n{r.stdout[-3000:]}'
                           f'\n{r.stderr[-3000:]}')
    with open(out_path) as f:
        return json.load(f)


def run_ours(cfg_path):
    env = dict(os.environ,
               LLMC_PLATFORM='cpu', LLMC_HOST_DEVICES='1')
    r = subprocess.run(
        [sys.executable, '-m', 'llmc_tpu', '--config', cfg_path],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1800)
    if r.returncode != 0:
        raise RuntimeError(f'llmc_tpu pipeline failed:\n{r.stdout[-3000:]}'
                           f'\n{r.stderr[-3000:]}')
    out = {}
    for line in r.stdout.splitlines():
        m = re.match(r'((?:decode_)?ppl_\w+): ([0-9.eE+-]+)',
                     line.strip())
        if m:
            out[m.group(1)] = float(m.group(2))
    return out


def run_parity(workdir, methods=None):
    import yaml
    ckpt, calib_dir, eval_dir = build_artifacts(workdir)
    ckpt_llama = None
    rows = []
    for name, mk in CONFIGS.items():
        if methods and name not in methods:
            continue
        if getattr(mk, 'arch', 'opt') == 'llama':
            if ckpt_llama is None:
                ckpt_llama, _, _ = build_artifacts(
                    os.path.join(workdir, 'llama'), arch='llama')
            cfg = mk(ckpt_llama, calib_dir, eval_dir)
        else:
            cfg = mk(ckpt, calib_dir, eval_dir)
        cfg_path = os.path.join(workdir, f'{name}.yml')
        with open(cfg_path, 'w') as f:
            yaml.safe_dump(cfg, f)
        try:
            ref = run_reference(cfg_path,
                                os.path.join(workdir, f'{name}_ref.json'))
            ours = run_ours(cfg_path)
        except Exception as exc:           # keep going; record the break
            print(f'PARITY ERROR [{name}]: {exc}', file=sys.stderr)
            rows.append((name, 'ERROR', float('nan'), float('nan'),
                         float('inf')))
            continue
        etype = getattr(mk, 'etype', 'ppl')
        positions = getattr(mk, 'positions',
                            ('pretrain', 'transformed', 'fake_quant'))
        for pos in positions:
            rk = ref.get(pos, {}).get(f'{etype} wikitext2')
            ok = ours.get(f'{etype}_{pos}')
            if rk is not None and ok is not None:
                rows.append((name, pos, rk, ok, abs(rk - ok)))
            elif rk is not None or ok is not None:
                rows.append((name, pos,
                             float('nan') if rk is None else rk,
                             float('nan') if ok is None else ok,
                             float('inf')))
        for r in rows:
            if r[0] == name:
                print('ROW', r, flush=True)
    return rows


def write_md(rows, path):
    with open(path, 'w') as f:
        f.write(
            '# PARITY — end-to-end PPL vs the reference pipeline\n\n'
            'Both pipelines (the reference `/root/reference` llmc, run via\n'
            'its own `main()` on CPU exactly as its ci_check does, and\n'
            '`llmc_tpu`) consume the SAME tiny random-weight OPT\n'
            'checkpoint, the same locally-trained BPE tokenizer, and the\n'
            'same on-disk calib/eval datasets (`tools/parity.py`).\n'
            'Acceptance gate (BASELINE.md): |ΔPPL| ≤ 0.1.\n\n'
            '| method | eval_pos | reference PPL | llmc_tpu PPL | |Δ| |\n'
            '|---|---|---|---|---|\n')
        for name, pos, rk, ok, d in rows:
            f.write(f'| {name} | {pos} | {rk:.4f} | {ok:.4f} '
                    f'| {d:.4f} |\n')
        worst = max((d for *_, d in rows), default=float('nan'))
        f.write(f'\nWorst |ΔPPL| = **{worst:.4f}** '
                f'({"PASS" if worst <= 0.1 else "FAIL"} vs the 0.1 gate).\n'
                '\nRegenerate: `python tools/parity.py --workdir '
                '/tmp/parity --out PARITY.md`\n')


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--workdir', default='/tmp/parity')
    ap.add_argument('--out', default=os.path.join(REPO, 'PARITY.md'))
    ap.add_argument('--methods', nargs='*', default=None)
    a = ap.parse_args()
    rows = run_parity(a.workdir, a.methods)
    write_md(rows, a.out)
    for r in rows:
        print(r)
