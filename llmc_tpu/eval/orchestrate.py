"""Config-driven eval orchestration: eval LISTS + per-type dispatch.

Reference: /root/reference/llmc/eval/utils.py:12-93 — ``get_eval_list``
builds one evaluator per entry of the config's ``eval`` list (each entry
carries its own ``eval_pos``/``type``), and ``eval_model`` runs every
evaluator whose positions include the current one, re-deploying modules
between positions.  Re-deploying here is passing a different QMap.

Types dispatched (reference eval/utils.py:21-46):
  ppl (default)      PerplexityEval; ``inference_per_block: True`` routes
                     through the block-offload streaming path
                     (reference eval_base.py:44,173-194)
  decode_ppl         DecodePerplexityEval through the (quantized) KV cache
  acc                ImageNet top-1 for ViT (reference eval_acc.py:10-61);
                     labels from an .npz/.npy pair on disk, or —
                     env-appropriate proxy — the PRETRAIN model's own
                     predictions (consistency under compression)
  code               HumanEval completions (+ pass@k when the package
                     exists) (reference eval_code.py:13-149)
  custom_gen         free-form generation dumps (eval_custom_generate.py)
  latency            TTFT / decode tokens/s statistics (eval_vqa.py:32-56)
  vqa / img_txt      VQA answer consistency (eval_vqa.py:18-302)
  video_gen          Wan T2V/I2V generation (eval_video_generate.py)
  token consistency  ``eval_token_consist: True`` on a ppl entry
                     (eval_token_consist.py:9-72)
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np


def get_eval_list(config) -> List[Dict]:
    """Normalize the config's ``eval`` section to a list of entries."""
    ev = config.get('eval')
    if not ev:
        return []
    return [dict(e) for e in (ev if isinstance(ev, list) else [ev])]


def load_eval_ids(ev: Dict, tokenizer) -> Optional[np.ndarray]:
    """Token ids for a text eval entry (wikitext2-on-disk / raw file /
    synthetic)."""
    name = ev.get('name', 'synthetic')
    if name == 'synthetic':
        rng = np.random.RandomState(ev.get('seed', 0))
        n = ev.get('num_tokens', 16384)
        vocab = ev.get('vocab_size', 32000)
        return rng.randint(0, vocab, size=(n,)).astype(np.int32)
    path = ev.get('path')
    if path and os.path.isfile(path):
        with open(path) as f:
            text = f.read()
        return np.asarray(tokenizer(text)['input_ids'], np.int32)
    import datasets
    ds = datasets.load_from_disk(path)
    text = '\n\n'.join(ds['text'])
    return np.asarray(tokenizer(text)['input_ids'], np.int32)


def load_eval_texts(ev: Dict):
    """Raw text list for the per-text decode-PPL protocol
    (reference eval_base.py:78-80: ``testenc = testdata['text']``).
    Returns None for synthetic data (no raw texts exist)."""
    if ev.get('name', 'synthetic') == 'synthetic':
        return None
    path = ev.get('path')
    if path and os.path.isfile(path):
        with open(path) as f:
            return f.read().splitlines(keepends=True)
    import datasets
    return datasets.load_from_disk(path)['text']


def _vqa_samples(model, batches, ans_len: int):
    """Native-VQA samples: each calib batch becomes one (prompt, image
    kwargs, answer) whose answer is the PRETRAIN model's greedy
    continuation — lmms-eval's generate-and-match mechanics
    (reference eval_vqa.py:18-302) reduced to what runs with no network."""
    samples = []
    for b in batches:
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


class OffloadPPL:
    """PPL through the block-offload streaming path — the reference's
    ``inference_per_block: True`` (eval_base.py:44,173-194: per-block
    cuda/cpu hooks so 70B+ evals fit one device)."""

    def __init__(self, test_ids: np.ndarray, seq_len: int = 2048,
                 bs: int = 8):
        ids = np.asarray(test_ids).reshape(-1)
        n = ids.shape[0] // seq_len
        self.chunks = ids[:n * seq_len].reshape(n, seq_len)
        self.bs = bs

    def eval(self, model, qmap=None) -> float:
        from ..utils.offload import streaming_ppl
        return streaming_ppl(model, self.chunks, qmap=qmap, bs=self.bs)


class _Entry:
    def __init__(self, ev: Dict, key: str):
        self.ev = ev
        self.key = key                    # result-key base
        self.positions = list(ev.get('eval_pos', []))
        self.evaluator = None             # built lazily


class EvalOrchestrator:
    """Builds one evaluator per config eval entry and runs every entry
    whose ``eval_pos`` includes the requested position.

    Result keys preserve the historical single-eval names (``ppl_{pos}``,
    ``vqa_{pos}_acc``, ``decode_ppl_fake_quant`` ...); when a list holds
    several entries of the same type the later ones are disambiguated
    with the entry's ``name``/index.
    """

    def __init__(self, config, model):
        self.config = config
        self.model = model
        self.entries: List[_Entry] = []
        seen: Dict[str, int] = {}
        for i, ev in enumerate(get_eval_list(config)):
            etype = self._etype(ev, config)
            n = seen.get(etype, 0)
            seen[etype] = n + 1
            key = etype if n == 0 else \
                f"{etype}_{ev.get('name', i)}"
            self.entries.append(_Entry(dict(ev, _etype=etype), key))

    # -- type inference ------------------------------------------------
    @staticmethod
    def _etype(ev: Dict, config) -> str:
        t = ev.get('type')
        if t in ('img_txt', 'vqa'):
            return 'vqa'
        if t == 'video_gen' or config['model']['type'] in ('WanT2V',
                                                           'WanI2V'):
            return 'video'
        if t in ('decode_ppl', 'acc', 'code', 'custom_gen', 'latency'):
            return t
        if t in (None, 'ppl'):
            # the reference keys ImageNet accuracy off the ViT model type
            # (eval_acc is the only evaluator Vit configs use)
            if ev.get('name') == 'imagenet' or \
                    config['model']['type'] == 'Vit':
                return 'acc'
            return 'ppl'
        raise ValueError(f'unknown eval type {t!r}')

    # -- public --------------------------------------------------------
    def positions(self) -> List[str]:
        out = []
        for e in self.entries:
            out.extend(e.positions)
        return sorted(set(out))

    def wants(self, position: str) -> bool:
        for e in self.entries:
            if position in e.positions:
                return True
            # a decode_ppl entry with no explicit eval_pos runs at
            # fake_quant (historical single-eval behavior)
            if e.ev['_etype'] == 'decode_ppl' and not e.positions \
                    and position == 'fake_quant':
                return True
        return False

    def prebuild(self, model) -> None:
        """Force-build evaluators whose ground truth derives from the
        PRETRAIN model (VQA answers, synthetic-acc labels) — must run
        before calibration mutates the weights, even when 'pretrain' is
        not an eval position."""
        for e in self.entries:
            if e.evaluator is None and e.ev['_etype'] == 'vqa':
                self._vqa_build(e, model)
            if e.evaluator is None and e.ev['_etype'] == 'acc':
                self._acc_build(e, model)

    def has_type(self, etype: str) -> bool:
        return any(e.ev['_etype'] == etype for e in self.entries)

    def run(self, position: str, model, qmap=None, kv_policy=None
            ) -> Dict:
        """Run every eval entry active at ``position``.  qmap=None means
        the pretrain/transformed (origin-float) deploy; a QMap is the
        fake-quant deploy (the reference's deploy-per-position,
        eval/utils.py:83-86)."""
        results: Dict = {}
        for e in self.entries:
            ev = e.ev
            etype = ev['_etype']
            # decode_ppl honors fake_quant_wo_kv (FP KV cache) in
            # addition to fake_quant (reference eval/utils.py:83-86)
            pos_list = e.positions
            if position not in pos_list:
                # historical behavior: a decode_ppl entry with no
                # explicit positions still runs at fake_quant
                if not (etype == 'decode_ppl' and not pos_list
                        and position == 'fake_quant'):
                    continue
            if etype == 'ppl':
                results[f'{e.key}_{position}'] = self._ppl(e, model, qmap)
                if position == 'fake_quant' and qmap is not None \
                        and ev.get('eval_token_consist'):
                    results['token_consistency'] = self._token_consist(
                        e, model, qmap)
            elif etype == 'decode_ppl':
                # runs at EVERY configured position like the reference
                # (pretrain/transformed = FP decode PPL); the quantized
                # KV policy applies only at fake_quant — the wo_kv
                # position isolates the KV quantizer (eval/utils.py:83-86)
                kv = kv_policy if position == 'fake_quant' else None
                results[f'{e.key}_{position}'] = self._decode_ppl(
                    e, model, qmap, kv)
            elif etype == 'acc':
                results[f'acc_{position}' if e.key == 'acc'
                        else f'{e.key}_{position}'] = self._acc(
                    e, model, qmap)
            elif etype == 'code':
                results[f'{e.key}_{position}'] = self._code(e, model,
                                                            qmap)
            elif etype == 'custom_gen':
                results[f'{e.key}_{position}'] = self._custom_gen(
                    e, model, qmap)
            elif etype == 'latency':
                results[f'{e.key}_{position}'] = self._latency(
                    e, model, qmap, kv_policy)
            elif etype == 'vqa':
                results[f'vqa_{position}_acc'] = self._vqa(e, model,
                                                           qmap)
            elif etype == 'video':
                res = self._video(e, model, position, qmap)
                results.update({f'video_{position}_{k}': v
                                for k, v in res.items()
                                if not isinstance(v, str)})
        return results

    # -- per-type builders/runners --------------------------------------
    def _ppl(self, e, model, qmap):
        if e.evaluator is None:
            ev = e.ev
            ids = load_eval_ids(ev, model.tokenizer)
            if ev.get('inference_per_block'):
                e.evaluator = OffloadPPL(ids,
                                         seq_len=ev.get('seq_len', 2048),
                                         bs=ev.get('bs', 8))
            else:
                from .ppl import PerplexityEval
                e.evaluator = PerplexityEval(
                    ids, seq_len=ev.get('seq_len', 2048),
                    bs=ev.get('bs', 1))
        return e.evaluator.eval(model, qmap=qmap)

    def _token_consist(self, e, model, qmap):
        from .ppl import TokenConsistencyEval
        ev = e.ev
        tc = TokenConsistencyEval(load_eval_ids(ev, model.tokenizer),
                                  seq_len=ev.get('seq_len', 2048),
                                  bs=ev.get('bs', 1))
        return tc.eval(model, None, qmap)

    def _decode_ppl(self, e, model, qmap, kv_policy):
        if e.evaluator is None:
            from .ppl import DecodePerplexityEval
            ev = e.ev
            texts = load_eval_texts(ev)
            if texts is not None and model.tokenizer is not None:
                # reference protocol: first num_samples RAW texts,
                # each decoded whole (eval_base.py:78-80)
                e.evaluator = DecodePerplexityEval(
                    texts=texts, tokenizer=model.tokenizer,
                    num_samples=ev.get('num_samples', 4))
            else:
                ids = load_eval_ids(ev, model.tokenizer)
                e.evaluator = DecodePerplexityEval(
                    ids, seq_len=ev.get('seq_len', 2048),
                    num_samples=ev.get('num_samples', 4))
        return e.evaluator.eval(model, qmap=qmap, kv_policy=kv_policy)

    def _acc_build(self, e, model):
        from ..models.adapter import AccuracyEval
        ev = e.ev
        path = ev.get('path')
        pixels = labels = None
        if path and os.path.exists(path):
            if os.path.isfile(path):               # one .npz bundle
                d = np.load(path)
                pixels, labels = d['pixels'], d['labels']
            else:                                  # directory of .npy
                pixels = np.load(os.path.join(path, 'pixels.npy'))
                labels = np.load(os.path.join(path, 'labels.npy'))
        if pixels is None:
            # no ImageNet on disk: synthetic pixels, labels = the
            # PRETRAIN model's own predictions — pretrain accuracy is
            # 1.0 by construction and later positions measure prediction
            # consistency under compression (the image analog of
            # TokenConsistencyEval)
            import jax
            cfg = model.cfg
            rng = np.random.RandomState(ev.get('seed', 0))
            n = int(ev.get('n_samples', 16))
            pixels = rng.randn(
                n, cfg.num_channels, cfg.image_size,
                cfg.image_size).astype(np.float32)
            labels = np.asarray(jax.jit(
                lambda p, px: jnp.argmax(
                    model._V.classify(p, model.cfg, px, qmap=None), -1))(
                model.params, jnp.asarray(pixels)))
        e.evaluator = AccuracyEval(pixels, labels,
                                   bs=int(ev.get('bs', 16)))

    def _acc(self, e, model, qmap):
        if e.evaluator is None:
            self._acc_build(e, model)
        return e.evaluator.eval(model, qmap=qmap)

    def _code(self, e, model, qmap):
        if e.evaluator is None:
            from .code import HumanEval
            ev = e.ev
            e.evaluator = HumanEval(
                problem_file=ev.get('path') or ev.get('problem_file'),
                max_new_tokens=int(ev.get('max_new_tokens', 256)),
                n_samples_per_task=int(ev.get('n_samples_per_task', 1)),
                res_path=ev.get('res_path', './humaneval_out'))
        return e.evaluator.eval(model, qmap=qmap)

    def _custom_gen(self, e, model, qmap):
        if e.evaluator is None:
            from .harness import CustomGenerate
            ev = e.ev
            prompts = ev.get('prompts')
            if prompts is None and ev.get('path') \
                    and os.path.isfile(ev['path']):
                with open(ev['path']) as f:
                    prompts = [ln.rstrip('\n') for ln in f if ln.strip()]
            e.evaluator = CustomGenerate(
                prompts or ['Hello'],
                max_new_tokens=int(ev.get('max_new_tokens', 64)))
        return e.evaluator.eval(model, qmap=qmap)

    def _latency(self, e, model, qmap, kv_policy):
        if e.evaluator is None:
            from .latency import LatencyEval
            ev = e.ev
            e.evaluator = LatencyEval(
                prompt_len=int(ev.get('prompt_len', 128)),
                gen_len=int(ev.get('gen_len', 64)),
                batch=int(ev.get('bs', 1)),
                iters=int(ev.get('iters', 5)))
        return e.evaluator.eval(model, qmap=qmap, kv_policy=kv_policy)

    def _vqa_build(self, e, model):
        # answers come from the PRETRAIN model, so this must build
        # before calibration mutates the weights (prebuild)
        from ..data import CalibDataset
        from .vqa import VQAEval
        ev = e.ev
        vds = CalibDataset(dict(ev, name=ev.get('name',
                                                'synthetic_vlm')),
                           model.tokenizer)
        vbatches, _ = vds.get_calib_dataset()
        ans_len = int(ev.get('answer_tokens', 4))
        samples = _vqa_samples(model, vbatches, ans_len)
        e.evaluator = VQAEval(samples, max_new_tokens=ans_len)

    def _vqa(self, e, model, qmap):
        if e.evaluator is None:
            self._vqa_build(e, model)
        return e.evaluator.eval(model, qmap=qmap)['accuracy']

    def _video(self, e, model, position, qmap):
        if e.evaluator is None:
            from ..data import CalibDataset
            from .video import VideoGenerateEval
            ev = e.ev
            vds = CalibDataset(dict(ev, name=ev.get('name',
                                                    'synthetic_t2v')),
                               model.tokenizer)
            vsamples, _ = vds.get_calib_dataset()
            e.evaluator = VideoGenerateEval(vsamples, ev)
        return e.evaluator.eval(model, position, qmap=qmap)
