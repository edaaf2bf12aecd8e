"""Calibration dataset assembly.

Reference: /root/reference/llmc/data/dataset/base_dataset.py:14-223 —
source selection (hub download / disk / custom txt), preproc dispatch,
batching (bs = -1 | 1 | n), rank-sharding, padding masks.

TPU-native differences: samples are numpy int32; data-parallel sharding is
explicit via ``shard_for_data_parallel`` (the ``samples[RANK::WORLD]`` of
base_dataset.py:170-172 becomes a mesh-axis shard in the engine); an
offline ``synthetic`` source exists for hardware-free testing.
"""

from __future__ import annotations

import json
import os
import random
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..utils.registry import PREPROC_REGISTRY
from . import preproc as _preproc  # noqa: F401  (registers preprocs)

TEXT_KEY = {'pileval': 'text', 'c4': 'text', 'wikitext2': 'text',
            'ptb': 'sentence'}


class CalibDataset:
    def __init__(self, calib_cfg: Dict, tokenizer=None):
        self.cfg = calib_cfg
        self.tokenizer = tokenizer
        self.name = calib_cfg['name']
        self.download = calib_cfg.get('download', False)
        self.path = calib_cfg.get('path')
        self.n_samples = calib_cfg.get('n_samples')
        self.bs = calib_cfg.get('bs', 1)
        self.seq_len = calib_cfg.get('seq_len')
        self.preproc = calib_cfg.get('preproc', 'txt_general_preproc')
        self.padding = calib_cfg.get('padding', False)
        self.seed = calib_cfg.get('seed', 42)
        self.key = TEXT_KEY.get(self.name, 'text')
        self.calib_dataset = self._build()

    # --- sources --------------------------------------------------------
    def _build(self):
        if self.name.startswith('synthetic'):
            return None  # generated directly in get_calib_dataset
        if self.name == 'custom_txt':
            return self._load_custom_txt(self.path)
        if self.name in ('t2v', 'i2v'):
            return self._load_video_prompts(self.path)
        if self.download:
            import datasets
            hub = {
                'pileval': ('mit-han-lab/pile-val-backup', None,
                            'validation'),
                'wikitext2': ('wikitext', 'wikitext-2-raw-v1', 'train'),
                'ptb': ('ptb_text_only', 'penn_treebank', 'train'),
                'c4': ('allenai/c4', None, 'train'),
            }[self.name]
            name, sub, split = hub
            return datasets.load_dataset(name, sub, split=split)
        import datasets
        return datasets.load_from_disk(self.path)

    @staticmethod
    def _load_custom_txt(path: str) -> List[str]:
        if os.path.isdir(path):
            files = sorted(os.listdir(path))
            lines = []
            for f in files:
                fp = os.path.join(path, f)
                if f.endswith('.jsonl'):
                    with open(fp) as fh:
                        lines += [json.loads(ln).get('text', '')
                                  for ln in fh if ln.strip()]
                elif f.endswith('.txt'):
                    with open(fp) as fh:
                        lines += [ln.strip() for ln in fh if ln.strip()]
            return lines
        with open(path) as fh:
            return [ln.strip() for ln in fh if ln.strip()]

    @staticmethod
    def _load_video_prompts(path: str) -> List[Dict]:
        """t2v/i2v sources (reference base_dataset.py:49-85): a .txt of
        one prompt per line, or a .jsonl of
        {prompt, negative_prompt[, image]} records."""
        out = []
        if path.endswith('.jsonl') or (os.path.isfile(path)
                                       and path.endswith('.json')):
            with open(path) as fh:
                for ln in fh:
                    if ln.strip():
                        out.append(json.loads(ln))
        else:
            with open(path) as fh:
                out = [{'prompt': ln.strip(), 'negative_prompt': ''}
                       for ln in fh if ln.strip()]
        return out

    # --- assembly -------------------------------------------------------
    def get_calib_dataset(self, rank: int = 0, world_size: int = 1
                          ) -> Tuple[List[Dict], Optional[List]]:
        """Returns (batches, padding_masks).  Each batch:
        {'input_ids': np.int32 [bs, seq], 'attention_mask': optional}."""
        random.seed(self.seed)
        if self.name == 'synthetic_vlm':
            # multimodal synthetic batches: ids with one contiguous image
            # placeholder span + random pixel_values (VLM calib path)
            rng = np.random.RandomState(self.seed + rank)
            vocab = int(self.cfg.get('vocab_size', 32000))
            img_tok = int(self.cfg.get('image_token', vocab))
            img_len = int(self.cfg.get('image_seq_length', 4))
            img_size = int(self.cfg.get('image_size', 28))
            chans = int(self.cfg.get('num_channels', 3))
            batches = []
            for _ in range(self.n_samples):
                ids = rng.randint(0, vocab, size=(1, self.seq_len))
                ids[0, 1:1 + img_len] = img_tok
                px = rng.randn(1, chans, img_size, img_size)
                batches.append({'input_ids': ids.astype(np.int32),
                                'pixel_values': px.astype(np.float32)})
            return batches, None
        if self.name == 'synthetic_qwen2vl':
            # Qwen2-VL processor-layout batches: flattened patches
            # [n, C*T*p*p] + static grid; ids carry vision_start + the
            # MERGED number of image placeholders
            rng = np.random.RandomState(self.seed + rank)
            vocab = int(self.cfg.get('vocab_size', 32000))
            img_tok = int(self.cfg.get('image_token', vocab))
            vstart = int(self.cfg.get('vision_start_token', vocab + 1))
            h, w = self.cfg.get('grid_hw', (4, 4))
            merge = int(self.cfg.get('spatial_merge_size', 2))
            pdim = int(self.cfg.get('patch_dim', 3 * 2 * 14 * 14))
            n = h * w
            merged = n // (merge * merge)
            batches = []
            for _ in range(self.n_samples):
                ids = rng.randint(0, vocab, size=(1, self.seq_len))
                ids[0, 1] = vstart
                ids[0, 2:2 + merged] = img_tok
                patches = rng.randn(n, pdim).astype(np.float32)
                batches.append({'input_ids': ids.astype(np.int32),
                                'pixel_patches': patches,
                                'grid_thw': (1, h, w)})
            return batches, None
        if self.name == 'synthetic_onevision':
            # LLaVA-OneVision batches: anyres pixel stacks
            # [1, num_crops, C, H, W] + image_sizes
            rng = np.random.RandomState(self.seed + rank)
            vocab = int(self.cfg.get('vocab_size', 32000))
            img_tok = int(self.cfg.get('image_token', vocab))
            img_len = int(self.cfg.get('image_seq_length', 4))
            img_size = int(self.cfg.get('image_size', 16))
            crops = int(self.cfg.get('num_crops', 2))
            chans = int(self.cfg.get('num_channels', 3))
            batches = []
            for _ in range(self.n_samples):
                ids = rng.randint(0, vocab, size=(1, self.seq_len))
                ids[0, 2:2 + img_len] = img_tok
                px = rng.randn(1, crops, chans, img_size, img_size)
                batches.append({'input_ids': ids.astype(np.int32),
                                'pixel_values': px.astype(np.float32),
                                'image_sizes': [(img_size, img_size)]})
            return batches, None
        if self.name == 'synthetic_onevision_video':
            # OneVision video batches: [1, F, C, H, W] frames; ids carry
            # the pooled video span F*(side/2)^2 + 1 newline placeholder
            rng = np.random.RandomState(self.seed + rank)
            vocab = int(self.cfg.get('vocab_size', 32000))
            vid_tok = int(self.cfg.get('video_token', vocab))
            img_size = int(self.cfg.get('image_size', 16))
            patch = int(self.cfg.get('patch_size', 4))
            frames = int(self.cfg.get('num_frames', 3))
            chans = int(self.cfg.get('num_channels', 3))
            half = -(-(img_size // patch) // 2)
            span = frames * half * half + 1
            batches = []
            for _ in range(self.n_samples):
                ids = rng.randint(0, vocab, size=(1, self.seq_len))
                ids[0, 1:1 + span] = vid_tok
                px = rng.randn(1, frames, chans, img_size, img_size)
                batches.append({'input_ids': ids.astype(np.int32),
                                'pixel_values_videos':
                                    px.astype(np.float32)})
            return batches, None
        if self.name == 'synthetic_img':
            # vision-only batches (ViT calib; reference img preprocs)
            rng = np.random.RandomState(self.seed + rank)
            img_size = int(self.cfg.get('image_size', 32))
            chans = int(self.cfg.get('num_channels', 3))
            return [{'pixel_values': rng.randn(1, chans, img_size,
                                               img_size).astype(np.float32)}
                    for _ in range(self.n_samples)], None
        if self.name == 'synthetic_mllama':
            # ids + precomputed vision cross-attention states
            rng = np.random.RandomState(self.seed + rank)
            vocab = int(self.cfg.get('vocab_size', 64))
            d = int(self.cfg.get('hidden_size', 32))
            sk = int(self.cfg.get('cross_len', 8))
            return [{'input_ids': rng.randint(
                        0, vocab, size=(1, self.seq_len)).astype(
                        np.int32),
                     'cross_states': rng.randn(1, sk, d).astype(
                        np.float32)}
                    for _ in range(self.n_samples)], None
        if self.name == 'synthetic_qwen2audio':
            # ids with an audio-token span + random mel features
            rng = np.random.RandomState(self.seed + rank)
            vocab = int(self.cfg.get('vocab_size', 64))
            aud_tok = int(self.cfg.get('audio_token', vocab))
            mel = int(self.cfg.get('num_mel_bins', 16))
            t_mel = int(self.cfg.get('mel_len', 32))
            span = t_mel // 4
            out = []
            for _ in range(self.n_samples):
                ids = rng.randint(0, vocab, size=(1, self.seq_len))
                ids = ids.astype(np.int32)
                ids[0, 1:1 + span] = aud_tok
                feats = rng.randn(1, mel, t_mel).astype(np.float32)
                out.append({'input_ids': ids, 'input_features': feats})
            return out, None
        if self.name == 'synthetic_videollava':
            # ids with a video-token span + random F-frame clips
            rng = np.random.RandomState(self.seed + rank)
            vocab = int(self.cfg.get('vocab_size', 64))
            vid_tok = int(self.cfg.get('video_token', vocab))
            frames = int(self.cfg.get('num_frames', 4))
            per_frame = int(self.cfg.get('image_seq_length', 4))
            img_size = int(self.cfg.get('image_size', 28))
            chans = int(self.cfg.get('num_channels', 3))
            span = frames * per_frame
            out = []
            for _ in range(self.n_samples):
                ids = rng.randint(0, vocab, size=(1, self.seq_len))
                ids = ids.astype(np.int32)
                ids[0, 1:1 + span] = vid_tok
                px = rng.randn(1, frames, chans, img_size,
                               img_size).astype(np.float32)
                out.append({'input_ids': ids,
                            'pixel_values_videos': px})
            return out, None
        if self.name == 'synthetic_t2v':
            # random UMT5-embedding surrogate batches for the Wan tier
            # (encoder-free testing; shapes match condition_embed input)
            rng = np.random.RandomState(self.seed + rank)
            text_dim = int(self.cfg.get('text_dim', 32))
            txt_len = int(self.cfg.get('txt_len', 8))
            lat = self.cfg.get('latent_shape', (1, 4, 2, 8, 8))
            img_dim = self.cfg.get('image_dim')
            img_len = int(self.cfg.get('image_len', 5))
            out = []
            for i in range(self.n_samples):
                b = {'text_embeds':
                     rng.randn(1, txt_len, text_dim).astype(np.float32),
                     'neg_embeds':
                     rng.randn(1, txt_len, text_dim).astype(np.float32),
                     'latent_shape': tuple(lat), 'seed': i}
                if img_dim:
                    b['image_embeds'] = rng.randn(
                        1, img_len, int(img_dim)).astype(np.float32)
                out.append(b)
            return out, None
        if self.name in ('t2v', 'i2v'):
            data = list(self.calib_dataset)
            if world_size > 1:
                data = data[rank::world_size]
            return [dict(s) for s in data[:self.n_samples]], None
        if self.name == 'synthetic':
            rng = np.random.RandomState(self.seed + rank)
            vocab = int(self.cfg.get('vocab_size', 32000))
            samples = [rng.randint(0, vocab, size=(1, self.seq_len))
                       .astype(np.int32) for _ in range(self.n_samples)]
        else:
            data = self.calib_dataset
            if world_size > 1 and not hasattr(data, 'shard'):
                data = list(data)[rank::world_size]
            elif world_size > 1:
                data = data.shard(num_shards=world_size, index=rank)
            fn = PREPROC_REGISTRY[self.preproc]
            kw = dict(calib_dataset=data, tokenizer=self.tokenizer,
                      n_samples=self.n_samples, seq_len=self.seq_len)
            if self.preproc == 'txt_general_preproc':
                kw['key'] = self.key
            samples = fn(**kw)
        batches = self._batch(samples)
        masks = [b.get('attention_mask') for b in batches] \
            if self.padding else None
        return batches, masks

    def _batch(self, samples: List[np.ndarray]) -> List[Dict]:
        out = []
        if self.bs == -1:
            if self.padding:
                ids, mask = _pad_cat(samples)
                out.append({'input_ids': ids, 'attention_mask': mask})
            else:
                out.append({'input_ids': np.concatenate(samples, axis=0)})
        elif self.bs == 1:
            for s in samples:
                out.append({'input_ids': s})
        else:
            for i in range(0, len(samples), self.bs):
                grp = samples[i:i + self.bs]
                if self.padding:
                    ids, mask = _pad_cat(grp)
                    out.append({'input_ids': ids, 'attention_mask': mask})
                else:
                    out.append({'input_ids': np.concatenate(grp, axis=0)})
        return out


def _pad_cat(samples: List[np.ndarray], pad_id: int = 0
             ) -> Tuple[np.ndarray, np.ndarray]:
    """Left-pad to the max length (HF convention for causal LM calib)."""
    maxlen = max(s.shape[1] for s in samples)
    ids = np.full((len(samples), maxlen), pad_id, np.int32)
    mask = np.zeros((len(samples), maxlen), np.int32)
    for i, s in enumerate(samples):
        L = s.shape[1]
        ids[i, maxlen - L:] = s[0]
        mask[i, maxlen - L:] = 1
    return ids, mask
