"""Run the read-only reference pipeline (/root/reference llmc) end-to-end
on CPU as a PARITY oracle.

Usage:  python tools/ref_pipeline.py --config CFG.yml --out RESULTS.json

Runs the reference's real ``main(config)`` (llmc/__main__.py:28) in this
process with:
  - optional deps stubbed (loguru -> logging, qtorch, easydict, librosa,
    lmms_eval, decord, ...) — nothing in /root/reference is modified;
  - ``.cuda()`` monkeypatched to the identity so the CUDA-only reference
    runs on the CPU (this mirrors the reference's own ci_check/
    change_files.py, which rewrites .cuda() -> .cpu() on its CPU runner);
  - a single-process gloo process group (their CI uses torchrun nproc=1).

Captures every ``EVAL: <type> on <dataset> is <value>`` line the
reference logs (llmc/eval/utils.py:92) and writes them as JSON:
    {"pretrain": {"ppl wikitext2": 12.3}, "transformed": {...}, ...}
"""

import argparse
import json
import logging
import os
import re
import sys
import types

REF_ROOT = '/root/reference'


class EasyDict(dict):
    """Minimal attribute-access dict (stand-in for the easydict pkg)."""

    def __init__(self, d=None, **kw):
        super().__init__()
        d = dict(d or {}, **kw)
        for k, v in d.items():
            self[k] = v

    def __setitem__(self, k, v):
        if isinstance(v, dict) and not isinstance(v, EasyDict):
            v = EasyDict(v)
        elif isinstance(v, (list, tuple)):
            v = type(v)(EasyDict(x) if isinstance(x, dict) and
                        not isinstance(x, EasyDict) else x for x in v)
        super().__setitem__(k, v)
        super().__setattr__(k, v)

    def __setattr__(self, k, v):
        self[k] = v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


def _stub(name, **attrs):
    mod = sys.modules.get(name) or types.ModuleType(name)
    mod.__path__ = []          # make it a package so submodules resolve
    if mod.__spec__ is None:   # importlib.util.find_spec probes need one
        import importlib.machinery
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    # register on the parent chain so `import a.b.c` finds each level
    if '.' in name:
        parent, child = name.rsplit('.', 1)
        setattr(_stub(parent), child, mod)
    return mod


def install_stubs():
    log = logging.getLogger('ref')
    log.setLevel(logging.INFO)

    class _Loguru:
        def info(self, msg, *a, **k):
            log.info(str(msg))

        warning = info
        error = info
        debug = info

        def remove(self, *a, **k):
            pass

        def add(self, *a, **k):
            pass

    _stub('loguru', logger=_Loguru())
    _stub('easydict', EasyDict=EasyDict)
    qtq = _stub('qtorch.quant', float_quantize=None)
    _stub('qtorch', quant=qtq)
    for opt in ('librosa', 'decord', 'av'):
        _stub(opt)
    class _Any:
        """Attribute sink: any attribute access returns a dummy class."""

        def __getattr__(self, k):
            return object

    _stub('torchvision.transforms', Compose=object, Resize=object,
          CenterCrop=object, ToTensor=object, Normalize=object,
          InterpolationMode=_Any())
    _stub('torchvision.transforms.functional', InterpolationMode=_Any())
    _stub('torchvision.datasets', ImageFolder=object)
    # lmms_eval tree used by the VLM/eval wrappers at import time
    _stub('lmms_eval.api.model', lmms=object)
    _stub('lmms_eval.api.instance', Instance=object)
    _stub('lmms_eval.evaluator', evaluate=lambda *a, **k: {})
    _stub('lmms_eval.evaluator_utils', run_task_tests=lambda *a, **k: None)
    _stub('lmms_eval.loggers.evaluation_tracker', EvaluationTracker=object)
    _stub('lmms_eval.tasks', TaskManager=object,
          get_task_dict=lambda *a, **k: {})
    _stub('lmms_eval.utils', get_datetime_str=lambda: '',
          make_table=lambda *a, **k: '',
          simple_parse_args_string=lambda s: {})
    for m in ('llava', 'llava_hf', 'llava_onevision', 'video_llava',
              'qwen2_audio', 'internvl2'):
        _stub(f'lmms_eval.models.{m}',
              **{n: object for n in ('Llava', 'LlavaHf', 'Llava_OneVision',
                                     'VideoLLaVA', 'Qwen2_Audio',
                                     'InternVL2')})
    _stub('human_eval.data', read_problems=lambda: {},
          write_jsonl=lambda *a, **k: None,
          stream_jsonl=lambda *a, **k: iter(()))
    _stub('human_eval.evaluation',
          evaluate_functional_correctness=lambda *a, **k: {})
    _stub('diffusers.utils', export_to_video=lambda *a, **k: None,
          load_image=lambda *a, **k: None)
    _stub('diffusers', AutoencoderKLWan=object, WanPipeline=object,
          WanImageToVideoPipeline=object)


def patch_cpu():
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    def _decuda(args, kwargs):
        def fix(v):
            if isinstance(v, (str, torch.device)) and 'cuda' in str(v):
                return 'cpu'
            return v
        return ([fix(a) for a in args],
                {k: fix(v) for k, v in kwargs.items()})

    _t_to, _m_to = torch.Tensor.to, torch.nn.Module.to

    def t_to(self, *a, **k):
        a, k = _decuda(a, k)
        return _t_to(self, *a, **k)

    def m_to(self, *a, **k):
        a, k = _decuda(a, k)
        return _m_to(self, *a, **k)

    torch.Tensor.to = t_to
    torch.nn.Module.to = m_to

    def wrap_factory(fn):
        def g(*a, **k):
            if 'cuda' in str(k.get('device', '')):
                k['device'] = 'cpu'
            return fn(*a, **k)
        return g

    for fname in ('tensor', 'zeros', 'ones', 'empty', 'full', 'arange',
                  'zeros_like', 'ones_like', 'rand', 'randn', 'eye',
                  'linspace'):
        setattr(torch, fname, wrap_factory(getattr(torch, fname)))
    if not torch.cuda.is_available():
        torch.cuda.empty_cache = lambda: None
        torch.cuda.set_device = lambda *a, **k: None
        torch.cuda.synchronize = lambda *a, **k: None
        torch.cuda.reset_peak_memory_stats = lambda *a, **k: None
        torch.cuda.max_memory_allocated = lambda *a, **k: 0
        torch.cuda.memory_allocated = lambda *a, **k: 0
        torch.cuda.current_device = lambda: 'cpu'
        torch.cuda.device_count = lambda: 1


def patch_ref_bugs():
    """In-process signature adapter for stale reference code (nothing on
    disk is modified).  Wanda.subset_transform kept the old 3-arg
    ``(subset, input_feat, subset_kwargs)`` signature while its base
    class now calls with 6 positional args
    (base_blockwise_sparsification.py:169 vs wanda.py:34) — upstream
    Wanda is uncallable as shipped; adapt so the oracle can run it."""
    import inspect
    import types as _types
    from llmc.compression.sparsification.wanda import Wanda
    orig = Wanda.subset_transform
    if len(inspect.signature(orig).parameters) == 4:  # self + 3
        def subset_transform(self, layers_dict, input_feat, prev_op,
                             input_name, inspect_module, subset_kwargs):
            subset = {'layers': layers_dict, 'input': [input_name]}
            return orig(self, subset, input_feat, subset_kwargs)
        Wanda.subset_transform = subset_transform
    # Magnitude has the same stale 3-arg subset_transform signature as
    # Wanda (magnitude.py:15-19 vs its own block_transform 6-arg call at
    # :46-53) — uncallable as shipped.  While adapting, the mask
    # assignment `W[W_mask] = 0` also sits OUTSIDE the per-layer loop
    # (magnitude.py:23-31), so only the subset's LAST layer would be
    # pruned; the rewritten adapter applies the mask per layer, matching
    # the loop's evident intent (and Wanda's per-layer masking).
    from llmc.compression.sparsification.magnitude import Magnitude as _Mag
    import torch as _torch2

    def _mag_subset_transform(self, layers_dict, input_feat, prev_op,
                              input_name, inspect_module, subset_kwargs):
        for layer in layers_dict.values():
            W = layer.weight.data
            W_metric = _torch2.abs(W)
            thresh = _torch2.sort(W_metric.flatten())[0][
                int(W.numel() * self.sparser.sparsity)].cpu()
            W[W_metric <= thresh] = 0

    _Mag.subset_transform = _mag_subset_transform
    # Wanda/Magnitude also read `self.sparser.sparsity`, but the base
    # only ever sets `self.sparsity` (base_blockwise_sparsification.py
    # :41) — another stale-API crash; bridge it with a property.
    from llmc.compression.sparsification.base_blockwise_sparsification \
        import BaseBlockwiseSparsification as _BBS
    if not hasattr(_BBS, 'sparser'):
        _BBS.sparser = property(lambda self: _types.SimpleNamespace(
            sparsity=self.sparsity))
    # Sparsification's block_forward does `block(...)[0]`, but installed
    # transformers' decoder layers return a raw TENSOR — `[0]` silently
    # strips the batch dim and the next block crashes on garbled shapes.
    # The quantization base guards with isinstance(out, tuple)
    # (base_blockwise_quantization.py:386-388); mirror that here.
    import torch as _torch

    def _block_forward(self, block, input_data=None):
        output = []
        if input_data is None:
            input_data = self.input['data']
        for i in range(len(input_data)):
            with _torch.no_grad():
                out = block(input_data[i], **self.input['kwargs'][i])
                if isinstance(out, tuple):
                    out = out[0]
                output.append(out)
        return output

    _BBS.block_forward = _block_forward
    # The KV-cache injection hook sets kwargs['past_key_value']
    # (blockwise_optimization.py:66), but transformers >= 4.48 renamed
    # the attention kwarg to past_key_values — the singular lands in
    # **kwargs and is IGNORED, so the reference's decode-PPL runs with
    # no cache at all (every next token predicted from a 1-token
    # context; reproduced bit-exact by a no-cache loop).  Rename to
    # whatever the wrapped module's forward actually accepts.
    import inspect as _inspect
    from llmc.compression import blockwise_optimization as _bo
    _orig_hook = _bo.BlockwiseOpt.kv_cache_input_hook

    def kv_cache_input_hook(self, attn_layer):
        inner = _orig_hook(self, attn_layer)

        def hook(module, args, kwargs):
            args, kwargs = inner(module, args, kwargs)
            if 'past_key_value' in kwargs:
                try:
                    params = _inspect.signature(
                        type(module).forward).parameters
                except (TypeError, ValueError):
                    params = {}
                if ('past_key_value' not in params
                        and 'past_key_values' in params):
                    kwargs['past_key_values'] = kwargs.pop(
                        'past_key_value')
            return args, kwargs
        return hook

    _bo.BlockwiseOpt.kv_cache_input_hook = kv_cache_input_hook
    # Weight48 (bit: 48) + act quant is uncallable upstream: the weight
    # section carries no top-level 'granularity', but set_quant_config
    # reads quant_config['weight']['granularity'] unconditionally when
    # 'act' is present (base_blockwise_quantization.py:165) -> KeyError
    # on the shipped rtn_w_a_wint4aint8.yml shape.  Supplying one then
    # crashes Weight48IntegerQuantizer instead (granularity is also
    # forwarded via **kwargs into BaseQuantizer's positional granularity,
    # quant.py:1234/46 -> duplicate argument).  Adapt: configs carry
    # granularity, the W48 constructor drops it.
    from llmc.compression.quantization import quant as _q
    _w48_orig = _q.Weight48IntegerQuantizer.__init__

    def _w48_init(self, bit, bit4, bit8, **kw):
        kw.pop('granularity', None)
        kw.pop('symmetric', None)
        _w48_orig(self, bit, bit4, bit8, **kw)

    _q.Weight48IntegerQuantizer.__init__ = _w48_init
    # DGQ overrides set_quant_config (dgq.py:40-64) and predates the
    # attributes the base block_opt/deploy now read unconditionally
    # (quant_kvcache at base_blockwise_quantization.py:394, act_static,
    # quant_attn, ...) -> AttributeError as shipped.  Default them.
    from llmc.compression.quantization.dgq import DGQ as _DGQ
    _dgq_sqc = _DGQ.set_quant_config

    def _dgq_set_quant_config(self):
        _dgq_sqc(self)
        for attr, val in (('quant_kvcache', False), ('act_static', False),
                          ('quant_attn', False), ('quant_softmax', False),
                          ('quant_act_fn', False), ('mixed_precision',
                                                    False),
                          ('tp', 1), ('true_sequential', False)):
            if not hasattr(self, attr):
                setattr(self, attr, val)
        if not hasattr(self, 'modality'):   # base sets it at :257
            self.modality = self.quant_config.get('modality', 'language')
        if not hasattr(self, 'wquantizer'):  # deploy partials w_qdq with
            # self.wquantizer (:92); DGQ's own w_qdq ignores the kwarg
            self.wquantizer = self.wquantizer_w4

    _DGQ.set_quant_config = _dgq_set_quant_config

    # ...and its searches call self.a_qdq(act) with the OLD 1-arg
    # signature (dgq.py:204/255) while the base now requires
    # (act, module, aquantizer) — default them to the dynamic path.
    def _dgq_a_qdq(self, act, module=None, aquantizer=None, input_index=0):
        return self.aquantizer.fake_quant_act_dynamic(act)

    _DGQ.a_qdq = _dgq_a_qdq


def run(config_path: str) -> dict:
    install_stubs()
    patch_cpu()
    os.environ.setdefault('RANK', '0')
    os.environ.setdefault('LOCAL_RANK', '0')
    os.environ.setdefault('WORLD_SIZE', '1')
    os.environ.setdefault('MASTER_ADDR', '127.0.0.1')
    if 'MASTER_PORT' not in os.environ:
        # a fixed port collides when several parity runs execute
        # concurrently (EADDRINUSE); bind an ephemeral one instead
        import socket
        with socket.socket() as s:
            s.bind(('127.0.0.1', 0))
            os.environ['MASTER_PORT'] = str(s.getsockname()[1])
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    patch_ref_bugs()

    import torch.distributed as dist
    if not dist.is_initialized():
        dist.init_process_group(backend='gloo', rank=0, world_size=1)

    import yaml
    with open(config_path) as f:
        config = EasyDict(yaml.safe_load(f))

    # capture the reference's EVAL log lines, tagged by eval position
    results = {}
    state = {'pos': 'pretrain'}
    pat = re.compile(r'EVAL: (\S+) on (\S+) is ([0-9.eE+-]+)')

    class Capture(logging.Handler):
        def emit(self, rec):
            m = pat.search(str(rec.getMessage()))
            if m:
                results.setdefault(state['pos'], {})[
                    f'{m.group(1)} {m.group(2)}'] = float(m.group(3))

    logging.getLogger('ref').addHandler(Capture())

    from llmc.eval import utils as eval_utils
    orig_eval_model = eval_utils.eval_model

    def eval_model(model, blockwise_opts, eval_list, eval_pos):
        state['pos'] = eval_pos
        return orig_eval_model(model, blockwise_opts, eval_list, eval_pos)

    eval_utils.eval_model = eval_model
    import llmc.__main__ as ref_main
    ref_main.eval_model = eval_model
    # main() references save paths normally set up in the __main__ guard
    if 'save' in config:
        for key, sub in (('save_trans', 'transformed_model'),
                         ('save_fake', 'fake_quant_model')):
            if config.save.get(key, False):
                p = os.path.join(config.save.save_path, sub)
                os.makedirs(p, exist_ok=True)
                setattr(ref_main, f'{key}_path', p)
    from llmc.utils import check_config
    check_config(config)
    from llmc.utils.utils import seed_all
    seed_all(config.base.seed)
    ref_main.main(config)
    return results


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', required=True)
    ap.add_argument('--out', required=True)
    a = ap.parse_args()
    res = run(a.config)
    with open(a.out, 'w') as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
