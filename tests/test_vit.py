"""ViT parity vs HF + quantized accuracy eval."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope='module')
def tiny_vit_dir(tmp_path_factory):
    torch = pytest.importorskip('torch')
    from transformers import ViTConfig, ViTForImageClassification
    cfg = ViTConfig(image_size=32, patch_size=8, num_channels=3,
                    hidden_size=64, intermediate_size=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_labels=10)
    torch.manual_seed(0)
    model = ViTForImageClassification(cfg)
    model.eval()
    d = tmp_path_factory.mktemp('tiny_vit')
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_vit_forward_matches_hf(tiny_vit_dir):
    import torch
    path, hf_model = tiny_vit_dir
    from llmc_tpu.models.adapter import VitAdapter
    ours = VitAdapter.from_pretrained(path)
    rng = np.random.RandomState(0)
    px = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = hf_model(torch.tensor(px)).logits.numpy()
    got = np.asarray(ours.classify(jnp.asarray(px)))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_vit_quant_accuracy_eval(tiny_vit_dir):
    path, _ = tiny_vit_dir
    from llmc_tpu.models.adapter import AccuracyEval, VitAdapter
    from llmc_tpu.models import LinearQcfg, QMap
    from llmc_tpu.quant import QuantSpec
    ours = VitAdapter.from_pretrained(path)
    rng = np.random.RandomState(1)
    px = rng.randn(8, 3, 32, 32).astype(np.float32)
    fp_pred = np.asarray(jnp.argmax(ours.classify(jnp.asarray(px)), -1))
    acc = AccuracyEval(px, fp_pred, bs=4)
    assert acc.eval(ours) == 1.0  # fp labels vs fp preds
    wspec = QuantSpec(bit=8, symmetric=True, granularity='per_channel')
    qmap = QMap({}, default=LinearQcfg(w_spec=wspec))
    assert acc.eval(ours, qmap=qmap) >= 0.7  # int8 barely changes argmax


def test_vit_quantized_attention(tiny_vit_dir):
    """quant_attn / quant_softmax / quant_act_fn (reference attn_utils
    LlmcMatmul/LlmcSoftmax + LlmcActFn): pseudo-path policies must reach
    the attention internals — a crushingly coarse act spec must change
    the logits, while an empty pseudo map must not."""
    path, _ = tiny_vit_dir
    from llmc_tpu.models.adapter import VitAdapter
    from llmc_tpu.models import LinearQcfg, QMap
    from llmc_tpu.quant import QuantSpec
    ours = VitAdapter.from_pretrained(path)
    rng = np.random.RandomState(2)
    px = jnp.asarray(rng.randn(2, 3, 32, 32).astype(np.float32))
    base = np.asarray(ours.classify(px))
    coarse = QuantSpec(bit=2, symmetric=True, granularity='per_tensor')
    qc = LinearQcfg(a_spec=coarse)
    for pseudo in ('attention.matmul_1', 'attention.matmul_2',
                   'attention.softmax', 'act_fn'):
        got = np.asarray(ours.classify(px, qmap=QMap({pseudo: qc})))
        assert not np.allclose(got, base), pseudo
    same = np.asarray(ours.classify(px, qmap=QMap({})))
    np.testing.assert_allclose(same, base)


def test_blockwise_act_pseudo_entries(tiny_vit_dir):
    """RTN with act.quant_attn/quant_softmax/quant_act_fn exposes the
    pseudo-paths in the deployed QMap."""
    path, _ = tiny_vit_dir
    from llmc_tpu.models.adapter import VitAdapter
    from llmc_tpu.utils import ALGO_REGISTRY, Cfg
    import llmc_tpu.compression  # noqa: F401
    ours = VitAdapter.from_pretrained(path)
    cfg = Cfg({'model': {'type': 'Vit', 'path': path},
               'quant': {'method': 'RTN',
                         'weight': {'bit': 8, 'symmetric': True,
                                    'granularity': 'per_channel'},
                         'act': {'bit': 8, 'symmetric': True,
                                 'granularity': 'per_tensor',
                                 'quant_attn': True,
                                 'quant_softmax': True,
                                 'quant_act_fn': True}}})
    algo = ALGO_REGISTRY['RTN'](ours, cfg['quant'],
                                {'data': [], 'kwargs': []}, None, cfg)
    qmap = algo.deploy('fake_quant')
    for pseudo in ('attention.matmul_1', 'attention.matmul_2',
                   'attention.softmax', 'act_fn'):
        assert qmap.get(pseudo) is not None, pseudo
        assert qmap.get(pseudo).a_spec is not None
