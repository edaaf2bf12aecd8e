"""Worker for the 2-process jax.distributed CPU test (run by
tests/test_multihost.py, one subprocess per simulated host).

Each process: joins the distributed world (localhost coordinator), keeps
only its stride slice of the calibration set (the reference's
``samples[RANK::WORLD]``, base_dataset.py:170-172), assembles the global
batch with make_array_from_process_local_data, and runs the full GPTQ
block loop over a dp mesh spanning both hosts' devices.  Process 0 dumps
the resulting weights for comparison with a single-process run.

usage: python multihost_worker.py <pid> <nproc> <port> <outdir>
"""

import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=4'
                           ).strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)                         # test_pipeline
sys.path.insert(0, os.path.dirname(_here))        # llmc_tpu (repo root)


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    from llmc_tpu.parallel.multihost import init_distributed
    got = init_distributed(coordinator_address=f'127.0.0.1:{port}',
                           num_processes=nproc, process_id=pid)
    assert got == pid and jax.process_count() == nproc

    import numpy as np
    import jax.numpy as jnp
    from llmc_tpu.utils import Cfg, ALGO_REGISTRY, seed_all
    import llmc_tpu.compression  # noqa: F401
    from llmc_tpu.models import build_model
    from llmc_tpu.models.base import get_path
    from llmc_tpu.parallel.dp import dp_calib_mesh, shard_inputs_dict
    from llmc_tpu.parallel.multihost import host_shard_batches

    from test_pipeline import tiny_config

    seed_all(7)
    cfg = Cfg(tiny_config('GPTQ', wbit=4, special={'actorder': False}))
    model = build_model(cfg)

    # the GLOBAL calibration set, identical on every host (seeded);
    # sample-per-batch so host_shard_batches' list stride is exercised
    rng = np.random.RandomState(3)
    n_global, seq = 8, 16
    ids = rng.randint(0, model.cfg.vocab_size, size=(n_global, seq))
    all_batches = [{'input_ids': jnp.asarray(ids[i:i + 1])}
                   for i in range(n_global)]
    local = host_shard_batches(all_batches)        # samples[RANK::WORLD]
    assert len(local) == n_global // nproc
    # one local batch of n_local samples -> one global batch of n_global
    local_ids = jnp.concatenate([b['input_ids'] for b in local])
    xs, kws = model.collect_first_block_input([{'input_ids': local_ids}])
    mesh = dp_calib_mesh()                         # all 8 global devices
    assert mesh.shape['dp'] == 8
    inputs = shard_inputs_dict(mesh, {'data': xs, 'kwargs': kws})

    algo = ALGO_REGISTRY['GPTQ'](model, cfg['quant'], inputs, None, cfg)
    algo.run_block_loop()

    if pid == 0:
        out = {}
        for b in range(model.n_blocks):
            blk = model.blocks[b]
            for path in model.get_layout().linears:
                out[f'{b}.{path}'] = np.asarray(
                    get_path(blk, path)['w'], np.float32)
        np.savez(os.path.join(outdir, 'weights.npz'), **out)
    print(f'WORKER_OK pid={pid}', flush=True)


if __name__ == '__main__':
    main()
