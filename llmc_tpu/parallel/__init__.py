from .collectives import quantized_pmean, quantized_psum
from .dp import (dp_calib_mesh, replicate_params, shard_calib_batches,
                 shard_inputs_dict)
from .multihost import (host_shard_batches, init_distributed,
                        make_hybrid_mesh)
from .shard import data_pspec, make_mesh, param_pspecs, shard_params

__all__ = ['quantized_pmean', 'quantized_psum',
           'data_pspec', 'make_mesh', 'param_pspecs', 'shard_params',
           'host_shard_batches', 'init_distributed', 'make_hybrid_mesh',
           'dp_calib_mesh', 'replicate_params', 'shard_calib_batches',
           'shard_inputs_dict']
