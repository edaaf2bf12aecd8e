from .multihost import (host_shard_batches, init_distributed,
                        make_hybrid_mesh)
from .shard import (data_pspec, dp_mean, make_mesh, param_pspecs,
                    shard_params)

__all__ = ['data_pspec', 'dp_mean', 'make_mesh', 'param_pspecs',
           'shard_params', 'host_shard_batches', 'init_distributed',
           'make_hybrid_mesh']
