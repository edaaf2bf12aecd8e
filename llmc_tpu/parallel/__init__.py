from .shard import (data_pspec, dp_mean, make_mesh, param_pspecs,
                    shard_params)

__all__ = ['data_pspec', 'dp_mean', 'make_mesh', 'param_pspecs',
           'shard_params']
