from .mesh import chains_mesh, chains_grid_mesh, shard_chains, replicate
from .sampler import MultiChainSampler, run_chains, init_states
from .diagnostics import (split_rhat, ess, acceptance_rate,
                          rank_normalized_rhat, ess_bulk, ess_tail)
from .distributed import (
    initialize_distributed,
    global_chains_mesh,
    global_chains_grid_mesh,
)
from .grid_sharded import (
    make_sharded_crf_chain,
    make_sharded_crf_chains,
    make_sharded_residual,
    make_sharded_loss,
    shard_grid_arrays,
)

__all__ = [
    "chains_mesh",
    "chains_grid_mesh",
    "shard_chains",
    "replicate",
    "MultiChainSampler",
    "run_chains",
    "init_states",
    "split_rhat",
    "ess",
    "rank_normalized_rhat",
    "ess_bulk",
    "ess_tail",
    "acceptance_rate",
    "make_sharded_crf_chain",
    "make_sharded_crf_chains",
    "make_sharded_residual",
    "make_sharded_loss",
    "shard_grid_arrays",
    "initialize_distributed",
    "global_chains_mesh",
    "global_chains_grid_mesh",
]
