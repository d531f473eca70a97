from .randfield import (
    RandField,
    RandFieldArrays,
    RandFieldStatic,
    build_randfield,
    draw_block,
    make_block_menu,
)
from .chain_sgs import ChainSGS, SGSState, SGSConsts, SGSStatic  # noqa: F401
from .chain_crf import (
    ChainCRF,
    ChainState,
    CRFConsts,
    CRFStatic,
    init_state,
    make_step,
    run_chain,
)

__all__ = [
    "RandField",
    "RandFieldArrays",
    "RandFieldStatic",
    "build_randfield",
    "draw_block",
    "make_block_menu",
    "ChainCRF",
    "ChainState",
    "CRFConsts",
    "CRFStatic",
    "init_state",
    "make_step",
    "run_chain",
]

__all__ += ["ChainSGS", "SGSState", "SGSConsts", "SGSStatic"]
