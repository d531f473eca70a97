from .randfield import (
    RandFieldArrays,
    RandFieldStatic,
    build_randfield,
    draw_block,
    make_block_menu,
)
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
