"""Driver-contract regression: dryrun_multichip must keep compiling+running
after internal refactors (the driver invokes it headlessly)."""

import __graft_entry__ as graft


def test_dryrun_multichip_small_mesh():
    # 2 devices → dp=1 x tp=2 on the virtual CPU mesh; exercises the sharded
    # decode step + TP ViT end to end with light compiles
    graft.dryrun_multichip(2)
