"""Driver entry points stay working: compile-check entry() (tiny variant via
dryrun) and dryrun_multichip on the virtual mesh."""

import numpy as np

from __graft_entry__ import dryrun_multichip


def test_dryrun_multichip_8():
    dryrun_multichip(8)


def test_dryrun_multichip_odd():
    dryrun_multichip(1)
