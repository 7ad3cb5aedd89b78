"""The driver entry points stay green: single-chip jittable forward and the
multi-chip dryrun — including the PUBLISHED geometry (emsize 192, nhid 768,
6 heads, 12 layers, reference `model/config.py:25-50`) with mp=2
tensor-parallel shardings on the 8-virtual-device mesh."""

import pytest


@pytest.mark.slow
def test_dryrun_multichip_both_geometries(capsys):
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "dryrun_multichip[tiny] ok" in out
    assert "dryrun_multichip[published-192x12] ok" in out
