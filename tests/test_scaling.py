"""Scaling harness mechanics on the 8-fake-device mesh."""

import pytest

from barcoder_tpu.parallel.scaling import measure_scaling


@pytest.mark.slow
def test_measure_scaling_mechanics():
    r = measure_scaling(
        n_bp=1 << 16, n_spacers=128, repeats=1, device_counts=[1, 2, 8],
        engine="both", single_chip=False,
    )
    assert r["fake_devices"] is True
    for eng in ("flagship", "blockmax"):
        assert [p["devices"] for p in r[eng]] == [1, 2, 8]
        for p in r[eng]:
            assert p["spacer_positions_per_s"] > 0
        assert r[eng][0]["efficiency"] == 1.0
    # the flagship path returns real hits (the planted workload guarantees
    # every spacer hits its own site at v=1 NGG-permissively >= 0 hits)
    assert all("hits" in p for p in r["flagship"])
