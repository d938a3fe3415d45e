"""Scaling harness mechanics on the 8-fake-device mesh."""

from barcoder_tpu.parallel.scaling import measure_scaling


def test_measure_scaling_mechanics():
    r = measure_scaling(n_bp=1 << 17, n_spacers=128, repeats=1, device_counts=[1, 2, 8])
    assert r["fake_devices"] is True
    assert [p["devices"] for p in r["points"]] == [1, 2, 8]
    for p in r["points"]:
        assert p["spacer_positions_per_s"] > 0
    assert r["points"][0]["efficiency"] == 1.0
