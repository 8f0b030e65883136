"""Roofline-context fields in the bench line (round-4 verdict #5).

Pure host-side unit tests: _cost_analysis defensiveness across the API's
historical return shapes, and _roofline_fields' peak-table matching. No jit,
no backend — the full path is exercised by bench.py's own measure functions
(smoked on CPU, measured on TPU runs).
"""

import bench


class _FakeCompiled:
    def __init__(self, ret=None, raises=False):
        self._ret = ret
        self._raises = raises

    def cost_analysis(self):
        if self._raises:
            raise NotImplementedError("backend without cost analysis")
        return self._ret


def test_cost_analysis_handles_dict_list_and_missing():
    d = {"flops": 1e9, "bytes accessed": 2e9}
    assert bench._cost_analysis(_FakeCompiled(d)) == d
    # older jax returned a one-element list
    assert bench._cost_analysis(_FakeCompiled([d])) == d
    assert bench._cost_analysis(_FakeCompiled([])) == {}
    assert bench._cost_analysis(_FakeCompiled(None)) == {}
    assert bench._cost_analysis(_FakeCompiled(raises=True)) == {}


def test_roofline_fields_achieved_rates(monkeypatch):
    # unknown device kind: achieved_* only, no busy-pct keys
    class _Dev:
        device_kind = "FunkyAccel 9000"

    monkeypatch.setattr(bench.jax, "devices", lambda *a: [_Dev()])
    cost = {"flops": 4e12, "bytes accessed": 8e9}
    out = bench._roofline_fields(cost, sec=2.0)
    assert out == {"achieved_hbm_gbps": 4.0, "achieved_tflops": 2.0}


def test_roofline_fields_peak_match_and_prefix(monkeypatch):
    class _Dev:
        device_kind = "TPU v5e"

    monkeypatch.setattr(bench.jax, "devices", lambda *a: [_Dev()])
    peak_flops, peak_bw = bench._PEAKS["v5e"]
    # 10% of both peaks over 1 s
    cost = {"flops": 0.1 * peak_flops, "bytes accessed": 0.1 * peak_bw}
    out = bench._roofline_fields(cost, sec=1.0, prefix="train_")
    assert out["train_mxu_busy_pct"] == 10.0
    assert out["train_hbm_busy_pct"] == 10.0
    assert "mxu_busy_pct" not in out  # prefixed, not bare


def test_roofline_fields_degenerate_inputs(monkeypatch):
    class _Dev:
        device_kind = "TPU v5e"

    monkeypatch.setattr(bench.jax, "devices", lambda *a: [_Dev()])
    assert bench._roofline_fields({}, sec=1.0) == {}
    assert bench._roofline_fields({"flops": 1e9}, sec=0.0) == {}
    # non-numeric / None values must not crash the bench
    assert bench._roofline_fields({"flops": None, "bytes accessed": 0}, 1.0) == {}
