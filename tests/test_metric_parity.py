"""Metric-parity runbook CI fixture (VERDICT r2 #4): both stacks — the
ACTUAL reference torch model and ours from the converted identical weights —
predict 5 synthetic RGB-D images end to end through our metric evaluators;
the per-metric deltas must be float-tolerance. With this seam composed, the
real benchmark table needs nothing but the data + released .pth."""

import os

import numpy as np
import pytest

from dgtd_tpu.tools.ref_oracle import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)

torch = pytest.importorskip("torch")


def _make_fixture(root, n=5, size=64):
    from PIL import Image

    rng = np.random.RandomState(0)
    for sub in ("Imgs", "GT", "Depth"):
        os.makedirs(root / sub)
    for i in range(n):
        img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
        # blob-ish masks so S/E/F-measure see structure, not pure noise
        yy, xx = np.mgrid[0:size, 0:size]
        cy, cx, r = rng.randint(16, size - 16), rng.randint(16, size - 16), rng.randint(8, 20)
        gt = (((yy - cy) ** 2 + (xx - cx) ** 2) < r * r).astype(np.uint8) * 255
        dep = (rng.rand(size, size) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "Imgs" / f"x{i}.jpg")
        Image.fromarray(gt).save(root / "GT" / f"x{i}.png")
        Image.fromarray(dep).save(root / "Depth" / f"x{i}_depth.png")


@pytest.mark.slow
def test_metric_parity_runbook_synthetic(tmp_path):
    from dgtd_tpu.tools.metric_parity import run_parity
    from dgtd_tpu.tools.ref_oracle import load_reference_cod

    _make_fixture(tmp_path, n=5, size=64)

    ref = load_reference_cod()
    torch.manual_seed(0)
    state_dict = ref.cod().state_dict()

    result = run_parity(
        str(tmp_path / "Imgs"),
        str(tmp_path / "GT"),
        str(tmp_path / "Depth"),
        checkpoint=None,
        model_name="cod",
        size=384,  # the only size the reference runs (MessagePassing pins 384)
        state_dict=state_dict,
    )
    assert result["n_images"] == 5
    # float-tolerance composition: bf16-free fp32 predict on both sides
    assert result["pred_max_abs_delta"] < 5e-3, result
    for k, d in result["delta"].items():
        assert d < 2e-3, (k, d, result["reference"][k], result["ours"][k])
    # sanity: the metrics saw real structure (not all-NaN or constant)
    assert 0.0 < result["ours"]["COD/MAE"] < 1.0
    assert 0.0 < result["ours"]["COD/Smeasure"] < 1.0


@pytest.mark.slow
def test_metric_parity_cli_with_pth(tmp_path):
    """The one-command surface: a torch-saved reference .pth through the CLI
    main() — the exact runbook a user with benchmark data would run."""
    from dgtd_tpu.tools.metric_parity import main
    from dgtd_tpu.tools.ref_oracle import load_reference_cod

    _make_fixture(tmp_path, n=2, size=48)
    ref = load_reference_cod()
    torch.manual_seed(1)
    pth = tmp_path / "ref.pth"
    torch.save({"state_dict": ref.cod().state_dict()}, pth)

    result = main([
        "--image-dir", str(tmp_path / "Imgs"),
        "--gt-dir", str(tmp_path / "GT"),
        "--depth-dir", str(tmp_path / "Depth"),
        "--checkpoint", str(pth),
        "--size", "384",
    ])
    assert result["n_images"] == 2
    assert max(result["delta"].values()) < 2e-3
