"""WindowFusion + layer-decay + registry surface tests."""

import numpy as np

import jax
import jax.numpy as jnp

from dgtd_tpu.core.registry import DATASETS, HOOKS, METRICS, MODELS
from dgtd_tpu.models import NewWindowFusion, WindowFusion, window_partition, window_reverse
from dgtd_tpu.train.layer_decay import layer_decay_custom_keys


def test_window_partition_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 20, 20, 8), jnp.float32)
    w = window_partition(x, 10)
    assert w.shape == (2 * 4, 10, 10, 8)
    back = window_reverse(w, 10, 20, 20)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_window_fusion_shapes():
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 12, 12, 16))
    y = jnp.ones((1, 12, 12, 16))
    m = WindowFusion(window=10, num_heads=4)
    v = m.init(rng, x, y)
    out, gate = m.apply(v, x, y)
    assert out.shape == x.shape and gate.shape == x.shape
    m2 = NewWindowFusion(num_heads=4)
    v2 = m2.init(rng, x, y)
    out2 = m2.apply(v2, x, y)
    assert out2.shape == x.shape


def test_layer_decay_keys():
    keys = layer_decay_custom_keys("b2", 0.9)
    # b2: 16 blocks + 1 -> 17 layers; first block mult 0.9^16, last block 0.9^1
    assert np.isclose(keys["hitnet/backbone/block1_0"], 0.9**16)
    assert np.isclose(keys["hitnet/backbone/block4_2"], 0.9**1)
    assert np.isclose(keys["hitnet/backbone/patch_embed1"], 0.9**17)


def test_registry_surface_matches_reference():
    """Every reference registry name resolves (SURVEY.md §2 inventory)."""
    for name in ["cod", "baseline", "DQnet"]:
        assert name in MODELS
    for name in [
        "COD10K_CAMO_TRAIN", "COD10K_TEST", "COD_TEST", "CHAMELEON",
        "NC4K", "SOD_TRAIN", "SOD_TEST",
    ]:
        assert name in DATASETS
    for name in ["Emeasure", "Fmeasure", "Smeasure", "MAE", "WeightedFmeasure", "meanIntersectionOverUnion"]:
        assert name in METRICS
    for name in ["our_init", "baseline_init", "PretrainInitHook", "LoggerHook", "CheckpointHook"]:
        assert name in HOOKS


def test_folder_dataset_pipelines(tmp_path):
    """PIL and native pipelines both produce the contract dict; fixture on disk."""
    import os
    from PIL import Image
    import numpy as _np

    root = tmp_path / "ds"
    for sub in ("Imgs", "GT", "Depth"):
        os.makedirs(root / sub)
    rng = _np.random.RandomState(0)
    for i in range(3):
        Image.fromarray((rng.rand(60, 80, 3) * 255).astype("uint8")).save(root / "Imgs" / f"x{i}.jpg")
        Image.fromarray((rng.rand(60, 80) * 255).astype("uint8")).save(root / "GT" / f"x{i}.png")
        Image.fromarray((rng.rand(60, 80) * 255).astype("uint8")).save(root / "Depth" / f"x{i}.png")

    from dgtd_tpu.data.datasets import COD10K_CAMO_TRAIN

    for pipeline in ("pil", "native"):
        ds = COD10K_CAMO_TRAIN(str(root), "Depth", "train", image_size=64, pipeline=pipeline)
        assert len(ds) == 3
        item = ds.get(0, _np.random.default_rng(0))
        assert item["input"].shape == (64, 64, 3)
        assert item["label"].shape == (64, 64, 1)
        assert item["depth"].shape == (64, 64, 1)
        assert item["input"].dtype == _np.float32
        # flip pairing: same rng state flips all planes together
        a = ds.get(1, _np.random.default_rng(12345))
        b = ds.get(1, _np.random.default_rng(12345))
        _np.testing.assert_allclose(a["input"], b["input"])
        _np.testing.assert_allclose(a["depth"], b["depth"])

    # raw flips in LOCKSTEP with input (review r5: the reference's train
    # raw_transform includes RandomHorizontalFlip under the same re-seeded
    # rng, cod10k_camo_train.py:47-50 — raw used to stay unflipped here,
    # mirror-mispairing raw against input/label on every flipped sample)
    class _AlwaysFlip:
        def random(self):
            return 0.0  # < 0.5 -> flip

    class _NeverFlip:
        def random(self):
            return 1.0

    for pipeline in ("pil", "native"):
        for uint8_io in (False, True):
            ds = COD10K_CAMO_TRAIN(
                str(root), "Depth", "train", image_size=64,
                pipeline=pipeline, uint8_io=uint8_io,
            )
            flipped = ds.get(0, _AlwaysFlip())
            plain = ds.get(0, _NeverFlip())
            _np.testing.assert_allclose(
                _np.asarray(flipped["raw"]),
                _np.asarray(plain["raw"])[:, ::-1],
                err_msg=f"raw not flipped in lockstep ({pipeline}, u8={uint8_io})",
            )
            _np.testing.assert_allclose(
                _np.asarray(flipped["input"]), _np.asarray(plain["input"])[:, ::-1]
            )
"""Hook semantics: LoggerHook.ignore_last + CheckpointHook.max_keep."""

import os

from dgtd_tpu.train.hooks import CheckpointHook, LoggerHook


class _PoisonStep:
    """Stand-in for the on-device step scalar: converting it host-side from a
    per-iteration hook would block the async dispatch pipeline (measured 56
    vs 78 img/s through the remote-TPU tunnel), so hooks must read
    ``runner.host_step`` instead. This raises if any hook regresses."""

    def __int__(self):
        raise AssertionError("hook read device state.step (pipeline sync)")

    __index__ = __float__ = __int__


class _FakeRunner:
    def __init__(self, tmp):
        self.batch_size = 2
        self.epoch = 0
        self.work_dir = tmp
        self.records = []
        self.host_step = 0

    @property
    def _step(self):
        return self.host_step

    @_step.setter
    def _step(self, v):
        self.host_step = v

    @property
    def state(self):
        class S:
            step = _PoisonStep()
        return S

    def log(self, rec):
        self.records.append(rec)

    def save_checkpoint(self, name):
        path = os.path.join(self.work_dir, name + ".npz")
        with open(path, "wb") as f:
            f.write(b"x")
        return path


def test_logger_ignore_last(tmp_path):
    r = _FakeRunner(str(tmp_path))
    h = LoggerHook(interval=3, ignore_last=False)
    h.before_train(r)
    for step in range(1, 8):  # epoch of 7 iters: logs at 3, 6, then final 7
        r._step = step
        h.after_train_iter(r, {"loss": 1.0})
    h.after_train_epoch(r)
    assert [rec["step"] for rec in r.records] == [3, 6, 7]

    r2 = _FakeRunner(str(tmp_path))
    h2 = LoggerHook(interval=3, ignore_last=True)
    h2.before_train(r2)
    for step in range(1, 8):
        r2._step = step
        h2.after_train_iter(r2, {"loss": 1.0})
    h2.after_train_epoch(r2)
    assert [rec["step"] for rec in r2.records] == [3, 6]


def test_logger_window_resets_each_epoch(tmp_path):
    """Review r5: the imgs_per_sec window must reset at epoch start — the
    gap between epochs holds a checkpoint save and possibly a full val run,
    and folding that pause into the next interval's rate reports a false
    slowdown every val_interval epochs."""
    import time as _t

    r = _FakeRunner(str(tmp_path))
    h = LoggerHook(interval=2)
    h.before_train(r)
    h._t0 -= 500.0  # fake a 500-s inter-epoch pause (val + checkpoint)
    h.before_train_epoch(r)
    t_epoch_start = _t.time()
    r._step = 2
    h.after_train_iter(r, {"loss": 1.0})
    (rec,) = r.records
    # the window began at before_train_epoch, not 500 s ago
    window = _t.time() - t_epoch_start + 1e-9
    assert rec["imgs_per_sec"] >= 0.5 * (2 * r.batch_size) / (window + 1.0)


def test_clip_grad_config_forms(monkeypatch):
    """Review r5: the MMEngine {max_norm: X} clip form was silently ignored
    (training ran unclipped with no signal). Both forms must plumb through;
    an unrecognized clip_grad block must fail loudly."""
    import optax
    import pytest

    from dgtd_tpu.train import optim as O

    params = {"w": jnp.ones((4,), jnp.float32)}
    seen = {}
    orig_norm, orig_clip = optax.clip_by_global_norm, optax.clip

    def spy_norm(n):
        seen["max_norm"] = n
        return orig_norm(n)

    def spy_clip(v):
        seen["clip_value"] = v
        return orig_clip(v)

    monkeypatch.setattr(optax, "clip_by_global_norm", spy_norm)
    monkeypatch.setattr(optax, "clip", spy_clip)
    base = {"optimizer": {"type": "AdamW", "lr": 1e-3}}
    O.build_from_config(params, {**base, "clip_grad": {"max_norm": 0.5}},
                        max_epochs=1, steps_per_epoch=1)
    assert seen.get("max_norm") == 0.5
    O.build_from_config(
        params, {**base, "clip_grad": {"type": "value", "clip_value": 0.25}},
        max_epochs=1, steps_per_epoch=1)
    assert seen.get("clip_value") == 0.25
    with pytest.raises(ValueError, match="clip_value or max_norm"):
        O.build_from_config(params, {**base, "clip_grad": {"norm": 1.0}},
                            max_epochs=1, steps_per_epoch=1)


def test_custom_keys_zero_match_fails_loudly():
    """Review r5: a recipe lr_mult key matching no param path is a silent
    wrong-LR run (typo or uncovered reference nesting) — must raise. The
    hitnet.backbone prompt-module expansion keys are implicit and exempt
    (model variants may lack those nodes)."""
    import pytest

    from dgtd_tpu.train.optim import build_from_config

    params = {"hitnet": {"backbone": {"w": jnp.ones((2,), jnp.float32)}}}
    base = {"optimizer": {"type": "AdamW", "lr": 1e-3}}

    # valid key + the implicit expansion (prompt_* absent here) builds fine
    build_from_config(
        params,
        {**base, "paramwise_cfg": {"custom_keys": {
            "hitnet.backbone": {"lr_mult": 0.2}}}},
        max_epochs=1, steps_per_epoch=1,
    )
    with pytest.raises(ValueError, match="hitnet/bogus_module"):
        build_from_config(
            params,
            {**base, "paramwise_cfg": {"custom_keys": {
                "hitnet.bogus_module": {"lr_mult": 0.1}}}},
            max_epochs=1, steps_per_epoch=1,
        )


def test_checkpoint_max_keep(tmp_path):
    r = _FakeRunner(str(tmp_path))
    h = CheckpointHook(interval=1, max_keep=2)
    for epoch in range(1, 5):
        r.epoch = epoch
        h.after_train_epoch(r)
    kept = sorted(f for f in os.listdir(tmp_path) if f.startswith("epoch_"))
    assert kept == ["epoch_3.npz", "epoch_4.npz"], kept


def test_pretrain_init_skips_on_resume(tmp_path):
    """--resume restores a full checkpoint; our_init.before_train must NOT
    re-graft the ImageNet pretrains over the fine-tuned backbone (review
    finding: real recipes would silently lose epochs of training)."""
    from dgtd_tpu.train.hooks import our_init

    calls = []
    h = our_init(backbone_ckpt=str(tmp_path / "pvt.npz"))
    h._load = lambda runner, path, subtree: calls.append(subtree)

    class R:
        resumed = True
        records = []

        def log(self, rec):
            self.records.append(rec)

    r = R()
    h.before_train(r)
    assert calls == []
    assert any("skip_pretrains" in rec for rec in r.records)

    r2 = R()
    r2.resumed = False
    h.before_train(r2)
    assert calls and calls[0] == "hitnet/backbone"


def test_pretrain_init_dqnet_subtree(tmp_path):
    """PretrainInitHook must graft into DQnet's TOP-LEVEL 'backbone' node
    (DQnetNet has no 'hitnet' wrapper) — advisor r2 found the inherited
    cod-shaped subtree raised KeyError, breaking DQnet pretrained init.
    A cod-shaped hook on a DQnet tree must fail with a descriptive error."""
    import numpy as _np
    import pytest
    from dgtd_tpu.parallel.mesh import make_mesh, replicated
    from dgtd_tpu.train.hooks import PretrainInitHook, flatten_tree, our_init

    dqnet_params = {
        "backbone": {"w": jnp.zeros((3,), jnp.float32)},
        "head": {"w": jnp.zeros((2,), jnp.float32)},
    }
    npz = tmp_path / "pvt.npz"
    _np.savez(npz, **{k: _np.asarray(v) + 1.0 for k, v in flatten_tree(jax.device_get(dqnet_params["backbone"])).items()})

    class State:
        def __init__(self, params):
            self.params = params

        def replace(self, params):
            return State(params)

    class R:
        resumed = False
        records = []
        mesh = make_mesh(data=1, space=1, devices=jax.devices()[:1])
        repl_sharding = replicated(mesh)

        def __init__(self):
            self.state = State(dqnet_params)

        def log(self, rec):
            self.records.append(rec)

    r = R()
    PretrainInitHook(backbone_ckpt=str(npz)).before_train(r)
    _np.testing.assert_allclose(_np.asarray(r.state.params["backbone"]["w"]), 1.0)
    _np.testing.assert_allclose(_np.asarray(r.state.params["head"]["w"]), 0.0)

    # cod-shaped our_init on the DQnet tree: descriptive error, not KeyError
    r2 = R()
    with pytest.raises(ValueError, match="no node 'hitnet'"):
        our_init(backbone_ckpt=str(npz), convnext_ckpt=None).before_train(r2)


def test_profiler_hook_fires_on_resume(tmp_path, monkeypatch):
    """A resumed run whose restored step already passed start_step must still
    trace the next num_steps (advisor r2: == comparison silently never fired)."""
    from dgtd_tpu.train.hooks import ProfilerHook

    events = []
    monkeypatch.setattr(jax.profiler, "start_trace", lambda out: events.append(("start", out)))
    monkeypatch.setattr(jax.profiler, "stop_trace", lambda: events.append(("stop",)))

    class S:
        params = jnp.zeros((1,))

    class R:
        work_dir = str(tmp_path)
        state = S()
        records = []

        def log(self, rec):
            self.records.append(rec)

    r = R()
    h = ProfilerHook(start_step=10, num_steps=2)
    for step in range(50, 56):  # resumed far past start_step
        r.host_step = step
        h.after_train_iter(r, {})
    assert [e[0] for e in events] == ["start", "stop"]
    assert any("profile_started_late" in rec for rec in r.records)
    # one-shot: no second trace later
    for step in range(56, 60):
        r.host_step = step
        h.after_train_iter(r, {})
    assert [e[0] for e in events] == ["start", "stop"]


def test_profiler_hook_stops_trace_when_run_ends_in_window(tmp_path, monkeypatch):
    """A run that ends (max_epochs reached, or preempted) INSIDE the trace
    window must stop_trace from after_train — otherwise the profile dir is
    left truncated and a later start_trace raises 'already started'."""
    from dgtd_tpu.train.hooks import ProfilerHook

    events = []
    monkeypatch.setattr(jax.profiler, "start_trace", lambda out: events.append(("start", out)))
    monkeypatch.setattr(jax.profiler, "stop_trace", lambda: events.append(("stop",)))

    class S:
        params = jnp.zeros((1,))

    class R:
        work_dir = str(tmp_path)
        state = S()
        records = []

        def log(self, rec):
            self.records.append(rec)

    r = R()
    h = ProfilerHook(start_step=3, num_steps=10)
    for step in range(1, 5):  # run ends at step 4, window open until 13
        r.host_step = step
        h.after_train_iter(r, {})
    assert [e[0] for e in events] == ["start"]
    h.after_train(r)
    assert [e[0] for e in events] == ["start", "stop"]
    assert any(rec.get("truncated") for rec in r.records)
    h.after_train(r)  # idempotent
    assert [e[0] for e in events] == ["start", "stop"]
    # the real loop dispatches after_train even on the preemption return
    import inspect

    from dgtd_tpu.train.loop import Runner

    src = inspect.getsource(Runner._train_body)
    assert "finally" in src and "after_train(self)" in src


def test_stochastic_round_bf16_unbiased_and_exact():
    """The bf16 optimizer-state quantizer: exact on representable values,
    unbiased in expectation between them (nearest-rounding would freeze the
    b2=0.999 v-EMA whose increments sit below bf16 resolution)."""
    from dgtd_tpu.train.optim import stochastic_round_bf16

    # representable values round to themselves under every key
    x = jnp.asarray([1.0, -2.5, 0.0, 3.0e-12, -1.0e20], jnp.bfloat16).astype(jnp.float32)
    for seed in range(3):
        got = stochastic_round_bf16(x, jax.random.PRNGKey(seed))
        np.testing.assert_array_equal(np.asarray(got, np.float32), np.asarray(x))
    # non-finite values pass through: the +rnd carry could otherwise walk an
    # all-ones NaN word into -0.0, silently hiding training divergence
    bad = jnp.asarray([np.nan, np.inf, -np.inf, 1.0], jnp.float32)
    # an all-ones-mantissa NaN is the worst case for carry propagation
    worst_nan = jax.lax.bitcast_convert_type(jnp.uint32(0x7FFFFFFF), jnp.float32)
    bad = jnp.concatenate([bad, worst_nan[None]])
    for seed in range(4):
        got = np.asarray(stochastic_round_bf16(bad, jax.random.PRNGKey(seed)), np.float32)
        assert np.isnan(got[0]) and np.isnan(got[4]), got
        assert got[1] == np.inf and got[2] == -np.inf and got[3] == 1.0, got
    # a value strictly between two bf16 neighbors averages to itself
    lo = np.float32(np.asarray(jnp.asarray(1.0, jnp.bfloat16), np.float32))
    hi = np.float32(np.asarray(jnp.nextafter(jnp.asarray(1.0, jnp.bfloat16), jnp.asarray(2.0, jnp.bfloat16)), np.float32))
    mid = np.float32(lo + 0.25 * (hi - lo))
    xs = jnp.full((20000,), mid, jnp.float32)
    r = np.asarray(stochastic_round_bf16(xs, jax.random.PRNGKey(7)), np.float32)
    assert set(np.unique(r)) <= {lo, hi}
    p_hi = float((r == hi).mean())
    assert abs(p_hi - 0.25) < 0.02, p_hi  # unbiased: E[round(x)] == x
    # EMA freeze regression: 0.999-EMA of a constant must climb, not stick
    from dgtd_tpu.train.optim import scale_by_adam_bf16

    tx = scale_by_adam_bf16(b1=0.9, b2=0.999)
    params = {"w": jnp.zeros((256,), jnp.float32)}
    state = tx.init(params)
    g = {"w": jnp.full((256,), 0.1, jnp.float32)}
    for _ in range(200):
        _, state = tx.update(g, state, params)
    v = float(np.mean(np.asarray(state.nu["w"], np.float32)))
    expect = 0.1 * 0.1 * (1 - 0.999**200)  # true EMA of g^2
    assert abs(v - expect) / expect < 0.05, (v, expect)


def test_bf16_adam_matches_fp32_adam_updates():
    """scale_by_adam_bf16's UPDATE math equals optax.scale_by_adam to bf16
    state precision (same bias correction, eps placement)."""
    import optax
    from dgtd_tpu.train.optim import scale_by_adam_bf16

    rng = np.random.RandomState(0)
    params = {"a": jnp.asarray(rng.randn(32), jnp.float32)}
    ref = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    ours = scale_by_adam_bf16(b1=0.9, b2=0.999, eps=1e-8)
    s_ref, s_ours = ref.init(params), ours.init(params)
    for i in range(5):
        g = {"a": jnp.asarray(rng.randn(32) * 0.01, jnp.float32)}
        u_ref, s_ref = ref.update(g, s_ref, params)
        u_ours, s_ours = ours.update(g, s_ours, params)
        # tolerance = accumulated bf16 state noise (~2^-8 relative per step,
        # amplified through 1/sqrt(v); near-zero updates need the atol), NOT
        # math divergence — updates here are O(1) scale
        np.testing.assert_allclose(
            np.asarray(u_ours["a"]), np.asarray(u_ref["a"]), rtol=5e-2, atol=2e-3
        )


def test_dataset_rejects_partial_depth_dir(tmp_path):
    """Sorted-order depth pairing is only valid 1:1 — a partial depth dir
    must fail loudly, not silently misalign after size filtering."""
    import pytest
    from PIL import Image
    import numpy as _np

    root = tmp_path / "ds"
    for sub in ("Imgs", "GT", "Depth"):
        os.makedirs(root / sub)
    rng = _np.random.RandomState(0)
    for i in range(3):
        Image.fromarray((rng.rand(20, 20, 3) * 255).astype("uint8")).save(root / "Imgs" / f"x{i}.jpg")
        Image.fromarray((rng.rand(20, 20) * 255).astype("uint8")).save(root / "GT" / f"x{i}.png")
    # only 2 of 3 depth maps
    for i in range(2):
        Image.fromarray((rng.rand(20, 20) * 255).astype("uint8")).save(root / "Depth" / f"x{i}.png")

    from dgtd_tpu.data.datasets import COD10K_CAMO_TRAIN

    with pytest.raises(ValueError, match="pair 1:1"):
        COD10K_CAMO_TRAIN(str(root), "Depth", "train", image_size=16)


def test_loader_propagates_producer_errors():
    """A failed batch must raise in the consumer, not silently truncate the
    epoch (short training / wrong metrics with no error)."""
    import pytest
    from dgtd_tpu.data.loader import DataLoader

    class Bad:
        train_mode = False

        def __len__(self):
            return 6

        def get(self, i, rng=None):
            if i == 4:
                raise OSError("corrupt image")
            import numpy as _np

            return {"input": _np.zeros((4, 4, 3), _np.float32)}

    dl = DataLoader(Bad(), batch_size=2, device_put=False, prefetch=2)
    with pytest.raises(OSError, match="corrupt image"):
        list(dl)


def test_loader_tail_batch_falls_back_to_replicated():
    """drop_last=False epochs end in a tail batch that may not divide the
    mesh's data axis; the loader must place it REPLICATED on the same mesh
    (not crash device_put, not commit to device 0 — jitted eval steps traced
    under active_mesh carry mesh-wide constraints)."""
    import jax
    from jax.sharding import PartitionSpec as P

    from dgtd_tpu.data.loader import DataLoader, _divisible
    from dgtd_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh(data=8, space=1)
    sharding = batch_sharding(mesh)

    class DS:
        def __len__(self):
            return 12

        def get(self, i, rng=None):
            return {"input": np.full((4, 4, 3), i, np.float32), "raw": f"r{i}"}

    dl = DataLoader(DS(), batch_size=8, sharding=sharding, prefetch=0)
    batches = list(dl)
    assert [b["input"].shape[0] for b in batches] == [8, 4]
    assert batches[0]["input"].sharding.spec == P("data")  # full batch: sharded
    tail = batches[1]["input"].sharding
    assert tail.is_fully_replicated and tail.mesh.shape == mesh.shape
    assert batches[0]["raw"] == [f"r{i}" for i in range(8)]  # host-side passthrough
    # the helper itself
    assert _divisible(sharding, (8, 4, 4, 3)) and not _divisible(sharding, (4, 4, 4, 3))


def test_local_row_slices_multihost_split():
    """Multi-host data loading: each process decodes ONLY the global-batch
    rows its devices own (DistributedSampler parity, derived from the
    sharding itself). Simulated with a fake addressability predicate."""
    from dgtd_tpu.data.loader import _batch_axis_size, _dim0_only, local_row_slices
    from dgtd_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh(data=8, space=1)
    s = batch_sharding(mesh)
    assert _dim0_only(s) and _batch_axis_size(s) == 8

    # pretend devices 0-3 belong to "this process": it must own rows 0-7 of 16
    rows, dev_slices = local_row_slices(s, 16, addressable=lambda d: d.id < 4)
    assert rows == list(range(8))
    assert sorted((sl.start, sl.stop) for sl in dev_slices.values()) == [
        (0, 2), (2, 4), (4, 6), (6, 8),
    ]
    # the other "process"
    rows2, _ = local_row_slices(s, 16, addressable=lambda d: d.id >= 4)
    assert rows2 == list(range(8, 16))
    # replicated spec: every process needs every row
    from dgtd_tpu.parallel.mesh import replicated

    rows3, dev3 = local_row_slices(replicated(mesh), 16, addressable=lambda d: d.id < 4)
    assert rows3 == list(range(16)) and all(
        (sl.start, sl.stop) == (0, 16) for sl in dev3.values()
    )
    # 2-D data x space spec is NOT dim0-only (fetch restriction must not fire)
    assert not _dim0_only(batch_sharding(make_mesh(data=4, space=2)))


def test_assemble_global_matches_device_put():
    """_assemble_global stitches per-device shards into the same global array
    jax.device_put would produce — including through a permuted row_of map
    (the multi-host local-fetch indirection)."""
    import jax
    from dgtd_tpu.data.loader import _assemble_global
    from dgtd_tpu.parallel.mesh import batch_sharding, make_mesh, replicated

    mesh = make_mesh(data=8, space=1)
    v = np.arange(16 * 3 * 2, dtype=np.float32).reshape(16, 3, 2)
    for s in (batch_sharding(mesh), replicated(mesh)):
        want = jax.device_put(v, s)
        got = _assemble_global(v, v.shape, s, {g: g for g in range(16)})
        assert got.sharding == s and np.array_equal(np.asarray(got), v)
        assert got.shape == want.shape
    # permuted storage: row_of maps global row -> its position in v
    perm = np.random.RandomState(0).permutation(16)
    row_of = {int(g): i for i, g in enumerate(perm)}
    got = _assemble_global(v[perm], v.shape, batch_sharding(mesh), row_of)
    # v[perm] stored, row_of says global row g sits at position i where perm[i]=g
    assert np.array_equal(np.asarray(got), v)


def test_loader_multiprocess_branch_assembles(monkeypatch):
    """With process_count patched >1 the loader routes every placement
    through explicit shard assembly (multi-process device_put to a global
    sharding is version-fragile); output must equal the single-process path
    for both dividing and tail batches."""
    import jax
    from jax.sharding import PartitionSpec as P

    from dgtd_tpu.data.loader import DataLoader
    from dgtd_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh(data=8, space=1)

    class DS:
        def __len__(self):
            return 12

        def get(self, i, rng=None):
            return {"input": np.full((4, 3), i, np.float32)}

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    dl = DataLoader(DS(), batch_size=8, sharding=batch_sharding(mesh), prefetch=0)
    batches = list(dl)
    assert batches[0]["input"].sharding.spec == P("data")
    assert batches[1]["input"].sharding.is_fully_replicated
    assert np.array_equal(
        np.asarray(batches[0]["input"])[:, 0, 0], np.arange(8, dtype=np.float32)
    )
    assert np.array_equal(
        np.asarray(batches[1]["input"])[:, 0, 0], np.arange(8, 12, dtype=np.float32)
    )


def test_loader_prefetch_producer_exits_on_abandoned_epoch():
    """Review r5: abandoning a prefetching epoch mid-iteration (train-step
    exception, preemption early-return, break) used to leave the producer
    thread blocked in q.put forever, pinning prefetch+1 device_put batches.
    The generator's finally must release it."""
    import threading
    import time as _t

    from dgtd_tpu.data.datasets import SyntheticSODDataset
    from dgtd_tpu.data.loader import DataLoader

    ds = SyntheticSODDataset(n=32, size=8)
    loader = DataLoader(ds, batch_size=2, device_put=False, prefetch=2)
    it = iter(loader)
    next(it)  # producer running, queue filling
    it.close()  # abandon mid-epoch -> GeneratorExit -> finally
    deadline = _t.time() + 5.0
    while _t.time() < deadline:
        alive = [t for t in threading.enumerate()
                 if t.name == "dgtd-prefetch" and t.is_alive()]
        if not alive:
            break
        _t.sleep(0.05)
    assert not alive, "prefetch producer still alive after iterator close"

    # normal exhaustion still yields every batch exactly once
    batches = list(iter(loader))
    assert len(batches) == len(loader)


def test_loader_indivisible_train_batch_fails_loudly():
    """drop_last (train) loaders have no tails — an indivisible batch size is
    a misconfiguration that must raise, not silently replicate every batch
    (which would disable data parallelism for the whole run)."""
    import pytest

    from dgtd_tpu.data.loader import DataLoader
    from dgtd_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh(data=8, space=1)

    class DS:
        def __len__(self):
            return 12

        def get(self, i, rng=None):
            return {"input": np.zeros((4, 3), np.float32)}

    dl = DataLoader(
        DS(), batch_size=6, sharding=batch_sharding(mesh), drop_last=True, prefetch=0
    )
    with pytest.raises(ValueError, match="does not divide the mesh sharding"):
        list(dl)


def test_pvt_conv_init_divides_fan_out_by_groups():
    """Reference _init_weights (cod.py:1410-1412): fan_out = k*k*out//groups.
    A depthwise conv must init at std sqrt(2/k²), NOT sqrt(2/(k²C)) — the
    missing division shrank depthwise init 32x at C=1024."""
    from dgtd_tpu.models.layers import make_pvt_conv_kernel_init

    k = jax.random.PRNGKey(0)
    C = 256
    dw = make_pvt_conv_kernel_init(groups=C)(k, (7, 7, 1, C))  # depthwise
    expect = np.sqrt(2.0 / (7 * 7 * C / C))
    assert abs(float(dw.std()) - expect) / expect < 0.05
    dense = make_pvt_conv_kernel_init(1)(k, (3, 3, 8, C))
    expect = np.sqrt(2.0 / (3 * 3 * C))
    assert abs(float(dense.std()) - expect) / expect < 0.05


def test_cod_rejects_ssim_with_grid_fft():
    """use_ssim + fft_at_grid would crash at trace time with an opaque
    broadcast error (grid-sized texture vs full-res input in the SSIM
    term); the model must reject the combination loudly at construction."""
    import pytest

    from dgtd_tpu.models import cod

    with pytest.raises(ValueError, match="incompatible with fft_at_grid"):
        cod(dtype=jnp.float32, fft_at_grid=True)
    # baseline's combination (fft_at_grid, no ssim) stays constructible
    from dgtd_tpu.models.cod import baseline

    b = baseline(dtype=jnp.float32)
    assert b.net.fft_at_grid and not b.use_ssim
    # DQnet inherits frozen_param_prefixes without prompt fields: must be ()
    from dgtd_tpu.core.registry import MODELS

    assert MODELS.get("DQnet")(dtype=jnp.float32).frozen_param_prefixes == ()
