"""End-to-end smoke: tiny synthetic RGB-D train + val through the Runner,
on the 8-device CPU mesh (SURVEY.md §4(d,e))."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def tiny_cfg(tmp_path):
    return {
        "train_cfg": {"max_epochs": 1, "val_interval": 1},
        "input_size": 48,
        "model": {
            "type": "cod",
            "variant": "b0",
            "grid": 12,
            # 1-step/1-iter tiny tower: the loop/val/ckpt smoke paths are
            # model-size-agnostic and the heavy defaults cost ~60 s of
            # fixture setup on the 1-core box (round-4 verdict #7)
            "channel": 8,
            "latent_dim": 8,
            "diffusion_steps": 1,
            "refine_iters": 1,
            "convnext_dims": [8, 16, 32, 64],
            "convnext_depths": [1, 1, 1, 1],
        },
        "optim_wrapper": {
            "optimizer": {"type": "AdamW", "lr": 5e-4, "weight_decay": 0.1},
            "paramwise_cfg": {
                "custom_keys": {
                    "hitnet.backbone": {"lr_mult": 0.2},
                    "hitnet.backbone.prompt_encoder.encoder2.downsample_layers": {"lr_mult": 0.02},
                }
            },
        },
        "val_evaluator": [{"type": "Smeasure"}, {"type": "MAE"}],
        "default_hooks": {
            "logger": {"type": "LoggerHook", "interval": 1},
        },
        "work_dir": str(tmp_path),
    }


@pytest.fixture(scope="module")
def runner(tmp_path_factory):
    from dgtd_tpu.data.datasets import SyntheticSODDataset
    from dgtd_tpu.data.loader import DataLoader
    from dgtd_tpu.train.loop import Runner

    tmp = tmp_path_factory.mktemp("run")
    cfg = tiny_cfg(tmp)
    r = Runner(cfg, work_dir=str(tmp), dtype=jnp.float32)
    size = 48
    train_ds = SyntheticSODDataset(n=8, size=size)
    val_ds = SyntheticSODDataset(n=4, size=size)
    val_ds.train_mode = False
    r.train_loader = DataLoader(train_ds, batch_size=8, shuffle=True, sharding=r.data_sharding, drop_last=True)
    r.val_loader = DataLoader(val_ds, batch_size=2)
    r.batch_size = 8
    return r


@pytest.mark.slow
def test_train_epoch_decreases_loss(runner):
    from dgtd_tpu.train.hooks import Hook

    losses = []

    class Capture(Hook):
        priority = 99

        def after_train_iter(self, r, aux):
            losses.append(float(aux["loss"]))

    runner.hooks.append(Capture())
    runner.cfg["train_cfg"]["max_epochs"] = 6
    runner.max_epochs = 6
    runner.val_interval = 0
    runner.train()
    assert len(losses) == 6
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_val_runs_metrics(runner):
    results = runner.val()
    assert "COD/Smeasure" in results and "COD/MAE" in results
    assert 0.0 <= results["COD/MAE"] <= 1.0


def test_params_sharded_replicated(runner):
    leaf = jax.tree.leaves(runner.state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_checkpoint_roundtrip(runner, tmp_path):
    before = jax.tree.leaves(runner.state.params)[0].copy()
    path = runner.save_checkpoint("ckpt_test")
    # perturb then restore
    runner.state = runner.state.replace(
        params=jax.tree.map(lambda p: p + 1.0, runner.state.params)
    )
    runner.restore_checkpoint(path)
    after = jax.tree.leaves(runner.state.params)[0]
    np.testing.assert_allclose(np.asarray(before), np.asarray(after))


def test_checkpoint_npz_fallback_keeps_batch_stats(runner, monkeypatch):
    """The flat-npz fallback (no orbax) must round-trip BN running stats —
    restoring params-only silently serves init statistics."""
    from dgtd_tpu.train import loop as loop_mod

    stats_leaves = jax.tree.leaves(runner.state.batch_stats)
    assert stats_leaves, "smoke model should carry BN batch_stats"
    p0 = jax.tree.leaves(runner.state.params)[0].copy()
    s0 = stats_leaves[0].copy()

    monkeypatch.setattr(loop_mod, "_HAS_ORBAX", False)
    path = runner.save_checkpoint("ckpt_npz_test")
    assert path.endswith(".npz")
    runner.state = runner.state.replace(
        params=jax.tree.map(lambda p: p + 1.0, runner.state.params),
        batch_stats=jax.tree.map(lambda s: s + 2.0, runner.state.batch_stats),
    )
    runner.restore_checkpoint(path)
    np.testing.assert_allclose(np.asarray(jax.tree.leaves(runner.state.params)[0]), np.asarray(p0))
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(runner.state.batch_stats)[0]), np.asarray(s0)
    )


def test_restore_checkpoint_convert_full_layout(runner, tmp_path):
    """Review r5 (severe): `convert_ckpt full` writes BARE param keys +
    batch_stats/-prefixed — the layout docs/BENCHMARK.md passes as val_ckpt.
    Runner.restore_checkpoint's old 'params/'-prefix graft matched ZERO of
    them and logged success: the documented benchmark command silently
    scored random init. It must now load them (via load_flat_checkpoint)
    and refuse a checkpoint that matches nothing."""
    from dgtd_tpu.train.hooks import flatten_tree

    orig_p = jax.device_get(runner.state.params)
    orig_s = jax.device_get(runner.state.batch_stats)
    path = tmp_path / "full_layout.npz"
    np.savez(
        path,
        **{k: np.asarray(v) + 3.0 for k, v in flatten_tree(orig_p).items()},
        **flatten_tree({"batch_stats": orig_s}),
    )
    try:
        runner.restore_checkpoint(str(path))
        got = np.asarray(jax.tree.leaves(runner.state.params)[0])
        np.testing.assert_allclose(got, np.asarray(jax.tree.leaves(orig_p)[0]) + 3.0)
        # replicated placement restored (multi-chip hosts need it)
        assert jax.tree.leaves(runner.state.params)[0].sharding.is_fully_replicated
        # zero-match refusal: benchmarking random init must be impossible
        bad = tmp_path / "wrong_model.npz"
        np.savez(bad, **{"not/a/key": np.zeros((2,), np.float32)})
        with pytest.raises(ValueError, match="0 of 1 arrays"):
            runner.restore_checkpoint(str(bad))
    finally:
        runner.state = runner.state.replace(
            params=jax.device_put(orig_p, runner.repl_sharding),
            batch_stats=jax.device_put(orig_s, runner.repl_sharding),
        )


def test_resume_mid_epoch_skip_arithmetic(runner, monkeypatch):
    """Review r5: resuming a mid-epoch preemption checkpoint must skip the
    batches the interrupted epoch already trained (resume() records the
    count; the loop consumes it), or they train twice and step desyncs from
    epoch boundaries (the LR schedule derives its epoch from step//spe)."""
    import jax.numpy as jnp

    old = (runner.state, runner.epoch, runner.host_step, runner.train_loader.epoch)
    monkeypatch.setattr(runner, "restore_checkpoint", lambda p: None)
    try:
        runner.state = runner.state.replace(step=jnp.asarray(6, jnp.int32))
        runner.resume("fake", steps_per_epoch=4)
        assert runner.epoch == 1 and runner._resume_skip == 2
        assert runner.train_loader.epoch == 1  # the interrupted epoch's stream
        # epoch-boundary checkpoint: nothing to skip (prior behavior intact)
        runner.state = runner.state.replace(step=jnp.asarray(8, jnp.int32))
        runner.resume("fake", steps_per_epoch=4)
        assert runner.epoch == 2 and runner._resume_skip == 0
    finally:
        runner.state, runner.epoch, runner.host_step = old[0], old[1], old[2]
        runner.train_loader.epoch = old[3]
        runner._resume_skip = 0
        runner.resumed = False


@pytest.mark.slow
def test_mid_epoch_resume_trains_each_batch_once(tmp_path):
    """End-to-end pin of the skip: the batch sequence a resumed run trains
    equals exactly the tail the preempted run never saw. Fake train step
    (no compile) records per-batch fingerprints; loaders share seed/data."""
    from dgtd_tpu.data.datasets import SyntheticSODDataset
    from dgtd_tpu.data.loader import DataLoader
    from dgtd_tpu.train.loop import Runner

    def make(workdir, log):
        r = Runner(tiny_cfg(workdir), work_dir=str(workdir), seed=11, dtype=jnp.float32)
        # batch must divide the 8-device data mesh; 32/8 -> 4 steps/epoch
        ds = SyntheticSODDataset(n=32, size=48)
        r.train_loader = DataLoader(
            ds, batch_size=8, shuffle=True, seed=11,
            sharding=r.data_sharding, drop_last=True,
        )
        r.batch_size = 8
        r.val_interval = 0

        def fake_step(state, arrays, rng):
            log.append(round(float(np.asarray(arrays["input"]).sum()), 3))
            return state.replace(step=state.step + 1), {"loss": jnp.float32(0.0)}

        r._train_step = fake_step
        return r

    seen_a = []
    a = make(tmp_path / "a", seen_a)
    a.max_epochs = 2
    a.train()  # uninterrupted reference run: 2 epochs x 4 steps
    assert a.host_step == 8 and len(seen_a) == 8

    # preemption-shaped checkpoint: saved at step 6 (mid epoch 2)
    a.state = a.state.replace(step=jnp.asarray(6, jnp.int32))
    ckpt = a.save_checkpoint("preempt_step_6")

    seen_c = []
    c = make(tmp_path / "c", seen_c)
    c.resume(ckpt)
    assert c.epoch == 1 and c._resume_skip == 2
    c.max_epochs = 2
    c.train()
    # trains EXACTLY the tail the preempted run never saw — no double-trained
    # batches, and step realigns with the epoch boundary
    assert seen_c == seen_a[6:8], (seen_c, seen_a)
    assert c.host_step == 8 and int(c.state.step) == 8


def test_val_record_reaches_vis_backends(runner):
    """Review r5: Runner.log forwards only records with a 'step' key to the
    visualization backends — the val record must carry one or a TB/ClearML
    run charts train curves but never val metrics."""
    calls = []

    class FakeBackend:
        def add_scalars(self, scalars, step):
            calls.append((scalars, step))

    old = getattr(runner, "vis_backends", None)
    runner.vis_backends = [FakeBackend()]
    try:
        results = runner.val()
    finally:
        runner.vis_backends = old
    assert any("COD/Smeasure" in s for s, _ in calls), calls
    sm = [s["COD/Smeasure"] for s, _ in calls if "COD/Smeasure" in s]
    assert sm[0] == pytest.approx(results["COD/Smeasure"], abs=1e-4)


@pytest.mark.slow
def test_dqnet_variant_forward():
    from dgtd_tpu.models import DQnet

    m = DQnet(win_size=22, dtype=jnp.float32, variant="b0", cross_size=12)
    v = m.init(jax.random.PRNGKey(0), (1, 48, 48, 3))
    img = jnp.zeros((1, 48, 48, 3))
    dep = jnp.zeros((1, 48, 48, 1))
    prob, _ = m.predict(v, img, dep)
    assert prob.shape == (1, 48, 48, 1)
    batch = {"input": img, "depth": dep, "label": jnp.zeros((1, 48, 48, 1))}
    loss, (aux, _) = m.loss(v, batch, rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_training_is_deterministic(tmp_path_factory):
    """Same seed => identical first-step loss (RNG plumbing is pure)."""
    from dgtd_tpu.data.datasets import SyntheticSODDataset
    from dgtd_tpu.data.loader import DataLoader
    from dgtd_tpu.train.loop import Runner

    losses = []
    for run in range(2):
        tmp = tmp_path_factory.mktemp(f"det{run}")
        cfg = tiny_cfg(tmp)
        r = Runner(cfg, work_dir=str(tmp), seed=123, dtype=jnp.float32)
        ds = SyntheticSODDataset(n=8, size=48)
        r.train_loader = DataLoader(ds, batch_size=8, shuffle=True, seed=123, sharding=r.data_sharding, drop_last=True)
        r.batch_size = 8
        r.max_epochs = 1
        r.val_interval = 0
        captured = []
        from dgtd_tpu.train.hooks import Hook

        class Cap(Hook):
            priority = 99

            def after_train_iter(self, rr, aux):
                captured.append(float(aux["loss"]))

        r.hooks.append(Cap())
        r.train()
        losses.append(captured)
    assert losses[0] == losses[1], losses


def test_loader_shuffle_stream_continues_on_resume():
    """A resumed run must continue the per-epoch shuffle stream, not replay
    epoch-0 order: the loader's epoch counter seeds the shuffle rng and
    Runner.resume() fast-forwards it."""
    from dgtd_tpu.data.datasets import SyntheticSODDataset
    from dgtd_tpu.data.loader import DataLoader

    def epoch_order(loader):
        return list(loader._epoch_indices())

    ds = SyntheticSODDataset(n=16, size=8)
    a = DataLoader(ds, batch_size=4, shuffle=True, seed=7, device_put=False)
    orders = []
    for _ in range(3):  # epochs 0,1,2 of an uninterrupted run
        orders.append(epoch_order(a))
        a.epoch += 1

    b = DataLoader(ds, batch_size=4, shuffle=True, seed=7, device_put=False)
    b.epoch = 2  # what Runner.resume() does after restoring an epoch-2 ckpt
    assert epoch_order(b) == orders[2]
    assert orders[0] != orders[1] != orders[2]


@pytest.mark.slow
def test_baseline_dead_diffusion_params_stay_frozen():
    """PARITY delta 13 closed: ``baseline``'s constructed-but-never-called
    diffusion modules must stay BIT-IDENTICAL over train steps — torch DDP
    ``find_unused_parameters=True`` leaves their grads None so AdamW skips
    them (no update, no decay); optax would otherwise weight-decay their
    exact-zero-grad params every step."""
    from dgtd_tpu.core.registry import MODELS
    from dgtd_tpu.train.optim import build_optimizer
    from dgtd_tpu.train.state import TrainState, make_train_step

    model = MODELS.get("baseline")(
        dtype=jnp.float32,
        variant="b0",
        grid=8,
        channel=8,
        latent_dim=8,
        refine_iters=1,
        convnext_dims=(8, 16, 32, 64),
        convnext_depths=(1, 1, 1, 1),
    )
    assert model.frozen_param_prefixes == (
        "hitnet/prompt_encoder",
        "hitnet/prompt_decoder",
    )
    variables = model.init(jax.random.PRNGKey(0), (1, 32, 32, 3))
    tx = build_optimizer(
        variables["params"],
        steps_per_epoch=1,
        frozen_prefixes=model.frozen_param_prefixes,
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    step = make_train_step(model, tx)
    rng = np.random.RandomState(0)
    batch = {
        "input": jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32),
        "depth": jnp.asarray(rng.rand(2, 32, 32, 1), jnp.float32),
        "label": jnp.asarray((rng.rand(2, 32, 32, 1) > 0.5), jnp.float32),
    }
    init_frozen = jax.device_get(
        {
            k: v
            for k, v in variables["params"]["hitnet"].items()
            if k.startswith(("prompt_encoder", "prompt_decoder"))
        }
    )
    assert init_frozen, "baseline tree lost its dead diffusion params"
    # snapshot BEFORE stepping: state donation deletes the init buffers
    bb_before = np.array(jax.tree.leaves(variables["params"]["hitnet"]["backbone"])[0])
    for _ in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(1))
    after = jax.device_get(state.params["hitnet"])
    for mod, tree in init_frozen.items():
        for path, leaf in zip(
            jax.tree_util.tree_leaves_with_path(tree), jax.tree.leaves(after[mod])
        ):
            np.testing.assert_array_equal(
                np.asarray(path[1]), np.asarray(leaf),
                err_msg=f"{mod}{jax.tree_util.keystr(path[0])} drifted",
            )
    # and the LIVE params did train
    bb_after = np.asarray(jax.tree.leaves(after["backbone"])[0])
    assert not np.array_equal(bb_before, bb_after)


def test_pretrain_init_actually_grafts(runner, tmp_path):
    """our_init must load converted pretrain npz files (subtree-relative
    keys) into the backbone/tower subtrees. Review r3 found the original
    prefix addressing grafted ZERO leaves — the flagship recipe silently
    trained from random init; this drives the real hook on real trees."""
    from dgtd_tpu.train.hooks import flatten_tree, our_init

    backbone = runner.state.params["hitnet"]["backbone"]
    tower = runner.state.params["hitnet"]["prompt_encoder"]["encoder2"]
    bb_npz = tmp_path / "pvt.npz"
    cx_npz = tmp_path / "convnext.npz"
    np.savez(
        bb_npz,
        **{k: np.asarray(v) + 1.0 for k, v in flatten_tree(jax.device_get(backbone)).items()},
    )
    np.savez(
        cx_npz,
        **{k: np.asarray(v) + 2.0 for k, v in flatten_tree(jax.device_get(tower)).items()},
    )

    before_bb = np.asarray(jax.tree.leaves(backbone)[0]).copy()
    before_tw = np.asarray(jax.tree.leaves(tower)[0]).copy()
    h = our_init(backbone_ckpt=str(bb_npz), convnext_ckpt=str(cx_npz))
    runner.resumed = False
    h.before_train(runner)

    after_bb = np.asarray(jax.tree.leaves(runner.state.params["hitnet"]["backbone"])[0])
    after_tw = np.asarray(
        jax.tree.leaves(runner.state.params["hitnet"]["prompt_encoder"]["encoder2"])[0]
    )
    np.testing.assert_allclose(after_bb, before_bb + 1.0)
    np.testing.assert_allclose(after_tw, before_tw + 2.0)
    # untouched subtrees stay intact
    assert runner.state.params["hitnet"].get("translayer2_0") is not None
    # a wrong-kind checkpoint (zero matches) fails loudly
    wrong = tmp_path / "wrong.npz"
    np.savez(wrong, **{"not/a/real/key": np.zeros((2,), np.float32)})
    import pytest as _pytest

    with _pytest.raises(ValueError, match="0 of 1 pretrain arrays"):
        our_init(backbone_ckpt=str(wrong), convnext_ckpt=None).before_train(runner)


@pytest.mark.slow
def test_val_with_mesh_divisible_batch(runner):
    """Regression: a val batch that DIVIDES the 8-device data axis makes the
    eval step's in-jit sharding constraints reference every mesh device —
    with the old unsharded (device-0-committed) val loader this raised
    'incompatible devices' on the first batch. _build_loader must shard
    divisible val batches and replicate tails (here: 12 images, bs 8 ->
    one sharded batch + one replicated tail)."""
    from dgtd_tpu.data.datasets import SyntheticSODDataset
    from dgtd_tpu.core.registry import DATASETS

    class _ValShardFixture(SyntheticSODDataset):
        train_mode = False

    try:
        DATASETS.register(_ValShardFixture)
    except Exception:
        pass  # already registered by a prior parametrization
    old = runner.val_loader
    runner.val_loader = runner._build_loader(
        {"dataset": {"type": "_ValShardFixture", "n": 12, "size": 48}, "batch_size": 8},
        train=False,
    )
    try:
        results = runner.val()
    finally:
        runner.val_loader = old
    assert "COD/Smeasure" in results and np.isfinite(results["COD/MAE"])


@pytest.mark.slow
def test_elastic_resume_across_topologies(tmp_path):
    """Fault-tolerance: a checkpoint written on the 8x1 pure-DP mesh resumes
    on a 4x2 data-x-space mesh (state is replicated, so resume is
    topology-agnostic by construction — this pins it). The reference has no
    elastic story at all (static torchrun world, SURVEY.md §5)."""
    from dgtd_tpu.data.datasets import SyntheticSODDataset
    from dgtd_tpu.data.loader import DataLoader
    from dgtd_tpu.parallel.mesh import make_mesh
    from dgtd_tpu.train.loop import Runner

    def build(workdir, mesh):
        r = Runner(tiny_cfg(workdir), work_dir=str(workdir), mesh=mesh, dtype=jnp.float32)
        train_ds = SyntheticSODDataset(n=8, size=48)
        r.train_loader = DataLoader(
            train_ds, batch_size=8, shuffle=True, sharding=r.data_sharding, drop_last=True
        )
        r.val_loader = None
        r.batch_size = 8
        return r

    r1 = build(tmp_path / "a", make_mesh(data=8, space=1))
    r1.train()
    assert r1.host_step == 1
    path = r1.save_checkpoint("epoch_1")
    p0 = jax.device_get(r1.state.params)

    r2 = build(tmp_path / "b", make_mesh(data=4, space=2))
    r2.resume(path)
    assert r2.host_step == 1 and r2.epoch == 1
    # restored params are bit-identical to what the 8x1 run saved
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        p0,
        jax.device_get(r2.state.params),
    )
    r2.max_epochs = 2
    r2.train()  # one more step on the NEW topology
    assert r2.host_step == 2 and int(r2.state.step) == 2
