"""Runner: config-driven train/val loops (the L1 runtime layer).

Replaces the reference's NEST+MMEngine Runner (SURVEY.md §1 L1): builds every
component from the same YAML schema (config/cod.yml), runs the epoch-based
train loop with per-epoch cosine LR, interval logging/checkpointing, the val
loop with streaming SOD metrics, and hook dispatch — as plain JAX: one jitted
SPMD train step over a device mesh, orbax checkpoints, JSONL logs.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.registry import DATASETS, HOOKS, METRICS, MODELS
from ..data.loader import DataLoader
from ..parallel.mesh import active_mesh, batch_sharding, make_mesh, replicated
from . import optim as optim_lib
from .state import TrainState, make_eval_step, make_train_step

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


class Runner:
    def __init__(
        self,
        cfg: dict,
        work_dir: str = "./output/run",
        seed: int = 0,
        mesh=None,
        dtype=jnp.bfloat16,
        mode: str = "train",
    ):
        self.cfg = cfg
        self.work_dir = work_dir
        os.makedirs(work_dir, exist_ok=True)
        self._log_file = open(os.path.join(work_dir, "log.jsonl"), "a")
        self.seed = seed
        self.mesh = mesh if mesh is not None else make_mesh()
        self.data_sharding = batch_sharding(self.mesh)
        self.repl_sharding = replicated(self.mesh)

        model_cfg = dict(cfg["model"])
        self.model = MODELS.build(model_cfg, dtype=dtype)

        tc = cfg.get("train_cfg", {})
        self.max_epochs = int(tc.get("max_epochs", 1))
        self.val_interval = int(tc.get("val_interval", self.max_epochs))
        self.epoch = 0

        # datasets / loaders (val-only runs don't need the train dataset)
        self.train_loader = (
            self._build_loader(cfg.get("train_dataloader"), train=True)
            if mode == "train"
            else None
        )
        self.val_loader = self._build_loader(cfg.get("val_dataloader"), train=False)
        self.batch_size = (cfg.get("train_dataloader") or {}).get("batch_size", 1)

        # model/optimizer state
        rng = jax.random.PRNGKey(seed)
        active_loader = self.train_loader or self.val_loader
        image_size = getattr(active_loader.dataset, "size", 384) if active_loader else 384
        image_size = int(cfg.get("input_size", image_size))
        self.image_size = image_size
        steps_per_epoch = max(len(self.train_loader), 1) if self.train_loader else 1
        params_placeholder = self.model.init(rng, (1, image_size, image_size, 3))
        self.tx = optim_lib.build_from_config(
            params_placeholder["params"],
            cfg.get("optim_wrapper", {}),
            self.max_epochs,
            steps_per_epoch,
            model_cfg=cfg.get("model", {}),
            # find_unused_parameters=True parity: dead modules stay frozen
            frozen_prefixes=getattr(self.model, "frozen_param_prefixes", ()),
        )
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params_placeholder["params"],
            batch_stats=params_placeholder.get("batch_stats", {}),
            opt_state=self.tx.init(params_placeholder["params"]),
        )
        # replicate state over the mesh
        self.state = jax.device_put(state, self.repl_sharding)
        self.train_rng = jax.random.PRNGKey(seed + 1)
        #: host-side mirror of ``state.step``. Hooks MUST read this, not
        #: ``int(state.step)``: the device scalar is an output of the jitted
        #: train step, so converting it blocks the dispatch pipeline on every
        #: iteration (measured: 56 vs 78 img/s through the remote-TPU tunnel).
        self.host_step = 0

        self._train_step = make_train_step(self.model, self.tx, repl_sharding=self.repl_sharding)
        self._eval_step = make_eval_step(self.model)

        # fused predict+metric-statistics step: only KB-sized per-image stats
        # leave the device during val (metrics/device.py)
        from ..metrics.device import batch_statistics

        from ..data.device_norm import normalize_image, scale_plane

        def _eval_stats(variables, image, depth, label):
            prob, _ = self.model.predict(
                variables, normalize_image(image), scale_plane(depth)
            )
            return batch_statistics(prob, scale_plane(label))

        self._eval_stats_step = jax.jit(_eval_stats)

        # mixed-evaluator step: ONE forward feeding both the device-stats
        # metrics (per-image stats) and host-path metrics (full prob map) —
        # a host-only metric in the evaluator list must not downgrade the
        # device-stats metrics to host recomputation
        def _eval_stats_prob(variables, image, depth, label):
            prob, _ = self.model.predict(
                variables, normalize_image(image), scale_plane(depth)
            )
            return prob, batch_statistics(prob, scale_plane(label))

        self._eval_stats_prob_step = jax.jit(_eval_stats_prob)

        # hooks
        self.hooks = []
        default_hooks = cfg.get("default_hooks", {}) or {}
        for name, hcfg in default_hooks.items():
            self.hooks.append(HOOKS.build(hcfg))
        for hcfg in cfg.get("custom_hooks", []) or []:
            self.hooks.append(HOOKS.build(hcfg))
        self.hooks.sort(key=lambda h: h.priority)

        # metrics
        self.metrics = [METRICS.build(m) for m in cfg.get("val_evaluator", []) or []]

        # visualization backends (reference visualizer.vis_backends surface)
        from ..utils.visualizer import build_visualizer

        self.vis_backends = build_visualizer(cfg.get("visualizer"), work_dir)

    # ------------------------------------------------------------------
    def _build_loader(self, loader_cfg: Optional[dict], train: bool) -> Optional[DataLoader]:
        if not loader_cfg or "dataset" not in loader_cfg:
            return None
        ds_cfg = dict(loader_cfg["dataset"])
        dataset = DATASETS.build(ds_cfg)
        sampler = loader_cfg.get("sampler", {}) or {}
        batch_size = int(loader_cfg.get("batch_size", 1))
        # Val batches must land with a MESH-compatible placement: the eval
        # steps are traced under active_mesh, so when the val batch divides
        # the data axis the in-jit sharding constraints reference all mesh
        # devices — an unsharded (device-0-committed) input would raise
        # "incompatible devices" at the first val batch on a multi-chip
        # host. Divisible batches shard like train; others (the reference's
        # bs-1 ValLoop) are replicated across the mesh, which every
        # constraint accepts.
        if not train and jax.process_count() > 1:
            # Multi-host val: every process walks the full dataset and the
            # per-process results are averaged (identical inputs → identical
            # results; see the process_allgather in val()). Batches must be
            # replicated — a data-sharded val batch would make the stats /
            # prob outputs span non-addressable devices and device_get would
            # refuse them on every host. Deliberately NOT row-sharded across
            # processes: the reference's `parity` reduction is a cumulative
            # average over the sequential image stream (Smeasure.py:18-37),
            # which is order-dependent — splitting the stream would change
            # the reported numbers. Val cost parity with the reference (one
            # process evaluates everything) is the accepted trade.
            sharding = self.repl_sharding
        elif train or batch_size % self.mesh.shape["data"] == 0:
            sharding = self.data_sharding
        else:
            sharding = self.repl_sharding
        return DataLoader(
            dataset,
            batch_size=batch_size,
            shuffle=bool(sampler.get("shuffle", train)),
            seed=self.seed,
            drop_last=train,
            sharding=sharding,
            num_workers=int(loader_cfg.get("num_workers", 0)),
        )

    def log(self, record: Dict[str, Any]) -> None:
        line = json.dumps(record)
        print(line, flush=True)
        self._log_file.write(line + "\n")
        self._log_file.flush()
        if getattr(self, "vis_backends", None) and "step" in record:
            scalars = {k: v for k, v in record.items() if isinstance(v, (int, float))}
            for b in self.vis_backends:
                b.add_scalars(scalars, int(record["step"]))

    # ------------------------------------------------------------------
    def save_checkpoint(self, name: str) -> str:
        path = os.path.abspath(os.path.join(self.work_dir, name))
        if _HAS_ORBAX:
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(path, jax.device_get(self.state), force=True)
            ckptr.wait_until_finished()
        else:  # flat npz fallback (params + BN running stats; no opt state)
            from .hooks import flatten_tree

            flat = flatten_tree(
                {
                    "params": jax.device_get(self.state.params),
                    "batch_stats": jax.device_get(self.state.batch_stats),
                }
            )
            np.savez(path + ".npz", **flat)
            path += ".npz"
        self.log({"checkpoint": path})
        return path

    def restore_checkpoint(self, path: str) -> None:
        if _HAS_ORBAX and os.path.isdir(path):
            ckptr = ocp.StandardCheckpointer()
            target = jax.device_get(self.state)
            restored = ckptr.restore(os.path.abspath(path), target)
            self.state = jax.device_put(restored, self.repl_sharding)
            self.log({"restored": path})
        else:
            # npz: route through the layout contract's single source —
            # load_flat_checkpoint normalizes ALL our npz layouts (the
            # trainer's params/-prefixed fallback, `convert_ckpt full`'s
            # BARE param keys + batch_stats/ prefix, bare pretrain trees).
            # The old direct 'params/'-prefix graft silently loaded ZERO
            # params from a convert_ckpt-full npz — the exact checkpoint the
            # benchmark runbook passes as val_ckpt (docs/BENCHMARK.md §0).
            from .hooks import graft_flat_params, load_flat_checkpoint

            flat = load_flat_checkpoint(path)
            wrapped = {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
            }
            new_vars, loaded, missed = graft_flat_params(wrapped, flat)
            n_params = sum(k.startswith("params/") for k in loaded)
            if n_params == 0:
                raise ValueError(
                    f"restore_checkpoint: 0 of {len(flat)} arrays from {path} "
                    "matched the model's param tree — wrong checkpoint for "
                    "this model/config? (benchmarking would silently run on "
                    "random init)"
                )
            # grafted leaves are host arrays — restore the replicated mesh
            # layout (the orbax branch and _PretrainInit._load both do; a
            # mixed-placement tree breaks jitted steps on multi-chip hosts)
            new_vars = jax.device_put(new_vars, self.repl_sharding)
            self.state = self.state.replace(
                params=new_vars["params"], batch_stats=new_vars["batch_stats"]
            )
            self.log({"restored": path, "loaded": len(loaded), "missed": len(missed)})
        self.host_step = int(self.state.step)

    def resume(self, path: str, steps_per_epoch: int = None) -> None:
        """Restore a checkpoint and recover the epoch counter."""
        self.restore_checkpoint(path)
        spe = steps_per_epoch or (len(self.train_loader) if self.train_loader else 1)
        self.host_step = int(self.state.step)
        self.epoch = self.host_step // max(spe, 1)
        # Mid-epoch preemption checkpoints (preempt_step_N) land with a
        # partial epoch behind them: re-entering that epoch must SKIP the
        # batches already trained, or they train twice and state.step
        # desyncs from epoch boundaries for the rest of the run (the LR
        # schedule derives its epoch from step // steps_per_epoch,
        # optim.py::cosine_epoch_schedule). The shuffle stream makes the
        # skip exact: loop epoch N consumes the (seed, N-1) ordering, and
        # loader.epoch below is restored to exactly that stream position.
        self._resume_skip = self.host_step % max(spe, 1)
        if self.train_loader is not None:
            # continue the per-epoch shuffle stream instead of replaying
            # epoch-0 order (epoch seeds the shuffle rng in DataLoader)
            self.train_loader.epoch = self.epoch
        #: init hooks consult this: re-grafting ImageNet pretrains over a
        #: resumed checkpoint would silently discard the fine-tuned backbone
        self.resumed = True
        self.log(
            {
                "resumed_at_epoch": self.epoch,
                "step": self.host_step,
                "skip_batches": self._resume_skip,
            }
        )

    # ------------------------------------------------------------------
    def _install_preemption_handler(self) -> None:
        """Preemption-safe checkpointing (SURVEY.md §5 failure-detection plan):
        SIGTERM/SIGINT request a save at the next step boundary, then exit."""
        import signal

        self._stop_requested = False

        def _handler(signum, frame):
            self._stop_requested = True

        try:
            signal.signal(signal.SIGTERM, _handler)
            signal.signal(signal.SIGINT, _handler)
        except ValueError:  # non-main thread
            pass

    def train(self) -> None:
        with active_mesh(self.mesh):
            # tracing of the sharded step happens on first call inside the
            # loop; the active mesh lets model code anchor activation
            # shardings (parallel/mesh.py::spatial_constraint)
            self._train_body()

    def _train_body(self) -> None:
        self._install_preemption_handler()
        for h in self.hooks:
            h.before_train(self)
        assert self.train_loader is not None, "recipe has no train_dataloader"
        try:
            while self.epoch < self.max_epochs:
                self.epoch += 1
                for h in self.hooks:
                    h.before_train_epoch(self)
                # consumed only on the FIRST epoch after a mid-epoch resume
                # (see resume()); the skipped batches were already trained
                # before the preemption
                skip = getattr(self, "_resume_skip", 0)
                self._resume_skip = 0
                for i, batch in enumerate(self.train_loader):
                    if i < skip:
                        continue
                    arrays = {k: batch[k] for k in ("input", "label", "depth")}
                    self.state, aux = self._train_step(self.state, arrays, self.train_rng)
                    self.host_step += 1
                    for h in self.hooks:
                        h.after_train_iter(self, aux)
                    if getattr(self, "_stop_requested", False):
                        path = self.save_checkpoint(f"preempt_step_{self.host_step}")
                        self.log({"preempted": True, "checkpoint": path})
                        return
                for h in self.hooks:
                    h.after_train_epoch(self)
                if self.val_interval and self.epoch % self.val_interval == 0 and self.val_loader:
                    self.val(during_train=True)
        finally:
            # finally: the preemption early-return and exceptions must also
            # release end-of-train resources (e.g. an open profiler trace);
            # a hook failure here must never mask a propagating train error
            for h in self.hooks:
                try:
                    h.after_train(self)
                except Exception as e:  # noqa: BLE001
                    self.log({"after_train_hook_error": f"{type(h).__name__}: {e}"})

    # ------------------------------------------------------------------
    def val(self, during_train: bool = False, save_visualizations: bool = False) -> Dict[str, float]:
        with active_mesh(self.mesh):
            return self._val_body(during_train, save_visualizations)

    def _val_body(self, during_train: bool = False, save_visualizations: bool = False) -> Dict[str, float]:
        if not during_train:
            for h in self.hooks:
                h.before_val(self)
        assert self.val_loader is not None, "recipe has no val_dataloader"
        for m in self.metrics:
            m.reset()
        self._vis_counter = -1  # per-run fallback PNG numbering
        variables = {"params": self.state.params, "batch_stats": self.state.batch_stats}
        vis_dir = os.path.join(self.work_dir, "visualizations")
        n_images = 0
        t0 = time.time()
        # Per-metric device-stats gating: metrics that consume the shared
        # on-device statistics (E/F/S/MAE — one histogram fetch serves all)
        # keep the device path even when a host-only metric
        # (WeightedFmeasure, mIoU) is also configured; only the host metrics
        # pay the full-image D2H readback. The visualization path needs the
        # prob map on host anyway, so it stays all-host.
        device_ok = (
            bool(self.cfg.get("device_metrics", True))
            and not save_visualizations
            and bool(self.metrics)
        )
        stats_metrics = (
            [m for m in self.metrics if getattr(m, "supports_device_stats", False)]
            if device_ok
            else []
        )
        host_metrics = [m for m in self.metrics if m not in stats_metrics]
        for batch in self.val_loader:
            if stats_metrics and not host_metrics:
                stats = self._eval_stats_step(
                    variables, batch["input"], batch["depth"], batch["label"]
                )
                stats = {k: np.asarray(v) for k, v in jax.device_get(stats).items()}
                n_images += int(stats["sm"].shape[0])
                for m in stats_metrics:
                    m.process_stats(stats)
                continue
            if save_visualizations:
                # one forward serves both the metrics and the texture extra
                if not hasattr(self, "_eval_extras_step"):
                    self._eval_extras_step = make_eval_step(self.model, with_extras=True)
                prob, extras = self._eval_extras_step(
                    variables, batch["input"], batch["depth"]
                )
            elif stats_metrics:
                # mixed evaluators: one forward yields prob AND device stats
                prob, stats = self._eval_stats_prob_step(
                    variables, batch["input"], batch["depth"], batch["label"]
                )
                stats = {k: np.asarray(v) for k, v in jax.device_get(stats).items()}
                for m in stats_metrics:
                    m.process_stats(stats)
                extras = None
            else:
                prob, extras = self._eval_step(variables, batch["input"], batch["depth"]), None
            prob_np = np.asarray(jax.device_get(prob))
            label_np = np.asarray(jax.device_get(batch["label"]))
            if label_np.dtype == np.uint8:  # uint8-ingest datasets
                label_np = label_np.astype(np.float32) / 255.0
            n_images += prob_np.shape[0]
            for m in host_metrics:
                m.process(prob_np, label_np)
            if save_visualizations:
                self._dump_visualizations(vis_dir, batch, prob_np, extras)
        results: Dict[str, float] = {}
        for m in self.metrics:
            results.update(m.compute())
        # multi-host: average per-process results (reference: MMEngine gathers
        # collect_device='cpu' metric lists across ranks — SURVEY.md §5)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            keys = sorted(results)
            vals = jnp.asarray([results[k] for k in keys], jnp.float32)
            gathered = multihost_utils.process_allgather(vals)
            results = {k: float(v) for k, v in zip(keys, np.mean(gathered, axis=0))}
        results["val_imgs_per_sec"] = round(n_images / max(time.time() - t0, 1e-9), 2)
        # "step" included so the val metrics reach the visualization
        # backends too — Runner.log only forwards records with a step to
        # chart against (train curves without val curves is a silent
        # observability gap on long runs)
        self.log(
            {
                "epoch": self.epoch,
                "step": self.host_step,
                **{k: round(v, 5) for k, v in results.items()},
            }
        )
        return results

    def _dump_visualizations(self, vis_dir: str, batch, prob_np, extras=None) -> None:
        """Host-side PNG dumps of input/label/output/depth/diffusion-texture
        (reference predict side effects, cod.py:156-217: denormalized input,
        label, sigmoid output, contrast-enhanced texture map, depth) — all
        outside the compiled path. ``extras`` comes from the SAME eval
        forward that produced ``prob_np`` (no second forward)."""
        from PIL import Image as PILImage

        os.makedirs(vis_dir, exist_ok=True)

        def save(name, arr):  # arr (H, W) or (H, W, 3) in [0,1]
            PILImage.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(vis_dir, name)
            )

        from ..data.device_norm import IMAGENET_MEAN as mean, IMAGENET_STD as std

        input_np = np.asarray(jax.device_get(batch["input"]))
        label_np = np.asarray(jax.device_get(batch["label"]))
        depth_np = np.asarray(jax.device_get(batch["depth"]))
        if input_np.dtype == np.uint8:  # uint8-ingest: convert to the
            # normalized form the denormalizing save below expects
            input_np = (input_np.astype(np.float32) / 255.0 - mean) / std
        if label_np.dtype == np.uint8:
            label_np = label_np.astype(np.float32) / 255.0
        if depth_np.dtype == np.uint8:
            depth_np = depth_np.astype(np.float32) / 255.0
        # texture is None for prompt-less variants (reference baseline saves
        # only input/label/output, baseline.py:180-185)
        tex = extras.get("texture") if extras else None
        texture_np = None if tex is None else np.asarray(jax.device_get(tex))
        raws = batch.get("raw")
        for i in range(prob_np.shape[0]):
            if isinstance(raws, list) and isinstance(raws[i], str):
                name = os.path.splitext(os.path.basename(raws[i]))[0]
            else:
                # running val-image counter: step is constant during val, so
                # a step-based name would collide across batches
                self._vis_counter = getattr(self, "_vis_counter", -1) + 1
                name = f"img{self._vis_counter}"
            save(f"{name}_output.png", prob_np[i, ..., 0])
            save(f"{name}_label.png", label_np[i, ..., 0])
            save(f"{name}_input.png", input_np[i] * std + mean)
            save(f"{name}_depth.png", depth_np[i, ..., 0])
            if texture_np is not None:
                # contrast-enhance like the reference (cod.py:194-204)
                t = texture_np[i].mean(axis=-1)
                t = np.clip((t - t.mean()) * 2.0 + t.mean(), 0, 1)
                save(f"{name}_diffusion.png", t)
