"""Runner hooks: logging, checkpointing, pretrained-weight init.

Reference surface: MMEngine LoggerHook/CheckpointHook (config/cod.yml:131-139)
and the custom init hooks ``our_init`` (cod.py:230-300: loads
pretrain/pvt_v2_b2.pth into the backbone and convnext_base_22k_224.pth into
the ConvNeXt tower before train, a full checkpoint before val),
``baseline_init`` (baseline.py:199-269) and ``PretrainInitHook``
(dqnet.py:161-208). Here pretrained weights arrive as converted .npz/orbax
trees produced by ``tools/convert_ckpt.py``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np

from ..core.registry import HOOKS, export


class Hook:
    priority = 50

    def before_train(self, runner):  # noqa: D401
        pass

    def before_train_epoch(self, runner):
        pass

    def before_val(self, runner):
        pass

    def after_train_iter(self, runner, metrics: Dict[str, Any]):
        pass

    def after_train_epoch(self, runner):
        pass

    def after_train(self, runner):
        """Fired once when training ends — normal completion AND the
        preemption early-return (the loop dispatches it from a finally)."""
        pass


@export
@HOOKS.register
class LoggerHook(Hook):
    """Interval-based JSONL + stdout training logger."""

    def __init__(self, interval: int = 20, ignore_last: bool = False):
        self.interval = interval
        #: mmengine semantics: unless True, the final iteration of each epoch
        #: is logged even when it doesn't land on ``interval``
        self.ignore_last = ignore_last
        self._t0 = None
        self._last_step = 0
        self._last_logged = -1
        self._pending = None

    def before_train(self, runner):
        self._t0 = time.time()
        self._last_step = runner.host_step

    def before_train_epoch(self, runner):
        # reset the throughput window: between epochs the runner may have
        # paid a checkpoint save and a full val run — folding that pause
        # into the next interval's imgs_per_sec would report a false
        # slowdown every val_interval epochs
        self._t0 = time.time()
        self._last_step = runner.host_step

    def _emit(self, runner, step, metrics):
        now = time.time()
        steps = step - self._last_step
        ips = steps * runner.batch_size / max(now - self._t0, 1e-9)
        self._t0, self._last_step, self._last_logged = now, step, step
        record = {
            "step": step,
            "epoch": runner.epoch,
            "imgs_per_sec": round(ips, 2),
            **{k: round(float(v), 5) for k, v in metrics.items()},
        }
        runner.log(record)

    def after_train_iter(self, runner, metrics):
        # host_step, NOT int(runner.state.step): reading the device scalar
        # here would block the async dispatch pipeline on every iteration
        step = runner.host_step
        if step % self.interval == 0:
            self._emit(runner, step, metrics)
        else:
            self._pending = metrics

    def after_train_epoch(self, runner):
        step = runner.host_step
        if not self.ignore_last and step != self._last_logged and self._pending is not None:
            self._emit(runner, step, self._pending)
        self._pending = None


@export
@HOOKS.register
class ProfilerHook(Hook):
    """jax.profiler trace of steps [start, start+num) -> work_dir/profile
    (SURVEY.md §5 tracing plan; view with tensorboard or perfetto)."""

    def __init__(self, start_step: int = 10, num_steps: int = 3, out_dir: str = None):
        self.start_step = start_step
        self.num_steps = num_steps
        self.out_dir = out_dir
        self._active = False
        self._done = False
        self._started_at = None

    def after_train_iter(self, runner, metrics):
        if self._done:
            return
        step = runner.host_step
        out = self.out_dir or os.path.join(runner.work_dir, "profile")
        # >= (not ==): a resumed run whose restored step already passed
        # start_step still traces the NEXT num_steps instead of never firing
        if not self._active and step >= self.start_step:
            # drain the async dispatch queue so the trace window covers
            # exactly the next num_steps device steps (host_step can run
            # ahead of the device between logger syncs)
            jax.block_until_ready(runner.state.params)
            jax.profiler.start_trace(out)
            self._active = True
            self._started_at = step
            if step != self.start_step:
                runner.log({"profile_started_late": step, "configured": self.start_step})
        elif self._active and step >= self._started_at + self.num_steps:
            self._stop(runner, truncated=False)

    def _stop(self, runner, truncated: bool) -> None:
        jax.block_until_ready(runner.state.params)  # drain dispatch queue
        jax.profiler.stop_trace()
        self._active = False
        self._done = True
        out = self.out_dir or os.path.join(runner.work_dir, "profile")
        rec = {"profile": out, "step": runner.host_step}
        if truncated:
            rec["truncated"] = True
        runner.log(rec)

    def after_train(self, runner):
        # A run that ends (or is preempted) inside the trace window would
        # otherwise never stop_trace — the profile dir is left truncated and
        # a later start_trace in the same process raises "already started".
        if self._active:
            self._stop(runner, truncated=True)


@export
@HOOKS.register
class CheckpointHook(Hook):
    """Epoch-interval orbax checkpoints: work_dir/epoch_N (CheckpointHook parity)."""

    def __init__(self, interval: int = 10, by_epoch: bool = True, max_keep: Optional[int] = None):
        self.interval = interval
        #: mmengine ``max_keep_ckpts`` semantics: keep only the newest N
        #: interval checkpoints, deleting the oldest as new ones land
        self.max_keep = max_keep
        self._saved = []

    def after_train_epoch(self, runner):
        if runner.epoch % self.interval == 0:
            path = runner.save_checkpoint(f"epoch_{runner.epoch}")
            self._saved.append(path)
            while self.max_keep and len(self._saved) > self.max_keep:
                import shutil

                old = self._saved.pop(0)
                if os.path.isdir(old):
                    shutil.rmtree(old, ignore_errors=True)
                elif os.path.exists(old):
                    os.remove(old)
                runner.log({"checkpoint_evicted": old})


def flatten_tree(tree, prefix: tuple = ()) -> Dict[str, np.ndarray]:
    """Nested dict tree -> flat {'a/b/c': np.ndarray}. The single source of
    the npz flat-key format consumed by ``load_npz_tree``/``graft_flat_params``
    (used by the trainer's npz checkpoint fallback and the serving exporter)."""
    flat: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(flatten_tree(v, prefix + (str(k),)))
    else:
        flat["/".join(prefix)] = np.asarray(tree)
    return flat


def load_npz_tree(path: str) -> Dict[str, np.ndarray]:
    """Flat {'a/b/c': array} mapping from an .npz checkpoint."""
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def graft_subtree(params, flat: Dict[str, np.ndarray], subtree: str) -> tuple:
    """Graft SUBTREE-RELATIVE flat keys (a converted backbone/tower pretrain
    npz, e.g. 'patch_embed1/Conv_0/Conv_0/kernel') into the node at
    ``subtree`` (e.g. 'hitnet/backbone') of a full param tree.

    This is the inverse addressing of ``graft_flat_params``'s ``prefix``
    (which prefixes the NPZ keys, as in 'params/'-prefixed checkpoints):
    here the MODEL keys carry the prefix and the npz keys do not.
    Returns (new_params, loaded_keys, missed_keys).
    """
    parts = [p for p in subtree.strip("/").split("/") if p]
    node = params
    for depth, p in enumerate(parts):
        if not isinstance(node, dict) or p not in node:
            have = sorted(node.keys())[:8] if isinstance(node, dict) else type(node).__name__
            raise ValueError(
                f"graft_subtree: param tree has no node '{'/'.join(parts[: depth + 1])}' "
                f"(available at that level: {have}) — wrong subtree for this model?"
            )
        node = node[p]
    new_node, loaded, missed = graft_flat_params(node, flat)

    def rebuild(tree, path):
        if not path:
            return new_node
        return {**tree, path[0]: rebuild(tree[path[0]], path[1:])}

    return rebuild(params, parts), loaded, missed


def load_flat_checkpoint(ckpt_path: str) -> Dict[str, np.ndarray]:
    """Any of our checkpoint formats as one flat {'params/...',
    'batch_stats/...'} mapping — orbax directory (the trainer's primary
    format), the trainer's flat-npz fallback, a ``convert_ckpt full`` npz
    (BARE param keys + batch_stats/ prefixed), or a bare converted pretrain
    tree (all bare → params namespace assumed). The single source of the
    layout contract (also backs ``convert_ckpt export``)."""
    if os.path.isdir(ckpt_path):
        import orbax.checkpoint as ocp

        # restores the whole saved tree (incl. optimizer state for full train
        # checkpoints — transient host RAM, dropped by the grafts); a partial
        # restore would need orbax transforms and isn't worth the coupling
        restored = ocp.StandardCheckpointer().restore(os.path.abspath(ckpt_path))
        restored = dict(restored) if not isinstance(restored, dict) else restored
        if not ({"params", "batch_stats"} & restored.keys()):
            # bare params tree saved without the collection wrapper
            restored = {"params": restored}
        return flatten_tree(
            {k: restored[k] for k in ("params", "batch_stats") if k in restored}
        )
    flat = load_npz_tree(ckpt_path)
    return {
        k if k.startswith(("params/", "batch_stats/")) else f"params/{k}": v
        for k, v in flat.items()
    }


def load_variables_checkpoint(variables, ckpt_path: str, strict: bool = True):
    """Graft a checkpoint into a FULL inference variables tree — params AND
    BN ``batch_stats`` (loading params alone silently serves init running
    stats). Accepts an orbax checkpoint directory (the trainer's primary
    format), the trainer's flat-npz fallback, a ``convert_ckpt full`` npz,
    or a bare converted tree (params namespace assumed).

    ``strict``: every param leaf must be covered, and batch_stats must be
    covered whenever the model has any. Returns (variables, loaded, missed).
    """
    flat = load_flat_checkpoint(ckpt_path)
    new_vars, loaded, missed = graft_flat_params(variables, flat)
    if strict:
        missed_params = [k for k in missed if k.startswith("params/")]
        if missed_params:
            raise ValueError(
                f"checkpoint left {len(missed_params)} params at init: {missed_params[:5]}"
            )
        missed_stats = [k for k in missed if k.startswith("batch_stats/")]
        if missed_stats:
            raise ValueError(
                f"checkpoint has no BN running stats for {len(missed_stats)} leaves "
                f"(first: {missed_stats[:3]}) — serving init stats would produce "
                "wrong predictions; use a full train checkpoint"
            )
    return new_vars, loaded, missed


def graft_flat_params(params, flat: Dict[str, np.ndarray], prefix: str = "") -> tuple:
    """Copy flat 'a/b/c' arrays into a nested param tree (strict=False).

    Returns (new_params, loaded_keys, missed_keys).
    """
    loaded, missed = [], []

    def visit(tree, path):
        if isinstance(tree, dict):
            return {k: visit(v, path + (k,)) for k, v in tree.items()}
        key = "/".join(path)
        src = flat.get(prefix + key)
        if src is not None and src.shape == tree.shape:
            loaded.append(key)
            return jax.numpy.asarray(src, tree.dtype)
        missed.append(key)
        return tree

    new_params = visit(params, ())
    return new_params, loaded, missed


class _PretrainInit(Hook):
    """Shared machinery for the three reference init hooks."""

    priority = 40
    backbone_ckpt = "pretrain/pvt_v2_b2.npz"
    convnext_ckpt: Optional[str] = "pretrain/convnext_base_22k_224.npz"
    val_ckpt: Optional[str] = None
    #: where the PVT backbone lives in the model's param tree — cod/baseline
    #: nest it under Hitnet; DQnet's backbone is top-level (dqnet.py:161-208)
    backbone_subtree = "hitnet/backbone"
    convnext_subtree = "hitnet/prompt_encoder/encoder2"

    def __init__(self, backbone_ckpt=None, convnext_ckpt=None, val_ckpt=None):
        if backbone_ckpt is not None:
            self.backbone_ckpt = backbone_ckpt
        if convnext_ckpt is not None:
            self.convnext_ckpt = convnext_ckpt
        if val_ckpt is not None:
            self.val_ckpt = val_ckpt

    def _load(self, runner, path: str, subtree: str):
        if not path or not os.path.exists(path):
            runner.log({"hook": type(self).__name__, "skip_missing": path})
            return
        flat = load_npz_tree(path)
        # pretrain npz keys are subtree-relative (converted pvt/convnext
        # trees); graft them into the named subtree of the full param tree
        params, loaded, _ = graft_subtree(runner.state.params, flat, subtree)
        if not loaded:
            raise ValueError(
                f"{type(self).__name__}: 0 of {len(flat)} pretrain arrays from "
                f"{path} matched under '{subtree}' — wrong checkpoint kind for "
                "this hook? (convert with `convert_ckpt pvt|convnext`)"
            )
        # grafted leaves are host arrays — restore the replicated mesh layout
        params = jax.device_put(params, runner.repl_sharding)
        runner.state = runner.state.replace(params=params)
        runner.log({"hook": type(self).__name__, "loaded": len(loaded), "from": path})

    def before_train(self, runner):
        if getattr(runner, "resumed", False):
            # --resume restored a full train checkpoint; re-grafting the
            # ImageNet pretrains would overwrite the fine-tuned backbone.
            # (The reference would replay its torch.load here — its hooks
            # have no resume-awareness; documented delta.)
            runner.log({"hook": type(self).__name__, "skip_pretrains": "resumed"})
            return
        self._load(runner, self.backbone_ckpt, subtree=self.backbone_subtree)
        if self.convnext_ckpt:
            self._load(runner, self.convnext_ckpt, subtree=self.convnext_subtree)

    def before_val(self, runner):
        if not self.val_ckpt:
            return
        if not os.path.exists(self.val_ckpt):
            # fail loudly: silently skipping a SET val_ckpt would benchmark
            # random weights (the reference's torch.load raises here too)
            raise FileNotFoundError(
                f"{type(self).__name__}: val_ckpt does not exist: {self.val_ckpt}"
            )
        runner.restore_checkpoint(self.val_ckpt)


@export
@HOOKS.register
class our_init(_PretrainInit):
    """cod init hook (cod.py:230-300)."""


@export
@HOOKS.register
class baseline_init(_PretrainInit):
    """baseline init hook (baseline.py:199-269)."""


@export
@HOOKS.register
class PretrainInitHook(_PretrainInit):
    """DQnet init hook — backbone only (dqnet.py:161-208). DQnetNet's PVT
    backbone is a TOP-LEVEL 'backbone' node (no Hitnet wrapper) and DQnet
    has no ConvNeXt tower, so neither cod-shaped graft applies."""

    backbone_subtree = "backbone"
    convnext_ckpt = None
