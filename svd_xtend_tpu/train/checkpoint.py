"""Orbax checkpointing: save/rotate/resume + diffusers-format export.

Behavior contract (reference §3.5): `checkpoint-{step}` directories under
output_dir, rotation keeping `checkpoints_total_limit` (train_svd.py:1064-1086),
resume from an explicit path or 'latest' (step-number sort, :902-909), plus
diffusers-format model export for pipeline interop (:696-706, 1173-1180) and
LoRA safetensors (train_svd_lora.py:1070-1074).

TPU-native: Orbax writes sharded arrays directly from device buffers
(async-capable); the data-iterator state (an integer step — data/dataset.py)
and the train config ride along, making resume EXACT rather than the
reference's statistical step-skip (train_svd.py:935-939).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np

from ..core.config import TrainConfig

CKPT_PREFIX = "checkpoint-"


def _ckpt_steps(output_dir: str, complete_only: bool = False):
    """Checkpoint step numbers under output_dir. complete_only skips dirs
    whose orbax 'state' subdir hasn't finalized (async save in flight or a
    crash mid-write) — resume-from-latest must never pick those."""
    if not os.path.isdir(output_dir):
        return []
    steps = []
    for name in os.listdir(output_dir):
        m = re.fullmatch(rf"{CKPT_PREFIX}(\d+)", name)
        if not m:
            continue
        if complete_only and not os.path.isdir(
                os.path.join(output_dir, name, "state")):
            continue
        steps.append(int(m.group(1)))
    return sorted(steps)


def latest_checkpoint(output_dir: str) -> Optional[str]:
    steps = _ckpt_steps(output_dir, complete_only=True)
    return os.path.join(output_dir, f"{CKPT_PREFIX}{steps[-1]}") if steps else None


class CheckpointManager:
    """save/restore TrainState + config + data-iterator state with rotation."""

    def __init__(self, output_dir: str, total_limit: int = 2):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self.output_dir = os.path.abspath(output_dir)
        self.total_limit = max(1, total_limit)
        os.makedirs(self.output_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def save(self, step: int, state: Any, cfg: TrainConfig,
             data_state: Optional[dict] = None,
             blocking: bool = False) -> str:
        """Async by default (SURVEY.md §5: Orbax async checkpointing):
        training resumes as soon as the device buffers are snapshotted;
        serialization overlaps the next steps. A new save (or `wait()`)
        fences the previous one. blocking=True for preemption/final saves."""
        self._ckptr.wait_until_finished()          # fence the previous save
        path = os.path.join(self.output_dir, f"{CKPT_PREFIX}{step}")
        state_dir = os.path.join(path, "state")
        if os.path.isdir(state_dir):
            # same-step save already durable (e.g. SIGTERM right after a
            # periodic save, or preemption on the step just resumed): the
            # state at a step boundary is identical — skip instead of
            # tripping orbax's exists-error and losing the graceful save
            return path
        self._ckptr.save(state_dir, state)
        if blocking:
            self._ckptr.wait_until_finished()
        if jax.process_index() == 0:
            os.makedirs(path, exist_ok=True)   # async: orbax may not have
            with open(os.path.join(path, "config.json"), "w") as f:
                f.write(cfg.to_json())
            with open(os.path.join(path, "data_state.json"), "w") as f:
                json.dump(data_state or {}, f)
        self._rotate()
        return path

    def wait(self):
        """Block until any in-flight async save is durable (call before
        process exit and before restore-from-latest in the same process);
        re-rotates so the just-landed checkpoint counts against the limit."""
        self._ckptr.wait_until_finished()
        self._rotate()

    def _rotate(self):
        if jax.process_index() != 0:
            return
        # rotate among COMPLETE checkpoints only: an in-flight async save
        # must not cause deletion of a durable one before it lands
        steps = _ckpt_steps(self.output_dir, complete_only=True)
        for s in steps[: max(0, len(steps) - self.total_limit)]:
            import shutil
            shutil.rmtree(os.path.join(self.output_dir, f"{CKPT_PREFIX}{s}"),
                          ignore_errors=True)

    def restore(self, path: str, abstract_state: Any
                ) -> Tuple[Any, TrainConfig, dict]:
        self._ckptr.wait_until_finished()    # same-process save -> restore
        if path == "latest":
            resolved = latest_checkpoint(self.output_dir)
            if resolved is None:
                raise FileNotFoundError(
                    f"no {CKPT_PREFIX}* under {self.output_dir}")
            path = resolved
        state = self._ckptr.restore(os.path.join(path, "state"), abstract_state)
        with open(os.path.join(path, "config.json")) as f:
            cfg = TrainConfig.from_json(f.read())
        data_state = {}
        ds_path = os.path.join(path, "data_state.json")
        if os.path.exists(ds_path):
            with open(ds_path) as f:
                data_state = json.load(f)
        return state, cfg, data_state


# ------------------------------------------------- diffusers-format export --

def export_unet_diffusers(unet_params: Any, path: str, config_json: str = ""):
    """Write unet/diffusion_pytorch_model.safetensors (+config) like
    save_pretrained (reference save hook, train_svd.py:698-706)."""
    from ..io import convert
    os.makedirs(path, exist_ok=True)
    sd = convert.flax_to_diffusers(jax.tree.map(np.asarray, unet_params))
    convert.save_safetensors(
        os.path.join(path, "diffusion_pytorch_model.safetensors"), sd,
        metadata={"format": "pt"})
    if config_json:
        with open(os.path.join(path, "config.json"), "w") as f:
            f.write(config_json)


def export_lora_diffusers(lora_tree: Any, path: str):
    """Write pytorch_lora_weights.safetensors (pipeline-loadable format,
    reference train_svd_lora.py:1070-1074)."""
    from ..io import convert
    os.makedirs(path, exist_ok=True)
    sd = convert.lora_flax_to_diffusers(
        jax.tree.map(np.asarray, lora_tree))
    convert.save_safetensors(
        os.path.join(path, "pytorch_lora_weights.safetensors"), sd,
        metadata={"format": "pt"})
