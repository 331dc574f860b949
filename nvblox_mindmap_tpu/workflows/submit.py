"""Cluster workflow generation (reference: mindmap_osmo/*).

The reference submits datagen / training / evaluation / e2e pipelines to
NVIDIA's OSMO batch system with per-stage GPU/memory/storage tables. The
TPU-native equivalent emits generic, scheduler-agnostic batch specs (JSON +
shell command lines) describing each stage: container command, TPU topology,
host resources and artifact flow. The specs can be fed to any scheduler
(GKE/JobSet, XManager-like runners, plain ssh).

Stages and defaults mirror the reference's resource inference
(mindmap_osmo/workflow_utils/workflow_constants.py:22-73): eval/datagen get
1 accelerator, training 2 (here: TPU chips), plus memory/storage floors.
"""
from __future__ import annotations

import dataclasses
import json
import shlex
from typing import Dict, List, Optional

STAGE_RESOURCES = {
    # accelerators, host memory GiB, scratch GiB
    "datagen": {"tpu_chips": 1, "memory_gib": 64, "storage_gib": 256},
    "training": {"tpu_chips": 2, "memory_gib": 128, "storage_gib": 512},
    "evaluation": {"tpu_chips": 1, "memory_gib": 64, "storage_gib": 128},
}


@dataclasses.dataclass
class WorkflowStage:
    name: str
    kind: str  # datagen | training | evaluation
    args: List[str]
    depends_on: List[str] = dataclasses.field(default_factory=list)
    tpu_chips: Optional[int] = None

    def to_spec(self) -> Dict:
        resources = dict(STAGE_RESOURCES[self.kind])
        if self.tpu_chips is not None:
            resources["tpu_chips"] = self.tpu_chips
        module = {
            "datagen": "nvblox_mindmap_tpu.apps.run_datagen",
            "training": "nvblox_mindmap_tpu.apps.run_training",
            "evaluation": "nvblox_mindmap_tpu.apps.run_closed_loop_policy",
        }[self.kind]
        command = ["python", "-m", module, *self.args]
        return {
            "name": self.name,
            "kind": self.kind,
            "command": command,
            "command_line": " ".join(shlex.quote(c) for c in command),
            "resources": resources,
            "depends_on": self.depends_on,
        }


def make_datagen_workflow(task: str, hdf5_file: str, output_dir: str,
                          demos: str = "0", extra_args: List[str] = ()) -> Dict:
    stage = WorkflowStage(
        name=f"datagen-{task}",
        kind="datagen",
        args=["--task", task, "--hdf5_file", hdf5_file, "--output_dir", output_dir,
              "--demos_datagen", demos, *extra_args],
    )
    return {"stages": [stage.to_spec()]}


def make_training_workflow(task: str, dataset: str, demos_train: str,
                           extra_args: List[str] = ()) -> Dict:
    stage = WorkflowStage(
        name=f"training-{task}",
        kind="training",
        args=["--task", task, "--dataset", dataset, "--demos_train", demos_train,
              *extra_args],
    )
    return {"stages": [stage.to_spec()]}


def make_evaluation_workflow(task: str, dataset: str, checkpoint: str,
                             demos: str = "0", extra_args: List[str] = ()) -> Dict:
    stage = WorkflowStage(
        name=f"evaluation-{task}",
        kind="evaluation",
        args=["--task", task, "--dataset", dataset, "--checkpoint", checkpoint,
              "--demos_closed_loop", demos, *extra_args],
    )
    return {"stages": [stage.to_spec()]}


def make_train_and_eval_workflow(task: str, dataset: str, demos_train: str,
                                 demos_eval: str, checkpoint_dir: str) -> Dict:
    train = WorkflowStage(
        name=f"training-{task}",
        kind="training",
        args=["--task", task, "--dataset", dataset, "--demos_train", demos_train,
              "--base_log_dir", checkpoint_dir],
    )
    evaluation = WorkflowStage(
        name=f"evaluation-{task}",
        kind="evaluation",
        args=["--task", task, "--dataset", dataset,
              "--checkpoint", f"{checkpoint_dir}/checkpoints/latest/best.ckpt",
              "--demos_closed_loop", demos_eval],
        depends_on=[train.name],
    )
    return {"stages": [train.to_spec(), evaluation.to_spec()]}


def make_e2e_workflow(task: str, hdf5_file: str, workdir: str,
                      demos: str = "0") -> Dict:
    """datagen -> training -> evaluation, chained by artifact paths."""
    datagen = WorkflowStage(
        name=f"datagen-{task}",
        kind="datagen",
        args=["--task", task, "--hdf5_file", hdf5_file,
              "--output_dir", f"{workdir}/dataset", "--demos_datagen", demos],
    )
    train = WorkflowStage(
        name=f"training-{task}",
        kind="training",
        args=["--task", task, "--dataset", f"{workdir}/dataset",
              "--demos_train", demos, "--base_log_dir", f"{workdir}/train"],
        depends_on=[datagen.name],
    )
    evaluation = WorkflowStage(
        name=f"evaluation-{task}",
        kind="evaluation",
        args=["--task", task, "--dataset", f"{workdir}/dataset",
              "--checkpoint", f"{workdir}/train/checkpoints/latest/best.ckpt",
              "--demos_closed_loop", demos],
        depends_on=[train.name],
    )
    return {"stages": [datagen.to_spec(), train.to_spec(), evaluation.to_spec()]}


def write_workflow(workflow: Dict, path: str):
    with open(path, "w") as f:
        json.dump(workflow, f, indent=2)
    return path
