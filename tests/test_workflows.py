"""Workflow spec generation."""
import json

from nvblox_mindmap_tpu.workflows.submit import (
    make_e2e_workflow,
    make_train_and_eval_workflow,
    make_training_workflow,
    write_workflow,
)


def test_training_workflow_spec():
    wf = make_training_workflow("drill_in_box", "/data", "0-9")
    stage = wf["stages"][0]
    assert stage["kind"] == "training"
    assert stage["resources"]["tpu_chips"] == 2
    assert "--task" in stage["command"] and "drill_in_box" in stage["command"]
    assert "run_training" in stage["command_line"]


def test_e2e_workflow_chains_dependencies(tmp_path):
    wf = make_e2e_workflow("cube_stacking", "/demos.hdf5", "/work")
    names = [s["name"] for s in wf["stages"]]
    assert len(names) == 3
    assert wf["stages"][1]["depends_on"] == [names[0]]
    assert wf["stages"][2]["depends_on"] == [names[1]]
    path = write_workflow(wf, str(tmp_path / "wf.json"))
    loaded = json.load(open(path))
    assert len(loaded["stages"]) == 3


def test_train_and_eval_artifact_flow():
    wf = make_train_and_eval_workflow("mug_in_drawer", "/data", "0-5", "6-9",
                                      "/ckpt")
    eval_stage = wf["stages"][1]
    # The eval stage points at the STABLE latest symlink run_training
    # refreshes (the timestamped checkpoint dir is unpredictable at
    # spec-generation time).
    assert "/ckpt/checkpoints/latest/best.ckpt" in eval_stage["command"]
