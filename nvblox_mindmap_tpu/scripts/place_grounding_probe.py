"""Place-grounding probe: does the predicted RELEASE position track the
support cube across scenes?

The closed-loop failure chain on cube_stacking (docs/pages/benchmarks.md)
was long diagnosed as exposure drift / demonstration coverage; this probe
measures the sharper question underneath it. Protocol, per scene:

1. Drive the scripted expert (closed_loop/scripted.scripted_stack_goals)
   through approach / descend / grasp / lift, mapping every frame - the
   gripper history at the hand-off is exactly an on-distribution expert
   prefix and carries NO information about where the support cube is
   (the history is [start, pick approach, pick, lift]: pick-cube only).
2. Hand control to the policy and record the first goal that commands an
   open gripper while the cube is held - its xy is where the policy
   intends to release.
3. Regress release-xy on the support cube's xy over N freshly randomized
   scenes (disjoint seed base from training and held-out evals).

slope ~ 1, r ~ 1  =>  the place is grounded in the mapped observation.
slope ~ 0          =>  the place is a memorized dataset prior: open-loop
keypose error stays excellent (validation conditions on the EXPERT history,
which - at transport/place keyposes - already heads toward the target, so
the leak hides the failure), while closed-loop success is decided by
whether the scene's support cube happens to sit near the prior.

Measured round 4 (8 expert demos, the committed task-success fixture):
slope_x = -0.14, slope_y = -0.11, r_x = -0.72, median release error
0.191 m, every release inside a ~4 cm cluster at the training scenes' mean
place position. The same probe run after HG-DAgger retraining (8 expert +
32 corrective demos) shows the same clustering - corrective data diversifies
the TARGETS but cannot create perception the gradient never needed with 8
memorizable scenes. See docs/pages/benchmarks.md for the scaling study this
motivated (the reference escapes the same regime with 100-130 teleoperated
demos per task, model_cards/model_overview.md:114).

Reference protocol anchor: the closed-loop hand-off mirrors
closed_loop/closed_loop_policy.py:242-317 (policy drives from a mapped
history); there is no reference counterpart for the probe itself.

Usage:
    python -m nvblox_mindmap_tpu.scripts.place_grounding_probe \
        --checkpoint tests/test_data/task_success/cube_stacking/last.ckpt \
        --scenes 10 --out /tmp/place_grounding.json
"""
from __future__ import annotations

import argparse
import json
from typing import List, Optional

import numpy as np


def probe_scene(model, params, bounds, emb, seed: int,
                num_vertices: int, cube_half: float = 0.04,
                max_policy_goals: int = 8) -> dict:
    """One scene: expert prefix through lift, then the policy's release."""
    from nvblox_mindmap_tpu.closed_loop.goals import is_goal_reached
    from nvblox_mindmap_tpu.closed_loop.policies import (
        NvbloxDiffuserActorPolicy,
    )
    from nvblox_mindmap_tpu.closed_loop.scripted import (
        make_cube_stacking_env, scripted_stack_goals,
    )
    from nvblox_mindmap_tpu.scripts.task_success_experiment import (
        mapping_config,
    )

    env = make_cube_stacking_env(seed, num_cubes=2, cube_half=cube_half)
    policy = NvbloxDiffuserActorPolicy(
        model, params, emb, mapping_config("cube_stacking"),
        np.asarray(bounds), num_vertices_to_sample=num_vertices, seed=3,
    )
    env.reset()
    gt = scripted_stack_goals(env.initial_objects, cube_half)

    def run_to(goal) -> None:
        for _ in range(40):
            policy.step(env)
            env.step(goal)
            if is_goal_reached(
                emb, np.asarray(env.get_policy_state()), goal,
                is_intermediate_goal=False,
            ):
                break

    for g in gt[:4]:  # approach, descend, grasp, lift
        run_to(g)
    assert env.held_object_names(), f"scene {seed}: scripted grasp failed"

    release_xy: Optional[np.ndarray] = None
    n_goals = 0
    for _ in range(max_policy_goals):
        if release_xy is not None:
            break
        goals = policy.get_new_goal(env)
        if not goals:
            break
        for g in goals:
            g = np.asarray(g)
            n_goals += 1
            if g[7] < 0.5 and env.held_object_names():
                release_xy = g[:2].copy()
                break
            run_to(g)
    c1 = np.asarray(env.initial_objects["cube_1"][:2], dtype=np.float64)
    row = {
        "seed": seed,
        "cube_1_xy": c1.tolist(),
        "release_xy": None if release_xy is None else release_xy.tolist(),
        "release_error_m": (
            None if release_xy is None
            else float(np.linalg.norm(release_xy - c1))
        ),
        "policy_goals_until_release": n_goals,
    }
    return row


def summarize(rows: List[dict]) -> dict:
    ok = [r for r in rows if r["release_xy"] is not None]
    out = {"num_scenes": len(rows), "num_released": len(ok)}
    if len(ok) >= 4:
        t = np.asarray([r["cube_1_xy"] for r in ok])
        p = np.asarray([r["release_xy"] for r in ok])
        for axis, name in ((0, "x"), (1, "y")):
            out[f"slope_{name}"] = float(np.polyfit(t[:, axis], p[:, axis], 1)[0])
            out[f"r_{name}"] = float(np.corrcoef(t[:, axis], p[:, axis])[0, 1])
        errs = np.asarray([r["release_error_m"] for r in ok])
        out["median_release_error_m"] = float(np.median(errs))
        out["mean_release_error_m"] = float(errs.mean())
        out["release_spread_m"] = float(np.std(p, axis=0).mean())
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--scenes", type=int, default=10)
    ap.add_argument(
        "--seed_base", type=int, default=9000,
        help="scene seeds seed_base..seed_base+scenes-1; keep disjoint from "
        "training (21+) and held-out (1234+) ranges",
    )
    ap.add_argument("--num_vertices", type=int, default=512)
    ap.add_argument("--out", default=None, help="write rows+summary JSON")
    args = ap.parse_args(argv)

    from nvblox_mindmap_tpu.scripts.task_success_experiment import (
        _embodiment_for_task, _enable_compilation_cache, load_model,
    )

    _enable_compilation_cache()
    model, params, _, bounds = load_model(args.checkpoint, "cube_stacking")
    emb = _embodiment_for_task("cube_stacking")
    rows = []
    for s in range(args.scenes):
        row = probe_scene(
            model, params, bounds, emb, args.seed_base + s,
            num_vertices=args.num_vertices,
        )
        rows.append(row)
        print(
            f"scene {row['seed']}: cube_1=({row['cube_1_xy'][0]:+.3f},"
            f"{row['cube_1_xy'][1]:+.3f}) release="
            + ("NONE" if row["release_xy"] is None else
               f"({row['release_xy'][0]:+.3f},{row['release_xy'][1]:+.3f}) "
               f"err={row['release_error_m']:.3f} m")
        )
    summary = summarize(rows)
    print(json.dumps(summary, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(
                {"checkpoint": args.checkpoint, "rows": rows,
                 "summary": summary}, f, indent=1,
            )
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
