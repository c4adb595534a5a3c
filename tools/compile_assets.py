"""Compile reference URDF assets + NN checkpoints into mqe_tpu/assets/.

Run once at build time (requires /root/reference mounted). The emitted JSON /
NPZ files are committed so the framework is standalone at runtime.

  python tools/compile_assets.py

Outputs:
  mqe_tpu/assets/go1.json            reduced Featherstone tree for Unitree Go1
  mqe_tpu/assets/<object>.json       NPC object models (box, ball, sheep, ...)
  mqe_tpu/assets/actuator_go1.npz    actuator-net MLP weights 6->32->32->1
  mqe_tpu/assets/adaptation_wtw.npz  walk-these-ways adaptation MLP 2100->256->128->2
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mqe_tpu import ASSETS_DIR
from mqe_tpu.physics.urdf import compile_model_spec

REF = "/root/reference/resources"


def compile_robot():
    spec = compile_model_spec(f"{REF}/robots/go1/urdf/go1.urdf", max_spheres_per_axis=2)
    with open(os.path.join(ASSETS_DIR, "go1.json"), "w") as f:
        json.dump(spec, f, indent=1)
    names = [b["joint"]["name"] for b in spec["bodies"] if b["joint"]]
    print("go1:", len(spec["bodies"]), "bodies,", len(spec["spheres"]), "spheres, dofs:", names)


def compile_objects():
    for name in ["box", "ball", "sheep", "seesaw", "rotation_door", "cylinder", "door"]:
        spec = compile_model_spec(f"{REF}/objects/{name}.urdf")
        with open(os.path.join(ASSETS_DIR, f"{name}.json"), "w") as f:
            json.dump(spec, f, indent=1)
        print(name, ":", len(spec["bodies"]), "bodies,", len(spec["spheres"]), "spheres")

    # bridge + wrestling ship STL meshes; primitive approximations measured
    # from the mesh AABBs (see SURVEY; base top z=1.02/0.5 rel. to npc origin).
    bridge = {
        "name": "bridge",
        "static_boxes": [
            # deck: 4.0 x 0.7, top z=0.3 above base origin (base origin sits at z=0.72)
            {"center": [0.0, 0.0, 0.15], "half": [2.0, 0.35, 0.15]},
            # end platforms (Link1/Link2 rotated boxes): 1.3 x 2.5, z in [-0.7, 0.3]
            {"center": [2.65, 0.0, -0.2], "half": [0.65, 1.25, 0.5]},
            {"center": [-2.65, 0.0, -0.2], "half": [0.65, 1.25, 0.5]},
        ],
    }
    with open(os.path.join(ASSETS_DIR, "bridge.json"), "w") as f:
        json.dump(bridge, f, indent=1)
    wrestling = {
        "name": "wrestling",
        # circular ring platform r=2.184, height 0.5
        "static_cylinders": [{"center": [0.0, 0.0, 0.25], "radius": 2.184, "half_length": 0.25}],
    }
    with open(os.path.join(ASSETS_DIR, "wrestling.json"), "w") as f:
        json.dump(wrestling, f, indent=1)
    print("bridge/wrestling primitive approximations written")


def extract_nets():
    import torch

    m = torch.jit.load(f"{REF}/actuator_nets/unitree_go1.pt", map_location="cpu")
    p = dict(m.named_parameters())
    np.savez(
        os.path.join(ASSETS_DIR, "actuator_go1.npz"),
        w0=p["0.weight"].detach().numpy(),
        b0=p["0.bias"].detach().numpy(),
        w1=p["2.weight"].detach().numpy(),
        b1=p["2.bias"].detach().numpy(),
        w2=p["4.weight"].detach().numpy(),
        b2=p["4.bias"].detach().numpy(),
        activation=np.array("softsign"),
    )
    a = torch.jit.load(
        "/root/reference/mqe/utils/locomotion_checkpoints/walk_these_ways/adaptation_module_latest.jit",
        map_location="cpu",
    )
    p = dict(a.named_parameters())
    np.savez(
        os.path.join(ASSETS_DIR, "adaptation_wtw.npz"),
        w0=p["0.weight"].detach().numpy(),
        b0=p["0.bias"].detach().numpy(),
        w1=p["2.weight"].detach().numpy(),
        b1=p["2.bias"].detach().numpy(),
        w2=p["4.weight"].detach().numpy(),
        b2=p["4.bias"].detach().numpy(),
        activation=np.array("elu"),
    )
    print("actuator + adaptation nets extracted")


if __name__ == "__main__":
    os.makedirs(ASSETS_DIR, exist_ok=True)
    compile_robot()
    compile_objects()
    extract_nets()
