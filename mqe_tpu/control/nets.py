"""Small-MLP inference for the control path, as plain jnp matmuls.

Replaces the reference's TorchScript runtime (ref mqe/envs/go1/go1.py:367,
397-398) with weight pytrees loaded from npz assets; batched matmuls map
straight onto the MXU.

  actuator net:  per-joint MLP 6 -> 32 -> 32 -> 1, softsign activations
                 (ref go1.py:367-382; weights assets/actuator_go1.npz)
  adaptation:    2100 -> 256 -> 128 -> 2, ELU
                 (walk_these_ways/adaptation_module_latest.jit)
  body policy:   (2100 + 2) -> 512 -> 256 -> 128 -> 12, ELU — the reference
                 blob is missing from the snapshot (.MISSING_LARGE_BLOBS:2-3),
                 so weights are either re-trained in-framework or the IK trot
                 controller backend is used instead (control/locomotion.py).
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from mqe_tpu import ASSETS_DIR


def softsign(x):
    return x / (1.0 + jnp.abs(x))


def elu(x):
    return jnp.where(x > 0, x, jnp.expm1(x))


_ACTS = {"softsign": softsign, "elu": elu, "tanh": jnp.tanh}


def load_mlp(npz_name: str):
    """Load {w0,b0,w1,b1,w2,b2,activation} npz into a params dict."""
    d = np.load(os.path.join(ASSETS_DIR, npz_name), allow_pickle=False)
    params = {
        "w": [jnp.asarray(d[f"w{i}"].T) for i in range(3)],  # store as (in, out)
        "b": [jnp.asarray(d[f"b{i}"]) for i in range(3)],
        "act": str(d["activation"]),
    }
    return params


def mlp_apply(params, x, final_act=None):
    act = _ACTS[params["act"]]
    h = x
    n = len(params["w"])
    for i in range(n):
        h = h @ params["w"][i] + params["b"][i]
        if i < n - 1:
            h = act(h)
    if final_act is not None:
        h = final_act(h)
    return h


class ActuatorNet:
    """Unitree go1 actuator model: (joint err x3 hist, joint vel x3 hist) ->
    torque, evaluated per joint (ref go1.py:369-380)."""

    def __init__(self):
        self.params = load_mlp("actuator_go1.npz")

    def __call__(self, err, err_last, err_last_last, vel, vel_last, vel_last_last):
        """All inputs (..., 12). Returns torques (..., 12)."""
        x = jnp.stack([err, err_last, err_last_last, vel, vel_last, vel_last_last], axis=-1)
        out = mlp_apply(self.params, x)  # (..., 12, 1)
        return out[..., 0]


class AdaptationModule:
    def __init__(self):
        self.params = load_mlp("adaptation_wtw.npz")

    def __call__(self, obs_history):
        """(..., 2100) -> latent (..., 2)."""
        return mlp_apply(self.params, obs_history)


def load_body_policy(path):
    """Load a trained body-policy npz (from learn/train_locomotion.py) into a
    callable obs70 -> action12 (deterministic actor mean).

    Applies the same `prescale*tanh` action squash the trainer's rl_prescale
    used during rollout (learn/locomotion_env.py::rl_prescale), so the
    deployed policy sees exactly the action semantics it was trained with.
    The prescale is stored in the npz (meta_prescale; default 4.0 for older
    checkpoints).
    """
    import numpy as _np

    d = _np.load(path)
    prescale = float(d["meta_prescale"]) if "meta_prescale" in d else 4.0
    layers = []
    i = 0
    while f"params/actor/Dense_{i}/kernel" in d:
        layers.append(
            (jnp.asarray(d[f"params/actor/Dense_{i}/kernel"]),
             jnp.asarray(d[f"params/actor/Dense_{i}/bias"]))
        )
        i += 1

    def apply(obs):
        h = obs
        for j, (w, b) in enumerate(layers):
            h = h @ w + b
            if j < len(layers) - 1:
                h = elu(h)
        return prescale * jnp.tanh(h)

    return apply
